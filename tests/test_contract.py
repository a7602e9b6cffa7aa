"""Driver-contract guards: the three surfaces the build driver and the
bench harness consume must keep their exact shapes — a regression here
blanks a whole round's verification, so it gets its own tests.

Spark-session-free where possible (fast collection); the bench run
uses a tiny single-query subset at sf0.001.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_entry_module_contract():
    sys.path.insert(0, REPO)
    import __spark_entry__ as e

    qs = e.queries()
    osql = e.oracle_sql()
    assert callable(e.entry)
    assert len(qs) >= 157
    # every query callable, every oracle a non-empty SQL string, and
    # the two dicts cover the same names (zero rows-only checks)
    assert set(qs) == set(osql)
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in osql.values())
    # driver-window curation (round 11, VERDICT r10 item 2): the
    # round-11 registrations lead, then the round-3-green tier resumes
    # at dedup_exact (round 10's window covered the tier head through
    # dedup_clusters in slots 44-50). Pin the resume point and a few
    # mid-tier names so a new registration cannot silently displace
    # the window.
    first50 = list(qs)[:50]
    for must in (
        # resume point + mid-tier names of the round-3 block
        "dedup_exact",
        "dedup_ngram_jaccard",
        "embedding_cosine_topk",
        "minhash_lsh_candidates",
        "stream_session_window",
    ):
        assert must in first50, must
    # round 10's window must have rotated OUT (its names were all
    # driver-checked last round)
    assert "kruskal_wallis_value_by_type" not in first50
    assert "hourly_event_type_pivot" not in first50


def test_bench_emits_contract_json_line(tmp_path):
    """bench.py's LAST stdout line must be the driver's JSON contract,
    and the full map must land in BENCH_LOCAL.json (whose committed
    full-registry content is restored afterwards)."""
    local = os.path.join(REPO, "BENCH_LOCAL.json")
    saved = open(local).read() if os.path.exists(local) else None
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
        BENCH_QUERIES="order_priority_counts",
        SPARK_DRIVER_MEMORY="2g",
    )
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, env=env, cwd=REPO, timeout=420,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        last = out.stdout.strip().splitlines()[-1]
        r = json.loads(last)
        assert r["metric"] == "total_query_wall_time"
        assert r["unit"] == "sec"
        assert r["sf"] == 0.001
        assert r["n_failed"] == 0
        assert set(r["queries"]) == {"order_priority_counts"}
        assert r["queries"]["order_priority_counts"] > 0
        with open(local) as fh:
            disk = json.load(fh)
        assert disk["queries"] == r["queries"]
    finally:
        if saved is not None:
            with open(local, "w") as fh:
                fh.write(saved)


def test_status_ledger_matches_registry():
    """STATUS.md's round-11 ledger cannot drift from the registry
    (VERDICT r10 item 4): every name in ROUND11_REGISTRATIONS must be
    registered with an oracle, lead the driver window in order, and
    appear in STATUS.md's round-11 changelog; any '+N naive ... pins'
    claim in that changelog must match the two r11 property modules'
    actual test count."""
    import re

    sys.path.insert(0, REPO)
    from iot_etl_spark.plans import ORACLES, QUERIES
    from iot_etl_spark.plans import ROUND11_REGISTRATIONS as R11

    names = list(QUERIES)
    assert names[: len(R11)] == R11
    for n in R11:
        assert n in ORACLES, n
    status = open(os.path.join(REPO, "STATUS.md")).read()
    sec = status.split("## Round-11 changelog")[1].split("## Round-10")[0]
    for n in R11:
        assert n in sec, f"{n} missing from the STATUS round-11 changelog"
    claim = re.search(r"\+(\d+) naive-reimplementation pins", sec)
    if claim:
        n_tests = 0
        for mod in ("test_r11_properties.py", "test_r11b_properties.py"):
            src = open(os.path.join(REPO, "tests", mod)).read()
            n_tests += len(re.findall(r"^def test_", src, re.M))
        assert int(claim.group(1)) == n_tests, (claim.group(1), n_tests)
