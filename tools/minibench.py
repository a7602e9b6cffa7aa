#!/usr/bin/env python
"""Isolated per-query mini-bench: one warm session, N reps per query
through the noop sink (guide §1.4), job-labeled (§1.5). Prints one
JSON line {name: [rep0, rep1, ...]} — rep0 includes any cold stage
mints; later reps are the steady state.

Usage: python tools/minibench.py q1,q2,... [reps] [sf_dir]
Env:   SPARK_GRAFT_CPUS (default 32)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    names = [n for n in sys.argv[1].split(",") if n]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    # same shared engine constructor as bench.py (VERDICT r13 item 2):
    # all engine confs live in session.get_spark, so the floors here
    # stay comparable to the bench by construction
    from iot_etl_spark.session import get_spark

    spark = get_spark(
        app_name="minibench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "16g"),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from iot_etl_spark.sources.tables import load_all

    qs = entrymod.queries()
    for df in load_all(spark, sf_dir).values():
        df.limit(1).count()
    # same warmups as bench.py so floors match
    tiny = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    for warm, wdir in [("pricing_summary", sf_dir),
                      ("stream_json_decode", sf_dir),
                      ("stream_ewma_by_device", tiny if os.path.isdir(tiny) else sf_dir)]:
        try:
            qs[warm](spark, wdir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass

    out: dict[str, list[float]] = {}
    for name in names:
        ts = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"minibench:{name}#{r}")
            t0 = time.monotonic()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(round(time.monotonic() - t0, 3))
        out[name] = ts
        print(f"# {name}: {ts}", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
