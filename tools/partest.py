"""Parallel pytest gate: run the test suite as N concurrent pytest
processes, each owning a disjoint set of test MODULES (modules stay
whole, so module-scoped fixtures and per-module Spark sessions behave
exactly as in the serial gate).

Why this exists: the full serial gate is ~16 min idle and grows
~10%/round (VERDICT r10 item 5); pytest-xdist is not installed and
installs are prohibited, but the stage cache is per-(name, sf_dir)
scoped with reader-retry (round 9), and the round-9/10 evidence of a
full suite running CONCURRENTLY with the bit-exact sweep says
cross-process Spark workloads coexist. This harness makes that the
gate's own shape.

Usage: python tools/partest.py [N]   (default 2 workers)
Exit code 0 iff every worker's pytest exits 0. Per-worker logs land in
/tmp/partest_worker<i>.log; a summary line prints per worker.

Module assignment (VERDICT r12 item 5 — the split, not the total, was
the bottleneck: workers finished 17.5/15/10.5 min on hand-maintained
hints): longest-processing-time first over MEASURED per-module costs.
Each worker records its modules' wall times via the conftest timing
hook (env PARTEST_TIMING_FILE); after a fully-green run the merged
measurements are written back to tools/partest_costs.json, so the
next run's split tracks the suite's real shape automatically. Static
hints remain only as the cold-start fallback for never-measured
modules.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
COSTS_PATH = os.path.join(REPO, "tools", "partest_costs.json")

# Cold-start fallback (seconds, serial, warm host) for modules never
# yet measured; measured costs in tools/partest_costs.json override.
_COST_HINTS = {
    "test_oracle_parity.py": 330,
    "test_streaming.py": 150,
    "test_plans.py": 110,
    "test_oracle_dtypes.py": 60,
    "test_merge.py": 60,
    "test_r11_properties.py": 50,
    "test_r10_properties.py": 45,
    "test_r11b_properties.py": 45,
    "test_r11_invariants.py": 40,
}


def _load_costs() -> dict[str, float]:
    try:
        with open(COSTS_PATH) as fh:
            return {k: float(v) for k, v in json.load(fh).items()}
    except Exception:
        return {}


def _cost(measured: dict[str, float], path: str) -> float:
    base = os.path.basename(path)
    if base in measured:
        return measured[base]
    if base in _COST_HINTS:
        return float(_COST_HINTS[base])
    return os.path.getsize(path) / 2000


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    measured = _load_costs()
    files = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    costed = sorted(files, key=lambda f: -_cost(measured, f))
    groups: list[list[str]] = [[] for _ in range(n)]
    loads = [0.0] * n
    for f in costed:
        i = loads.index(min(loads))
        groups[i].append(f)
        loads[i] += _cost(measured, f)
    for i, (grp, load) in enumerate(zip(groups, loads)):
        print(f"worker {i}: {len(grp)} modules, est {load:.0f}s")

    t0 = time.time()
    procs = []
    for i, grp in enumerate(groups):
        log = open(f"/tmp/partest_worker{i}.log", "w")
        env = dict(os.environ, PARTEST_TIMING_FILE=f"/tmp/partest_times{i}.json")
        procs.append(
            (
                i,
                subprocess.Popen(
                    [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
                     *grp],
                    cwd=REPO, stdout=log, stderr=subprocess.STDOUT, env=env,
                ),
                log,
            )
        )
    rc = 0
    for i, p, log in procs:
        code = p.wait()
        log.close()
        tail = open(f"/tmp/partest_worker{i}.log").read().strip().splitlines()
        summary = tail[-1] if tail else "(no output)"
        print(f"worker {i}: exit {code} | {summary}")
        rc |= code

    # Persist merged measurements for the next split — only from a
    # fully-green run (a worker that died mid-module would under-count
    # its modules and skew the next balance).
    if rc == 0:
        merged = _load_costs()
        for i in range(n):
            try:
                with open(f"/tmp/partest_times{i}.json") as fh:
                    merged.update(json.load(fh))
            except Exception:
                pass
        if merged:
            with open(COSTS_PATH, "w") as fh:
                json.dump(dict(sorted(merged.items())), fh, indent=1)
                fh.write("\n")
    print(f"wall time: {time.time() - t0:.1f}s, workers: {n}, exit: {rc}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
