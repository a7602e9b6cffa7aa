#!/usr/bin/env python
"""Round-13 optimization audit: dump `.explain("formatted")` for every
registered BATCH query and mine the plans for optimization signals.

For each query the audit records:
  - node counts: Exchange, BroadcastExchange, SortMergeJoin,
    ShuffledHashJoin, BroadcastHashJoin, BroadcastNestedLoopJoin,
    CartesianProduct, BatchEvalPython, ArrowEvalPython,
    FlatMapGroupsInPandas*, MapInPandas/MapInArrow, Sort, Window,
    FileScan, Generate (explode)
  - scans with empty PushedFilters but a downstream Filter (pushdown
    misses), and ReadSchema width per scan
  - plan text size (a proxy for Catalyst planning cost)

Streaming queries (stream_*) are skipped: building them EXECUTES the
micro-batch drain; their plans are the batch plan over the memory-sink
rows, not the streaming topology. They are profiled separately.

Usage: python tools/plan_audit.py [sf_dir] [out_dir] [name_filter...]
Writes <out_dir>/<query>.txt plus <out_dir>/audit.json.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NODE_PATTERNS = {
    "exchange": r"^\s*[+:|-]*\s*Exchange ",
    "broadcast_exchange": r"BroadcastExchange",
    "smj": r"SortMergeJoin",
    "shj": r"ShuffledHashJoin",
    "bhj": r"BroadcastHashJoin",
    "bnlj": r"BroadcastNestedLoopJoin",
    "cartesian": r"CartesianProduct",
    "batch_eval_python": r"BatchEvalPython",
    "arrow_eval_python": r"ArrowEvalPython",
    "flatmap_pandas": r"FlatMapGroupsInPandas|FlatMapGroupsInArrow",
    "map_in_pandas": r"MapInPandas|MapInArrow|PythonMapInArrow",
    "sort": r"^\s*[+:|-]*\s*\*?\(?\d*\)?\s*Sort ",
    "window": r"\bWindow\b|RunningWindowFunction",
    "filescan": r"Scan parquet|Scan text|Scan json|FileScan",
    "generate": r"^\s*[+:|-]*\s*\*?\(?\d*\)?\s*Generate ",
    "take_ordered": r"TakeOrderedAndProject",
    "aqe": r"AdaptiveSparkPlan",
}


def audit_plan(text: str) -> dict:
    counts = {
        k: len(re.findall(p, text, flags=re.M)) for k, p in NODE_PATTERNS.items()
    }
    # pushdown misses: FileScan details blocks with PushedFilters: []
    pushed_empty = len(re.findall(r"PushedFilters: \[\]", text))
    pushed_nonempty = len(re.findall(r"PushedFilters: \[[^\]]", text))
    # ReadSchema column widths per scan
    widths = [
        s.count(":") for s in re.findall(r"ReadSchema: struct<([^\n]*)", text)
    ]
    counts.update(
        pushed_empty=pushed_empty,
        pushed_nonempty=pushed_nonempty,
        scan_widths=widths,
        plan_chars=len(text),
    )
    return counts


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/plan_audit_r13"
    names_filter = set(sys.argv[3:])
    os.makedirs(out_dir, exist_ok=True)

    from iot_etl_spark.session import get_spark

    spark = get_spark("plan_audit")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = sorted(n for n in qs if not n.startswith("stream_"))
    if names_filter:
        names = [n for n in names if n in names_filter]

    results: dict[str, dict] = {}
    for i, name in enumerate(names):
        t0 = time.monotonic()
        try:
            df = qs[name](spark, sf_dir)
            text = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # keep the audit observable on failure
            results[name] = {"error": str(exc)[:300]}
            print(f"[{i+1}/{len(names)}] {name}: ERROR {exc}", file=sys.stderr)
            continue
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as fh:
            fh.write(text)
        r = audit_plan(text)
        r["build_s"] = round(time.monotonic() - t0, 3)
        results[name] = r
        print(f"[{i+1}/{len(names)}] {name}: ex={r['exchange']} "
              f"smj={r['smj']} py={r['batch_eval_python']+r['arrow_eval_python']}"
              f" chars={r['plan_chars']}")

    with open(os.path.join(out_dir, "audit.json"), "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    print(f"wrote {len(results)} plans to {out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
