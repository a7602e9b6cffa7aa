"""Quick per-query Spark-vs-DuckDB diff harness for development.

Usage: python tools/diffcheck.py name1 name2 ... [--sf sf0.001]
Compares sorted-canonical CSV of the Spark result and the DuckDB
oracle at the given SF; prints the first differing rows on mismatch.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    import duckdb

    from iot_etl_spark.plans import ORACLES, QUERIES
    from iot_etl_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = "sf0.001"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf = a.split("=", 1)[1]
    sf_dir = f"/root/testdata/{sf}"
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        df = df.sort_values(list(df.columns)).reset_index(drop=True)
        return df

    fails = 0
    for name in args:
        try:
            a = canon(QUERIES[name](spark, sf_dir).toPandas())
            b = canon(con.execute(ORACLES[name]).df())
            sa, sb = a.astype(str), b.astype(str)
            ok = list(sa.columns) == list(sb.columns) and sa.equals(sb)
            print(f"{name}: {'OK' if ok else 'MISMATCH'} ({len(a)} rows)")
            if not ok:
                fails += 1
                print(" spark cols:", list(a.columns))
                print(" duck  cols:", list(b.columns))
                if len(sa) != len(sb):
                    print(f"  row counts differ: {len(sa)} vs {len(sb)}")
                if list(sa.columns) == list(sb.columns):
                    # multiset diff (ADVICE r11): positional alignment
                    # after independent sorts misprints everything after
                    # one inserted/missing row — value_counts handles
                    # duplicates and shows genuinely unmatched rows.
                    delta = sa.value_counts(dropna=False).subtract(
                        sb.value_counts(dropna=False), fill_value=0
                    )
                    cols = list(sa.columns)
                    for label, side in (("spark-only", delta[delta > 0]),
                                        ("duck -only", delta[delta < 0])):
                        for key, cnt in side.head(5).items():
                            row = dict(zip(cols, key if isinstance(key, tuple) else (key,)))
                            print(f"  {label} x{abs(int(cnt))}:", row)
        except Exception as e:  # noqa: BLE001
            fails += 1
            print(f"{name}: ERROR {type(e).__name__}: {e}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
