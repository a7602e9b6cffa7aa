"""SQL-callable Python table functions (Spark 4 UDTF API).

``CREATE FUNCTION``-style Python UDTFs are the third Python extension
surface next to Pandas UDFs (scalar) and grouped-map/mapInPandas
(frames): a class whose ``eval`` is called per input row — or, with
``TABLE(...) PARTITION BY k ORDER BY ts`` input, per row of each
partition in order, with ``terminate`` flushing per-partition state.
That makes sequential per-key folds expressible FROM SQL, no DataFrame
code at the call site — the capability this module demonstrates with a
run-length encoder for anomaly episodes (maximal runs of consecutive
anomalous readings per user).

Scale: one UDTF instance per partition; state is the current run
(O(1)); Spark shuffles once on the PARTITION BY key exactly like a
window. Python crossing is row-at-a-time here (UDTFs are not yet
Arrow-vectorized for TABLE input in 4.1) — so this stays an API
demonstration and an escape hatch for logic SQL can't express; the
registry's anomaly queries keep the native window/codegen path.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="run_start_us BIGINT, run_end_us BIGINT, n_events INT")
class AnomalyRuns:
    """Emit one row per maximal run of is_anomaly=true rows, in the
    partition's ORDER BY order. Call shape:

        SELECT * FROM anomaly_runs(
            TABLE(SELECT user_id, ts_us, is_anomaly FROM v)
            PARTITION BY user_id ORDER BY ts_us)
    """

    def __init__(self) -> None:
        self._start: int | None = None
        self._end: int | None = None
        self._n = 0

    def eval(self, row) -> "iter":
        if bool(row.is_anomaly):
            if self._start is None:
                self._start = int(row.ts_us)
                self._n = 0
            self._end = int(row.ts_us)
            self._n += 1
        else:
            if self._start is not None:
                yield (self._start, self._end, self._n)
                self._start, self._end, self._n = None, None, 0

    def terminate(self) -> "iter":
        if self._start is not None:
            yield (self._start, self._end, self._n)


def register_udtfs(spark: SparkSession) -> None:
    """Make the table functions callable from SQL by name."""
    spark.udtf.register("anomaly_runs", AnomalyRuns)
