"""A miniature table-format transaction log: ACID commits, snapshot
isolation, time travel, and vacuum over plain parquet — the
Delta/Iceberg capability expressed in ~150 lines, no table-format
dependency.

Why the engine needs it: plain parquet directories have no commit
point — a reader can see a half-written append, a failed job leaves
orphan files that silently join the next scan, and "what did the table
look like yesterday" is unanswerable. The reference sidesteps all of
this by rewriting whole tables (spark_load.py's overwrite loads); that
stops working the moment two writers or a reader/writer pair overlap.

Design (the standard log-structured table layout):

- Data files are immutable parquet parts under ``<table>/data/``,
  written to a staging dir first and moved in — a file is visible ONLY
  if a committed log entry references it.
- The log is ``<table>/_txlog/<version 8-digit>.json``, one entry per
  commit: operation, files added, files logically removed. The current
  snapshot = replay of entries 0..N (removed files drop out).
- **Commit = O_EXCL create of the next version file.** POSIX open with
  O_CREAT|O_EXCL is atomic on a local/HDFS-semantics filesystem: two
  writers racing for version N — exactly one wins, the loser gets
  ``ConcurrentCommitError`` and retries on the new snapshot
  (optimistic concurrency, no locks held during the data write).
- **Readers never block**: a scan resolves the snapshot file list once
  and reads those immutable parts; later commits are invisible
  (snapshot isolation). ``version=`` pins any historical snapshot
  (time travel), enabling reproducible training runs over evolving
  corpora.
- **Vacuum** deletes data files referenced by NO retained version —
  physical deletion is decoupled from logical (an ``overwrite`` only
  marks files removed, so time travel keeps working until vacuum).

At 100 TB nothing changes structurally: the log stays tiny (file
lists, not data), commits stay O(1), and scans plan from the snapshot
list exactly like Delta's. On S3-like stores the O_EXCL rename needs a
coordination service (as Delta's commit service does) — documented
boundary, same code shape.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


def _file_column_stats(path: str) -> dict[str, list]:
    """Per-file column [min, max] harvested from the parquet footer
    row-group statistics — a metadata read, never a data scan. Only
    JSON-stable primitive types are recorded (int/float/bool/str);
    columns without stats (or with unsupported types) are simply
    absent, which read_pruned treats as un-prunable (always read) —
    missing stats can only cost I/O, never rows."""
    import pyarrow.parquet as pq

    try:
        md = pq.ParquetFile(path).metadata
    except Exception:  # noqa: BLE001 - stats are best-effort
        # unreadable/absent footer -> no stats; read_pruned fails OPEN
        return {}
    out: dict[str, list] = {}
    for rg in range(md.num_row_groups):
        row = md.row_group(rg)
        for c in range(row.num_columns):
            col = row.column(c)
            st = col.statistics
            if st is None or not st.has_min_max:
                continue
            name = col.path_in_schema
            if "." in name:  # nested — skip
                continue
            mn, mx = st.min, st.max
            if isinstance(mn, bytes):
                try:
                    mn, mx = mn.decode(), mx.decode()
                except UnicodeDecodeError:
                    continue
            if not isinstance(mn, (int, float, bool, str)):
                continue
            if name in out:
                out[name][0] = min(out[name][0], mn)
                out[name][1] = max(out[name][1], mx)
            else:
                out[name] = [mn, mx]
    return out


_BLOOM_BITS_PER_KEY = 10  # ~1% false-positive rate with k = 7
_BLOOM_HASHES = 7


def _bloom_hashes(value) -> tuple[int, int]:
    """Two 64-bit hashes of the CANONICAL string form (md5 split in
    half; double hashing h1 + i*h2 generates the k probe positions).
    Build side and probe side must both route through here — the
    canonicalization IS the equality contract of the index."""
    d = hashlib.md5(str(value).encode("utf-8")).digest()
    return int.from_bytes(d[:8], "big"), int.from_bytes(d[8:16], "big")


def _file_bloom(path: str, cols: tuple[str, ...]) -> dict[str, dict]:
    """Per-file Bloom bitsets over the DISTINCT values of the indexed
    columns — one local columnar read of the new file (the same
    O(delta) cost class as constraint enforcement; never a table
    scan). Best-effort like footer stats: unreadable files or absent
    columns contribute nothing and the reader fails OPEN."""
    import base64

    import pyarrow.parquet as pq

    out: dict[str, dict] = {}
    try:
        pf = pq.ParquetFile(path)
        present = [c for c in cols if c in pf.schema_arrow.names]
        if not present:
            return out
        tbl = pq.read_table(path, columns=present)
    except Exception:  # noqa: BLE001 - index is best-effort
        return out
    for c in present:
        distinct = {str(v) for v in tbl.column(c).to_pylist() if v is not None}
        m = max(64, len(distinct) * _BLOOM_BITS_PER_KEY)
        bits = bytearray((m + 7) // 8)
        for s in distinct:
            h1, h2 = _bloom_hashes(s)
            for i in range(_BLOOM_HASHES):
                idx = (h1 + i * h2) % m
                bits[idx >> 3] |= 1 << (idx & 7)
        out[c] = {
            "m": m,
            "k": _BLOOM_HASHES,
            "bits": base64.b64encode(bytes(bits)).decode("ascii"),
        }
    return out


def _bloom_maybe_contains(bloom: dict, value) -> bool:
    import base64

    m, k = bloom["m"], bloom["k"]
    bits = base64.b64decode(bloom["bits"])
    h1, h2 = _bloom_hashes(value)
    for i in range(k):
        idx = (h1 + i * h2) % m
        if not bits[idx >> 3] & (1 << (idx & 7)):
            return False
    return True


class ConcurrentCommitError(RuntimeError):
    """Another writer committed this version first; re-read and retry."""


class ConstraintViolationError(ValueError):
    """A write contains rows that fail a table CHECK constraint."""


class SchemaMismatchError(ValueError):
    """Appended frame's schema conflicts with the table schema."""


def _schema_sig(df: DataFrame) -> dict[str, str]:
    return {f.name: f.dataType.simpleString() for f in df.schema.fields}


class TxTable:
    """Transactional parquet table rooted at ``path``."""

    def __init__(self, path: str) -> None:
        self.path = path
        self.log_dir = os.path.join(path, "_txlog")
        self.data_dir = os.path.join(path, "data")
        os.makedirs(self.log_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)

    # ------------------------------------------------------------ log
    def versions(self) -> list[int]:
        return sorted(
            int(f.split(".")[0])
            for f in os.listdir(self.log_dir)
            if f.endswith(".json")
        )

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _entry(self, version: int) -> dict:
        with open(os.path.join(self.log_dir, f"{version:08d}.json")) as fh:
            return json.load(fh)

    def snapshot_files(self, version: int | None = None) -> list[str]:
        """Replay the log through ``version`` (default: latest):
        the live data-file list for that snapshot."""
        latest = self.latest_version()
        if latest is None:
            return []
        if version is None:
            version = latest
        if version not in self.versions():
            raise ValueError(f"version {version} does not exist (have {self.versions()})")
        live: list[str] = []
        for v in range(version + 1):
            e = self._entry(v)
            removed = set(e.get("removed", ()))
            live = [f for f in live if f not in removed]
            live.extend(e.get("added", ()))
        return [os.path.join(self.data_dir, f) for f in live]

    def _commit(self, entry: dict, version: int | None = None) -> int:
        """Atomically claim ``version`` (default: next after latest)
        via O_CREAT|O_EXCL. The version is the one the writer PLANNED
        from its read snapshot — if another writer claimed it first,
        this raises instead of silently committing on top of state the
        writer never saw (the optimistic-concurrency contract)."""
        if version is None:
            latest = self.latest_version()
            version = 0 if latest is None else latest + 1
        if entry.get("added") and "stats" not in entry:
            # per-file column min/max from the parquet FOOTERS (local
            # metadata reads, no data scan) — the Delta-style skipping
            # index read_pruned consumes. Computed at the single commit
            # choke point so every writer (append, append_batch,
            # overwrite, optimize, merge) gets stats for free.
            entry["stats"] = {
                n: _file_column_stats(os.path.join(self.data_dir, n))
                for n in entry["added"]
            }
        bloom_cols = tuple(self.bloom_columns())
        if entry.get("added") and bloom_cols and "bloom" not in entry:
            # per-file Bloom index over the declared point-lookup
            # columns — same commit choke point as footer stats, so
            # every write path gets the index for free
            entry["bloom"] = {
                n: _file_bloom(os.path.join(self.data_dir, n), bloom_cols)
                for n in entry["added"]
            }
        entry = {"version": version, **entry}
        target = os.path.join(self.log_dir, f"{version:08d}.json")
        try:
            fd = os.open(target, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError as exc:
            raise ConcurrentCommitError(
                f"version {version} was committed concurrently"
            ) from exc
        with os.fdopen(fd, "w") as fh:
            json.dump(entry, fh)
        return version

    # ---------------------------------------------------------- write
    def _stage(self, df: DataFrame) -> list[str]:
        """Write ``df`` to a staging dir, move parts into data/ under
        commit-unique names. Files are INVISIBLE until a log entry
        references them — a crash here leaves only orphans for
        vacuum."""
        tag = uuid.uuid4().hex[:12]
        staging = os.path.join(self.path, f"_staging_{tag}")
        df.write.mode("overwrite").parquet(staging)
        names = []
        for i, f in enumerate(sorted(os.listdir(staging))):
            if not f.endswith(".parquet"):
                continue
            name = f"{tag}-{i:05d}.parquet"
            shutil.move(os.path.join(staging, f), os.path.join(self.data_dir, name))
            names.append(name)
        shutil.rmtree(staging)
        return names

    def table_schema(self) -> dict[str, str] | None:
        """Column -> type of the current table schema (recorded at
        each commit; the latest entry carrying one wins)."""
        for v in reversed(self.versions()):
            sig = self._entry(v).get("schema")
            if sig:
                return sig
        return None

    def _check_schema(self, df: DataFrame, allow_evolution: bool) -> dict[str, str]:
        """Schema enforcement on the write path (the table-format
        contract plain parquet directories lack): an append must match
        the table schema exactly, or — with ``allow_evolution`` — may
        ADD columns while keeping every existing column's type. A
        drifted producer fails at commit time, not at some future
        reader's mergeSchema surprise."""
        return self._check_sig(_schema_sig(df), allow_evolution)

    def _check_sig(self, sig: dict[str, str], allow_evolution: bool) -> dict[str, str]:
        """Signature-level check, re-runnable inside a commit retry
        loop without touching the DataFrame (the table schema may have
        changed under a lost race — e.g. a concurrent overwrite
        redefined it — and a blind retry would stamp a conflicting
        schema back on, silently mixing incompatible files)."""
        current = self.table_schema()
        if current is None or sig == current:
            return sig
        widened = allow_evolution and all(
            sig.get(c) == t for c, t in current.items()
        )
        if not widened:
            raise SchemaMismatchError(
                f"append schema {sig} conflicts with table schema {current}"
                + ("" if allow_evolution else " (pass allow_evolution=True to add columns)")
            )
        return sig

    def history(self) -> list[dict]:
        """DESCRIBE HISTORY: one summary dict per commit (version, op,
        file delta, streaming batch key, constraint touched) — the
        audit surface for "who did what to this table", without
        exposing raw log internals."""
        out = []
        for v in self.versions():
            e = self._entry(v)
            out.append(
                {
                    "version": v,
                    "op": e.get("op"),
                    "n_added": len(e.get("added", ())),
                    "n_removed": len(e.get("removed", ())),
                    "batch_id": e.get("batch_id"),
                    "ledger_id": e.get("ledger_id"),
                    "constraint": e.get("constraint"),
                }
            )
        return out

    # ------------------------------------------------ Bloom file index
    def bloom_columns(self) -> list[str]:
        """Columns declared for per-file Bloom indexing (latest
        ``set_bloom_columns`` wins; empty until one is committed)."""
        cols: list[str] = []
        for v in self.versions():
            e = self._entry(v)
            if e.get("op") == "set_bloom_columns":
                cols = list(e.get("columns", ()))
        return cols

    def set_bloom_columns(self, cols: list[str]) -> int:
        """Declare point-lookup columns: every FUTURE commit stamps a
        per-file Bloom bitset over each column's distinct values (the
        skipping index for high-cardinality keys, where min/max stats
        prune nothing because every file spans the whole key range —
        the classic "find one user in a 10^6-file table" problem).
        Existing files stay un-indexed and fail OPEN, exactly like
        pre-stats files; OPTIMIZE rewrites them with the index."""
        return self._commit(
            {"op": "set_bloom_columns", "columns": list(cols),
             "added": [], "removed": []}
        )

    def snapshot_file_blooms(
        self, version: int | None = None
    ) -> dict[str, dict[str, dict]]:
        """filename -> per-column Bloom entries for a snapshot's live
        files (files committed before indexing map to {})."""
        live = {os.path.basename(p) for p in self.snapshot_files(version)}
        blooms: dict[str, dict[str, dict]] = {}
        latest = self.latest_version() if version is None else version
        for v in range(latest + 1):
            for name, b in self._entry(v).get("bloom", {}).items():
                if name in live:
                    blooms[name] = b
        return {n: blooms.get(n, {}) for n in live}

    def read_point(
        self,
        spark: SparkSession,
        col: str,
        value,
        version: int | None = None,
    ) -> DataFrame:
        """POINT-LOOKUP snapshot read through the Bloom file index: a
        file is skipped only when its committed bitset PROVES ``col =
        value`` matches no row (no false negatives by construction;
        ~1% of files survive as false positives at the default 10
        bits/key). Files without an index for ``col`` are always read.
        Planning-time file-list pruning, same contract as
        ``read_pruned`` — compose with ``.filter(col = value)`` for
        exact semantics. The two indexes stack: min/max prunes range
        predicates, Bloom prunes equality on keys min/max can't help
        with."""
        blooms = self.snapshot_file_blooms(version)
        keep = []
        for name, b in blooms.items():
            entry = b.get(col)
            if entry is None or _bloom_maybe_contains(entry, value):
                keep.append(os.path.join(self.data_dir, name))
        if not keep:
            return self.read(spark, version).limit(0)
        return spark.read.option("mergeSchema", "true").parquet(*keep)

    # ----------------------------------------------- CHECK constraints
    def constraints(self) -> dict[str, str]:
        """Active CHECK constraints (name -> SQL predicate), replayed
        from the log. Constraints are TABLE METADATA: an overwrite
        replaces the data and may redefine the schema, but the
        constraints persist until an explicit drop — same as Delta."""
        active: dict[str, str] = {}
        for v in self.versions():
            e = self._entry(v)
            if e.get("op") == "add_constraint":
                active[e["constraint"]] = e["expr"]
            elif e.get("op") == "drop_constraint":
                active.pop(e["constraint"], None)
        return active

    def add_constraint(self, spark: SparkSession, name: str, expr: str) -> int:
        """ALTER TABLE ADD CONSTRAINT name CHECK (expr): validates the
        CURRENT snapshot first (a constraint the existing data already
        violates must fail here, not at some future writer), then
        commits a metadata-only log entry. Delta NULL semantics: a row
        violates only when the predicate evaluates to FALSE — NULL
        passes (add an IS NOT NULL conjunct to forbid it)."""
        if name in self.constraints():
            raise ValueError(f"constraint {name!r} already exists")
        files = self.snapshot_files()
        if files:
            bad = (
                spark.read.parquet(*files)
                .filter(f"NOT coalesce(({expr}), true)")
                .limit(1)
                .collect()
            )
            if bad:
                raise ConstraintViolationError(
                    f"existing rows violate CHECK {name!r} ({expr}): {bad[0]}"
                )
        return self._commit(
            {"op": "add_constraint", "constraint": name, "expr": expr,
             "added": [], "removed": []}
        )

    def drop_constraint(self, name: str) -> int:
        if name not in self.constraints():
            raise ValueError(f"constraint {name!r} does not exist")
        return self._commit(
            {"op": "drop_constraint", "constraint": name,
             "added": [], "removed": []}
        )

    def _enforce_constraints(self, spark: SparkSession, added: list[str]) -> None:
        """Write-path CHECK enforcement, run on the STAGED files after
        ``_stage`` and before the commit: re-reading the just-written
        parquet costs one local scan of the new files only (never a
        recompute of the upstream plan) and checks exactly the bytes
        the commit would publish. On violation the invisible staged
        files are deleted and the write raises — the table never
        exposes a state that fails its contract."""
        cons = self.constraints()
        if not cons or not added:
            return
        staged = spark.read.parquet(
            *(os.path.join(self.data_dir, n) for n in added)
        )
        for name, expr in cons.items():
            bad = staged.filter(f"NOT coalesce(({expr}), true)").limit(1).collect()
            if bad:
                import contextlib

                for f in added:
                    with contextlib.suppress(FileNotFoundError):
                        os.remove(os.path.join(self.data_dir, f))
                raise ConstraintViolationError(
                    f"write violates CHECK {name!r} ({expr}): {bad[0]}"
                )

    def append_with_quarantine(
        self,
        df: DataFrame,
        quarantine: "TxTable",
        max_retries: int = 3,
    ) -> tuple[int, int | None]:
        """Append with CHECK-violation QUARANTINE instead of rejection
        (the dbt ``store_failures`` / DLQ-table shape): rows passing
        every active constraint commit to THIS table; violating rows
        commit to ``quarantine`` with a ``violated`` column naming the
        failed rules (sorted, comma-joined) so replays and fixes are
        targeted. Returns (valid_version, quarantine_version|None).

        Unlike plain ``append`` — which rejects the WHOLE write so the
        table never publishes a bad state — this path trades strictness
        for progress: the pipeline keeps flowing and the bad rows stay
        visible, auditable, and replayable beside it. NULL semantics
        match CHECK enforcement: a NULL predicate passes.

        The tagged frame is localCheckpoint-ed before splitting so the
        valid/bad routing is computed exactly once: a non-deterministic
        upstream df re-evaluated per consumer could otherwise send a
        row to both tables or neither. Raises ValueError if df already
        carries a ``violated`` column (the tag would silently clobber
        it and the quarantine rows would lose the caller's data).

        Scale: one materialization of the incoming micro-batch (the
        checkpoint), then one filter pass per side; the rule
        evaluation is a row-local expression (no shuffle)."""
        valid, bad = self.split_by_constraints(df)
        v = self.append(valid, max_retries=max_retries)
        qv = None
        if bad is not None and bad.limit(1).count():
            qv = quarantine.append(
                bad, max_retries=max_retries, allow_evolution=True
            )
        return v, qv

    def split_by_constraints(
        self, df: DataFrame
    ) -> tuple[DataFrame, DataFrame | None]:
        """Partition ``df`` by this table's active CHECK constraints:
        (valid, bad) where bad rows carry a ``violated`` column naming
        the failed rules (sorted, comma-joined); bad is None when the
        table has no constraints. The tagged frame is
        localCheckpoint-ed so routing is computed exactly once — a
        non-deterministic upstream could otherwise send a row to both
        sides or neither. Shared by ``append_with_quarantine`` (batch)
        and ``start_txlog_quarantine_sink`` (streaming DLQ routing).

        Raises ValueError if df already carries ``violated`` (the tag
        would silently clobber the caller's data)."""
        from pyspark.sql import functions as F

        cons = self.constraints()
        if not cons:
            return df, None
        if "violated" in df.columns:
            raise ValueError(
                "split_by_constraints reserves the 'violated' column; "
                "rename or drop it on the incoming frame"
            )
        fails = [
            F.when(
                ~F.coalesce(F.expr(expr), F.lit(True)), F.lit(name)
            )
            for name, expr in sorted(cons.items())
        ]
        tagged = df.withColumn(
            "violated",
            F.concat_ws(",", F.array_compact(F.array(*fails))),
        ).localCheckpoint(eager=True)
        valid = tagged.filter(F.col("violated") == "").drop("violated")
        bad = tagged.filter(F.col("violated") != "")
        return valid, bad

    def append(
        self, df: DataFrame, max_retries: int = 3, allow_evolution: bool = False
    ) -> int:
        """ACID append: stage files, then one atomic commit at the
        version planned from the read snapshot. Appends commute, so a
        lost race is safely retried at the new head (the staged files
        are reused — they were never visible). Schema-enforced BOTH
        before staging and on every retry: if the race was lost to an
        overwrite that redefined the table schema, the retry raises
        SchemaMismatchError instead of committing conflicting files
        (the staged parts stay invisible; vacuum sweeps them)."""
        sig = self._check_schema(df, allow_evolution)
        added = self._stage(df)
        self._enforce_constraints(df.sparkSession, added)
        for _ in range(max_retries + 1):
            self._check_sig(sig, allow_evolution)
            latest = self.latest_version()
            planned = 0 if latest is None else latest + 1
            try:
                return self._commit(
                    {"op": "append", "added": added, "removed": [], "schema": sig},
                    planned,
                )
            except ConcurrentCommitError:
                continue
        raise ConcurrentCommitError(f"append lost {max_retries + 1} commit races")

    def committed_batch_ids(self, ledger_id: str | None = None) -> set[int]:
        """Batch ids recorded by ``append_batch`` commits WITHIN one
        ledger scope — the idempotence ledger for exactly-once
        streaming. The log is file lists, not data, so this scan is
        O(commits) tiny reads; a long-lived table would checkpoint the
        set forward."""
        ids = set()
        for v in self.versions():
            e = self._entry(v)
            b = e.get("batch_id")
            if b is not None and e.get("ledger_id") == ledger_id:
                ids.add(b)
        return ids

    def append_batch(
        self,
        df: DataFrame,
        batch_id: int,
        ledger_id: str | None = None,
        max_retries: int = 3,
        allow_evolution: bool = False,
    ) -> int | None:
        """Idempotent append keyed by (ledger scope, micro-batch id): a
        replayed batch (foreachBatch re-delivery after a
        failure/restart) is detected in the log and skipped — TOGETHER
        with the atomic commit this upgrades Structured Streaming's
        at-least-once foreachBatch contract to exactly-once into this
        table. Returns the new version, or None for a recognized
        replay.

        LEDGER VALIDITY — Spark's epoch-id contract only guarantees
        that the SAME batch id carries the SAME rows within one
        checkpoint lineage. Reuse one ``ledger_id`` across checkpoints
        ONLY when the source->batch mapping is deterministic (same
        finite source, same boundaries — the replay-proof harness
        shape); a restarted stream with a NEW checkpoint and different
        batch boundaries must use a new ledger scope, otherwise its
        batch 0 would be silently skipped (data loss). Scoping to the
        checkpoint/query id is the safe production default.

        The check-then-commit window is closed by the commit itself:
        on a lost version race the ledger is RE-READ — if the winning
        commit claimed this (ledger, batch) key, the replay is
        recognized and the retry abandoned."""
        if batch_id in self.committed_batch_ids(ledger_id):
            return None
        sig = self._check_schema(df, allow_evolution=allow_evolution)
        added = self._stage(df)
        self._enforce_constraints(df.sparkSession, added)
        for _ in range(max_retries + 1):
            self._check_sig(sig, allow_evolution=allow_evolution)
            latest = self.latest_version()
            planned = 0 if latest is None else latest + 1
            try:
                return self._commit(
                    {"op": "append", "added": added, "removed": [],
                     "batch_id": batch_id, "ledger_id": ledger_id, "schema": sig},
                    planned,
                )
            except ConcurrentCommitError:
                # the winner may have BEEN this batch (two sinks racing
                # the same replay): re-read the ledger before retrying
                if batch_id in self.committed_batch_ids(ledger_id):
                    # the loser's staged files are referenced by no log
                    # entry — removing them is safe and avoids orphans
                    # that would otherwise sit on disk until a vacuum
                    # with elapsed retention runs (ADVICE r5)
                    import contextlib

                    for f in added:
                        with contextlib.suppress(FileNotFoundError):
                            os.remove(os.path.join(self.data_dir, f))
                    return None
                continue
        raise ConcurrentCommitError(f"append_batch lost {max_retries + 1} commit races")

    def overwrite(self, df: DataFrame) -> int:
        """ACID overwrite: new files in, every file live IN THE READ
        SNAPSHOT logically removed (still on disk — time travel reads
        them until vacuum). A lost race RAISES rather than retrying:
        unlike append, overwrite's removed-list depends on the
        snapshot it read, which the winning commit invalidated."""
        latest = self.latest_version()
        planned = 0 if latest is None else latest + 1
        live = [os.path.basename(f) for f in self.snapshot_files()]
        added = self._stage(df)
        self._enforce_constraints(df.sparkSession, added)
        return self._commit(
            {"op": "overwrite", "added": added, "removed": live,
             "schema": _schema_sig(df)},  # overwrite may redefine the schema
            planned,
        )

    # ----------------------------------------------------------- read
    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Snapshot read (time travel with ``version=``): resolves the
        immutable file list once; concurrent later commits are
        invisible to this DataFrame."""
        files = self.snapshot_files(version)
        if not files:
            raise ValueError("table has no committed data")
        # mergeSchema: evolved tables (allow_evolution appends) read
        # with the union schema; pre-widening files NULL the new cols
        return spark.read.option("mergeSchema", "true").parquet(*files)

    def snapshot_file_stats(
        self, version: int | None = None
    ) -> dict[str, dict[str, list]]:
        """filename -> per-column [min, max] for the live files of a
        snapshot, replayed from the commit entries (files committed
        before the stats feature carry no stats and map to {})."""
        live = {os.path.basename(p) for p in self.snapshot_files(version)}
        stats: dict[str, dict[str, list]] = {}
        latest = self.latest_version() if version is None else version
        for v in range(latest + 1):
            for name, s in self._entry(v).get("stats", {}).items():
                if name in live:
                    stats[name] = s
        return {n: stats.get(n, {}) for n in live}

    def read_pruned(
        self,
        spark: SparkSession,
        ranges: dict[str, tuple],
        version: int | None = None,
    ) -> DataFrame:
        """DATA-SKIPPING snapshot read (the Delta stats-pruning shape):
        ``ranges`` maps column -> (lo, hi) — either end None for
        half-open — and a file is SKIPPED only when its committed
        footer stats PROVE the interval is disjoint from the file's
        [min, max]. Files without stats for a referenced column are
        always read (missing metadata costs I/O, never rows). Pruning
        is planning-time (file-list construction) — on a 100 TB table
        this is the difference between listing 10^6 files into the
        scan and the handful a point-range touches, BEFORE parquet's
        own row-group skipping sees anything. The caller still applies
        the row-level filter; pruning is file-granular.

        NOTE: the returned frame contains every row of the surviving
        files — compose with ``.filter(...)`` for exact semantics (the
        pytest pins result equality filter-on-pruned == filter-on-full)."""
        stats = self.snapshot_file_stats(version)
        keep = []
        for name, s in stats.items():
            skip = False
            for col, (lo, hi) in ranges.items():
                if col not in s:
                    continue
                mn, mx = s[col]
                if (hi is not None and mn > hi) or (lo is not None and mx < lo):
                    skip = True
                    break
            if not skip:
                keep.append(os.path.join(self.data_dir, name))
        if not keep:
            # preserve schema for the empty result
            return self.read(spark, version).limit(0)
        return spark.read.option("mergeSchema", "true").parquet(*keep)

    def optimize(self, spark: SparkSession, target_files: int = 1) -> int | None:
        """OPTIMIZE: rewrite the current snapshot's files into
        ``target_files`` compacted parts and commit the swap as ONE
        atomic log entry (adds the compacted files, logically removes
        every input). Readers pinned to older versions keep their
        small files until vacuum; a concurrent appender that wins the
        version race makes this raise rather than drop its rows —
        rerun on the new snapshot. No-op (returns None) if the
        snapshot is already within the target."""
        live = self.snapshot_files()
        if len(live) <= target_files:
            return None
        latest = self.latest_version()
        planned = latest + 1
        df = spark.read.parquet(*live).coalesce(target_files)
        added = self._stage(df)
        return self._commit(
            {
                "op": "optimize",
                "added": added,
                "removed": [os.path.basename(f) for f in live],
            },
            planned,
        )

    def read_changes(
        self, spark: SparkSession, since_version: int, to_version: int | None = None
    ) -> DataFrame:
        """Change data feed: the rows APPENDED by commits in
        ``(since_version, to_version]`` — the incremental-consumption
        primitive (downstream aggregate refresh, index updates, replica
        shipping) that reads only the new files, never the table.
        Overwrite commits contribute their added files (the feed is
        append-only deltas; removals are visible in the log entries
        for consumers that need them)."""
        to_version = self.latest_version() if to_version is None else to_version
        if to_version is None:
            raise ValueError("table has no commits")
        files = []
        for v in self.versions():
            if since_version < v <= to_version:
                files.extend(
                    os.path.join(self.data_dir, f)
                    for f in self._entry(v).get("added", ())
                )
        if not files:
            return self.read(spark).limit(0)
        return spark.read.parquet(*files)

    # --------------------------------------------------------- vacuum
    def vacuum(
        self, retain_last: int = 1, retention_seconds: float = 24 * 3600
    ) -> list[str]:
        """Physically delete data files referenced by none of the last
        ``retain_last`` versions (older snapshots stop time-traveling
        — the Delta VACUUM contract), but ONLY once they are at least
        ``retention_seconds`` old. The age gate is what makes vacuum
        safe against lock-free concurrent writers: ``_stage`` moves
        files into data/ BEFORE the log commit, so a freshly staged
        in-flight file is unreferenced for a moment — deleting it
        would let the writer's commit land referencing missing files
        (silent data loss). Delta's VACUUM has the same retention
        check for the same reason; pass ``retention_seconds=0`` only
        when no writer can be in flight (tests, single-writer
        maintenance windows). ``retain_last`` is clamped to >= 1 — the
        live snapshot is never vacuumable. Also sweeps aged orphans
        from crashed stagings. Returns deleted file names."""
        retain_last = max(1, retain_last)
        vs = self.versions()
        keep: set[str] = set()
        for v in vs[-retain_last:]:
            keep.update(os.path.basename(f) for f in self.snapshot_files(v))
        horizon = time.time() - retention_seconds
        deleted = []
        for f in os.listdir(self.data_dir):
            p = os.path.join(self.data_dir, f)
            if f not in keep and os.path.getmtime(p) <= horizon:
                os.remove(p)
                deleted.append(f)
        # crashed staging dirs (writer died before the move): same age gate
        for d in os.listdir(self.path):
            p = os.path.join(self.path, d)
            if d.startswith("_staging_") and os.path.getmtime(p) <= horizon:
                shutil.rmtree(p, ignore_errors=True)
        return sorted(deleted)
