"""DataSource V2 surface: the ``matdb`` format, read AND write.

The last step from "library over Spark" to "Spark-native engine"
(round-5 verdict item 4): the MVCC store as a first-class Spark
source/sink, so any Spark user — SQL, DataFrame, other languages
through the session catalog — reaches a matdb store with one call:

    from matdb_spark.sources.dsv2 import register_matdb_source
    register_matdb_source(spark)
    df = spark.read.format("matdb").load("/path/to/db")          # snapshot
    df = spark.read.format("matdb").option("as_of", 3).load(p)   # time travel
    df.write.format("matdb").mode("append").save(p)              # one txn
    df.write.format("matdb").mode("overwrite").save(p)           # supersede
    s.writeStream.format("matdb").option(                        # exactly-once
        "checkpointLocation", ck).start(p)                       # per-batch txn
    spark.readStream.format("matdb").option(                     # CDC stream
        "feed", "changes").load(p)                               # source

Composition: the CDC source feeding the matdb sink replicates a store
end-to-end through the format alone — exactly-once (checkpointed
cursors on the read side, (stream_source, batch_id) manifest stamps
on the write side), deletes included (tombstones ride as
all-null-value rows, which IS the engine's delete).

Built on the Spark 4 Python Data Source API. The DRIVER side reuses
the exact planning tiers of the library scan (scan.py scan_dataframe):
manifest-resolved file lists (no listing job), tier-0 txn-stats
pruning, chunk pruning from pushed-down dimension filters, and
version-rank overrides for minor compactions. The EXECUTOR side is
one Arrow pipeline per CHUNK: every version of a key lives in the
same chunk by construction (chunk = f(key), schema.rs:28-38's routing
invariant), so newest-(txn, seq)-wins resolution is chunk-local and
the source needs NO shuffle at all — Spark receives already-resolved
snapshot rows as Arrow record batches.

Semantics and bounds, stated plainly:
- Committed state only (a snapshot of the store as of the horizon) —
  read-your-own-writes overlays are a Transaction concept and stay on
  the library path (transaction.py query()).
- Row-level resolution only (the default query() mode, which supports
  tombstone deletes); ``cell_merge`` stays on the library path.
- Rows are emitted in key order WITHIN a chunk; Spark scans give no
  cross-partition order (add .orderBy for the O1 global contract).
- Pushed filters are used for PRUNING only (manifest tier-0 + chunk
  directories) and are all returned to Spark for re-application —
  value-column filters must not run before version resolution, and
  double-applying dim filters is free correctness.
- A store with no chunked dimension degrades to one input partition
  (resolution must then be global); the library path is preferred
  there. Compacted stores (manifest ``unique_keys``) skip resolution
  and parallelize per FILE instead of per chunk.

Scale: partitions = chunks, the same granularity the write side sizes
to "one healthy parquet partition" (SCALE.md §12) — 100 TB stores
carry tens of thousands of chunks, saturating any executor fleet; the
per-task state is one chunk's rows, which is exactly the bound the
chunk_size knob already enforces for the JVM path.

Reference parity: this is the reference's one-call query surface
(transaction.rs:67 query() → scan.rs merge scan) exposed the way a
Spark user expects to reach a table.
"""

from __future__ import annotations

import os
import warnings
from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

from matdb_spark import manifest
from matdb_spark.schema import SEQ_COL, Schema
from matdb_spark.scan import _chunk_ranges, _select_manifest_files

SCHEMA_FILENAME = "schema.json"

_ARROW_TYPES = {
    "long": "int64",
    "int": "int32",
    "double": "float64",
    "float": "float32",
    "string": "string",
    "timestamp": "timestamp[us, tz=UTC]",
    "date": "date32[day]",
    "boolean": "bool",
    "binary": "binary",
    "decimal(20,0)": "decimal128(20, 0)",
}


def _truthy(v) -> bool:
    return str(v).strip().lower() in ("true", "1", "yes")


def _matdb_type_of(dt) -> str:
    """Spark DataType → the engine's type-name vocabulary (the reverse
    of schema._TYPE_MAP), for additive write-side evolution."""
    from pyspark.sql import types as T

    table = {
        T.LongType(): "long",
        T.IntegerType(): "int",
        T.DoubleType(): "double",
        T.FloatType(): "float",
        T.StringType(): "string",
        T.TimestampType(): "timestamp",
        T.DateType(): "date",
        T.BooleanType(): "boolean",
        T.BinaryType(): "binary",
        T.DecimalType(20, 0): "decimal(20,0)",
    }
    try:
        return table[dt]
    except KeyError:
        raise ValueError(
            f"cannot evolve store with a column of Spark type {dt}"
        )


def _check_write_schema(db_path: str, schema, evolve: bool) -> list:
    """Write-side schema contract — VALIDATION ONLY. Strict by
    default: DataFrame columns must equal the store's. With
    ``.option("evolve", "true")`` (the mergeSchema idiom), EXTRA
    DataFrame columns are returned as pending ``(name, matdb_type)``
    additions; nothing is persisted here. The writer applies them in
    its COMMIT path (``_apply_pending_evolution``) atomically with the
    transaction, so an aborted write never permanently evolves the
    store — the Delta mergeSchema contract (r7 advice, medium).
    Missing store columns are an error either way — a write may not
    silently drop data the store's schema promises."""
    sch = Schema.load(os.path.join(db_path, SCHEMA_FILENAME))
    expected = set(sch.column_names)
    got = set(schema.fieldNames())
    if got == expected:
        return []
    missing = expected - got
    extra = got - expected
    if evolve and not missing and extra:
        # type-check now (fail at planning, before any task runs);
        # the save happens at commit under the schema lock
        return [
            (f.name, _matdb_type_of(f.dataType))
            for f in schema.fields
            if f.name in extra
        ]
    raise ValueError(
        f"matdb write schema mismatch: store columns "
        f"{sorted(expected)}, DataFrame columns {sorted(got)}"
        + (
            " — pass .option('evolve', 'true') to add the new value"
            " column(s) to the store"
            if not missing and extra
            else ""
        )
    )


def _schema_with_pending(sch: Schema, pending: list) -> Schema:
    """In-memory view of the store schema with the pending evolved
    columns appended — what write tasks lay files down with BEFORE the
    evolution is durably committed (extra parquet columns are invisible
    to scans until schema.json grows them, so staged files are safe
    whether the txn commits or aborts)."""
    if not pending:
        return sch
    from matdb_spark.schema import Schema as _S, Value as _V

    names = set(sch.column_names)
    vals = list(sch.values) + [
        _V(n, t) for n, t in pending if n not in names
    ]
    return _S(dimensions=list(sch.dimensions), values=vals, epoch=sch.epoch)


def _apply_pending_evolution(db_path: str, pending: list) -> None:
    """Persist additive value-column evolution under an exclusive
    O_CREAT|O_EXCL claim on ``schema.json.lock`` (the txn-reservation
    discipline, manifest.reserve_txn_id), RE-VALIDATING against the
    persisted schema inside the critical section: two concurrent
    evolving writers serialize their read-modify-writes, so neither
    can lose the other's column. A column another writer already added
    with the SAME type is an idempotent no-op; a differing type is a
    loud conflict. Called from the writer's commit path, immediately
    before manifest.publish — the schema change commits with the
    transaction (crash between the two leaves an additive, all-null
    column: harmless, retry-safe)."""
    if not pending:
        return
    import time as _time

    from matdb_spark.schema import Schema as _S, Value as _V

    spath = os.path.join(db_path, SCHEMA_FILENAME)
    lock = spath + ".lock"
    deadline = _time.monotonic() + 30.0
    while True:
        try:
            os.close(os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
            break
        except FileExistsError:
            try:
                # a holder that crashed mid-evolution leaves a stale
                # lock; steal it after the same staleness reasoning as
                # recover()'s reservation sweep (evolution itself is a
                # sub-second critical section)
                if _time.time() - os.path.getmtime(lock) > 60.0:
                    os.unlink(lock)
                    continue
            except OSError:
                continue  # lock vanished between listing and stat
            if _time.monotonic() > deadline:
                raise TimeoutError(
                    f"schema evolution lock busy for 30s: {lock}"
                )
            _time.sleep(0.05)
    try:
        sch = Schema.load(spath)  # re-read under the lock
        existing = {
            c.name: c.type for c in list(sch.dimensions) + list(sch.values)
        }
        vals = list(sch.values)
        epoch = sch.epoch
        for name, typ in pending:
            cur = existing.get(name)
            if cur is not None:
                if cur != typ:
                    raise ValueError(
                        f"concurrent schema evolution conflict: column "
                        f"{name!r} exists as {cur}, writer wants {typ}"
                    )
                continue  # already added by a concurrent writer
            vals.append(_V(name, typ))
            epoch += 1
        if epoch != sch.epoch:
            _S(
                dimensions=list(sch.dimensions), values=vals, epoch=epoch
            ).save(spath)
    finally:
        try:
            os.unlink(lock)
        except FileNotFoundError:
            pass


def _arrow_type(name: str):
    import pyarrow as pa

    mapping = {
        "long": pa.int64(),
        "int": pa.int32(),
        "double": pa.float64(),
        "float": pa.float32(),
        "string": pa.string(),
        "timestamp": pa.timestamp("us", tz="UTC"),
        "date": pa.date32(),
        "boolean": pa.bool_(),
        "binary": pa.binary(),
        "decimal(20,0)": pa.decimal128(20, 0),
    }
    return mapping[name]


@dataclass
class ChunkPartition(InputPartition):
    """One scan task: the (path, effective_txn) pairs of a single chunk
    — or of a single file when the store is provably duplicate-free."""

    files: list = field(default_factory=list)  # [(abs_path, effective_txn)]
    dedup_free: bool = False


def register_matdb_source(spark) -> None:
    """Register the ``matdb`` format with a session (idempotent).
    Python-source filter pushdown ships behind a conf flag in Spark 4
    and a reader that implements pushFilters REQUIRES it on — enable
    it with the registration.

    Child-session caveat (Spark 4.1, pinned by tests/
    test_catalog_persist.py::test_child_session_python_source_
    limitation_pinned): once an ANCESTOR session has registered this
    name, a ``spark.newSession()`` child can neither see the
    registration (reads fail DATA_SOURCE_NOT_FOUND) nor re-register
    it — the first attempt silently no-ops and an explicit retry
    raises DATA_SOURCE_ALREADY_EXISTS. That error is swallowed here
    so ancestor-owned sessions keep working; consumers needing a
    genuinely fresh session must use a fresh PROCESS (the catalog
    sidecar's returning-user flow)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        spark.dataSource.register(MatdbDataSource)
    except Exception as e:  # AnalysisException, py4j-wrapped
        if "DATA_SOURCE_ALREADY_EXISTS" not in str(e):
            raise


class MatdbDataSource(DataSource):
    """``format("matdb")``: options are ``path`` (the database
    directory; also the ``load(path)`` positional) and optional
    ``as_of`` (txn id — the time-travel horizon, database.py begin)."""

    @classmethod
    def name(cls) -> str:
        return "matdb"

    def _db_path(self) -> str:
        p = self.options.get("path")
        if not p:
            raise ValueError(
                "matdb source requires a database path: "
                "spark.read.format('matdb').load('/path/to/db'). "
                "Note a catalog table (CREATE TABLE ... USING matdb) "
                "cannot work yet: Spark 4.1's Python Data Source API "
                "does not forward table OPTIONS/LOCATION to the reader "
                "(probed: reader-time options arrive empty) — use the "
                "DDL shim instead: matdb_spark.ddl.sql(spark, \"CREATE "
                "TABLE ... USING matdb LOCATION '...' TBLPROPERTIES "
                "('chunks'='dim=size,...')\"), or register a view: "
                "matdb_spark.catalog.register_store(spark, name, p)"
            )
        # the session catalog hands CREATE TABLE ... USING matdb
        # locations over as file: URIs; the manifest layer is plain-os
        if p.startswith("file:"):
            from urllib.parse import urlparse

            parsed = urlparse(p)
            p = parsed.path or p[len("file:"):]
        return os.path.abspath(p)

    def schema(self):
        from pyspark.sql import types as T

        sch = Schema.load(os.path.join(self._db_path(), SCHEMA_FILENAME))
        base = sch.spark_schema()
        if self.options.get("feed") == "changes":
            # CDC stream form: snapshot columns + the change tag and
            # the writing commit (database.py changes())
            return T.StructType(
                list(base.fields)
                + [
                    T.StructField("change_type", T.StringType(), False),
                    T.StructField("__txn", T.LongType(), False),
                ]
            )
        return base

    def reader(self, schema) -> "MatdbSnapshotReader":
        if self.options.get("feed") == "changes":
            raise ValueError(
                "the matdb change feed is a STREAMING source — use "
                "spark.readStream.format('matdb').option('feed', "
                "'changes'); for a bounded window use the library's "
                "Database.changes(since, until)"
            )
        as_of = self.options.get("as_of")
        return MatdbSnapshotReader(
            self._db_path(), int(as_of) if as_of is not None else None
        )

    def streamReader(self, schema) -> "MatdbChangesStreamReader":
        if self.options.get("feed") != "changes":
            raise ValueError(
                "matdb streaming read requires .option('feed', 'changes') "
                "(the CDC source); the snapshot is a batch read"
            )
        since = self.options.get("since")
        return MatdbChangesStreamReader(
            self._db_path(), int(since) if since is not None else None
        )

    def writer(self, schema, overwrite: bool) -> "MatdbBatchWriter":
        db_path = self._db_path()
        pending = _check_write_schema(
            db_path, schema, evolve=_truthy(self.options.get("evolve"))
        )
        fr = self.options.get("flush_rows")
        return MatdbBatchWriter(
            db_path,
            overwrite,
            flush_rows=int(fr) if fr is not None else None,
            pending_evolution=pending,
        )

    def streamWriter(self, schema, overwrite: bool) -> "MatdbStreamWriter":
        if overwrite:
            raise ValueError(
                "matdb streaming sink supports append output mode only"
            )
        db_path = self._db_path()
        pending = _check_write_schema(
            db_path, schema, evolve=_truthy(self.options.get("evolve"))
        )
        fr = self.options.get("flush_rows")
        return MatdbStreamWriter(
            db_path,
            self.options.get("source") or "matdb-dsv2-stream",
            flush_rows=int(fr) if fr is not None else None,
            pending_evolution=pending,
        )


class MatdbSnapshotReader(DataSourceReader):
    def __init__(self, db_path: str, as_of: int | None):
        self.db_path = db_path
        self.as_of = as_of
        self.schema_obj = Schema.load(os.path.join(db_path, SCHEMA_FILENAME))
        self.bounds: dict[str, tuple] = {}

    # ---- filter pushdown (pruning only) ------------------------------
    def pushFilters(self, filters):
        """Fold dimension-range filters into ``bounds`` for the same
        driver-side pruning the library path applies (tier-0 manifest
        stats + chunk directories), then hand EVERY filter back to
        Spark: dim filters are merely re-checked (free), and value
        filters MUST run after version resolution — pre-resolution
        value filtering would change which version wins."""
        dims = {d.name: d for d in self.schema_obj.dimensions}

        def tighten(name: str, lo=None, hi=None) -> None:
            clo, chi = self.bounds.get(name, (None, None))
            if lo is not None:
                clo = lo if clo is None else max(clo, lo)
            if hi is not None:
                chi = hi if chi is None else min(chi, hi)
            self.bounds[name] = (clo, chi)

        for f in filters:
            attr = getattr(f, "attribute", None)
            col = attr[0] if attr and len(attr) == 1 else None
            if col not in dims:
                continue
            integral = dims[col].type in ("long", "int")
            if isinstance(f, EqualTo):
                tighten(col, f.value, f.value)
            elif isinstance(f, GreaterThanOrEqual):
                tighten(col, lo=f.value)
            elif isinstance(f, LessThanOrEqual):
                tighten(col, hi=f.value)
            elif isinstance(f, GreaterThan) and integral:
                tighten(col, lo=f.value + 1)
            elif isinstance(f, LessThan) and integral:
                tighten(col, hi=f.value - 1)
            elif isinstance(f, In) and f.values:
                try:
                    tighten(col, lo=min(f.values), hi=max(f.values))
                except TypeError:
                    pass
        return filters  # Spark re-applies everything (see docstring)

    # ---- driver-side planning ----------------------------------------
    def partitions(self):
        horizon = self._horizon()
        visible = manifest.visible_txn_ids(self.db_path, horizon)
        if self.bounds:
            from matdb_spark.stats import txn_intersects

            visible = [
                t
                for t in visible
                if txn_intersects(
                    manifest.read_manifest_cached(self.db_path, t).get("stats"),
                    self.bounds,
                )
            ]
        dedup_free = len(visible) == 1 and bool(
            manifest.read_manifest_cached(self.db_path, visible[0]).get(
                "unique_keys"
            )
        )
        rank = {}
        for t in visible:
            vr = manifest.read_manifest_cached(self.db_path, t).get("version_rank")
            if vr is not None and int(vr) != int(t):
                rank[int(t)] = int(vr)
        cranges = _chunk_ranges(self.schema_obj, self.bounds)
        files: list[tuple[str, int]] = []  # (abs path, effective txn)
        for t in visible:
            tdir = manifest.txn_data_dir(self.db_path, t)
            fl = manifest.read_manifest_cached(self.db_path, t).get("files")
            if fl is None:  # legacy/capped manifest: walk the txn dir
                fl = [
                    os.path.relpath(os.path.join(r, f), tdir)
                    for r, _, fs in os.walk(tdir)
                    for f in fs
                    if f.endswith(".parquet")
                ]
            eff = rank.get(t, t)
            files.extend(
                (os.path.join(tdir, rel), eff)
                for rel in _select_manifest_files(fl, cranges)
            )
        if not files:
            return [ChunkPartition(files=[], dedup_free=dedup_free)]
        if dedup_free:
            # no resolution needed: maximum parallelism, one task/file
            return [ChunkPartition(files=[fe], dedup_free=True) for fe in files]
        groups: dict[tuple, list] = {}
        for path, eff in files:
            key = tuple(
                sorted(
                    p
                    for p in path.split(os.sep)
                    if p.startswith("__chunk_") and "=" in p
                )
            )
            groups.setdefault(key, []).append((path, eff))
        return [ChunkPartition(files=g, dedup_free=False) for g in groups.values()]

    def _horizon(self) -> int:
        committed = manifest.committed_txn_ids(self.db_path)
        current = max(committed, default=0) + 1
        if self.as_of is None:
            return current
        if self.as_of >= current:
            raise ValueError(
                f"as_of={self.as_of} is in the future (next txn {current})"
            )
        gone = manifest.missing_history(self.db_path, self.as_of)
        if gone:
            raise ValueError(
                f"time-travel snapshot as_of={self.as_of} is unreadable: "
                f"txns {gone} were vacuumed after a later compaction"
            )
        return self.as_of + 1

    # ---- executor-side read ------------------------------------------
    def read(self, partition: ChunkPartition):
        """One chunk's resolution as a pure-Arrow pipeline: read each
        file (missing evolved value columns materialize as typed
        nulls), stamp its effective txn, sort by (dims, txn, seq),
        keep the LAST row per key (== max_by((txn, seq)) of the JVM
        path), drop all-null-value rows (block.rs:277-279: unset cells
        never appear), and emit batches."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.dataset as ds

        sch = self.schema_obj
        dims, vals = sch.dim_names, sch.value_names
        out_fields = [
            pa.field(d.name, _arrow_type(d.type), nullable=False)
            for d in sch.dimensions
        ] + [pa.field(v.name, _arrow_type(v.type)) for v in sch.values]
        out_schema = pa.schema(out_fields)
        if not partition.files:
            yield from pa.table(
                {f.name: pa.array([], f.type) for f in out_fields}
            ).to_batches()
            return
        file_schema = pa.schema(
            [pa.field(d.name, _arrow_type(d.type)) for d in sch.dimensions]
            + [pa.field(v.name, _arrow_type(v.type)) for v in sch.values]
            + [pa.field(SEQ_COL, pa.int64())]
        )
        tables = []
        for path, eff in partition.files:
            t = ds.dataset(path, schema=file_schema, format="parquet").to_table(
                columns=dims + vals + ([] if partition.dedup_free else [SEQ_COL])
            )
            if not partition.dedup_free:
                t = t.append_column(
                    "__txn", pa.array([eff] * len(t), pa.int64())
                )
            tables.append(t)
        t = tables[0] if len(tables) == 1 else pa.concat_tables(tables)
        if not partition.dedup_free and len(t):
            t = t.sort_by(
                [(d, "ascending") for d in dims]
                + [("__txn", "ascending"), (SEQ_COL, "ascending")]
            )
            # winner = last row of each key group after the sort
            if len(t) > 1:
                neq = np.zeros(len(t) - 1, dtype=bool)
                for d in dims:
                    a = t[d].to_numpy(zero_copy_only=False)
                    neq |= a[:-1] != a[1:]
                mask = np.append(neq, True)
            else:
                mask = np.array([True])
            t = t.filter(pa.array(mask)).select(dims + vals)
        else:
            t = t.select(dims + vals)
        if vals and len(t):
            import pyarrow.compute as pc

            any_set = pc.is_valid(t[vals[0]])
            for v in vals[1:]:
                any_set = pc.or_(any_set, pc.is_valid(t[v]))
            t = t.filter(any_set)
        yield from t.cast(out_schema).to_batches()


# ------------------------------------------------------------- writer
class _MatdbCommitMessage(WriterCommitMessage):
    """Per-task result: files this attempt wrote (relative to the txn
    data dir — or to ``base`` when staged), row count, and
    per-integral-dim [min, max]."""

    def __init__(self, files, rows, dims_minmax, base=None):
        self.files = files
        self.rows = rows
        self.dims_minmax = dims_minmax
        self.base = base  # staging root (stream writer); None = in-place


#: Per-chunk buffer bound of the task-side writer: a chunk's buffered
#: rows flush to their own parquet file at this size, so a task's
#: Python-object footprint stays O(flush_rows × touched chunks) no
#: matter how large its input partition is (at 100 TB, input splits
#: are maxPartitionBytes-sized — buffering a whole split as Python
#: tuples would be several GB). Each flushed file is individually
#: key-sorted, which is all the row-group-stats contract needs; the
#: library writer also emits several files per chunk.
DEFAULT_FLUSH_ROWS = 262_144


def _write_segment_files(iterator, schema_obj, base_dir, flush_rows=None):
    """Task-side segment write shared by the batch and stream writers:
    route rows to chunks (the exact _chunked floor arithmetic), sort by
    key within each file, stamp the shared write sequence, write zstd
    parquet with CANONICAL column types under
    ``base_dir/seg=0/__chunk_*/part-<uuid>.parquet``. Per-chunk buffers
    flush incrementally at ``flush_rows`` (memory bound). Returns
    (relative files, row count, per-integral-dim [min, max])."""
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    from matdb_spark.scan import _floor_div

    if flush_rows is None:
        flush_rows = DEFAULT_FLUSH_ROWS
    sch = schema_obj
    dims, vals = sch.dim_names, sch.value_names
    cols = dims + vals
    chunked = sch.chunked_dims
    arrow_fields = [
        pa.field(d.name, _arrow_type(d.type), nullable=False)
        for d in sch.dimensions
    ] + [pa.field(v.name, _arrow_type(v.type)) for v in sch.values]
    arrow_fields.append(pa.field(SEQ_COL, pa.int64(), nullable=False))
    out_schema = pa.schema(arrow_fields)
    stat_dims = [
        (i, d.name)
        for i, d in enumerate(sch.dimensions)
        if d.type in ("long", "int")
    ]
    files, mm = [], {}
    total = 0

    def flush(key: tuple, rows: list) -> None:
        nonlocal total
        rows.sort(key=lambda r: tuple(r[: len(dims)]))
        arrays = [
            pa.array([r[i] for r in rows], type=f.type)
            for i, f in enumerate(arrow_fields[:-1])
        ]
        arrays.append(pa.array([1] * len(rows), type=pa.int64()))
        table = pa.Table.from_arrays(arrays, schema=out_schema)
        rel_dir = "/".join(["seg=0"] + [f"{c}={int(v)}" for c, v in key])
        os.makedirs(os.path.join(base_dir, rel_dir), exist_ok=True)
        rel = f"{rel_dir}/part-{uuid.uuid4().hex}.parquet"
        pq.write_table(table, os.path.join(base_dir, rel), compression="zstd")
        files.append(rel)
        total += len(rows)
        for i, name in stat_dims:
            vsd = [r[i] for r in rows]
            lo, hi = min(vsd), max(vsd)
            cur = mm.get(name)
            mm[name] = (
                [lo, hi] if cur is None else [min(cur[0], lo), max(cur[1], hi)]
            )

    by_chunk: dict[tuple, list] = {}
    for row in iterator:
        parts = []
        for d in chunked:
            v = row[d.name]
            if v is None:
                raise ValueError(
                    f"null dimension {d.name!r}: dimension values are "
                    f"the key and must be non-null"
                )
            parts.append((d.chunk_col, _floor_div(v, d.chunk_size)))
        for d in sch.dimensions:
            if not d.chunk_size and row[d.name] is None:
                raise ValueError(f"null dimension {d.name!r}")
        key = tuple(parts)
        bucket = by_chunk.setdefault(key, [])
        bucket.append(tuple(row[c] for c in cols))
        if len(bucket) >= flush_rows:
            flush(key, bucket)
            by_chunk[key] = []
    for key, rows in by_chunk.items():
        if rows:
            flush(key, rows)
    return files, total, mm


def _merge_messages(messages, schema_obj):
    """(sorted rel files or (base, rel) pairs, stats-or-None) from the
    successful tasks' commit messages — the library's stats rule:
    attach stats only when every stat-typed dim saw rows (partial
    stats must read as 'cannot prune')."""
    files = []
    rows = 0
    dims_mm: dict[str, list] = {}
    stat_names = {
        d.name for d in schema_obj.dimensions if d.type in ("long", "int")
    }
    for m in messages:
        if m is None:
            continue
        if m.base is None:
            files.extend(m.files)
        else:
            files.extend((m.base, f) for f in m.files)
        rows += m.rows
        for name, (lo, hi) in m.dims_minmax.items():
            cur = dims_mm.get(name)
            dims_mm[name] = (
                [lo, hi] if cur is None else [min(cur[0], lo), max(cur[1], hi)]
            )
    stats = (
        {"rows": rows, "dims": dims_mm}
        if rows and set(dims_mm) == stat_names
        else None
    )
    return files, stats


class MatdbBatchWriter(DataSourceWriter):
    """``df.write.format("matdb").mode("append"|"overwrite").save(db)``
    — one atomic MVCC transaction per save.

    The txn id is reserved on the DRIVER (O_CREAT|O_EXCL — the same
    claim the library's allocate_txn_id makes, so a concurrent library
    writer can never collide with a DSv2 writer). Each task writes
    its rows as parquet under ``data/txn=<t>/seg=0/__chunk_*/`` with
    uuid file names — chunk routing, within-file key sort, canonical
    column types, and the shared write sequence all exactly as
    transaction.py's _write_segment lays them down. ``commit``
    publishes ONE manifest whose file list comes from the successful
    task attempts' commit messages — a speculative or retried task's
    orphan files are never listed, hence never visible (the
    manifest-resolved read path ignores them; a later compaction's
    vacuum removes the directory wholesale). ``abort`` discards the
    staged directory and the reservation.

    ``mode("overwrite")`` publishes with ``replaces`` = every txn
    committed when the writer was created — the table atomically
    becomes exactly the written rows, using the same supersede
    mechanism compaction uses (readers switch atomically; history
    remains time-travelable until vacuum).

    Duplicate keys WITHIN one save share the single write sequence and
    resolve arbitrarily — the add_dataframe single-call contract
    (transaction.py:111). Null dimension values raise loudly: a null
    key cannot be chunk-routed and the engine's key contract is
    non-null dims."""

    def __init__(
        self,
        db_path: str,
        overwrite: bool,
        flush_rows: int | None = None,
        pending_evolution: list | None = None,
    ):
        self.db_path = db_path
        # pending evolved columns are part of the write's schema view
        # so tasks lay files down with them; schema.json grows them
        # only in commit() — an aborted write evolves nothing
        self.pending_evolution = pending_evolution or []
        self.schema_obj = _schema_with_pending(
            Schema.load(os.path.join(db_path, SCHEMA_FILENAME)),
            self.pending_evolution,
        )
        self.overwrite = overwrite
        # carried as writer state so it survives the pickle to workers
        self.flush_rows = flush_rows
        self.txn_id = manifest.reserve_txn_id(db_path, start=1)
        self.replaces = (
            manifest.committed_txn_ids(db_path) if overwrite else None
        )

    def write(self, iterator):
        tdir = manifest.txn_data_dir(self.db_path, self.txn_id)
        files, rows, mm = _write_segment_files(
            iterator, self.schema_obj, tdir, flush_rows=self.flush_rows
        )
        return _MatdbCommitMessage(files, rows, mm)

    def commit(self, messages):
        files, stats = _merge_messages(messages, self.schema_obj)
        payload: dict = {"files": sorted(files)}
        if stats is not None:
            payload["stats"] = stats
        # schema evolution commits WITH the transaction: persisted only
        # now that every task succeeded, immediately before publish
        _apply_pending_evolution(self.db_path, self.pending_evolution)
        manifest.publish(
            self.db_path,
            self.txn_id,
            segment_count=1,
            replaces=self.replaces or None,
            extra=payload,
        )
        manifest.release_txn_reservation(self.db_path, self.txn_id)
        # accelerator only: a fold failure after publish must never
        # fail the commit (Spark would call abort() on a committed txn)
        try:
            manifest.maybe_checkpoint(self.db_path)
        except Exception as e:  # pragma: no cover - env-dependent
            warnings.warn(f"post-commit checkpoint fold failed: {e}")

    def abort(self, messages):
        # discard_txn_data refuses once a manifest exists for the txn
        # (abort after a successful publish must not delete live data)
        manifest.discard_txn_data(self.db_path, self.txn_id)
        manifest.release_txn_reservation(self.db_path, self.txn_id)


#: staging area for the stream writer's task outputs; swept by
#: manifest.recover() with the same staleness grace as txn debris
STREAM_STAGING_DIR = "_stream_staging"


class MatdbStreamWriter(DataSourceStreamWriter):
    """``df.writeStream.format("matdb").option("checkpointLocation",
    ...).start(db)`` — one MVCC transaction per micro-batch,
    exactly-once end-to-end.

    Tasks don't know the batch's txn id (the Python stream-writer API
    creates one writer for the query's lifetime), so they STAGE their
    chunk-routed parquet under ``data/_stream_staging/<task-uuid>/``
    and the driver's per-batch ``commit`` reserves a txn id, MOVES the
    staged files into ``data/txn=<t>/`` (same-FS renames; on an object
    store these are copies, still safe — visibility comes only from
    the manifest), and publishes stamped with ``(stream_source,
    batch_id)``. A replayed batch (crash between manifest publish and
    checkpoint advance) is recognized exactly as the library sink does
    (manifest.max_committed_batch_id — stamps survive compaction via
    the carried ``stream_batch_ids``) and commits nothing. Crash
    debris in the staging area is invisible to every reader and swept
    by ``recover()`` once stale.

    ``option("source", name)`` identifies the logical stream in
    manifests; set it when more than one stream writes the same store.
    For compaction scheduling under standing ingest, the library sink
    (streaming/ingest.stream_into_database) remains the full-featured
    path — this surface is the format-string form of the same
    protocol."""

    def __init__(
        self,
        db_path: str,
        source: str,
        flush_rows: int | None = None,
        pending_evolution: list | None = None,
    ):
        self.db_path = db_path
        self.pending_evolution = pending_evolution or []
        self.schema_obj = _schema_with_pending(
            Schema.load(os.path.join(db_path, SCHEMA_FILENAME)),
            self.pending_evolution,
        )
        self.source = source
        self.flush_rows = flush_rows
        self._last_committed: int | None = None

    def write(self, iterator):
        import uuid

        base = os.path.join(
            manifest.data_dir(self.db_path), STREAM_STAGING_DIR, uuid.uuid4().hex
        )
        files, rows, mm = _write_segment_files(
            iterator, self.schema_obj, base, flush_rows=self.flush_rows
        )
        return _MatdbCommitMessage(files, rows, mm, base=base)

    def _staging_roots(self, messages):
        return {m.base for m in messages if m is not None and m.base}

    def commit(self, messages, batchId):
        import shutil as _sh

        if self._last_committed is None:
            prev = manifest.max_committed_batch_id(self.db_path, self.source)
            self._last_committed = -1 if prev is None else prev
        if int(batchId) <= self._last_committed:
            for root in self._staging_roots(messages):
                _sh.rmtree(root, ignore_errors=True)
            return  # replayed batch: already committed, a no-op
        files, stats = _merge_messages(messages, self.schema_obj)
        txn = manifest.reserve_txn_id(self.db_path, start=1)
        tdir = manifest.txn_data_dir(self.db_path, txn)
        rels = []
        for base, rel in files:
            dst = os.path.join(tdir, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.replace(os.path.join(base, rel), dst)
            rels.append(rel)
        payload: dict = {
            "files": sorted(rels),
            "stream_source": self.source,
            "batch_id": int(batchId),
        }
        if stats is not None:
            payload["stats"] = stats
        # evolution commits with the first non-replayed batch (a crash
        # between this and publish leaves an additive all-null column;
        # the replayed batch re-runs this idempotently)
        _apply_pending_evolution(self.db_path, self.pending_evolution)
        self.pending_evolution = []
        manifest.publish(self.db_path, txn, segment_count=1, extra=payload)
        manifest.release_txn_reservation(self.db_path, txn)
        self._last_committed = int(batchId)
        # streaming commit rates are exactly what makes an unfolded
        # manifest log O(#batches) to plan against — fold periodically.
        # Accelerator only: never let a fold failure fail the batch.
        try:
            manifest.maybe_checkpoint(self.db_path)
        except Exception as e:  # pragma: no cover - env-dependent
            warnings.warn(f"post-commit checkpoint fold failed: {e}")
        for root in self._staging_roots(messages):
            _sh.rmtree(root, ignore_errors=True)

    def abort(self, messages, batchId):
        import shutil as _sh

        for root in self._staging_roots(messages):
            _sh.rmtree(root, ignore_errors=True)


# ------------------------------------------------------- CDC stream source
class MatdbChangesStreamReader(DataSourceStreamReader):
    """``spark.readStream.format("matdb").option("feed", "changes")
    .load(db)`` — the change feed (database.py changes/follow_changes)
    as a Structured Streaming SOURCE.

    Offsets are manifest cursors: ``latestOffset`` is the store's
    ``safe_feed_head`` — the low-watermark below which no in-flight
    txn can still publish, the exact rule follow_changes polls with —
    so out-of-order manifest arrival under concurrent writers can
    never skip a commit. Each micro-batch covers the commit window
    ``(start, end]`` and emits its NET effect: for every key written
    in the window, the newest (txn, seq) version, tagged
    ``change_type`` 'upsert'/'delete' (all-null tombstone) and
    ``__txn``. Compaction commits (``replaces`` manifests) are
    rewrites of old content, not new writes — excluded, like
    changes(include_compactions=False).

    The window resolution is chunk-local (the snapshot reader's
    argument: a key's versions share a chunk), so partitions = the
    window's chunks and the source shuffles nothing. Reading costs
    the WINDOW's segments only — file lists come from the window
    manifests, never a directory listing of the table.

    ``option("since", N)`` starts the cursor at commit N (0 = replay
    the full history); default is the head at query start — the
    subscribe-from-now contract of follow_changes."""

    def __init__(self, db_path: str, since: int | None):
        self.db_path = db_path
        self.schema_obj = Schema.load(os.path.join(db_path, SCHEMA_FILENAME))
        self._initial = (
            manifest.safe_feed_head(db_path) if since is None else int(since)
        )

    def initialOffset(self) -> dict:
        return {"cursor": self._initial}

    def latestOffset(self) -> dict:
        return {"cursor": manifest.safe_feed_head(self.db_path)}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["cursor"]), int(end["cursor"])
        window = []
        for t in manifest.committed_txn_ids(self.db_path):
            if not (lo < t <= hi):
                continue
            if manifest.read_manifest_cached(self.db_path, t).get("replaces"):
                continue  # compaction rewrite, not a logical change
            window.append(t)
        files: list[tuple[str, int]] = []
        for t in window:
            tdir = manifest.txn_data_dir(self.db_path, t)
            fl = manifest.read_manifest_cached(self.db_path, t).get("files")
            if fl is None:
                fl = [
                    os.path.relpath(os.path.join(r, f), tdir)
                    for r, _, fs in os.walk(tdir)
                    for f in fs
                    if f.endswith(".parquet")
                ]
            files.extend((os.path.join(tdir, rel), t) for rel in fl)
        if not files:
            return [ChunkPartition(files=[], dedup_free=False)]
        groups: dict[tuple, list] = {}
        for path, eff in files:
            key = tuple(
                sorted(
                    p
                    for p in path.split(os.sep)
                    if p.startswith("__chunk_") and "=" in p
                )
            )
            groups.setdefault(key, []).append((path, eff))
        return [ChunkPartition(files=g, dedup_free=False) for g in groups.values()]

    def read(self, partition: ChunkPartition):
        """Window-net-effect rows for one chunk: newest (txn, seq) per
        key over the WINDOW segments only, tombstones kept and tagged
        'delete' (a scan drops them; a feed must deliver them)."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.dataset as ds

        sch = self.schema_obj
        dims, vals = sch.dim_names, sch.value_names
        out_fields = (
            [
                pa.field(d.name, _arrow_type(d.type), nullable=False)
                for d in sch.dimensions
            ]
            + [pa.field(v.name, _arrow_type(v.type)) for v in sch.values]
            + [pa.field("change_type", pa.string(), nullable=False),
               pa.field("__txn", pa.int64(), nullable=False)]
        )
        out_schema = pa.schema(out_fields)
        if not partition.files:
            yield from pa.table(
                {f.name: pa.array([], f.type) for f in out_fields}
            ).to_batches()
            return
        file_schema = pa.schema(
            [pa.field(d.name, _arrow_type(d.type)) for d in sch.dimensions]
            + [pa.field(v.name, _arrow_type(v.type)) for v in sch.values]
            + [pa.field(SEQ_COL, pa.int64())]
        )
        tables = []
        for path, eff in partition.files:
            t = ds.dataset(path, schema=file_schema, format="parquet").to_table(
                columns=dims + vals + [SEQ_COL]
            )
            t = t.append_column("__txn", pa.array([eff] * len(t), pa.int64()))
            tables.append(t)
        t = tables[0] if len(tables) == 1 else pa.concat_tables(tables)
        if len(t):
            t = t.sort_by(
                [(d, "ascending") for d in dims]
                + [("__txn", "ascending"), (SEQ_COL, "ascending")]
            )
            if len(t) > 1:
                neq = np.zeros(len(t) - 1, dtype=bool)
                for d in dims:
                    a = t[d].to_numpy(zero_copy_only=False)
                    neq |= a[:-1] != a[1:]
                mask = np.append(neq, True)
            else:
                mask = np.array([True])
            t = t.filter(pa.array(mask))
        t = t.select(dims + vals + ["__txn"])
        if vals and len(t):
            any_set = pc.is_valid(t[vals[0]])
            for v in vals[1:]:
                any_set = pc.or_(any_set, pc.is_valid(t[v]))
            ctype = pc.if_else(any_set, pa.scalar("upsert"), pa.scalar("delete"))
        else:
            ctype = pa.array(["upsert"] * len(t), pa.string())
        t = t.append_column("change_type", ctype)
        t = t.select(dims + vals + ["change_type", "__txn"])
        yield from t.cast(out_schema).to_batches()

    def commit(self, end: dict) -> None:
        pass  # cursor durability is the checkpoint's job

    def stop(self) -> None:
        pass
