"""MVCC transaction: buffered writes, segment flush, atomic commit.

Re-creates the reference transaction lifecycle (src/transaction.rs):
``add_row`` (:31-42), ``flush`` (:90-119), ``commit`` (:60-65,
:121-136), ``rollback`` (:50-53, :138-150; also the drop default,
:163-168), ``query`` (:67-85) — on Parquet + the manifest protocol.

Two write paths:
- ``add_row`` / ``add_rows``: driver-buffered, reference-style point
  inserts. Fine for the embedded-API use case; ``flush`` turns the
  buffer into one segment write.
- ``add_dataframe``: the scale path. A distributed DataFrame is
  routed by chunk columns and written directly as a segment —
  no driver materialization, arbitrarily large inputs. This replaces
  the reference example's parser-threads→channel→writer pipeline
  (examples/sensor-log.rs:241-305) with Spark's own parallelism.

Every row carries a write sequence (``__seq``): within a transaction
the newest sequence wins at scan time, faithfully producing the
in-place-overwrite upsert semantics of the reference
(src/block.rs:45-49) without mutating files.
"""

from __future__ import annotations

import warnings
from typing import TYPE_CHECKING, Iterable, Iterator, Sequence

from pyspark.sql import DataFrame, Row, functions as F

from matdb_spark import manifest
from matdb_spark.scan import ScanSource, iterate_rows, scan_dataframe
from matdb_spark.schema import SEQ_COL

#: The packed (txn, seq) version key (scan.py) reserves 32 bits for
#: the per-txn write sequence and 31 for the txn id; both limits are
#: enforced at the cheap driver-side spots so the scan can pack
#: fearlessly. seq counts WRITE CALLS (add_row / add_dataframe), not
#: rows, so 2^32 is unreachable in practice.
_SEQ_LIMIT = 1 << 32

#: manifests stay small: a txn with more data files than this records
#: no file list and its scans fall back to filesystem listing
_MANIFEST_FILES_CAP = 20_000

if TYPE_CHECKING:
    from matdb_spark.database import Database


class Transaction:
    """One writer/reader transaction with snapshot isolation.

    The snapshot horizon and its visible manifest list are pinned at
    construction (reference: database.rs:68-72, :85-89). The txn id is
    allocated lazily at first flush (reference: transaction.rs:152-160).
    """

    def __init__(self, db: "Database", horizon: int, read_only: bool = False):
        self.db = db
        self.schema = db.schema
        self.horizon = horizon
        self.read_only = read_only
        self.visible_txns = manifest.visible_txn_ids(db.path, horizon)
        self.txn_id: int | None = None
        self.segments_flushed = 0
        self._buffer: list[tuple] = []
        self._seq = 0
        self._closed = False
        # Per-txn min/max dim bounds, merged across segments at flush
        # time and published in the manifest (stats.py). None once any
        # segment lacks stats (absent stats = cannot prune).
        self._txn_stats: dict | None = None
        self._first_segment_pending = True
        # Relative data-file paths accumulated per segment, published
        # in the manifest so scans skip filesystem listing. Becomes
        # None if the list grows past the manifest-bloat cap.
        self._txn_files: list[str] | None = []
        # Key-uniqueness tracking for the manifest's ``unique_keys``
        # stamp (scan.py dedup-free fast path): None = no writes yet;
        # True = exactly one deduplicated add_dataframe; False = any
        # other write history (could hold duplicate keys).
        self._unique_keys: bool | None = None

    # ---- writes -----------------------------------------------------
    def add_row(self, values: Sequence) -> None:
        """Point insert/upsert, positional (dims then values) like the
        reference's ``add_row(&[Datum])`` (transaction.rs:31-42)."""
        self._check_writable()
        expect = len(self.schema.column_names)
        if len(values) != expect:
            raise ValueError(f"expected {expect} column values, got {len(values)}")
        self._seq += 1
        if self._seq >= _SEQ_LIMIT:
            raise ValueError(
                "write-sequence overflow: one transaction made 2^32"
                " writes — split the load across transactions (the"
                " packed (txn, seq) version key reserves 32 bits for"
                " seq; scan.py)"
            )
        self._unique_keys = False
        self._buffer.append(tuple(values) + (self._seq,))

    def add_rows(self, rows: Iterable[Sequence]) -> None:
        for r in rows:
            self.add_row(r)

    def delete_row(self, key: Sequence) -> None:
        """Tombstone a key: upsert with every value cell None. The
        reference has no delete (SURVEY §1.5) — but its own data model
        implies one: unset cells never appear as rows (block.rs:277-279),
        so an all-null newest version is an invisible row. Tombstones
        disappear physically at the next compaction."""
        self.add_row(list(key) + [None] * len(self.schema.values))

    def delete_rows(self, keys: Iterable[Sequence]) -> None:
        for k in keys:
            self.delete_row(k)

    def add_dataframe(
        self,
        df: DataFrame,
        cluster_by: list | None = None,
        partial: bool = False,
        dedup: bool | str = False,
    ) -> None:
        """Bulk upsert of a distributed DataFrame (the 100 TB path).

        The frame must contain the schema's dimension and value columns.
        All rows in one call share a write sequence: duplicate keys
        *within* the call resolve arbitrarily (a distributed batch has
        no insertion order); across calls, later calls win.

        ``cluster_by`` overrides the within-partition sort order of the
        written segment (layout only — scan semantics are unaffected):
        a list of Columns/names, e.g. a z-order key from
        ``matdb_spark.zorder`` for multi-dim stats locality.

        ``partial=True`` allows the frame to omit value columns (dims
        are always required); omitted cells are written as null =
        "no write" under the reference's cell model (add_row touches
        only the cells it names, block.rs:45-49). Read the store with
        ``query(cell_merge=True)`` for those semantics — the default
        row-level scan treats the partial row as the whole new version.

        ``dedup`` earns the manifest's ``unique_keys`` stamp at WRITE
        time: when this is the transaction's only write, scans of a
        snapshot that is exactly this txn skip the version-dedup
        shuffle (scan.py fast path) — the load-once / read-many
        pattern gets dedup-free reads without a compaction.
        ``dedup=True`` deduplicates the frame on the key here (one
        extra shuffle at load; within-call duplicate keys already
        resolve arbitrarily, so dropping all but one is
        semantics-preserving). ``dedup="assume"`` skips that work on
        the CALLER'S GUARANTEE that keys are unique — a wrong promise
        silently produces duplicate rows in every scan, so only pass
        it for sources with an enforced key (e.g. an export of another
        store's resolved snapshot).
        """
        self._check_writable()
        # identity checks, not ==: dedup=1 passes `in (False, True, ...)`
        # membership yet would skip the `dedup is True` branch and still
        # stamp unique_keys — the silent-duplicates hazard validation
        # exists to block
        if not (dedup is False or dedup is True or dedup == "assume"):
            raise ValueError(f"dedup={dedup!r}; expected False, True, or 'assume'")
        if dedup is True and partial:
            # whole-row dedup is NOT semantics-preserving under the cell
            # model: of two partial rows for one key, dropDuplicates
            # keeps one arbitrarily and discards the other's non-null
            # cells that query(cell_merge=True) would have kept
            raise ValueError(
                "dedup=True cannot combine with partial=True (whole-row "
                "dedup drops cells that cell-level resolution keeps); "
                "use dedup='assume' if the keys are genuinely unique"
            )
        self._seq += 1
        if self._seq >= _SEQ_LIMIT:
            raise ValueError(
                "write-sequence overflow: one transaction made 2^32"
                " writes (see add_row)"
            )
        cols = []
        present = set(df.columns)
        for name in self.schema.dim_names:
            if name not in present:
                raise ValueError(f"missing dimension column {name!r}")
            cols.append(F.col(name))
        vtypes = {f.name: f.dataType for f in self.schema.spark_schema().fields}
        for name in self.schema.value_names:
            if name in present:
                cols.append(F.col(name))
            elif partial:
                cols.append(F.lit(None).cast(vtypes[name]).alias(name))
            else:
                raise ValueError(
                    f"missing value column {name!r} (pass partial=True to "
                    "write a partial-column upsert)"
                )
        stamped = df.select(*cols, F.lit(self._seq).alias(SEQ_COL))
        if dedup is True:
            stamped = stamped.dropDuplicates(self.schema.dim_names)
        first_write = self._unique_keys is None and not self._buffer
        self._write_segment(stamped, cluster_by=cluster_by)
        self._unique_keys = bool(dedup) and first_write

    def merge_dataframe(
        self,
        source: DataFrame,
        when_matched: str = "update",
        when_not_matched: str = "insert",
    ) -> None:
        """MERGE semantics composed from the engine's own primitives
        (SURVEY §2.1 O5 maps the reference's upsert to "MERGE INTO if
        we adopt Delta" — this is the native form, no Delta needed).

        ``when_matched``: 'update' (source row replaces), 'ignore'
        (existing row wins), or 'delete' (tombstone the key).
        ``when_not_matched``: 'insert' or 'ignore'.

        Matching is against THIS transaction's current visible state
        (snapshot + own writes). Implementation is a pair of semi/anti
        joins against the snapshot keys — one extra scan, no driver
        materialization; the default ('update', 'insert') shortcut is
        the plain upsert with no join at all.
        """
        if when_matched not in ("update", "ignore", "delete"):
            raise ValueError(f"when_matched={when_matched!r}")
        if when_not_matched not in ("insert", "ignore"):
            raise ValueError(f"when_not_matched={when_not_matched!r}")
        if when_matched == "update" and when_not_matched == "insert":
            self.add_dataframe(source)  # plain upsert — no join needed
            return

        dims = self.schema.dim_names
        existing_keys = self.query(ordered=False).select(*dims)
        matched = source.join(existing_keys, dims, "left_semi")
        unmatched = source.join(existing_keys, dims, "left_anti")

        parts: list[DataFrame] = []
        if when_matched == "update":
            parts.append(matched.select(*self.schema.column_names))
        elif when_matched == "delete":
            tombstones = matched.select(
                *dims,
                *[
                    F.lit(None).cast(self.schema.spark_schema()[v.name].dataType).alias(v.name)
                    for v in self.schema.values
                ],
            )
            parts.append(tombstones)
        if when_not_matched == "insert":
            parts.append(unmatched.select(*self.schema.column_names))
        if not parts:
            return
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=False)
        self.add_dataframe(out)

    # ---- flush / segments ------------------------------------------
    def _ensure_txn_id(self) -> int:
        if self.txn_id is None:
            self.txn_id = self.db.allocate_txn_id()
        return self.txn_id

    def _write_segment(self, stamped: DataFrame, cluster_by: list | None = None) -> None:
        """Write one segment (reference: one file per flush,
        segment.rs:30-46). Layout discipline = the engine's physical
        strategy at scale:
        - route rows by chunk columns (``partitionBy``) so the reader
          gets Hive partition pruning (reference chunk routing,
          schema.rs:28-38);
        - repartition by chunk before writing so each chunk's rows are
          produced by few tasks (bounded file counts at scale; AQE
          coalesces tiny outputs locally);
        - sort within partitions by key so Parquet row-group min/max
          stats act as the reference's zone maps (block.rs:210-232).
        """
        txn = self._ensure_txn_id()
        seg = self.segments_flushed
        seg_dir = f"{manifest.txn_data_dir(self.db.path, txn)}/seg={seg}"

        schema = self.schema
        from matdb_spark.scan import _chunked

        # Canonicalize column types so every segment file carries the
        # exact declared schema — mixed int/long inputs must not create
        # per-segment parquet schema drift (breaks multi-segment scans).
        canon = [
            F.col(f.name).cast(f.dataType).alias(f.name)
            for f in schema.spark_schema().fields
        ] + [F.col(SEQ_COL).cast("long").alias(SEQ_COL)]
        out = _chunked(stamped.select(*canon), schema)
        chunk_cols = schema.chunk_cols
        # cluster_by replaces the key sort (e.g. z-order interleave) —
        # a layout choice; chunk routing always stays outermost so
        # partition pruning is unaffected.
        sort_cols = chunk_cols + list(cluster_by or schema.dim_names)
        if cluster_by is not None:
            # Clustered rewrite: RANGE-partition on (chunks, cluster
            # key) so the clustering is GLOBAL — every task (hence
            # every file) owns a contiguous cluster-key range. A hash
            # repartition would scatter the key space across tasks and
            # cap locality at the file-interior level. (This is the
            # public OPTIMIZE ZORDER shape: range partition + sort.)
            ncols = [F.col(c) if isinstance(c, str) else c for c in sort_cols]
            try:
                # may be non-numeric on some platforms (e.g. "auto")
                nparts = int(
                    out.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
                )
            except ValueError:
                nparts = 200
            out = out.repartitionByRange(nparts, *ncols)
        elif chunk_cols:
            out = out.repartition(*[F.col(c) for c in chunk_cols])
        out = out.sortWithinPartitions(*sort_cols)
        writer = out.write.mode("error")
        for d in schema.dimensions:
            if d.bloom:
                # Parquet bloom filter per segment file: row-group
                # skipping for point probes on non-leading dims, where
                # the within-partition sort gives min/max stats no
                # selectivity (SURVEY §2.1 O8's zone maps only help
                # the leading key).
                writer = writer.option(f"parquet.bloom.filter.enabled#{d.name}", "true")
        if chunk_cols:
            writer = writer.partitionBy(*chunk_cols)
        writer.parquet(seg_dir)
        # ONE footer walk (no data scan) produces both manifest
        # artifacts: the txn-level stats zone map (planner prunes whole
        # transactions before any listing) and the segment's file paths
        # (scans resolve + chunk-prune their file sets from the
        # manifest alone — no filesystem listing job at read time).
        from matdb_spark.stats import collect_segment_info, merge_stats

        seg_stats, seg_files = collect_segment_info(seg_dir, schema)
        if self._first_segment_pending:
            self._txn_stats = seg_stats
            self._first_segment_pending = False
        else:
            self._txn_stats = merge_stats(self._txn_stats, seg_stats)
        if self._txn_files is not None:
            self._txn_files.extend(f"seg={seg}/{rel}" for rel in seg_files)
            if len(self._txn_files) > _MANIFEST_FILES_CAP:
                # a pathological txn (millions of files) must not bloat
                # the manifest; scans fall back to listing for it
                self._txn_files = None
        self.segments_flushed += 1

    def flush(self) -> None:
        """Persist buffered rows as a new segment
        (reference: transaction.rs:90-119)."""
        self._check_open()
        if not self._buffer:
            return
        df = self.db.spark.createDataFrame(self._buffer, self.schema.staging_schema())
        self._buffer = []
        self._unique_keys = False
        self._write_segment(df)

    # ---- read -------------------------------------------------------
    def _source(self) -> ScanSource:
        return ScanSource(
            db_path=self.db.path,
            schema=self.schema,
            visible_txns=self.visible_txns,
            own_txn=self.txn_id,
            own_staged_segments=self.segments_flushed,
            buffered_rows=list(self._buffer),
        )

    def query(
        self,
        ordered: bool = True,
        include_txn: bool = False,
        cell_merge: bool = False,
    ) -> DataFrame:
        """The one query operator (reference: transaction.rs:67-85 →
        scan.rs): every visible row, one version per key, newest wins,
        in ascending key order. Returns a DataFrame — the full Spark
        analytics surface (joins/aggs/windows/SQL) applies on top.

        ``cell_merge=True`` resolves versions per VALUE CELL instead of
        per row — each column's newest non-null write wins
        independently, faithfully reproducing the reference's in-place
        cell overwrite (block.rs:45-49) for partial-column upserts
        (``add_dataframe(..., partial=True)``). Row-level (default)
        remains the mode that supports all-null tombstone deletes."""
        self._check_open()
        return scan_dataframe(
            self.db.spark,
            self._source(),
            ordered=ordered,
            include_txn=include_txn,
            cell_merge=cell_merge,
        )

    def query_range(
        self,
        bounds: dict[str, tuple],
        ordered: bool = True,
        include_txn: bool = False,
        cell_merge: bool = False,
    ) -> DataFrame:
        """Key-range scan: like ``query`` but with inclusive per-dim
        bounds ``{dim: (lo, hi)}`` (either side None for open) applied
        AT THE SCAN — chunked dims prune whole partition directories
        (the reference's chunk routing, schema.rs:28-38) and parquet
        row-group stats skip blocks inside them (its zone maps,
        segment.rs:138-163). The reference exposes no filtered query;
        this is its missing range-scan made first-class.

        Bounds may name DIMENSIONS only: a pre-dedup filter on a value
        column would drop old versions row-by-row and CHANGE version
        resolution (filter value columns on the returned DataFrame
        instead — that commutes)."""
        self._check_open()
        dims = set(self.schema.dim_names)
        bad = sorted(set(bounds or {}) - dims)
        if bad:
            raise ValueError(
                f"query_range bounds name non-dimension column(s) {bad}; "
                f"dimensions are {sorted(dims)}"
            )
        return scan_dataframe(
            self.db.spark,
            self._source(),
            ordered=ordered,
            include_txn=include_txn,
            bounds=bounds,
            cell_merge=cell_merge,
        )

    def query_points(
        self,
        keys: Iterable[Sequence],
        ordered: bool = True,
        include_txn: bool = False,
    ) -> DataFrame:
        """Point lookups: rows whose full dimension tuple is in
        ``keys``. Pushes down through all three pruning tiers — the
        envelope (per-dim min..max over the key set) drives manifest
        txn pruning + partition pruning + row-group stats, and the
        exact key-set predicate reaches the parquet scan (In /
        OR-of-ANDs pushdown; parquet bloom filters on dims, where
        enabled, catch the point probes the sort order can't). The
        key-set predicate references dim columns only, so it commutes
        with version dedup."""
        self._check_open()
        dims = self.schema.dim_names
        # accept mappings keyed by dim name as well as positional
        # sequences — tuple(dict) silently yields the KEY NAMES, which
        # previously produced a nonsense string envelope
        pts = [
            tuple(k[d] for d in dims) if isinstance(k, dict) else tuple(k)
            for k in keys
        ]
        # reject strings only where the SCHEMA says the dim is numeric —
        # string-typed (non-chunked) dimensions are legal and their keys
        # are legitimately strings; the blanket guard existed to catch
        # tuple(dict) misuse, which the mapping branch above now handles
        dim_types = [d.type for d in self.schema.dimensions]
        for p in pts:
            if len(p) != len(dims):
                raise ValueError(f"key {p!r} must have {len(dims)} dimension values")
            for v, dt, name in zip(p, dim_types, dims):
                if isinstance(v, str) and dt != "string":
                    raise TypeError(
                        f"key {p!r}: dimension {name!r} is {dt}, got a string "
                        "— pass value sequences or {dim: value} mappings"
                    )
        if not pts:
            return self.query(ordered=ordered, include_txn=include_txn).limit(0)
        env = {
            d: (min(p[i] for p in pts), max(p[i] for p in pts))
            for i, d in enumerate(dims)
        }
        if len(dims) == 1:
            pred = F.col(dims[0]).isin([p[0] for p in pts])
        else:
            pred = F.lit(False)
            for p in pts:
                clause = F.lit(True)
                for i, d in enumerate(dims):
                    clause = clause & (F.col(d) == F.lit(p[i]))
                pred = pred | clause
        return scan_dataframe(
            self.db.spark,
            self._source(),
            ordered=ordered,
            include_txn=include_txn,
            bounds=env,
            predicate=pred,
        )

    def query_rows(self) -> Iterator[Row]:
        """Iterate results reference-style without driver collect."""
        return iterate_rows(self.query(ordered=True))

    def sql_view(self, name: str) -> None:
        """Expose the snapshot as a temp view for spark.sql()."""
        self.query(ordered=False).createOrReplaceTempView(name)

    # ---- commit / rollback -----------------------------------------
    def commit(
        self, replaces: list[int] | None = None, extra: dict | None = None
    ) -> None:
        """Flush then atomically publish (reference: transaction.rs:60-65).

        A transaction that never wrote commits as a no-op (no txn id is
        ever allocated — mirroring lazy id allocation). ``replaces``
        marks this commit as a compaction superseding those txns;
        ``extra`` is recorded verbatim in the manifest payload."""
        self._check_open()
        self.flush()
        if self.txn_id is not None:
            payload = dict(extra or {})
            if self._unique_keys is True and "unique_keys" not in payload:
                payload["unique_keys"] = True
            if self._txn_stats is not None and "stats" not in payload:
                payload["stats"] = self._txn_stats
            if self._txn_files is not None and "files" not in payload:
                payload["files"] = self._txn_files
            manifest.publish(
                self.db.path,
                self.txn_id,
                self.segments_flushed,
                replaces=replaces,
                extra=payload or None,
            )
            self.db.note_committed(self.txn_id)
            # The txn is durably published from this point: close the
            # handle BEFORE any post-publish housekeeping so a failure
            # there can never route through rollback() and delete the
            # data of a committed txn.
            self._closed = True
            # fold the manifest log every N commits so snapshot
            # resolution stays one-checkpoint-read flat however long
            # the store lives (manifest.maybe_checkpoint docstring).
            # The checkpoint is purely a read ACCELERATOR — its failure
            # (ENOSPC, permissions) must never fail the commit.
            try:
                manifest.maybe_checkpoint(self.db.path)
            except Exception as e:  # pragma: no cover - env-dependent
                warnings.warn(f"post-commit checkpoint fold failed: {e}")
            # policy hook AFTER this txn is fully closed: the hook may
            # open (and commit) compaction transactions of its own
            self.db._after_commit(compaction=bool(replaces))
        self._closed = True

    def rollback(self) -> None:
        """Discard buffered rows and staged segments
        (reference: transaction.rs:50-53, :138-150)."""
        if self._closed:
            return
        self._buffer = []
        if self.txn_id is not None:
            manifest.discard_txn_data(self.db.path, self.txn_id)
            manifest.release_txn_reservation(self.db.path, self.txn_id)
        self._closed = True

    # Context-manager protocol: rollback is the default on exit, as in
    # the reference's Drop impl (transaction.rs:163-168).
    def __enter__(self) -> "Transaction":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        if not self._closed:
            self.rollback()

    def _check_open(self) -> None:
        if self._closed:
            raise RuntimeError("transaction is closed")

    def _check_writable(self) -> None:
        self._check_open()
        if self.read_only:
            raise RuntimeError(
                "time-travel (as_of) transactions are read-only: a write "
                "from a historical horizon would silently drop every "
                "commit after it"
            )
