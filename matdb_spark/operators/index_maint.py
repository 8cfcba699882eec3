"""Offline maintenance for the persisted batch-admission indexes
(MinHash banding index, IVF vector index).

Appends (`append_minhash_index`, `append_ivf_index`) add one file set
per admitted batch; after many batches a partition directory holds
hundreds of small parquet files and every probe pays their open/footer
cost. `compact_index` rewrites the index with the same physical layout
the original writer used (partition column intact, rows re-clustered),
collapsing the small files — the standing-index equivalent of the MVCC
store's `compact()` + `vacuum()`.

The swap is crash-safe for READERS (the live directory is replaced via
two atomic renames, and a crash between them leaves the backup to
recover from) but the indexes carry no manifest protocol by design —
they are plain parquet (any engine can read them), so compaction is an
OFFLINE maintenance step: do not run it concurrently with appends, and
do not start probes mid-swap. A pipeline that needs online compaction
under concurrent writers should store the index in an MVCC store
instead (Database + compact(), which has exactly that protocol).
"""

from __future__ import annotations

import os
import shutil


def _rewrite_and_swap(
    df,
    path: str,
    partition_col,
    cluster_cols: list[str],
    sidecars: tuple[str, ...],
) -> None:
    """One-shuffle rewrite of ``df`` into ``path``'s layout, then the
    atomic directory swap (tmp write -> rename old to bak -> rename
    tmp live -> drop bak). Shared by compaction and purge so the swap
    protocol has exactly one implementation. ``partition_col`` is one
    column name or a list (multi-level layouts like the LSH index's
    table=/bucket=)."""
    pcols = [partition_col] if isinstance(partition_col, str) else list(partition_col)
    tmp = path + ".__compact_tmp"
    bak = path + ".__compact_bak"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(bak, ignore_errors=True)
    (
        df.repartitionByRange(*pcols, *cluster_cols)
        .sortWithinPartitions(*pcols, *cluster_cols)
        .write.partitionBy(*pcols)
        .parquet(tmp)
    )
    for sc in sidecars:
        src = os.path.join(path, sc)
        if os.path.isdir(src):
            shutil.copytree(src, os.path.join(tmp, sc))
    # two renames: readers see either the old or the new complete tree;
    # a crash in between leaves `bak` intact for manual recovery
    os.rename(path, bak)
    os.rename(tmp, path)
    shutil.rmtree(bak)


def compact_index(
    spark,
    path: str,
    partition_col: str,
    cluster_cols: list[str],
    sidecars: tuple[str, ...] = ("_centroids",),
    dedup_cols: list[str] | None = None,
) -> tuple[int, int]:
    """Rewrite the parquet index at ``path``: one pass through
    repartitionByRange over (partition, cluster) columns — so the
    rewrite itself is a single shuffle, no driver materialization —
    then an atomic directory swap. Sidecar directories (e.g. the IVF
    ``_centroids``) are carried over untouched. Returns (files_before,
    files_after) for observability.

    ``dedup_cols``: drop exact-duplicate rows on these columns during
    the rewrite. Crash-replayed admission appends (a crash between
    index append and streaming checkpoint — streaming/admission.py)
    leave byte-identical banding rows behind; they are harmless to
    probes (which count DISTINCT ids) but pure debris, and compaction
    is exactly the maintenance pass that should reclaim them."""

    def _count_files(p: str) -> int:
        n = 0
        for root, dirs, files in os.walk(p):
            dirs[:] = [d for d in dirs if d not in sidecars]
            n += sum(f.endswith(".parquet") for f in files)
        return n

    before = _count_files(path)
    df = spark.read.parquet(path)
    if dedup_cols is not None:
        df = df.dropDuplicates(dedup_cols)
    _rewrite_and_swap(df, path, partition_col, cluster_cols, sidecars)
    return before, _count_files(path)


def purge_index(
    spark,
    path: str,
    ids,
    id_col: str,
    partition_col: str,
    cluster_cols: list[str],
    sidecars: tuple[str, ...] = ("_centroids",),
) -> tuple[int, int]:
    """Deletion propagation: rewrite the index WITHOUT the given ids
    (an id list or a single-column DataFrame). The compliance story —
    when documents leave the corpus (takedown, opt-out, retention),
    their fingerprints must leave the admission index too, or they
    keep shadowing future near-identical content forever. Same
    one-shuffle rewrite + atomic swap as compact_index (the purge IS a
    compaction); offline maintenance, same caveats. Returns
    (rows_before, rows_after)."""
    from pyspark.sql import DataFrame, functions as F

    if not isinstance(ids, DataFrame):
        ids = spark.createDataFrame([(i,) for i in ids], f"{id_col} string").select(
            F.col(id_col).cast(spark.read.parquet(path).schema[id_col].dataType)
        )
    else:
        ids = ids.select(F.col(ids.columns[0]).alias(id_col))
    df = spark.read.parquet(path)
    before = df.count()
    kept = df.join(F.broadcast(ids.distinct()), id_col, "left_anti")
    # count from the plan, not a re-read: purging every row leaves an
    # empty (schema-less) tree that a parquet read cannot open — a
    # valid end state (admit_batch treats a band-less dir as no index)
    after = kept.count()
    _rewrite_and_swap(kept, path, partition_col, cluster_cols, sidecars)
    return before, after


def purge_minhash_index(spark, path: str, ids) -> tuple[int, int]:
    """Remove documents' banding rows from a MinHash admission index."""
    return purge_index(spark, path, ids, "doc_id", "band", ["key"], sidecars=())


def purge_ivf_index(spark, path: str, ids) -> tuple[int, int]:
    """Remove vectors from an IVF index (`_centroids` untouched —
    centroids are aggregates, not per-document data)."""
    return purge_index(spark, path, ids, "vec_id", "cell_id", ["vec_id"])


def compact_minhash_index(spark, path: str) -> tuple[int, int]:
    """Collapse a MinHash banding index's append debris (layout:
    band=<n>/ partitions, rows clustered by key — identical to
    write_minhash_index's). Also drops duplicate (doc_id, band, key)
    rows — the debris a crash-replayed admission append leaves behind
    — so maintenance, not a rebuild, is what reclaims them."""
    return compact_index(
        spark,
        path,
        "band",
        ["key"],
        sidecars=(),
        dedup_cols=["doc_id", "band", "key"],
    )


def compact_ivf_index(spark, path: str) -> tuple[int, int]:
    """Collapse an IVF index's append debris (layout: cell_id=<n>/
    partitions; `_centroids` sidecar preserved byte-for-byte)."""
    return compact_index(spark, path, "cell_id", ["vec_id"])


def purge_sq8_index(spark, path: str, ids) -> tuple[int, int]:
    """Remove vectors from a codes-only IVF-SQ8 index (`_centroids`
    and `_sq8` untouched — centroids and trained ranges are corpus
    aggregates, not per-document data; purging does not force a
    retrain, it only narrows the corpus the ranges were fit on)."""
    return purge_index(
        spark,
        path,
        ids,
        "vec_id",
        "cell_id",
        ["vec_id"],
        sidecars=("_centroids", "_sq8"),
    )


def compact_sq8_index(spark, path: str) -> tuple[int, int]:
    """Collapse an IVF-SQ8 index's append debris (layout: cell_id=<n>/
    partitions of code rows; `_centroids` and `_sq8` sidecars
    preserved byte-for-byte)."""
    return compact_index(
        spark, path, "cell_id", ["vec_id"], sidecars=("_centroids", "_sq8")
    )
