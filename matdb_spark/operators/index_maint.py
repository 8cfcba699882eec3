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


def compact_index(
    spark,
    path: str,
    partition_col: str,
    cluster_cols: list[str],
    sidecars: tuple[str, ...] = ("_centroids",),
) -> tuple[int, int]:
    """Rewrite the parquet index at ``path``: one pass through
    repartitionByRange over (partition, cluster) columns — so the
    rewrite itself is a single shuffle, no driver materialization —
    then an atomic directory swap. Sidecar directories (e.g. the IVF
    ``_centroids``) are carried over untouched. Returns (files_before,
    files_after) for observability."""

    def _count_files(p: str) -> int:
        n = 0
        for root, dirs, files in os.walk(p):
            dirs[:] = [d for d in dirs if d not in sidecars]
            n += sum(f.endswith(".parquet") for f in files)
        return n

    before = _count_files(path)
    tmp = path + ".__compact_tmp"
    bak = path + ".__compact_bak"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(bak, ignore_errors=True)
    df = spark.read.parquet(path)
    (
        df.repartitionByRange(partition_col, *cluster_cols)
        .sortWithinPartitions(partition_col, *cluster_cols)
        .write.partitionBy(partition_col)
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
    return before, _count_files(path)


def compact_minhash_index(spark, path: str) -> tuple[int, int]:
    """Collapse a MinHash banding index's append debris (layout:
    band=<n>/ partitions, rows clustered by key — identical to
    write_minhash_index's)."""
    return compact_index(spark, path, "band", ["key"], sidecars=())


def compact_ivf_index(spark, path: str) -> tuple[int, int]:
    """Collapse an IVF index's append debris (layout: cell_id=<n>/
    partitions; `_centroids` sidecar preserved byte-for-byte)."""
    return compact_index(spark, path, "cell_id", ["vec_id"])
