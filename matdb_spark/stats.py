"""Manifest-level segment statistics (Iceberg-manifest-style pruning).

The reference persists per-block zone maps in the segment footer
(reference: src/block.rs:210-232 get_min_bounds/get_max_bounds;
src/segment.rs:138-163 BlockInfo{min_bounds,max_bounds}) and uses them
to activate blocks lazily during the merge scan (src/scan.rs:119-180).
Parquet row-group statistics already replay that role at the file
level — but only after the reader has LISTED and OPENED the files.

At 100 TB the listing itself is the cost: a snapshot may hold
thousands of transactions, each with many chunk directories. So the
commit manifest additionally carries per-transaction min/max bounds
per dimension, aggregated driver-side from the Parquet FOOTERS of the
just-written segment (no data scan — footer metadata only, O(files)
small reads). A key-range scan then drops entire transactions at
*planning* time, before any file listing or Spark job: three pruning
tiers — manifest stats (txn level) → Hive partition pruning (chunk
level) → Parquet row-group stats (page level).

Only integral/float dimension stats are recorded (the types chunking
supports plus float); anything else is left absent, and absent stats
always mean "cannot prune" — correctness never depends on stats.
"""

from __future__ import annotations

import os

# Types whose parquet footer min/max are directly comparable to Python
# bound values with exact semantics.
_STAT_TYPES = {"long", "int", "double", "float"}


def _iter_parquet_files(seg_dir: str):
    for root, _dirs, files in os.walk(seg_dir):
        for f in files:
            if f.endswith(".parquet"):
                yield os.path.join(root, f)


def list_segment_files(seg_dir: str) -> list[str]:
    """Relative (to ``seg_dir``) paths of the segment's parquet files.
    Recorded in the commit manifest so scans can resolve their file
    sets WITHOUT filesystem listing jobs (the Delta/Iceberg design):
    at scale, listing thousands of chunk directories costs more than
    reading the pruned data."""
    n = len(seg_dir.rstrip(os.sep)) + 1
    return sorted(p[n:] for p in _iter_parquet_files(seg_dir))


def collect_segment_stats(seg_dir: str, schema) -> dict | None:
    """Per-dimension [min, max] + row count for one written segment,
    from parquet footers only. Returns None if pyarrow is unavailable
    or any footer lacks stats for a tracked dim (→ no pruning)."""
    try:
        import pyarrow.parquet as pq
    except Exception:
        return None
    dims = [d.name for d in schema.dimensions if d.type in _STAT_TYPES]
    out: dict[str, list] = {}
    rows = 0
    try:
        for path in _iter_parquet_files(seg_dir):
            md = pq.ParquetFile(path).metadata
            rows += md.num_rows
            names = {md.schema.column(i).name: i for i in range(md.num_columns)}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for d in dims:
                    if d not in names:
                        # dimension columns are always written into the
                        # data files (segments partitionBy only the
                        # derived __chunk_* columns) — a missing dim
                        # means an unexpected layout: disable pruning
                        # rather than emit wrong bounds
                        return None
                    st = g.column(names[d]).statistics
                    if st is None or not st.has_min_max:
                        return None
                    mn, mx = st.min, st.max
                    cur = out.get(d)
                    if cur is None:
                        out[d] = [mn, mx]
                    else:
                        cur[0] = min(cur[0], mn)
                        cur[1] = max(cur[1], mx)
    except Exception:
        return None
    return {"rows": rows, "dims": out}


def merge_stats(a: dict | None, b: dict | None) -> dict | None:
    """Combine per-segment stats into per-transaction stats. None is
    infectious: one segment without stats disables txn-level pruning
    (absent always means 'cannot prune')."""
    if a is None or b is None:
        return None
    dims: dict[str, list] = {}
    for d in set(a["dims"]) & set(b["dims"]):
        dims[d] = [
            min(a["dims"][d][0], b["dims"][d][0]),
            max(a["dims"][d][1], b["dims"][d][1]),
        ]
    return {"rows": a["rows"] + b["rows"], "dims": dims}


def txn_intersects(stats: dict | None, bounds: dict[str, tuple]) -> bool:
    """Planner check: may this transaction contain rows in ``bounds``?
    Missing stats (or a dim absent from them) → True (cannot prune)."""
    if not stats:
        return True
    dims = stats.get("dims") or {}
    for name, (lo, hi) in bounds.items():
        rng = dims.get(name)
        if rng is None:
            continue
        if lo is not None and rng[1] < lo:
            return False
        if hi is not None and rng[0] > hi:
            return False
    return True
