"""Z-order clustering tests.

Correctness: compact(cluster="zorder") is layout-only — the snapshot
before and after is identical. Locality: on a 2-D grid written as
x-major rows, z-ordered files cover small (x, y) rectangles while
lexicographic files cover x-stripes spanning the full y range — so
the summed per-file bounding-box area (the quantity parquet min/max
stats prune by) must drop by a large factor.
"""

import glob
import os
import random

import pyarrow.parquet as pq
import pytest

from matdb_spark import Database, Dimension, Schema, Value
from matdb_spark.zorder import DEFAULT_BITS, interleave_bits, morton_py, zorder_key


def test_interleave_matches_python_reference(spark):
    random.seed(7)
    pts = [(random.randrange(1 << 16), random.randrange(1 << 16)) for _ in range(200)]
    df = spark.createDataFrame(pts, "x long, y long")
    from pyspark.sql import functions as F

    out = df.select(
        "x", "y", interleave_bits([F.col("x"), F.col("y")]).alias("z")
    ).collect()
    for r in out:
        assert r["z"] == morton_py([r["x"], r["y"]]), (r["x"], r["y"])


def _file_stats(db_path, txn_id):
    """Per-parquet-file (x, y) bounding boxes under a txn's data dir."""
    pat = os.path.join(db_path, "data", f"txn={txn_id}", "**", "*.parquet")
    boxes = []
    for f in glob.glob(pat, recursive=True):
        t = pq.read_table(f, columns=["x", "y"])
        xs, ys = t.column("x").to_pylist(), t.column("y").to_pylist()
        if xs:
            boxes.append((min(xs), max(xs), min(ys), max(ys)))
    return boxes


def _y_span(boxes):
    """Total y-extent of the per-file stats boxes — what a range
    predicate on the NON-leading dim prunes against: a file is read
    iff the query's y-window intersects its y-span."""
    return sum(y1 - y0 + 1 for _, _, y0, y1 in boxes)


@pytest.mark.parametrize("cluster", ["sort", "zorder"])
def test_compact_cluster_preserves_results(spark, tmp_db_path, cluster):
    db = Database.create(
        spark,
        os.path.join(tmp_db_path, f"z_{cluster}"),
        Schema(dimensions=[Dimension("x", 0), Dimension("y", 0)], values=[Value("v")]),
    )
    grid = [(x, y, x * 1000 + y) for x in range(40) for y in range(40)]
    t1 = db.begin()
    t1.add_dataframe(spark.createDataFrame(grid[:800], "x long, y long, v long"))
    t1.commit()
    t2 = db.begin()
    t2.add_dataframe(spark.createDataFrame(grid[800:], "x long, y long, v long"))
    t2.commit()
    before = sorted(tuple(r) for r in db.snapshot().collect())
    assert db.compact(cluster=cluster) is not None
    after = sorted(tuple(r) for r in db.snapshot().collect())
    assert before == after and len(after) == 1600


def test_zorder_tightens_file_bounding_boxes(spark, tmp_db_path):
    """The defining property: per-file (x,y) boxes are ~square under
    z-order vs full-width stripes under the lexicographic sort."""

    def build(name, cluster):
        db = Database.create(
            spark,
            os.path.join(tmp_db_path, name),
            Schema(
                dimensions=[Dimension("x", 0), Dimension("y", 0)], values=[Value("v")]
            ),
        )
        n = 64
        grid = [(x, y, x + y) for x in range(n) for y in range(n)]
        t1 = db.begin()
        t1.add_dataframe(
            spark.createDataFrame(grid[: n * n // 2], "x long, y long, v long")
        )
        t1.commit()
        t2 = db.begin()
        t2.add_dataframe(
            spark.createDataFrame(grid[n * n // 2 :], "x long, y long, v long")
        )
        t2.commit()
        spark.conf.set("spark.sql.files.maxRecordsPerFile", "256")
        try:
            c = db.compact(cluster=cluster)
        finally:
            spark.conf.unset("spark.sql.files.maxRecordsPerFile")
        return _file_stats(db.path, c)

    plain = build("plain", "sort")
    zed = build("zed", "zorder")
    assert len(plain) > 4 and len(zed) > 4  # multiple files to compare
    # Lexicographic files are x-stripes spanning all of y (span 64
    # each); z-ordered files are ~square tiles (span ~16): a y-range
    # query prunes the latter and cannot prune the former. Require a
    # 2x total-span improvement (actual is ~4x, margin for sampling
    # noise at partition boundaries).
    plain_span = _y_span(plain) / len(plain)
    zed_span = _y_span(zed) / len(zed)
    assert zed_span * 2 < plain_span, (zed_span, plain_span)


def test_zorder_rejects_unsupported_schemas(spark, tmp_db_path):
    db = Database.create(
        spark,
        os.path.join(tmp_db_path, "one_dim"),
        Schema(dimensions=[Dimension("x", 0)], values=[Value("v")]),
    )
    t = db.begin()
    t.add_row([1, 1])
    t.commit()
    with pytest.raises(ValueError, match=">= 2 dimensions"):
        zorder_key(db.snapshot(), db.schema)
    with pytest.raises(ValueError, match="'sort' or 'zorder'"):
        db.compact(cluster="hilbert")
