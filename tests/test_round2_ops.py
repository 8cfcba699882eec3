"""Round-2 additions: cogrouped Pandas map and the gzip-TSV source.

The query-level behavior is covered by the oracle gate
(__spark_entry__); these tests pin the library semantics on tiny
hand-built inputs, including the empty-side edge the gate data never
hits.
"""

import pandas as pd

from matdb_spark.operators.groupmap import cogroup_stats
from matdb_spark.operators.incremental import apply_diff, sum_count_state
from matdb_spark.sources.formats import lineitem_tsv_gz_fixture, read_lineitem_tsv


def test_cogroup_stats_both_sides(spark):
    left = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20)], "k long, event_id long"
    )
    right = spark.createDataFrame(
        [(1, 100), (3, 300)], "k long, o_orderkey long"
    )
    out = {
        r["k"]: r.asDict()
        for r in cogroup_stats(left, right, ["k"], "event_id", "o_orderkey").collect()
    }
    assert out[1] == {"k": 1, "n_left": 2, "min_left_id": 10, "n_right": 1, "min_right_id": 100}
    # right-only key: left side arrives as an empty frame
    assert out[3] == {"k": 3, "n_left": 0, "min_left_id": None, "n_right": 1, "min_right_id": 300}
    # left-only key: right side empty
    assert out[2] == {"k": 2, "n_left": 1, "min_left_id": 20, "n_right": 0, "min_right_id": None}


def test_tsv_gz_roundtrip(spark, tmp_path):
    path = lineitem_tsv_gz_fixture(spark, "/root/testdata/sf0.001", str(tmp_path))
    li = read_lineitem_tsv(spark, path)
    src = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    assert li.count() == src.count()
    # doubles must round-trip value-exact through the text format:
    # compare decimal-cast sums (order-independent, exact) rather than
    # double sums whose accumulation order differs between the reads
    from pyspark.sql import functions as F

    dec = lambda df: df.agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("s")
    ).collect()[0]["s"]
    assert dec(li) == dec(src)


def test_incremental_agg_matches_recompute(spark, tmp_path):
    """Patched state (base + diffs) must equal a full recompute on the
    final snapshot — across inserts, updates, AND deletes, including a
    group that empties out and a tombstone of a never-existing key."""
    from matdb_spark import Database, Dimension, Schema, Value
    from pyspark.sql import functions as F

    db = Database.create(
        spark,
        str(tmp_path / "db"),
        Schema(
            dimensions=[Dimension("g", 10), Dimension("id", 100)],
            values=[Value("v", type="double")],
        ),
    )
    t1 = db.begin()
    # groups: g=1 (ids 1,2), g=2 (id 3), g=3 (id 4 — will empty out)
    t1.add_rows([(1, 1, 10.25), (1, 2, 20.5), (2, 3, 30.0), (3, 4, 5.75)])
    t1.commit()
    t2 = db.begin()
    t2.add_row((1, 5, 1.0))        # insert into existing group
    t2.add_row((2, 3, 300.0))      # update
    t2.add_row((4, 9, 7.0))        # insert creating a new group
    t2.delete_row((3, 4))          # delete → group 3 empties
    t2.delete_row((9, 99))         # tombstone of a key that never existed
    t2.commit()

    base = sum_count_state(db.snapshot(as_of=1), ["g"], ["v"])
    diff = db.changes(since=1, with_preimage=True)
    patched = apply_diff(base, diff, ["g"], ["v"])
    recomputed = sum_count_state(db.snapshot(), ["g"], ["v"])

    as_dict = lambda df: {
        r["g"]: (r["n"], r["sum_v"]) for r in df.collect()
    }
    assert as_dict(patched) == as_dict(recomputed)
    assert 3 not in as_dict(patched)  # emptied group disappeared


def test_incremental_agg_partial_columns_and_null_sums(spark, tmp_path):
    """The two review-confirmed edge cases: (a) deleting a key whose
    MAINTAINED column is null must still decrement the count (existence
    is proven by the other pre-image columns); (b) a group whose
    maintained column is entirely null must keep sum NULL, not 0."""
    from matdb_spark import Database, Dimension, Schema, Value

    db = Database.create(
        spark,
        str(tmp_path / "db"),
        Schema(
            dimensions=[Dimension("g", 10), Dimension("id", 100)],
            values=[Value("a", type="double"), Value("b", type="double")],
        ),
    )
    t1 = db.begin()
    t1.add_rows([
        (1, 1, None, 5.0),   # a null, exists through b — delete target
        (2, 2, None, 1.0),   # group 2: a entirely null
    ])
    t1.commit()
    t2 = db.begin()
    t2.delete_row((1, 1))            # (a): pre-image has old_a null
    t2.add_row((2, 3, None, 2.0))    # (b): another all-null-a insert
    t2.commit()

    base = sum_count_state(db.snapshot(as_of=1), ["g"], ["a"])
    diff = db.changes(since=1, with_preimage=True)
    patched = apply_diff(base, diff, ["g"], ["a"])
    recomputed = sum_count_state(db.snapshot(), ["g"], ["a"])

    as_dict = lambda df: {r["g"]: (r["n"], r["nn_a"], r["sum_a"]) for r in df.collect()}
    p, r = as_dict(patched), as_dict(recomputed)
    assert p == r
    assert 1 not in p                 # (a) group emptied by the delete
    assert p[2] == (2, 0, None)       # (b) sum stays NULL, not 0
