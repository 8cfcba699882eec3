"""Unit test for connected_components on synthetic graphs."""
from pyspark.sql import functions as F
from matdb_spark.operators.dedup import connected_components


def test_connected_components_shapes(spark):
    # triangle {1,2,3}, chain {10,11,12,13}, pair {20,21}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (12, 13), (20, 21)],
        "id_a long, id_b long",
    )
    expected = {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 13: 10, 20: 20, 21: 20}
    # driver union-find fast path (default threshold)
    out = {r["doc_id"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert out == expected
    # distributed label-propagation path (threshold forced to 0)
    out2 = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs, driver_threshold=0).collect()
    }
    assert out2 == expected
