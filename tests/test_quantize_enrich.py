"""Unit tests for int8 embedding quantization and the stream-static
enrichment join helper."""

from pyspark.sql import Row, functions as F

from matdb_spark.functions.vectors import int8_scale, quantize_int8
from matdb_spark.streaming.joins import static_enrich


def test_quantize_int8_known_values(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, v=[1.0, -2.0, 4.0]),  # scale 127/4: [32, -63, 127]
            Row(id=2, v=[0.0, 0.0]),  # zero vector -> zeros, scale 0
        ]
    )
    s = df.select("id", "v", int8_scale(F.col("v")).alias("scale"))
    out = {
        r["id"]: (r["q"], round(r["scale"], 6))
        for r in s.select(
            "id", "scale", quantize_int8(F.col("v"), F.col("scale")).alias("q")
        ).collect()
    }
    # 1.0*31.75+0.5=32.25 -> 32; -2.0*31.75+0.5=-63.0 -> -63; 4.0 -> 127.5 -> 127
    assert out[1] == ([32, -63, 127], 31.75)
    assert out[2] == ([0, 0], 0.0)
    # every component is within int8 range by construction
    big = spark.createDataFrame([Row(id=3, v=[-5.0, 5.0, 0.1])])
    sb = big.select("id", "v", int8_scale(F.col("v")).alias("scale"))
    q = sb.select(quantize_int8(F.col("v"), F.col("scale")).alias("q")).collect()[0]["q"]
    assert all(-127 <= x <= 127 for x in q)


def test_static_enrich_batch_parity(spark):
    """static_enrich is the same relational join in batch and stream
    (stream-static joins are stateless) — assert batch semantics and
    the broadcast hint."""
    from matdb_spark.plans import broadcast_join_count

    events = spark.createDataFrame(
        [(1, 100), (1, 101), (2, 102), (9, 103)], "user_id long, event_id long"
    )
    dim = spark.createDataFrame(
        [(1, "GOLD"), (2, "SILVER")], "user_id long, tier string"
    )
    out = static_enrich(events, dim, ["user_id"])
    rows = {(r["event_id"], r["tier"]) for r in out.collect()}
    assert rows == {(100, "GOLD"), (101, "GOLD"), (102, "SILVER")}
    assert broadcast_join_count(out) >= 1
