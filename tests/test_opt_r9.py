"""Round-9 optimization guards: the hot expression builders were
rewritten as single parsed F.expr strings (plan-build py4j cost), and
these tests pin them BIT-IDENTICAL to the original Column-composed
forms — the property the round's oracle sweeps verified end-to-end,
asserted here at the operator level so a future edit can't silently
drift a fold order or literal type.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from matdb_spark.functions.text import hash64, normalize
from matdb_spark.functions.vectors import (
    as_double,
    dot,
    norm,
    squared_l2,
    with_bound_scalar,
)
from matdb_spark.operators import dedup as D
from matdb_spark.operators.similarity import (
    _adc_lut_expr,
    _pq_codes_expr,
    _pq_lit,
    _unit,
    hyperplane_bucket,
    hyperplanes,
    pq_codebook_from_sample,
)
from matdb_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _no_diff(df, a: str, b: str) -> None:
    assert df.filter(F.expr(f"NOT (`{a}` <=> `{b}`)")).count() == 0


def test_unit_matches_column_built_form(spark):
    emb = load_table(spark, SF, "embeddings")
    new = _unit(emb, [F.col("vec_id")], "embedding", "__new")

    t = emb.select(F.col("vec_id"), as_double(F.col("embedding")).alias("__v0"))
    uv = with_bound_scalar(
        norm(F.col("__v0")),
        lambda nv: F.when(nv != 0.0, F.transform(F.col("__v0"), lambda x: x / nv)),
    )
    old = t.select("vec_id", uv.alias("__old"))
    _no_diff(new.join(old, "vec_id"), "__new", "__old")


def test_hyperplane_bucket_matches_column_built_form(spark):
    emb = load_table(spark, SF, "embeddings")
    planes = hyperplanes(24, 64)
    u = _unit(emb, [F.col("vec_id")], "embedding", "__v")

    bucket_old = F.lit(0)
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(x) for x in plane])
        bit = F.when(dot(F.col("__v"), lit_plane) >= 0, F.lit(1 << p)).otherwise(
            F.lit(0)
        )
        bucket_old = bucket_old + bit
    cmp = u.select(
        bucket_old.cast("long").alias("__old"),
        hyperplane_bucket("__v", planes).alias("__new"),
    )
    assert dict(cmp.dtypes)["__new"] == "bigint"
    _no_diff(cmp, "__new", "__old")


def test_pq_codes_expr_matches_column_built_form(spark):
    emb = load_table(spark, SF, "embeddings")
    cb = pq_codebook_from_sample(emb, m=4, k=8, sample_mod=31)
    cb_lit, m, k, bs = _pq_lit(cb)
    u = _unit(emb, [F.col("vec_id")], "embedding", "__v")

    def code_for(b):
        blk = F.slice(F.col("__v"), b * bs + 1, bs)

        def dists_of(bb):
            return F.transform(
                F.sequence(F.lit(0), F.lit(k - 1)),
                lambda j: squared_l2(
                    bb, F.element_at(cb_lit, (F.lit(b * k) + j + 1).cast("int"))
                ),
            )

        bound = lambda e, fn: F.get(F.transform(F.array(e), fn), 0)  # noqa: E731
        return bound(
            blk,
            lambda bb: bound(
                dists_of(bb),
                lambda dd: F.array_position(dd, F.array_min(dd)).cast("int") - 1,
            ),
        )

    cmp = u.select(
        _pq_codes_expr(cb).alias("__new"),
        F.array(*[code_for(b) for b in range(m)]).alias("__old"),
    )
    assert dict(cmp.dtypes) == {"__new": "array<int>", "__old": "array<int>"}
    _no_diff(cmp, "__new", "__old")

    # and the ADC LUT (same dot fold per entry)
    q = u.filter(F.col("vec_id") < 5)
    lut_old_entry = lambda e: dot(  # noqa: E731
        F.slice(F.col("__v"), F.floor(e / k).cast("int") * bs + 1, bs),
        F.element_at(cb_lit, (e + 1).cast("int")),
    )
    cmp2 = q.select(
        _adc_lut_expr("__v", cb).alias("__new"),
        F.transform(F.sequence(F.lit(0), F.lit(m * k - 1)), lut_old_entry).alias(
            "__old"
        ),
    )
    _no_diff(cmp2, "__new", "__old")


def test_simhash_matches_column_built_form(spark):
    docs = load_table(spark, SF, "documents")
    toks = docs.select(
        F.col("doc_id"),
        F.filter(
            F.split(normalize(F.col("text")), " "), lambda x: x != F.lit("")
        ).alias("__toks"),
    ).filter(F.size("__toks") > 0)
    hashed = toks.select(
        F.col("doc_id"), F.transform(F.col("__toks"), hash64).alias("__h")
    )
    n = F.size(F.col("__h"))
    bit_terms = []
    for bit in range(60):
        mask = F.lit(1 << bit)
        cnt = F.size(F.filter(F.col("__h"), lambda h: h.bitwiseAND(mask) != 0))
        bit_terms.append(
            F.when(cnt * 2 > n, F.lit(1 << bit).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    old = hashed.select(
        "doc_id", sum(bit_terms, F.lit(0).cast("long")).alias("__old")
    )
    new = D.simhash64(docs, "doc_id", "text").withColumnRenamed("simhash", "__new")
    _no_diff(new.join(old, "doc_id"), "__new", "__old")


def test_simhash_expr_is_flat_not_hof_fold(spark):
    """The nested aggregate(sequence(0,59), ...) form evaluated
    interpreted and made the pairs gate ~10x slower — the committed
    fold must stay a flat sum (no aggregate() over the bit range)."""
    docs = load_table(spark, SF, "documents")
    plan = D.simhash64(docs, "doc_id", "text")._jdf.queryExecution().toString()
    assert "aggregate(sequence(0, 59)" not in plan


def test_ncells_footer_equals_live_count(spark, tmp_path):
    import __spark_entry__ as E
    from matdb_spark.operators.similarity import write_ivf_index

    emb = load_table(spark, SF, "embeddings")
    path = str(tmp_path / "ivf_footer_probe")
    write_ivf_index(emb, E._centroids(emb), path)
    got = E._ncells_from_fixture(spark, path, emb)
    assert got == E._centroids(emb).count()


def test_load_table_schema_cache_and_repartition(spark):
    from matdb_spark.sources import tables as T

    df1 = load_table(spark, "/root/testdata/sf0.1", "lineitem")
    df2 = load_table(spark, "/root/testdata/sf0.1", "lineitem")
    assert df1.schema == df2.schema
    # the >100 KB file must still be repartitioned to full parallelism
    assert df1.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # and the split-estimate math mirrors Spark's formula bounds
    assert T._estimated_scan_tasks(spark, 0) == 1
    assert T._estimated_scan_tasks(spark, 11 * 1024 * 1024) >= 1
    assert T._size_bytes("134217728b") == 128 * 1024 * 1024
    assert T._size_bytes("128MB") == 128 * 1024 * 1024
    assert T._size_bytes("4m") == 4 * 1024 * 1024
