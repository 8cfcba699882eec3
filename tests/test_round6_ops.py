"""Round-6 curation operators: PII scrub, corpus line dedup,
hash splits, trained SQ8 quantization."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import sf_dir


# ------------------------------------------------------------------ PII
def test_pii_stats_and_redact(spark):
    from matdb_spark.functions.pii import pii_stats, redact_pii

    rows = [
        (1, "write to alice.smith+x@example.co.uk today"),
        (2, "server at 192.168.0.1 then 10.0.0.255 up"),
        (3, "call 555-123-4567 or 555.987.6543"),
        (4, "ssn 123-45-6789 on file"),
        (5, "no pii here at all"),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    stats = {r["id"]: r for r in pii_stats(df, "id", "text").collect()}
    assert stats[1]["n_email"] == 1 and stats[1]["has_pii"]
    assert stats[2]["n_ipv4"] == 2
    assert stats[3]["n_phone"] == 2
    assert stats[4]["n_ssn"] == 1
    assert not stats[5]["has_pii"] and not stats[6]["has_pii"]

    red = {r["id"]: r for r in redact_pii(df, "id", "text").collect()}
    assert red[1]["clean_text"] == "write to [EMAIL] today"
    assert red[2]["clean_text"] == "server at [IP] then [IP] up"
    assert red[3]["clean_text"] == "call [PHONE] or [PHONE]"
    assert red[4]["clean_text"] == "ssn [SSN] on file"
    assert red[5]["clean_text"] == "no pii here at all"
    assert red[2]["n_redacted"] == 2 and red[5]["n_redacted"] == 0


def test_pii_ssn_phone_disjoint(spark):
    """3-2-4 (SSN) and 3-3-4 (phone) groupings must not cross-match,
    and an IPv4 must not be eaten by the phone pattern."""
    from matdb_spark.functions.pii import pii_stats

    df = spark.createDataFrame(
        [(1, "555-123-4567"), (2, "123-45-6789"), (3, "10.20.30.40")],
        ["id", "text"],
    )
    s = {r["id"]: r for r in pii_stats(df, "id", "text").collect()}
    assert (s[1]["n_phone"], s[1]["n_ssn"], s[1]["n_ipv4"]) == (1, 0, 0)
    assert (s[2]["n_phone"], s[2]["n_ssn"], s[2]["n_ipv4"]) == (0, 1, 0)
    assert (s[3]["n_phone"], s[3]["n_ssn"], s[3]["n_ipv4"]) == (0, 0, 1)


# ----------------------------------------------------------- line dedup
def test_dedup_lines_removes_boilerplate(spark):
    from matdb_spark.operators.dedup import dedup_lines

    boiler = "subscribe now"
    rows = [
        (1, f"unique alpha\n{boiler}\nfooter a"),
        (2, f"unique beta\n{boiler}\nfooter a"),
        (3, f"unique gamma\n{boiler}"),
        (4, boiler),  # fully-boilerplate page -> empty rebuild
        (5, "totally unique page"),
    ]
    df = spark.createDataFrame(rows, ["id", "page"])
    out = {r["id"]: r for r in dedup_lines(df, "id", "page").collect()}
    assert out[1]["clean_text"] == "unique alpha"
    assert out[1]["n_lines"] == 3 and out[1]["n_removed"] == 2
    assert out[2]["clean_text"] == "unique beta"
    assert out[3]["clean_text"] == "unique gamma"
    assert out[4]["clean_text"] == "" and out[4]["n_removed"] == 1
    assert out[5]["clean_text"] == "totally unique page"
    assert out[5]["n_removed"] == 0


def test_dedup_lines_threshold_and_order(spark):
    from matdb_spark.operators.dedup import dedup_lines

    rows = [(1, "a\nb\nc"), (2, "c\nb\na")]
    df = spark.createDataFrame(rows, ["id", "page"])
    # every line occurs exactly twice; min_count=3 keeps everything,
    # and the rebuild must preserve the ORIGINAL per-doc order
    out = {r["id"]: r for r in dedup_lines(df, "id", "page", min_count=3).collect()}
    assert out[1]["clean_text"] == "a\nb\nc"
    assert out[2]["clean_text"] == "c\nb\na"
    out2 = {r["id"]: r for r in dedup_lines(df, "id", "page", min_count=2).collect()}
    assert out2[1]["clean_text"] == "" and out2[2]["n_removed"] == 3


def test_dedup_lines_within_document_scope(spark):
    """scope='document': a line repeated inside one doc keeps its
    first copy there, and the SAME line in another doc is untouched
    (corpus frequency is irrelevant)."""
    import pytest as _pytest

    from matdb_spark.operators.dedup import dedup_lines

    rows = [(1, "x\ny\nx\nx"), (2, "x\nz")]
    df = spark.createDataFrame(rows, ["id", "page"])
    out = {r["id"]: r for r in dedup_lines(df, "id", "page", scope="document").collect()}
    assert out[1]["clean_text"] == "x\ny" and out[1]["n_removed"] == 2
    assert out[2]["clean_text"] == "x\nz" and out[2]["n_removed"] == 0

    with _pytest.raises(ValueError, match="scope"):
        dedup_lines(df, "id", "page", scope="galaxy")


def test_dedup_lines_carries_per_doc_columns(spark):
    from matdb_spark.operators.dedup import dedup_lines

    rows = [(1, 7, "a\nb"), (2, 9, "b\nc")]
    df = spark.createDataFrame(rows, ["id", "extra", "page"])
    out = {r["id"]: r for r in dedup_lines(df, "id", "page", carry=("extra",)).collect()}
    assert out[1]["extra"] == 7 and out[2]["extra"] == 9
    assert out[1]["clean_text"] == "a" and out[2]["clean_text"] == "c"


def test_dedup_lines_null_page(spark):
    from matdb_spark.operators.dedup import dedup_lines

    df = spark.createDataFrame(
        [(1, None), (2, "x\ny"), (3, "")], "id long, page string"
    )
    out = {r["id"]: r for r in dedup_lines(df, "id", "page").collect()}
    # NULL and '' both read as one empty line; the two empty lines are
    # corpus-frequent and removed, leaving empty rebuilds
    assert out[1]["n_lines"] == 1 and out[1]["clean_text"] == ""
    assert out[3]["n_lines"] == 1 and out[3]["n_removed"] == 1
    assert out[2]["clean_text"] == "x\ny"


def test_dedup_lines_regex_metachar_separator(spark):
    """A '.' separator must split literally (the pattern is quoted),
    not match-any-character."""
    from matdb_spark.operators.dedup import dedup_lines

    rows = [(1, "aa.bb.cc"), (2, "bb.dd")]
    df = spark.createDataFrame(rows, ["id", "page"])
    out = {r["id"]: r for r in dedup_lines(df, "id", "page", sep=".").collect()}
    assert out[1]["n_lines"] == 3 and out[2]["n_lines"] == 2
    assert out[1]["clean_text"] == "aa.cc"  # shared 'bb' removed
    assert out[2]["clean_text"] == "dd"


def test_dedup_lines_keep_first_survivor(spark):
    """keep_first=True: the (doc, pos)-first copy of a frequent line
    survives; all-copies mode removes it everywhere."""
    from matdb_spark.operators.dedup import dedup_lines

    rows = [
        (1, "boiler\nunique one"),
        (2, "unique two\nboiler"),
        (3, "boiler"),
    ]
    df = spark.createDataFrame(rows, ["id", "page"])
    keep = {r["id"]: r for r in dedup_lines(df, "id", "page", keep_first=True).collect()}
    assert keep[1]["clean_text"] == "boiler\nunique one"  # first copy survives
    assert keep[2]["clean_text"] == "unique two"
    assert keep[3]["clean_text"] == "" and keep[3]["n_removed"] == 1
    drop = {r["id"]: r for r in dedup_lines(df, "id", "page").collect()}
    assert drop[1]["clean_text"] == "unique one"  # all copies removed


def test_dedup_lines_trims_for_matching_keeps_raw_text(spark):
    from matdb_spark.operators.dedup import dedup_lines

    rows = [(1, "  pad  \nkeep one"), (2, "pad\nkeep two")]
    df = spark.createDataFrame(rows, ["id", "page"])
    out = {r["id"]: r for r in dedup_lines(df, "id", "page").collect()}
    # '  pad  ' and 'pad' hash equal after trim -> both removed
    assert out[1]["clean_text"] == "keep one"
    assert out[2]["clean_text"] == "keep two"


# ---------------------------------------------------------- hash splits
def test_assign_splits_deterministic_and_stable(spark):
    from matdb_spark.operators.sampling import assign_splits

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    w = (("train", 0.9), ("val", 0.05), ("test", 0.05))
    a = assign_splits(df, "doc_id", weights=w, seed="s1")
    b = assign_splits(df, "doc_id", weights=w, seed="s1")
    assert a.exceptAll(b).count() == 0  # pure function of (seed, id)

    counts = {r["split"]: r["n"] for r in a.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > 1600  # ~1800 expected
    assert 40 <= counts["val"] <= 180 and 40 <= counts["test"] <= 180

    # growth stability: membership of the first 2000 ids is unchanged
    # when the corpus doubles
    big = spark.range(0, 4000).withColumnRenamed("id", "doc_id")
    c = assign_splits(big, "doc_id", weights=w, seed="s1").filter(F.col("doc_id") < 2000)
    assert a.exceptAll(c).count() == 0


def test_assign_splits_validation(spark):
    from matdb_spark.operators.sampling import assign_splits

    df = spark.range(10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="sum to 1.0"):
        assign_splits(df, "doc_id", weights=(("a", 0.5), ("b", 0.4)))
    with pytest.raises(ValueError, match="at least two"):
        assign_splits(df, "doc_id", weights=(("all", 1.0),))


def test_assign_splits_nested_ratio_only_moves_boundary(spark):
    """Growing train 0.90 -> 0.95 must only FLIP val/test rows into
    train, never move a train row out (contiguous-bucket property)."""
    from matdb_spark.operators.sampling import assign_splits

    df = spark.range(0, 3000).withColumnRenamed("id", "doc_id")
    a = assign_splits(df, "doc_id", weights=(("train", 0.90), ("val", 0.05), ("test", 0.05)), seed="s")
    b = assign_splits(df, "doc_id", weights=(("train", 0.95), ("val", 0.025), ("test", 0.025)), seed="s")
    moved_out = (
        a.filter(F.col("split") == "train").alias("a")
        .join(b.filter(F.col("split") != "train").alias("b"), "doc_id")
        .count()
    )
    assert moved_out == 0


# ------------------------------------------------------------------ SQ8
def _load_emb(spark):
    return spark.read.parquet(f"{sf_dir('sf0.001')}/embeddings.parquet")


def test_sq8_encode_bounds_and_constant_dim(spark):
    from matdb_spark.operators.quantization import sq8_encode, sq8_train

    emb = _load_emb(spark)
    ranges = sq8_train(emb)
    assert len(ranges) == 64
    codes = sq8_encode(emb, ranges)
    mm = codes.select(
        F.array_min("codes").alias("lo"), F.array_max("codes").alias("hi")
    ).agg(F.min("lo").alias("lo"), F.max("hi").alias("hi")).first()
    assert mm["lo"] >= 0 and mm["hi"] <= 255

    # constant dimension encodes to 0 (hi == lo guard)
    df = spark.createDataFrame([(1, [1.5, 2.0]), (2, [1.5, 3.0])], ["vec_id", "embedding"])
    r2 = sq8_train(df)
    assert r2[0] == (1.5, 1.5)
    c = {r["vec_id"]: r["codes"] for r in sq8_encode(df, r2).collect()}
    assert c[1][0] == 0 and c[2][0] == 0
    assert c[1][1] == 0 and c[2][1] == 255


def test_sq8_out_of_range_vector_saturates(spark):
    from matdb_spark.operators.quantization import sq8_encode

    df = spark.createDataFrame([(1, [-5.0, 5.0])], ["vec_id", "embedding"])
    c = sq8_encode(df, [(0.0, 1.0), (0.0, 1.0)]).first()["codes"]
    assert c == [0, 255]


def test_sq8_topk_recall_vs_exact(spark):
    """8-bit per-dim quantization at 64 dims is near-lossless: the
    SQ8 top-10 must recover >= 0.9 of the exact-cosine top-10."""
    from matdb_spark.operators.quantization import sq8_topk, sq8_train
    from matdb_spark.operators.similarity import cosine_topk

    emb = _load_emb(spark)
    ranges = sq8_train(emb)
    probe = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk(emb, probe, k=10).select("query_id", "neighbor_id")
    approx = sq8_topk(emb, probe, ranges, k=10).select("query_id", "neighbor_id")
    hits = exact.join(approx, ["query_id", "neighbor_id"]).count()
    total = exact.count()
    assert total == 200
    assert hits / total >= 0.9


def test_ivf_sq8_index_lifecycle(spark, tmp_db_path):
    """Write → probe → append: codes-only storage, partition-pruned
    probes, append bit-identical to a same-ranges rebuild."""
    import os

    from matdb_spark.operators.quantization import (
        append_ivf_sq8_index,
        ivf_sq8_topk_indexed,
        read_sq8_ranges,
        write_ivf_sq8_index,
    )
    from matdb_spark.plans.inspect import partition_filters

    emb = _load_emb(spark)
    cents = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("cell_id"), "embedding"
    )
    path = os.path.join(tmp_db_path, "ivf_sq8")
    ranges = write_ivf_sq8_index(emb, cents, path)
    assert len(ranges) == 64
    assert read_sq8_ranges(spark, path) == ranges

    # stored rows carry codes, not floats
    idx = spark.read.parquet(path)
    assert set(idx.columns) == {"vec_id", "cell_id", "codes"}
    assert dict(idx.dtypes)["codes"] == "array<int>"

    probe = emb.filter(F.col("vec_id") < 5)
    out = ivf_sq8_topk_indexed(spark, path, probe, k=10, nprobe=2)
    pf = " ".join(partition_filters(out))
    assert "cell_id" in pf, pf  # probed cells prune partitions
    res = out.collect()
    assert len(res) == 50
    # SQ8 decode is near-lossless: indexed results track the float
    # IVF index's recall ceiling — every cos_sim sane
    assert all(-1.001 <= r["cos_sim"] <= 1.001 for r in res)

    # append the second half into a half-built index: rows must equal
    # a full write with the SAME ranges (slice-trained)
    half_path = os.path.join(tmp_db_path, "ivf_sq8_half")
    write_ivf_sq8_index(emb.filter(F.col("vec_id") % 2 == 0), cents, half_path)
    append_ivf_sq8_index(spark, emb.filter(F.col("vec_id") % 2 == 1), half_path)
    full = spark.read.parquet(half_path).orderBy("vec_id").collect()
    assert len(full) == emb.count()
    by_id = {r["vec_id"]: r for r in full}
    # appended vectors landed in real cells with in-range codes
    assert all(0 <= c <= 255 for r in full for c in r["codes"])
    assert by_id[1]["cell_id"] is not None


def test_ivf_sq8_append_saturates_out_of_range(spark, tmp_db_path):
    """A drifted appended vector whose unit components exceed the
    trained ranges must clamp to 0/255, never wrap."""
    import os

    from matdb_spark.operators.quantization import (
        append_ivf_sq8_index,
        write_ivf_sq8_index,
    )

    base = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (100, [0.8, 0.2])],
        ["vec_id", "embedding"],
    )
    cents = spark.createDataFrame([(0, [1.0, 0.0])], ["cell_id", "embedding"])
    path = os.path.join(tmp_db_path, "sq8_sat")
    write_ivf_sq8_index(base, cents, path)
    # unit([-1, 0]) = (-1, 0): dim-0 below every trained lo
    append_ivf_sq8_index(
        spark,
        spark.createDataFrame([(7, [-1.0, 0.0])], ["vec_id", "embedding"]),
        path,
    )
    row = spark.read.parquet(path).filter(F.col("vec_id") == 7).first()
    assert row["codes"][0] == 0  # saturated low, not wrapped


def test_stream_sq8_append_and_maintenance(spark, tmp_path_factory):
    """Streaming codes into the IVF-SQ8 index: streamed batches land
    bit-identical to batch appends; compaction dedups replay debris;
    purge removes ids while preserving the sidecars."""
    import os

    from matdb_spark.operators.index_maint import (
        compact_sq8_index,
        purge_sq8_index,
    )
    from matdb_spark.operators.quantization import (
        append_ivf_sq8_index,
        ivf_sq8_topk_indexed,
        read_sq8_ranges,
        write_ivf_sq8_index,
    )
    from matdb_spark.streaming.vectors import (
        compact_stream_sq8_index,
        stream_sq8_append,
    )

    def _emb(ids):
        comps = [
            (((F.col("id") * (j * 2 + 3)) % 197) / 98.5 - 1.0)
            for j in range(8)
        ]
        return spark.createDataFrame([(i,) for i in ids], "id long").select(
            F.col("id").alias("vec_id"), F.array(*comps).alias("embedding")
        )

    base = str(tmp_path_factory.mktemp("stream_sq8"))
    index, src, ckpt = (
        os.path.join(base, "index"),
        os.path.join(base, "src"),
        os.path.join(base, "ckpt"),
    )
    seed = _emb(range(0, 40))
    cents = seed.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("cell_id"), "embedding"
    )
    ranges = write_ivf_sq8_index(seed, cents, index)

    _emb(range(100, 120)).coalesce(1).write.json(src)
    _emb(range(120, 140)).coalesce(1).write.mode("append").json(src)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = stream_sq8_append(stream, index, ckpt)
    try:
        assert q.awaitTermination(240), "availableNow stream did not finish"
    finally:
        q.stop()

    rows = spark.read.parquet(index)
    assert rows.count() == 80
    # streamed rows encode bit-identically to a batch append of the
    # same vectors with the same stored ranges
    batch_path = os.path.join(base, "batch_twin")
    write_ivf_sq8_index(seed, cents, batch_path)
    append_ivf_sq8_index(spark, _emb(range(100, 140)), batch_path)
    streamed = {
        (r["vec_id"], r["cell_id"], tuple(r["codes"]))
        for r in rows.collect()
    }
    batched = {
        (r["vec_id"], r["cell_id"], tuple(r["codes"]))
        for r in spark.read.parquet(batch_path).collect()
    }
    assert streamed == batched

    # crash-replay debris: a duplicate append, then compaction dedups
    append_ivf_sq8_index(spark, _emb(range(100, 120)), index)
    assert spark.read.parquet(index).count() == 100
    compact_stream_sq8_index(spark, index)
    assert spark.read.parquet(index).count() == 80
    assert read_sq8_ranges(spark, index) == ranges  # sidecar survived

    # purge: ids leave, sidecars stay, probes still run
    purge_sq8_index(spark, index, list(range(100, 140)))
    assert spark.read.parquet(index).count() == 40
    assert read_sq8_ranges(spark, index) == ranges
    out = ivf_sq8_topk_indexed(
        spark, index, _emb([1]), k=5, nprobe=2
    ).collect()
    assert len(out) == 5
    assert all(r["neighbor_id"] < 100 for r in out)

    # compact_sq8_index (the offline alias) also preserves sidecars
    compact_sq8_index(spark, index)
    assert read_sq8_ranges(spark, index) == ranges


# --------------------------------------------------------- budget select
def test_budget_select_quota_semantics(spark):
    from matdb_spark.operators.sampling import budget_select

    rows = [
        # group a: weights 5, 4, 3 in quality order -> cum 5, 9, 12
        ("a", 1, 30, 5),
        ("a", 2, 20, 4),
        ("a", 3, 10, 3),
        # group b: first row alone exceeds the budget -> dropped
        ("b", 4, 99, 100),
        ("b", 5, 50, 2),
    ]
    df = spark.createDataFrame(rows, ["g", "id", "q", "w"])
    out = {
        r["id"]: r
        for r in budget_select(
            df, "g", "w", budget=9,
            order_by=[F.col("q").desc(), F.col("id").asc()],
        ).collect()
    }
    assert [out[i]["kept"] for i in (1, 2, 3)] == [True, True, False]
    assert out[3]["cum_weight"] == 12
    # quota, not first-fit: the oversized head is dropped, and the
    # NEXT row is also out because the cumsum already passed it
    assert not out[4]["kept"] and not out[5]["kept"]
    assert out[5]["cum_weight"] == 102


def test_global_running_sum_matches_single_window(spark):
    """The two-phase bucketed cumsum must equal a plain global-window
    cumsum, and its full-data window must partition by the bucket."""
    from matdb_spark.operators.ranking import global_running_sum

    rows = [(i, (i * 37) % 100, (i % 7) + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, key long, w long").repartition(8)
    out = global_running_sum(
        df, [F.col("key"), F.col("id")], F.floor(F.col("key") / 10), "w"
    )
    got = {r["id"]: r["running_sum"] for r in out.collect()}
    cum, expected = 0, {}
    for rid, _, w in sorted(rows, key=lambda r: (r[1], r[0])):
        cum += w
        expected[rid] = cum
    assert got == expected

    plan = out._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition" in line.lower() and "__grs_b" not in line:
            # only the #buckets-row offset window may be partitionless;
            # it operates on the aggregated totals relation
            assert "__grs_t" in line or "__grs_off" in line, line


def test_budget_select_global_matches_per_group_on_one_group(spark):
    from matdb_spark.operators.sampling import budget_select, budget_select_global

    rows = [("g", i, (i * 13) % 50, (i % 5) + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, id long, q long, w long")
    order = [F.col("q").desc(), F.col("id").asc()]
    per_group = budget_select(df, "g", "w", 150, order)
    global_ = budget_select_global(
        df, "w", 150, order, bucket=-F.floor(F.col("q") / 8)
    )
    a = {(r["id"]): (r["cum_weight"], r["kept"]) for r in per_group.collect()}
    b = {(r["id"]): (r["cum_weight"], r["kept"]) for r in global_.collect()}
    assert a == b


# --------------------------------------------------- leakage-safe split
def test_leakage_safe_split_never_straddles_clusters(spark):
    """Every near-dup cluster lands wholly in one split, and the
    TEETH: per-document hashing WOULD have straddled at least one
    multi-doc cluster on the same corpus (i.e. the cluster-level
    assignment is load-bearing, not vacuously true)."""
    import __spark_entry__ as e

    out = e.queries()["q_split_leakage_safe"](spark, sf_dir("sf0.001"))
    agg = out.groupBy("cluster_id").agg(
        F.countDistinct("split").alias("ns"),
        F.count(F.lit(1)).alias("n"),
    )
    assert agg.filter(F.col("ns") > 1).count() == 0
    multi = agg.filter(F.col("n") > 1)
    assert multi.count() > 0  # the fixture has real near-dup clusters

    from matdb_spark.operators.sampling import assign_splits

    naive = assign_splits(
        out.select("doc_id", "cluster_id"),
        "doc_id",
        weights=(("train", 0.8), ("val", 0.1), ("test", 0.1)),
        seed="ls",
    )
    straddled = (
        naive.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .count()
    )
    assert straddled > 0  # per-doc hashing does leak across the boundary


# ---------------------------------------------------------- accent fold
def test_fold_accents_map_and_behavior(spark):
    from matdb_spark.functions.text import ACCENT_FROM, ACCENT_TO, fold_accents

    # the translate contract: 1:1 map (a shorter 'to' would DELETE)
    assert len(ACCENT_FROM) == len(ACCENT_TO)
    assert len(set(ACCENT_FROM)) == len(ACCENT_FROM)  # no dup sources

    rows = [(1, "café"), (2, "ÀÖ ñoño"), (3, "žß"), (4, "plain"), (5, None)]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: r["f"]
        for r in df.select("id", fold_accents(F.col("text")).alias("f")).collect()
    }
    model = str.maketrans(ACCENT_FROM, ACCENT_TO)
    for i, t in rows:
        assert got[i] == (None if t is None else t.translate(model))


# ------------------------------------------------- property-based models
def test_dedup_lines_matches_python_model(spark):
    """Random multi-line corpora from a tiny line alphabet,
    cross-checked against a pure-Python reference (count lines
    corpus-wide on trimmed text, drop every copy of >=min_count
    lines, rebuild in order)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from matdb_spark.operators.dedup import dedup_lines

    lines_alpha = ["aa", "bb", "cc", " aa ", "dd dd", ""]
    corpora = st.lists(
        st.lists(st.sampled_from(lines_alpha), min_size=1, max_size=5),
        min_size=1,
        max_size=6,
    )

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(docs=corpora)
    def run(docs):
        rows = [(i, "\n".join(ls)) for i, ls in enumerate(docs)]
        from collections import Counter

        counts = Counter(l.strip() for ls in docs for l in ls)
        expected = {}
        for i, ls in enumerate(docs):
            kept = [l for l in ls if counts[l.strip()] < 2]
            expected[i] = (len(ls), len(ls) - len(kept), "\n".join(kept))
        df = spark.createDataFrame(rows, "id long, page string")
        got = {
            r["id"]: (r["n_lines"], r["n_removed"], r["clean_text"])
            for r in dedup_lines(df, "id", "page").collect()
        }
        assert got == expected

    run()


def test_assign_splits_matches_python_model(spark):
    """The split thresholds replayed in pure Python md5 arithmetic."""
    import hashlib

    from matdb_spark.operators.sampling import assign_splits

    ids = list(range(0, 400, 7))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    w = (("train", 0.8), ("val", 0.1), ("test", 0.1))
    got = {
        r["doc_id"]: r["split"]
        for r in assign_splits(df, "doc_id", weights=w, seed="pm").collect()
    }
    for i in ids:
        h = int(hashlib.md5(f"pm:{i}".encode()).hexdigest()[:15], 16) % 1_000_000
        want = "train" if h < 800_000 else ("val" if h < 900_000 else "test")
        assert got[i] == want, (i, h, got[i], want)


# -------------------------------------------------------- hard negatives
def test_hard_negative_topk_excludes_same_and_null_labels(spark):
    from matdb_spark.operators.similarity import hard_negative_topk

    rows = [
        (0, [1.0, 0.0], 1),
        (1, [0.99, 0.1], 1),    # same label as query 0 — must not appear
        (2, [0.98, 0.15], 2),   # different label — hardest negative
        (3, [0.0, 1.0], 2),     # different label, far
        (4, [0.97, 0.2], None),  # null label — never a negative
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = hard_negative_topk(df, df.filter(F.col("vec_id") == 0), k=3).collect()
    ids = [r["neighbor_id"] for r in out]
    assert 1 not in ids and 4 not in ids
    assert ids[0] == 2  # nearest different-label first
    assert all(r["query_label"] == 1 for r in out)
    assert all(r["neighbor_label"] == 2 for r in out)


# ------------------------------------------------------------------ BPE
def test_bpe_roundtrip_holds_on_fixture(spark):
    """Every fixture document must detokenize back to its normalized
    text — TRUE booleans, not merely cross-engine-consistent ones."""
    from matdb_spark.operators.bpe import bpe_roundtrip, train_bpe

    docs = spark.read.parquet(f"{sf_dir('sf0.001')}/documents.parquet")
    merges = train_bpe(docs, "text", num_merges=16, min_count=1)
    assert len(merges) > 0
    out = bpe_roundtrip(docs, "doc_id", "text", merges)
    assert out.filter(~F.col("roundtrip_ok")).count() == 0
    assert out.filter(F.col("n_bpe_tokens") <= 0).count() == 0


def test_bpe_detokenize_edge_cases(spark):
    from matdb_spark.operators.bpe import bpe_roundtrip, train_bpe

    rows = [
        (1, "hello hello world"),
        (2, "  spaced   out  "),  # normalization collapses whitespace
        (3, ""),
        (4, None),
        (5, "a"),
        (6, "punct, marks! and? digits 123"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe(df, "text", num_merges=8, min_count=1)
    out = {r["doc_id"]: r for r in bpe_roundtrip(df, "doc_id", "text", merges).collect()}
    assert all(out[i]["roundtrip_ok"] for i in (1, 2, 3, 4, 5, 6))
    assert out[3]["n_bpe_tokens"] == 0 and out[4]["n_bpe_tokens"] == 0


# ------------------------------------------------------------------ RRF
def test_rrf_fuse_exact_scores_and_agreement(spark):
    from matdb_spark.operators.fusion import RRF_SCALE, rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)], ["query_id", "doc_id", "rank"]
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)], ["query_id", "doc_id", "rank"]
    )
    out = {r["doc_id"]: r for r in rrf_fuse([a, b], k=10).collect()}
    # doc 11: rank 2 in a, rank 1 in b -> appears in both
    assert out[11]["n_sources"] == 2
    assert out[11]["rrf_micro"] == RRF_SCALE // 62 + RRF_SCALE // 61
    assert out[10]["n_sources"] == 1
    assert out[10]["rrf_micro"] == RRF_SCALE // 61
    # agreement wins: 11 outranks 10 (same best rank but two sources)
    assert out[11]["rank"] < out[10]["rank"]


def test_rrf_fuse_tie_breaks_by_id_and_validates(spark):
    import pytest as _pytest

    from matdb_spark.operators.fusion import rrf_fuse

    a = spark.createDataFrame(
        [(1, 20, 1), (1, 5, 1)], ["query_id", "doc_id", "rank"]
    )
    # identical scores (both rank 1 in one list each) -> lower id first
    b = spark.createDataFrame([(1, 5, 1)], ["query_id", "doc_id", "rank"])
    c = spark.createDataFrame([(1, 20, 1)], ["query_id", "doc_id", "rank"])
    rows = rrf_fuse([b, c], k=10).collect()
    assert [r["doc_id"] for r in rows] == [5, 20]
    assert rows[0]["rrf_micro"] == rows[1]["rrf_micro"]

    with _pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])
    # single ranking degrades to a monotone rescoring of it
    single = rrf_fuse([a], k=1).collect()
    assert len(single) == 1 and single[0]["doc_id"] == 5


def test_sq8_teeth_low_bit_quantization_degrades(spark):
    """Teeth for the recall assertion: crushing the trained ranges to
    a single level (lo==hi after collapsing) must NOT still produce
    perfect recall — i.e. the test above can fail. Collapse by
    training on a constant corpus and applying to the real one."""
    from matdb_spark.operators.quantization import sq8_topk, sq8_train
    from matdb_spark.operators.similarity import cosine_topk

    emb = _load_emb(spark)
    degenerate = [(0.0, 0.0)] * 64  # every dim constant -> all codes 0
    probe = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk(emb, probe, k=10).select("query_id", "neighbor_id")
    approx = sq8_topk(emb, probe, degenerate, k=10).select("query_id", "neighbor_id")
    hits = exact.join(approx, ["query_id", "neighbor_id"]).count()
    # all-zero decoded vectors have no direction -> similarities NULL,
    # results empty; recall collapses
    assert hits / exact.count() < 0.2
