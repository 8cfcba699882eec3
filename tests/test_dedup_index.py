"""Incremental MinHash index: write -> probe -> append lifecycle,
parity with the one-shot LSH pair miner, skew-cap behavior, and the
no-corpus-shuffle plan claim."""
import os
import shutil

from pyspark.sql import functions as F

from matdb_spark.operators.dedup import (
    append_minhash_index,
    minhash_lsh_pairs,
    pairs_against_index,
    write_minhash_index,
)

SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch"
)

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "a completely different document about spark distributed computing engines"),
    (3, "yet another unrelated text concerning parquet columnar storage formats"),
]
# 10 is a near-dup of 1; 11 is novel
BATCH = [
    (10, "the quick brown fox jumps over the lazy dog near the river banks"),
    (11, "nothing in the corpus resembles this sentence about volcanic geology"),
]


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_index_probe_and_append(spark):
    path = os.path.join(SCRATCH, "mh_index_test")
    shutil.rmtree(path, ignore_errors=True)
    corpus = _mk(spark, CORPUS)
    write_minhash_index(corpus, path, "doc_id", "text")

    pairs = pairs_against_index(spark, path, _mk(spark, BATCH), "doc_id", "text")
    got = {(r["new_id"], r["corpus_id"]) for r in pairs.collect()}
    assert (10, 1) in got
    assert all(n != 11 for n, _ in got), "novel doc must not match"

    # admit the batch, then a later batch matching doc 11 finds it
    append_minhash_index(_mk(spark, BATCH), path, "doc_id", "text")
    batch2 = _mk(
        spark,
        [(20, "nothing in the corpus resembles this sentence about volcanic geology")],
    )
    got2 = {
        (r["new_id"], r["corpus_id"])
        for r in pairs_against_index(spark, path, batch2, "doc_id", "text").collect()
    }
    assert (20, 11) in got2


def test_index_parity_with_one_shot(spark):
    """Probing an index of the corpus with a batch must find exactly
    the cross (batch x corpus) subset of the one-shot miner run over
    corpus+batch together."""
    path = os.path.join(SCRATCH, "mh_index_parity")
    shutil.rmtree(path, ignore_errors=True)
    corpus, batch = _mk(spark, CORPUS), _mk(spark, BATCH)
    write_minhash_index(corpus, path, "doc_id", "text")
    got = {
        (r["new_id"], r["corpus_id"])
        for r in pairs_against_index(spark, path, batch, "doc_id", "text").collect()
    }
    corpus_ids = {i for i, _ in CORPUS}
    batch_ids = {i for i, _ in BATCH}
    want = {
        (b, c)
        for r in minhash_lsh_pairs(corpus.union(batch), "doc_id", "text").collect()
        for a_, b_ in [(r["id_a"], r["id_b"])]
        for b, c in [(a_, b_), (b_, a_)]
        if b in batch_ids and c in corpus_ids
    }
    assert got == want


def test_index_skew_cap_drops_bucket(spark):
    path = os.path.join(SCRATCH, "mh_index_cap")
    shutil.rmtree(path, ignore_errors=True)
    write_minhash_index(_mk(spark, CORPUS), path, "doc_id", "text")
    batch = _mk(spark, BATCH)
    # total bucket membership is >= 2 for any match, so cap=1 drops all
    none = pairs_against_index(spark, path, batch, "doc_id", "text", max_bucket=1)
    assert none.count() == 0
    # cap off reproduces the matches
    some = pairs_against_index(spark, path, batch, "doc_id", "text", max_bucket=None)
    assert some.count() > 0


def test_index_probe_does_not_shuffle_corpus(spark):
    """The index side must reach its semi-join through a broadcast
    (map-side filter), never an Exchange: at corpus scale a shuffle of
    docs x bands rows would dominate the probe."""
    path = os.path.join(SCRATCH, "mh_index_plan")
    shutil.rmtree(path, ignore_errors=True)
    write_minhash_index(_mk(spark, CORPUS), path, "doc_id", "text")
    pairs = pairs_against_index(
        spark, path, _mk(spark, BATCH), "doc_id", "text", max_bucket=None
    )
    pairs.collect()
    # the executed-plan TREE (simple mode: Exchange args print inline,
    # unlike formatted mode where they sit on detail lines)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" in plan, plan
    # the index must reach its semi-join through a BROADCAST hash join
    # (map-side filter) — a regression to a shuffled join would surface
    # as SortMergeJoin/ShuffledHashJoin, each of which exchanges the
    # full docs x bands corpus relation
    semi_lines = [l for l in plan.splitlines() if "LeftSemi" in l]
    assert semi_lines and all("BroadcastHashJoin" in l for l in semi_lines), plan
    # every remaining exchange moves MATCHED rows (bucket aggregates,
    # final distinct) — a corpus-relation shuffle would additionally
    # appear as a sort-merge/shuffled-hash join in this small fixture
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


def test_admit_batch_lifecycle(spark):
    from matdb_spark.operators.dedup import admit_batch

    path = os.path.join(SCRATCH, "admit_test")
    shutil.rmtree(path, ignore_errors=True)
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    # batch 1: 2 is a near-dup of 1 (smaller id wins); 3 novel
    b1 = mk([
        (1, "the quick brown fox jumps over the lazy dog near the river"),
        (2, "the quick brown fox jumps over the lazy dog near the rivers"),
        (3, "completely different text about distributed columnar engines"),
    ])
    a1 = sorted(r["doc_id"] for r in admit_batch(spark, path, b1, "doc_id", "text").collect())
    assert a1 == [1, 3]
    # batch 2: 10 dups the ADMITTED 1; 11 dups the REJECTED 2 (still
    # rejected, via 1's buckets); 12 novel
    b2 = mk([
        (10, "the quick brown fox jumps over the lazy dog near the river"),
        (11, "the quick brown fox jumps over the lazy dog near the rivers"),
        (12, "volcanic geology sentences resembling nothing admitted before"),
    ])
    a2 = sorted(r["doc_id"] for r in admit_batch(spark, path, b2, "doc_id", "text").collect())
    assert a2 == [12]


def test_admit_batch_replay_idempotent(spark):
    """Replaying an already-admitted batch admits nothing and leaves
    the index unchanged: each replayed doc shares all its LSH buckets
    with its own index entry, and admission rejects identity hits
    (unlike the standalone probe, which filters self-pairs)."""
    from matdb_spark.operators.dedup import admit_batch

    path = os.path.join(SCRATCH, "admit_replay_test")
    shutil.rmtree(path, ignore_errors=True)
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    b1 = mk([
        (1, "the quick brown fox jumps over the lazy dog near the river"),
        (3, "completely different text about distributed columnar engines"),
    ])
    assert sorted(
        r["doc_id"] for r in admit_batch(spark, path, b1, "doc_id", "text").collect()
    ) == [1, 3]
    before = spark.read.parquet(path).count()
    replay = admit_batch(spark, path, b1, "doc_id", "text").collect()
    assert replay == []
    assert spark.read.parquet(path).count() == before


def test_stream_admission_end_to_end(spark, tmp_path_factory):
    import os as _os

    from pyspark.sql import functions as F

    from matdb_spark import Database, Dimension, Schema, Value
    from matdb_spark.streaming.admission import stream_admission

    base = str(tmp_path_factory.mktemp("admission_stream"))
    index = _os.path.join(base, "index")
    ckpt = _os.path.join(base, "ckpt")
    src = _os.path.join(base, "src")
    texts = {
        1: "the quick brown fox jumps over the lazy dog near the river",
        2: "the quick brown fox jumps over the lazy dog near the rivers",
        3: "completely different text about distributed columnar engines",
    }
    spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    ).coalesce(1).write.json(src)
    db = Database.create(spark, _os.path.join(base, "db"), Schema(
        dimensions=[Dimension("doc_id", 100)], values=[Value("n_chars")]
    ))
    stream = (
        spark.readStream.schema("doc_id long, text string").json(src)
        .withColumn("n_chars", F.length("text").cast("long"))
    )
    q = stream_admission(
        stream, index, ckpt, "doc_id", "text",
        db=db, db_columns=["doc_id", "n_chars"],
    )
    try:
        assert q.awaitTermination(240), "availableNow stream did not finish"
    finally:
        q.stop()
    got = sorted(r["doc_id"] for r in db.snapshot().collect())
    assert got == [1, 3], got  # 2 rejected as near-dup of 1
    assert _os.path.isdir(index)


def test_admit_batch_replay_rederives_for_streaming(spark):
    """The streaming crash contract (reject_identity=False): after a
    crash between index append and store commit, the replayed batch
    must RE-DERIVE the same admitted set (identity matches ignored),
    so the guarded commit still receives the rows — unlike the
    one-shot default, where a replay admits nothing."""
    from matdb_spark.operators.dedup import admit_batch

    path = os.path.join(SCRATCH, "admit_stream_replay_test")
    shutil.rmtree(path, ignore_errors=True)
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    b1 = mk([
        (1, "the quick brown fox jumps over the lazy dog near the river"),
        (2, "the quick brown fox jumps over the lazy dog near the rivers"),
        (3, "completely different text about distributed columnar engines"),
    ])
    first = sorted(
        r["doc_id"]
        for r in admit_batch(
            spark, path, b1, "doc_id", "text", reject_identity=False
        ).collect()
    )
    assert first == [1, 3]
    # crashed-attempt replay: index already holds the banding rows
    replay = sorted(
        r["doc_id"]
        for r in admit_batch(
            spark, path, b1, "doc_id", "text", reject_identity=False
        ).collect()
    )
    assert replay == first  # same admitted set, not empty


def test_compact_reclaims_replay_debris(spark):
    """A crash between index append and streaming checkpoint replays
    the batch and appends its banding rows a second time (the
    documented crash window, streaming/admission.py). Compaction must
    RECLAIM those duplicates — index row count back to the distinct
    set — while leaving probe behavior unchanged."""
    from matdb_spark.operators.dedup import admit_batch, pairs_against_index
    from matdb_spark.operators.index_maint import compact_minhash_index

    path = os.path.join(SCRATCH, "admit_compact_debris_test")
    shutil.rmtree(path, ignore_errors=True)
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    b1 = mk([
        (1, "the quick brown fox jumps over the lazy dog near the river"),
        (3, "completely different text about distributed columnar engines"),
    ])
    admit_batch(spark, path, b1, "doc_id", "text", reject_identity=False)
    # simulate the crash-window replay: same batch admitted again →
    # byte-identical banding rows appended a second time
    admit_batch(spark, path, b1, "doc_id", "text", reject_identity=False)
    rows_with_debris = spark.read.parquet(path).count()
    distinct_rows = (
        spark.read.parquet(path).select("doc_id", "band", "key").distinct().count()
    )
    assert rows_with_debris == 2 * distinct_rows  # debris present
    compact_minhash_index(spark, path)
    assert spark.read.parquet(path).count() == distinct_rows
    # probes still reject a near-dup of an admitted doc
    probe = mk([
        (9, "the quick brown fox jumps over the lazy dog near the rivers"),
    ])
    pairs = pairs_against_index(spark, path, probe, "doc_id", "text").collect()
    assert {(r["new_id"], r["corpus_id"]) for r in pairs} == {(9, 1)}
