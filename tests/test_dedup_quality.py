"""Dedup retrieval-quality gate (q_dedup_lsh_recall).

Every other dedup oracle proves the two engines compute the SAME
MinHash sketch; this gate measures whether the sketch's candidate
pairs actually contain the true near-dup pairs (exact n-gram Jaccard
>= 0.6). These tests prove the 0.8 recall floor has teeth — a
degraded banding (bands=1, i.e. one 32-row band whose detection
probability at Jaccard ~0.95 is ~0.95^32 ~= 0.2) falls below it —
and that the gated configuration clears it with recall 1.0.
"""

import __spark_entry__ as entry


def _row(spark, bands):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return entry._lsh_recall_frame(docs, bands=bands, floor=0.8).collect()[0]


def test_gated_config_clears_floor(spark):
    r = _row(spark, bands=8)
    assert r["truth_pairs"] > 0
    assert r["hit_pairs"] == r["truth_pairs"]  # measured: recall 1.0
    assert r["recall_floor_met"] is True


def test_recall_floor_has_teeth(spark):
    """bands=1 keeps the same k=32 signature but requires ALL 32
    minhashes to agree for a pair to surface — the fixture's ~0.95
    Jaccard near-dups mostly don't, so the floor FAILS. The gate is
    a real constraint on banding quality, not a tautology."""
    r = _row(spark, bands=1)
    assert r["truth_pairs"] > 0
    assert r["hit_pairs"] < r["truth_pairs"]
    assert r["recall_floor_met"] is False


def test_gopher_rule_edges(spark):
    """Each rule flips on its documented boundary."""
    from matdb_spark.functions.text import gopher_quality

    rows = [
        # 0: too short; 1: passes everything (50 words incl. 2 stopwords)
        (0, "the of " + " ".join(["word"] * 10)),
        (1, "the of " + " ".join(["word"] * 48)),
        # 2: mean word length too long
        (2, " ".join(["supercalifragilistic"] * 60)),
        # 3: numeric words -> alpha_frac 0
        (3, "the of " + " ".join(["12345"] * 48)),
        # 4: only one stopword
        (4, "the " + " ".join(["word"] * 49)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in gopher_quality(df, "doc_id", "text").collect()
    }
    assert got[0]["ok_word_count"] is False
    assert got[1]["gopher_pass"] is True
    assert got[2]["ok_word_len"] is False and got[2]["mean_word_len"] == 20.0
    assert got[3]["ok_alpha"] is False
    assert got[4]["stopword_hits"] == 1 and got[4]["ok_stopwords"] is False


def test_corpus_report_values_and_mode_tiebreak(spark):
    """Exact counts on a hand-built corpus: dup_rate from fingerprint
    identity, integer quality mass, and the deterministic top-lang
    mode (tie broken to the lexicographically smaller lang)."""
    from matdb_spark.functions.text import corpus_report

    rows = [
        (1, "web", "en", "alpha beta gamma"),
        (2, "web", "de", "alpha beta gamma"),   # exact dup of 1
        (3, "web", "de", "delta epsilon"),
        (4, "books", "fr", "zeta eta theta iota"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, lang string, text string")
    got = {
        r["source"]: r
        for r in corpus_report(
            df, "doc_id", "text", gopher_kwargs={"min_words": 2, "min_stopword_hits": 0}
        ).collect()
    }
    web = got["web"]
    assert web["n_docs"] == 3 and web["n_unique"] == 2
    assert abs(web["dup_rate"] - (1 - 2 / 3)) < 1e-9
    assert web["total_ws_tokens"] == 8
    # en=1, de=2 -> de wins on count; a 1-1 tie would break to 'de' too
    assert web["top_lang"] == "de" and web["n_langs"] == 2
    books = got["books"]
    assert books["n_docs"] == 1 and books["dup_rate"] == 0.0
    assert books["gopher_pass_rate"] == 1.0


def test_resolve_clusters_verdict(spark):
    """Canonical pick = highest quality, ties to the lowest id;
    singletons keep themselves; exactly one kept per cluster."""
    from matdb_spark.operators.dedup import resolve_clusters

    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (4, 5), (9, 1)],
        "doc_id long, qm long",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: (r["cluster_id"], r["canonical_id"], r["kept"])
        for r in resolve_clusters(docs, pairs, "doc_id", "qm").collect()
    }
    # cluster {1,2,3,4}: quality 30 tie between 2 and 3 -> 2 wins
    assert got[1] == (1, 2, False)
    assert got[2] == (1, 2, True)
    assert got[3] == (1, 2, False)
    assert got[4] == (1, 2, False)
    # singleton
    assert got[9] == (9, 9, True)


def test_simhash_pairs_pigeonhole_and_verify(spark):
    """Within-radius pairs always surface (pigeonhole over the bands);
    the exact hamming verify drops far pairs a bucket collision might
    admit. Built on hand-made docs: near-identical texts differ in a
    couple of tokens -> tiny hamming; disjoint vocab -> large."""
    from matdb_spark.operators.dedup import simhash_pairs

    base = " ".join(f"tok{i}" for i in range(40))
    rows = [
        (1, base),
        (2, base + " extra"),               # near-dup of 1
        (3, " ".join(f"zzz{i}" for i in range(40))),  # far from both
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs(df, "doc_id", "text", bands=4, max_hamming=6).collect()
    }
    assert (1, 2) in got and got[(1, 2)] <= 6
    assert (1, 3) not in got and (2, 3) not in got
