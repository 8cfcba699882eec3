"""remove_duplicate_spans — C4-style duplicated-span removal.

Covers the rule's corners: first occurrence kept, cross-doc and
within-doc repeats removed, overlapping duplicated runs compose,
short documents pass through untouched, fully-scrubbed documents
come back with empty clean_text.
"""

from matdb_spark.operators.dedup import remove_duplicate_spans


def _run(spark, rows, n=3):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: (r["n_words"], r["n_removed"], r["clean_text"])
        for r in remove_duplicate_spans(df, "doc_id", "text", n=n).collect()
    }


def test_first_occurrence_kept_cross_doc(spark):
    got = _run(
        spark,
        [
            (1, "a b c tail one"),
            (2, "head two a b c"),
        ],
    )
    # doc 1 holds the (doc, pos)-first occurrence of "a b c" -> intact
    assert got[1] == (5, 0, "a b c tail one")
    # doc 2's copy is removed; its unique words survive
    assert got[2] == (5, 3, "head two")


def test_short_docs_and_uniques_untouched(spark):
    got = _run(spark, [(1, "x y"), (2, "p q r s")])
    assert got[1] == (2, 0, "x y")
    assert got[2] == (4, 0, "p q r s")


def test_overlapping_run_scrubs_whole_copy(spark):
    # the 4-word run "a b c d" duplicates via TWO overlapping 3-grams;
    # the copy loses all 4 positions, not just one window
    got = _run(spark, [(1, "a b c d"), (2, "z a b c d z2")])
    assert got[1] == (4, 0, "a b c d")
    assert got[2] == (6, 4, "z z2")


def test_within_doc_repeat_removed(spark):
    got = _run(spark, [(1, "a b c a b c")])
    assert got[1] == (6, 3, "a b c")


def test_fully_scrubbed_doc_survives_as_empty(spark):
    got = _run(spark, [(1, "a b c"), (2, "a b c")])
    assert got[1] == (3, 0, "a b c")
    assert got[2] == (3, 3, "")
