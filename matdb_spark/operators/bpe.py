"""Distributed BPE vocabulary training and application.

Public method: byte-pair encoding for subword vocabularies (Sennrich,
Haddow, Birch, "Neural Machine Translation of Rare Words with Subword
Units", ACL 2016 — the standard subword tokenizer trainer). This is an
independent Spark-native implementation of the word-frequency form
every production trainer uses:

1. ONE corpus scan builds the (word, count) relation — bounded by the
   vocabulary, not the corpus. Everything after runs over that
   relation, so 100 TB of text costs one aggregation and the merge
   loop costs |vocab|-sized jobs.
2. Each merge iteration: count adjacent symbol pairs weighted by word
   count (map-side combined aggregation), take the most frequent pair
   (driver-side argmax over a bounded relation; ties break on the
   pair string for engine-identical determinism), rewrite the symbol
   strings, repeat.

Merge-application convention (shared verbatim by the Spark trainer,
the DuckDB oracle, and the tokenizer below, so all three are
bit-identical): the pair ``a b`` is merged by TWO successive
simultaneous left-to-right non-overlapping string replaces of
`` a b `` with `` ab `` on the space-padded symbol string. One replace
misses occurrences whose leading space was consumed by the previous
match; the second pass catches them (leftovers are isolated by
construction), so no occurrence of the merged pair survives the
iteration. On runs of a self-overlapping pair (``a a a a a``) this
deviates from sequential greedy list-merging (it yields ``aa a aa``
where greedy yields ``aa aa a``) — an explicitly chosen deterministic
convention, not an accident: simultaneous replace is expressible as a
pure column expression on any engine, while sequential greedy is not.

Measured deviation bound (tests/test_bpe_greedy.py, which carries a
pure-Python sequential-greedy reference): at 16 learned merges over
the documents fixture the two conventions agree token-for-token on
EVERY document — 0/500 diverge at sf0.001 (112,440 tokens) and 0/5000
at sf0.1 (1,093,259 tokens), even though ~6.6% of words contain
adjacent repeated characters. Divergence requires a LEARNED merge to
hit a self-overlapping run (e.g. pair (a, a) over ``aaaaa``), where
the conventions produce the same token COUNT but a different
segmentation — pinned exactly by the same test file.

Symbols are characters of the normalized word plus a ``</w>``
end-of-word marker; symbols never contain spaces, so the
space-joined symbol string is unambiguous.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from matdb_spark.functions.text import normalize

END_OF_WORD = "</w>"


def word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(w, cnt) — whitespace-token counts of the normalized corpus.
    The one corpus-sized pass; map-side combined."""
    toks = df.select(
        F.explode(
            F.filter(
                F.split(normalize(F.coalesce(F.col(text_col), F.lit(""))), " "),
                lambda x: x != F.lit(""),
            )
        ).alias("w")
    )
    return toks.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))


def _symbol_string(word: Column) -> Column:
    """'h e l l o </w>' — the word's characters space-joined with the
    end-of-word marker."""
    return F.concat_ws(
        " ",
        F.concat_ws(" ", F.regexp_extract_all(word, F.lit("."), 0)),
        F.lit(END_OF_WORD),
    )


def merge_expr(s: Column, left: str, right: str) -> Column:
    """Apply one merge to a symbol-string column: two simultaneous
    padded replaces (see module docstring for why two)."""
    pat = F.lit(f" {left} {right} ")
    rep = F.lit(f" {left}{right} ")
    padded = F.concat(F.lit(" "), s, F.lit(" "))
    once = F.replace(padded, pat, rep)
    return F.trim(F.replace(once, pat, rep))


def _pair_counts(syms: DataFrame) -> DataFrame:
    """(pair, c) — adjacent-symbol pair counts weighted by word count;
    'pair' is 'left right' (symbols contain no spaces)."""
    arr = syms.select("cnt", F.split("s", " ").alias("__a"))
    n = F.size("__a")
    pairs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.concat_ws(
                " ", F.get(F.col("__a"), i), F.get(F.col("__a"), i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        arr.select("cnt", F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("cnt").cast("long").alias("c"))
    )


def train_bpe(
    df: DataFrame,
    text_col: str,
    num_merges: int = 32,
    min_count: int = 2,
) -> list[tuple[int, str, str, int]]:
    """Learn ``num_merges`` BPE merges from the corpus: returns
    [(merge_rank, left, right, pair_count), ...] in learned order.
    Stops early when the best remaining pair's count drops below
    ``min_count`` (or no pairs remain).

    Scale: the corpus is scanned ONCE (word_counts); each iteration is
    one |vocab|-bounded aggregation plus a 1-row driver argmax. The
    symbol relation localCheckpoints every 4th merge, not every merge:
    replaces are narrow expressions, so a few un-checkpointed levels
    recompute cheaply, while checkpoint blocks are only released by
    the driver's ContextCleaner (localCheckpoint has no explicit
    unpersist) — the interval bounds the retained vocab-sized copies
    to num_merges/4 instead of num_merges."""
    wc = word_counts(df, text_col)
    syms = wc.select("cnt", _symbol_string(F.col("w")).alias("s")).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        top = (
            _pair_counts(syms)
            .orderBy(F.col("c").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["c"] < min_count:
            break
        left, right = top[0]["pair"].split(" ", 1)
        merges.append((rank, left, right, int(top[0]["c"])))
        syms = syms.select("cnt", merge_expr(F.col("s"), left, right).alias("s"))
        if rank % 4 == 3:
            syms = syms.localCheckpoint()
    return merges


def bpe_segment_expr(text: Column, merges: list[tuple[int, str, str, int]]) -> Column:
    """Symbol string of a whole normalized text after applying the
    learned merges in rank order — one chained column expression
    (2 replaces per merge). Tokens of a document are this string split
    on spaces."""
    words = F.filter(
        F.split(normalize(F.coalesce(text, F.lit(""))), " "),
        lambda x: x != F.lit(""),
    )
    s = F.concat_ws(" ", F.transform(words, _symbol_string))
    for _, left, right, _ in sorted(merges):
        s = merge_expr(s, left, right)
    return s


def bpe_detokenize_expr(s: Column) -> Column:
    """Invert a symbol string back to normalized text: drop the
    inter-symbol spaces (merges only ever JOIN adjacent symbols of a
    word, so the concatenated symbols ARE the character stream), then
    turn each end-of-word marker into a word separator. Exact inverse
    of bpe_segment_expr for ANY merge sequence — the tokenizer
    round-trip contract a loader depends on. Caveat: a document whose
    raw text literally contains the marker string '</w>' would be
    ambiguous; normalized prose never does, and the property test
    pins the contract on the corpus it's used with."""
    return F.trim(
        F.replace(
            F.replace(s, F.lit(" "), F.lit("")),
            F.lit(END_OF_WORD),
            F.lit(" "),
        )
    )


def bpe_roundtrip(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[int, str, str, int]],
) -> DataFrame:
    """(id, n_bpe_tokens, roundtrip_ok): tokenize, detokenize, and
    compare against the normalized original — the loader-side
    integrity check that the learned vocabulary loses no characters.
    Exchange-free scan."""
    s = bpe_segment_expr(F.col(text_col), merges)
    n = F.when(s == "", F.lit(0)).otherwise(F.size(F.split(s, " ")))
    orig = F.concat_ws(
        " ",
        F.filter(
            F.split(normalize(F.coalesce(F.col(text_col), F.lit(""))), " "),
            lambda x: x != F.lit(""),
        ),
    )
    return df.select(
        id_col,
        n.cast("long").alias("n_bpe_tokens"),
        (bpe_detokenize_expr(s) == orig).alias("roundtrip_ok"),
    )


def bpe_token_count(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[int, str, str, int]],
) -> DataFrame:
    """(id, n_bpe_tokens) under the learned vocabulary — the budget
    number a packing/mixture stage consumes. Exchange-free scan.
    Documents with no tokens count 0."""
    s = bpe_segment_expr(F.col(text_col), merges)
    n = F.when(s == "", F.lit(0)).otherwise(F.size(F.split(s, " ")))
    return df.select(id_col, n.cast("long").alias("n_bpe_tokens"))
