"""Text-analysis column expressions for training-data pipelines.

Everything here is a composition of built-in JVM-side functions
(regexp_count / md5 / conv / lower ...) — no UDFs — so the operators
stay inside whole-stage codegen and scale linearly with no shuffle.
Patterns stick to the regex subset with identical semantics in Java
regex (Spark) and RE2 (DuckDB oracle): ``\\S``, classes, ``\\b``.
"""

from __future__ import annotations

from pyspark.sql import Column, Window as W, functions as F

# languages for the n-gram/stopword language-ID heuristic
LANG_STOPWORDS = {
    "en": r"\b(the|and|of|to|a|in|is|it|that|was)\b",
    "de": r"\b(der|die|und|das|ist|nicht|ein|zu|mit|den)\b",
    "fr": r"\b(le|la|et|les|des|est|un|une|du|que)\b",
    "es": r"\b(el|la|de|los|y|en|que|un|una|es)\b",
    "zh": r"[一-鿿]",
}

TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"  # BPE-ish pre-tokenizer split
PUNCT_PATTERN = r"[.,;:!?]"


def normalize(text: Column) -> Column:
    """Canonical form for fingerprinting/dedup: lowercase, collapse
    whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


#: Character-level accent fold map: Latin-1/-Extended diacritics to
#: their ASCII base letters. Applied with ``translate`` — one
#: codepoint to one codepoint, the semantics both Spark (JVM) and
#: DuckDB implement identically, which is what lets the oracle replay
#: the fold verbatim. Deliberately NOT full NFKC (that needs ICU):
#: this is the deterministic, engine-portable subset a multilingual
#: corpus scrub actually applies before hashing/shingling.
ACCENT_FROM = (
    "àáâãäåāăąçćčèéêëēĕėęěìíîïĩīĭįñńňòóôõöøōŏőšùúûüũūŭůýÿžß"
    "ďđťţřŕľĺłśşźżğ"
    "ÀÁÂÃÄÅĀĂĄÇĆČÈÉÊËĒĔĖĘĚÌÍÎÏĨĪĬĮÑŃŇÒÓÔÕÖØŌŎŐŠÙÚÛÜŨŪŬŮÝŸŽ"
    "ĎĐŤŢŘŔĽĹŁŚŞŹŻĞ"
)
ACCENT_TO = (
    "aaaaaaaaaccceeeeeeeeeiiiiiiiinnnooooooooosuuuuuuuuyyzs"
    "ddttrrlllsszzg"
    "AAAAAAAAACCCEEEEEEEEEIIIIIIIINNNOOOOOOOOOSUUUUUUUUYYZ"
    "DDTTRRLLLSSZZG"
)


def fold_accents(text: Column) -> Column:
    """Fold accented characters to ASCII base letters (translate map
    above). Zero-shuffle expression; compose before fingerprinting /
    shingling so 'café' and 'cafe' dedup together."""
    return F.translate(text, ACCENT_FROM, ACCENT_TO)


def whitespace_token_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(r"\S+"))


def token_count(text: Column) -> Column:
    """Count of BPE-ish pre-tokens (letter runs, digit runs, single
    punctuation)."""
    return F.regexp_count(text, F.lit(TOKEN_PATTERN))


def punct_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(PUNCT_PATTERN))


def stopword_count(text: Column, lang: str = "en") -> Column:
    return F.regexp_count(F.lower(text), F.lit(LANG_STOPWORDS[lang]))


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0,1]: enough tokens, not punctuation-heavy,
    has common-word signal. Deterministic double arithmetic."""
    n_tok = whitespace_token_count(text).cast("double")
    n_punct = punct_count(text).cast("double")
    n_stop = stopword_count(text).cast("double")
    length_part = F.least(F.lit(1.0), n_tok / F.lit(100.0))
    punct_part = F.lit(1.0) - F.least(F.lit(1.0), n_punct / F.greatest(n_tok, F.lit(1.0)))
    stop_part = F.least(F.lit(1.0), n_stop / F.greatest(n_tok, F.lit(1.0)) * F.lit(5.0))
    return length_part * F.lit(0.4) + punct_part * F.lit(0.4) + stop_part * F.lit(0.2)


def lang_id(text: Column) -> Column:
    """Stopword-hit language ID: the language with the most pattern
    hits wins; ties break in fixed language order; no hits → 'und'."""
    lowered = F.lower(text)
    hits = [
        (code, F.regexp_count(lowered, F.lit(pat)))
        for code, pat in LANG_STOPWORDS.items()
    ]
    best_code, best_n = F.lit("und"), F.lit(0)
    # fixed iteration order; strict > keeps the earlier language on ties
    for code, n in hits:
        is_better = n > best_n
        best_code = F.when(is_better, F.lit(code)).otherwise(best_code)
        best_n = F.when(is_better, n).otherwise(best_n)
    return best_code


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(F.encode(normalize(text), "utf-8"))


def hash_hex(col: Column, digits: int) -> Column:
    """Stable positive integer hash usable across engines: first
    ``digits`` hex digits of md5, base-16 → long (4·digits bits)."""
    return F.conv(
        F.substring(F.md5(F.encode(col.cast("string"), "utf-8")), 1, digits), 16, 10
    ).cast("long")


def hash64(col: Column) -> Column:
    """60-bit variant (safe for bit tests; NOT for multiplication —
    products overflow 64-bit integers)."""
    return hash_hex(col, 15)


GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality(
    df,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_frac: float = 0.8,
    min_stopword_hits: int = 2,
    keep_cols: tuple = (),
):
    """Gopher quality-rule bundle (Rae et al. 2021, "Scaling Language
    Models: ... Gopher", Table A1) as per-rule boolean flags plus the
    composite verdict — the standard pre-training quality FILTER,
    complementing the continuous quality_score and the repetition
    signals (q_repetition_signals covers Table A1's duplicate-ngram
    rows). Rules transcribed:

    - word count in [min_words, max_words]
    - mean word length in [min_mean_word_len, max_mean_word_len]
    - symbol-to-word ratio (# and ellipsis) <= max_symbol_ratio
    - fraction of words with an alphabetic char >= min_alpha_frac
    - at least min_stopword_hits DISTINCT Gopher stopwords present

    Exchange-free single-pass scan (plan-asserted in tests): every
    signal is a built-in expression over the word array, which
    materializes once per row as an attribute. All ratios are
    int/int double divisions — bit-identical on any engine.
    ``keep_cols`` pass extra input columns through the projection, so
    a composition (corpus_report) consumes the flags WITHOUT a join
    back by id — i.e. without a second corpus scan re-deriving the
    word arrays.
    """
    keep = list(keep_cols)
    words = df.select(
        F.col(id_col),
        *keep,
        F.split(normalize(F.col(text_col)), " ").alias("__w"),
        F.regexp_count(F.col(text_col), F.lit(r"[#…]|\.\.\.")).alias(
            "__sym"
        ),
    )
    sig = words.select(
        id_col,
        *keep,
        F.size("__w").cast("long").alias("n_words"),
        (
            F.aggregate(
                F.transform("__w", F.length),
                F.lit(0).cast("long"),
                lambda a, x: a + x.cast("long"),
            )
            / F.size("__w")
        ).alias("mean_word_len"),
        (F.col("__sym") / F.size("__w")).alias("symbol_ratio"),
        (
            F.size(F.filter("__w", lambda x: x.rlike("[a-z]"))) / F.size("__w")
        ).alias("alpha_frac"),
        F.size(
            F.array_intersect(
                F.array_distinct("__w"),
                F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
            )
        )
        .cast("long")
        .alias("stopword_hits"),
    )
    flags = sig.select(
        "*",
        F.col("n_words").between(min_words, max_words).alias("ok_word_count"),
        F.col("mean_word_len")
        .between(min_mean_word_len, max_mean_word_len)
        .alias("ok_word_len"),
        (F.col("symbol_ratio") <= max_symbol_ratio).alias("ok_symbols"),
        (F.col("alpha_frac") >= min_alpha_frac).alias("ok_alpha"),
        (F.col("stopword_hits") >= min_stopword_hits).alias("ok_stopwords"),
    )
    return flags.select(
        "*",
        (
            F.col("ok_word_count")
            & F.col("ok_word_len")
            & F.col("ok_symbols")
            & F.col("ok_alpha")
            & F.col("ok_stopwords")
        ).alias("gopher_pass"),
    )


def corpus_report(
    df,
    id_col: str,
    text_col: str,
    source_col: str = "source",
    lang_col: str = "lang",
    gopher_kwargs: dict | None = None,
):
    """Per-source corpus data card — the summary a curation pipeline
    publishes with a training mix (Datasheets/Data-Cards practice;
    the per-source stats Gopher/Llama papers table): document and
    exact-duplicate counts, token volume, quality mass, Gopher-rule
    pass rate, and the language profile.

    Cross-engine exactness: per-doc quality is quantized to integer
    MICRO-units (floor(q·1e6 + 0.5)) BEFORE the sum — double
    summation is order-sensitive, integer summation is not (the
    micro-nat convention of operators/selection). mean_quality and
    the rates are ratios of exact integers. top_lang is the
    deterministic mode (count desc, lang asc).

    One aggregation over the corpus plus a tiny per-(source, lang)
    count relation — both map-side partial, keyed by source; no
    per-document output, so the report is broadcastable however
    large the corpus.
    """
    flags = gopher_quality(
        df,
        id_col,
        text_col,
        keep_cols=(source_col, lang_col, text_col),
        **(gopher_kwargs or {}),
    )
    # keep_cols carry source/lang/text THROUGH the flag projection —
    # one corpus scan computes flags and text stats together (the
    # join-back-by-id form re-derived every word array a second time)
    per_doc = flags.select(
        F.col(id_col).alias("__id"),
        F.col(source_col).alias("source"),
        F.col(lang_col).alias("__lang"),
        fingerprint(F.col(text_col)).alias("__fp"),
        whitespace_token_count(F.col(text_col)).cast("long").alias("__nt"),
        F.floor(quality_score(F.col(text_col)) * 1e6 + F.lit(0.5))
        .cast("long")
        .alias("__qm"),
        "gopher_pass",
    )
    agg = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("__fp").alias("n_unique"),
        F.sum("__nt").alias("total_ws_tokens"),
        F.sum("__qm").alias("sum_quality_micro"),
        F.sum(F.col("gopher_pass").cast("long")).alias("n_gopher_pass"),
        F.countDistinct("__lang").alias("n_langs"),
    )
    lang_counts = per_doc.groupBy("source", "__lang").agg(
        F.count(F.lit(1)).alias("__lc")
    )
    top = (
        lang_counts.withColumn(
            "__rn",
            F.row_number().over(
                W.partitionBy("source").orderBy(
                    F.col("__lc").desc(), F.col("__lang").asc()
                )
            ),
        )
        .filter(F.col("__rn") == 1)
        .select("source", F.col("__lang").alias("top_lang"))
    )
    return agg.join(top, "source").select(
        "source",
        "n_docs",
        "n_unique",
        (F.lit(1.0) - F.col("n_unique") / F.col("n_docs")).alias("dup_rate"),
        "total_ws_tokens",
        "sum_quality_micro",
        (F.col("sum_quality_micro") / F.col("n_docs") / F.lit(1e6)).alias(
            "mean_quality"
        ),
        (F.col("n_gopher_pass") / F.col("n_docs")).alias("gopher_pass_rate"),
        "n_langs",
        "top_lang",
    )


def winnowing_fingerprints(df, id_col: str, text_col: str, k: int = 8, w: int = 4):
    """(id, fp) — winnowing document fingerprints (MOSS-style): hash
    every k-char gram of the normalized text, slide a w-gram window,
    keep each window's minimum hash, emit the distinct minima.

    Robust local fingerprints: a shared substring of length ≥ k+w-1
    guarantees a shared fingerprint, and edits only perturb nearby
    windows — the rolling-hash fingerprinting the whole-doc md5
    (``fingerprint``) cannot provide.

    All JVM-side: the normalized text and the gram-hash array are
    materialized attributes (multiply-referenced non-cheap expressions
    stay projected — see shingle_rows for the lambda-recompute trap);
    windows are ``slice`` + ``array_min`` over the attribute. Zero
    shuffle; cost ~ one md5 per character.
    """
    normed = df.select(F.col(id_col), normalize(F.col(text_col)).alias("__n"))
    n_grams = F.greatest(F.length("__n") - (k - 1), F.lit(0))
    gram = lambda i: hash_hex(F.col("__n").substr(i, F.lit(k)), 12)
    grams = normed.select(
        id_col,
        F.when(
            n_grams > 0, F.transform(F.sequence(F.lit(1), n_grams), gram)
        ).otherwise(F.array().cast("array<long>")).alias("__g"),
    )
    n_wins = F.greatest(F.size("__g") - (w - 1), F.lit(0))
    win_min = lambda j: F.array_min(F.slice("__g", j, w))
    mins = grams.select(
        id_col,
        F.when(
            n_wins > 0, F.transform(F.sequence(F.lit(1), n_wins), win_min)
        ).otherwise(F.array().cast("array<long>")).alias("__m"),
    )
    return mins.select(id_col, F.explode(F.array_distinct("__m")).alias("fp"))
