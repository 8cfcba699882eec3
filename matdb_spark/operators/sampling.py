"""Deterministic sampling for corpus curation.

Training-data pipelines need samples that are (a) reproducible across
runs/retries/engines — so RNG-based ``df.sample`` is out — and (b)
stable under data growth (a row's membership never depends on other
rows). Both come from hashing: a row is in the p% sample iff
``hash(id) mod M < p·M``. Properties:

- deterministic & engine-portable (md5 — same trick as the dedup
  oracles);
- composable: nested samples (10% then 1%) select nested subsets if
  thresholds nest;
- zero shuffle for the flat sample (pure filter, full codegen);
- per-group fixed-size sampling is a hash-ordered top-n (ranking
  window → WindowGroupLimit: each map task ships ≤ n rows per group).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from matdb_spark.functions.text import hash_hex
from matdb_spark.operators.topk import top_k_per_group

_MOD = 1_000_000


def sample_fraction(
    df: DataFrame, id_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Deterministic ~``fraction`` sample: hash(id||salt) mod 1e6 <
    fraction·1e6. Different salts give independent samples."""
    key = F.concat(F.col(id_col).cast("string"), F.lit(salt))
    return df.filter(hash_hex(key, 12) % _MOD < int(fraction * _MOD))


def sample_stratified(
    df: DataFrame, id_col: str, strata_col: str, fractions: dict, salt: str = ""
) -> DataFrame:
    """Per-stratum deterministic fractions (unlisted strata drop).
    The membership test stays a pure filter — no shuffle, no RNG."""
    key = F.concat(F.col(id_col).cast("string"), F.lit(salt))
    h = hash_hex(key, 12) % _MOD
    cond = F.lit(False)
    for stratum, frac in fractions.items():
        cond = cond | ((F.col(strata_col) == stratum) & (h < int(frac * _MOD)))
    return df.filter(cond)


def sample_n_per_group(
    df: DataFrame, keys: Sequence[str], id_col: str, n: int, salt: str = ""
) -> DataFrame:
    """Exactly min(n, group size) rows per group, chosen by hash order
    — a deterministic 'reservoir'. One shuffle (the ranking window),
    WindowGroupLimit-bounded."""
    key = F.concat(F.col(id_col).cast("string"), F.lit(salt))
    ranked = top_k_per_group(
        df.withColumn("__h", hash_hex(key, 12)),
        list(keys),
        [F.col("__h").asc(), F.col(id_col).asc()],
        n,
        rank_col="__rank",
    )
    return ranked.drop("__h", "__rank")


def rebalance_mixture(
    df: DataFrame,
    weights: DataFrame,
    group_col: str,
    id_col: str,
    weight_col: str = "weight",
    salt: str = "",
    out_col: str = "copy_idx",
) -> DataFrame:
    """Materialize a target training mixture: every row is emitted
    ``floor(w) + Bernoulli(frac(w))`` times, where ``w`` is its
    group's sampling weight (e.g. from the mixture-weights calculator
    — w < 1 downsamples a source, w > 1 upsamples by duplication).
    Output rows carry ``out_col`` (1-based copy index) so downstream
    packing/shuffling treats copies as distinct examples. In
    expectation each group's share becomes weight × its actual share —
    the standard stochastic-rounding rebalance.

    Deterministic: the Bernoulli draw is the hash-uniform
    ``u = hash(id||salt)/2^48`` — reproducible across engines, runs,
    and partitionings, independent per salt. NULL/absent weights drop
    the row (you cannot weight an unlisted group).

    Scale: the weights side is a per-group table — broadcast join, no
    shuffle of ``df``; the explode emits ``copies`` rows per input row
    inline (no shuffle). Whole plan is scan → broadcast-hash-join →
    generate."""
    u = (
        hash_hex(F.concat(F.col(id_col).cast("string"), F.lit(salt)), 12)
        / F.lit(float(1 << 48))
    )
    w = F.col(weight_col)
    copies = (
        F.floor(w) + F.when(u < w - F.floor(w), F.lit(1)).otherwise(F.lit(0))
    ).cast("int")
    joined = df.join(
        F.broadcast(weights.select(group_col, weight_col)), group_col, "inner"
    ).filter(w.isNotNull())
    return (
        joined.withColumn("__copies", copies)
        .filter(F.col("__copies") > 0)
        .withColumn(out_col, F.explode(F.sequence(F.lit(1), F.col("__copies"))))
        .drop("__copies", weight_col)
    )


def temperature_weights(
    per: DataFrame,
    group_col: str,
    mass_col: str,
    temperature: float = 2.0,
) -> DataFrame:
    """Temperature-flattened sampling shares — the standard
    multilingual/multi-source mixture knob (mBERT/XLM-R style):
    sampling share q_s ∝ p_s^(1/T), where p_s is the group's natural
    token share. T=1 keeps natural shares, T→∞ approaches uniform;
    T=2 is the common compromise. Returns (group, mass, share,
    temp_share, weight) with ``weight = temp_share / share`` — the
    per-example duplication factor to feed ``rebalance_mixture``.

    Determinism design (value-exact cross-engine oracles): the input
    is a bounded per-GROUP relation (sources/languages — bounded by
    design), so it is gathered into ONE sorted array and every float
    step is either a correctly-rounded IEEE op (division, sqrt) or a
    fold in group order (the denominator Σ p^(1/T)) — the same
    accumulation sequence any engine's ordered list-sum replays. The
    grand total is an exact BIGINT sum first. At T=2 the exponent is
    computed as sqrt (correctly rounded everywhere); other T use
    pow, whose last-ulp behavior may differ across libm
    implementations — round before comparing cross-engine there."""
    texp = 1.0 / temperature

    def tshare(share: Column) -> Column:
        if temperature == 2.0:
            return F.sqrt(share)
        return F.pow(share, F.lit(texp))

    arr = per.select(
        F.struct(
            F.col(group_col).alias("g"), F.col(mass_col).cast("long").alias("m")
        ).alias("s")
    ).agg(F.array_sort(F.collect_list("s")).alias("a"))
    grand = F.aggregate(
        "a", F.lit(0).cast("long"), lambda acc, s: acc + s["m"]
    )
    row = arr.select("a", grand.alias("__grand"))
    denom = F.aggregate(
        "a",
        F.lit(0.0),
        lambda acc, s: acc + tshare(s["m"] / F.col("__grand")),
    )
    row = row.select("a", "__grand", denom.alias("__denom"))
    share = F.col("s.m") / F.col("__grand")
    return (
        row.select(F.explode("a").alias("s"), "__grand", "__denom")
        .select(
            F.col("s.g").alias(group_col),
            F.col("s.m").alias(mass_col),
            share.alias("share"),
            (tshare(share) / F.col("__denom")).alias("temp_share"),
        )
        .withColumn(
            "weight",
            F.when(F.col("share") > 0, F.col("temp_share") / F.col("share")),
        )
    )


def assign_splits(
    df: DataFrame,
    id_col: str,
    weights: Sequence[tuple[str, float]] = (
        ("train", 0.98),
        ("val", 0.01),
        ("test", 0.01),
    ),
    seed: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: a row's split is a
    pure function of ``hash(seed:id)`` — the standard hash-split used
    by every large corpus pipeline, because at 100 TB the properties
    that matter are exactly the hash-sample ones (module docstring):
    membership never changes when the corpus grows, is identical
    across retries / engines / partitionings, and costs a zero-shuffle
    projection (no global count, no sort, no RNG state).

    ``weights`` is an ORDERED (name, fraction) sequence; fractions
    must sum to 1.0 within 1e-9. Buckets are contiguous integer
    ranges of ``hash mod 1e6`` in the given order, so nested ratios
    (e.g. growing train from 0.98 to 0.99) only MOVE rows between
    adjacent splits, never reshuffle inside one. A different ``seed``
    is an independent assignment.

    Expected fractions are exact over the hash space (each weight is
    rounded ONCE to integer hash-space units, thresholds are exact
    integer sums — no float-accumulation artifacts); realized
    fractions concentrate around them like any hash sample. Returns
    ``df`` plus ``out_col``.
    """
    total = sum(w for _, w in weights)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1.0, got {total}")
    if len(weights) < 2:
        raise ValueError("need at least two splits")
    h = (
        hash_hex(
            F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")), 15
        )
        % _MOD
    )
    # Accumulate thresholds as INTEGER hash-space units (round each
    # weight once, then sum ints): 0.7 of a 1e6 space is exactly
    # 700000, never 699999 — realized boundaries must not depend on
    # binary float representation of a cumulative float sum.
    cum = 0
    expr = None
    for name, w in weights[:-1]:
        cum += round(w * _MOD)
        cond = h < F.lit(cum)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = expr.otherwise(weights[-1][0])
    return df.withColumn(out_col, expr)


def budget_select(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    budget: int,
    order_by: Sequence[Column],
    out_cum: str = "cum_weight",
    out_kept: str = "kept",
) -> DataFrame:
    """Per-group BUDGET selection: walk each group in ``order_by``
    order (pass a total order — quality desc + id is the usual one)
    and keep rows while the running ``weight_col`` sum stays within
    ``budget`` — the per-domain token-quota step of mixture building
    (every curated corpus caps its domains; the quota walk is how the
    cap meets a quality ranking).

    Returns ``df`` + (cum_weight, kept). The running sum is a
    PER-GROUP window — partitioned by the quota key, so it scales
    with the largest group, never the corpus (a GLOBAL budget walk is
    the partitionless-window trap; shard it by group or use
    ranking.global_row_number's bucketing). Weights should be exact
    integers (token counts) so the cumsum is engine-exact.

    A row keeps iff its own cumulative sum fits: a single row larger
    than the whole budget is dropped even at position 1 (quota
    semantics, not first-fit packing)."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(weight_col)).over(w)
    return df.withColumn(out_cum, cum).withColumn(
        out_kept, F.col(out_cum) <= F.lit(budget)
    )


def budget_select_global(
    df: DataFrame,
    weight_col: str,
    budget: int,
    order_by: Sequence[Column],
    bucket: Column,
    out_cum: str = "cum_weight",
    out_kept: str = "kept",
) -> DataFrame:
    """CORPUS-WIDE budget selection: keep rows in (bucket, order_by)
    total order while the global running ``weight_col`` sum fits the
    budget — 'the best N tokens overall', the whole-corpus sibling of
    budget_select's per-domain quota. The running sum comes from
    ranking.global_running_sum's two-phase plan (per-bucket totals +
    #buckets-row offset window + per-bucket cumsum), never from a
    partitionless window; ``bucket`` must be monotone in the leading
    sort key (global_row_number's contract)."""
    from matdb_spark.operators.ranking import global_running_sum

    out = global_running_sum(
        df, list(order_by), bucket, weight_col, out_col=out_cum
    )
    return out.withColumn(out_kept, F.col(out_cum) <= F.lit(budget))


def epoch_shuffle(
    df: DataFrame, id_col: str, seed: int, out_col: str = "shuffle_rank"
) -> DataFrame:
    """Reproducible training-order shuffle: every row gets a
    ``shuffle_key`` = 60-bit md5 of ``seed:id`` and ``out_col`` = its
    1-based position in the (key, id) total order. Same seed → same
    order on any engine and any partitioning (retries, speculative
    tasks, engine swaps all see one epoch order); a new seed is a
    fresh permutation. The rank is contiguous WITHOUT a single-task
    global window: the hash's top bits bucket the order monotonically,
    so ``global_row_number``'s per-bucket counting applies (one small
    bucket window + a broadcast offset join)."""
    from matdb_spark.operators.ranking import global_row_number

    key = hash_hex(
        F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")), 15
    )
    with_key = df.withColumn("shuffle_key", key)
    return global_row_number(
        with_key,
        [F.col("shuffle_key"), F.col(id_col)],
        F.shiftright(F.col("shuffle_key"), 52),
        out_col=out_col,
    )
