"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: exact brute-force top-k — broadcast the (small)
  query set against the corpus, per-row JVM cosine, grouped top-k via
  the WindowGroupLimit-optimized ranking window. O(|corpus|·|queries|)
  compute but embarrassingly parallel and shuffle-light (only the
  final per-query top-k); the correctness baseline.
- ``ivf_topk``: IVF-style approximate search — partition the corpus
  by nearest centroid once, then probe only ``nprobe`` inverted lists
  per query. Cuts compute by ~ncells/nprobe at the cost of recall;
  the scale path when |queries| is large.
- ``cosine_near_dup_pairs``: embedding near-duplicate detection via
  the same centroid partitioning (pairs inside a cell only).

All cosine math is built-in higher-order functions (functions/vectors)
— no Python UDFs anywhere.

Unit-vector design: every entry point normalizes vectors ONCE per row
(`_unit`), so per-pair similarity is a single dot-product fold instead
of dot + two norms. At 100 TB this is the difference between O(pairs·d)
and O(pairs·3d) — and it matches how production vector stores persist
embeddings (pre-normalized at write time). The DuckDB oracles use the
identical normalize-then-dot float ops, keeping results bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from matdb_spark.sources.tables import read_parquet_cached_schema as _rp

from matdb_spark.functions.vectors import as_double, dot, norm
from matdb_spark.operators.topk import top_k_per_group


def _unit(df: DataFrame, id_exprs: list, vec_col: str, out_col: str) -> DataFrame:
    """Project to (ids..., unit vector). The norm is bound as a lambda
    VARIABLE (the transform-over-singleton binding) so it evaluates
    once per row: a projected norm column is referenced exactly once
    here, which CollapseProject inlines straight into the divide
    lambda — i.e. norm recomputed PER ELEMENT, O(d²). Measured 5.7 s →
    0.6 s on 32k × 64-dim vectors.

    Both stages are single F.expr strings (one py4j round trip each;
    the per-lambda Python construction cost ~100 ms per _unit call at
    plan-build time, paid 2-4× by every similarity query). Same
    operators, same fold order — bit-identical unit vectors; zero-norm
    vectors still map to NULL (no ELSE arm), so they drop out of
    top-k/threshold results instead of aborting under ANSI mode."""
    t = df.select(
        *id_exprs,
        F.expr(f"transform(`{vec_col}`, xx -> CAST(xx AS DOUBLE))").alias("__v0"),
    )
    uv = F.expr(
        "get(transform(array(SQRT(aggregate(zip_with(`__v0`, `__v0`, "
        "(x, y) -> x * y), 0D, (acc, x) -> acc + x))), "
        "nv -> CASE WHEN nv != 0D THEN transform(`__v0`, x -> x / nv) END), 0)"
    )
    keep = [c for c in t.columns if c != "__v0"]
    return t.select(*keep, uv.alias(out_col))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    include_self: bool = False,
) -> DataFrame:
    """Exact top-k neighbors: (query_id, neighbor_id, cos_sim, rank).
    Ties broken by neighbor id — fully deterministic output."""
    q = _unit(queries, [F.col(id_col).alias(query_id_col)], vec_col, "__qv")
    c = _unit(corpus, [F.col(id_col).alias("neighbor_id")], vec_col, "__cv")
    joined = c.crossJoin(F.broadcast(q))
    if not include_self:
        joined = joined.filter(F.col("neighbor_id") != F.col(query_id_col))
    scored = joined.select(
        query_id_col,
        "neighbor_id",
        dot(F.col("__qv"), F.col("__cv")).alias("cos_sim"),
    ).filter(F.col("cos_sim").isNotNull())  # zero/mismatched vectors drop out
    return top_k_per_group(
        scored,
        [query_id_col],
        [F.col("cos_sim").desc(), F.col("neighbor_id").asc()],
        k,
    )


def assign_cells(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "cell_id",
    centroids_unit: bool = False,
) -> DataFrame:
    """Nearest-centroid assignment (the IVF build step). Centroids are
    broadcast; ties break to the lowest cell id (deterministic).

    Top-1 is a ``max_by`` hash aggregation, not a ranking window: it
    partially aggregates map-side (each task ships one candidate per
    vector, not ncells rows), which is the shape that survives a
    100 TB corpus. Output carries the UNIT vector under ``vec_col``.

    ``centroids_unit=True`` marks centroids as ALREADY normalized
    (e.g. read back from a persisted index) and must skip
    re-normalization: dividing a unit vector by its recomputed norm
    perturbs the last ulp, and an appended batch would then tie-break
    assignments differently from the original build.
    """
    c = _unit(corpus, [F.col(id_col)], vec_col, "__v")
    if centroids_unit:
        cents = centroids.select(
            F.col(centroid_id_col), F.col(vec_col).alias("__cv")
        )
    else:
        cents = _unit(centroids, [F.col(centroid_id_col)], vec_col, "__cv")
    scored = c.crossJoin(F.broadcast(cents)).select(
        id_col,
        "__v",
        centroid_id_col,
        dot(F.col("__v"), F.col("__cv")).alias("__sim"),
    )
    payload = F.struct(F.col(centroid_id_col), F.col("__v"))
    order = F.struct(F.col("__sim"), (-F.col(centroid_id_col)).alias("__t"))
    best = scored.groupBy(id_col).agg(F.max_by(payload, order).alias("__b"))
    return best.select(
        id_col,
        F.col(f"__b.{centroid_id_col}").alias(centroid_id_col),
        F.col("__b.__v").alias(vec_col),
    )


def kmeans_centroids(
    corpus: DataFrame,
    k: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int | None = None,
) -> DataFrame:
    """Deterministic Lloyd's iterations for IVF centroid building:
    init = the k lowest-id vectors (reproducible, no RNG), then
    assign → per-cell elementwise mean, ``iters`` times. Since
    assign_cells emits unit vectors, the means are means of unit
    vectors — spherical k-means, the standard variant for cosine
    similarity.

    Everything stays JVM-side: the elementwise mean is
    posexplode → avg per (cell, position) → re-assemble with
    array_agg sorted by position. One shuffle per iteration (the
    assignment groupBy); lineage cut per iteration via localCheckpoint.
    Empty cells drop out (k can shrink) — harmless for IVF probing.

    ``sample_mod``: train on the deterministic ``id % sample_mod == 0``
    subsample — the corpus-scale deployment shape (opq.opq_train's
    knob, generalized here per the r7 verdict): centroids generalize
    from a sample, every Lloyd scan then touches 1/sample_mod of the
    rows, and the full corpus is only ever ASSIGNED once, at index
    write. Seeds stay the k lowest SAMPLED ids (deterministic).
    """
    if sample_mod is not None and sample_mod > 1:
        corpus = corpus.filter(F.col(id_col) % sample_mod == 0)
    cents = (
        corpus.orderBy(F.col(id_col).asc())
        .limit(k)
        .select(F.col(id_col).alias("cell_id"), as_double(F.col(vec_col)).alias(vec_col))
        .localCheckpoint()
    )
    for _ in range(iters):
        cells = assign_cells(corpus, cents, id_col, vec_col)
        pos = cells.select(
            "cell_id", F.posexplode(as_double(F.col(vec_col))).alias("__pos", "__x")
        )
        means = pos.groupBy("cell_id", "__pos").agg(F.avg("__x").alias("__m"))
        cents = (
            means.groupBy("cell_id")
            .agg(
                F.array_sort(F.collect_list(F.struct("__pos", "__m"))).alias("__pm")
            )
            .select(
                "cell_id",
                F.transform(F.col("__pm"), lambda s: s["__m"]).alias(vec_col),
            )
            .localCheckpoint()
        )
    return cents


def kmeans_centroids_report(
    corpus: DataFrame,
    k: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int | None = None,
) -> tuple[DataFrame, list[float], int, int]:
    """kmeans_centroids with the spherical-k-means objective trajectory
    — (centroids_df, [obj_0 .. obj_iters-1], n_vectors,
    init_cell_sum), where obj_i is the mean best-cosine of the
    assignment against the centroids entering iteration i (both Lloyd
    steps are ascent moves on this number — assignment maximizes each
    vector's term, and the normalized mean is the unit vector
    maximizing a cell's summed dot) and init_cell_sum is the exact
    BIGINT sum of assigned cell ids under the INITIAL seed (the k
    lowest-id vectors) — the deterministic anchor a SQL oracle
    replays.

    ONE job per iteration: best-assignment (max_by) → posexplode →
    per-(cell, position) means carrying per-cell counts and
    similarity sums in the same aggregation; the k·d centroid floats
    rebuild driver-side, so there are no executor-pinned checkpoint
    chains at all (unlike the original kmeans_centroids loop).

    ``sample_mod`` trains on the deterministic ``id % sample_mod == 0``
    subsample (kmeans_centroids' knob): the reported objective,
    n_vectors, and init_cell_sum all describe the SAMPLE — which is
    what a replaying oracle must filter to."""
    spark = corpus.sparkSession
    if sample_mod is not None and sample_mod > 1:
        corpus = corpus.filter(F.col(id_col) % sample_mod == 0)
    cents = (
        corpus.orderBy(F.col(id_col).asc())
        .limit(k)
        .select(F.col(id_col).alias("cell_id"), as_double(F.col(vec_col)).alias(vec_col))
    )
    objs: list[float] = []
    init_cell_sum = 0
    n_vectors = 0
    for i in range(iters):
        u = _unit(corpus, [F.col(id_col)], vec_col, "__v")
        cu = _unit(cents, [F.col("cell_id")], vec_col, "__cv")
        scored = u.crossJoin(F.broadcast(cu)).select(
            id_col, "__v", "cell_id", dot(F.col("__v"), F.col("__cv")).alias("__sim")
        )
        payload = F.struct(F.col("cell_id"), F.col("__v"))
        order = F.struct(F.col("__sim"), (-F.col("cell_id")).alias("__t"))
        best = scored.groupBy(id_col).agg(
            F.max_by(payload, order).alias("__b"),
            F.max("__sim").alias("__bs"),
        )
        ex = best.select(
            F.col("__b.cell_id").alias("cell_id"),
            F.col("__bs"),
            F.posexplode("__b.__v").alias("__pos", "__x"),
        )
        rows = (
            ex.groupBy("cell_id", "__pos")
            .agg(
                F.avg("__x").alias("__m"),
                F.count(F.lit(1)).alias("__c"),
                F.sum("__bs").alias("__ss"),
            )
            .collect()
        )
        counts = {r["cell_id"]: int(r["__c"]) for r in rows if r["__pos"] == 0}
        sim_sums = {r["cell_id"]: float(r["__ss"]) for r in rows if r["__pos"] == 0}
        n_vectors = sum(counts.values())
        objs.append(sum(sim_sums.values()) / n_vectors if n_vectors else 0.0)
        if i == 0:
            init_cell_sum = sum(c * n for c, n in counts.items())
        d = 1 + max(r["__pos"] for r in rows)
        means: dict = {}
        for r in rows:
            means.setdefault(r["cell_id"], [0.0] * d)[r["__pos"]] = float(r["__m"])
        from pyspark.sql.types import (
            ArrayType,
            DoubleType,
            StructField,
            StructType,
        )

        cents = spark.createDataFrame(
            [(c, v) for c, v in sorted(means.items())],
            StructType(
                [
                    StructField("cell_id", corpus.schema[id_col].dataType),
                    StructField(vec_col, ArrayType(DoubleType())),
                ]
            ),
        )
    return cents, objs, n_vectors, init_cell_sum


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 2,
    include_self: bool = False,
) -> DataFrame:
    """Approximate top-k: probe only the ``nprobe`` nearest cells per
    query. (query_id, neighbor_id, cos_sim, rank), deterministic.
    ``include_self`` mirrors ``cosine_topk`` so recall comparisons
    against the exact baseline see identical candidate rules."""
    cells = assign_cells(corpus, centroids, id_col, vec_col)  # unit vectors
    cents = _unit(centroids, [F.col("cell_id")], vec_col, "__cv")
    q = _unit(queries, [F.col(id_col).alias("query_id")], vec_col, "__qv")
    probe = top_k_per_group(
        q.crossJoin(F.broadcast(cents)).select(
            "query_id", "__qv", "cell_id", dot(F.col("__qv"), F.col("__cv")).alias("__sim")
        ),
        ["query_id"],
        [F.col("__sim").desc(), F.col("cell_id").asc()],
        nprobe,
    ).select("query_id", "__qv", "cell_id")
    cand = probe.join(cells.withColumnRenamed(id_col, "neighbor_id"), "cell_id")
    if not include_self:
        cand = cand.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = cand.select(
        "query_id", "neighbor_id", dot(F.col("__qv"), F.col(vec_col)).alias("cos_sim")
    ).filter(F.col("cos_sim").isNotNull())
    return top_k_per_group(
        scored, ["query_id"], [F.col("cos_sim").desc(), F.col("neighbor_id").asc()], k
    )


def write_ivf_index(
    corpus: DataFrame,
    centroids: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the corpus as an IVF index: unit vectors partitioned by
    nearest-centroid cell (`cell_id=<n>/` directories). At 100 TB the
    inverted list IS the partition — a probe reads only its cells'
    directories (Hive partition pruning), exactly like `query_range`
    prunes chunks. Centroids are stored alongside under `_centroids/`
    for self-contained reads."""
    cells = assign_cells(corpus, centroids, id_col, vec_col)
    (
        cells.repartition(F.col("cell_id"))
        .write.mode("error")
        .partitionBy("cell_id")
        .parquet(path)
    )
    cents = _unit(centroids, [F.col("cell_id")], vec_col, vec_col)
    cents.coalesce(1).write.mode("error").parquet(path + "/_centroids")


def append_ivf_index(
    spark,
    new_vecs: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Admit a new embedding batch into a persisted IVF index: assign
    each vector to its nearest STORED centroid and append into that
    cell's partition directory — the standing-index path, where a
    batch costs one broadcast assignment + one append, never a corpus
    rebuild. Stored centroids are already unit vectors and are used
    as-is (``centroids_unit=True``), so an appended batch lands in
    bit-identical cells to a from-scratch build with the same
    centroids; probes (``ivf_topk_indexed``) see old and new vectors
    uniformly through the same partition pruning. Cells drift from
    their centroids as the distribution shifts — rebuild centroids
    (``kmeans_centroids`` + ``write_ivf_index``) when probe recall
    degrades, exactly like any production IVF index."""
    cents = _rp(spark, path + "/_centroids")
    cells = assign_cells(
        new_vecs, cents, id_col, vec_col, centroids_unit=True
    )
    (
        cells.repartition(F.col("cell_id"))
        .write.mode("append")
        .partitionBy("cell_id")
        .parquet(path)
    )


def ivf_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 2,
    include_self: bool = False,
    max_driver_queries: int | None = None,
) -> DataFrame:
    """Top-k against a persisted IVF index: probe cells per query, read
    ONLY those `cell_id=` partitions (the filter on the partition
    column prunes directories before any IO), score by dot product on
    the stored unit vectors.

    The probe is materialized by COLLECTING it to the driver and
    re-creating a local DataFrame: it is consumed twice (the partition
    filter needs its cell ids on the driver anyway, and the index join
    consumes it again), it is bounded by queries × nprobe rows by
    construction, and driver-held rows survive executor loss — unlike
    ``persist`` (pins CacheManager storage for the app's lifetime;
    unpersisting here would race the returned lazy plan) or
    ``localCheckpoint`` (truncates lineage onto unreplicated executor
    blocks, so losing one executor would permanently fail the returned
    plan instead of recomputing).

    ``max_driver_queries`` (default: the module cap) enforces the
    bounded-batch contract — past it the collect RAISES instead of
    silently serializing a corpus-sized query side into the driver
    (corpus-×-corpus search belongs on cosine_near_dup_pairs /
    semantic_dedup, which bucket by cell instead of probing)."""
    cap = DEFAULT_MAX_DRIVER_QUERIES if max_driver_queries is None else max_driver_queries
    cents = _rp(spark, path + "/_centroids").select(
        "cell_id", F.col(vec_col).alias("__cv")
    )
    q = _unit(queries, [F.col(id_col).alias("query_id")], vec_col, "__qv")
    probe = top_k_per_group(
        q.crossJoin(F.broadcast(cents)).select(
            "query_id", "__qv", "cell_id", dot(F.col("__qv"), F.col("__cv")).alias("__sim")
        ),
        ["query_id"],
        [F.col("__sim").desc(), F.col("cell_id").asc()],
        nprobe,
    ).select("query_id", "__qv", "cell_id")
    # one collect materializes the probe plan (crossJoin + ranking
    # window) for BOTH consumers: the partition filter below needs the
    # cell ids driver-side regardless, and rebuilding the (queries ×
    # nprobe)-row probe as a local DataFrame gives the join a
    # lineage-free, executor-loss-proof input — see the docstring.
    # The bounded-batch cap rides this same collect (≤ cap × nprobe
    # probe rows) — no extra counting job.
    probe_rows = _collect_capped(probe, cap * nprobe, cap, "ivf_topk_indexed")
    probe_schema = probe.schema
    probed_cells = sorted({r["cell_id"] for r in probe_rows})
    probe = spark.createDataFrame(probe_rows, probe_schema)
    index = _rp(spark, path).filter(F.col("cell_id").isin(probed_cells))
    cand = probe.join(index.withColumnRenamed(id_col, "neighbor_id"), "cell_id")
    if not include_self:
        cand = cand.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = cand.select(
        "query_id", "neighbor_id", dot(F.col("__qv"), F.col(vec_col)).alias("cos_sim")
    ).filter(F.col("cos_sim").isNotNull())
    return top_k_per_group(
        scored, ["query_id"], [F.col("cos_sim").desc(), F.col("neighbor_id").asc()], k
    )


def ivfpq_topk_refined(
    spark,
    path: str,
    queries: DataFrame,
    corpus: DataFrame,
    codebook: list[list[list[float]]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 2,
    shortlist: int = 50,
) -> DataFrame:
    """IVF-PQ search with exact RE-RANKING — the production IVFADC
    composition (Jégou et al. 2011 §V: ADC generates candidates, a
    refinement stage rescores the shortlist from full vectors): the
    index's ADC pass returns a per-query ``shortlist`` (cheap — code
    rows only, probed partitions only), then ONLY those
    queries × shortlist candidates are joined back to the corpus for
    exact cosine, and the top ``k`` of the exact scores is returned.

    Scale shape: the expensive side (the corpus) is touched by a
    BROADCAST semi-join on the bounded shortlist ids — the full
    vectors of at most queries × shortlist rows ever move, however
    large the corpus. Recall approaches the IVF cell ceiling at the
    same nprobe as ``shortlist`` grows (embeddings fixture, m=16,
    k=64, nprobe=6, mean recall@10 at sf0.001/0.01/0.1: ADC ranking
    alone 0.51/0.49/0.33 → refined@50 0.90/0.89/0.50 → refined@100
    0.96/0.97/0.57, ceiling 1.0/1.0/0.6)."""
    sl = ivfpq_topk_indexed(
        spark,
        path,
        queries,
        codebook=codebook,
        id_col=id_col,
        vec_col=vec_col,
        k=shortlist,
        nprobe=nprobe,
    ).select("query_id", "neighbor_id")
    q = _unit(queries, [F.col(id_col).alias("query_id")], vec_col, "__qv")
    c = _unit(corpus, [F.col(id_col).alias("neighbor_id")], vec_col, "__cv")
    cand = c.join(F.broadcast(sl), "neighbor_id").join(
        F.broadcast(q), "query_id"
    )
    scored = cand.select(
        "query_id", "neighbor_id", dot(F.col("__qv"), F.col("__cv")).alias("cos_sim")
    ).filter(F.col("cos_sim").isNotNull())
    return top_k_per_group(
        scored, ["query_id"], [F.col("cos_sim").desc(), F.col("neighbor_id").asc()], k
    )


def hyperplanes(n_planes: int, dim: int, seed: int = 0x5EED) -> list[list[float]]:
    """Deterministic pseudo-random hyperplane normals in [-1, 1],
    rounded to 6 decimals so the SAME literals embed exactly in both
    the Spark plan and a SQL oracle (decimal → nearest-double parsing
    is identical in any IEEE-754 engine). Plain LCG — no RNG state,
    reproducible everywhere."""
    a, c, m = 6364136223846793005, 1442695040888963407, 1 << 64
    x = seed & (m - 1)
    planes: list[list[float]] = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            x = (a * x + c) % m
            row.append(round(2.0 * (x / m) - 1.0, 6))
        planes.append(row)
    return planes


def hyperplane_bucket(vec_col: str, planes: list[list[float]]) -> Column:
    """Random-hyperplane (SimHash-for-vectors) LSH bucket id: bit p is
    the sign of ``vec · plane_p``; bucket = the packed bit vector.
    Pure JVM expressions — one O(n_planes · d) fold per row, no
    shuffle. Vectors whose cosine is high agree on most signs, so they
    collide with probability (1 - θ/π)^n_planes.

    Built as ONE F.expr over the named unit-vector column: the planes
    embed as a single from_json literal and the per-plane sign fold is
    a nested higher-order expression, all parsed JVM-side in one py4j
    round trip. The previous per-plane Python construction (one F.lit
    per plane COMPONENT plus one zip_with/aggregate pair per plane)
    cost ~n_planes·d py4j round trips at plan-build time — measured
    3.9 s / 21.5k round trips building the 8-table recall gate's plan.
    Same math, same fold order, bit-identical buckets: json
    round-trips the 6-decimal plane values to identical doubles, the
    per-plane dot is the same zip_with/aggregate left fold, and a NULL
    unit vector still yields bucket 0 (every CASE arm takes ELSE)."""
    import json

    if not planes:
        return F.lit(0).cast("long")
    # public API taking arbitrary planes: a non-finite component would
    # serialize as invalid JSON and NULL every bucket (r9 advice)
    _require_finite(planes, "hyperplanes")
    pj = json.dumps(planes)
    powers = ",".join(f"{1 << p}L" for p in range(len(planes)))
    return F.expr(
        f"CAST(aggregate(zip_with(from_json('{pj}', 'array<array<double>>'), "
        f"array({powers}), (pl, pw) -> CASE WHEN aggregate(zip_with(`{vec_col}`, pl, "
        f"(x, y) -> x * y), 0D, (acc, x) -> acc + x) >= 0 THEN pw ELSE 0L END), "
        f"0L, (acc, x) -> acc + x) AS BIGINT)"
    )


def hyperplane_near_dup_pairs(
    corpus: DataFrame,
    n_planes: int = 10,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 0x5EED,
    dim: int | None = None,
) -> DataFrame:
    """(id_a, id_b, cos_sim) candidate near-duplicates via hyperplane
    LSH: exact cosine is computed only WITHIN a bucket. Complements
    ``cosine_near_dup_pairs`` (IVF cells): LSH needs no centroid build
    pass — the bucketing is a stateless per-row expression, so this is
    the one-shot variant (single shuffle, on the bucket id) while IVF
    amortizes better when an index is reused.

    Scale: the bucket join shuffles each side once on ``__bucket``;
    bucket sizes concentrate around |corpus| / 2^n_planes, so raise
    ``n_planes`` with corpus size to hold per-bucket pair cost flat
    (AQE skew-join splits any hot bucket).

    Pass ``dim`` (the embedding dimensionality) to keep plan building
    fully lazy; without it, ONE row is read eagerly (a small Spark job
    at plan-build time) to infer it. Every corpus row must carry that
    same dimensionality (mismatched rows mis-bucket — dot's
    NULL-on-mismatch contract then drops them from scored pairs)."""
    if dim is None:
        first = corpus.select(vec_col).first()
        if first is None or first[0] is None:
            raise ValueError(
                "hyperplane_near_dup_pairs: corpus is empty or its first "
                f"row's {vec_col!r} is NULL — cannot infer dimensionality; "
                "pass dim= explicitly"
            )
        dim = len(first[0])
    planes = hyperplanes(n_planes, dim, seed)
    cells = _unit(corpus, [F.col(id_col)], vec_col, "__v")
    cells = cells.withColumn("__bucket", hyperplane_bucket("__v", planes))
    a = cells.select("__bucket", F.col(id_col).alias("id_a"), F.col("__v").alias("__va"))
    b = cells.select("__bucket", F.col(id_col).alias("id_b"), F.col("__v").alias("__vb"))
    pairs = a.join(b, "__bucket").filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.select("id_a", "id_b", dot(F.col("__va"), F.col("__vb")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    planes_per_table: int = 3,
    tables: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 0x5EED,
) -> DataFrame:
    """Multi-table (OR-amplified) hyperplane-LSH top-k — the classical
    LSH ANN construction (Indyk & Motwani 1998; Charikar 2002 for the
    cosine family): ``tables`` independent hash tables of
    ``planes_per_table`` hyperplanes each; a corpus vector is a
    candidate for a query iff they share a bucket in ANY table; the
    candidates are exactly re-ranked by cosine. AND within a table
    sharpens precision (collision prob s^b for sign-agreement rate
    s), OR across tables recovers recall (1 - (1 - s^b)^L) — the
    single-table q_ann_lsh path has no recall knob at all.

    Scale shape: both sides replicate L-fold via one generator, and
    ONE shuffle on (table, bucket) produces all candidates; the
    re-rank joins vectors back by id. A production deployment keeps
    the L bucket assignments as a persisted index (the write_*_index
    pattern) instead of recomputing them per batch — the per-query
    cost model is identical.

    Returns (query_id, neighbor_id, cos_sim, rank), rank 1..k per
    query, ties to the lower neighbor id.
    """
    b, L = planes_per_table, tables
    planes = hyperplanes(b * L, dim, seed)
    cq = _lsh_tabled(
        queries, "query_id", planes, b, L, id_col, vec_col
    ).withColumnRenamed("__v", "__qv")
    cc = _lsh_tabled(corpus, "neighbor_id", planes, b, L, id_col, vec_col)
    cand = (
        cq.join(cc, ["table", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            dot(F.col("__qv"), F.col("__v")).alias("__cos"),
        )
        # the same pair surfaces from every table it collides in; the
        # cosine is identical each time, so max() is a deterministic
        # dedup that needs no second pass over the vectors
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("__cos").alias("cos_sim"))
    )
    return top_k_per_group(
        cand,
        ["query_id"],
        [F.col("cos_sim").desc(), F.col("neighbor_id").asc()],
        k,
    ).select("query_id", "neighbor_id", "cos_sim", "rank")


def _lsh_tabled(
    df: DataFrame,
    out_id: str,
    planes: list[list[float]],
    b: int,
    L: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, unit vec, table, bucket) — each input row replicated once
    per table through ONE generator; shared by the live top-k, the
    index writer, and the index appender so all three bucket
    bit-identically."""
    u = _unit(df, [F.col(id_col).alias(out_id)], vec_col, "__v")
    per_table = F.array(
        *[
            F.struct(
                F.lit(t).alias("t"),
                hyperplane_bucket("__v", planes[t * b : (t + 1) * b]).alias(
                    "bk"
                ),
            )
            for t in range(L)
        ]
    )
    return u.select(out_id, "__v", F.explode(per_table).alias("__tb")).select(
        out_id,
        "__v",
        F.col("__tb.t").alias("table"),
        F.col("__tb.bk").alias("bucket"),
    )


def write_lsh_index(
    corpus: DataFrame,
    path: str,
    planes_per_table: int = 3,
    tables: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 0x5EED,
) -> None:
    """Persist the multi-table LSH bucket assignments: unit vectors
    partitioned by `table=<t>/bucket=<b>/` directories — a probe reads
    ONLY the (table, bucket) pairs its queries hash to, exactly like
    the IVF index prunes `cell_id=` cells. The hash family is
    recorded in a `_params` sidecar as (planes_per_table, tables,
    dim, seed): `hyperplanes` is a deterministic function of those,
    so appends re-derive the IDENTICAL planes instead of shipping
    plane literals."""
    b, L = planes_per_table, tables
    planes = hyperplanes(b * L, dim, seed)
    rows = _lsh_tabled(corpus, id_col, planes, b, L, id_col, vec_col)
    (
        rows.withColumnRenamed("__v", vec_col)
        .repartition(F.col("table"), F.col("bucket"))
        .write.mode("error")
        .partitionBy("table", "bucket")
        .parquet(path)
    )
    params = rows.sparkSession.createDataFrame(
        [(b, L, dim, seed)],
        "planes_per_table int, tables int, dim int, seed long",
    )
    params.coalesce(1).write.mode("error").parquet(path + "/_params")


def _lsh_params(spark, path: str) -> tuple[int, int, int, int]:
    p = _rp(spark, path + "/_params").collect()[0]
    return (
        int(p["planes_per_table"]),
        int(p["tables"]),
        int(p["dim"]),
        int(p["seed"]),
    )


def append_lsh_index(
    spark,
    new_vecs: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Admit a new embedding batch into a persisted LSH index: bucket
    it under the STORED hash family (re-derived from the `_params`
    sidecar — bit-identical planes) and append into the matching
    (table, bucket) partitions. A batch costs its own L bucketings
    plus one append; the corpus is never re-hashed. Unlike IVF cells,
    LSH buckets never drift — the hash family is data-independent —
    so there is no rebuild-on-recall-degradation caveat here."""
    b, L, dim, seed = _lsh_params(spark, path)
    planes = hyperplanes(b * L, dim, seed)
    rows = _lsh_tabled(new_vecs, id_col, planes, b, L, id_col, vec_col)
    (
        rows.withColumnRenamed("__v", vec_col)
        .repartition(F.col("table"), F.col("bucket"))
        .write.mode("append")
        .partitionBy("table", "bucket")
        .parquet(path)
    )


def lsh_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    include_self: bool = False,
    max_driver_queries: int | None = None,
) -> DataFrame:
    """Top-k against a persisted multi-table LSH index: hash each
    query under the stored family, read ONLY the hashed
    `table=/bucket=` partitions (pruned before any IO), dedup
    candidates across tables, exact-rank by cosine. Produces the same
    result as the live ``lsh_topk`` at the same parameters.
    ``max_driver_queries`` enforces the bounded-batch contract on the
    probe collect (see ivf_topk_indexed).

    The query-side bucket relation is bounded by |queries| × tables
    rows, so — like ``ivf_topk_indexed``'s probe — it is COLLECTED
    once and rebuilt as a lineage-free local DataFrame serving both
    the driver-side partition filter and the candidate join. The
    partition predicate groups probed buckets per table — ``tables``
    branches of ``(table = t AND bucket IN (...))`` — so the Catalyst
    expression tree is bounded by the index's table count (a small
    index constant), not |queries| × tables, and each branch is a
    partition-prunable In on the partition columns."""
    cap = DEFAULT_MAX_DRIVER_QUERIES if max_driver_queries is None else max_driver_queries
    b, L, dim, seed = _lsh_params(spark, path)
    planes = hyperplanes(b * L, dim, seed)
    qrows_df = _lsh_tabled(
        queries, "query_id", planes, b, L, id_col, vec_col
    ).withColumnRenamed("__v", "__qv")
    # zero-norm queries have a NULL unit vector / bucket: they can match
    # nothing, so drop them before building the partition predicate.
    # The bounded-batch cap rides the collect itself (≤ cap × tables
    # banding rows) — no extra counting job.
    q_rows = [
        r
        for r in _collect_capped(qrows_df, cap * L, cap, "lsh_topk_indexed")
        if r["bucket"] is not None
    ]
    q_schema = qrows_df.schema
    probed = sorted({(r["table"], r["bucket"]) for r in q_rows})
    if not probed:
        # empty query set (or all-zero-norm queries, whose bucket rows
        # are dropped): the answer is structurally empty — return it
        # with the contract schema (id types taken from the actual
        # query/index relations) instead of crashing the reduce
        from pyspark.sql.types import StructField, StructType, DoubleType, IntegerType

        nbr_type = _rp(spark, path).schema[id_col].dataType
        return spark.createDataFrame(
            [],
            StructType(
                [
                    StructField("query_id", q_schema["query_id"].dataType),
                    StructField("neighbor_id", nbr_type),
                    StructField("cos_sim", DoubleType()),
                    StructField("rank", IntegerType()),
                ]
            ),
        )
    probe = spark.createDataFrame(q_rows, q_schema)
    by_table: dict = {}
    for t, bk in probed:
        by_table.setdefault(t, []).append(bk)
    pred = None
    for t, bks in sorted(by_table.items()):
        branch = (F.col("table") == t) & F.col("bucket").isin(bks)
        pred = branch if pred is None else (pred | branch)
    index = _rp(spark, path).filter(pred)
    cand = probe.join(
        index.withColumnRenamed(id_col, "neighbor_id"), ["table", "bucket"]
    )
    if not include_self:
        cand = cand.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = (
        cand.select(
            "query_id",
            "neighbor_id",
            dot(F.col("__qv"), F.col(vec_col)).alias("__cos"),
        )
        .filter(F.col("__cos").isNotNull())
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("__cos").alias("cos_sim"))
    )
    return top_k_per_group(
        scored,
        ["query_id"],
        [F.col("cos_sim").desc(), F.col("neighbor_id").asc()],
        k,
    ).select("query_id", "neighbor_id", "cos_sim", "rank")


def hard_negative_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 10,
) -> DataFrame:
    """Hard-negative mining for contrastive/embedding training: for
    each query, the top-k most-similar corpus vectors with a
    DIFFERENT label — the highest-loss negatives a trainer wants in
    the batch (Robinson et al. 2021; the standard dense-retrieval
    negative-mining shape). Exactly cosine_topk's broadcast plan with
    the label-mismatch predicate applied BEFORE ranking, so the
    window never buys same-label rows a slot. Returns
    (query_id, query_label, neighbor_id, neighbor_label, cos_sim,
    rank); null-label rows never qualify as negatives (a null
    comparison is not a definite mismatch)."""
    q = _unit(
        queries,
        [
            F.col(id_col).alias("query_id"),
            F.col(label_col).alias("query_label"),
        ],
        vec_col,
        "__qv",
    )
    c = _unit(
        corpus,
        [
            F.col(id_col).alias("neighbor_id"),
            F.col(label_col).alias("neighbor_label"),
        ],
        vec_col,
        "__cv",
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(
            F.col("neighbor_label").isNotNull()
            & (F.col("neighbor_label") != F.col("query_label"))
        )
        .select(
            "query_id",
            "query_label",
            "neighbor_id",
            "neighbor_label",
            dot(F.col("__qv"), F.col("__cv")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim").isNotNull())
    )
    return top_k_per_group(
        scored,
        ["query_id"],
        [F.col("cos_sim").desc(), F.col("neighbor_id").asc()],
        k,
    )


def cosine_near_dup_pairs(
    corpus: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, cos_sim) with cos_sim >= threshold, id_a < id_b.
    Pairs are only compared within an IVF cell — linear-ish cost; an
    exact variant would cross-join cells' neighbors too."""
    cells = assign_cells(corpus, centroids, id_col, vec_col)  # unit vectors
    # The self-join consumes the assignment twice (two scan+assign
    # pipelines). Measured at sf0.1 this is NOT the bottleneck
    # (materializing via localCheckpoint changed nothing); at a real
    # corpus scale the persisted-index path (write_ivf_index +
    # ivf_topk_indexed) is the one that reads the assignment for free.
    a = cells.select(F.col("cell_id"), F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = cells.select(F.col("cell_id"), F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    pairs = a.join(b, "cell_id").filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.select("id_a", "id_b", dot(F.col("__va"), F.col("__vb")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def semantic_dedup(
    corpus: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication", arXiv:2303.09540): cluster embeddings with a
    coarse quantizer, compare pairs only WITHIN a cluster, and keep
    one representative per near-duplicate neighborhood.

    Keep rule (deterministic, oracle-replayable): a document is
    dropped iff some LOWER-id member of its cell is >= ``threshold``
    cosine-similar — i.e. the lowest id in every neighborhood always
    survives. On a similarity chain a–b–c where sim(a,b) and sim(b,c)
    clear the threshold but sim(a,c) does not, both b and c are
    dropped (c's witness b is itself dropped) — the standard greedy
    transcription of SemDeDup's keep-one-per-epsilon-ball; exact
    clique-cover is NP-hard and no pipeline runs it.

    Returns (id, cell_id, kept) for EVERY corpus row. Scale shape:
    pair generation never leaves a cell (the SemDeDup design point —
    cells are capped by the clusterer, so per-cell pair cost is
    bounded however large the corpus), the drop set is an id-keyed
    aggregation, and the final flag join is id-keyed — no global
    quadratic term anywhere.
    """
    cells = assign_cells(corpus, centroids, id_col, vec_col)
    a = cells.select(
        "cell_id", F.col(id_col).alias("__ida"), F.col(vec_col).alias("__va")
    )
    b = cells.select(
        "cell_id", F.col(id_col).alias("__idb"), F.col(vec_col).alias("__vb")
    )
    drops = (
        a.join(b, "cell_id")
        .filter(F.col("__ida") < F.col("__idb"))
        .filter(dot(F.col("__va"), F.col("__vb")) >= threshold)
        .select(F.col("__idb").alias("__drop_id"))
        .distinct()
    )
    return (
        cells.select(id_col, "cell_id")
        .join(drops, F.col(id_col) == F.col("__drop_id"), "left")
        .select(
            id_col,
            "cell_id",
            F.col("__drop_id").isNull().alias("kept"),
        )
    )


# ------------------------------------------------------------------ PQ
def pq_codebook_from_sample(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    sample_mod: int = 31,
) -> list[list[list[float]]]:
    """Deterministic product-quantization codebook: the ``k`` lowest-id
    unit vectors with ``id % sample_mod == 0``, sliced into ``m``
    equal blocks — ``cb[b][j]`` is block b of sample j. Real PQ trains
    per-block k-means (Jégou, Douze, Schmid, "Product Quantization for
    Nearest Neighbor Search", TPAMI 2011); the sample codebook is the
    deterministic, oracle-replayable trainer — pq_encode/pq_adc_topk
    accept ANY codebook of the same shape, so a k-means-trained one
    drops in for recall. Driver collect bounded by k rows."""
    rows = (
        _unit(
            corpus.filter(F.col(id_col) % sample_mod == 0),
            [F.col(id_col)],
            vec_col,
            "__v",
        )
        # zero-norm vectors unit-normalize to NULL (the documented
        # failed-encode case) — they cannot seed a codeword
        .filter(F.col("__v").isNotNull())
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"only {len(rows)} usable sample vectors for k={k}")
    d = len(rows[0]["__v"])
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    bs = d // m
    return [
        [list(r["__v"][b * bs : (b + 1) * bs]) for r in rows]
        for b in range(m)
    ]


def _require_finite(values, what: str) -> None:
    """Reject NaN/Infinity in values destined for a from_json literal
    (r9 advice, medium): json.dumps serializes non-finite floats as
    bare ``NaN``/``Infinity`` — invalid JSON — so from_json would
    yield NULL and every downstream bucket/code/score would silently
    become NULL (empty candidate joins instead of an error). Walks
    nested lists; cost is bounded by the literal's size, which is
    bounded by construction (planes, codebooks, LUTs)."""
    import math

    stack = [values]
    while stack:
        v = stack.pop()
        if isinstance(v, (list, tuple)):
            stack.extend(v)
        elif isinstance(v, float) and not math.isfinite(v):
            raise ValueError(f"non-finite value {v!r} in {what}")


def _pq_lit(codebook: list[list[list[float]]]) -> tuple:
    """(flat literal array<array<double>>, m, k, block_size). The flat
    layout is cb[b][j] at index b*k + j; a from_json literal constant-
    folds to one ArrayData (F.lit on a nested list would build a
    CreateArray re-materialized per evaluation)."""
    import json

    _require_finite(codebook, "PQ codebook")
    m, k, bs = len(codebook), len(codebook[0]), len(codebook[0][0])
    flat = [cw for block in codebook for cw in block]
    return (
        F.from_json(F.lit(json.dumps(flat)), "array<array<double>>"),
        m,
        k,
        bs,
    )


def _bound(expr: Column, fn) -> Column:
    """Array-typed analog of vectors.with_bound_scalar: evaluate
    ``expr`` once per row and hand it to ``fn`` as a lambda variable
    (the one binding CollapseProject can never inline)."""
    return F.get(F.transform(F.array(expr), fn), 0)


def _cb_json_sql(codebook: list[list[list[float]]]) -> str:
    """SQL fragment for the flat codebook literal (cb[b][j] at index
    b*k + j) — from_json constant-folds to one ArrayData."""
    import json

    _require_finite(codebook, "PQ codebook")
    flat = [cw for block in codebook for cw in block]
    return f"from_json('{json.dumps(flat)}', 'array<array<double>>')"


def _pq_codes_expr(codebook: list[list[list[float]]]) -> Column:
    """codes array<int> over a materialized unit-vector attribute
    ``__v`` — per block, the index of the L2-nearest codeword (ties to
    the lowest code — deterministic).

    ONE F.expr (single py4j round trip): the previous per-block Python
    construction cost ~250 ms at m=4·k=8 and ~1.8 s at m=32·k=64 per
    call — per Lloyd iteration in the trainer, per encode in the index
    writers. Same operators and fold orders (squared_l2's cast-then-
    fold, array_position tie-to-lowest), so codes are bit-identical;
    the block index just moves from a Python loop into a sequence()
    lambda variable."""
    m, k, bs = len(codebook), len(codebook[0]), len(codebook[0][0])
    cb = _cb_json_sql(codebook)
    d2 = (
        "aggregate(zip_with(transform(bb, xx -> CAST(xx AS DOUBLE)), "
        f"transform(element_at({cb}, CAST(b * {k} + j + 1 AS INT)), "
        "xx -> CAST(xx AS DOUBLE)), (x, y) -> (x - y) * (x - y)), "
        "0D, (acc, x) -> acc + x)"
    )
    dists = f"transform(sequence(0, {k - 1}), j -> {d2})"
    code = (
        f"get(transform(array(slice(`__v`, b * {bs} + 1, {bs})), bb -> "
        f"get(transform(array({dists}), dd -> "
        "CAST(array_position(dd, array_min(dd)) AS INT) - 1), 0)), 0)"
    )
    return F.expr(f"transform(sequence(0, {m - 1}), b -> {code})")


def pq_encode(
    corpus: DataFrame,
    codebook: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — each unit vector compressed to m
    codes. m bytes-worth of codes replace d floats: at 100 TB this is
    the representation that makes billion-vector ANN fit in memory
    (16× under int8, 32× under float32 at m=8, d=64). One
    exchange-free scan; the codebook rides along as a constant-folded
    literal."""
    cb_lit, m, k, bs = _pq_lit(codebook)
    u = _unit(corpus, [F.col(id_col)], vec_col, "__v")
    return u.select(
        id_col, _pq_codes_expr(codebook).alias("codes")
    )


def _pydot(a, b) -> float:
    """Left-to-right IEEE fold — the same accumulation order as the
    engines' sequential array folds, so driver-computed dots are
    bit-identical to engine-computed ones."""
    s = 0.0
    for x, y in zip(a, b):
        s += x * y
    return s


def _adc_tables(q_rows, codebook, query_id_col: str):
    """(flat LUT list, [(qi, query_id, unit_vector)]) for ADC scoring:
    per usable query (zero-norm ones drop — no direction), the m×k
    block-dot table laid out at index (qi*m + b)*k + j. ONE definition
    shared by pq_adc_topk and ivfpq_topk_indexed so the LUT layout and
    the score expression below can never diverge."""
    m, k = len(codebook), len(codebook[0])
    bs = len(codebook[0][0])
    lut: list[float] = []
    meta = []
    qi = 0
    for r in q_rows:
        qv = r["__qv"]
        if qv is None:
            continue
        meta.append((qi, r[query_id_col], qv))
        for b in range(m):
            blk = qv[b * bs : (b + 1) * bs]
            for j in range(k):
                lut.append(_pydot(blk, codebook[b][j]))
        qi += 1
    return lut, meta


def scaled_nprobe(ncells: int, coverage: float = 0.5, floor: int = 6) -> int:
    """Probe budget that tracks corpus growth: max(floor,
    ceil(ncells * coverage)).

    A FIXED nprobe makes IVF recall decay as the corpus (and with it
    ncells) grows — measured on the embeddings fixture: nprobe=6 holds
    recall@10 = 1.0 while it covers all 5 cells (sf0.001/0.01) but
    drops to 0.6 when the sf0.1 corpus quantizes into 20 cells (30%
    coverage). Pinning the probed FRACTION keeps the recall/compute
    ratio stable across scale: at coverage=0.5 the same fixture
    measures 0.80 at sf0.1 (nprobe=10). Cost scales with corpus size
    by design — that is the knob's meaning: constant recall, linear
    cost; fixed nprobe is constant cost, decaying recall. Values above
    ncells simply probe every cell (exact search within IVF)."""
    import math

    return max(floor, math.ceil(ncells * coverage))


#: Driver-side ADC paths collect the query relation to build the
#: lookup table as a plan-folded literal. That is the right design for
#: serving-shaped batches, but nothing used to enforce the bound — a
#: corpus-sized query side silently became a driver bottleneck. Paths
#: that collect now count first (reading at most cap+1 rows) and RAISE
#: past this cap; ``distributed=True`` switches to the LUT-join path
#: where the table is computed JVM-side and joined, never collected.
DEFAULT_MAX_DRIVER_QUERIES = 1024


def _collect_capped(df: DataFrame, cap_rows: int, cap_queries: int, fn_name: str):
    """Collect a driver-side probe relation under the bounded-batch
    contract: the collect itself is limit(cap_rows + 1), so at most
    cap_rows + 1 rows ever reach the driver AND no extra counting job
    runs — the cap rides the collect every probe already pays. Raises
    past the cap with guidance instead of silently serializing a
    corpus-sized query side."""
    rows = df.limit(cap_rows + 1).collect()
    if len(rows) > cap_rows:
        raise ValueError(
            f"{fn_name}: query batch exceeds max_driver_queries="
            f"{cap_queries}; this probe collects the query set on the "
            f"driver. Use the distributed path where one exists "
            f"(distributed=True on the ADC probes), a cell-bucketed "
            f"operator (cosine_near_dup_pairs / semantic_dedup) for "
            f"corpus-x-corpus search, or raise max_driver_queries if "
            f"the batch is genuinely bounded."
        )
    return rows


def _adc_lut_expr(qv_name: str, codebook: list[list[list[float]]]) -> Column:
    """Per-ROW flat ADC lookup table (m·k doubles; entry b*k+j =
    ⟨query block b, codeword[b][j]⟩) computed JVM-side — the
    distributed analog of _adc_tables. Same block layout and the same
    left-fold accumulation order as the driver's _pydot, so entries
    are bit-identical to the driver-built table. ONE F.expr — the
    per-entry Python construction paid ~m·k py4j round trips."""
    m, k, bs = len(codebook), len(codebook[0]), len(codebook[0][0])
    cb = _cb_json_sql(codebook)
    return F.expr(
        f"transform(sequence(0, {m * k - 1}), e -> "
        f"aggregate(zip_with(slice(`{qv_name}`, CAST(FLOOR(e / {k}) AS INT) * {bs} + 1, {bs}), "
        f"element_at({cb}, CAST(e + 1 AS INT)), (x, y) -> x * y), "
        "0D, (acc, x) -> acc + x))"
    )


def _adc_score_from_col(lut_name: str, m: int, k: int) -> Column:
    """Σ_b LUT[b*k + codes[b]] over a PER-ROW ``__lut`` array column —
    the joined-relation counterpart of _adc_score_expr (which indexes a
    plan-folded all-queries literal by __qi). Identical accumulation
    order, so the two paths score bit-identically."""
    return F.expr(
        f"aggregate(sequence(0, {m - 1}), 0D, (acc, b) -> acc + "
        f"element_at(`{lut_name}`, CAST(b * {k} + "
        "element_at(codes, CAST(b + 1 AS INT)) + 1 AS INT)))"
    )


def _adc_score_expr(lut: list, m: int, k: int) -> Column:
    """Σ_b LUT[(__qi*m + b)*k + codes[b]] — the ADC score over a
    `__qi` (query index) column and a `codes` array column, terms
    accumulating in block order. The all-queries LUT embeds as one
    from_json literal inside a single F.expr."""
    import json

    _require_finite(lut, "ADC lookup table")
    lut_sql = f"from_json('{json.dumps(lut)}', 'array<double>')"
    return F.expr(
        f"aggregate(sequence(0, {m - 1}), 0D, (acc, b) -> acc + "
        f"element_at({lut_sql}, CAST((CAST(`__qi` AS BIGINT) * {m} + b) * {k} + "
        "element_at(codes, CAST(b + 1 AS INT)) + 1 AS INT)))"
    )


def pq_adc_topk(
    codes_df: DataFrame,
    queries: DataFrame,
    codebook: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 5,
    max_driver_queries: int = DEFAULT_MAX_DRIVER_QUERIES,
    distributed: bool = False,
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: (query_id, neighbor_id,
    approx_sim, rank) where approx_sim = Σ_b ⟨query block b,
    codeword[b][code_b]⟩ — the uncompressed query against compressed
    corpus (ADC, the accurate PQ search mode).

    The paper's lookup-table trick, not per-pair dot products: each
    query's m×k block-dot table is precomputed ONCE driver-side
    (queries are small by the same contract that lets cosine_topk
    broadcast them; the table is |queries|·m·k doubles) and rides
    along as a constant-folded literal — scoring a candidate is m
    array lookups + adds instead of m block dots (measured 196 s →
    ~8 s for 10 queries × 4M codes). Block terms accumulate in index
    order and the driver's Python dot folds left-to-right — the same
    IEEE sequence as the engines, so scores stay bit-identical. The
    corpus side never ships vectors, only m-code rows; the final
    per-query top-k is the WindowGroupLimit ranking window.

    The bounded-probe contract is ENFORCED: past ``max_driver_queries``
    the collect raises instead of silently serializing the batch into
    the driver. ``distributed=True`` is the large-batch path — the LUT
    is computed JVM-side per query row (bit-identical entries, see
    _adc_lut_expr) and broadcast-JOINED to the code rows instead of
    plan-folded, moving the bound from driver memory to an executor
    broadcast relation."""
    import json

    m, kk = len(codebook), len(codebook[0])
    spark = codes_df.sparkSession
    if distributed:
        bs = len(codebook[0][0])
        q = _unit(
            queries, [F.col(id_col).alias(query_id_col)], vec_col, "__qv"
        ).filter(F.col("__qv").isNotNull())
        qlut = q.select(
            query_id_col, _adc_lut_expr("__qv", codebook).alias("__lut")
        )
        joined = (
            codes_df.select(F.col(id_col).alias("neighbor_id"), "codes")
            .crossJoin(F.broadcast(qlut))
            .filter(F.col("neighbor_id") != F.col(query_id_col))
        )
        scored = joined.select(
            query_id_col,
            "neighbor_id",
            _adc_score_from_col("__lut", m, kk).alias("approx_sim"),
        ).filter(F.col("approx_sim").isNotNull())
        return top_k_per_group(
            scored,
            [query_id_col],
            [F.col("approx_sim").desc(), F.col("neighbor_id").asc()],
            k,
        )
    # the bounded-batch cap rides the collect itself — no counting job
    q_rows = _collect_capped(
        _unit(queries, [F.col(id_col).alias(query_id_col)], vec_col, "__qv"),
        max_driver_queries,
        max_driver_queries,
        "pq_adc_topk",
    )
    lut, q_meta = _adc_tables(q_rows, codebook, query_id_col)
    # query id type from the INPUT schema (string/int ids work like
    # connected_components), never a hardcoded 'long'
    from pyspark.sql.types import IntegerType, StructField, StructType

    qdf = spark.createDataFrame(
        [(qi, qid) for qi, qid, _ in q_meta],
        StructType(
            [
                StructField("__qi", IntegerType(), False),
                StructField(query_id_col, queries.schema[id_col].dataType),
            ]
        ),
    )
    joined = (
        codes_df.select(F.col(id_col).alias("neighbor_id"), "codes")
        .crossJoin(F.broadcast(qdf))
        .filter(F.col("neighbor_id") != F.col(query_id_col))
    )
    score = _adc_score_expr(lut, m, kk)
    scored = joined.select(
        query_id_col, "neighbor_id", score.alias("approx_sim")
    ).filter(F.col("approx_sim").isNotNull())
    return top_k_per_group(
        scored,
        [query_id_col],
        [F.col("approx_sim").desc(), F.col("neighbor_id").asc()],
        k,
    )


def residuals(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell_id, residual) — each unit vector's residual against
    its nearest unit centroid, the relation IVFADC quantizes. Feed to
    ``pq_train_kmeans(..., normalize=False)`` to train a residual
    codebook (residuals are NOT unit vectors — re-normalizing them
    would distort exactly the magnitude structure PQ must learn)."""
    cells = assign_cells(corpus, centroids, id_col, vec_col)
    cents = _unit(centroids, [F.col("cell_id")], vec_col, "__cv")
    return cells.join(F.broadcast(cents), "cell_id").select(
        F.col(id_col),
        F.col("cell_id"),
        F.zip_with(F.col(vec_col), F.col("__cv"), lambda a, b: a - b).alias(
            vec_col
        ),
    )


def _vec_input(
    df: DataFrame, id_exprs: list, vec_col: str, normalize: bool
) -> DataFrame:
    """Unit-normalized (the default contract) or raw-double vectors as
    ``__v`` — residual relations pass normalize=False."""
    if normalize:
        return _unit(df, id_exprs, vec_col, "__v")
    t = df.select(*id_exprs, as_double(F.col(vec_col)).alias("__v"))
    return t.filter(F.col("__v").isNotNull())


def pq_train_kmeans(
    corpus: DataFrame,
    codebook: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 5,
    normalize: bool = True,
    sample_mod: int | None = None,
) -> list[list[list[float]]]:
    """Lloyd-iteration PQ training (the real trainer of Jégou et al.):
    starting from any codebook (e.g. pq_codebook_from_sample), each
    iteration re-encodes the corpus and replaces every codeword with
    the mean of its assigned block slices. Fully distributed: one
    encode scan + ONE groupBy per iteration whose cardinality is
    m × k (map-side combined — the shuffle carries codeword partials,
    never vectors); the m·k·(d/m) floats collect to the driver each
    round. Codes with no members keep their previous codeword.
    ``normalize=False`` trains on the arrays as-is (pass the
    ``residuals`` relation here for IVFADC codebooks). ``sample_mod``
    trains on the deterministic ``id % sample_mod == 0`` subsample
    (the corpus-scale shape — see kmeans_centroids); the full corpus
    is still encoded once, at index write."""
    if sample_mod is not None and sample_mod > 1:
        corpus = corpus.filter(F.col(id_col) % sample_mod == 0)
    for _ in range(iters):
        codebook, _mse, _n, _cs = _pq_train_iter(
            corpus, codebook, id_col, vec_col, normalize
        )
    return codebook


def _pq_train_iter(
    corpus: DataFrame,
    codebook: list[list[list[float]]],
    id_col: str,
    vec_col: str,
    normalize: bool,
) -> tuple[list[list[list[float]]], float, int, int]:
    """One Lloyd iteration as ONE Spark job: encode + per-(b, code)
    block means, with the quantization error of the INPUT codebook
    (under its own argmin assignment — exactly pq_quantization_error's
    definition) folded into the same aggregation as a byproduct.
    Returns (new_codebook, input_mse, n_vectors, code_sum) where
    code_sum = Σ over (vector, block) of the assigned code under the
    INPUT codebook — an integer a SQL oracle can replay exactly, which
    is how the trainer gate pins the encode itself cross-engine. The
    byproduct design keeps the trainer gate at iters+1 jobs instead of
    2·iters+2 (measured 29.8 s → 9.6 s at sf0.1 — each extra job pays
    whole-stage codegen for the m·k-codeword encode expression,
    dwarfing the data at gate scale)."""
    from matdb_spark.functions.vectors import squared_l2

    cb_lit, m, k, bs = _pq_lit(codebook)
    u = _vec_input(corpus, [F.col(id_col)], vec_col, normalize)
    # codes + slices from ONE scan (no self-join of derived plans)
    both = u.select(_pq_codes_expr(codebook).alias("codes"), "__v")
    exploded = both.select(
        F.posexplode("codes").alias("b", "code"), F.col("__v")
    ).select(
        "b",
        "code",
        F.slice("__v", (F.col("b") * bs + 1).cast("int"), bs).alias("blk"),
    )
    blkerr = squared_l2(
        F.col("blk"),
        F.element_at(
            cb_lit, (F.col("b") * k + F.col("code") + 1).cast("int")
        ),
    )
    agg = exploded.groupBy("b", "code").agg(
        *[F.avg(F.element_at("blk", i + 1)).alias(f"c{i}") for i in range(bs)],
        F.sum(blkerr).alias("__errsum"),
        F.count(F.lit(1)).alias("__cnt"),
    )
    new = [[list(cw) for cw in block] for block in codebook]
    err_total = 0.0
    n_blocks = 0
    code_sum = 0
    for r in agg.collect():
        new[r["b"]][r["code"]] = [float(r[f"c{i}"]) for i in range(bs)]
        err_total += float(r["__errsum"] or 0.0)
        n_blocks += int(r["__cnt"])
        code_sum += int(r["code"]) * int(r["__cnt"])
    n_vectors = n_blocks // m
    mse = err_total / n_vectors if n_vectors else 0.0
    return new, mse, n_vectors, code_sum


def pq_train_kmeans_report(
    corpus: DataFrame,
    codebook: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 3,
    normalize: bool = True,
    sample_mod: int | None = None,
) -> tuple[list[list[list[float]]], list[float], int, int]:
    """pq_train_kmeans plus the error trajectory: returns
    (trained_codebook, [mse_0 .. mse_iters], n_vectors,
    init_code_sum) where mse_i is the mean quantization error of the
    codebook after i iterations (mse_0 = the input codebook's) and
    init_code_sum is iteration 1's exact encode checksum (the value a
    SQL oracle replays). iters+1 jobs total — each iteration reports
    its input's error for free and one final pq_quantization_error
    scan prices the trained codebook. ``sample_mod`` trains (and
    reports — n_vectors/init_code_sum/errors describe the sample) on
    the deterministic ``id % sample_mod == 0`` subsample."""
    if sample_mod is not None and sample_mod > 1:
        corpus = corpus.filter(F.col(id_col) % sample_mod == 0)
    errors: list[float] = []
    n_vectors = 0
    init_code_sum = 0
    for i in range(iters):
        codebook, mse, n_vectors, code_sum = _pq_train_iter(
            corpus, codebook, id_col, vec_col, normalize
        )
        errors.append(mse)
        if i == 0:
            init_code_sum = code_sum
    errors.append(
        pq_quantization_error(corpus, codebook, id_col, vec_col, normalize)
    )
    return codebook, errors, n_vectors, init_code_sum


def pq_quantization_error(
    corpus: DataFrame,
    codebook: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = True,
) -> float:
    """Mean squared quantization error of the codebook over the corpus
    — Σ_b ‖block_b − codeword[b][code_b]‖² averaged over vectors, the
    objective Lloyd iterations monotonically non-increase. One
    exchange-free encode scan + a single global aggregate (driver gets
    one double). The k-means monotonicity invariant on THIS number is
    what the trainer gate (q_pq_train) asserts."""
    from matdb_spark.functions.vectors import squared_l2

    cb_lit, m, k, bs = _pq_lit(codebook)
    u = _vec_input(corpus, [F.col(id_col)], vec_col, normalize)

    # codes bound as a lambda VARIABLE (_bound): referenced m times
    # below — projected as a column, CollapseProject would inline the
    # full encode expression into every block term (m× recompute)
    def err_given(codes: Column) -> Column:
        def block_err(b: int) -> Column:
            blk = F.slice(F.col("__v"), b * bs + 1, bs)
            code = F.element_at(codes, b + 1)
            cw = F.element_at(cb_lit, (F.lit(b * k) + code + 1).cast("int"))
            return squared_l2(blk, cw)

        return sum((block_err(b) for b in range(m)), F.lit(0.0))

    per_row = u.select(
        _bound(_pq_codes_expr(codebook), err_given).alias("__e")
    )
    row = per_row.agg(F.avg("__e").alias("mse")).first()
    return float(row["mse"])


def pq_codebook_from_residual_sample(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    sample_mod: int = 31,
) -> list[list[list[float]]]:
    """Deterministic codebook over RESIDUALS y − centroid(cell(y)) —
    the training input IVFADC (Jégou et al. 2011) quantizes. Same
    sampling rule as pq_codebook_from_sample (k lowest-id vectors with
    ``id % sample_mod == 0``), but each sample is the vector's residual
    against its nearest unit centroid, so the codewords live in the
    residual space the index stores. Driver collect bounded by k."""
    sample = corpus.filter(F.col(id_col) % sample_mod == 0)
    cells = assign_cells(sample, centroids, id_col, vec_col)
    cents = _unit(centroids, [F.col("cell_id")], vec_col, "__cv")
    rows = (
        cells.join(F.broadcast(cents), "cell_id")
        .select(
            F.col(id_col),
            F.zip_with(
                F.col(vec_col), F.col("__cv"), lambda a, b: a - b
            ).alias("__v"),
        )
        .filter(F.col("__v").isNotNull())
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"only {len(rows)} usable sample residuals for k={k}")
    d = len(rows[0]["__v"])
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    bs = d // m
    return [
        [list(r["__v"][b * bs : (b + 1) * bs]) for r in rows]
        for b in range(m)
    ]


def write_ivfpq_index(
    corpus: DataFrame,
    centroids: DataFrame,
    codebook: list[list[list[float]]],
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    residual: bool = True,
) -> None:
    """Persist the corpus as an IVF-PQ index — the two approximations
    composed the way billion-scale ANN systems do: nearest-centroid
    cells give PARTITION PRUNING (a probe reads only its cells'
    `cell_id=` directories), and inside each cell rows store only the
    m PQ codes, never vectors (m bytes-ish vs d floats of IO per
    candidate). Centroids and the codebook are stored alongside under
    `_centroids/` and `_codebook/` for self-contained reads.

    ``residual=True`` (default) is IVFADC proper (Jégou, Douze,
    Schmid, TPAMI 2011): codes quantize the residual y − centroid(cell)
    rather than y itself, so the m×k code budget spends its resolution
    on the within-cell detail the coarse quantizer already removed —
    same storage, better recall WHEN the data is clustered (measured:
    recall@10 0.18 → 0.22 raw→residual on a 10-cluster synthetic at
    m=8, k=16, nprobe=2 — tests/test_similarity.py; on the near-
    uniform embeddings fixture, whose max pairwise cosine is ~0.5,
    residual ≈ raw because cells remove no structure there). Pass a
    residual-trained codebook (pq_codebook_from_residual_sample, or
    pq_train_kmeans over the ``residuals`` relation with
    normalize=False). ``residual=False`` keeps raw-vector encoding for
    comparison. The flag is persisted with the codebook so probes
    self-configure."""
    cb_lit, m, k, bs = _pq_lit(codebook)
    cells = assign_cells(corpus, centroids, id_col, vec_col)
    if residual:
        cents = _unit(centroids, [F.col("cell_id")], vec_col, "__cv")
        enc_in = cells.join(F.broadcast(cents), "cell_id").select(
            F.col(id_col),
            F.col("cell_id"),
            F.zip_with(
                F.col(vec_col), F.col("__cv"), lambda a, b: a - b
            ).alias("__v"),
        )
    else:
        enc_in = cells.select(
            F.col(id_col), F.col("cell_id"), F.col(vec_col).alias("__v")
        )
    coded = enc_in.select(
        id_col, "cell_id", _pq_codes_expr(codebook).alias("codes")
    )
    (
        coded.repartition(F.col("cell_id"))
        .write.mode("error")
        .partitionBy("cell_id")
        .parquet(path)
    )
    cents_out = _unit(centroids, [F.col("cell_id")], vec_col, vec_col)
    cents_out.coalesce(1).write.mode("error").parquet(path + "/_centroids")
    spark = corpus.sparkSession
    cb_rows = [
        (b, j, codebook[b][j], bool(residual))
        for b in range(m)
        for j in range(k)
    ]
    spark.createDataFrame(
        cb_rows, "b int, code int, centroid array<double>, residual boolean"
    ).coalesce(1).write.mode("error").parquet(path + "/_codebook")


def append_ivfpq_index(
    spark,
    new_vecs: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Admit a new embedding batch into a persisted IVF-PQ index:
    assign each vector to its nearest STORED centroid, encode with the
    STORED codebook (residuals against the stored centroids when the
    index is residual-encoded — the flag rides the `_codebook`
    sidecar), and append into the assigned cells' partitions. Because
    assignment and encoding are deterministic given the sidecars, an
    appended batch lands bit-identically to a from-scratch build with
    the same centroids/codebook — which is what lets the incremental
    gate share the full-build oracle. One broadcast assignment + one
    exchange-free encode + one partitioned append per batch."""
    codebook, residual = read_pq_codebook_meta(spark, path + "/_codebook")
    cb_lit, m, k, bs = _pq_lit(codebook)
    cents = _rp(spark, path + "/_centroids").select(
        "cell_id", F.col(vec_col)
    )
    cells = assign_cells(
        new_vecs, cents, id_col, vec_col, centroids_unit=True
    )
    if residual:
        cu = cents.select("cell_id", F.col(vec_col).alias("__cv"))
        enc_in = cells.join(F.broadcast(cu), "cell_id").select(
            F.col(id_col),
            F.col("cell_id"),
            F.zip_with(
                F.col(vec_col), F.col("__cv"), lambda a, b: a - b
            ).alias("__v"),
        )
    else:
        enc_in = cells.select(
            F.col(id_col), F.col("cell_id"), F.col(vec_col).alias("__v")
        )
    coded = enc_in.select(
        id_col, "cell_id", _pq_codes_expr(codebook).alias("codes")
    )
    (
        coded.repartition(F.col("cell_id"))
        .write.mode("append")
        .partitionBy("cell_id")
        .parquet(path)
    )


def purge_ivfpq_index(spark, path: str, ids) -> tuple[int, int]:
    """Deletion propagation for an IVF-PQ index: rewrite without the
    given ids (the `_centroids`/`_codebook` sidecars are aggregates,
    not per-document data, and are preserved). Same one-shuffle
    rewrite + atomic swap as every other index purge."""
    from matdb_spark.operators.index_maint import purge_index

    return purge_index(
        spark,
        path,
        ids,
        "vec_id",
        "cell_id",
        ["vec_id"],
        sidecars=("_centroids", "_codebook"),
    )


def read_pq_codebook(spark, path: str) -> list[list[list[float]]]:
    """Codebook back from a `_codebook/` parquet (bounded m×k rows)."""
    cb, _ = read_pq_codebook_meta(spark, path)
    return cb


def read_pq_codebook_meta(
    spark, path: str
) -> tuple[list[list[list[float]]], bool]:
    """(codebook, residual_flag) from a `_codebook/` parquet. Indexes
    written before the residual flag existed read as residual=False
    (they encoded raw vectors)."""
    df = _rp(spark, path)
    has_flag = "residual" in df.columns
    rows = df.collect()
    m = 1 + max(r["b"] for r in rows)
    k = 1 + max(r["code"] for r in rows)
    cb: list[list[list[float]]] = [[None] * k for _ in range(m)]
    for r in rows:
        cb[r["b"]][r["code"]] = list(r["centroid"])
    residual = bool(rows[0]["residual"]) if has_flag else False
    return cb, residual


def ivfpq_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    codebook: list[list[list[float]]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
    max_driver_queries: int = DEFAULT_MAX_DRIVER_QUERIES,
    distributed: bool = False,
) -> DataFrame:
    """Top-k against a persisted IVF-PQ index: probe ``nprobe`` cells
    per query, read ONLY those `cell_id=` partitions, ADC-score the
    stored codes via the per-query lookup table. Everything bounded
    rides the driver: centroid dots and cell choice (ncells × queries
    python dots — sequential folds, bit-identical to the engines),
    the LUT (|queries|·m·k doubles as one folded literal), and the
    (query, cell) probe relation (broadcast). The index side ships
    only code rows from probed partitions; the one shuffle is the
    final per-query top-k window.

    Residual-encoded indexes (IVFADC — the write_ivfpq_index default,
    detected from the persisted flag) score as
    q·centroid(cell) + Σ_b LUT[b][code_b]: the decoded candidate is
    centroid + residual-codeword, and both terms distribute over the
    dot product. The per-(query, cell) offset q·centroid rides the
    broadcast probe relation — the LUT shift of the IVFADC paper,
    costing one extra double per probe row.

    The bounded-probe contract is ENFORCED: past ``max_driver_queries``
    the collect raises. ``distributed=True`` keeps only the BOUNDED
    sets on the driver (centroids, and the ≤ncells probed-cell ids
    needed for partition pruning); query unit vectors, cell choice
    (top-nprobe via max_by-backed window, same desc-sim/asc-cell tie
    rule), and the per-query LUT all stay JVM-side, and the probe
    relation joins the index on cell_id (AQE picks broadcast vs
    shuffle by its actual size). Scores are bit-identical to the
    driver path — same fold orders throughout."""
    if codebook is None:
        codebook, residual = read_pq_codebook_meta(spark, path + "/_codebook")
    else:
        _, residual = read_pq_codebook_meta(spark, path + "/_codebook")
    m, kk = len(codebook), len(codebook[0])
    import json

    cents_df = _rp(spark, path + "/_centroids")
    cell_id_type = cents_df.schema["cell_id"].dataType
    if distributed:
        return _ivfpq_topk_distributed(
            spark, path, codebook, residual, cents_df, queries,
            id_col, vec_col, k, nprobe,
        )
    cents = cents_df.collect()
    # the bounded-batch cap rides the collect itself — no counting job
    q_rows = _collect_capped(
        _unit(queries, [F.col(id_col).alias("query_id")], vec_col, "__qv"),
        max_driver_queries,
        max_driver_queries,
        "ivfpq_topk_indexed",
    )
    lut, q_meta = _adc_tables(q_rows, codebook, "query_id")
    probe_rows = []
    for qi, qid, qv in q_meta:
        # nprobe nearest cells (ties to the lowest cell id)
        sims = sorted(
            ((-_pydot(qv, c[vec_col]), c["cell_id"]) for c in cents)
        )[:nprobe]
        for negsim, cell in sims:
            # residual scoring adds q·centroid(cell) — already computed
            # for the probe choice, so it rides along for free
            probe_rows.append((qi, qid, cell, -negsim))
    # probe schema derived from the inputs (query ids from the query
    # relation, cell ids from the index), never hardcoded 'long'
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    qcell = spark.createDataFrame(
        probe_rows,
        StructType(
            [
                StructField("__qi", IntegerType(), False),
                StructField("query_id", queries.schema[id_col].dataType),
                StructField("cell_id", cell_id_type),
                StructField("__off", DoubleType(), False),
            ]
        ),
    )
    probed = sorted({r[2] for r in probe_rows})
    index = _rp(spark, path).filter(F.col("cell_id").isin(probed))
    cand = index.withColumnRenamed(id_col, "neighbor_id").join(
        F.broadcast(qcell), "cell_id"
    ).filter(F.col("neighbor_id") != F.col("query_id"))
    score = _adc_score_expr(lut, m, kk)
    if residual:
        # (Σ terms) + offset — fold FIRST, offset added once at the
        # end, matching the oracle's list_sum(...) + off association
        score = score + F.col("__off")
    scored = cand.select(
        "query_id", "neighbor_id", score.alias("approx_sim")
    ).filter(F.col("approx_sim").isNotNull())
    return top_k_per_group(
        scored,
        ["query_id"],
        [F.col("approx_sim").desc(), F.col("neighbor_id").asc()],
        k,
    )

def _ivfpq_topk_distributed(
    spark,
    path: str,
    codebook: list[list[list[float]]],
    residual: bool,
    cents_df: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    nprobe: int,
) -> DataFrame:
    """Large-batch IVF-PQ probe: nothing query-sized ever reaches the
    driver. Cell choice is a JVM top-nprobe (desc sim, asc cell — the
    driver path's exact tie rule), the LUT is a per-query-row array
    column (_adc_lut_expr — bit-identical entries), and the probe
    relation joins the index on cell_id. The only driver
    materialization is the probed-cell id set for partition pruning,
    bounded by ncells (an index constant), never by |queries|."""
    m, kk, bs = len(codebook), len(codebook[0]), len(codebook[0][0])
    q = _unit(queries, [F.col(id_col).alias("query_id")], vec_col, "__qv").filter(
        F.col("__qv").isNotNull()
    )
    # stored centroids are unit vectors (write_ivfpq_index persists the
    # normalized kmeans output) — do NOT re-normalize, only cast
    cents = cents_df.select(
        "cell_id", as_double(F.col(vec_col)).alias("__cv")
    )
    cell_sims = q.crossJoin(F.broadcast(cents)).select(
        "query_id",
        "cell_id",
        dot(F.col("__qv"), F.col("__cv")).alias("__off"),
    )
    probe = top_k_per_group(
        cell_sims,
        ["query_id"],
        [F.col("__off").desc(), F.col("cell_id").asc()],
        nprobe,
        rank_col="__pr",
    ).drop("__pr")
    qlut = q.select(
        "query_id", _adc_lut_expr("__qv", codebook).alias("__lut")
    )
    probe = probe.join(qlut, "query_id")
    # bounded driver set: distinct probed cells (≤ ncells) for the
    # partition-pruning filter on the index read
    probed = sorted(
        r["cell_id"] for r in probe.select("cell_id").distinct().collect()
    )
    index = _rp(spark, path).filter(F.col("cell_id").isin(probed))
    cand = (
        index.withColumnRenamed(id_col, "neighbor_id")
        .join(probe, "cell_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    score = _adc_score_from_col("__lut", m, kk)
    if residual:
        score = score + F.col("__off")
    scored = cand.select(
        "query_id", "neighbor_id", score.alias("approx_sim")
    ).filter(F.col("approx_sim").isNotNull())
    return top_k_per_group(
        scored,
        ["query_id"],
        [F.col("approx_sim").desc(), F.col("neighbor_id").asc()],
        k,
    )
