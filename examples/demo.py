"""End-to-end tour of matdb_spark — the Spark-native rebuild of the
reference's examples/sensor-log.rs workflow, plus the capabilities the
reference doesn't have.

Run:  PYTHONPATH=/root/repo python examples/demo.py
"""

from __future__ import annotations

import shutil

from pyspark.sql import Window as W, functions as F

from matdb_spark import Database, Dimension, Schema, Value, get_spark


def main() -> None:
    spark = get_spark(app_name="matdb_spark_demo", cpus=8)
    path = "/tmp/matdb_spark_demo"
    shutil.rmtree(path, ignore_errors=True)
    # derived paths too — an interrupted previous run leaves them, and
    # the export below writes with mode("error")
    for suffix in ("_cells", "_bulk", "_auto", "_export", "_cdc_ck"):
        shutil.rmtree(path + suffix, ignore_errors=True)

    # 1. create: schema = dimensions (key) + values, chunk sizes route
    #    rows into prunable partitions (reference: schema.json)
    db = Database.create(spark, path, Schema(
        dimensions=[Dimension("time", 1000), Dimension("sensor_id", 10)],
        values=[Value("value")],
    ))

    # 2. write: reference-style point upserts AND distributed frames
    txn = db.begin()
    txn.add_rows([[t, s, t * 100 + s] for t in range(5000) for s in range(3)])
    txn.commit()

    big = spark.range(100_000).selectExpr(
        "id % 10000 as time", "(id div 10000) + 10 as sensor_id", "id as value"
    )
    t2 = db.begin()
    t2.add_dataframe(big)
    t2.commit()

    # 3. the one query operator: ordered, version-resolved snapshot —
    #    and the full Spark surface on top of it
    snap = db.begin().query(ordered=False)
    print("rows:", snap.count())
    db.sql("SELECT sensor_id, COUNT(*) n, AVG(value) avg FROM matdb "
           "GROUP BY sensor_id ORDER BY sensor_id LIMIT 5").show()

    # 4. key-range scan: chunk partitions pruned + row groups skipped
    rng = db.begin().query_range({"time": (2000, 2099)}, ordered=True)
    print("range rows:", rng.count())

    # 5. upsert + delete + time travel
    t3 = db.begin()
    t3.add_row([0, 0, 777_777])
    t3.delete_row([1, 0])
    t3.commit()
    now = db.snapshot().filter("time in (0, 1) and sensor_id = 0")
    then = db.snapshot(as_of=2).filter("time in (0, 1) and sensor_id = 0")
    print("now:", sorted(tuple(r) for r in now.collect()))
    print("as_of=2:", sorted(tuple(r) for r in then.collect()))

    # 6. point lookups: exact key set pushed through manifest stats,
    #    partition pruning, and parquet row-group stats
    pts = db.begin().query_points([(0, 0), (2500, 1), (9999, 12)])
    print("points:", sorted(tuple(r) for r in pts.collect()))

    # 7. commit log + interop export (any engine reads plain parquet)
    for entry in db.history():
        print("history:", entry)
    db.export_snapshot(path + "_export")
    print("export rows:", spark.read.parquet(path + "_export").count())

    # 8. change feed (CDC): net writes of a commit window, priced by
    #    change volume — and a polling subscription over it
    print("changes since txn 2:")
    db.changes(since=2).show(5)
    for cursor, batch in db.follow_changes(since=0, max_empty_polls=1):
        print(f"follow batch -> cursor {cursor}, rows {batch.count()}")

    # 9. cell-level resolution: partial-column upsert leaves other
    #    columns' cells intact (the reference's in-place cell writes)
    db2 = Database.create(spark, path + "_cells", Schema(
        dimensions=[Dimension("k", 10)], values=[Value("a"), Value("b")],
    ))
    tc = db2.begin(); tc.add_row([1, 10, 100]); tc.commit()
    tc = db2.begin()
    tc.add_dataframe(spark.createDataFrame([(1, 11)], "k long, a long"), partial=True)
    tc.commit()
    print("cell merge:", db2.begin().query(cell_merge=True).collect())

    # 10. maintenance: minor compaction folds a contiguous txn window
    #     (cost tracks the window), a full z-order compact folds the
    #     rest for multi-dim pruning, vacuum GCs superseded segments —
    #     and the compacted snapshot then scans DEDUP-FREE (no shuffle)
    print("stats before compact:", db.stats())
    db.compact(max_txns=2, fold="oldest")   # fold the two oldest txns
    db.compact(cluster="zorder")            # collapse the rest
    db.vacuum()
    print("stats after vacuum:  ", db.stats())
    print("rows after maintenance:", db.snapshot().count())

    # 11. bulk load with write-time dedup: single-txn stores earn
    #     dedup-free scans immediately, no compaction needed
    db3 = Database.create(spark, path + "_bulk", Schema(
        dimensions=[Dimension("k", 1000)], values=[Value("v")],
    ))
    tb = db3.begin()
    tb.add_dataframe(
        spark.range(20_000).selectExpr("id % 10000 as k", "id as v"), dedup=True
    )
    tb.commit()
    print("bulk rows (deduped):", db3.snapshot().count())

    # 12. automatic compaction policy: small commits fold themselves
    #     LSM-style — no manual compact() calls, visible txn count
    #     stays bounded under standing ingest
    db4 = Database.create(spark, path + "_auto", Schema(
        dimensions=[Dimension("k", 100)], values=[Value("v")],
    ))
    db4.enable_auto_compact(every=4, major_every=4)
    for i in range(8):
        with db4.begin() as ta:
            ta.add_row([i, i * 10])
            ta.commit()
    print("auto-compact stats:", db4.stats())

    # 13. LLM-pipeline operators over a toy corpus: sequence packing,
    #     mixture weights, dedup pairs — all plain DataFrame transforms
    from matdb_spark.functions.text import token_count
    from matdb_spark.operators.packing import pack_documents
    from matdb_spark.operators.dedup import minhash_lsh_pairs

    corpus = spark.createDataFrame(
        [(i, f"doc {i} " + "lorem ipsum dolor sit amet " * (1 + i % 4))
         for i in range(100)],
        "doc_id long, text string",
    ).withColumn("n_tokens", token_count(F.col("text")).cast("long"))
    packed = pack_documents(corpus, "doc_id", "n_tokens", budget=64, n_shards=4)
    print("packing:")
    packed.select("doc_id", "shard", "pack_id", "pack_pos").show(5)
    print("near-dup candidate pairs:",
          minhash_lsh_pairs(corpus, "doc_id", "text", k=32, bands=8).count())

    # 14. standing-corpus lifecycle: admit arriving batches against a
    #     persisted MinHash index (near-dups of everything admitted so
    #     far are rejected at the door), then maintain the index —
    #     compact the append debris, purge opted-out documents
    from matdb_spark.operators.dedup import admit_batch
    from matdb_spark.operators.index_maint import (
        compact_minhash_index,
        purge_minhash_index,
    )

    idx = path + "_admission_index"
    shutil.rmtree(idx, ignore_errors=True)
    b1 = corpus.filter(F.col("doc_id") < 50)
    b2 = corpus.filter(F.col("doc_id") >= 50)  # heavy near-dups of b1
    n1 = admit_batch(spark, idx, b1, "doc_id", "text").count()
    n2 = admit_batch(spark, idx, b2, "doc_id", "text").count()
    print(f"admission: batch1 admitted {n1}/50, batch2 admitted {n2}/50")
    files = compact_minhash_index(spark, idx)
    purged = purge_minhash_index(spark, idx, [0, 1, 2])
    print(f"index maintenance: compacted {files[0]}->{files[1]} files, "
          f"purged {purged[0] - purged[1]} rows for 3 opted-out docs")

    # 15. data selection: DSIR importance weights vs a target slice,
    #     Gumbel-top-k resample, and a trained BPE vocabulary — the
    #     curation stages between dedup and packing
    from matdb_spark.operators import bpe, selection

    target = corpus.filter(F.col("doc_id") % 10 == 0)
    raw = corpus.filter(F.col("doc_id") % 10 != 0)
    w = selection.importance_weights(raw, target, "doc_id", "text", num_buckets=256)
    picked = selection.importance_resample(w, "doc_id", 10)
    print("selection: top resampled docs:")
    picked.select("doc_id", "weight_unats", "key_unats").show(3)
    merges = bpe.train_bpe(corpus, "text", num_merges=4, min_count=1)
    print("bpe merges:", [(l, r) for _, l, r, _ in merges])
    counts = bpe.bpe_token_count(corpus, "doc_id", "text", merges)
    print("bpe tokens, first docs:")
    counts.orderBy("doc_id").show(3)

    # 16. compressed ANN: residual-encode (IVFADC) a toy embedding
    #     corpus into a persisted IVF-PQ index, then probe it two ways
    #     — ADC ranking (code rows only, probed cells only) and the
    #     production composition with an exact re-rank of the ADC
    #     shortlist
    from matdb_spark.operators import similarity as sim

    emb = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.array(*[((F.col("id") * (j + 3)) % 97 / 48.5 - 1.0) for j in range(16)]).alias(
            "embedding"
        ),
    )
    cents = emb.filter(F.col("vec_id") % 40 == 0).select(
        F.col("vec_id").alias("cell_id"), "embedding"
    )
    cb = sim.pq_codebook_from_residual_sample(emb, cents, m=4, k=8, sample_mod=13)
    ivfpq = path + "_ivfpq"
    shutil.rmtree(ivfpq, ignore_errors=True)
    sim.write_ivfpq_index(emb, cents, cb, ivfpq)  # residual by default
    hits = sim.ivfpq_topk_indexed(
        spark, ivfpq, emb.filter(F.col("vec_id") < 3), k=3, nprobe=2
    )
    print("ivf-pq ADC probe (residual codes):")
    hits.show(3)
    refined = sim.ivfpq_topk_refined(
        spark, ivfpq, emb.filter(F.col("vec_id") < 3), emb,
        k=3, nprobe=2, shortlist=20,
    )
    print("ivf-pq refined probe (ADC shortlist + exact re-rank):")
    refined.show(3)

    # 17. quality filtering + the two dedup tiers document-level
    #     dedup can't see: the Gopher rule bundle, C4-style
    #     duplicated-span removal, and SemDeDup over the same cells
    from matdb_spark.functions.text import gopher_quality
    from matdb_spark.operators.dedup import remove_duplicate_spans

    flags = gopher_quality(corpus, "doc_id", "text", min_words=10,
                           min_stopword_hits=0)
    n_pass = flags.filter("gopher_pass").count()
    print(f"gopher rules: {n_pass}/{corpus.count()} docs pass")
    spans = remove_duplicate_spans(corpus, "doc_id", "text", n=10)
    print("span dedup (duplicated 10-word spans removed):")
    spans.filter("n_removed > 0").orderBy("doc_id").show(3)
    sem = sim.semantic_dedup(emb, cents, threshold=0.999)
    print("semantic dedup: kept",
          sem.filter("kept").count(), "/", sem.count(), "embeddings")
    lsh_hits = sim.lsh_topk(
        emb, emb.filter(F.col("vec_id") < 2), k=3,
        planes_per_table=3, tables=8, dim=16,
    )
    print("multi-table LSH top-3:")
    lsh_hits.show(6)

    # 12. the matdb Spark FORMAT (DataSource V2): snapshot read, time
    #     travel, a write that commits one MVCC txn, and the CDC stream
    from matdb_spark.sources.dsv2 import register_matdb_source

    register_matdb_source(spark)
    fmt = spark.read.format("matdb").load(path)
    print("format('matdb') snapshot rows:", fmt.count())
    # time travel to the newest commit still readable after the
    # earlier compact+vacuum (vacuumed horizons RAISE, same as begin())
    from matdb_spark import manifest as _mf

    head = max(_mf.committed_txn_ids(path))
    print(f"format('matdb') as_of={head} rows:",
          spark.read.format("matdb").option("as_of", head).load(path).count())
    spark.range(3).selectExpr(
        "id + 90000 as time", "CAST(99 AS LONG) as sensor_id", "id as value"
    ).write.format("matdb").mode("append").save(path)
    print("after format write:", spark.read.format("matdb").load(path).count())
    ck = path + "_cdc_ck"
    shutil.rmtree(ck, ignore_errors=True)
    cdc = (
        spark.readStream.format("matdb").option("feed", "changes")
        .option("since", 0).load(path)
        .writeStream.format("memory").queryName("demo_cdc")
        .option("checkpointLocation", ck).trigger(availableNow=True).start()
    )
    cdc.awaitTermination(120)
    print("CDC stream net-effect rows (full history):",
          spark.table("demo_cdc").count())

    # 13. round-6 curation surface: catalog views, PII scrub, line
    #     dedup, hash splits, SQ8 codes-only index, hybrid RRF
    from matdb_spark.catalog import register_store
    from matdb_spark.functions.pii import pii_stats, redact_pii
    from matdb_spark.functions.text import fold_accents
    from matdb_spark.operators.dedup import dedup_lines
    from matdb_spark.operators.fusion import rrf_fuse
    from matdb_spark.operators.quantization import (
        ivf_sq8_topk_indexed,
        write_ivf_sq8_index,
    )
    from matdb_spark.operators.sampling import assign_splits

    register_store(spark, "demo_sensors", path)
    print("catalog view:",
          spark.sql("SELECT COUNT(*) AS n FROM demo_sensors").first()["n"],
          "rows by name from spark.sql")

    pii_corpus = corpus.select(
        "doc_id",
        F.concat(F.col("text"),
                 F.lit(" contact bob@example.com at 10.0.0.7")).alias("text"),
    )
    print("PII: flagged",
          pii_stats(pii_corpus, "doc_id", "text").filter("has_pii").count(),
          "docs;", redact_pii(pii_corpus, "doc_id", "text")
          .agg(F.sum("n_redacted")).first()[0], "spans redacted")

    pages = corpus.select(
        "doc_id",
        F.concat_ws("\n", F.col("text"),
                    F.lit("subscribe to our newsletter")).alias("page"),
    )
    ld = dedup_lines(pages, "doc_id", "page")
    print("line dedup removed",
          ld.agg(F.sum("n_removed")).first()[0], "boilerplate lines")

    splits = assign_splits(corpus, "doc_id")
    splits.groupBy("split").count().orderBy("split").show()

    print("accent fold:",
          spark.range(1).select(
              fold_accents(F.lit("café sÃO žluťoučký")).alias("f")
          ).first()["f"])

    sq8_path = path + "_sq8"
    shutil.rmtree(sq8_path, ignore_errors=True)
    write_ivf_sq8_index(emb, cents, sq8_path)
    print("IVF-SQ8 codes-only index probe (4x less IO/cell):")
    ivf_sq8_topk_indexed(
        spark, sq8_path, emb.filter(F.col("vec_id") < 1), k=3, nprobe=2
    ).show()

    lex_rank = corpus.select(
        F.lit(0).alias("query_id"), F.col("doc_id"),
        F.row_number().over(
            W.orderBy(F.length("text").desc(), F.col("doc_id"))
        ).alias("rank"),
    ).limit(5)
    sem_rank = sim.cosine_topk(
        emb, emb.filter(F.col("vec_id") == 0), k=5, include_self=True
    ).select(F.lit(0).alias("query_id"),
             F.col("neighbor_id").alias("doc_id"), "rank")
    print("hybrid RRF fusion of a lexical and a vector ranking:")
    rrf_fuse([lex_rank, sem_rank], k=5).show()

    # --- SQL DDL shim: the warehouse-user lifecycle by statement ----
    from matdb_spark import ddl

    ddl_loc = path + "_ddl"
    shutil.rmtree(ddl_loc, ignore_errors=True)
    ddl.sql(spark, f"""
        CREATE TABLE demo_ddl (t BIGINT, s BIGINT, v BIGINT)
        USING matdb LOCATION '{ddl_loc}'
        TBLPROPERTIES ('chunks' = 't=1000,s=100')
    """)
    ddb = Database.open(spark, ddl_loc)
    for wave in range(2):
        txn = ddb.begin()
        txn.add_rows([[i, i % 3, wave * 100 + i] for i in range(6)])
        txn.commit()
    from matdb_spark.catalog import refresh_store

    refresh_store(spark, "demo_ddl", ddl_loc)
    print("DDL-registered table, plain SQL:")
    ddl.sql(spark, "SELECT s, COUNT(*) n, MAX(v) mx FROM demo_ddl GROUP BY s ORDER BY s").show()
    print("MERGE INTO: update/delete/insert in ONE MVCC transaction:")
    spark.sql(
        "SELECT 1 AS t, 1 AS s, 999 AS v UNION ALL"  # matched -> update
        " SELECT 2, 2, -1 UNION ALL"                 # matched -> delete
        " SELECT 50, 0, 500"                         # not matched -> insert
    ).createOrReplaceTempView("demo_merge_src")
    ddl.sql(spark, """
        MERGE INTO demo_ddl d USING demo_merge_src m
        ON d.t = m.t AND d.s = m.s
        WHEN MATCHED AND m.v < 0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET v = m.v
        WHEN NOT MATCHED THEN INSERT *
    """).show()
    print("the CDC feed of that merge, as SQL:")
    ddl.sql(spark, "DESCRIBE CHANGES demo_ddl FROM 2").show()
    print("DESCRIBE HISTORY / OPTIMIZE / VACUUM:")
    ddl.sql(spark, "DESCRIBE HISTORY demo_ddl").show()
    ddl.sql(spark, "OPTIMIZE demo_ddl").show()
    ddl.sql(spark, "VACUUM demo_ddl").show()
    print("CTAS: create-and-fill from any query, then SHOW the session:")
    ctas_loc = path + "_ctas"
    shutil.rmtree(ctas_loc, ignore_errors=True)
    ddl.sql(spark, f"""
        CREATE TABLE demo_ctas USING matdb LOCATION '{ctas_loc}'
        TBLPROPERTIES ('chunks' = 't=1000,s=100')
        AS SELECT t, s, v * 10 AS v FROM demo_ddl
    """)
    ddl.sql(spark, "SHOW MATDB TABLES").show(truncate=False)
    ddl.sql(spark, "DROP TABLE demo_ctas")
    ddl.sql(spark, "DROP TABLE demo_ddl")
    shutil.rmtree(ctas_loc, ignore_errors=True)
    shutil.rmtree(ddl_loc, ignore_errors=True)

    shutil.rmtree(sq8_path, ignore_errors=True)
    shutil.rmtree(ck, ignore_errors=True)
    shutil.rmtree(ivfpq, ignore_errors=True)
    shutil.rmtree(idx, ignore_errors=True)
    shutil.rmtree(path + "_cells", ignore_errors=True)
    shutil.rmtree(path + "_bulk", ignore_errors=True)
    shutil.rmtree(path + "_auto", ignore_errors=True)
    shutil.rmtree(path + "_export", ignore_errors=True)


if __name__ == "__main__":
    main()
