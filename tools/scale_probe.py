"""Scale probes for the MVCC engine — run manually, results recorded
in SCALE.md §11. Two axes the small-SF gate never stresses:

  volume   : 256× sf0.1 events (~38 M rows) in a handful of txns —
             does the data path (ingest, scan, range prune, lookup)
             stay sublinear as rows × chunks grow?
  manytxn  : 128 small commits — does snapshot resolution, scan
             planning, the change feed, and compaction stay flat as
             the TRANSACTION count grows (manifest tier, not data)?
  stream   : sustained rate-source ingest — rows/s end-to-end with
             one MVCC txn per micro-batch, plus a live torn-batch
             invisibility check on stop().
  tiered   : two-tier minor-compaction schedule — per-window
             newest-folds must stay flat-cost as the table grows,
             then one oldest-fold collapses the rollups.

Usage: PYTHONPATH=/root/repo python tools/scale_probe.py [volume|manytxn|stream|tiered|lshskew|ccdeep|autocompact|incdex|selection|pq|ivfpq|bpe]
Scratch stores live under /root/repo/.scratch/ (gitignored).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from matdb_spark import Database, Dimension, Schema, Value, get_spark
from matdb_spark.sources.tables import load_table

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch")


def timed(label, fn):
    t0 = time.time()
    out = fn()
    print(f"  {label:44s} {time.time() - t0:7.2f} s   {out if out is not None else ''}")
    return out


def probe_volume(spark, reps: int = 256):
    path = os.path.join(SCRATCH, "probe_volume")
    shutil.rmtree(path, ignore_errors=True)
    ev = load_table(spark, "/root/testdata/sf0.1", "events").select(
        "user_id", "event_id", (F.col("value") * 1000).cast("long").alias("v")
    )
    n_users = ev.agg(F.max("user_id")).collect()[0][0] + 1
    base = ev.count()
    print(f"volume probe: {base} rows x {reps} = {base * reps} rows, "
          f"{n_users * reps} distinct users")
    rep = spark.range(reps).select(F.col("id").alias("__r"))
    big = ev.crossJoin(rep).select(
        (F.col("user_id") + F.col("__r") * n_users).alias("user_id"),
        (F.col("event_id") + F.col("__r") * base).alias("event_id"),
        "v",
    )
    db = Database.create(spark, path, Schema(
        dimensions=[Dimension("user_id", n_users * reps // 128),
                    Dimension("event_id", 0)],
        values=[Value("v")],
    ))
    half = reps // 2

    def ingest(pred):
        txn = db.begin()
        txn.add_dataframe(big.filter(pred))  # segment write happens here
        txn.commit()

    timed("ingest+commit txn1 (half)",
          lambda: ingest(F.col("user_id") < half * n_users))
    timed("ingest+commit txn2 (half)",
          lambda: ingest(F.col("user_id") >= half * n_users))

    timed("full merged scan count", lambda: db.begin().query(ordered=False).count())
    timed("ordered scan (noop sink)", lambda: db.begin().query()
          .write.format("noop").mode("overwrite").save())
    lo, hi = 3 * n_users, 4 * n_users - 1
    timed(f"query_range 1/{reps} of key space",
          lambda: db.begin().query_range({"user_id": (lo, hi)}).count())
    probe_keys = [
        {"user_id": r["user_id"], "event_id": r["event_id"]}
        for r in ev.limit(3).collect()
    ]
    got = timed("point lookup (3 existing keys)",
                lambda: db.begin().query_points(probe_keys).count())
    assert got == 3, f"point lookup found {got} of 3 keys"
    shutil.rmtree(path, ignore_errors=True)


def probe_manytxn(spark):
    path = os.path.join(SCRATCH, "probe_manytxn")
    shutil.rmtree(path, ignore_errors=True)
    ev = load_table(spark, "/root/testdata/sf0.01", "events").select(
        "user_id", "event_id", (F.col("value") * 1000).cast("long").alias("v")
    )
    base = ev.count()
    n_txns = 128
    print(f"manytxn probe: {n_txns} commits x {base} rows")
    db = Database.create(spark, path, Schema(
        dimensions=[Dimension("user_id", 25), Dimension("event_id", 0)],
        values=[Value("v")],
    ))
    slice_df = ev.coalesce(4)
    t0 = time.time()
    for i in range(n_txns):
        txn = db.begin()
        txn.add_dataframe(slice_df.select(
            "user_id", (F.col("event_id") + i * base).alias("event_id"), "v"))
        txn.commit()
    el = time.time() - t0
    print(f"  {n_txns} sequential commits                       {el:7.2f} s   "
          f"({el / n_txns:.2f} s/commit)")

    timed("begin+resolve snapshot (no data)", lambda: db.begin().horizon)
    timed(f"full scan over {n_txns} txns", lambda: db.begin().query(ordered=False).count())
    timed("range scan 1/4 key space",
          lambda: db.begin().query_range({"user_id": (0, 24)}).count())
    timed("changes feed (last 8 txns)",
          lambda: db.changes(since=n_txns - 8).count())
    timed("history()", lambda: len(db.history()))
    timed("compact()", db.compact)
    timed("post-compact full scan", lambda: db.begin().query(ordered=False).count())
    timed("vacuum()", lambda: len(db.vacuum()))
    timed("post-vacuum range scan",
          lambda: db.begin().query_range({"user_id": (0, 24)}).count())
    shutil.rmtree(path, ignore_errors=True)


def probe_tiered(spark):
    """Two-tier minor-compaction schedule under standing ingest — the
    claim to verify: per-window fold cost stays FLAT (window-sized) as
    the table grows, because ``fold="newest"`` rewrites only the batch
    window, never the accumulated store. 16 windows x 8 commits; after
    each window ``compact(max_txns=8, fold="newest")``; finally the 16
    accumulated rollups (now the oldest contiguous txns) collapse with
    one ``compact(max_txns=16)`` + vacuum."""
    path = os.path.join(SCRATCH, "probe_tiered")
    shutil.rmtree(path, ignore_errors=True)
    ev = load_table(spark, "/root/testdata/sf0.01", "events").select(
        "user_id", "event_id", (F.col("value") * 1000).cast("long").alias("v")
    )
    base = ev.count()
    windows, per = 16, 8
    print(f"tiered probe: {windows} windows x {per} commits x {base} rows")
    db = Database.create(spark, path, Schema(
        dimensions=[Dimension("user_id", 25), Dimension("event_id", 0)],
        values=[Value("v")],
    ))
    slice_df = ev.coalesce(4)
    fold_times = []
    for w in range(windows):
        for i in range(per):
            j = w * per + i
            txn = db.begin()
            txn.add_dataframe(slice_df.select(
                "user_id", (F.col("event_id") + j * base).alias("event_id"), "v"))
            txn.commit()
        t0 = time.time()
        cid = db.compact(max_txns=per, fold="newest")
        fold_times.append(time.time() - t0)
        assert cid is not None, f"window {w} fold refused"
    head, tail = fold_times[:4], fold_times[-4:]
    print(f"  window folds: first 4 avg {sum(head)/4:.2f} s, "
          f"last 4 avg {sum(tail)/4:.2f} s over {windows} windows "
          f"(flat = cost tracks window, not table)")
    stats = db.stats()
    assert stats["visible_txns"] == windows, stats
    timed(f"collapse {windows} rollups (oldest fold)",
          lambda: db.compact(max_txns=windows))
    timed("vacuum()", lambda: len(db.vacuum()))
    got = timed("final full scan count", lambda: db.begin().query(ordered=False).count())
    assert got == windows * per * base, f"{got} != {windows * per * base}"
    shutil.rmtree(path, ignore_errors=True)


def probe_leveled_stream(spark):
    """Standing ingest WITH in-stream leveled compaction — the full
    maintenance story end-to-end: rate source → one txn per batch,
    tier-1 fold every compact_every batches, higher tiers every
    major_every windows, vacuum after folds. Reports throughput, the
    fold schedule actually taken (from the commit history), the final
    visible txn count (must stay small), and the post-run scan time
    against an unmaintained twin store ingesting the same stream."""
    from matdb_spark.streaming.ingest import stream_into_database

    rows_per_sec = 100_000
    run_secs = 25
    results = {}
    for mode in ("maintained", "unmaintained"):
        path = os.path.join(SCRATCH, f"probe_lvl_{mode}")
        ckpt = os.path.join(SCRATCH, f"probe_lvl_{mode}_ckpt")
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        db = Database.create(spark, path, Schema(
            dimensions=[Dimension("k", 100_000), Dimension("sub", 0)],
            values=[Value("v")],
        ))
        src = (
            spark.readStream.format("rate-micro-batch")
            .option("rowsPerBatch", rows_per_sec)
            .load()
            .select(
                F.col("value").alias("k"),
                (F.col("value") % 1000).alias("sub"),
                (F.col("value") * 7).alias("v"),
            )
        )
        kwargs = {}
        if mode == "maintained":
            kwargs = dict(compact_every=4, major_every=4, vacuum_superseded=True)
        q = stream_into_database(
            src, db, ckpt, available_now=False, source_name=f"lvl_{mode}", **kwargs
        )
        t0 = time.time()
        time.sleep(run_secs)
        q.stop()
        q.awaitTermination()
        el = time.time() - t0
        n = db.begin().query(ordered=False).count()
        hist = db.history()
        folds = [h for h in hist if h["replaces"]]
        stats = db.stats()
        t0 = time.time()
        db.begin().query(ordered=False).write.format("noop").mode("overwrite").save()
        scan_s = time.time() - t0
        print(f"  {mode:12s}: {n:>9} rows in {el:.1f} s "
              f"({n/el:,.0f} rows/s), {len(hist)} commits "
              f"({len(folds)} folds), visible_txns={stats['visible_txns']}, "
              f"full scan {scan_s:.2f} s")
        results[mode] = (n, stats["visible_txns"], scan_s)
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
    nm, vm, sm = results["maintained"]
    nu, vu, su = results["unmaintained"]
    print(f"  leveling kept visible txns at {vm} vs {vu} unmaintained; "
          f"scan {sm:.2f} s vs {su:.2f} s")


def probe_stream(spark):
    """Sustained streaming-ingest throughput: rate source → MVCC store
    (one txn per micro-batch, exactly-once batch stamping). Measures
    end-to-end rows/s including segment writes + manifest publishes,
    then verifies the committed store row count EXACTLY equals
    committed-batches x rowsPerBatch: q.stop() kills the in-flight
    micro-batch mid-write (the FileFormatWriter abort in the log is
    that batch), and its torn segment must never become visible —
    the crash-consistency designed into the manifest protocol,
    demonstrated live."""
    from pyspark.sql import functions as F
    from matdb_spark.streaming.ingest import stream_into_database

    path = os.path.join(SCRATCH, "probe_stream")
    ckpt = os.path.join(SCRATCH, "probe_stream_ckpt")
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    rows_per_sec = 200_000
    run_secs = 20
    db = Database.create(spark, path, Schema(
        dimensions=[Dimension("k", 100_000), Dimension("sub", 0)],
        values=[Value("v")],
    ))
    src = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_sec)
        .load()
        .select(
            F.col("value").alias("k"),
            (F.col("value") % 1000).alias("sub"),
            (F.col("value") * 7).alias("v"),
        )
    )
    q = stream_into_database(src, db, ckpt, available_now=False, source_name="probe")
    t0 = time.time()
    time.sleep(run_secs)
    q.stop()
    q.awaitTermination()
    el = time.time() - t0
    n = db.begin().query(ordered=False).count()
    txns = len(db.history())
    print(f"  streamed {n} rows in {el:.1f} s over {txns} txn-batches "
          f"-> {n / el:,.0f} rows/s end-to-end")
    expect = txns * rows_per_sec
    assert n == expect, f"exactly-once violated: {n} rows vs {expect} expected"
    print(f"  row count == txns x rowsPerBatch ({expect}) — exactly-once holds")
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)


def probe_auto_compact(spark):
    """Auto-compaction policy under sustained small commits: 64
    commits x 10k rows with enable_auto_compact(every=8,
    major_every=8). Claims to verify: (a) visible txn count stays
    bounded (never grows past every + a few rollups), (b) commit cost
    stays flat — the policy folds windows, never the whole table, (c)
    the final content is exact."""
    path = os.path.join(SCRATCH, "probe_autocompact")
    shutil.rmtree(path, ignore_errors=True)
    ev = load_table(spark, "/root/testdata/sf0.01", "events").select(
        "user_id", "event_id", (F.col("value") * 1000).cast("long").alias("v")
    )
    base = ev.count()
    n = 64
    db = Database.create(spark, path, Schema(
        dimensions=[Dimension("user_id", 25), Dimension("event_id", 0)],
        values=[Value("v")],
    ))
    db.enable_auto_compact(every=8, major_every=8)
    slice_df = ev.coalesce(4)
    from matdb_spark import manifest as m

    costs, max_visible = [], 0
    for i in range(n):
        t0 = time.time()
        with db.begin() as txn:
            txn.add_dataframe(slice_df.select(
                "user_id", (F.col("event_id") + i * base).alias("event_id"), "v"))
            txn.commit()
        costs.append(time.time() - t0)
        max_visible = max(
            max_visible, len(m.visible_txn_ids(db.path, db.next_txn_id))
        )
    head, tail = costs[:16], costs[-16:]
    print(f"  {n} commits under policy: first-16 avg {sum(head)/16:.2f} s, "
          f"last-16 avg {sum(tail)/16:.2f} s (flat = fold cost tracks the "
          f"window, not the table)")
    final_visible = len(m.visible_txn_ids(db.path, db.next_txn_id))
    print(f"  visible txns: max {max_visible} during run, {final_visible} at end "
          f"(raw commits would be {n})")
    assert max_visible <= 8 + 8, max_visible
    got = timed("final scan count", lambda: db.begin().query(ordered=False).count())
    assert got == n * base, f"{got} != {n * base}"
    shutil.rmtree(path, ignore_errors=True)


def probe_lsh_skew(spark):
    """Adversarial LSH skew: 1M documents where 500k share ONE
    boilerplate text (every band bucket degenerate, cap-free pair
    count would be ~1.25e11) mixed with 500k distinct docs. With the
    default max_bucket cap the candidate-pair job must finish in
    linear time and never materialize the quadratic bucket."""
    from matdb_spark.operators.dedup import minhash_lsh_pairs

    n_boiler, n_unique = 500_000, 500_000
    docs = spark.range(n_boiler + n_unique).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") < n_boiler,
            F.lit("terms of service apply all rights reserved contact us"),
        )
        .otherwise(
            F.concat_ws(
                " ",
                F.lit("doc"),
                F.col("id"),
                (F.col("id") * 7919 % 104729).cast("string"),
                (F.col("id") * 104729 % 7919).cast("string"),
                F.sha2(F.col("id").cast("string"), 256),
            )
        )
        .alias("text"),
    )
    n_pairs = timed(
        f"LSH pairs, {n_boiler/1e3:.0f}k-dup adversary, default cap",
        lambda: minhash_lsh_pairs(docs, "doc_id", "text", k=32, bands=8).count(),
    )
    # The boilerplate bucket (500k members) must be dropped by the
    # cap; surviving pairs come only from incidental band collisions
    # among the unique docs — far below quadratic.
    assert n_pairs < 10_000_000, (
        f"cap failed: {n_pairs} pairs emitted — quadratic bucket leaked"
    )
    print(f"  pair emission stayed linear ({n_pairs} pairs, no O(n^2) bucket)")


def probe_cc_deep(spark):
    """Connected components in anger: a single CHAIN component of 1.2M
    edges — above driver_threshold (forces the distributed loop) and
    with diameter 1.2M, the worst case for plain min-propagation
    (O(diameter) rounds). Pointer doubling must converge in ~log2
    rounds and label every node with the component min (0)."""
    from matdb_spark.operators.dedup import connected_components

    n = 1_200_001
    edges = spark.range(n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    out = timed(
        f"chain CC, {n-1} edges, diameter {n-1}, distributed",
        lambda: connected_components(edges, max_iter=64).localCheckpoint(),
    )
    rows = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("cluster_id").alias("nc"),
        F.max("cluster_id").alias("mx"),
    ).first()
    assert (rows["n"], rows["nc"], rows["mx"]) == (n, 1, 0), rows
    print(f"  {rows['n']} nodes -> 1 component, canonical id 0 (partition-local contraction)")


def probe_incremental_index(spark):
    """Incremental dedup economics at 1M and 4M corpus docs: the index
    is built ONCE, then a 4k-doc batch (half near-dups of corpus docs,
    half genuinely novel) is admitted by probing it. The claim under
    test: per-batch cost is O(batch) + one narrow 3-column index scan
    (never shuffled), vs the one-shot miner's O(corpus+batch)
    re-shingle/re-hash — so probe time must sit far under re-mine time
    and the gap must WIDEN with corpus size. Measure on an idle box:
    a probe immediately after the heavyweight build in the same JVM
    reads ~3x slow (GC/page-cache aftermath)."""
    from matdb_spark.operators.dedup import (
        minhash_lsh_pairs,
        pairs_against_index,
        write_minhash_index,
    )

    n_batch = 4_000

    def synth(ids, dup_of=None, tag=""):
        # 12-word pseudo-text from id arithmetic; dup_of shifts the id
        # into an existing doc's text with ONE word changed (near-dup).
        # ``tag`` prefixes every word so "novel" docs cannot collide
        # with corpus texts through the modulus (id*7919 mod 49_999_991
        # lands inside the corpus residue range ~8% of the time at 4M
        # docs — untagged, those were byte-identical corpus copies,
        # contaminating the measured pair counts)
        base = F.col("id") if dup_of is None else (F.col("id") - F.lit(dup_of))
        words = [
            F.concat(F.lit(f"{tag}w{j}_"), ((base * (j * 2 + 3)) % 49_999_991).cast("string"))
            for j in range(12)
        ]
        if dup_of is not None:
            words[11] = F.lit("changed")
        return ids.select(
            F.col("id").alias("doc_id"), F.concat_ws(" ", *words).alias("text")
        )

    for n_corpus in (1_000_000, 4_000_000):
        path = os.path.join(SCRATCH, f"probe_mh_index_{n_corpus}")
        shutil.rmtree(path, ignore_errors=True)
        corpus = synth(spark.range(n_corpus))
        timed(
            f"index build, {n_corpus} docs (one-time corpus cost)",
            lambda: write_minhash_index(corpus, path, "doc_id", "text"),
        )
        half = n_batch // 2
        # docs n_corpus+i -> near-dup of corpus doc i
        dups = synth(spark.range(n_corpus, n_corpus + half), dup_of=n_corpus)
        novel = synth(
            spark.range(n_corpus + half, n_corpus + n_batch), tag="nv_"
        )
        batch = dups.union(novel).localCheckpoint()

        n_pairs = timed(
            f"probe index with {n_batch}-doc batch (per-batch admission cost)",
            lambda: pairs_against_index(spark, path, batch, "doc_id", "text").count(),
        )
        print(f"  {n_pairs} candidate pairs from the batch probe")
        assert n_pairs >= half * 0.5, f"expected most of {half} near-dups, got {n_pairs}"

        remine = timed(
            f"one-shot re-mine over corpus+batch ({n_corpus + n_batch} docs)",
            lambda: minhash_lsh_pairs(corpus.union(batch), "doc_id", "text").count(),
        )
        print(f"  re-mine found {remine} pairs (includes intra-corpus)")

    # adversarial: a 500k-member boilerplate bucket must be dropped by
    # the cap BEFORE any member array exists (the probe stays fast and
    # emits zero pairs from it), while an exact copy of a unique
    # corpus doc is still found — cap safety AND sensitivity
    path = os.path.join(SCRATCH, "probe_mh_boiler")
    shutil.rmtree(path, ignore_errors=True)
    boiler_text = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod"
    boiler = spark.range(500_000).select(
        F.col("id").alias("doc_id"), F.lit(boiler_text).alias("text")
    )
    uniq = spark.range(500_000, 1_000_000).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("unique document "), F.col("id").cast("string"),
            F.lit(" with words "), (F.col("id") * 7).cast("string"),
            F.lit(" "), (F.col("id") * 13).cast("string"),
            F.lit(" tail segment"),
        ).alias("text"),
    )
    timed(
        "degenerate index build (500k boilerplate + 500k unique)",
        lambda: write_minhash_index(boiler.union(uniq), path, "doc_id", "text"),
    )
    copy_text = f"unique document 600000 with words {600000 * 7} {600000 * 13} tail segment"
    batch = spark.createDataFrame(
        [(2_000_001, boiler_text), (2_000_002, copy_text)],
        "doc_id long, text string",
    )
    rows = timed(
        "probe vs the 500k-member bucket",
        lambda: pairs_against_index(spark, path, batch, "doc_id", "text").collect(),
    )
    got = {(r["new_id"], r["corpus_id"]) for r in rows}
    assert all(n != 2_000_001 for n, _ in got), "cap failed: boilerplate bucket emitted pairs"
    assert (2_000_002, 600_000) in got, "sensitivity failed: exact copy not found"
    print(f"  {len(got)} pairs; boilerplate bucket dropped, exact copy found")


def probe_selection(spark):
    """DSIR scoring economics at 1M → 4M docs: the claim under test is
    that importance_weights / bigram_lm_scores cost is ONE linear scan
    of the corpus per pass (distribution training shuffles only
    num_buckets map-combined partials; scoring carries the bounded
    log-ratio table as an array literal — no join, no exchange). Time
    must scale ~linearly with corpus size and the scoring plan must
    stay exchange-free at both sizes."""
    from matdb_spark.operators import selection

    def synth(ids, tag=""):
        words = [
            F.concat(F.lit(f"{tag}w{j}_"), ((F.col("id") * (j * 2 + 3)) % 997).cast("string"))
            for j in range(12)
        ]
        return ids.select(
            F.col("id").alias("doc_id"), F.concat_ws(" ", *words).alias("text")
        )

    target = synth(spark.range(10_000), tag="t_").localCheckpoint()
    for n_corpus in (1_000_000, 4_000_000):
        corpus = synth(spark.range(n_corpus))
        w = timed(
            f"importance_weights build, {n_corpus} docs (2 dist passes + table)",
            lambda: selection.importance_weights(corpus, target, "doc_id", "text"),
        )
        plan = w._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Join" not in plan, plan
        # force FULL evaluation: a bare count() lets column pruning
        # delete the scoring expressions and times an empty scan
        n, _s = timed(
            f"score {n_corpus} docs (exchange-free scan)",
            lambda: tuple(
                w.agg(
                    F.count(F.lit(1)), F.sum("weight_unats")
                ).collect()[0]
            ),
        )
        assert n == n_corpus
        lm = selection.bigram_lm_scores(corpus, target, "doc_id", "text")
        timed(
            f"bigram_lm_scores {n_corpus} docs",
            lambda: tuple(
                lm.agg(F.count(F.lit(1)), F.sum("logprob_unats")).collect()[0]
            ),
        )
    print("  selection probe done: plans exchange-free, linear scaling above")


def probe_pq(spark):
    """PQ encode linearity at 1M → 4M synthetic 64-dim vectors: the
    claim is that encoding is ONE exchange-free scan (codebook as a
    folded literal; m·k per-block L2s per row) and ADC probing ships
    only code rows. Time must scale ~linearly and the encode plan
    must stay exchange-free at both sizes."""
    from matdb_spark.operators import similarity as S

    def synth(n):
        # deterministic pseudo-embeddings from id arithmetic
        comps = [
            (((F.col("id") * (j * 2 + 3)) % 1997) / 998.5 - 1.0)
            for j in range(64)
        ]
        return spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.array(*comps).alias("embedding"),
        )

    cb = S.pq_codebook_from_sample(synth(10_000), m=8, k=16, sample_mod=31)
    for n in (1_000_000, 4_000_000):
        corpus = synth(n)
        codes = S.pq_encode(corpus, cb)
        plan = codes._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Join" not in plan, plan
        got = timed(
            f"pq_encode {n} x 64-dim (exchange-free scan)",
            lambda: tuple(
                codes.agg(
                    F.count(F.lit(1)),
                    F.sum(F.element_at("codes", 1).cast("long")),
                ).collect()[0]
            ),
        )
        assert got[0] == n
        queries = synth(10)
        top = S.pq_adc_topk(codes, queries, cb, k=5)
        timed(
            f"pq_adc_topk 10 queries vs {n} code rows",
            lambda: top.count(),
        )
    print("  pq probe done: encode exchange-free, linear scaling above")


def probe_ivfpq(spark):
    """The persisted IVF-PQ path at 1M → 4M vectors: index build cost
    (one assignment + residual encode + partitioned write), then the
    two probe modes — ADC ranking and the exact-refine composition —
    with the partition-pruning invariant asserted (a probe must read
    only its nprobe cells' directories, so probe cost tracks the
    PROBED fraction, not the corpus). 64 cells, m=8×k=16 residual
    codes, 10 queries, nprobe=4 (1/16th of the corpus probed)."""
    from matdb_spark.operators import similarity as S
    from matdb_spark.plans.inspect import partition_filters

    def synth(n):
        comps = [
            (((F.col("id") * (j * 2 + 3)) % 1997) / 998.5 - 1.0)
            for j in range(64)
        ]
        return spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.array(*comps).alias("embedding"),
        )

    for n in (1_000_000, 4_000_000):
        corpus = synth(n)
        cents = corpus.filter(F.col("vec_id") % (n // 64) == 0).select(
            F.col("vec_id").alias("cell_id"), "embedding"
        )
        path = os.path.join(SCRATCH, f"probe_ivfpq_{n}")
        shutil.rmtree(path, ignore_errors=True)
        cb = S.pq_codebook_from_residual_sample(
            corpus, cents, m=8, k=16, sample_mod=31
        )
        timed(
            f"ivfpq build {n} x 64-dim (assign + residual encode + write)",
            lambda: S.write_ivfpq_index(corpus, cents, cb, path, residual=True),
        )
        queries = synth(10)
        top = S.ivfpq_topk_indexed(spark, path, queries, k=10, nprobe=4)
        pf = " ".join(partition_filters(top))
        assert "cell_id" in pf, pf  # pruning reaches the scan
        timed(
            f"ivfpq ADC probe 10 queries, nprobe=4/64 cells, {n} rows",
            lambda: top.count(),
        )
        refined = S.ivfpq_topk_refined(
            spark, path, queries, corpus, k=10, nprobe=4, shortlist=100
        )
        timed(
            f"ivfpq refined probe (ADC shortlist 100 + exact re-rank)",
            lambda: refined.count(),
        )
    print("  ivfpq probe done: pruned probes, build linear above")


def probe_bpe(spark):
    """BPE trainer economics at 1M -> 4M docs: the claim is ONE
    corpus-sized pass (word_counts) + vocab-bounded merge iterations.
    Corpus-scan time may grow with rows; the 16-iteration merge loop
    must stay FLAT because it runs over the (bounded) word-count
    relation, never the corpus."""
    import time as _t

    from matdb_spark.operators import bpe

    def synth(n):
        # ~8k-word vocabulary (1997 residues x 4 suffix variants), 12 words/doc
        words = [
            F.concat(
                F.lit("w"),
                ((F.col("id") * (j * 2 + 3)) % 1997).cast("string"),
                F.lit("x" * (j % 4)),
            )
            for j in range(12)
        ]
        return spark.range(n).select(
            F.col("id").alias("doc_id"), F.concat_ws(" ", *words).alias("text")
        )

    for n in (1_000_000, 4_000_000):
        corpus = synth(n)
        wc = timed(
            f"word_counts over {n} docs (the one corpus pass)",
            lambda: bpe.word_counts(corpus, "text").count(),
        )
        t0 = _t.time()
        merges = bpe.train_bpe(corpus, "text", num_merges=16, min_count=1)
        el = _t.time() - t0
        print(
            f"  train_bpe 16 merges, {n} docs                  {el:7.2f} s   "
            f"({el / 16:.2f} s/merge over {wc} vocab words; includes the corpus pass)"
        )
        assert len(merges) == 16
    print("  bpe probe done: merge-loop cost tracks vocab, not corpus")


def probe_bpe_deep(spark, num_merges: int = 1024):
    """r5 verdict item 6: the 16-merge gates leave the 'per-merge cost
    is vocab-bounded and FLAT' claim (bpe.py train_bpe) unproven at
    production merge counts. The sf0.1 documents fixture has a ~31-word
    vocabulary (it saturates after a handful of merges), so this probe
    trains >=1k merges over a synthetic ~24k-word vocabulary (the
    probe_bpe generator with richer suffixes) and reports wall time per
    128-merge window — if any superlinearity hides in the merge loop
    (lineage growth, symbol-relation bloat), the later windows expose
    it."""
    import time as _t

    from matdb_spark.operators import bpe

    sufs = ["", "x", "xy", "xyz", "qu", "quv", "ing", "ed", "er", "tion", "ly", "ness"]
    words = [
        F.concat(
            F.lit("w"),
            ((F.col("id") * (j * 2 + 3)) % 1997).cast("string"),
            F.lit(sufs[j % len(sufs)]),
        )
        for j in range(12)
    ]
    corpus = spark.range(200_000).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", *words).alias("text")
    )
    vocab = timed(
        "word_counts over 200k synthetic docs (one corpus pass)",
        lambda: bpe.word_counts(corpus, "text").count(),
    )
    # re-implement the loop with window timing (same steps as
    # train_bpe — checkpoint every 4th merge, (c DESC, pair ASC) argmax)
    wc = bpe.word_counts(corpus, "text")
    syms = wc.select(
        "cnt", bpe._symbol_string(F.col("w")).alias("s")
    ).localCheckpoint()
    window = 128
    t0 = _t.time()
    times = []
    learned = 0
    for rank in range(num_merges):
        top = (
            bpe._pair_counts(syms)
            .orderBy(F.col("c").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["c"] < 1:
            break
        left, right = top[0]["pair"].split(" ", 1)
        syms = syms.select(
            "cnt", bpe.merge_expr(F.col("s"), left, right).alias("s")
        )
        if rank % 4 == 3:
            syms = syms.localCheckpoint()
        learned += 1
        if learned % window == 0:
            el = _t.time() - t0
            times.append(el)
            print(
                f"  merges {learned - window + 1:4d}-{learned:4d}"
                f"          {el:7.2f} s   ({el / window:.3f} s/merge)"
            )
            t0 = _t.time()
    if len(times) >= 2:
        ratio = times[-1] / times[0]
        print(
            f"  bpe-deep: {learned} merges over {vocab} vocab words; "
            f"last/first window ratio {ratio:.2f} "
            f"({'FLAT' if ratio < 1.5 else 'SUPERLINEAR — investigate'})"
        )


def probe_dsv2(spark):
    """DataSource V2 economics: the Python-source snapshot read and the
    DSv2 writer against the library paths, at 100k and 1M rows. The
    honest framing to validate: DSv2 is the INTEROPERABILITY surface
    (format string, catalog, other languages); the library path is the
    bulk path (JVM scan + max_by). The probe quantifies the gap and
    checks both stay linear-ish."""
    from matdb_spark.sources.dsv2 import register_matdb_source

    register_matdb_source(spark)
    for n in (100_000, 1_000_000):
        path = os.path.join(SCRATCH, f"probe_dsv2_{n}")
        shutil.rmtree(path, ignore_errors=True)
        schema = Schema(
            dimensions=[Dimension("k", max(1, n // 64))],
            values=[Value("v", type="double")],
        )
        Database.create(spark, path, schema)
        df = spark.range(n).select(
            F.col("id").alias("k"), F.col("id").cast("double").alias("v")
        )
        up = spark.range(0, n, 10).select(
            F.col("id").alias("k"), (F.col("id") + 1.5).alias("v")
        )
        timed(f"dsv2 WRITE {n} rows (1 txn)", lambda: df.write.format("matdb").mode("append").save(path))
        timed(f"dsv2 WRITE upsert {n // 10} rows", lambda: up.write.format("matdb").mode("append").save(path))
        db = Database.open(spark, path)
        timed(
            f"library scan {n} rows (JVM max_by)",
            lambda: db.begin().query(ordered=False).count(),
        )
        timed(
            f"dsv2 scan {n} rows (chunk-local Arrow)",
            lambda: spark.read.format("matdb").load(path).count(),
        )
        timed(
            f"dsv2 pruned read (1 of 64 chunks)",
            lambda: spark.read.format("matdb")
            .load(path)
            .filter(F.col("k") < n // 64)
            .count(),
        )
        shutil.rmtree(path, ignore_errors=True)


def probe_spans(spark):
    """Span-dedup economics at 1M → 4M docs: remove_duplicate_spans'
    cost model is linear in corpus WORDS — the occurrence relation is
    ~words rows of (id, pos, hash), duplicated-span detection is one
    groupBy(hash), and the rebuild is one groupBy(id). Every 10th doc
    is a verbatim copy of its predecessor (plant), so duplicated
    spans exist at scale and the removal term is exercised, not
    short-circuited."""
    from matdb_spark.operators.dedup import remove_duplicate_spans

    def synth(n):
        # 16-word docs; id%10==0 copies doc id-1's text verbatim
        base = F.when(
            (F.col("id") % 10 == 0) & (F.col("id") > 0), F.col("id") - 1
        ).otherwise(F.col("id"))
        words = [
            F.concat(
                F.lit(f"w{j}_"), ((base * (j * 2 + 3)) % 9973).cast("string")
            )
            for j in range(16)
        ]
        return spark.range(n).select(
            F.col("id").alias("doc_id"), F.concat_ws(" ", *words).alias("text")
        )

    for n in (1_000_000, 4_000_000):
        out = remove_duplicate_spans(synth(n), "doc_id", "text", n=10)
        total, removed = timed(
            f"span dedup end-to-end, {n} docs x16 words",
            lambda: tuple(
                out.agg(F.count(F.lit(1)), F.sum("n_removed")).collect()[0]
            ),
        )
        assert total == n
        # every planted copy loses all 16 words (its 7 windows cover
        # them); originals keep theirs
        expected = 16 * (n // 10 - (1 if n % 10 == 0 else 0))
        print(f"    removed words {removed} (planted-copy floor {expected})")
        assert removed >= expected
    print("  spans probe done: cost linear in corpus words")


def probe_semdedup(spark):
    """SemDeDup economics: within-cell pair cost is bounded by cell
    OCCUPANCY, so doubling the corpus at constant occupancy (cells
    scaled with n) doubles pair work — the linear-at-fixed-occupancy
    claim of the SemDeDup design. The nearest-centroid assign term is
    n x cells dots (the part production replaces with a blocked
    matmul / ANN assign); it is timed separately here so the pair
    term's linearity is visible on its own."""
    from matdb_spark.operators.similarity import assign_cells, semantic_dedup

    d = 16

    def synth(n, tag):
        comps = [
            ((F.col("id") * (j * 7 + 5)) % 1997 / 998.5 - 1.0).alias(f"c{j}")
            for j in range(d)
        ]
        return spark.range(n).select(
            F.col("id").alias("vec_id"), F.array(*comps).alias("embedding")
        )

    for n, cells in ((125_000, 512), (250_000, 1024)):
        corpus = synth(n, "c")
        cents = corpus.filter(F.col("vec_id") % (n // cells) == 0).select(
            F.col("vec_id").alias("cell_id"), "embedding"
        )
        assigned = assign_cells(corpus, cents)
        timed(
            f"assign {n} vecs x {cells} cells (n*k dots)",
            lambda: assigned.count(),
        )
        out = semantic_dedup(corpus, cents, threshold=0.999)
        total, kept = timed(
            f"semantic_dedup end-to-end, {n} vecs, ~{n // cells}/cell",
            lambda: tuple(
                out.agg(
                    F.count(F.lit(1)), F.sum(F.col("kept").cast("long"))
                ).collect()[0]
            ),
        )
        assert total == n
        print(f"    kept {kept}/{total}")
    print("  semdedup probe done: pair term linear at fixed occupancy")


def probe_lsh_index(spark):
    """Persisted multi-table LSH economics at 1M 16-dim vectors
    (8 tables x 6 planes = 64 buckets/table): build once, then a
    10-query probe must cost its own bucketings + the hashed
    partitions' rows — NOT a corpus re-hash. The live lsh_topk
    re-buckets all 1M vectors per call; the indexed probe reads
    ~|corpus|/64 rows per (query, table) via partition pruning."""
    from matdb_spark.operators.similarity import (
        lsh_topk,
        lsh_topk_indexed,
        write_lsh_index,
    )
    from matdb_spark.plans.inspect import partition_filters

    d, n = 16, 1_000_000
    comps = [
        ((F.col("id") * (j * 7 + 5)) % 1997 / 998.5 - 1.0).alias(f"c{j}")
        for j in range(d)
    ]
    corpus = spark.range(n).select(
        F.col("id").alias("vec_id"), F.array(*comps).alias("embedding")
    )
    path = os.path.join(SCRATCH, "probe_lsh_index")
    shutil.rmtree(path, ignore_errors=True)
    timed(
        f"write_lsh_index {n} vecs (8 tables x 6 planes)",
        lambda: write_lsh_index(
            corpus, path, planes_per_table=6, tables=8, dim=d
        ),
    )
    queries = corpus.filter(F.col("vec_id") < 10)
    out = lsh_topk_indexed(spark, path, queries, k=10)
    pf = " ".join(partition_filters(out))
    assert "table" in pf and "bucket" in pf, pf
    timed("indexed probe, 10 queries", lambda: out.count())
    timed(
        "live lsh_topk (re-hashes the corpus)",
        lambda: lsh_topk(
            corpus, queries, k=10, planes_per_table=6, tables=8, dim=d
        ).count(),
    )
    shutil.rmtree(path, ignore_errors=True)
    print("  lshidx probe done: probe cost tracks hashed partitions, not corpus")


def probe_line_dedup(spark):
    """Line-dedup economics at 1M → 4M pages: dedup_lines' cost model
    is linear in corpus LINES (one explode row per line, one
    groupBy(hash), one anti-join, one per-doc rebuild). Pages carry 4
    lines: a content line unique per doc EXCEPT every 10th page
    (verbatim copy plant), one corpus-wide boilerplate line, one
    per-source-of-1000 footer, one rare banner — so the frequent-line
    relation is small relative to the corpus, as boilerplate is in
    the wild."""
    from matdb_spark.operators.dedup import dedup_lines

    def synth(n):
        base = F.when(
            (F.col("id") % 10 == 0) & (F.col("id") > 0), F.col("id") - 1
        ).otherwise(F.col("id"))
        content = F.concat(
            F.lit("content "), ((base * 37) % 999983).cast("string"),
            F.lit(" words "), ((base * 101) % 999979).cast("string"),
        )
        footer = F.concat(
            F.lit("footer src"), (F.col("id") % 1000).cast("string")
        )
        banner = F.when(F.col("id") % 97 == 0, F.lit("rare banner line"))
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                "\n", content, F.lit("subscribe boilerplate"), footer, banner
            ).alias("page"),
        )

    for n in (1_000_000, 4_000_000):
        out = dedup_lines(synth(n), "doc_id", "page")
        total, removed = timed(
            f"line dedup end-to-end, {n} pages x~4 lines",
            lambda: tuple(
                out.agg(F.count(F.lit(1)), F.sum("n_removed")).collect()[0]
            ),
        )
        assert total == n
        # boilerplate + footer lines are frequent in every page: >= 2n
        assert removed >= 2 * n, removed
    print("  linededup probe done: cost linear in corpus lines")


def probe_sq8(spark):
    """Trained-SQ8 economics at 1M → 4M 64-dim vectors: training is
    one aggregation returning 64 rows (corpus-size-independent result,
    linear pass), encode+search is the brute-force broadcast shape on
    decoded vectors. Also sanity-checks recall: the 10-query SQ8
    top-10 must agree with exact cosine on >= 90% of hits at 1M."""
    from matdb_spark.operators.quantization import sq8_topk, sq8_train
    from matdb_spark.operators.similarity import cosine_topk

    d = 64

    def synth(n):
        comps = [
            ((F.col("id") * (j * 13 + 7)) % 1999 / 999.5 - 1.0).alias(f"c{j}")
            for j in range(d)
        ]
        return spark.range(n).select(
            F.col("id").alias("vec_id"), F.array(*comps).alias("embedding")
        )

    for n in (1_000_000, 4_000_000):
        corpus = synth(n)
        ranges = timed(
            f"sq8_train {n} x {d}-dim (64-row result)",
            lambda: sq8_train(corpus),
        ) or []
        assert len(ranges) == d
        queries = corpus.filter(F.col("vec_id") < 10)
        timed(
            f"sq8_topk 10 queries over {n}",
            lambda: sq8_topk(corpus, queries, ranges, k=10).count(),
        )
        if n == 1_000_000:
            exact = cosine_topk(corpus, queries, k=10).select(
                "query_id", "neighbor_id"
            )
            approx = sq8_topk(corpus, queries, ranges, k=10).select(
                "query_id", "neighbor_id"
            )
            hits = exact.join(approx, ["query_id", "neighbor_id"]).count()
            print(f"    recall@10 vs exact at 1M: {hits / 100:.2f}")
            assert hits >= 90, hits
    print("  sq8 probe done: train result dim-bounded, search linear")


def probe_sq8_index(spark):
    """Codes-only IVF-SQ8 index economics at 1M 64-dim vectors,
    64 cells: a 10-query probe must cost its probed partitions, not
    the corpus (pruning asserted in-plan), and the on-disk index must
    measure ~4x smaller than the float IVF index — the IO claim."""
    import glob

    from matdb_spark.operators.quantization import (
        ivf_sq8_topk_indexed,
        write_ivf_sq8_index,
    )
    from matdb_spark.operators.similarity import write_ivf_index
    from matdb_spark.plans.inspect import partition_filters

    d, n = 64, 1_000_000
    # high-entropy components (sin of a per-dim lattice): a modular
    # lattice has ~2k distinct values per dim and parquet dictionary +
    # zstd crush the float side, understating the byte ratio real
    # embeddings show
    comps = [
        F.sin(F.col("id") * F.lit(float(j) * 13.37 + 7.7)).alias(f"c{j}")
        for j in range(d)
    ]
    corpus = spark.range(n).select(
        F.col("id").alias("vec_id"), F.array(*comps).alias("embedding")
    )
    cents = corpus.filter(F.col("vec_id") % 15625 == 0)  # 64 centroids
    cents = cents.select(F.col("vec_id").alias("cell_id"), "embedding")

    def _bytes(p):
        return sum(
            os.path.getsize(f)
            for f in glob.glob(os.path.join(p, "cell_id=*", "*.parquet"))
        )

    sq8_path = os.path.join(SCRATCH, "probe_sq8_index")
    flt_path = os.path.join(SCRATCH, "probe_sq8_float_twin")
    shutil.rmtree(sq8_path, ignore_errors=True)
    shutil.rmtree(flt_path, ignore_errors=True)
    timed(
        f"write_ivf_sq8_index {n} x {d} (64 cells)",
        lambda: write_ivf_sq8_index(corpus, cents, sq8_path) and None,
    )
    timed(
        "write_ivf_index float twin",
        lambda: write_ivf_index(corpus, cents, flt_path),
    )
    b_sq8, b_flt = _bytes(sq8_path), _bytes(flt_path)
    print(f"    index bytes: sq8 {b_sq8/1e6:.1f} MB vs float {b_flt/1e6:.1f} MB"
          f" -> {b_flt/b_sq8:.1f}x smaller")
    assert b_flt / b_sq8 > 2.5, (b_sq8, b_flt)

    queries = corpus.filter(F.col("vec_id") < 10)
    out = ivf_sq8_topk_indexed(spark, sq8_path, queries, k=10, nprobe=2)
    pf = " ".join(partition_filters(out))
    assert "cell_id" in pf, pf
    got = timed(
        "indexed probe, 10 queries (<= 20/64 cells)", lambda: out.count()
    )
    # vec_id 0 is the all-zero sin vector: the zero-norm guard drops
    # it (NULL unit), so 9 queries x 10 results
    assert got == 90, got
    shutil.rmtree(sq8_path, ignore_errors=True)
    shutil.rmtree(flt_path, ignore_errors=True)
    print("  sq8idx probe done: pruned probe, 7.9x smaller index bytes")


def probe_scrub(spark):
    """PII scrub + split assignment at 4M docs: both are zero-shuffle
    projections, so throughput tracks scan bandwidth — the probe
    asserts the 4x corpus costs ~4x (no superlinear term hiding in
    regex evaluation or the md5 split hash)."""
    from matdb_spark.functions.pii import redact_pii
    from matdb_spark.operators.sampling import assign_splits

    def synth(n):
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("doc body text with mail user"),
                F.col("id").cast("string"),
                F.lit("@example.com and host 10.1.2."),
                (F.col("id") % 250 + 1).cast("string"),
                F.lit(" plus call 555-"),
                (F.col("id") % 900 + 100).cast("string"),
                F.lit("-"),
                (F.col("id") % 9000 + 1000).cast("string"),
            ).alias("text"),
        )

    times = {}
    for n in (1_000_000, 4_000_000):
        docs = synth(n)
        t0 = time.time()
        red = redact_pii(docs, "doc_id", "text").agg(
            F.sum("n_redacted")
        ).collect()[0][0]
        times[n] = time.time() - t0
        print(f"  redact_pii {n} docs: {times[n]:7.2f} s, {red} redactions")
        assert red == 3 * n, red
        split = assign_splits(docs, "doc_id")
        counts = {
            r["split"]: r["n"]
            for r in split.groupBy("split")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert counts["train"] > 0.97 * n
    ratio = times[4_000_000] / times[1_000_000]
    print(f"  scrub probe done: 4x corpus cost ratio {ratio:.2f} (linear ~4)")


def probe_mvcc_skew(spark, total: int = 4_000_000, hot_frac: float = 0.10):
    """Adversarial version-skew probe for THE one shuffle in the MVCC
    snapshot scan (r6 verdict item 5): a store where ONE dim tuple
    holds ``hot_frac`` of all rows (the same key re-upserted hundreds
    of thousands of times — a pathological hot sensor). The dedup
    aggregation groups on the full dim tuple, so a naive engine would
    funnel 10% of the table through one reducer; here the max_by
    aggregation's MAP-SIDE PARTIAL step collapses the hot key to one
    candidate row per map task before the exchange, so the shuffle
    carries ~#tasks rows for the hot key regardless of its multiplicity
    (AQE remains as the backstop for residual reducer imbalance). The
    probe measures the skewed scan against a UNIFORM store of the same
    row count and asserts the plan shape (two-phase HashAggregate)."""
    from matdb_spark.plans.inspect import physical_plan

    n_hot = int(total * hot_frac)
    n_uni = total - n_hot

    def build(path, skewed):
        shutil.rmtree(path, ignore_errors=True)
        db = Database.create(spark, path, Schema(
            dimensions=[Dimension("k1", 50_000), Dimension("k2", 50_000)],
            values=[Value("v")],
        ))
        uni = spark.range(n_uni if skewed else total).select(
            (F.col("id") % 1_000_000).alias("k1"),
            (F.col("id") / 1_000_000).cast("long").alias("k2"),
            F.col("id").alias("v"),
        )
        txn = db.begin()
        txn.add_dataframe(uni)
        txn.commit()
        if skewed:
            hot = spark.range(n_hot).select(
                F.lit(0).cast("long").alias("k1"),
                F.lit(0).cast("long").alias("k2"),
                F.col("id").alias("v"),
            )
            t2 = db.begin()
            t2.add_dataframe(hot)
            t2.commit()
        return db

    print(f"mvcc skew probe: {total} rows, hot key holds {n_hot}")
    uni_db = build(os.path.join(SCRATCH, "probe_skew_uniform"), skewed=False)
    skw_db = build(os.path.join(SCRATCH, "probe_skew_hot"), skewed=True)
    t_uni = timed("scan uniform (count)", lambda: uni_db.begin().query().count())
    t_skw_rows = timed("scan skewed (count)", lambda: skw_db.begin().query().count())
    # correctness: the hot key resolves to exactly ONE row (newest wins)
    hot_rows = (
        skw_db.begin()
        .query()
        .filter((F.col("k1") == 0) & (F.col("k2") == 0))
        .collect()
    )
    assert len(hot_rows) == 1 and hot_rows[0]["v"] == n_hot - 1, hot_rows
    plan = physical_plan(skw_db.begin().query())
    # two-phase aggregation: a partial HashAggregate BELOW the exchange
    import re as _re

    n_hashagg = len(_re.findall(r"\(\d+\) HashAggregate", plan))
    assert n_hashagg >= 2, f"expected partial+final HashAggregate:\n{plan[:800]}"
    print(f"  plan: {n_hashagg} HashAggregate stages (partial absorbs the hot key)")
    import time as _t

    t0 = _t.time()
    n_u = uni_db.begin().query().count()
    du = _t.time() - t0
    t0 = _t.time()
    n_s = skw_db.begin().query().count()
    ds = _t.time() - t0
    print(f"  steady: uniform {du:.2f}s ({n_u} rows)  skewed {ds:.2f}s ({n_s} rows)"
          f"  degradation x{ds / du:.2f}")


def _timed_s(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"  {label:44s} {dt:7.2f} s   {out if out is not None else ''}")
    return dt


def probe_dml(spark, total: int = 4_000_000, batch: int = 100_000):
    """SQL DML statement economics at volume (round 8, SCALE.md §15):
    a 4M-row store, then each read-modify-write statement with a
    100k-row source/predicate. The claims under test: (1) MERGE's cost
    is ONE snapshot scan + a broadcast-sized join + a batch-sized
    write — i.e. wall ≈ the plain scan's wall, not a multiple of it;
    (2) UPDATE/DELETE with a selective predicate cost scan + matched-
    size write; (3) INSERT OVERWRITE ≈ scan + full rewrite (the
    ceiling); (4) RESTORE ≈ two scans (exceptAll) + bounded write.
    Invariants are checked after every statement (newest-wins effects,
    exact row counts) so the timings can't pass on wrong answers."""
    from matdb_spark import ddl

    loc = os.path.join(SCRATCH, "probe_dml_store")
    shutil.rmtree(loc, ignore_errors=True)
    print(f"dml probe: {total} rows, statement batch {batch}")
    t_ctas = _timed_s("CTAS 4M rows", lambda: ddl.sql(
        spark,
        f"CREATE TABLE probe_dml USING matdb LOCATION '{loc}'"
        " TBLPROPERTIES ('chunks' = 'k=1000000')"
        f" AS SELECT id AS k, id AS v, CAST(id % 97 AS STRING) AS s"
        f" FROM range({total})",
    ).count())
    _timed_s("snapshot count (column-pruned)", lambda: ddl.sql(
        spark, "SELECT * FROM probe_dml").count())
    t_scan = _timed_s("full-row snapshot scan (noop sink)", lambda: ddl.sql(
        spark, "SELECT * FROM probe_dml"
    ).write.format("noop").mode("overwrite").save())

    # MERGE: batch/2 updates (even keys), batch/4 deletes (odd keys —
    # disjoint from the updates by parity), batch/4 inserts (new keys)
    upd, dele, ins = batch // 2, batch // 4, batch // 4
    spark.sql(
        f"SELECT id * 2 AS k, -1 AS nv, 'u' AS act FROM range({upd})"
        f" UNION ALL SELECT id * 2 + 1, -1, 'd' FROM range({dele})"
        f" UNION ALL SELECT id + {total}, id, 'i' FROM range({ins})"
    ).createOrReplaceTempView("probe_dml_src")
    t_merge = _timed_s(f"MERGE ({batch}-row source)", lambda: ddl.sql(spark, """
        MERGE INTO probe_dml t USING probe_dml_src m ON t.k = m.k
        WHEN MATCHED AND m.act = 'd' THEN DELETE
        WHEN MATCHED THEN UPDATE SET v = -t.v
        WHEN NOT MATCHED THEN INSERT (k, v, s) VALUES (m.k, m.nv, 'new')
    """).count())
    n = ddl.sql(spark, "SELECT COUNT(*) AS n FROM probe_dml").first()["n"]
    assert n == total - dele + ins, (n, total, dele, ins)
    neg = ddl.sql(
        spark, "SELECT COUNT(*) AS n FROM probe_dml WHERE v < 0"
    ).first()["n"]
    print(f"  post-merge rows {n}, negated {neg}")

    t_upd = _timed_s(f"UPDATE (~{batch} matched)", lambda: ddl.sql(
        spark, f"UPDATE probe_dml SET v = v + 1 WHERE k % {total // batch} = 2"
    ).count())
    t_del = _timed_s(f"DELETE (~{batch} matched)", lambda: ddl.sql(
        spark, f"DELETE FROM probe_dml WHERE k % {total // batch} = 3"
    ).count())
    t_restore = _timed_s("RESTORE to pre-merge", lambda: ddl.sql(
        spark, "RESTORE TABLE probe_dml TO VERSION AS OF 1").count())
    n = ddl.sql(spark, "SELECT COUNT(*) AS n FROM probe_dml").first()["n"]
    assert n == total, n
    t_ow = _timed_s("INSERT OVERWRITE (full rewrite)", lambda: ddl.sql(
        spark,
        f"INSERT OVERWRITE probe_dml SELECT id AS k, id AS v,"
        f" 'x' AS s FROM range({total})",
    ).count())
    print(
        f"  ratios vs plain scan: merge x{t_merge / t_scan:.2f},"
        f" update x{t_upd / t_scan:.2f}, delete x{t_del / t_scan:.2f},"
        f" restore x{t_restore / t_scan:.2f}, overwrite x{t_ow / t_scan:.2f}"
    )
    ddl.sql(spark, "DROP TABLE probe_dml")
    shutil.rmtree(loc, ignore_errors=True)


def probe_merge_shuffle(spark, total: int = 4_000_000, src_rows: int = 4_000_000):
    """The NON-broadcast MERGE path (r8 verdict item 5): §15.2's dml
    probe measured a 100k source that AQE broadcasts; here the source
    is 4M parquet-backed rows (~78 MB of key+payload — over the
    session's deliberately-raised 64 MB autoBroadcastJoinThreshold,
    session.py:49 — and incompressible, so file-backed size estimates
    cannot shrink it under the bar), so the matched-leg
    target⋈source pair relation must plan as a SHUFFLE equi-join. The
    plan fact is inspected in-probe on the exact join shape MERGE
    builds (post-AQE executed plan: no BroadcastHashJoin, a
    SortMergeJoin/ShuffledHashJoin present), then the full statement
    runs with invariants so the wall time can't pass on a wrong
    answer. Claim under test: the shuffle MERGE costs one snapshot
    scan + one shuffle of (target-matched + source) + the write — an
    equi-join like any other, no new scale regime."""
    from matdb_spark import ddl

    loc = os.path.join(SCRATCH, "probe_mshuf_store")
    shutil.rmtree(loc, ignore_errors=True)
    print(f"merge-shuffle probe: {total}-row target, {src_rows}-row source")
    _timed_s("CTAS 4M rows", lambda: ddl.sql(
        spark,
        f"CREATE TABLE probe_mshuf USING matdb LOCATION '{loc}'"
        " TBLPROPERTIES ('chunks' = 'k=1000000')"
        f" AS SELECT id AS k, id AS v, CAST(id % 97 AS STRING) AS s"
        f" FROM range({total})",
    ).count())
    t_scan = _timed_s("full-row snapshot scan (noop sink)", lambda: ddl.sql(
        spark, "SELECT * FROM probe_mshuf"
    ).write.format("noop").mode("overwrite").save())

    # half updates (even keys, distinct), half inserts (new keys,
    # distinct) — satisfies both legs' determinism guards. The source
    # is MATERIALIZED to parquet and read back: a synthetic range()
    # source carries tiny size estimates and AQE broadcasts it no
    # matter how many rows it has — a real ingest source arrives with
    # file-backed stats, which is the case under test.
    upd, ins = src_rows // 2, src_rows // 2
    src_path = os.path.join(SCRATCH, "probe_mshuf_src")
    shutil.rmtree(src_path, ignore_errors=True)
    spark.sql(
        f"SELECT id * 2 AS k, -1 AS nv, md5(CAST(id AS STRING)) AS pad"
        f" FROM range({upd})"
        f" UNION ALL SELECT id + {total}, id, md5(CAST(-id AS STRING))"
        f" FROM range({ins})"
    ).write.parquet(src_path)
    spark.read.parquet(src_path).createOrReplaceTempView("probe_mshuf_src")

    # plan fact FIRST: the same equi-join shape MERGE's matched leg
    # builds, executed through ITS OWN query execution (collect on the
    # 1-row aggregate) so the AQE-FINAL plan is the one inspected
    # aggregates touch every joined column so Catalyst cannot prune
    # the pair relation down to a broadcastable sliver — this is the
    # width MERGE's matched leg actually carries
    j = spark.sql(
        "SELECT COUNT(*) AS n, SUM(nv) AS s, SUM(v) AS sv,"
        " MIN(pad) AS mp, MAX(st) AS ms FROM ("
        " SELECT t.k, t.v, t.s AS st, m.nv, m.pad FROM probe_mshuf t"
        " JOIN probe_mshuf_src m ON t.k = m.k)"
    )
    n_pairs = j.collect()[0]["n"]
    assert n_pairs == upd, n_pairs
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan, plan[:300]
    assert "BroadcastHashJoin" not in plan, plan[:2000]
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan[:2000]
    kind = "SortMergeJoin" if "SortMergeJoin" in plan else "ShuffledHashJoin"
    print(f"  plan fact: matched-leg join is {kind} (no broadcast, AQE-final)")

    t_merge = _timed_s(f"MERGE ({src_rows}-row source, shuffle path)",
                       lambda: ddl.sql(spark, """
        MERGE INTO probe_mshuf t USING probe_mshuf_src m ON t.k = m.k
        WHEN MATCHED THEN UPDATE SET v = -t.v
        WHEN NOT MATCHED THEN INSERT (k, v, s) VALUES (m.k, m.nv, 'new')
    """).count())
    n = ddl.sql(spark, "SELECT COUNT(*) AS n FROM probe_mshuf").first()["n"]
    assert n == total + ins, (n, total, ins)
    neg = ddl.sql(
        spark, "SELECT COUNT(*) AS n FROM probe_mshuf WHERE v < 0"
    ).first()["n"]
    assert neg == upd - 1, neg  # -0 is not negative: key 0 updates to 0
    print(
        f"  post-merge rows {n}, negated {neg};"
        f" merge x{t_merge / t_scan:.2f} of plain scan"
    )
    ddl.sql(spark, "DROP TABLE probe_mshuf")
    shutil.rmtree(loc, ignore_errors=True)
    shutil.rmtree(src_path, ignore_errors=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "volume"
    spark = get_spark(app_name=f"scale_probe_{which}")
    if which == "volume":
        probe_volume(spark)
    elif which == "volume1024":
        # the deep-volume tier: ~102M rows through the same path
        probe_volume(spark, reps=1024)
    elif which == "manytxn":
        probe_manytxn(spark)
    elif which == "tiered":
        probe_tiered(spark)
    elif which == "leveledstream":
        probe_leveled_stream(spark)
    elif which == "stream":
        probe_stream(spark)
    elif which == "lshskew":
        probe_lsh_skew(spark)
    elif which == "ccdeep":
        probe_cc_deep(spark)
    elif which == "autocompact":
        probe_auto_compact(spark)
    elif which == "incdex":
        probe_incremental_index(spark)
    elif which == "selection":
        probe_selection(spark)
    elif which == "pq":
        probe_pq(spark)
    elif which == "ivfpq":
        probe_ivfpq(spark)
    elif which == "bpe":
        probe_bpe(spark)
    elif which == "bpedeep":
        probe_bpe_deep(spark)
    elif which == "dsv2":
        probe_dsv2(spark)
    elif which == "spans":
        probe_spans(spark)
    elif which == "semdedup":
        probe_semdedup(spark)
    elif which == "lshidx":
        probe_lsh_index(spark)
    elif which == "linededup":
        probe_line_dedup(spark)
    elif which == "mvccskew":
        probe_mvcc_skew(spark)
    elif which == "sq8":
        probe_sq8(spark)
    elif which == "scrub":
        probe_scrub(spark)
    elif which == "sq8idx":
        probe_sq8_index(spark)
    elif which == "dml":
        probe_dml(spark)
    elif which == "mergeshuffle":
        probe_merge_shuffle(spark)
    else:
        raise SystemExit(f"unknown probe {which!r}")
