"""Regression tests for the round-2 ADVICE.md findings.

- missing_feed_content must stop at a rollup whose covered interval
  (version_rank) lies entirely at-or-below the consumer's cursor:
  folding cold history + vacuum must NOT kill a fully-caught-up CDC
  consumer (the rollup's PHYSICAL id is far above the effective
  versions it covers).
- Two overlapping in-flight compactions must not both publish: the
  reservation intent makes the later one abort, and vacuum holds back
  window files an in-flight rewrite is still scanning.
"""

import os

import pytest
from pyspark.sql import functions as F

from matdb_spark import Database, Dimension, Schema, Value
from matdb_spark import manifest


def _mk_db(spark, path, n_txns: int) -> Database:
    schema = Schema(dimensions=[Dimension("k")], values=[Value("v")])
    db = Database.create(spark, path, schema)
    for i in range(n_txns):
        with db.begin() as txn:
            txn.add_row([i % 4, i])
            txn.commit()
    return db


def test_feed_survives_cold_fold_and_vacuum(spark, tmp_db_path):
    """ADVICE r2 (high): 12 commits, consumer caught up at cursor=12;
    fold the two oldest txns twice (rollup chain whose physical ids
    are 13 and 14 but which covers effective versions 1..3 only), then
    vacuum. changes(since=12) must stay readable — before the fix the
    walk reported vacuumed child 13 because its physical id > 12."""
    db = _mk_db(spark, os.path.join(tmp_db_path, "coldfold"), 12)
    head = max(manifest.committed_txn_ids(db.path))
    assert head == 12
    # Caught-up consumer: empty but readable window at the head.
    assert db.changes(since=head).count() == 0

    c1 = db.compact(max_txns=2, fold="oldest")  # covers effs 1..2
    c2 = db.compact(max_txns=2, fold="oldest")  # folds rollup + txn 3
    assert c1 is not None and c2 is not None
    mf = manifest.read_manifest_cached(db.path, c2)
    assert int(mf["version_rank"]) == 3 and int(mf["covers_lo"]) == 1
    db.vacuum()

    # The folded interval tops out at eff 3 <= cursor 12: nothing the
    # consumer needs is gone. Must not raise, must stay empty.
    assert db.changes(since=head).count() == 0
    # New commits after the fold flow through the same cursor.
    with db.begin() as txn:
        txn.add_row([99, 99])
        txn.commit()
    feed = db.changes(since=head)
    assert feed.count() == 1 and feed.first()["k"] == 99

    # But a cursor BELOW the folded interval genuinely lost content
    # and must still fail loudly.
    with pytest.raises(ValueError, match="unreadable"):
        db.changes(since=1, until=head).count()


def test_concurrent_compaction_intent_aborts_later_one(spark, tmp_db_path):
    """ADVICE r2 (low): a pending reservation carrying an overlapping
    compact intent (lower id = first mover) must abort a second
    compaction pre-publish; after the first releases, compaction
    proceeds."""
    db = _mk_db(spark, os.path.join(tmp_db_path, "ccomp"), 4)
    # Simulate an in-flight first compaction: reserve the next id and
    # declare it covers effs 1..4 (what a full fold would pin).
    rid = manifest.reserve_txn_id(db.path, db.next_txn_id)
    manifest.write_reservation_intent(
        db.path, rid, {"op": "compact", "lo": 1, "rank": 4}
    )
    try:
        assert db.compact() is None, (
            "second compaction published despite an overlapping "
            "in-flight compact intent"
        )
        # Disjoint interval must NOT conflict: a pending fold of a
        # window far above ours is invisible to this one.
        manifest.write_reservation_intent(
            db.path, rid, {"op": "compact", "lo": 100, "rank": 200}
        )
        cid = db.compact()
        assert cid is not None
    finally:
        manifest.release_txn_reservation(db.path, rid)


def test_vacuum_holds_files_under_pending_compact_intent(spark, tmp_db_path):
    """Vacuum must not delete superseded window files while a pending
    compact intent covers their effective versions (the in-flight
    rewrite is still scanning them); the hold lapses with the
    reservation."""
    db = _mk_db(spark, os.path.join(tmp_db_path, "vhold"), 4)
    cid = db.compact()  # supersedes txns 1..4
    assert cid is not None
    rid = manifest.reserve_txn_id(db.path, db.next_txn_id)
    manifest.write_reservation_intent(
        db.path, rid, {"op": "compact", "lo": 1, "rank": 4}
    )
    assert db.vacuum() == [], "vacuum deleted files under an active hold"
    assert os.path.isdir(manifest.txn_data_dir(db.path, 1))
    manifest.release_txn_reservation(db.path, rid)
    assert set(db.vacuum()) == {1, 2, 3, 4}
    assert db.snapshot().count() == 4  # 4 distinct keys, newest wins


def test_auto_compact_policy_levels_and_preserves_content(spark, tmp_db_path):
    """VERDICT r2 #8: batch stores get a txn-count compaction policy.
    16 commits at every=4/major_every=4 must fold tier-1 windows at
    4/8/12/16 and the tier-2 rollup-of-rollups at 16, keeping the
    visible txn count bounded while the scan stays correct."""
    schema = Schema(dimensions=[Dimension("k")], values=[Value("v")])
    db = Database.create(spark, os.path.join(tmp_db_path, "autocompact"), schema)
    db.enable_auto_compact(every=4, major_every=4)
    for i in range(16):
        with db.begin() as t:
            t.add_row([i, i * 10])
            t.commit()
    visible = manifest.visible_txn_ids(db.path, db.next_txn_id)
    # 16 commits -> 4 tier-1 rollups -> 1 tier-2 rollup at commit 16
    assert len(visible) == 1, sorted(visible)
    rows = {r["k"]: r["v"] for r in db.snapshot().collect()}
    assert rows == {i: i * 10 for i in range(16)}
    # the surviving rollup anchors at the full covered interval:
    # covers_lo reaches the first commit, version_rank the last PLAIN
    # commit (id 19 — rollup ids 5/10/15/20 interleave with the 16
    # plain commits)
    (top,) = visible
    mf = manifest.read_manifest_cached(db.path, top)
    assert int(mf["version_rank"]) == 19 and int(mf["covers_lo"]) == 1

    # disable stops the schedule
    db.disable_auto_compact()
    with db.begin() as t:
        t.add_row([99, 990])
        t.commit()
    assert len(manifest.visible_txn_ids(db.path, db.next_txn_id)) == 2


def test_connected_components_distributed_long_chain(spark):
    """VERDICT r2 #4: the distributed label-propagation path, driven
    in anger on a long-diameter component. driver_threshold=0 forces
    the distributed loop; a 4000-edge chain (diameter 4000) must
    converge within max_iter=24 — only possible with pointer doubling
    (plain min-propagation needs 4000 rounds)."""
    from matdb_spark.operators.dedup import connected_components

    n = 4001
    edges = spark.range(n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    out = connected_components(edges, max_iter=24, driver_threshold=0)
    stats = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("cluster_id").alias("nc"),
        F.max("cluster_id").alias("mx"),
    ).first()
    assert (stats["n"], stats["nc"], stats["mx"]) == (n, 1, 0)

    # two components + an isolated pair: labels stay per-component
    multi = edges.filter(F.col("id_a") < 5).unionByName(
        spark.createDataFrame([(100, 101), (101, 102)], "id_a long, id_b long")
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(multi, max_iter=24, driver_threshold=0).collect()
    }
    assert {k: v for k, v in got.items() if k >= 100} == {100: 100, 101: 100, 102: 100}
    assert all(v == 0 for k, v in got.items() if k < 100)


def test_pack_documents_stream_semantics(spark):
    """Sequence packing: per-shard prefix sums, budget chunking, and
    determinism. One shard (n_shards=1) makes the stream order fully
    checkable: start offsets are the exact prefix sums in (hash, id)
    order, pack_id = start // budget, and a doc straddling a boundary
    starts in the earlier pack."""
    from matdb_spark.operators.packing import pack_documents, pack_manifest

    docs = spark.createDataFrame(
        [(i, 100 + i) for i in range(20)], "doc_id long, toks long"
    )
    out = pack_documents(docs, "doc_id", "toks", budget=256, n_shards=1)
    rows = sorted(out.collect(), key=lambda r: r["start_tok"])
    # prefix-sum invariant: each start = previous start + previous toks
    for prev, cur in zip(rows, rows[1:]):
        assert cur["start_tok"] == prev["start_tok"] + prev["toks"]
    assert rows[0]["start_tok"] == 0
    for r in rows:
        assert r["pack_id"] == r["start_tok"] // 256
        assert r["pack_pos"] == r["start_tok"] % 256
    # deterministic across evaluations
    again = sorted(
        pack_documents(docs, "doc_id", "toks", budget=256, n_shards=1).collect(),
        key=lambda r: r["start_tok"],
    )
    assert [r["doc_id"] for r in again] == [r["doc_id"] for r in rows]

    # sharded: offsets restart per shard, packs never cross shards
    sharded = pack_documents(docs, "doc_id", "toks", budget=256, n_shards=4)
    per_shard = {}
    for r in sharded.collect():
        per_shard.setdefault(r["shard"], []).append(r)
    assert len(per_shard) > 1
    for rs in per_shard.values():
        rs.sort(key=lambda r: r["start_tok"])
        assert rs[0]["start_tok"] == 0
        for prev, cur in zip(rs, rs[1:]):
            assert cur["start_tok"] == prev["start_tok"] + prev["toks"]

    man = pack_manifest(sharded, "toks")
    m = man.collect()
    assert sum(r["n_docs"] for r in m) == 20
    assert sum(r["tok_mass"] for r in m) == sum(100 + i for i in range(20))
