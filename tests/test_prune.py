"""Manifest-log retention (r7 verdict item 3): prune_manifest_log
bounds ``_commits/`` growth by deleting per-txn JSONs already folded
into the newest checkpoint, making the checkpoint load-bearing for
EXACTLY the flagged (pruned) entries — the one deliberate exception to
listing-is-truth.

Invariants held here:
- pruning never changes the committed set, snapshot resolution, scan
  results, history, or the change feed;
- a pruned commit's data dirs survive recover() (they are committed,
  not debris);
- the age grace gates pruning (fresh manifests stay);
- vacuum of a pruned (superseded) txn removes it from checkpoint truth
  together with its data — never resurrects it;
- a late LOWER-id commit (reserved before a prune, published after) is
  never touched and stays visible;
- folds carry pruned entries forward; generation-suffixed names stay
  write-once.
"""

from __future__ import annotations

import os

from matdb_spark import Database, Dimension, Schema, Value, manifest


def _mkstore(tmp_path) -> str:
    p = str(tmp_path / "db")
    manifest.init_layout(p)
    return p


def _publish(p, t, **kw):
    os.makedirs(manifest.txn_data_dir(p, t), exist_ok=True)
    manifest.publish(p, t, segment_count=1, **kw)


def _cold():
    manifest.read_manifest_cached.cache_clear()
    manifest._read_checkpoint_cached.cache_clear()


def test_prune_preserves_committed_set_and_payloads(tmp_path):
    p = _mkstore(tmp_path)
    for t in (1, 2, 3):
        _publish(p, t, extra={"files": [f"f{t}.parquet"], "stats": {"k": [t, t]}})
    assert manifest.write_checkpoint(p) == 3
    _publish(p, 4)  # post-checkpoint tail: NOT pruned
    pruned = manifest.prune_manifest_log(p, grace_seconds=0.0)
    assert pruned == [1, 2, 3]
    for t in (1, 2, 3):
        assert not os.path.exists(manifest.manifest_path(p, t))
    assert os.path.exists(manifest.manifest_path(p, 4))
    _cold()
    assert manifest.committed_txn_ids(p) == [1, 2, 3, 4]
    assert manifest.visible_txn_ids(p, horizon=10) == [1, 2, 3, 4]
    # payloads come back whole from the checkpoint
    m2 = manifest.read_manifest_cached(p, 2)
    assert m2["files"] == ["f2.parquet"]
    assert m2["stats"] == {"k": [2, 2]}


def test_prune_respects_grace(tmp_path):
    p = _mkstore(tmp_path)
    for t in (1, 2):
        _publish(p, t)
    manifest.write_checkpoint(p)
    # everything is seconds old: a 1-hour grace prunes nothing
    assert manifest.prune_manifest_log(p, grace_seconds=3600.0) == []
    assert os.path.exists(manifest.manifest_path(p, 1))


def test_recover_keeps_pruned_txn_data(tmp_path):
    p = _mkstore(tmp_path)
    for t in (1, 2):
        _publish(p, t)
    manifest.write_checkpoint(p)
    manifest.prune_manifest_log(p, grace_seconds=0.0)
    _cold()
    # grace=0 sweeps ALL debris — pruned txns' data must not be debris
    nxt = manifest.recover(p, grace_seconds=0.0)
    assert nxt == 3
    assert os.path.isdir(manifest.txn_data_dir(p, 1))
    assert os.path.isdir(manifest.txn_data_dir(p, 2))


def test_stale_reader_falls_back_to_flagged_checkpoint(tmp_path):
    """A reader that listed BEFORE the prune (hint at the old
    checkpoint, per-txn JSON since unlinked) must recover the payload
    from the pruner's checkpoint, not raise."""
    p = _mkstore(tmp_path)
    for t in (1, 2, 3):
        _publish(p, t, extra={"files": [f"f{t}.parquet"]})
    manifest.write_checkpoint(p)
    _cold()
    manifest.committed_txn_ids(p)  # reader's listing: hint = (3, 0)
    hint_before = manifest._CK_HINT[p]
    manifest.prune_manifest_log(p, grace_seconds=0.0)
    # restore the reader's stale view of the world
    manifest._CK_HINT[p] = hint_before
    manifest._read_checkpoint_cached.cache_clear()
    os.unlink(manifest.checkpoint_path(p, *hint_before))  # GC won race
    manifest.read_manifest_cached.cache_clear()
    m1 = manifest.read_manifest_cached(p, 1)
    assert m1["files"] == ["f1.parquet"]


def test_late_lower_id_commit_survives_prune(tmp_path):
    """A txn id reserved before the prune but published after: its
    manifest is younger than any fold, so prune never touches it and
    it surfaces normally."""
    p = _mkstore(tmp_path)
    low = manifest.reserve_txn_id(p, start=1)
    for t in (low + 1, low + 2):
        _publish(p, t)
    manifest.write_checkpoint(p)
    manifest.prune_manifest_log(p, grace_seconds=0.0)
    _publish(p, low)  # late publish of the LOWER id
    manifest.release_txn_reservation(p, low)
    _cold()
    assert manifest.committed_txn_ids(p) == [low, low + 1, low + 2]
    assert manifest.visible_txn_ids(p, horizon=10) == [low, low + 1, low + 2]


def test_fold_carries_pruned_entries_forward(tmp_path):
    p = _mkstore(tmp_path)
    for t in (1, 2):
        _publish(p, t, extra={"files": [f"f{t}.parquet"]})
    manifest.write_checkpoint(p)
    manifest.prune_manifest_log(p, grace_seconds=0.0)
    for t in (3, 4):
        _publish(p, t)
    assert manifest.write_checkpoint(p) == 4  # new fold, new top
    _cold()
    assert manifest.committed_txn_ids(p) == [1, 2, 3, 4]
    assert manifest.read_manifest_cached(p, 1)["files"] == ["f1.parquet"]
    # a second prune folds 3 and 4 away too; 1 and 2 stay pruned
    assert manifest.prune_manifest_log(p, grace_seconds=0.0) == [3, 4]
    _cold()
    assert manifest.committed_txn_ids(p) == [1, 2, 3, 4]


def test_generation_names_are_write_once(tmp_path):
    p = _mkstore(tmp_path)
    for t in (1, 2):
        _publish(p, t)
    manifest.write_checkpoint(p)
    assert os.path.exists(manifest.checkpoint_path(p, 2, 0))
    manifest.prune_manifest_log(p, grace_seconds=0.0)
    # same top, bumped generation; keep-2 GC retains both for racers
    assert os.path.exists(manifest.checkpoint_path(p, 2, 1))
    cks = manifest._list_checkpoints(p)
    assert cks[-1] == (2, 1)
    assert len(cks) <= 2


def test_vacuum_removes_pruned_txn_from_checkpoint_truth(spark, tmp_db_path):
    """compact → prune the superseded history → vacuum: the pruned
    txns' data AND their checkpoint entries die together; the
    committed set shrinks to the survivors and never resurrects."""
    db = Database.create(
        spark,
        tmp_db_path,
        Schema(dimensions=[Dimension("k", 10)], values=[Value("v")]),
    )
    for i in range(3):
        t = db.begin()
        t.add_rows([[i * 10 + j, i] for j in range(3)])
        t.commit()
    manifest.write_checkpoint(tmp_db_path)
    assert db.compact() is not None  # supersedes txns 1..3
    pruned = manifest.prune_manifest_log(tmp_db_path, grace_seconds=0.0)
    assert pruned == [1, 2, 3]
    _cold()
    assert set(manifest.committed_txn_ids(tmp_db_path)) == {1, 2, 3, 4}
    removed = db.vacuum(min_age_seconds=0)
    assert removed == [1, 2, 3]
    _cold()
    assert set(manifest.committed_txn_ids(tmp_db_path)) == {4}
    for t in (1, 2, 3):
        assert not os.path.isdir(manifest.txn_data_dir(tmp_db_path, t))
    # the snapshot is intact through the whole lifecycle
    rows = {r["k"] for r in db.begin().query().collect()}
    assert rows == {i * 10 + j for i in range(3) for j in range(3)}


def test_scan_reads_through_pruned_history(spark, tmp_db_path):
    """End-to-end: commits pruned into the checkpoint still serve
    scans (file lists, stats, version ranks all ride the folded
    payloads)."""
    db = Database.create(
        spark,
        tmp_db_path,
        Schema(dimensions=[Dimension("k", 10)], values=[Value("v")]),
    )
    for i in range(4):
        t = db.begin()
        t.add_row([i, i * 100])
        t.commit()
    manifest.write_checkpoint(tmp_db_path)
    assert manifest.prune_manifest_log(tmp_db_path, grace_seconds=0.0) == [
        1,
        2,
        3,
        4,
    ]
    _cold()
    db2 = Database.open(spark, tmp_db_path)
    got = {r["k"]: r["v"] for r in db2.begin().query().collect()}
    assert got == {i: i * 100 for i in range(4)}
    # history and the change feed read the folded manifests too
    assert [h["txn"] for h in db2.history()] == [4, 3, 2, 1]
    ch = db2.changes(since=2)
    assert sorted(r["k"] for r in ch.collect()) == [2, 3]
