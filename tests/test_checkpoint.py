"""Manifest checkpointing (r6 verdict item 3): fold the committed-txn
set into a crash-safe snapshot file so snapshot resolution stops being
O(#commits) JSON reads.

Contract under test:
- write_checkpoint folds every committed manifest into one atomic
  file; after it, sweeps read ZERO per-txn JSONs for folded ids;
- maybe_checkpoint folds every N commits and is wired into
  Transaction.commit and both DSv2 writer commit paths;
- folds are incremental (previous checkpoint + new manifests), drop
  vacuumed entries, and GC all but the newest 2 checkpoint files;
- a stale/absent checkpoint NEVER affects correctness — reads fall
  back to per-file manifests (the checkpoint is an accelerator, the
  manifest log stays the source of truth);
- crash debris (checkpoint .tmp) is swept by recover(); a checkpoint
  racing a concurrent commit folds only what was committed at fold
  time and the next sweep still sees the late commit via its JSON.
"""

import json
import os

import pytest

from matdb_spark import Database, Dimension, Schema, Value, manifest


def _publish_n(path, n, start=1):
    manifest.init_layout(path)
    for t in range(start, start + n):
        manifest.publish(path, t, segment_count=1)
    return list(range(start, start + n))


def test_write_checkpoint_folds_and_reads_skip_files(tmp_path, monkeypatch):
    p = str(tmp_path / "db")
    ids = _publish_n(p, 10)
    top = manifest.write_checkpoint(p)
    assert top == 10
    assert os.path.exists(manifest.checkpoint_path(p, 10))

    # cold caches: the sweep must not open ANY per-txn manifest file
    manifest.read_manifest_cached.cache_clear()
    manifest._read_checkpoint_cached.cache_clear()
    opened = []
    real = manifest.read_manifest

    def spy(db_path, txn_id):
        opened.append(txn_id)
        return real(db_path, txn_id)

    monkeypatch.setattr(manifest, "read_manifest", spy)
    assert manifest.visible_txn_ids(p, horizon=100) == ids
    assert opened == []  # every manifest came from the checkpoint


def test_checkpoint_is_accelerator_not_truth(tmp_path):
    """A commit AFTER the fold is still visible (read via its own
    JSON); deleting the checkpoint file changes nothing semantically."""
    p = str(tmp_path / "db")
    _publish_n(p, 5)
    manifest.write_checkpoint(p)
    manifest.publish(p, 6, segment_count=1)
    assert manifest.visible_txn_ids(p, horizon=100) == [1, 2, 3, 4, 5, 6]
    os.unlink(manifest.checkpoint_path(p, 5))
    manifest.read_manifest_cached.cache_clear()
    manifest._read_checkpoint_cached.cache_clear()
    assert manifest.visible_txn_ids(p, horizon=100) == [1, 2, 3, 4, 5, 6]


def test_maybe_checkpoint_interval(tmp_path):
    p = str(tmp_path / "db")
    _publish_n(p, 3)
    assert manifest.maybe_checkpoint(p, interval=5) is None
    _publish_n(p, 2, start=4)
    assert manifest.maybe_checkpoint(p, interval=5) == 5
    # 4 more commits: still behind the interval relative to ck@5
    _publish_n(p, 4, start=6)
    assert manifest.maybe_checkpoint(p, interval=5) is None
    manifest.publish(p, 10, segment_count=1)
    assert manifest.maybe_checkpoint(p, interval=5) == 10


def test_incremental_fold_and_gc_keeps_two(tmp_path, monkeypatch):
    p = str(tmp_path / "db")
    _publish_n(p, 4)
    assert manifest.write_checkpoint(p) == 4
    _publish_n(p, 4, start=5)

    # the second fold must read only the NEW manifests (5..8)
    opened = []
    real = manifest.read_manifest

    def spy(db_path, txn_id):
        opened.append(txn_id)
        return real(db_path, txn_id)

    monkeypatch.setattr(manifest, "read_manifest", spy)
    assert manifest.write_checkpoint(p) == 8
    assert sorted(opened) == [5, 6, 7, 8]

    _publish_n(p, 1, start=9)
    assert manifest.write_checkpoint(p) == 9
    cks = [
        n
        for n in os.listdir(manifest.commits_dir(p))
        if n.startswith("_checkpoint.")
    ]
    assert sorted(cks) == ["_checkpoint.00000008.json", "_checkpoint.00000009.json"]
    # idempotent: nothing new -> no write
    assert manifest.write_checkpoint(p) is None


def test_fold_drops_vacuumed_entries(tmp_path):
    p = str(tmp_path / "db")
    _publish_n(p, 3)
    manifest.write_checkpoint(p)
    # a compaction replaces 1..3; vacuum deletes their manifests
    manifest.publish(p, 4, segment_count=1, replaces=[1, 2, 3])
    for t in (1, 2, 3):
        os.unlink(manifest.manifest_path(p, t))
    manifest.read_manifest_cached.cache_clear()
    assert manifest.write_checkpoint(p) == 4
    folded = json.load(open(manifest.checkpoint_path(p, 4)))["manifests"]
    assert sorted(folded) == ["00000004"] or sorted(folded) == ["4"]


def test_recover_sweeps_checkpoint_tmp(tmp_path):
    p = str(tmp_path / "db")
    _publish_n(p, 2)
    debris = manifest.checkpoint_path(p, 2) + ".tmp"
    with open(debris, "w") as f:
        f.write("{torn")
    nxt = manifest.recover(p, grace_seconds=0.0)
    assert not os.path.exists(debris)
    assert nxt == 3


def test_checkpoint_commit_race_next_sweep_converges(tmp_path):
    """Fold-then-commit: a txn published DURING/AFTER the fold is not
    in the checkpoint but the very next sweep sees it (listing is the
    id source of truth; the checkpoint only supplies payloads)."""
    p = str(tmp_path / "db")
    _publish_n(p, 6)
    assert manifest.write_checkpoint(p) == 6
    manifest.publish(p, 7, segment_count=1)  # the racing commit
    manifest.read_manifest_cached.cache_clear()
    manifest._read_checkpoint_cached.cache_clear()
    assert manifest.visible_txn_ids(p, horizon=100) == [1, 2, 3, 4, 5, 6, 7]


def test_auto_checkpoint_through_transaction_commit(
    spark, tmp_db_path, monkeypatch
):
    monkeypatch.setattr(manifest, "DEFAULT_CHECKPOINT_INTERVAL", 3)
    db = Database.create(
        spark,
        tmp_db_path,
        Schema(dimensions=[Dimension("k", 10)], values=[Value("v")]),
    )
    for i in range(4):
        t = db.begin()
        t.add_row([i, i])
        t.commit()
    cks = [
        n
        for n in os.listdir(manifest.commits_dir(tmp_db_path))
        if n.startswith("_checkpoint.") and n.endswith(".json")
    ]
    assert cks, "Transaction.commit must auto-fold at the interval"
    # the folded snapshot reads identically to the manifest log
    manifest.read_manifest_cached.cache_clear()
    vis = manifest.visible_txn_ids(tmp_db_path, horizon=100)
    assert len(vis) == 4
    rows = {
        (r["k"], r["v"]) for r in db.begin().query().collect()
    }
    assert rows == {(i, i) for i in range(4)}
