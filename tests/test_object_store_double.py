"""Object-store semantics double for the manifest-commit protocol
(r5 verdict item 5).

manifest.publish/recover are correct-by-construction on POSIX (atomic
rename + fsync). Object stores break both assumptions: rename is
copy-then-delete (a crash can leave source AND destination, or
neither-but-tmp), and LIST can lag PUT. This module injects exactly
those behaviors through an FS shim and asserts the protocol's two
invariants hold anyway:

- NO LOST COMMIT: once the manifest object exists, the commit is
  visible and recovery never un-publishes it (sweeps only debris).
- NO DOUBLE-PUBLISH / NO ID REUSE: txn-id claims go through
  O_CREAT|O_EXCL (the conditional-PUT analog), which is
  listing-independent — stale LISTs cannot hand two writers one id.

Outcome documented in SCALE.md §2: a publish interrupted mid-"rename"
is an IN-DOUBT commit (the copy may have landed) — safe either way,
never torn; callers treating the exception as failure must re-check
``committed_txn_ids`` before retrying with a fresh id.
"""

import json
import os
import shutil

import pytest

from matdb_spark import manifest


class CrashInjected(Exception):
    pass


class ObjectStoreShim:
    """Scoped os-level double: under ``root``,
    - os.replace = copy object + delete source, with an optional crash
      point between the two (``crash``: None | 'before_copy' |
      'after_copy');
    - os.listdir serves a STALE pre-captured view for the first
      ``stale_lists`` calls per directory (eventual-consistency LIST).
    Paths outside ``root`` pass through untouched."""

    def __init__(self, monkeypatch, root: str, crash=None, stale_lists: int = 0):
        self.root = os.path.abspath(root)
        self.crash = crash
        self._stale_budget: dict[str, int] = {}
        self._stale_view: dict[str, list] = {}
        real_replace, real_listdir = os.replace, os.listdir
        if stale_lists:
            for d in (manifest.commits_dir(root), manifest.data_dir(root)):
                if os.path.isdir(d):
                    self._stale_view[os.path.abspath(d)] = real_listdir(d)
                    self._stale_budget[os.path.abspath(d)] = stale_lists

        def replace(src, dst):
            if not os.path.abspath(str(dst)).startswith(self.root):
                return real_replace(src, dst)
            if self.crash == "before_copy":
                raise CrashInjected("crashed before destination PUT")
            shutil.copyfile(src, dst)  # full-object PUT: dst never torn
            if self.crash == "after_copy":
                raise CrashInjected("crashed after PUT, source not deleted")
            os.unlink(src)

        def listdir(p="."):
            key = os.path.abspath(str(p))
            if self._stale_budget.get(key, 0) > 0:
                self._stale_budget[key] -= 1
                return list(self._stale_view[key])
            return real_listdir(p)

        monkeypatch.setattr(os, "replace", replace)
        monkeypatch.setattr(os, "listdir", listdir)


def _mkstore(tmp_path) -> str:
    p = str(tmp_path / "db")
    manifest.init_layout(p)
    return p


def _publish(p, t, **kw):
    os.makedirs(manifest.txn_data_dir(p, t), exist_ok=True)
    manifest.publish(p, t, segment_count=1, **kw)


def test_crash_after_put_commit_lands_and_recovery_keeps_it(
    tmp_path, monkeypatch
):
    """copy-then-delete crash AFTER the PUT: the manifest object exists
    (commit LANDED) alongside .tmp debris. The caller saw an exception
    — in-doubt — but the store must treat the commit as published and
    recovery must sweep only the debris."""
    p = _mkstore(tmp_path)
    _publish(p, 1)
    ObjectStoreShim(monkeypatch, p, crash="after_copy")
    with pytest.raises(CrashInjected):
        _publish(p, 2)
    # commit landed: manifest visible, snapshot includes txn 2
    assert manifest.committed_txn_ids(p) == [1, 2]
    assert manifest.visible_txn_ids(p, horizon=10) == [1, 2]
    tmp = manifest.manifest_path(p, 2) + ".tmp"
    assert os.path.exists(tmp)  # the undeleted "source object"
    manifest.read_manifest_cached.cache_clear()
    nxt = manifest.recover(p, grace_seconds=0.0)
    assert not os.path.exists(tmp)  # debris swept
    assert manifest.committed_txn_ids(p) == [1, 2]  # commit NOT lost
    assert nxt == 3
    # the published object is complete JSON (full-object PUT, no tear)
    assert manifest.read_manifest(p, 2)["txn"] == 2


def test_crash_before_put_commit_absent_and_swept(tmp_path, monkeypatch):
    """Crash BEFORE the destination PUT: only .tmp + staged data exist.
    The commit must be invisible, recovery sweeps both, and the id is
    never reused (no later writer can double-publish under it)."""
    p = _mkstore(tmp_path)
    _publish(p, 1)
    ObjectStoreShim(monkeypatch, p, crash="before_copy")
    with pytest.raises(CrashInjected):
        _publish(p, 2)
    assert manifest.committed_txn_ids(p) == [1]
    assert manifest.visible_txn_ids(p, horizon=10) == [1]
    manifest.read_manifest_cached.cache_clear()
    nxt = manifest.recover(p, grace_seconds=0.0)
    assert not os.path.exists(manifest.manifest_path(p, 2) + ".tmp")
    assert not os.path.isdir(manifest.txn_data_dir(p, 2))
    assert nxt == 3  # id space advances PAST the victim — no reuse


def test_reservations_unique_under_stale_listing(tmp_path, monkeypatch):
    """Two writers whose LIST views lag (both see the same max id) must
    still claim distinct txn ids: the O_EXCL reservation (conditional
    PUT) is the arbiter, not the listing."""
    p = _mkstore(tmp_path)
    _publish(p, 1)
    _publish(p, 2)
    ObjectStoreShim(monkeypatch, p, stale_lists=4)
    # both "writers" start from the same stale base
    a = manifest.reserve_txn_id(p, start=1)
    b = manifest.reserve_txn_id(p, start=1)
    assert a != b
    assert {a, b}.isdisjoint({1, 2})


def test_stale_listing_reader_sees_older_but_consistent_snapshot(
    tmp_path, monkeypatch
):
    """A reader whose _commits LIST lags one commit sees the OLDER
    snapshot in full — never a torn one — and converges once the
    listing catches up."""
    p = _mkstore(tmp_path)
    _publish(p, 1)
    _publish(p, 2)
    shim = ObjectStoreShim(monkeypatch, p, stale_lists=1)
    _publish(p, 3)  # after the stale view was captured
    manifest.read_manifest_cached.cache_clear()
    first = manifest.visible_txn_ids(p, horizon=10)
    assert first == [1, 2]  # pre-PUT view: older, complete, not torn
    second = manifest.visible_txn_ids(p, horizon=10)
    assert second == [1, 2, 3]  # converged


def test_republish_same_txn_is_idempotent(tmp_path, monkeypatch):
    """An in-doubt caller that retries publish for the SAME txn id
    (same content) must not corrupt the store: last full-object PUT
    wins with identical bytes-for-purpose content."""
    p = _mkstore(tmp_path)
    ObjectStoreShim(monkeypatch, p)  # copy+delete, no crash
    _publish(p, 1)
    _publish(p, 1)  # retry
    assert manifest.committed_txn_ids(p) == [1]
    m = manifest.read_manifest(p, 1)
    assert m["txn"] == 1 and m["segments"] == 1


def test_end_to_end_store_through_shim(spark, tmp_path, monkeypatch):
    """Full engine lifecycle (Database/Transaction/scan) with every
    manifest rename going through the copy+delete double: commits land,
    newest-wins resolution unaffected."""
    from matdb_spark import Database, Dimension, Schema, Value

    p = str(tmp_path / "db2")
    ObjectStoreShim(monkeypatch, p)
    db = Database.create(
        spark, p, Schema(dimensions=[Dimension("k", 10)], values=[Value("v")])
    )
    t1 = db.begin()
    t1.add_rows([(i, i) for i in range(20)])
    t1.commit()
    t2 = db.begin()
    t2.add_rows([(5, 999)])
    t2.commit()
    got = {r["k"]: r["v"] for r in db.begin().query(ordered=False).collect()}
    assert got[5] == 999 and len(got) == 20
    assert not any(
        n.endswith(".tmp") for n in os.listdir(manifest.commits_dir(p))
    )


# ---------------------------------------------------------------- r7:
# checkpoint-vs-commit races under object-store semantics (the
# manifest-checkpoint fold of r6 verdict item 3 must inherit the same
# two invariants: a checkpoint can never lose a commit, and a torn or
# lagging checkpoint can never corrupt a read).


def _cold():
    manifest.read_manifest_cached.cache_clear()
    manifest._read_checkpoint_cached.cache_clear()


def test_checkpoint_crash_mid_put_leaves_reads_intact(tmp_path, monkeypatch):
    """Crash between the checkpoint tmp write and the PUT: the fold is
    simply absent — resolution falls back to per-manifest reads, and
    recovery sweeps the torn tmp."""
    p = _mkstore(tmp_path)
    for t in (1, 2, 3):
        _publish(p, t)
    ObjectStoreShim(monkeypatch, p, crash="before_copy")
    with pytest.raises(CrashInjected):
        manifest.write_checkpoint(p)
    monkeypatch.undo()
    _cold()
    assert manifest.visible_txn_ids(p, horizon=10) == [1, 2, 3]
    tmp = manifest.checkpoint_path(p, 3) + ".tmp"
    assert os.path.exists(tmp)
    manifest.recover(p, grace_seconds=0.0)
    assert not os.path.exists(tmp)
    assert manifest.visible_txn_ids(p, horizon=10) == [1, 2, 3]


def test_checkpoint_crash_after_put_is_usable_and_debris_swept(
    tmp_path, monkeypatch
):
    """Crash AFTER the checkpoint PUT (source tmp not deleted): the
    fold landed whole (full-object PUT, never torn) and serves reads;
    recovery sweeps only the tmp debris."""
    p = _mkstore(tmp_path)
    for t in (1, 2):
        _publish(p, t)
    ObjectStoreShim(monkeypatch, p, crash="after_copy")
    with pytest.raises(CrashInjected):
        manifest.write_checkpoint(p)
    monkeypatch.undo()
    _cold()
    # the landed checkpoint is complete JSON and used on the read path
    got, _pruned = manifest._read_checkpoint_cached(p, (2, 0))
    assert sorted(got) == [1, 2]
    assert manifest.visible_txn_ids(p, horizon=10) == [1, 2]
    manifest.recover(p, grace_seconds=0.0)
    assert not os.path.exists(manifest.checkpoint_path(p, 2) + ".tmp")
    assert os.path.exists(manifest.checkpoint_path(p, 2))


def test_commit_racing_fold_is_never_lost(tmp_path, monkeypatch):
    """A commit PUT that lands DURING the fold (after the fold's
    listing) is outside the checkpoint but must surface on the next
    sweep — the listing, not the checkpoint, is the id source of
    truth. Replayed with a stale LIST for good measure."""
    p = _mkstore(tmp_path)
    for t in (1, 2):
        _publish(p, t)
    assert manifest.write_checkpoint(p) == 2
    shim = ObjectStoreShim(monkeypatch, p, stale_lists=1)
    _publish(p, 3)  # lands after the shim captured the stale view
    _cold()
    first = manifest.visible_txn_ids(p, horizon=10)
    assert first == [1, 2]  # stale LIST: older but complete snapshot
    second = manifest.visible_txn_ids(p, horizon=10)
    assert second == [1, 2, 3]  # converged; 3 read from its own JSON


def test_checkpoint_gc_race_falls_back_to_manifests(tmp_path):
    """A reader whose hint points at a just-GC'ed checkpoint (listing
    raced the fold's cleanup) must degrade to per-file manifest reads,
    never error."""
    p = _mkstore(tmp_path)
    for t in (1, 2):
        _publish(p, t)
    assert manifest.write_checkpoint(p) == 2
    _cold()
    assert manifest.committed_txn_ids(p) == [1, 2]  # hint now set to 2
    os.unlink(manifest.checkpoint_path(p, 2))  # GC wins the race
    # hint still says 2; the cached-read fallback serves {} and the
    # per-manifest path answers
    assert manifest.visible_txn_ids(p, horizon=10) == [1, 2]


def test_two_writers_folding_same_top_is_idempotent(tmp_path, monkeypatch):
    """Two writers that list the same committed set write
    byte-equivalent checkpoints under the same name — last PUT wins
    with identical content (manifests are immutable). Simulated with a
    stale LIST: writer B's view was captured before writer A's fold
    landed, so B re-folds and re-PUTs the same object."""
    p = _mkstore(tmp_path)
    for t in (1, 2, 3):
        _publish(p, t)
    # stale budget 3: writer A's fold consumes two listings (id sweep
    # + GC) against the pre-checkpoint view it would have seen anyway;
    # writer B's id sweep consumes the third — still pre-checkpoint.
    ObjectStoreShim(monkeypatch, p, stale_lists=3)
    assert manifest.write_checkpoint(p) == 3  # writer A
    first = open(manifest.checkpoint_path(p, 3)).read()
    manifest._read_checkpoint_cached.cache_clear()
    assert manifest.write_checkpoint(p) == 3  # writer B, stale view
    second = open(manifest.checkpoint_path(p, 3)).read()
    assert json.loads(first)["manifests"] == json.loads(second)["manifests"]


# ---------------------------------------------------------------------------
# pruned-history races (r8: prune_manifest_log makes the checkpoint
# load-bearing for flagged entries — the same two invariants extend:
# a prune can never lose a commit, and a reader racing it never errs).


def test_prune_crash_between_flag_and_unlink_is_benign(tmp_path, monkeypatch):
    """The prune emits its flagged checkpoint BEFORE unlinking: a
    crash in between leaves both the new checkpoint generation and the
    per-txn JSONs — the committed union simply deduplicates."""
    p = _mkstore(tmp_path)
    for t in (1, 2):
        _publish(p, t)
    manifest.write_checkpoint(p)

    real_unlink = os.unlink

    def crashing_unlink(path):
        if os.path.basename(str(path)).endswith(".json") and "_checkpoint" not in str(path):
            raise CrashInjected("crashed before manifest unlink")
        return real_unlink(path)

    monkeypatch.setattr(os, "unlink", crashing_unlink)
    with pytest.raises(CrashInjected):
        manifest.prune_manifest_log(p, grace_seconds=0.0)
    monkeypatch.undo()
    _cold()
    # both copies present: union is still exactly {1, 2}
    assert manifest.committed_txn_ids(p) == [1, 2]
    assert manifest.visible_txn_ids(p, horizon=10) == [1, 2]
    # a retried prune completes the job
    assert manifest.prune_manifest_log(p, grace_seconds=0.0) == [1, 2]
    _cold()
    assert manifest.committed_txn_ids(p) == [1, 2]


def test_reader_with_stale_list_survives_prune(tmp_path, monkeypatch):
    """Eventual-consistency LIST captured BEFORE the prune: the reader
    sees manifest names that no longer exist. Their reads must fall
    back to the pruner's flagged checkpoint, and the next (fresh)
    listing converges."""
    p = _mkstore(tmp_path)
    for t in (1, 2, 3):
        _publish(p, t, extra={"files": [f"f{t}.parquet"]})
    manifest.write_checkpoint(p)
    shim = ObjectStoreShim(monkeypatch, p, stale_lists=1)
    manifest.prune_manifest_log(p, grace_seconds=0.0)
    _cold()
    # first listing is the stale pre-prune view; resolution still
    # lands because every per-file miss falls back to the checkpoint
    assert manifest.visible_txn_ids(p, horizon=10) == [1, 2, 3]
    assert manifest.read_manifest_cached(p, 2)["files"] == ["f2.parquet"]
    # converged view (fresh LIST): identical answer
    assert manifest.visible_txn_ids(p, horizon=10) == [1, 2, 3]


def test_fold_racing_prune_keeps_entries_flagged(tmp_path, monkeypatch):
    """A fold whose listing predates a concurrent prune (stale LIST)
    re-folds from the pre-prune view; its emitted checkpoint must
    still FLAG the pruned entries (merged from the pruner's newest
    generation at emit time) — otherwise the committed union would
    lose them the moment the fold's generation wins."""
    p = _mkstore(tmp_path)
    for t in (1, 2):
        _publish(p, t)
    manifest.write_checkpoint(p)
    manifest.prune_manifest_log(p, grace_seconds=0.0)  # gen (2, 1)
    _publish(p, 3)
    # the racing fold lists; every per-manifest read of 1/2 misses and
    # recovers from gen (2, 1); the emitted (3, 0) must carry flags
    _cold()
    assert manifest.write_checkpoint(p) == 3
    _cold()
    assert manifest.committed_txn_ids(p) == [1, 2, 3]
    assert manifest.visible_txn_ids(p, horizon=10) == [1, 2, 3]
