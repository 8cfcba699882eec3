"""10k-commit planning-time probe for manifest checkpointing
(r6 verdict item 3).

Publishes N tiny manifests into a scratch store (pure metadata — no
Spark needed: planning cost is driver-side JSON IO by construction),
then measures COLD-CACHE snapshot resolution (visible_txn_ids):

- unfolded: one JSON read per commit ever made;
- checkpointed: one checkpoint read + one JSON per commit since.

Also measures the amortized per-commit cost of the auto-fold
(maybe_checkpoint at the default interval) to show commits stay O(1).

Usage: PYTHONPATH=/root/repo python tools/checkpoint_probe.py [N]
Prints one JSON line; numbers are recorded in SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from matdb_spark import manifest

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scratch",
    "checkpoint_probe",
)


def cold() -> None:
    manifest.read_manifest_cached.cache_clear()
    manifest._read_checkpoint_cached.cache_clear()


def timed(fn) -> tuple[float, object]:
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


def main() -> None:
    shutil.rmtree(ROOT, ignore_errors=True)
    p = os.path.join(ROOT, "db")
    manifest.init_layout(p)

    # a realistic small-commit payload (streaming batch: 1 file + stats)
    def publish(t: int) -> None:
        manifest.publish(
            p,
            t,
            segment_count=1,
            extra={
                "files": [f"seg=0/part-{t:05d}.parquet"],
                "stats": {"t": [t, t + 10]},
            },
        )

    t_pub, _ = timed(lambda: [publish(t) for t in range(1, N + 1)])

    # resolution WITHOUT a checkpoint: N JSON reads, cold
    cold()
    t_unfolded, vis = timed(lambda: manifest.visible_txn_ids(p, N + 1))
    assert len(vis) == N

    # fold, then resolution WITH the checkpoint: 1 read, cold
    t_fold, top = timed(lambda: manifest.write_checkpoint(p))
    assert top == N
    cold()
    t_folded, vis2 = timed(lambda: manifest.visible_txn_ids(p, N + 1))
    assert vis2 == vis

    # steady state: K more commits with auto-fold at the default
    # interval — per-commit cost including the amortized fold
    K = 512
    t0 = time.perf_counter()
    for t in range(N + 1, N + 1 + K):
        publish(t)
        manifest.maybe_checkpoint(p)
    t_commit_amortized = (time.perf_counter() - t0) / K

    # planning right after steady-state appends (checkpoint + tail)
    cold()
    t_steady, vis3 = timed(lambda: manifest.visible_txn_ids(p, N + K + 1))
    assert len(vis3) == N + K

    # RETENTION (r7 verdict item 3): prune per-txn JSONs already
    # folded into the checkpoint — _commits/ drops from O(#commits
    # ever) names to (tail + checkpoints), while the committed set,
    # snapshot resolution, and recovery stay identical.
    files_before = len(os.listdir(manifest.commits_dir(p)))
    manifest.write_checkpoint(p)  # fold the steady-state tail too
    t_prune, pruned = timed(lambda: manifest.prune_manifest_log(p, 0.0))
    files_after = len(os.listdir(manifest.commits_dir(p)))
    cold()
    t_pruned_resolve, vis4 = timed(
        lambda: manifest.visible_txn_ids(p, N + K + 1)
    )
    assert vis4 == vis3, "prune changed the committed snapshot"
    assert manifest.recover(p, grace_seconds=0.0) == N + K + 1

    top, gen = manifest._list_checkpoints(p)[-1]
    print(
        json.dumps(
            {
                "n_commits": N,
                "publish_total_s": round(t_pub, 3),
                "resolve_unfolded_s": round(t_unfolded, 4),
                "fold_s": round(t_fold, 4),
                "resolve_checkpointed_s": round(t_folded, 4),
                "speedup": round(t_unfolded / max(t_folded, 1e-9), 1),
                "steady_commit_amortized_ms": round(
                    t_commit_amortized * 1e3, 3
                ),
                "resolve_after_steady_s": round(t_steady, 4),
                "commits_files_before_prune": files_before,
                "pruned": len(pruned),
                "commits_files_after_prune": files_after,
                "prune_s": round(t_prune, 4),
                "resolve_after_prune_s": round(t_pruned_resolve, 4),
                "checkpoint_bytes": os.path.getsize(
                    manifest.checkpoint_path(p, top, gen)
                ),
            }
        )
    )
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
