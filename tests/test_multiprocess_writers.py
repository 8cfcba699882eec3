"""TRUE multi-process concurrent writers (VERDICT r2 #5): separate OS
processes — each with its own JVM — committing interleaved against one
store, plus crash injection around reserve/publish. Proves on the real
filesystem primitives (O_EXCL reservation, tmp+rename publish) what
tests/test_concurrency_points.py proves with two handles in one JVM:
no id collision, no lost commit, recovery sweeps the victim.
"""

from __future__ import annotations

import os
import subprocess
import sys

from matdb_spark import Database, Dimension, Schema, Value
from matdb_spark import manifest

WORKER = r"""
import os, sys, time
sys.path.insert(0, sys.argv[4])
from matdb_spark import Database, get_spark

db_path, worker, mode = sys.argv[1], int(sys.argv[2]), sys.argv[3]
spark = get_spark(cpus=4, app_name=f"mp_writer_{worker}")
db = Database.open(spark, db_path)
if mode == "commit":
    for i in range(3):
        with db.begin() as t:
            t.add_row([worker * 1000 + i * 2, worker])
            t.add_row([worker * 1000 + i * 2 + 1, worker])
            t.commit()
        time.sleep(0.05)  # interleave with the sibling process
    print("OK", flush=True)
elif mode == "crash_prepublish":
    # reserve + stage data, then die before publish: classic victim
    t = db.begin()
    t.add_row([9_999_999, worker])
    t.flush()  # stages segment data under data/txn=<id>/
    print(f"CRASHED {t.txn_id}", flush=True)
    os._exit(1)
else:
    raise SystemExit(f"unknown mode {mode}")
"""


def _run_worker(db_path: str, worker: int, mode: str) -> subprocess.Popen:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return subprocess.Popen(
        [sys.executable, "-c", WORKER, db_path, str(worker), mode, repo],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        env=dict(os.environ, PYTHONPATH=repo, SPARK_GRAFT_CPUS="4"),
    )


def test_two_processes_interleaved_commits(spark, tmp_db_path):
    db_path = os.path.join(tmp_db_path, "mp_store")
    Database.create(
        spark, db_path, Schema(dimensions=[Dimension("k")], values=[Value("v")])
    )
    procs = [_run_worker(db_path, w, "commit") for w in (1, 2)]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0 and "OK" in out, err[-2000:]

    committed = manifest.committed_txn_ids(db_path)
    # 6 commits, ids unique by construction (filename listing); none
    # lost despite interleaved reservation/publish across processes
    assert len(committed) == 6 and len(set(committed)) == 6
    db = Database.open(spark, db_path)
    rows = {r["k"]: r["v"] for r in db.snapshot().collect()}
    assert len(rows) == 12
    for w in (1, 2):
        assert all(rows[w * 1000 + i] == w for i in range(6))
    # no leaked reservations after clean exits
    assert manifest.outstanding_txn_ids(db_path) == set()


def test_crash_before_publish_is_recovered(spark, tmp_db_path):
    db_path = os.path.join(tmp_db_path, "mp_crash")
    Database.create(
        spark, db_path, Schema(dimensions=[Dimension("k")], values=[Value("v")])
    )
    victim = _run_worker(db_path, 7, "crash_prepublish")
    out, err = victim.communicate(timeout=600)
    assert victim.returncode == 1 and "CRASHED" in out, err[-2000:]
    victim_id = int(out.split()[-1])

    # debris: reservation + staged data, invisible to scans
    assert victim_id in manifest.outstanding_txn_ids(db_path)
    db = Database.open(spark, db_path)
    assert db.snapshot().count() == 0

    # a live writer keeps committing happily; the victim's reservation
    # pins the feed watermark (safety) but not correctness
    with db.begin() as t:
        t.add_row([1, 1])
        t.commit()
    assert db.snapshot().count() == 1
    assert manifest.safe_feed_head(db_path) == victim_id - 1

    # recovery (grace elapsed) sweeps reservation + staged data and
    # the id space moves past the victim without collision
    nxt = manifest.recover(db_path, grace_seconds=0.0)
    assert victim_id not in manifest.outstanding_txn_ids(db_path)
    assert not os.path.isdir(manifest.txn_data_dir(db_path, victim_id))
    assert nxt > victim_id
    with db.begin() as t:
        t.add_row([2, 2])
        t.commit()
    committed = manifest.committed_txn_ids(db_path)
    assert len(committed) == len(set(committed)) == 2
    assert db.snapshot().count() == 2
