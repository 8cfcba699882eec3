"""Property-based engine semantics: random transaction workloads vs a
driver-side model of the reference contract.

The model is the documented matdb behavior (README.md:107-109 of the
reference): a dict key→value where later transactions overwrite
earlier ones, within-txn writes overwrite in order, rollbacks vanish,
and the scan returns exactly the model's content in ascending key
order. Running dozens of random interleavings catches versioning/
visibility bugs that fixed fixtures miss.
"""

from __future__ import annotations

import os
import shutil

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from matdb_spark import Database, Dimension, Schema, Value

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch")

# a workload is a list of transactions; each txn is (commit?, rows);
# keys stay in a small domain so upsert collisions are common
_row = st.tuples(
    st.integers(min_value=0, max_value=7),    # dim a
    st.integers(min_value=0, max_value=3),    # dim b
    st.integers(min_value=-100, max_value=100),  # value
)
_txn = st.tuples(st.booleans(), st.lists(_row, min_size=0, max_size=12))
_workload = st.lists(_txn, min_size=1, max_size=5)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(workload=_workload, compact_at_end=st.booleans())
def test_random_workloads_match_model(spark, workload, compact_at_end):
    path = os.path.join(SCRATCH, "prop_db")
    shutil.rmtree(path, ignore_errors=True)
    schema = Schema(
        dimensions=[Dimension("a", 3), Dimension("b", 2)], values=[Value("v")]
    )
    db = Database.create(spark, path, schema)

    model: dict[tuple[int, int], int] = {}
    for commit, rows in workload:
        txn = db.begin()
        staged: dict[tuple[int, int], int] = {}
        for a, b, v in rows:
            txn.add_row([a, b, v])
            staged[(a, b)] = v
        # read-your-own-writes inside the txn: model ∪ staged
        expected_inside = {**model, **staged}
        got_inside = {
            (r["a"], r["b"]): r["v"] for r in txn.query(ordered=False).collect()
        }
        assert got_inside == expected_inside
        if commit:
            txn.commit()
            model.update(staged)
        else:
            txn.rollback()

    if compact_at_end:
        db.compact()

    rows = db.snapshot().collect()
    got = {(r["a"], r["b"]): r["v"] for r in rows}
    assert got == model

    # ordering contract of the ordered scan
    ordered = [(r["a"], r["b"]) for r in db.begin().query(ordered=True).collect()]
    assert ordered == sorted(ordered)
