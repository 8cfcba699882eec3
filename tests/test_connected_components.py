"""Unit tests for connected_components on synthetic graphs: driver
union-find path, distributed partition-local contraction path (forced
via driver_threshold=0), and the label-propagation fallback."""
import random

from pyspark.sql import functions as F

from matdb_spark.operators.dedup import _label_propagation_cc, connected_components


def _collect(df):
    return {r["doc_id"]: r["cluster_id"] for r in df.collect()}


def test_connected_components_shapes(spark):
    # triangle {1,2,3}, chain {10,11,12,13}, pair {20,21}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (12, 13), (20, 21)],
        "id_a long, id_b long",
    )
    expected = {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 13: 10, 20: 20, 21: 20}
    # driver union-find fast path (default threshold)
    assert _collect(connected_components(pairs)) == expected
    # distributed contraction path (threshold forced to 0)
    assert _collect(connected_components(pairs, driver_threshold=0)) == expected


def test_distributed_random_ids_no_locality(spark):
    # ids shuffled so range partitioning gets NO contiguity help: the
    # contraction must still converge (possibly over several levels)
    rng = random.Random(7)
    perm = list(range(3000))
    rng.shuffle(perm)
    # 10 components, each a 300-node chain through the permuted ids
    rows, want = [], {}
    for c in range(10):
        chunk = perm[c * 300 : (c + 1) * 300]
        root = min(chunk)
        for n in chunk:
            want[n] = root
        rows += list(zip(chunk, chunk[1:]))
    pairs = spark.createDataFrame(rows, "id_a long, id_b long")
    assert _collect(connected_components(pairs, driver_threshold=0)) == want


def test_distributed_string_ids_and_self_pairs(spark):
    pairs = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("x", "x"), ("m", "n")],
        "id_a string, id_b string",
    )
    want = {"a": "a", "b": "a", "c": "a", "x": "x", "m": "m", "n": "m"}
    assert _collect(connected_components(pairs)) == want
    # self-pair-only node "x" must survive the distributed path too
    assert _collect(connected_components(pairs, driver_threshold=0)) == want


def test_label_propagation_fallback(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (12, 13)],
        "id_a long, id_b long",
    )
    want = {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 13: 10}
    assert _collect(_label_propagation_cc(pairs)) == want


def test_label_propagation_fallback_string_ids(spark):
    # string labels cannot use the decimal-sum convergence check (the
    # cast yields NULL and every round would look converged after one
    # iteration): a >1-round chain catches a false early convergence
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f")],
        "id_a string, id_b string",
    )
    want = {x: "a" for x in "abcdef"}
    assert _collect(_label_propagation_cc(pairs)) == want


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_edges = st.lists(
    st.tuples(st.integers(0, 300), st.integers(0, 300)),
    min_size=1,
    max_size=120,
)


def _oracle_cc(pairs):
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {n: find(n) for n in parent}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(edges=_edges)
def test_contraction_matches_union_find_oracle(spark, edges):
    """Property: the distributed contraction path (forced via
    driver_threshold=0, so recursion/glue/fold-back all execute) labels
    every node with its component minimum, for arbitrary random graphs
    including self-loops, parallel edges, and both edge orders."""
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = _collect(connected_components(pairs, driver_threshold=0))
    assert got == _oracle_cc(edges)
