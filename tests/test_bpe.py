"""Distributed BPE trainer (operators/bpe.py): exact parity with a
pure-Python replay of the same merge convention, the textbook
low/lower example, tokenizer counts, and degenerate inputs."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from matdb_spark.operators import bpe


def _norm(t):
    return re.sub(r"\s+", " ", (t or "").lower()).strip()


def _sym(w):
    return " ".join(list(w)) + " </w>"


def _merge_str(s, l, r):
    pat, rep = f" {l} {r} ", f" {l}{r} "
    return (" " + s + " ").replace(pat, rep).replace(pat, rep).strip()


def _py_train(rows, num_merges):
    wc = {}
    for _, t in rows:
        for w in [x for x in _norm(t).split(" ") if x]:
            wc[w] = wc.get(w, 0) + 1
    cur = {}
    for w, c in wc.items():
        s = _sym(w)
        cur[s] = cur.get(s, 0) + c
    merges = []
    for rank in range(num_merges):
        pc = {}
        for s, c in cur.items():
            a = s.split(" ")
            for i in range(len(a) - 1):
                p = a[i] + " " + a[i + 1]
                pc[p] = pc.get(p, 0) + c
        if not pc:
            break
        pair, cnt = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        l, r = pair.split(" ", 1)
        merges.append((rank, l, r, cnt))
        nxt = {}
        for s, c in cur.items():
            ns = _merge_str(s, l, r)
            nxt[ns] = nxt.get(ns, 0) + c
        cur = nxt
    return merges


def _py_count(t, merges):
    words = [x for x in _norm(t).split(" ") if x]
    if not words:
        return 0
    s = " ".join(_sym(w) for w in words)
    for _, l, r, _ in merges:
        s = _merge_str(s, l, r)
    return len(s.split(" "))


ROWS = [
    (1, "low lower lowest low low"),
    (2, "new newer newest new"),
    (3, "low new low new"),
    (4, ""),
    (5, None),
]


def test_train_matches_python_replay_textbook(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    merges = bpe.train_bpe(df, "text", num_merges=6, min_count=1)
    assert merges == _py_train(ROWS, 6)
    # the textbook shape: 'l o' merges early, then builds to 'low</w>'
    pairs = [(l, r) for _, l, r, _ in merges]
    assert ("l", "o") in pairs
    assert ("lo", "w</w>") in pairs


def test_token_counts_match_python(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    merges = bpe.train_bpe(df, "text", num_merges=6, min_count=1)
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe.bpe_token_count(df, "doc_id", "text", merges).collect()
    }
    assert got == {d: _py_count(t, merges) for d, t in ROWS}
    assert got[4] == 0 and got[5] == 0
    # merges never increase token count vs unmerged symbols
    raw = {
        d: sum(len(w) + 1 for w in [x for x in _norm(t).split(" ") if x])
        for d, t in ROWS
    }
    assert all(got[d] <= raw[d] for d, _ in ROWS)


def test_min_count_stops_training(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    # every pair occurs once; min_count=2 learns nothing
    assert bpe.train_bpe(df, "text", num_merges=4, min_count=2) == []


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 1000),
            st.text(alphabet="ab c", min_size=1, max_size=30),
        ),
        min_size=1,
        max_size=6,
        unique_by=lambda t: t[0],
    ),
    n=st.integers(1, 4),
)
def test_train_matches_python_replay_property(spark, rows, n):
    """Arbitrary tiny corpora (incl. self-overlapping runs like
    'aaaa', where the two-pass convention is load-bearing): the Spark
    trainer must EQUAL the pure-Python replay merge for merge."""
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert bpe.train_bpe(df, "text", num_merges=n, min_count=1) == _py_train(rows, n)
