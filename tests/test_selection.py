"""DSIR-style importance selection (operators/selection.py): exact
parity with a pure-Python oracle (the micro-nat quantization makes
weights integer-exact), degenerate-document handling, resample
determinism, and the exchange-free scoring-plan guarantee."""

from __future__ import annotations

import hashlib
import math
import re

import pyspark.sql.functions as F
import pytest

from matdb_spark.operators import selection as S

CORPUS = [
    (1, "the cat sat on the mat"),
    (2, "stock market prices fell sharply today"),
    (3, "The  CAT   sat"),
    (4, ""),
    (5, None),
    (6, "the cat the cat the cat"),
]
TARGET = [(10, "the cat chased the cat"), (11, "a cat sat quietly")]
B = 64


def _norm(t):
    return re.sub(r"\s+", " ", (t or "").lower()).strip()


def _grams(t):
    toks = [x for x in _norm(t).split(" ") if x]
    return toks + [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]


def _bucket(g):
    return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % B


def _oracle_weights():
    cc, tc = {}, {}
    for rows, acc in ((CORPUS, cc), (TARGET, tc)):
        for _, t in rows:
            for g in _grams(t):
                b = _bucket(g)
                acc[b] = acc.get(b, 0) + 1
    s_tot, t_tot = sum(cc.values()) + B, sum(tc.values()) + B
    ls, lt = math.log(s_tot), math.log(t_tot)
    lr = {
        b: math.floor(
            (math.log(tc.get(b, 0) + 1) - math.log(cc.get(b, 0) + 1) + ls - lt)
            * 1e6
            + 0.5
        )
        for b in range(B)
    }
    return {
        d: (len(_grams(t)), sum(lr[_bucket(g)] for g in _grams(t)))
        for d, t in CORPUS
    }


@pytest.fixture(scope="module")
def frames(spark):
    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    return corpus, target


def test_weights_match_python_oracle(spark, frames):
    corpus, target = frames
    w = S.importance_weights(corpus, target, "doc_id", "text", num_buckets=B)
    got = {r["doc_id"]: (r["n_grams"], r["weight_unats"]) for r in w.collect()}
    assert got == _oracle_weights()


def test_weights_rank_target_like_docs_higher(spark, frames):
    corpus, target = frames
    w = S.importance_weights(corpus, target, "doc_id", "text", num_buckets=B)
    got = {r["doc_id"]: r["weight_unats"] for r in w.collect()}
    # cat-ish docs outweigh the finance doc; empty/NULL docs score 0
    assert got[1] > got[2] and got[3] > got[2]
    assert got[4] == 0 and got[5] == 0


def test_scoring_plan_is_exchange_free(spark, frames):
    corpus, target = frames
    w = S.importance_weights(corpus, target, "doc_id", "text", num_buckets=B)
    plan = w._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan, plan


def test_resample_deterministic_topk(spark, frames):
    corpus, target = frames
    w = S.importance_weights(corpus, target, "doc_id", "text", num_buckets=B)
    a = S.importance_resample(w, "doc_id", 3, seed=7).collect()
    b = S.importance_resample(w, "doc_id", 3, seed=7).collect()
    assert a == b and len(a) == 3
    # keys strictly ordered in the output
    keys = [r["key_unats"] for r in a]
    assert keys == sorted(keys, reverse=True)
    # a different seed perturbs the selection keys
    c = S.importance_resample(w, "doc_id", 3, seed=8).collect()
    assert [r["key_unats"] for r in c] != keys


def _oracle_lm():
    c1, c2 = {}, {}
    for _, t in TARGET:  # TARGET doubles as the LM reference here
        toks = [x for x in _norm(t).split(" ") if x]
        for g in toks:
            c1[_bucket(g)] = c1.get(_bucket(g), 0) + 1
        for i in range(len(toks) - 1):
            b = _bucket(" ".join(toks[i : i + 2]))
            c2[b] = c2.get(b, 0) + 1
    l1 = {b: math.floor(math.log(c1.get(b, 0) + B) * 1e6 + 0.5) for b in range(B)}
    l2 = {b: math.floor(math.log(c2.get(b, 0) + 1) * 1e6 + 0.5) for b in range(B)}
    out = {}
    for d, t in CORPUS:
        toks = [x for x in _norm(t).split(" ") if x]
        s = 0
        for i in range(len(toks) - 1):
            s += l2[_bucket(" ".join(toks[i : i + 2]))] - l1[_bucket(toks[i])]
        out[d] = (max(len(toks) - 1, 0), s)
    return out


def test_bigram_lm_matches_python_oracle(spark, frames):
    corpus, target = frames
    got = {
        r["doc_id"]: (r["n_pairs"], r["logprob_unats"])
        for r in S.bigram_lm_scores(
            corpus, target, "doc_id", "text", num_buckets=B
        ).collect()
    }
    assert got == _oracle_lm()
    # reference-like text scores higher per pair than out-of-domain text
    avg = lambda d: got[d][1] / got[d][0]
    assert avg(1) > avg(2)
    assert got[4] == (0, 0) and got[5] == (0, 0)


def test_bigram_lm_plan_is_exchange_free(spark, frames):
    corpus, target = frames
    df = S.bigram_lm_scores(corpus, target, "doc_id", "text", num_buckets=B)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan, plan


def test_single_n_unigram_only(spark, frames):
    corpus, target = frames
    w = S.importance_weights(
        corpus, target, "doc_id", "text", ns=(1,), num_buckets=B
    )
    got = {r["doc_id"]: r["n_grams"] for r in w.collect()}
    assert got[1] == 6 and got[4] == 0  # tokens only, no bigrams
