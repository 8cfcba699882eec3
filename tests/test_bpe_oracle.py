"""The generated BPE DuckDB oracles vs a pure-Python replay — the
third leg of the parity triangle (tests/test_bpe.py pins Spark ==
Python; this pins Oracle == Python, so Spark == Oracle by
transitivity BEFORE the gate runs). Pure DuckDB — no Spark session.

This fuzz found two real latent divergences in review (NULL
array_to_string of empty docs; empty-merge-stage scalar subqueries
NULLing every document) — keep it hostile: degenerate corpora stay in
the fixed case list."""

from __future__ import annotations

import random
import re
import sys

import duckdb
import pytest

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])


def _oracles():
    import __spark_entry__ as em

    sqls = em.oracle_sql()
    return sqls["q_bpe_train"], sqls["q_bpe_tokenize"]


def _run(rows, sql):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    return con.sql(sql).fetchall()


def _norm(t):
    return re.sub(r"\s+", " ", (t or "").lower()).strip()


def _sym(w):
    return " ".join(list(w)) + " </w>"


def _merge(s, l, r):
    pat, rep = f" {l} {r} ", f" {l}{r} "
    return (" " + s + " ").replace(pat, rep).replace(pat, rep).strip()


def _py_train(rows, n):
    wc = {}
    for _, t in rows:
        for w in [x for x in _norm(t).split(" ") if x]:
            wc[w] = wc.get(w, 0) + 1
    cur = {}
    for w, c in wc.items():
        cur[_sym(w)] = cur.get(_sym(w), 0) + c
    out = []
    for rank in range(n):
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
        out.append((rank, l, r, cnt))
        nxt = {}
        for s, c in cur.items():
            ns = _merge(s, l, r)
            nxt[ns] = nxt.get(ns, 0) + c
        cur = nxt
    return out


def _py_count(rows, merges):
    out = {}
    for d, t in rows:
        words = [x for x in _norm(t).split(" ") if x]
        if not words:
            out[d] = 0
            continue
        s = " ".join(_sym(w) for w in words)
        for _, l, r, _ in merges:
            s = _merge(s, l, r)
        out[d] = len(s.split(" "))
    return out


DEGENERATE = [
    [(1, ""), (2, None), (3, "a")],  # fewer pairs than 6 merges
    [(1, "a a a a a"), (2, "")],  # self-overlapping run + empty doc
    [(1, "low lower lowest"), (2, None), (3, "   ")],  # whitespace-only
]


@pytest.mark.parametrize("rows", DEGENERATE)
def test_tokenize_oracle_matches_python_on_degenerate(rows):
    _, sql_tok = _oracles()
    merges = _py_train(rows, 6)
    assert dict(_run(rows, sql_tok)) == _py_count(rows, merges)


def test_oracles_match_python_on_fuzzed_corpora():
    sql_train, sql_tok = _oracles()
    rng = random.Random(7)
    for _ in range(40):
        rows = [
            (i, "".join(rng.choice("ab c") for _ in range(rng.randint(0, 20))))
            for i in range(rng.randint(1, 5))
        ]
        merges = _py_train(rows, 6)
        assert dict(_run(rows, sql_tok)) == _py_count(rows, merges), rows
        got = sorted(_run(rows, sql_train))
        if len(merges) == 6:  # non-degenerate: all six rows must match
            assert got == merges, rows
