"""Winnowing fingerprints vs a plain-Python reference implementation,
plus the shared-substring guarantee."""

from __future__ import annotations

import hashlib

from matdb_spark.functions.text import winnowing_fingerprints

K, W = 8, 4


def _norm(t: str) -> str:
    import re
    return re.sub(r"\s+", " ", t.lower()).strip()


def _py_winnow(text: str) -> set[int]:
    n = _norm(text)
    grams = [
        int(hashlib.md5(n[i : i + K].encode()).hexdigest()[:12], 16)
        for i in range(len(n) - K + 1)
    ]
    return {min(grams[j : j + W]) for j in range(len(grams) - W + 1)}


def test_matches_python_reference(spark):
    texts = [
        (1, "The quick brown fox jumps over the lazy dog"),
        (2, "short"),                      # < k chars: no fingerprints
        (3, "exactly8"),                   # one gram, < w windows: none
        (4, "  Weird   WHITESPACE\n\nhandling  case  here  "),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got: dict[int, set] = {}
    for r in winnowing_fingerprints(df, "doc_id", "text", K, W).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    for i, t in texts:
        expect = _py_winnow(t)
        assert got.get(i, set()) == expect, f"doc {i}"


def test_shared_substring_shares_fingerprint(spark):
    core = "a very distinctive shared passage of text"
    df = spark.createDataFrame(
        [(1, "prefix one " + core + " suffix one"),
         (2, "totally different lead-in " + core + " and tail")],
        "doc_id long, text string",
    )
    fps: dict[int, set] = {1: set(), 2: set()}
    for r in winnowing_fingerprints(df, "doc_id", "text", K, W).collect():
        fps[r["doc_id"]].add(r["fp"])
    assert fps[1] & fps[2], "shared substring must yield shared fingerprints"
