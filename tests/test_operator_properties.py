"""Property-based operator semantics: random inputs cross-checked
against independent reference implementations (pandas merge_asof, pure
Python nested loops) — catches semantic drift the fixed fixtures and
SQL oracles share blind spots on.
"""

from __future__ import annotations

import datetime

import pandas as pd

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from matdb_spark.operators.asof import asof_join, asof_join_sorted
from matdb_spark.operators.rangejoin import range_join
from matdb_spark.operators.sessionize import sessionize

_EPOCH = datetime.datetime(2024, 1, 1)


def _ts(s: int) -> datetime.datetime:
    return _EPOCH + datetime.timedelta(seconds=s)


_left_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 500)), min_size=1, max_size=12
)
_right_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 500), st.integers(-99, 99)),
    min_size=0,
    max_size=12,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(lrows=_left_rows, rrows=_right_rows)
def test_asof_both_strategies_match_pandas(spark, lrows, rrows):
    # dedupe right on (key, ts): at equal instants the winner is
    # implementation-defined in every engine; keep the property crisp
    rmap = {}
    for k, t, p in rrows:
        rmap[(k, t)] = p
    rrows = [(k, t, p) for (k, t), p in rmap.items()]
    # left duplicates are deliberately KEPT (every left row must
    # survive both strategies)
    left = spark.createDataFrame(
        [(i, k, _ts(t)) for i, (k, t) in enumerate(lrows)], "lid long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(k, _ts(t), p) for k, t, p in rrows] or [],
        "k long, ts timestamp, px long",
    )
    a = asof_join(left, right, on="ts", by=["k"])
    b = asof_join_sorted(left, right, on="ts", by=["k"])
    got_a = {r["lid"]: r["px_right"] for r in a.collect()}
    got_b = {r["lid"]: r["px_right"] for r in b.collect()}

    lpdf = pd.DataFrame(
        {"lid": range(len(lrows)), "k": [k for k, _ in lrows], "ts": [_ts(t) for _, t in lrows]}
    ).sort_values("ts", kind="stable")
    rpdf = pd.DataFrame(
        {"k": [k for k, _, _ in rrows], "ts": [_ts(t) for _, t, _ in rrows],
         "px": [p for _, _, p in rrows]}
    ).sort_values("ts", kind="stable")
    if len(rpdf):
        m = pd.merge_asof(lpdf, rpdf, on="ts", by="k", direction="backward")
        expected = {
            int(r.lid): (None if pd.isna(r.px) else int(r.px)) for r in m.itertuples()
        }
    else:
        expected = {int(r.lid): None for r in lpdf.itertuples()}
    assert got_a == expected
    assert got_b == expected


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    events=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 120)), min_size=1, max_size=15
    ),
    gap_s=st.integers(1, 40),
)
def test_sessionize_matches_model(spark, events, gap_s):
    # distinct (key, ts): equal timestamps have no defined visit order
    events = sorted(set(events))
    df = spark.createDataFrame(
        [(k, _ts(t)) for k, t in events], "k long, ts timestamp"
    )
    out = sessionize(df, "k", "ts", gap_ms=gap_s * 1000)
    got = {
        (r["k"], r["ts"]): r["session_id"] for r in out.collect()
    }
    # model: strict > split (exactly gap merges)
    expected = {}
    for k in {k for k, _ in events}:
        ts_sorted = sorted(t for kk, t in events if kk == k)
        sid, prev = 0, None
        for t in ts_sorted:
            if prev is not None and (t - prev) * 1000 > gap_s * 1000:
                sid += 1
            expected[(k, _ts(t))] = sid
            prev = t
    assert got == expected


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    lrows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 200), st.integers(0, 100)),
        min_size=1,
        max_size=10,
    ),
    rrows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 300)), min_size=0, max_size=12
    ),
    bucket=st.sampled_from([7, 50, 1000]),
)
def test_range_join_matches_nested_loop(spark, lrows, rrows, bucket):
    left = spark.createDataFrame(
        [(i, k, lo, lo + w) for i, (k, lo, w) in enumerate(lrows)],
        "lid long, k long, lo long, hi long",
    )
    right = spark.createDataFrame(
        [(j, k, rv) for j, (k, rv) in enumerate(rrows)] or [],
        "rid long, k long, rv long",
    )
    for how in ("inner", "left"):
        out = range_join(left, right, "lo", "hi", "rv", on=["k"], bucket_width=bucket, how=how)
        got = {(r["lid"], r["rid"]) for r in out.collect()}
        expected = set()
        matched = set()
        for i, (k, lo, w) in enumerate(lrows):
            for j, (rk, rv) in enumerate(rrows):
                if rk == k and lo <= rv <= lo + w:
                    expected.add((i, j))
                    matched.add(i)
        if how == "left":
            expected |= {(i, None) for i in range(len(lrows)) if i not in matched}
        assert got == expected, f"how={how}"


_rownum_rows = st.lists(
    st.tuples(st.integers(0, 10_000), st.integers(-500, 500)),
    min_size=1,
    max_size=60,
    unique_by=lambda r: r[0],
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(rows=_rownum_rows)
def test_global_row_number_matches_window_model(spark, rows):
    """global_row_number == ROW_NUMBER() OVER (ORDER BY key, id) for
    any data, including negative keys (negative buckets must order
    correctly through the offsets window) and single/sparse buckets."""
    from matdb_spark.operators.ranking import global_row_number

    df = spark.createDataFrame(rows, "id long, key long").repartition(4)
    out = global_row_number(df, [F.col("key"), F.col("id")], F.floor(F.col("key") / 7))
    got = {r["id"]: r["rn"] for r in out.collect()}
    expected = {
        rid: i + 1
        for i, (rid, _) in enumerate(sorted(rows, key=lambda r: (r[1], r[0])))
    }
    assert got == expected


_tok_rows = st.lists(
    st.tuples(st.integers(0, 10_000), st.integers(0, 400)),
    min_size=1,
    max_size=30,
    unique_by=lambda t: t[0],
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(rows=_tok_rows, budget=st.integers(1, 300), n_shards=st.integers(1, 4))
def test_pack_documents_matches_pure_python(spark, rows, budget, n_shards):
    """Packing layout cross-checked against a pure-Python reference:
    same md5 hash, same (shard, hash, id) order, same prefix sums."""
    import hashlib

    from matdb_spark.operators.packing import pack_documents

    df = spark.createDataFrame(rows, "doc_id long, toks long")
    got = {
        r["doc_id"]: (r["shard"], r["start_tok"], r["pack_id"], r["pack_pos"])
        for r in pack_documents(df, "doc_id", "toks", budget, n_shards).collect()
    }

    def h(doc_id: int) -> int:
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:12], 16)

    expected = {}
    by_shard: dict[int, list[tuple[int, int]]] = {}
    for doc_id, toks in rows:
        by_shard.setdefault(h(doc_id) % n_shards, []).append((doc_id, toks))
    for shard, members in by_shard.items():
        members.sort(key=lambda m: (h(m[0]), m[0]))
        start = 0
        for doc_id, toks in members:
            expected[doc_id] = (shard, start, start // budget, start % budget)
            start += toks
    assert got == expected


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    keys=st.lists(
        st.text(alphabet="abcdef", min_size=1, max_size=4), min_size=1, max_size=20
    ),
    split=st.integers(0, 20),
)
def test_dictionary_encode_incremental_matches_batch_order(spark, keys, split):
    """Dictionary ids are dense 1..N in sorted key order, and feeding
    the keys in two batches (second batch continues from the first's
    dictionary) never moves an already-assigned id."""
    from matdb_spark.functions.encoders import dictionary_encode

    uniq = sorted(set(keys))
    df_all = spark.createDataFrame([(k, "s", "k") for k in uniq],
                                   "component string, sensor string, kind string")
    dim = dictionary_encode(df_all, ["component", "sensor", "kind"], id_col="id")
    got = {r["component"]: r["id"] for r in dim.collect()}
    assert got == {k: i + 1 for i, k in enumerate(uniq)}

    first, second = uniq[:split], uniq
    if not first:
        return
    df1 = spark.createDataFrame([(k, "s", "k") for k in first],
                                "component string, sensor string, kind string")
    dim1 = dictionary_encode(df1, ["component", "sensor", "kind"], id_col="id")
    df2 = spark.createDataFrame([(k, "s", "k") for k in second],
                                "component string, sensor string, kind string")
    dim2 = dictionary_encode(df2, ["component", "sensor", "kind"],
                             existing=dim1, id_col="id")
    ids1 = {r["component"]: r["id"] for r in dim1.collect()}
    ids2 = {r["component"]: r["id"] for r in dim2.collect()}
    assert all(ids2[k] == v for k, v in ids1.items()), "existing ids moved"
    assert sorted(ids2.values()) == list(range(1, len(second) + 1))
    new_keys = sorted(set(second) - set(first))
    assert [ids2[k] for k in new_keys] == list(
        range(len(first) + 1, len(second) + 1)
    ), "new keys not numbered in sorted order after the existing max"


_chunk_texts = st.lists(
    st.tuples(
        st.integers(0, 10_000),
        st.text(alphabet="ab c\t\n", max_size=60),
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda t: t[0],
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(rows=_chunk_texts, chunk=st.integers(2, 8), overlap=st.integers(0, 3))
def test_chunk_documents_matches_pure_python(spark, rows, chunk, overlap):
    """Chunking cross-checked against a pure-Python model of the HF
    stride convention: normalized tokens, starts every (chunk-overlap),
    a trailing window wholly inside the previous chunk is dropped;
    full coverage (every token appears in some chunk)."""
    import re

    from matdb_spark.operators.packing import chunk_documents

    if overlap >= chunk:
        return
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["n_chunk_tokens"], r["chunk_text"])
        for r in chunk_documents(df, "doc_id", "text", chunk, overlap).collect()
    }

    exp = {}
    step = chunk - overlap
    for doc_id, text in rows:
        toks = [t for t in re.sub(r"\s+", " ", text.lower()).strip().split(" ") if t]
        n = len(toks)
        if n == 0:
            continue
        covered = set()
        for idx, s in enumerate(range(0, n, step)):
            if s != 0 and not s + overlap < n:
                continue
            piece = toks[s : s + chunk]
            exp[(doc_id, idx)] = (len(piece), " ".join(piece))
            covered.update(range(s, min(s + chunk, n)))
        assert covered == set(range(n))  # model self-check: full coverage
    assert got == exp


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    corpus=st.lists(
        st.tuples(st.integers(0, 10_000), st.text(alphabet="abc de", max_size=40)),
        min_size=1,
        max_size=10,
        unique_by=lambda t: t[0],
    ),
    target=st.lists(
        st.tuples(st.integers(20_000, 30_000), st.text(alphabet="abc de", max_size=40)),
        min_size=1,
        max_size=5,
        unique_by=lambda t: t[0],
    ),
    buckets=st.sampled_from([16, 64]),
)
def test_importance_weights_match_pure_python(spark, corpus, target, buckets):
    """Selection weights are exact integers — the Spark result must
    EQUAL a pure-Python replay (md5 buckets, micro-nat quantization)
    on arbitrary text."""
    import hashlib
    import math
    import re

    from matdb_spark.operators import selection as S

    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    tdf = spark.createDataFrame(target, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["weight_unats"])
        for r in S.importance_weights(
            cdf, tdf, "doc_id", "text", num_buckets=buckets
        ).collect()
    }

    def grams(t):
        toks = [x for x in re.sub(r"\s+", " ", t.lower()).strip().split(" ") if x]
        return toks + [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % buckets

    cc, tc = {}, {}
    for rows, acc in ((corpus, cc), (target, tc)):
        for _, t in rows:
            for g in grams(t):
                acc[bucket(g)] = acc.get(bucket(g), 0) + 1
    ls = math.log(sum(cc.values()) + buckets)
    lt = math.log(sum(tc.values()) + buckets)
    lr = {
        b: math.floor(
            (math.log(tc.get(b, 0) + 1) - math.log(cc.get(b, 0) + 1) + ls - lt)
            * 1e6
            + 0.5
        )
        for b in range(buckets)
    }
    exp = {
        d: (len(grams(t)), sum(lr[bucket(g)] for g in grams(t)))
        for d, t in corpus
    }
    assert got == exp


# --------------------------------------------------- span dedup model
def _py_remove_spans(docs: dict[int, list[str]], n: int):
    """Pure-Python C4 span-removal model: keeper = (doc, pos)-first
    occurrence of each duplicated n-gram; every position covered by a
    non-keeper occurrence of a duplicated span is removed."""
    occ: dict[tuple, list[tuple[int, int]]] = {}
    for d in sorted(docs):
        w = docs[d]
        for i in range(len(w) - n + 1):
            occ.setdefault(tuple(w[i : i + n]), []).append((d, i))
    removed: dict[int, set[int]] = {d: set() for d in docs}
    for span, occs in occ.items():
        if len(occs) < 2:
            continue
        keeper = min(occs)
        for d, i in occs:
            if (d, i) != keeper:
                removed[d].update(range(i, i + n))
    return {
        d: (
            len(docs[d]),
            len(removed[d]),
            " ".join(w for j, w in enumerate(docs[d]) if j not in removed[d]),
        )
        for d in docs
    }


_span_docs = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=12),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(docs=_span_docs)
def test_remove_duplicate_spans_matches_python_model(spark, docs):
    from matdb_spark.operators.dedup import remove_duplicate_spans

    n = 3
    corpus = {i: w for i, w in enumerate(docs)}
    rows = [(i, " ".join(w)) for i, w in corpus.items()]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_words"], r["n_removed"], r["clean_text"])
        for r in remove_duplicate_spans(df, "doc_id", "text", n=n).collect()
    }
    # the engine's normalize() maps an empty doc to [''] (one empty
    # word) — mirror that in the model
    model = _py_remove_spans(
        {i: (w if w else [""]) for i, w in corpus.items()}, n
    )
    assert got == model


# ------------------------------------------------ semantic dedup model
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    vecs=st.lists(
        st.tuples(st.integers(-3, 3), st.integers(-3, 3)),
        min_size=1,
        max_size=10,
    )
)
def test_semantic_dedup_matches_python_model(spark, vecs):
    import math

    from matdb_spark.operators.similarity import semantic_dedup

    rows = [(i, [float(x), float(y)]) for i, (x, y) in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cell_id long, embedding array<double>"
    )
    thr = 0.9

    def unit(v):
        nrm = math.hypot(*v)
        return None if nrm == 0 else (v[0] / nrm, v[1] / nrm)

    # model: assign to the nearest centroid (ties -> lower cell id),
    # drop iff a LOWER-id cell-mate clears the threshold; zero-norm
    # vectors have NULL units -> null sims -> never assigned a real
    # best cell deterministically? they fall to cell of rn=1 by
    # (sim desc nulls last, cell asc) — mirror: cell 0.
    cell = {}
    for i, v in rows:
        u = unit(v[:])
        if u is None:
            cell[i] = 0
        else:
            s0, s1 = u[0], u[1]
            cell[i] = 0 if s0 >= s1 else 1
    kept = {}
    for i, v in rows:
        u = unit(v)
        drop = False
        for j, w in rows:
            if j >= i or cell[j] != cell[i]:
                continue
            uw = unit(w)
            if u is None or uw is None:
                continue
            if u[0] * uw[0] + u[1] * uw[1] >= thr:
                drop = True
        kept[i] = not drop
    got = {
        r["vec_id"]: (r["cell_id"], r["kept"])
        for r in semantic_dedup(df, cents, threshold=thr).collect()
    }
    assert {i: k for i, (c, k) in got.items()} == kept
    # cell assignment must match wherever the vector has a direction
    for i, v in rows:
        if unit(v) is not None:
            assert got[i][0] == cell[i], (i, v, got[i], cell[i])
