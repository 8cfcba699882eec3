"""Round-4 verdict items: catalog-schema reads (no footer-merge job on
evolved stores), bounded IVF probe caching, >=3-dimension schemas."""

import os
import shutil

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from matdb_spark.database import Database
from matdb_spark.schema import Dimension, Schema, Value

SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch"
)


def _jobs_in_group(spark, group, fn):
    """Run ``fn`` under a fresh job group and return the Spark job ids
    it triggered — the footer-merge/schema-inference detector: plan
    CONSTRUCTION must launch zero jobs under catalog-schema reads."""
    sc = spark.sparkContext
    sc.setJobGroup(group, group)
    try:
        out = fn()
    finally:
        sc.setJobGroup(None, None)
    tracker = sc.statusTracker()
    return list(tracker.getJobIdsForGroup(group)), out


def test_evolved_store_scan_runs_no_inference_job(spark, tmp_db_path):
    db = Database.create(
        spark,
        os.path.join(tmp_db_path, "evo"),
        Schema(dimensions=[Dimension("k", 100)], values=[Value("v")]),
    )
    with db.begin() as t:
        t.add_dataframe(spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"))
        t.commit()
    db.add_value_column("w", "double")
    with db.begin() as t:
        t.add_dataframe(
            spark.createDataFrame([(2, 22, 2.5), (3, 30, 3.5)], "k long, v long, w double")
        )
        t.commit()
    assert db.schema.epoch == 1

    # Building the snapshot plan on an evolved store must not launch a
    # single Spark job: the read schema comes from the catalog
    # (schema.json), never from parquet footers (mergeSchema used to
    # run an O(#files) distributed footer read here).
    jobs, snap = _jobs_in_group(spark, "r4-noinfer", lambda: db.snapshot())
    assert jobs == [], f"plan construction launched Spark jobs: {jobs}"

    rows = {r.k: (r.v, r.w) for r in snap.collect()}
    assert rows == {1: (10, None), 2: (22, 2.5), 3: (30, 3.5)}


def test_ivf_indexed_probe_cache_is_bounded(spark, tmp_path_factory):
    """Repeated ivf_topk_indexed calls must not accumulate pinned
    storage: the probe is localCheckpoint'ed (RDD-owned blocks,
    ContextCleaner-reclaimed), never persist'ed (CacheManager-pinned
    for the application's lifetime)."""
    from pyspark.sql import functions as F

    from matdb_spark.operators.similarity import ivf_topk_indexed, write_ivf_index
    from matdb_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("cell_id"), "embedding"
    )
    path = os.path.join(str(tmp_path_factory.mktemp("ivf")), "index")
    write_ivf_index(emb, cents, path)
    queries = emb.filter(F.col("vec_id") == 3)

    cache_manager = spark._jsparkSession.sharedState().cacheManager()
    assert cache_manager.isEmpty(), "precondition: cache manager not empty"
    first = None
    for _ in range(3):
        res = sorted(
            (r.query_id, r.neighbor_id, round(r.cos_sim, 9))
            for r in ivf_topk_indexed(spark, path, queries, k=5, nprobe=2).collect()
        )
        first = first or res
        assert res == first
    # nothing registered with the cache manager => nothing pinned
    assert cache_manager.isEmpty(), "ivf_topk_indexed leaked a persist"


# --- 4-dimension schemas end-to-end (verdict item 4) -----------------
# The reference declares N-d but only ever exercises 2-D (SURVEY §1.3,
# block.rs:57-62). These tests put a 4-dim mixed-type key — chunked
# long, chunked int, unchunked string, unchunked long — through the
# full lifecycle against a pure-Python oracle.

_4D_KEY = st.tuples(
    st.integers(min_value=-7, max_value=7),   # a: long, chunk 3 (negatives!)
    st.integers(min_value=0, max_value=9),    # b: int, chunk 4
    st.sampled_from(["red", "blue", "käse"]), # s: string, unchunked
    st.integers(min_value=0, max_value=4),    # c: long, unchunked
)
_4D_ROW = st.tuples(_4D_KEY, st.one_of(st.none(), st.integers(-50, 50)))
_4D_TXNS = st.lists(st.lists(_4D_ROW, min_size=1, max_size=10), min_size=1, max_size=4)


def _4d_schema() -> Schema:
    return Schema(
        dimensions=[
            Dimension("a", 3),
            Dimension("b", 4, type="int"),
            Dimension("s", type="string"),
            Dimension("c"),
        ],
        values=[Value("v")],
    )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(txns=_4D_TXNS, bounds=st.tuples(st.integers(-7, 7), st.integers(0, 9)))
def test_4d_lifecycle_matches_python_oracle(spark, txns, bounds):
    path = os.path.join(SCRATCH, "prop_4d_db")
    shutil.rmtree(path, ignore_errors=True)
    db = Database.create(spark, path, _4d_schema())

    model: dict[tuple, int] = {}
    for rows in txns:
        df = spark.createDataFrame(
            [(a, b, s, c, v) for (a, b, s, c), v in rows],
            "a long, b int, s string, c long, v long",
        )
        with db.begin() as t:
            t.add_dataframe(df)
            t.commit()
        for key, v in rows:  # within-txn: later row wins; None = delete
            model[key] = v
    live = {k: v for k, v in model.items() if v is not None}

    def as_dict(df):
        return {(r.a, r.b, r.s, r.c): r.v for r in df.collect()}

    # ordered scan: content + lexicographic 4-tuple order
    got_rows = db.begin().query(ordered=True).collect()
    assert {(r.a, r.b, r.s, r.c): r.v for r in got_rows} == live
    keys = [(r.a, r.b, r.s, r.c) for r in got_rows]
    assert keys == sorted(keys)

    # range scan bounded on BOTH chunked dims (driver-side manifest
    # pruning + partition pruning on two chunk axes at once)
    a_lo, b_hi = bounds
    rng = db.begin().query_range({"a": (a_lo, None), "b": (None, b_hi)}, ordered=False)
    assert as_dict(rng) == {
        k: v for k, v in live.items() if k[0] >= a_lo and k[1] <= b_hi
    }

    # point lookups: present and absent keys in one probe set
    probe = list(live)[:5] + [(99, 9, "red", 0)]
    pts = db.begin().query_points(probe, ordered=False)
    assert as_dict(pts) == {k: live[k] for k in probe if k in live}

    # compaction + vacuum are layout-only
    if db.compact() is not None:
        db.vacuum()
    assert as_dict(db.snapshot()) == live
    assert as_dict(
        db.begin().query_range({"a": (a_lo, None), "b": (None, b_hi)}, ordered=False)
    ) == {k: v for k, v in live.items() if k[0] >= a_lo and k[1] <= b_hi}


def test_4d_range_scan_prunes_manifest_files(spark):
    """The driver-side manifest file pruning must engage on BOTH chunk
    axes of a 4-dim store: a bounded scan selects only files whose
    __chunk_a AND __chunk_b directories intersect the bounds."""
    from matdb_spark.scan import _chunk_ranges, _select_manifest_files

    schema = _4d_schema()
    cr = _chunk_ranges(schema, {"a": (3, 5), "b": (0, 3)})
    assert cr == {"__chunk_a": (1, 1), "__chunk_b": (0, 0)}
    files = [
        "seg=0/__chunk_a=1/__chunk_b=0/f1.parquet",   # keep
        "seg=0/__chunk_a=1/__chunk_b=1/f2.parquet",   # pruned by b
        "seg=0/__chunk_a=0/__chunk_b=0/f3.parquet",   # pruned by a
        "seg=0/__chunk_a=-1/__chunk_b=0/f4.parquet",  # pruned by a (negative)
    ]
    assert _select_manifest_files(files, cr) == [files[0]]


def test_never_evolved_store_scan_runs_no_inference_job(spark, tmp_db_path):
    db = Database.create(
        spark,
        os.path.join(tmp_db_path, "plain"),
        Schema(dimensions=[Dimension("k", 100)], values=[Value("v")]),
    )
    with db.begin() as t:
        t.add_dataframe(spark.createDataFrame([(1, 10)], "k long, v long"))
        t.commit()
    jobs, snap = _jobs_in_group(spark, "r4-noinfer-plain", lambda: db.snapshot())
    assert jobs == []
    assert snap.collect()[0].v == 10


def test_chunk_documents_stride_semantics(spark):
    from matdb_spark.operators.packing import chunk_documents

    df = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),
            (2, "a b"),
            (3, ""),
            (4, None),
            (5, " ".join(f"x{i}" for i in range(9))),  # 9 toks: starts 0,3,6
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(df, "doc_id", "text", 4, overlap=1)
    rows = {(r["doc_id"], r["chunk_idx"]): (r["n_chunk_tokens"], r["chunk_text"]) for r in out.collect()}
    assert rows[(1, 0)] == (4, "t0 t1 t2 t3")
    assert rows[(1, 1)] == (4, "t3 t4 t5 t6")
    assert rows[(1, 2)] == (4, "t6 t7 t8 t9")
    assert (1, 3) not in rows  # start 9: 9+1 !< 10 -> contained, dropped
    assert rows[(2, 0)] == (2, "a b")
    assert not any(d in (3, 4) for d, _ in rows)
    assert rows[(5, 2)] == (3, "x6 x7 x8")
    # no shuffle in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    import pytest

    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", 4, overlap=4)
