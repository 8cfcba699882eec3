"""Multimodal plumbing tests: decode schema/determinism, resize
geometry, frame explosion, and Arrow batch streaming."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from matdb_spark.operators import multimodal as mm
from matdb_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_decode_matches_reference_impl(spark):
    docs = load_table(spark, SF, "documents").limit(20)
    decoded = mm.decode_assets(mm.attach_payload(docs, "text"), "doc_id")
    rows = {r["doc_id"]: r for r in decoded.collect()}
    for d in docs.select("doc_id", "text").collect():
        payload = d["text"].encode("utf-8")
        expect = mm._fake_decode(payload)
        got = rows[d["doc_id"]]
        assert got["checksum"] == hashlib.md5(payload).hexdigest()
        assert got["width"] == expect["width"]
        assert got["height"] == expect["height"]
        assert got["n_frames"] == expect["n_frames"]
        assert abs(got["brightness"] - expect["brightness"]) < 1e-12
        assert got["byte_len"] == len(payload)


def test_real_codec_is_stubbed():
    try:
        mm._decode_with_real_codec(b"xx")
        assert False, "expected NotImplementedError"
    except NotImplementedError:
        pass


def test_resize_geometry(spark):
    df = spark.createDataFrame(
        [(1, 512, 128), (2, 128, 512), (3, 100, 100), (4, 300, 300)],
        "doc_id long, width int, height int",
    )
    out = {r["doc_id"]: (r["resized_w"], r["resized_h"]) for r in mm.resize_plan(df, 256).collect()}
    assert out[1] == (256, 64)
    assert out[2] == (64, 256)
    assert out[3] == (100, 100)  # under the cap: untouched
    assert out[4] == (256, 256)


def test_frame_sampling_explosion(spark):
    docs = load_table(spark, SF, "documents")
    decoded = mm.decode_assets(mm.attach_payload(docs, "text"), "doc_id")
    frames = mm.sample_frames(decoded, "doc_id", every_ms=40)
    # explosion count == sum of n_frames; ts = idx * 40
    n_total = decoded.agg(F.sum("n_frames")).first()[0]
    assert frames.count() == n_total
    bad = frames.filter(F.col("frame_ts_ms") != F.col("frame_idx") * 40).count()
    assert bad == 0
