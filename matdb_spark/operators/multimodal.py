"""Multimodal columns: binary payloads with typed metadata.

Model (SURVEY north star: image/audio/video as first-class pipeline
data): an asset is an opaque ``binary`` payload column plus typed
metadata columns. All per-asset compute (decode, feature extraction,
resizing, frame sampling) runs as Arrow-batched ``mapInPandas``
pipelines — the Spark-side plumbing (schemas, batch shapes, partition
discipline, one-to-many frame explosion) is real and tested.

The codec layer is STUBBED: this container has no image/audio
libraries, so ``_decode_with_real_codec`` raises NotImplementedError
and every pipeline falls back to ``_fake_decode`` — a deterministic
pseudo-decoder keyed on the payload's md5, reproducible in any engine
(the oracle recomputes it in SQL). Swapping in PIL/ffmpeg means
replacing ONE function; every schema and plan stays identical.

Scale notes: mapInPandas streams Arrow batches — constant memory per
task regardless of partition size; payload bytes never pass through
the driver; compute parallelism = input partitions (ensure upstream
parallelism for single-file sources, see sources.tables.load_table).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: metadata carried alongside every payload
ASSET_META_FIELDS = [
    StructField("modality", StringType()),   # image | audio | video
    StructField("mime", StringType()),
    StructField("byte_len", LongType()),
    StructField("checksum", StringType()),   # md5 hex of the payload
]

DECODED_META_FIELDS = [
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_frames", IntegerType()),
    StructField("brightness", DoubleType()),  # mean luminance in [0,1]
]


def _decode_with_real_codec(payload: bytes) -> dict:
    """Real decode path — requires an image/video library that is NOT
    available in this environment. Kept as the single swap point."""
    raise NotImplementedError(
        "no codec library in this environment; pipelines use _fake_decode"
    )


def _fake_decode(payload: bytes) -> dict:
    """Deterministic pseudo-decode keyed on md5(payload): stands in for
    a codec so plumbing is testable and oracle-checkable. Matches the
    SQL form: hex pairs/quads of the digest drive each property."""
    h = hashlib.md5(payload).hexdigest()
    width = int(h[0:4], 16) % 512 + 16
    height = int(h[4:8], 16) % 512 + 16
    n_frames = int(h[8:10], 16) % 8 + 1
    brightness = round((int(h[10:12], 16) / 255.0), 6)
    return {
        "width": width,
        "height": height,
        "n_frames": n_frames,
        "brightness": brightness,
        "checksum": h,
    }


def _decode(payload: bytes) -> dict:
    try:
        return _decode_with_real_codec(payload)
    except NotImplementedError:
        return _fake_decode(payload)


def attach_payload(df: DataFrame, text_col: str = "text", modality: str = "image") -> DataFrame:
    """Stand-in asset builder for the synthetic corpus: utf-8 bytes of
    a text column become the binary payload (real pipelines read bytes
    from object storage via spark.read.format('binaryFile'))."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.withColumn("payload", payload).withColumn(
        "modality", F.lit(modality)
    ).withColumn("byte_len", F.octet_length("payload").cast("long"))


def decode_assets(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """(id, byte_len, checksum, width, height, n_frames, brightness)
    via mapInPandas — one Arrow batch in, one batch out, no shuffle."""
    out_schema = StructType(
        [StructField(id_col, df.schema[id_col].dataType), StructField("byte_len", LongType()),
         StructField("checksum", StringType())] + DECODED_META_FIELDS
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_decode(bytes(p)) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "byte_len": [len(bytes(p)) for p in pdf[payload_col]],
                    "checksum": [m["checksum"] for m in metas],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "n_frames": [m["n_frames"] for m in metas],
                    "brightness": [m["brightness"] for m in metas],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(decode_batches, out_schema)


def resize_plan(decoded: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize geometry (aspect-preserving, integer math — JVM-side; a
    real pipeline would re-encode payloads in a second mapInPandas)."""
    w, h = F.col("width"), F.col("height")
    scale_needed = F.greatest(w, h) > max_side
    # integer `div` (not float /) so boundary cases match any SQL twin
    new_w = F.when(~scale_needed, w).otherwise(
        F.when(w >= h, F.lit(max_side)).otherwise(F.expr(f"(width * {max_side}) div height"))
    ).cast("int")
    new_h = F.when(~scale_needed, h).otherwise(
        F.when(h > w, F.lit(max_side)).otherwise(F.expr(f"(height * {max_side}) div width"))
    ).cast("int")
    return decoded.withColumn("resized_w", new_w).withColumn("resized_h", new_h)


def sample_frames(
    decoded: DataFrame, id_col: str = "doc_id", every_ms: int = 1000
) -> DataFrame:
    """One row per sampled frame (video path): the one-to-many
    explosion is JVM-side (sequence + explode) — a real pipeline would
    then decode each (payload, frame_idx) pair in mapInPandas."""
    idx = F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx")
    return decoded.select(F.col(id_col), F.col("n_frames"), idx).withColumn(
        "frame_ts_ms", F.col("frame_idx") * every_ms
    )
