"""Real pure-stdlib image codec (round-4 verdict item 5): BMP / PNM /
PNG decode with hand-computed expected luma, malformed-payload
fallback, and the Spark decode_assets pipeline over mixed real+text
payloads."""

from __future__ import annotations

import hashlib
import struct
import zlib

import pytest

from matdb_spark.operators import multimodal as M

LUMA = lambda r, g, b: 0.299 * r + 0.587 * g + 0.114 * b


def make_bmp_2x2() -> bytes:
    """24-bit bottom-up BMP: blue+green bottom row, red+white top."""
    px_rows = [
        bytes([255, 0, 0, 0, 255, 0]) + b"\x00\x00",      # BGR: blue, green
        bytes([0, 0, 255, 255, 255, 255]) + b"\x00\x00",  # BGR: red, white
    ]
    pixel_data = b"".join(px_rows)
    info = struct.pack(
        "<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0
    )
    off = 14 + 40
    return (
        b"BM" + struct.pack("<IHHI", off + len(pixel_data), 0, 0, off)
        + info + pixel_data
    )


def _chunk(t: bytes, b: bytes) -> bytes:
    return (
        struct.pack(">I", len(b)) + t + b
        + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)
    )


def make_png_rgb_2x2() -> bytes:
    """2x2 RGB PNG exercising filter types 0 (None) and 2 (Up):
    red, green / blue, white."""
    row0 = bytes([255, 0, 0, 0, 255, 0])
    final1 = bytes([0, 0, 255, 255, 255, 255])
    row1 = bytes([(f - u) & 0xFF for f, u in zip(final1, row0)])
    raw = b"\x00" + row0 + b"\x02" + row1
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def make_png_gray_filters_3x3() -> bytes:
    """3x3 grayscale PNG exercising filters 1 (Sub), 3 (Average),
    4 (Paeth); pixel values 10..90."""
    rows = [bytes([10, 20, 30]), bytes([40, 50, 60]), bytes([70, 80, 90])]

    def sub_f(row):
        return bytes([row[0]] + [(row[i] - row[i - 1]) & 0xFF for i in range(1, len(row))])

    def avg_f(row, prev):
        return bytes(
            [(row[i] - ((row[i - 1] if i > 0 else 0) + prev[i]) // 2) & 0xFF
             for i in range(len(row))]
        )

    def paeth_f(row, prev):
        out = []
        for i in range(len(row)):
            a = row[i - 1] if i > 0 else 0
            b, c = prev[i], prev[i - 1] if i > 0 else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out.append((row[i] - pred) & 0xFF)
        return bytes(out)

    raw = (
        b"\x01" + sub_f(rows[0])
        + b"\x03" + avg_f(rows[1], rows[0])
        + b"\x04" + paeth_f(rows[2], rows[1])
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 3, 8, 0, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def test_bmp_decode_exact():
    r = M._decode_with_real_codec(make_bmp_2x2())
    exp = (LUMA(0, 0, 255) + LUMA(0, 255, 0) + LUMA(255, 0, 0) + LUMA(255, 255, 255))
    assert (r["width"], r["height"], r["n_frames"]) == (2, 2, 1)
    assert r["brightness"] == round(exp / 4 / 255.0, 6) == 0.5
    assert r["checksum"] == hashlib.md5(make_bmp_2x2()).hexdigest()


def test_pnm_decode_exact():
    ppm = b"P6\n# comment\n2 1\n255\n" + bytes([255, 0, 0, 128, 128, 128])
    r = M._decode_with_real_codec(ppm)
    assert (r["width"], r["height"]) == (2, 1)
    assert r["brightness"] == round((LUMA(255, 0, 0) + 128) / 2 / 255.0, 6)

    pgm = b"P5 1 2 255 " + bytes([0, 255])
    r = M._decode_with_real_codec(pgm)
    assert (r["width"], r["height"]) == (1, 2)
    assert r["brightness"] == 0.5


def test_png_decode_exact_all_filters():
    r = M._decode_with_real_codec(make_png_rgb_2x2())
    exp = (LUMA(255, 0, 0) + LUMA(0, 255, 0) + LUMA(0, 0, 255) + LUMA(255, 255, 255))
    assert (r["width"], r["height"]) == (2, 2)
    assert r["brightness"] == round(exp / 4 / 255.0, 6) == 0.5

    r = M._decode_with_real_codec(make_png_gray_filters_3x3())
    assert (r["width"], r["height"]) == (3, 3)
    assert r["brightness"] == round(sum(range(10, 91, 10)) / 9 / 255.0, 6)


def test_png_palette_decode():
    # 2x1 palette PNG: entries red + white, indices 0, 1
    plte = bytes([255, 0, 0, 255, 255, 255])
    raw = b"\x00" + bytes([0, 1])
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0))
        + _chunk(b"PLTE", plte)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    r = M._decode_with_real_codec(png)
    assert (r["width"], r["height"]) == (2, 1)
    assert r["brightness"] == round((LUMA(255, 0, 0) + 255.0) / 2 / 255.0, 6)


def test_unrecognized_and_malformed_fall_back_to_fake():
    for payload in (b"plain text document", b"BM" + b"\x01" * 60, b"P6 9 9 255 ", b""):
        with pytest.raises(NotImplementedError):
            M._decode_with_real_codec(payload)
        assert M._decode(payload) == M._fake_decode(payload)


def test_interlaced_and_16bit_png_rejected():
    for depth, interlace in ((16, 0), (8, 1)):
        png = (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, depth, 0, 0, 0, interlace))
            + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
            + _chunk(b"IEND", b"")
        )
        with pytest.raises(NotImplementedError):
            M._decode_with_real_codec(png)


def test_decode_assets_mixed_real_and_text_payloads(spark):
    """The Spark pipeline routes real containers through the stdlib
    codec and text payloads through the deterministic fallback — one
    mapInPandas pass, per-row dispatch."""
    png, bmp, txt = make_png_rgb_2x2(), make_bmp_2x2(), b"some document text"
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(bmp)), (3, bytearray(txt))],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in M.decode_assets(df).collect()}
    assert (rows[1].width, rows[1].height, rows[1].brightness) == (2, 2, 0.5)
    assert (rows[2].width, rows[2].height, rows[2].brightness) == (2, 2, 0.5)
    fake = M._fake_decode(txt)
    assert (rows[3].width, rows[3].height) == (fake["width"], fake["height"])
    assert rows[1].checksum == hashlib.md5(png).hexdigest()
    assert rows[1].byte_len == len(png)


# ------------------------------------------------------------ WAV audio
def test_wav_round_trip_exact():
    samples = [0, 16384, -16384, 32767, -32768]
    wav = M.synth_wav(samples, sample_rate=8000)
    meta = M._decode_wav(wav)
    assert meta["channels"] == 1
    assert meta["sample_rate"] == 8000
    assert meta["n_samples"] == 5
    assert meta["duration_sec"] == round(5 / 8000, 6)
    expect_rms = (sum(s * s for s in samples) / 5) ** 0.5 / 32768.0
    assert meta["rms"] == round(expect_rms, 6)


def test_wav_chunk_walking_and_padding():
    """The parser must skip unknown chunks (incl. odd-length ones with
    their pad byte) rather than assume data starts at byte 44."""
    import struct

    wav = M.synth_wav([100, 200], sample_rate=16000)
    # splice an odd-length junk chunk between WAVE and fmt
    junk = b"junk" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad to even
    spliced = wav[:12] + junk + wav[12:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    meta = M._decode_wav(spliced)
    assert meta["n_samples"] == 2 and meta["sample_rate"] == 16000


def test_wav_rejects_non_pcm_and_non_riff():
    import struct

    with pytest.raises(NotImplementedError):
        M._decode_wav(b"not audio at all")
    wav = bytearray(M.synth_wav([1, 2, 3]))
    # flip the format tag to 3 (IEEE float) inside the fmt chunk
    fmt_at = wav.find(b"fmt ") + 8
    wav[fmt_at : fmt_at + 2] = struct.pack("<H", 3)
    with pytest.raises(NotImplementedError):
        M._decode_wav(bytes(wav))


def test_wav_empty_signal():
    meta = M._decode_wav(M.synth_wav([]))
    assert meta["n_samples"] == 0
    assert meta["duration_sec"] == 0.0
    assert meta["rms"] == 0.0


def test_audio_pipeline_over_spark(spark):
    df = spark.createDataFrame(
        [(1, "AB"), (2, ""), (3, None)], "doc_id long, text string"
    )
    rows = {
        r.doc_id: r
        for r in M.decode_audio_assets(M.attach_audio_payload(df)).collect()
    }
    assert rows[1].n_samples == 2
    # sample for 'A' (65) is 65*256; rms = sqrt(mean of squares)/32768
    exp = ((((65 * 256) ** 2 + (66 * 256) ** 2) / 2) ** 0.5) / 32768.0
    assert rows[1].rms == round(exp, 6)
    assert rows[1].byte_len == 70 + 4
    # empty and NULL text degrade to a zero-length (but valid) WAV
    for d in (2, 3):
        assert rows[d].n_samples == 0 and rows[d].rms == 0.0


def test_wav_malformed_chunks_degrade():
    import struct

    # fmt chunk CLAIMS 16 body bytes but the payload is truncated
    bad = b"RIFF" + struct.pack("<I", 20) + b"WAVE" + b"fmt " + struct.pack("<I", 16) + b"\x01\x00"
    with pytest.raises(NotImplementedError):
        M._decode_wav(bad)
    # duplicate data chunks: RIFF semantics, FIRST wins
    wav = M.synth_wav([1000, 2000])
    extra = b"data" + struct.pack("<I", 8) + struct.pack("<4h", 9, 9, 9, 9)
    doubled = wav + extra
    doubled = doubled[:4] + struct.pack("<I", len(doubled) - 8) + doubled[8:]
    assert M._decode_wav(doubled)["n_samples"] == 2


def test_wav_rms_half_tie_rounds_away(spark):
    """rms = k/128 lands exactly on a 6-decimal half tie; Python's
    banker's rounding would give ...812, SQL ROUND gives ...813 — the
    decoder must match SQL (the oracle's side)."""
    meta = M._decode_wav(M.synth_wav([65 * 256]))  # 'A' -> 65/128 exactly
    assert meta["rms"] == 0.507813
    # and the Spark pipeline tolerates a corrupt payload mid-batch
    df = spark.createDataFrame(
        [(1, bytearray(M.synth_wav([65 * 256]))), (2, bytearray(b"RIFFjunk"))],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in M.decode_audio_assets(df).collect()}
    assert rows[1].rms == 0.507813
    assert rows[2].sample_rate is None and rows[2].byte_len == 8


def _jpeg(sof_marker=0xC0, width=32, height=16, ncomp=3, extras=True):
    """Hand-assembled minimal JPEG marker stream: SOI, (APP0 + DQT +
    fill bytes if extras), SOF, SOS header, EOI — the structure the
    SOF walker must navigate."""
    import struct

    out = b"\xff\xd8"  # SOI
    if extras:
        out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00" * 6
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(64)  # DQT
        out += b"\xff"  # legal fill byte before the next marker
    comp = b"".join(bytes([i + 1, 0x11, 0]) for i in range(ncomp))
    out += bytes([0xFF, sof_marker]) + struct.pack(
        ">HBHHB", 8 + 3 * ncomp, 8, height, width, ncomp
    ) + comp
    out += b"\xff\xda" + struct.pack(">H", 6 + 2 * ncomp)  # SOS (truncated scan ok)
    out += b"\xff\xd9"  # EOI
    return out


def test_jpeg_sof_metadata_decode():
    meta = M._decode_with_real_codec(_jpeg())
    assert (meta["width"], meta["height"], meta["n_frames"]) == (32, 16, 1)
    assert meta["brightness"] is None  # metadata-only: no pixel decode
    import hashlib

    assert meta["checksum"] == hashlib.md5(_jpeg()).hexdigest()
    # progressive (SOF2) and grayscale both parse
    assert M._decode_with_real_codec(_jpeg(sof_marker=0xC2))["width"] == 32
    assert M._decode_with_real_codec(_jpeg(ncomp=1))["height"] == 16
    # bare stream without APP0/DQT parses too
    assert M._decode_with_real_codec(_jpeg(extras=False))["width"] == 32


def test_jpeg_malformed_falls_back_to_fake():
    # truncated mid-segment, DHT-only (no SOF), and DNL-deferred height
    # all degrade to the deterministic pseudo-decode
    for bad in (
        _jpeg()[:9],
        b"\xff\xd8\xff\xc4\x00\x04\x00\x00\xff\xd9",
        _jpeg(height=0),
    ):
        got = M._decode(bad)
        assert got == M._fake_decode(bad)


def test_jpeg_through_spark_pipeline(spark):
    df = spark.createDataFrame(
        [(1, bytearray(_jpeg())), (2, bytearray(b"not an image"))],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in M.decode_assets(df).collect()}
    assert (rows[1].width, rows[1].height) == (32, 16)
    assert rows[1].brightness is None
    assert rows[2].width is not None  # fake fallback still populates


def test_decode_total_on_arbitrary_bytes():
    """_decode must be TOTAL: any byte string — including ones that
    start with valid container magics and then lie about everything —
    decodes to the deterministic pseudo-decode rather than raising.
    At 100 TB one corrupt asset must degrade, not kill the job; this
    fuzzes the whole dispatch with seeded adversarial prefixes."""
    import random

    rng = random.Random(0xC0DEC)
    magics = [
        b"",
        b"BM",
        b"P5", b"P6",
        b"\x89PNG\r\n\x1a\n",
        b"\xff\xd8",
        b"\xff\xd8\xff\xe0",
        b"RIFF",
    ]
    for trial in range(300):
        body = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 64)))
        payload = magics[trial % len(magics)] + body
        got = M._decode(payload)  # must not raise
        assert set(got) == {
            "width", "height", "n_frames", "brightness", "checksum"
        }
        # a successful REAL decode reports positive dims; the fake
        # fallback always does — either way the contract holds
        assert got["width"] > 0 and got["height"] > 0


def test_audio_frame_features_framing_and_degradation(spark):
    """Partial tail frame kept with its true n_samples; malformed and
    multi-channel payloads emit ZERO rows instead of failing; exact
    integer energy/peak on a hand-computed signal."""
    import struct

    from matdb_spark.operators.multimodal import audio_frame_features, synth_wav

    # 5 samples, frame_len=4 -> frames of 4 and 1
    wav = synth_wav([100, -200, 300, -400, 500], sample_rate=8000)
    # stereo container (tag ok, channels=2) -> degraded, zero rows
    stereo = bytearray(synth_wav([1, 2, 3, 4]))
    fmt_off = stereo.find(b"fmt ") + 8
    struct.pack_into("<H", stereo, fmt_off + 2, 2)
    rows = [(1, bytes(wav)), (2, b"garbage"), (3, bytes(stereo))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        (r["doc_id"], r["frame_idx"]): r
        for r in audio_frame_features(df, "doc_id", frame_len=4).collect()
    }
    assert set(got) == {(1, 0), (1, 1)}
    f0, f1 = got[(1, 0)], got[(1, 1)]
    assert f0["n_samples"] == 4 and f1["n_samples"] == 1
    assert f0["energy"] == 100**2 + 200**2 + 300**2 + 400**2
    assert f0["peak"] == 400  # |-400|: peak is on the absolute value
    assert f1["energy"] == 500**2 and f1["peak"] == 500


def test_frame_features_total_on_arbitrary_bytes(spark):
    """audio_frame_features must be TOTAL at the task level: a batch
    of adversarial payloads (lying RIFF headers, truncated chunks,
    random bytes, NULLs) yields frame rows only for the decodable
    assets and never fails the task."""
    import random

    from matdb_spark.operators.multimodal import audio_frame_features, synth_wav

    rng = random.Random(0xFEA7)
    rows = [(0, bytes(synth_wav([1, 2, 3, 4, 5])))]  # one good asset
    for i in range(1, 60):
        body = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 64)))
        prefix = [b"", b"RIFF", b"RIFF\x00\x00\x00\x00WAVE", b"fmt "][i % 4]
        rows.append((i, prefix + body))
    rows.append((99, None))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = audio_frame_features(df, "doc_id", frame_len=4).collect()
    assert {r["doc_id"] for r in got} == {0}
    assert sorted(r["frame_idx"] for r in got) == [0, 1]
