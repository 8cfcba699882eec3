"""Baseline JPEG luma decode (r6 verdict item 8 — multimodal.py
_decode_jpeg): brightness from the DC coefficients of a real Huffman
entropy scan, against hand-crafted baseline JPEGs whose exact mean is
known in closed form (block mean = DC·Q[0]/8 + 128 — only the (0,0)
DCT basis has a nonzero block sum). No image libraries exist in this
environment, so the fixtures are built from the T.81 spec directly:
custom minimal Huffman tables via DHT, flat-DC blocks, EOB-only AC.
"""

from __future__ import annotations

import pytest

from matdb_spark.operators import multimodal as M


def _seg(marker: int, body: bytes) -> bytes:
    return b"\xff" + bytes([marker]) + (len(body) + 2).to_bytes(2, "big") + body


def _dqt_unit() -> bytes:
    return _seg(0xDB, bytes([0x00]) + bytes([1] * 64))


def _dht(tc: int, th: int, counts: list[int], symbols: list[int]) -> bytes:
    return _seg(0xC4, bytes([(tc << 4) | th]) + bytes(counts) + bytes(symbols))


#: DC table 0: symbol 0 -> code '0' (len 1), symbol 2 -> code '10' (len 2)
_DC0 = _dht(0, 0, [1, 1] + [0] * 14, [0, 2])
#: AC table 0: EOB (0x00) -> code '0'
_AC0 = _dht(1, 0, [1] + [0] * 15, [0x00])


def _sof0(w: int, h: int) -> bytes:
    return _seg(0xC0, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
                + bytes([1, 1, 0x11, 0]))


_SOS = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))


def _jpeg(w: int, h: int, scan: bytes, extra_pre_sos: bytes = b"") -> bytes:
    return (
        b"\xff\xd8" + _dqt_unit() + _DC0 + _AC0 + _sof0(w, h)
        + extra_pre_sos + _SOS + scan + b"\xff\xd9"
    )


def test_flat_gray_block_exact():
    # DC diff 0 ('0') + EOB ('0') -> bits '00' padded with 1s = 0x3F
    r = M._decode_with_real_codec(_jpeg(8, 8, bytes([0x3F])))
    assert (r["width"], r["height"]) == (8, 8)
    # mean = 128 -> 128/255
    assert r["brightness"] == round(128 / 255.0, 6)


def test_nonzero_dc_exact():
    # DC: sym2 '10' + magnitude '11' (diff +3), EOB '0'
    # bits '10110' pad '111' = 0xB7; mean = 3/8 + 128 = 128.375
    r = M._decode_with_real_codec(_jpeg(8, 8, bytes([0xB7])))
    assert r["brightness"] == round(128.375 / 255.0, 6)


def test_negative_dc_extend():
    # diff category 2 with magnitude bits '00' EXTENDs to -3
    # bits: '10' '00' '0' -> '10000' pad '111' = 0x87
    r = M._decode_with_real_codec(_jpeg(8, 8, bytes([0x87])))
    assert r["brightness"] == round((128 - 3 / 8.0) / 255.0, 6)


def test_two_blocks_dc_prediction():
    # 16x8 -> two MCUs. Block1 diff +3 (pred 3), block2 diff 0 (pred 3)
    # bits: '10' '11' '0' | '0' '0' -> '1011000' pad '1' = 0xB1
    # mean = (3 + 3) / 8 / 2 + 128 = 128.375
    r = M._decode_with_real_codec(_jpeg(16, 8, bytes([0xB1])))
    assert (r["width"], r["height"]) == (16, 8)
    assert r["brightness"] == round(128.375 / 255.0, 6)


def test_restart_marker_resets_predictor():
    # DRI=1: a restart between the two MCUs; predictors reset, so the
    # second block's diff +3 lands at 3 again (not 6)
    dri = _seg(0xDD, (1).to_bytes(2, "big"))
    # MCU1: '10' '11' '0' pad -> 0xB7 ; RST0 ; MCU2: same 0xB7
    scan = bytes([0xB7]) + b"\xff\xd0" + bytes([0xB7])
    r = M._decode_with_real_codec(_jpeg(16, 8, scan, extra_pre_sos=dri))
    assert r["brightness"] == round(128.375 / 255.0, 6)


def test_progressive_stays_metadata_only():
    prog = (
        b"\xff\xd8" + _dqt_unit() + _DC0 + _AC0
        + _seg(0xC2, bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
               + bytes([1, 1, 0x11, 0]))
        + b"\xff\xd9"
    )
    r = M._decode_with_real_codec(prog)
    assert (r["width"], r["height"]) == (8, 8)
    assert r["brightness"] is None


def test_truncated_scan_degrades_to_metadata_only():
    """A broken scan costs brightness, never the already-parsed
    dimensions (a wrong number is worse than an absent one)."""
    bad = _jpeg(8, 8, b"")  # EOI arrives mid-MCU
    r = M._decode_with_real_codec(bad)
    assert (r["width"], r["height"]) == (8, 8)
    assert r["brightness"] is None


def test_brightness_matches_bmp_for_flat_gray():
    """Cross-codec consistency: a flat 128-gray image has the same
    brightness through the JPEG path as through the independently
    tested BMP path."""
    import struct

    w = h = 8
    row = bytes([128, 128, 128] * w)  # BGR, no padding needed (24*8%32==0)
    px = row * h
    header = struct.pack("<2sIHHI", b"BM", 54 + len(px), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(px), 0, 0, 0, 0)
    bmp = header + info + px
    rb = M._decode_with_real_codec(bmp)
    rj = M._decode_with_real_codec(_jpeg(8, 8, bytes([0x3F])))
    assert rb["brightness"] == rj["brightness"]
