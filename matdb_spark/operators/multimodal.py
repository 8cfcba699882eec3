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
    """Real decode path, pure stdlib (``struct`` + ``zlib``): BMP
    (uncompressed 24/32-bit), PNM (binary P5/P6), PNG (8-bit depth,
    gray / RGB / palette / +alpha, non-interlaced — full IDAT inflate +
    per-row unfilter, not just the IHDR header), and JPEG (SOF marker
    walk — dimensions/components, no entropy decode). Returns the same
    shape as ``_fake_decode``: width/height/n_frames/brightness/
    checksum, brightness = mean Rec.601 luma in [0, 1] (NULL for the
    metadata-only JPEG path).

    Unrecognized containers (e.g. the synthetic text payloads of the
    gate fixtures) and malformed files raise NotImplementedError so the
    pipeline falls back to the deterministic pseudo-decode — at 100 TB
    one corrupt asset must degrade, not kill the job. Swapping in
    PIL/ffmpeg for the long tail of formats still means replacing ONLY
    this function."""
    out = None
    try:
        if payload[:2] == b"BM":
            out = _decode_bmp(payload)
        elif payload[:1] == b"P" and payload[1:2] in b"56":
            out = _decode_pnm(payload)
        elif payload[:8] == b"\x89PNG\r\n\x1a\n":
            out = _decode_png(payload)
        elif payload[:2] == b"\xff\xd8":
            out = _decode_jpeg(payload)  # metadata only; brightness NULL
    except NotImplementedError:
        raise
    except Exception as e:  # truncated/corrupt file -> deterministic fallback
        raise NotImplementedError(f"malformed image payload: {e}") from e
    if out is None:
        raise NotImplementedError("unrecognized container; using _fake_decode")
    out["checksum"] = hashlib.md5(payload).hexdigest()
    return out


def _rgb_luma(r: int, g: int, b: int) -> float:
    return 0.299 * r + 0.587 * g + 0.114 * b


def _strided_luma(buf, r_off: int, g_off: int, b_off: int, step: int) -> float:
    """Rec.601 luma summed over interleaved samples via strided slices:
    ``sum(buf[off::step])`` runs in C, so a megapixel image costs three
    slice-sums instead of width*height Python-level _rgb_luma calls
    (~10-50x). Exact: the per-channel sums are integer-exact, and
    coeff*R + coeff*G + coeff*B is algebraically the per-pixel sum."""
    return (
        0.299 * sum(buf[r_off::step])
        + 0.587 * sum(buf[g_off::step])
        + 0.114 * sum(buf[b_off::step])
    )


def _decode_bmp(payload: bytes) -> dict:
    import struct

    if len(payload) < 54:
        raise NotImplementedError("BMP too short")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("pre-BITMAPINFOHEADER BMP")
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"unsupported BMP (bpp={bpp}, comp={compression})")
    height = abs(height)  # negative = top-down; row order is luma-invariant
    nbytes = bpp // 8
    stride = (nbytes * width + 3) // 4 * 4
    if len(payload) < data_off + stride * height:
        raise NotImplementedError("truncated BMP pixel data")
    luma = 0.0
    for row in range(height):
        base = data_off + row * stride
        seg = payload[base : base + nbytes * width]  # BGR(A) order
        luma += _strided_luma(seg, 2, 1, 0, nbytes)
    out = _dims_ok(width, height)
    out["brightness"] = round(luma / (width * height) / 255.0, 6)
    return out


def _dims_ok(width: int, height: int) -> dict:
    if width <= 0 or height <= 0:
        raise NotImplementedError("degenerate image dimensions")
    return {"width": int(width), "height": int(height), "n_frames": 1}


def _decode_pnm(payload: bytes) -> dict:
    """Binary PGM (P5, gray) / PPM (P6, RGB), 1-byte samples."""
    pos = 2
    vals: list[int] = []
    while len(vals) < 3:  # width, height, maxval
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos] not in b"\r\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    width, height, maxval = vals
    if not 0 < maxval < 256:
        raise NotImplementedError("2-byte-sample PNM")
    out = _dims_ok(width, height)
    n = width * height
    luma = 0.0
    if payload[1:2] == b"5":
        if len(payload) < pos + n:
            raise NotImplementedError("truncated PGM")
        luma = float(sum(payload[pos : pos + n]))
    else:
        if len(payload) < pos + 3 * n:
            raise NotImplementedError("truncated PPM")
        luma = _strided_luma(payload[pos : pos + 3 * n], 0, 1, 2, 3)
    # sample range [0, maxval] scales to [0, 1]
    out["brightness"] = round(luma / n / maxval, 6)
    return out


def _decode_png(payload: bytes) -> dict:
    """PNG: walk chunks, inflate IDAT, undo per-row filters (types
    0-4: None/Sub/Up/Average/Paeth — the complete set), mean luma.
    Supports bit depth 8, color types 0 gray / 2 RGB / 3 palette /
    4 gray+alpha / 6 RGBA, interlace 0 (alpha ignored for luma)."""
    import struct
    import zlib

    pos, ihdr, plte, idat = 8, None, b"", []
    while pos + 8 <= len(payload):
        ln, typ = struct.unpack_from(">I4s", payload, pos)
        body = payload[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif typ == b"PLTE":
            plte = body
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
        pos += 12 + ln  # len + type + crc
    if ihdr is None or not idat:
        raise NotImplementedError("PNG missing IHDR/IDAT")
    width, height, depth, ctype, _comp, _filt, interlace = ihdr
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if depth != 8 or channels is None or interlace != 0:
        raise NotImplementedError(
            f"unsupported PNG (depth={depth}, color={ctype}, interlace={interlace})"
        )
    raw = zlib.decompress(b"".join(idat))
    stride = channels * width
    if len(raw) < (stride + 1) * height:
        raise NotImplementedError("truncated PNG scanlines")
    if ctype == 3:
        # per-channel 256-entry lookup tables: translate() maps every
        # palette index to its channel byte in C, so palette rows cost
        # three translate+sum passes instead of a per-pixel dict walk
        plen = len(plte) // 3
        r_tab = bytes(plte[3 * i] for i in range(plen)).ljust(256, b"\x00")
        g_tab = bytes(plte[3 * i + 1] for i in range(plen)).ljust(256, b"\x00")
        b_tab = bytes(plte[3 * i + 2] for i in range(plen)).ljust(256, b"\x00")
    prev = bytearray(stride)
    luma = 0.0
    for row in range(height):
        base = row * (stride + 1)
        ftype = raw[base]
        line = bytearray(raw[base + 1 : base + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                c = prev[i - channels] if i >= channels else 0
                p = a + prev[i] - c
                pa, pb, pc = abs(p - a), abs(p - prev[i]), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (prev[i] if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise NotImplementedError(f"unknown PNG filter {ftype}")
        if ctype == 0:
            luma += float(sum(line))
        elif ctype == 4:
            luma += float(sum(line[0::2]))
        elif ctype == 3:
            if line and max(line) >= plen:
                raise NotImplementedError("palette index out of range")
            lb = bytes(line)
            luma += _rgb_luma(
                sum(lb.translate(r_tab)),
                sum(lb.translate(g_tab)),
                sum(lb.translate(b_tab)),
            )
        else:
            luma += _strided_luma(line, 0, 1, 2, channels)
        prev = line
    out = _dims_ok(width, height)
    out["brightness"] = round(luma / (width * height) / 255.0, 6)
    return out


class _JpegBits:
    """Entropy-segment bit reader: handles 0xFF00 byte stuffing and
    stops at (reporting) restart/terminating markers."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.cur = 0
        self.nbits = 0
        self.marker: int | None = None  # RSTn/EOI encountered

    def _fill(self) -> None:
        b = self.buf
        if self.pos >= len(b):
            raise NotImplementedError("JPEG entropy stream truncated")
        byte = b[self.pos]
        if byte == 0xFF:
            if self.pos + 1 >= len(b):
                raise NotImplementedError("JPEG entropy stream truncated")
            nxt = b[self.pos + 1]
            if nxt == 0x00:  # stuffed literal 0xFF
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7 or nxt == 0xD9:
                self.marker = nxt
                raise _JpegMarker()
            else:
                raise NotImplementedError(
                    f"unexpected marker 0xFF{nxt:02X} inside scan"
                )
        else:
            self.pos += 1
        self.cur = (self.cur << 8) | byte
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def resync(self) -> None:
        """Consume the pending RSTn and realign to a byte boundary."""
        self.pos += 2
        self.cur = 0
        self.nbits = 0
        self.marker = None


class _JpegMarker(Exception):
    """Internal: a marker interrupted bit reading (restart or EOI)."""


def _jpeg_huff(counts: list[int], symbols: list[int]) -> dict:
    """(length, code) -> symbol map per JPEG's canonical code
    assignment (ITU T.81 Annex C)."""
    table = {}
    code = 0
    i = 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            table[(ln, code)] = symbols[i]
            code += 1
            i += 1
        code <<= 1
    return table


def _jpeg_decode_symbol(bits: _JpegBits, table: dict) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | bits.bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise NotImplementedError("invalid JPEG Huffman code")


def _jpeg_extend(v: int, t: int) -> int:
    """Sign-extend a t-bit magnitude (T.81 F.2.2.1 EXTEND)."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _decode_jpeg(payload: bytes) -> dict:
    """Baseline JPEG decode for the asset card: dimensions from the
    SOF header plus ``brightness`` from a minimal BASELINE-DCT luma
    pass (r6 verdict item 8; ITU T.81 / the public JPEG spec only) —
    the full Huffman entropy stream is walked (DC + AC run-lengths,
    byte stuffing, restart markers), but no IDCT is needed: an 8×8
    block's mean equals DC·Q[0]/8 + 128 (only the (0,0) basis has a
    nonzero block sum), so mean luma = the Y component's dequantized
    DC average over its block grid. Brightness is therefore defined
    over the CODED grid — MCU padding at the right/bottom edges is
    included, the deterministic convention this metric documents.

    Baseline sequential (SOF0/SOF1) only: progressive and arithmetic
    frames raise NotImplementedError and fall back to metadata-only
    handling upstream, as does any truncated/desynced stream."""
    import struct

    pos = 2  # past SOI
    n = len(payload)
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], dict] = {}
    sof = None
    baseline = False
    restart_interval = 0
    while pos + 4 <= n:
        # skip fill bytes (0xFF padding before a marker is legal)
        if payload[pos] != 0xFF:
            raise NotImplementedError("JPEG marker desync")
        while pos < n and payload[pos] == 0xFF:
            pos += 1
        if pos >= n:
            break
        marker = payload[pos]
        pos += 1
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers carry no length
        if marker == 0xD9:  # EOI before any SOF
            break
        if pos + 2 > n:
            break
        (seglen,) = struct.unpack_from(">H", payload, pos)
        if seglen < 2 or pos + seglen > n:
            if sof is not None:
                # dimensions are already known; a broken tail costs
                # brightness, never the metadata
                out = _dims_ok(sof[0], sof[1])
                out["brightness"] = None
                return out
            raise NotImplementedError("truncated JPEG segment")
        body = payload[pos + 2 : pos + seglen]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if seglen < 8:
                raise NotImplementedError("short JPEG SOF")
            prec, height, width, ncomp = struct.unpack_from(">BHHB", body, 0)
            if height == 0:
                raise NotImplementedError("JPEG DNL-deferred height")
            if ncomp not in (1, 3, 4):
                raise NotImplementedError(f"JPEG components={ncomp}")
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * ci)
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            sof = (width, height, comps)
            baseline = marker in (0xC0, 0xC1) and prec == 8
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            off = 0
            while off + 17 <= len(body):
                tc_th = body[off]
                counts = list(body[off + 1 : off + 17])
                nsym = sum(counts)
                syms = list(body[off + 17 : off + 17 + nsym])
                if len(syms) < nsym:
                    raise NotImplementedError("truncated JPEG DHT")
                htables[(tc_th >> 4, tc_th & 0xF)] = _jpeg_huff(counts, syms)
                off += 17 + nsym
        elif marker == 0xDB:  # DQT (8-bit tables; 16-bit -> give up)
            off = 0
            while off < len(body):
                pq_tq = body[off]
                if pq_tq >> 4 != 0:
                    raise NotImplementedError("16-bit JPEG quant table")
                qtables[pq_tq & 0xF] = list(body[off + 1 : off + 65])
                off += 65
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS: entropy-coded scan follows
            if sof is None:
                break
            if baseline:
                try:
                    return _jpeg_scan_brightness(
                        payload, pos + seglen, sof, qtables, htables, body,
                        restart_interval,
                    )
                except (
                    NotImplementedError,
                    IndexError,
                    KeyError,  # SOS selectors not matching SOF ids
                    struct.error,
                ):
                    pass  # broken/unsupported scan: metadata-only below
            # progressive/12-bit/arithmetic, or an undecodable scan:
            # a wrong brightness is worse than an absent one
            out = _dims_ok(sof[0], sof[1])
            out["brightness"] = None
            return out
        pos += seglen
    if sof is not None:
        out = _dims_ok(sof[0], sof[1])
        out["brightness"] = None
        return out
    raise NotImplementedError("JPEG without SOF header")


def _jpeg_scan_brightness(
    payload: bytes,
    scan_pos: int,
    sof,
    qtables,
    htables,
    sos_body: bytes,
    restart_interval: int,
) -> dict:
    """Decode the baseline scan, summing the Y component's dequantized
    DC terms (T.81 F.2: DC diff coding + AC run-length skipping)."""
    width, height, comps = sof
    nsos = sos_body[0]
    if nsos != len(comps):
        raise NotImplementedError("JPEG non-interleaved scan")
    tsel = {}
    for i in range(nsos):
        cs, td_ta = sos_body[1 + 2 * i], sos_body[2 + 2 * i]
        tsel[cs] = (td_ta >> 4, td_ta & 0xF)
    hmax = max(h for _, h, _v, _ in comps)
    vmax = max(v for _, _h, v, _ in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    y_cid, y_h, y_v, y_tq = comps[0]
    if y_tq not in qtables:
        raise NotImplementedError("JPEG missing quant table")
    qdc = qtables[y_tq][0]
    bits = _JpegBits(payload, scan_pos)
    pred = {cid: 0 for cid, *_ in comps}
    dc_sum = 0
    nyblocks = 0
    mcu_count = 0
    try:
        for _ in range(mcux * mcuy):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                # the encoder pads to a byte boundary with 1-bits, then
                # emits RSTn: discard the padding, expect the marker
                bits.nbits = 0
                buf = bits.buf
                if not (
                    bits.pos + 1 < len(buf)
                    and buf[bits.pos] == 0xFF
                    and 0xD0 <= buf[bits.pos + 1] <= 0xD7
                ):
                    raise NotImplementedError("JPEG missing restart marker")
                bits.resync()
                pred = {cid: 0 for cid, *_ in comps}
            for cid, h, v, _tq in comps:
                td, ta = tsel[cid]
                dct = htables.get((0, td))
                act = htables.get((1, ta))
                if dct is None or act is None:
                    raise NotImplementedError("JPEG missing Huffman table")
                for _b in range(h * v):
                    t = _jpeg_decode_symbol(bits, dct)
                    diff = _jpeg_extend(bits.bits(t), t)
                    pred[cid] += diff
                    if cid == y_cid:
                        dc_sum += pred[cid]
                        nyblocks += 1
                    kpos = 1
                    while kpos < 64:
                        rs = _jpeg_decode_symbol(bits, act)
                        if rs == 0x00:  # EOB
                            break
                        if rs == 0xF0:  # ZRL: 16 zeros
                            kpos += 16
                            continue
                        kpos += (rs >> 4) + 1
                        bits.bits(rs & 0xF)  # AC magnitude: skip
            mcu_count += 1
    except _JpegMarker:
        raise NotImplementedError("JPEG scan ended early (marker mid-MCU)")
    if nyblocks == 0:
        raise NotImplementedError("JPEG scan decoded no luma blocks")
    mean = dc_sum * qdc / 8.0 / nyblocks + 128.0
    out = _dims_ok(width, height)
    out["brightness"] = round(min(max(mean, 0.0), 255.0) / 255.0, 6)
    return out


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


# ----------------------------------------------------------- audio WAV
def synth_wav(samples: list[int], sample_rate: int = 8000) -> bytes:
    """A complete little-endian RIFF/WAVE container around 16-bit PCM
    mono ``samples``: fmt chunk, a LIST/INFO chunk (so decoders must
    WALK chunks rather than assume data starts at byte 44), then data.
    Deterministic — the gate fixtures synthesize audio from text."""
    import struct

    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    info = b"INFOISFT" + struct.pack("<I", 6) + b"matdb\x00"
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"LIST" + struct.pack("<I", len(info)) + info
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _wav_pcm(payload: bytes):
    """Shared RIFF/WAVE chunk walk (word-aligned, unknown chunks
    skipped): returns (channels, rate, data bytes) for 16-bit PCM, or
    raises NotImplementedError on anything malformed — the single
    parser behind the stats decode and the frame-feature extractor."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE container")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, ln = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + ln]
        if cid == b"fmt ":
            if len(body) < 16:  # truncated or length-lying fmt chunk
                raise NotImplementedError("malformed WAV fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data" and data is None:  # RIFF: first data wins
            data = body
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise NotImplementedError("WAV missing fmt/data chunk")
    tag, channels, rate, _byte_rate, _block, bits = fmt
    if tag != 1 or bits != 16 or channels < 1 or rate < 1:
        raise NotImplementedError(f"unsupported WAV (tag={tag}, bits={bits})")
    return channels, rate, data


def _decode_wav(payload: bytes) -> dict:
    """Real RIFF/WAVE parse, pure stdlib: walk chunks (word-aligned,
    unknown chunks skipped), require PCM (format tag 1), decode the
    data chunk's int16 frames. Returns channels / sample_rate /
    n_samples (per channel) / duration_sec / rms (root-mean-square of
    the normalized [-1, 1) signal). Malformed chunk structure raises
    NotImplementedError (the degrade-don't-kill contract shared with
    the image codec)."""
    import math
    import struct

    channels, rate, data = _wav_pcm(payload)
    n_frames = len(data) // (2 * channels)
    total = len(data) // 2
    sq = 0
    if total:
        vals = struct.unpack(f"<{total}h", data[: 2 * total])
        for v in vals:
            sq += v * v
    rms = (sq / total) ** 0.5 / 32768.0 if total else 0.0
    # round HALF-AWAY (floor(x*1e6 + 0.5): exact for x in [0, 1e6) and
    # ulp <= 0.5): Python's round() is half-to-even, and on an exact
    # tie — e.g. a constant-tone signal whose rms is k/128 — it would
    # disagree with SQL engines' ROUND by one last digit
    r6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6
    return {
        "channels": channels,
        "sample_rate": rate,
        "n_samples": n_frames,
        "duration_sec": r6(n_frames / rate),
        "rms": r6(rms),
    }


AUDIO_META_FIELDS = [
    StructField("channels", IntegerType()),
    StructField("sample_rate", IntegerType()),
    StructField("n_samples", LongType()),
    StructField("duration_sec", DoubleType()),
    StructField("rms", DoubleType()),
]


def attach_audio_payload(
    df: DataFrame, text_col: str = "text", sample_rate: int = 8000
) -> DataFrame:
    """Deterministic audio fixture: each text codepoint becomes one
    16-bit PCM sample ((cp % 128) * 256), wrapped in a real WAV
    container via mapInPandas. Real pipelines read bytes from object
    storage (binaryFile); this builder exists so the decode path is
    exercised against payloads an oracle can reason about."""
    fields = [f for f in df.schema.fields]
    out_schema = StructType(fields + [StructField("payload", BinaryType())])
    cols = [f.name for f in fields]

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                synth_wav([(ord(c) % 128) * 256 for c in t], sample_rate)
                for t in pdf[text_col].fillna("").astype(str)
            ]
            out = {c: pdf[c].values for c in cols}
            out["payload"] = payloads
            yield pd.DataFrame(out)

    return df.mapInPandas(synth, out_schema)


def decode_audio_assets(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """(id, byte_len, channels, sample_rate, n_samples, duration_sec,
    rms) via mapInPandas — the audio twin of decode_assets, same Arrow
    batch shape, no shuffle. Malformed payloads yield null metadata
    (byte_len is still real), never a task failure."""
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            StructField("byte_len", LongType()),
        ]
        + AUDIO_META_FIELDS
    )

    def decode_one(p) -> dict:
        # degrade-don't-kill: one corrupt (or NULL — e.g. from an
        # outer join against unfetched assets) payload in a 100 TB
        # batch must yield a null-metadata row, not fail the task
        try:
            return _decode_wav(bytes(p))
        except (NotImplementedError, TypeError):
            return {f.name: None for f in AUDIO_META_FIELDS}

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_one(p) for p in pdf[payload_col]]
            out = {
                id_col: pdf[id_col].values,
                "byte_len": [None if p is None else len(bytes(p)) for p in pdf[payload_col]],
            }
            for f in AUDIO_META_FIELDS:
                out[f.name] = [m[f.name] for m in metas]
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(decode_batches, out_schema)


def audio_frame_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_len: int = 64,
) -> DataFrame:
    """Frame-level audio feature extraction (the brief's
    feature-extract step, the deterministic stand-in for a mel
    filterbank): split the mono PCM stream into non-overlapping
    ``frame_len``-sample frames (last frame may be partial) and emit
    per-frame (n_samples, energy, peak, rms_micro). energy and peak
    are exact integers; rms_micro = floor(sqrt(energy/n)/32768*1e6
    + 0.5) — IEEE sqrt is correctly rounded on every engine, and the
    half-away floor-quantization makes it cross-engine exact.

    mapInPandas, one Arrow batch in → one frame-rows batch out, no
    shuffle; numpy does the per-frame reductions, so cost is a
    vectorized pass over the samples. Multi-channel and malformed
    payloads degrade to ZERO rows for that asset (degrade-don't-kill;
    frames of half-frames from mixed channels would be garbage, not
    features)."""
    import math

    import numpy as np

    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            StructField("frame_idx", LongType()),
            StructField("n_samples", LongType()),
            StructField("energy", LongType()),
            StructField("peak", IntegerType()),
            StructField("rms_micro", LongType()),
        ]
    )

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fidx, ns, en, pk, rm = [], [], [], [], [], []
            for id_, p in zip(pdf[id_col], pdf[payload_col]):
                try:
                    channels, _rate, data = _wav_pcm(bytes(p))
                    if channels != 1:
                        raise NotImplementedError("frame features are mono-only")
                except (NotImplementedError, TypeError):
                    continue
                s = np.frombuffer(data[: (len(data) // 2) * 2], dtype="<i2")
                for i in range(0, len(s), frame_len):
                    fr = s[i : i + frame_len].astype(np.int64)
                    n = int(fr.size)
                    e = int((fr * fr).sum())
                    ids.append(id_)
                    fidx.append(i // frame_len)
                    ns.append(n)
                    en.append(e)
                    pk.append(int(np.abs(fr).max()))
                    rm.append(
                        int(math.floor(math.sqrt(e / n) / 32768.0 * 1e6 + 0.5))
                    )
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype=pdf[id_col].dtype)
                    if ids
                    else pd.Series([], dtype=pdf[id_col].dtype),
                    "frame_idx": pd.Series(fidx, dtype="int64"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "energy": pd.Series(en, dtype="int64"),
                    "peak": pd.Series(pk, dtype="int32"),
                    "rms_micro": pd.Series(rm, dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(frame_batches, out_schema)


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

    _null_meta = {"checksum": None, "width": None, "height": None,
                  "n_frames": None, "brightness": None}

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payloads (outer joins, failed fetches) decode to
            # null metadata, never a task failure
            metas = [_null_meta if p is None else _decode(bytes(p)) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "byte_len": [None if p is None else len(bytes(p)) for p in pdf[payload_col]],
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
