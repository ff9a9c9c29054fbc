"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

The Spark-side plumbing (schemas, batch iteration, partition sizing, UDF
signatures) is real and tested, and so is decode — stdlib-only, no
PIL/ffmpeg:

- CONTAINER headers: :func:`image_header_dims` (PNG/JPEG/GIF/BMP
  dimensions), :func:`audio_header_info` (WAV channel/rate/duration),
  :func:`video_header_info` (MP4 mvhd duration).
- PIXELS: :func:`png_decode_pixels` (zlib inflate + all 5 unfilters),
  :func:`bmp_decode_pixels`, :func:`gif_decode_pixels` (LZW), and
  :func:`jpeg_decode_pixels` (baseline SOF0 — Huffman + IDCT, validated
  against a spec-side encoder in tests/test_jpeg_decode.py).
- SAMPLES: :func:`wav_decode_samples` (PCM16), and MP4 frame SEEK via
  :func:`mp4_sample_table` (stts/stsz/stsc/stco → per-sample
  time/offset/size).

``decode_stub='real'`` routes through these; ``'deterministic'`` produces
a seeded fake for schema-only tests; ``'raise'`` raises
:class:`CodecIntegrationPoint` at the three deliberate codec boundaries
(entropy bitstreams: MP3/AAC audio, inter-frame video, vendor image
codecs) — a CLOSED scope decision, see the exception docstring and
COVERAGE.md "entropy-codec scope closure".

Scale notes: media rows are large and few per partition —
``spark.sql.files.maxPartitionBytes`` should be lowered (e.g. 32 MB) when
scanning media parquet so a batch of decoded frames fits executor memory.
"""

from __future__ import annotations

import math

import hashlib
import sys
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

class CodecIntegrationPoint(RuntimeError):
    """Deliberate, CLOSED scope boundary: entropy-codec bitstream decode
    (MP3/AAC Huffman audio, H.264/VP9 inter-frame video, vendor image
    codecs) is where a production deployment links a native library
    (ffmpeg/libavcodec), not where a pure-stdlib engine reimplements
    thousands of lines of licensed, SIMD-dependent codec logic. The
    decision is owned here rather than left open: everything UP TO the
    boundary is real stdlib decode (container seek, frame tables, PCM
    samples, pixel codecs — see the module docstring), and this
    environment ships no reference decoder to validate a from-scratch
    entropy decoder against, so implementing one would produce
    unverifiable output — strictly worse than an explicit, catchable
    boundary. Raised only in ``decode_stub='raise'`` mode, whose purpose
    is to make an unintegrated codec a hard, attributable failure
    instead of a silent NULL."""


MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField("mime_type", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("content_sha256", StringType(), True),
        StructField("features", ArrayType(DoubleType()), True),
    ]
)


def image_header_dims(payload: bytes | None) -> tuple[str, int, int] | None:
    """REAL stdlib-only image decode (container headers): returns
    (format, width, height) for PNG / JPEG / GIF / BMP payloads, None for
    anything unparseable. This is the working non-stub decoder behind the
    Arrow integration points — pixel decode still needs PIL/ffmpeg, but
    dimensions/format (the metadata a curation pipeline filters on) come
    straight from the bytes.

    PNG: 8-byte signature, IHDR width/height big-endian at offsets 16/20.
    GIF: 'GIF87a'/'GIF89a', logical screen w/h little-endian at 6/8.
    BMP: 'BM', BITMAPINFOHEADER signed little-endian w/h at 18/22
    (negative height = top-down rows; dimensions are the magnitudes).
    JPEG: walk the segment chain from SOI to the first SOFn marker
    (skipping non-frame segments and 0xFF fill bytes); height/width are
    big-endian at +5/+7 inside the frame header."""
    p = payload
    if p is None or len(p) < 10:
        return None
    if p[:8] == b"\x89PNG\r\n\x1a\n" and len(p) >= 24 and p[12:16] == b"IHDR":
        return (
            "png",
            int.from_bytes(p[16:20], "big"),
            int.from_bytes(p[20:24], "big"),
        )
    if p[:6] in (b"GIF87a", b"GIF89a"):
        return (
            "gif",
            int.from_bytes(p[6:8], "little"),
            int.from_bytes(p[8:10], "little"),
        )
    if p[:2] == b"BM" and len(p) >= 26:
        w = int.from_bytes(p[18:22], "little", signed=True)
        h = int.from_bytes(p[22:26], "little", signed=True)
        return ("bmp", abs(w), abs(h))
    if p[:2] == b"\xff\xd8":
        pos = 2
        n = len(p)
        # SOF0-SOF15 carry dimensions, except DHT(C4)/DNL(C8)/DAC(CC)
        sof = {m for m in range(0xC0, 0xD0)} - {0xC4, 0xC8, 0xCC}
        while pos + 4 <= n:
            if p[pos] != 0xFF:
                return None  # corrupt chain
            marker = p[pos + 1]
            if marker == 0xFF:  # fill byte
                pos += 1
                continue
            if 0xD0 <= marker <= 0xD9:  # RST/SOI/EOI: no length field
                pos += 2
                continue
            seglen = int.from_bytes(p[pos + 2 : pos + 4], "big")
            if marker in sof:
                if pos + 9 > n:
                    return None
                h = int.from_bytes(p[pos + 5 : pos + 7], "big")
                w = int.from_bytes(p[pos + 7 : pos + 9], "big")
                return ("jpeg", w, h)
            pos += 2 + seglen
        return None
    return None


_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples per pixel


def png_decode_pixels(
    payload: bytes | None,
) -> tuple[int, int, int, bytearray] | None:
    """FULL PNG pixel decode, stdlib only (zlib IDAT inflate + per-scanline
    unfilter): returns (width, height, n_channels, pixels) with ``pixels``
    the row-major interleaved 8-bit samples, or None for anything that is
    not an 8-bit non-interlaced PNG of color type 0/2/4/6 (palette and
    16-bit variants would need a second lookup/scale pass; JPEG/GIF stay
    header-only — their entropy coders are not in the stdlib).

    This is the real decode behind the previously-stubbed integration
    points: filters 0-4 (None/Sub/Up/Average/Paeth) per the PNG spec §9.
    Pure-Python unfiltering is fine for the fixture/test scale it runs at;
    a production deployment swaps this kernel for PIL/libpng while keeping
    the Arrow dataflow (schema, batching, partitioning) identical."""
    import zlib

    p = payload
    if p is None or len(p) < 33 or p[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    if p[12:16] != b"IHDR":
        return None
    width = int.from_bytes(p[16:20], "big")
    height = int.from_bytes(p[20:24], "big")
    bit_depth, color_type, _comp, _filt, interlace = p[24:29]
    if bit_depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
        return None
    ch = _PNG_CHANNELS[color_type]
    # walk chunks, concatenate IDAT
    idat = bytearray()
    pos = 8
    n = len(p)
    while pos + 8 <= n:
        clen = int.from_bytes(p[pos : pos + 4], "big")
        ctype = p[pos + 4 : pos + 8]
        if ctype == b"IDAT":
            idat += p[pos + 8 : pos + 8 + clen]
        if ctype == b"IEND":
            break
        pos += 12 + clen  # len + type + data + crc
    if not idat:
        return None
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = width * ch
    if len(raw) != height * (stride + 1):
        return None
    out = bytearray(height * stride)
    prev_row_start = -1
    for y in range(height):
        fpos = y * (stride + 1)
        ftype = raw[fpos]
        rs = y * stride
        line = raw[fpos + 1 : fpos + 1 + stride]
        if ftype == 0:  # None
            out[rs : rs + stride] = line
        elif ftype == 1:  # Sub
            for i in range(stride):
                left = out[rs + i - ch] if i >= ch else 0
                out[rs + i] = (line[i] + left) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                up = out[prev_row_start + i] if y > 0 else 0
                out[rs + i] = (line[i] + up) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = out[rs + i - ch] if i >= ch else 0
                up = out[prev_row_start + i] if y > 0 else 0
                out[rs + i] = (line[i] + ((left + up) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = out[rs + i - ch] if i >= ch else 0
                up = out[prev_row_start + i] if y > 0 else 0
                ul = out[prev_row_start + i - ch] if (y > 0 and i >= ch) else 0
                pa, pb, pc = abs(up - ul), abs(left - ul), abs(left + up - 2 * ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                out[rs + i] = (line[i] + pred) & 0xFF
        else:
            return None
        prev_row_start = rs
    return width, height, ch, out


def png_resize_nearest(
    decoded: tuple[int, int, int, bytearray], target_w: int, target_h: int
) -> bytes:
    """Nearest-neighbor resample of :func:`png_decode_pixels` output to
    (target_w, target_h); returns interleaved 8-bit samples. Center-aligned
    source sampling (the classic (i + 0.5) * scale mapping)."""
    w, h, ch, px = decoded
    out = bytearray(target_w * target_h * ch)
    for ty in range(target_h):
        sy = min(h - 1, (2 * ty + 1) * h // (2 * target_h))
        for tx in range(target_w):
            sx = min(w - 1, (2 * tx + 1) * w // (2 * target_w))
            s = (sy * w + sx) * ch
            d = (ty * target_w + tx) * ch
            out[d : d + ch] = px[s : s + ch]
    return bytes(out)


def bmp_decode_pixels(
    payload: bytes | None,
) -> tuple[int, int, int, bytearray] | None:
    """FULL BMP pixel decode, stdlib only: 24-bit uncompressed
    BITMAPINFOHEADER bitmaps (the overwhelmingly common raw-BMP case).
    Returns (width, height, 3, row-major interleaved RGB samples) — rows
    re-ordered top-down and channels swapped from the file's bottom-up BGR
    so the output convention matches :func:`png_decode_pixels`. None for
    anything else (palette/compressed/16|32-bit variants stay header-only)."""
    p = payload
    if p is None or len(p) < 54 or p[:2] != b"BM":
        return None
    data_off = int.from_bytes(p[10:14], "little")
    w = int.from_bytes(p[18:22], "little", signed=True)
    h = int.from_bytes(p[22:26], "little", signed=True)
    bpp = int.from_bytes(p[28:30], "little")
    compression = int.from_bytes(p[30:34], "little")
    if w <= 0 or h == 0 or bpp != 24 or compression != 0:
        return None
    top_down = h < 0
    height = abs(h)
    stride = (w * 3 + 3) & ~3
    if data_off + stride * height > len(p):
        return None
    out = bytearray(w * height * 3)
    for row in range(height):
        src = data_off + (row if top_down else height - 1 - row) * stride
        d = row * w * 3
        for x in range(w):
            s = src + x * 3
            out[d + x * 3] = p[s + 2]      # R
            out[d + x * 3 + 1] = p[s + 1]  # G
            out[d + x * 3 + 2] = p[s]      # B
    return w, height, 3, out


_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

_IDCT_COS = [
    [
        __import__("math").cos((2 * x + 1) * u * __import__("math").pi / 16)
        * (0.35355339059327373 if u == 0 else 0.5)
        for u in range(8)
    ]
    for x in range(8)
]


def _jpeg_idct_block(coef: list[float]) -> list[int]:
    """Separable 8x8 inverse DCT (double precision) + level shift + clamp."""
    tmp = [0.0] * 64
    for y in range(8):
        row = coef[y * 8 : y * 8 + 8]
        for x in range(8):
            c = _IDCT_COS[x]
            tmp[y * 8 + x] = (
                row[0] * c[0] + row[1] * c[1] + row[2] * c[2] + row[3] * c[3]
                + row[4] * c[4] + row[5] * c[5] + row[6] * c[6] + row[7] * c[7]
            )
    out = [0] * 64
    for x in range(8):
        col = [tmp[y * 8 + x] for y in range(8)]
        for y in range(8):
            c = _IDCT_COS[y]
            v = (
                col[0] * c[0] + col[1] * c[1] + col[2] * c[2] + col[3] * c[3]
                + col[4] * c[4] + col[5] * c[5] + col[6] * c[6] + col[7] * c[7]
            )
            iv = int(v + 128.5) if v >= -128.5 else 0
            out[y * 8 + x] = 0 if iv < 0 else (255 if iv > 255 else iv)
    return out


class _JpegBitReader:
    """MSB-first entropy-segment reader with 0xFF00 byte unstuffing; stops
    cleanly at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> bool:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                return self.nbits > 0
            b = d[self.pos]
            if b == 0xFF:
                if self.pos + 1 < len(d) and d[self.pos + 1] == 0x00:
                    self.pos += 2
                elif self.pos + 1 < len(d) and 0xD0 <= d[self.pos + 1] <= 0xD7:
                    # restart marker: consumed by the MCU loop, not here
                    return self.nbits > 0
                else:
                    return self.nbits > 0
            else:
                self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | b
            self.nbits += 8
        return True

    def read_bit(self) -> int | None:
        if self.nbits == 0 and not self._fill():
            return None
        if self.nbits == 0:
            return None
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int | None:
        v = 0
        for _ in range(n):
            b = self.read_bit()
            if b is None:
                return None
            v = (v << 1) | b
        return v

    def align_restart(self) -> bool:
        """Skip to just past the next RSTn marker; drop buffered bits."""
        self.bitbuf = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return True
            self.pos += 1
        return False


def _jpeg_huff_decode(reader: _JpegBitReader, table: dict[tuple[int, int], int]):
    code = 0
    length = 0
    while length < 16:
        b = reader.read_bit()
        if b is None:
            return None
        code = (code << 1) | b
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    return None


def _jpeg_extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def jpeg_decode_pixels(
    payload: bytes | None,
) -> tuple[int, int, int, bytearray] | None:
    """FULL baseline JPEG decode, stdlib only: 8-bit baseline sequential
    DCT (SOF0), canonical Huffman entropy coding, dequantize + de-zigzag +
    double-precision IDCT, nearest-neighbor chroma upsample, BT.601
    YCbCr→RGB. Grayscale (1 component) and color (3 components, any
    sampling factors ≤ 2) are supported; restart intervals handled.
    Returns (width, height, channels, row-major samples) or None for
    progressive/arithmetic/12-bit streams and corrupt payloads.

    Validated in tests against a spec-side ENCODER (forward DCT + Annex K
    Huffman tables written independently in the test): flat blocks decode
    exactly, textured images within quantization error. Pure-Python IDCT
    is test-scale only; production swaps libjpeg-turbo behind the same
    Arrow kernel."""
    p = payload
    if p is None or len(p) < 4 or p[:2] != b"\xff\xd8":
        return None
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (w, h, comps) comps: list of (cid, hs, vs, tq)
    scan_map = None  # cid -> (dc_table, ac_table)
    restart_interval = 0
    pos = 2
    n = len(p)
    while pos + 4 <= n:
        if p[pos] != 0xFF:
            return None
        marker = p[pos + 1]
        if marker == 0xD8:
            pos += 2
            continue
        seglen = int.from_bytes(p[pos + 2 : pos + 4], "big")
        body = p[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                if pq != 0:
                    return None  # 16-bit tables: not baseline-8
                qt[tq] = [body[i + 1 + k] for k in range(64)]
                i += 65
        elif marker == 0xC0:  # SOF0 baseline
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            comps = []
            for c in range(nc):
                cid = body[6 + c * 3]
                hs, vs = body[7 + c * 3] >> 4, body[7 + c * 3] & 15
                comps.append((cid, hs, vs, body[8 + c * 3]))
            frame = (w, h, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None  # non-baseline frame types
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                counts = body[i + 1 : i + 17]
                syms = body[i + 17 : i + 17 + sum(counts)]
                table: dict[tuple[int, int], int] = {}
                code = 0
                k = 0
                for length in range(1, 17):
                    for _ in range(counts[length - 1]):
                        table[(length, code)] = syms[k]
                        code += 1
                        k += 1
                    code <<= 1
                huff[(tc, th)] = table
                i += 17 + sum(counts)
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_map = {}
            for s in range(ns):
                cid = body[1 + s * 2]
                scan_map[cid] = (body[2 + s * 2] >> 4, body[2 + s * 2] & 15)
            pos = pos + 2 + seglen
            break
        pos += 2 + seglen
    if frame is None or scan_map is None:
        return None
    w, h, comps = frame
    if w == 0 or h == 0 or len(comps) not in (1, 3):
        return None
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2 or hmax < 1 or vmax < 1:
        return None
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    planes = {}
    pw = {}
    ph = {}
    for cid, hs, vs, tq in comps:
        pw[cid] = mcus_x * hs * 8
        ph[cid] = mcus_y * vs * 8
        planes[cid] = bytearray(pw[cid] * ph[cid])
    reader = _JpegBitReader(p, pos)
    dc_pred = {cid: 0 for cid, _, _, _ in comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                if not reader.align_restart():
                    return None
                dc_pred = {cid: 0 for cid, _, _, _ in comps}
            mcu_count += 1
            for cid, hs, vs, tq in comps:
                if tq not in qt or (0, scan_map[cid][0]) not in huff or (
                    1, scan_map[cid][1]
                ) not in huff:
                    return None
                q = qt[tq]
                dct = huff[(0, scan_map[cid][0])]
                act = huff[(1, scan_map[cid][1])]
                for by in range(vs):
                    for bx in range(hs):
                        s = _jpeg_huff_decode(reader, dct)
                        if s is None:
                            return None
                        if s == 0:
                            diff = 0
                        else:
                            bits = reader.read_bits(s)
                            if bits is None:
                                return None
                            diff = _jpeg_extend(bits, s)
                        dc_pred[cid] += diff
                        coef = [0.0] * 64
                        coef[0] = dc_pred[cid] * q[0]
                        k = 1
                        while k < 64:
                            rs = _jpeg_huff_decode(reader, act)
                            if rs is None:
                                return None
                            r, size = rs >> 4, rs & 15
                            if size == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                return None
                            bits = reader.read_bits(size)
                            if bits is None:
                                return None
                            coef[_ZIGZAG[k]] = _jpeg_extend(bits, size) * q[k]
                            k += 1
                        block = _jpeg_idct_block(coef)
                        px0 = (mx * hs + bx) * 8
                        py0 = (my * vs + by) * 8
                        plane = planes[cid]
                        stride = pw[cid]
                        for yy in range(8):
                            row0 = (py0 + yy) * stride + px0
                            plane[row0 : row0 + 8] = bytes(
                                block[yy * 8 : yy * 8 + 8]
                            )
    if len(comps) == 1:
        cid = comps[0][0]
        stride = pw[cid]
        out = bytearray(w * h)
        for y in range(h):
            out[y * w : (y + 1) * w] = planes[cid][y * stride : y * stride + w]
        return w, h, 1, out
    # color: upsample each plane to full resolution, then YCbCr -> RGB
    full = {}
    for cid, hs, vs, tq in comps:
        sx, sy = hmax // hs, vmax // vs
        plane = planes[cid]
        stride = pw[cid]
        if sx == 1 and sy == 1:
            full[cid] = (plane, stride)
        else:
            up = bytearray(mcus_x * mcu_w * mcus_y * mcu_h)
            ustride = mcus_x * mcu_w
            for y in range(mcus_y * mcu_h):
                src_row = (y // sy) * stride
                drow = y * ustride
                for x in range(ustride):
                    up[drow + x] = plane[src_row + (x // sx)]
            full[cid] = (up, ustride)
    (yid, _, _, _), (cbid, _, _, _), (crid, _, _, _) = comps
    yp, ystride = full[yid]
    cbp, cbstride = full[cbid]
    crp, crstride = full[crid]
    out = bytearray(w * h * 3)
    for y in range(h):
        yr, cbr, crr = y * ystride, y * cbstride, y * crstride
        orow = y * w * 3
        for x in range(w):
            Y = yp[yr + x]
            Cb = cbp[cbr + x] - 128
            Cr = crp[crr + x] - 128
            r = int(Y + 1.402 * Cr + 0.5)
            g = int(Y - 0.344136 * Cb - 0.714136 * Cr + 0.5)
            b = int(Y + 1.772 * Cb + 0.5)
            out[orow + x * 3] = 0 if r < 0 else (255 if r > 255 else r)
            out[orow + x * 3 + 1] = 0 if g < 0 else (255 if g > 255 else g)
            out[orow + x * 3 + 2] = 0 if b < 0 else (255 if b > 255 else b)
    return w, h, 3, out


def _gif_lzw_decode(
    data: bytes, min_code_size: int, max_pixels: int
) -> bytearray | None:
    """GIF-variant LZW decode (LSB-first bit packing, CLEAR/END codes,
    code width grows when the table fills, capped at 12 bits — giflib's
    non-early-change convention)."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    bitpos = 0
    nbits = len(data) * 8
    while bitpos + code_size <= nbits and len(out) < max_pixels:
        byte_i = bitpos >> 3
        chunk = int.from_bytes(data[byte_i : byte_i + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table) and code != clear and code != end:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            return None
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    return out


def gif_decode_pixels(
    payload: bytes | None,
) -> tuple[int, int, int, bytearray] | None:
    """FULL GIF pixel decode, stdlib only: first image frame of a
    GIF87a/GIF89a (global or local color table, optional interlacing)
    through a pure-Python GIF-LZW inflate. Returns (width, height, 3,
    row-major RGB) in the frame's own dimensions, or None for
    corrupt/truncated payloads. Animation frames beyond the first and
    transparency compositing are out of scope — the curation pipeline's
    decode target is the representative bitmap."""
    p = payload
    if p is None or len(p) < 13 or p[:6] not in (b"GIF87a", b"GIF89a"):
        return None

    def le16(i: int) -> int:
        return int.from_bytes(p[i : i + 2], "little")

    packed = p[10]
    pos = 13
    gct = None
    if packed & 0x80:
        size = 2 ** ((packed & 7) + 1)
        gct = p[pos : pos + 3 * size]
        pos += 3 * size
    n = len(p)
    while pos < n:
        b = p[pos]
        if b == 0x21:  # extension block: label byte + data sub-blocks
            pos += 2
            while pos < n and p[pos] != 0:
                pos += 1 + p[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            if pos + 10 > n:
                return None
            w, h = le16(pos + 5), le16(pos + 7)
            ipacked = p[pos + 9]
            pos += 10
            ct = gct
            if ipacked & 0x80:
                size = 2 ** ((ipacked & 7) + 1)
                ct = p[pos : pos + 3 * size]
                pos += 3 * size
            if ct is None or pos >= n or w == 0 or h == 0:
                return None
            min_code = p[pos]
            pos += 1
            if not 2 <= min_code <= 11:
                return None
            data = bytearray()
            while pos < n and p[pos] != 0:
                ln = p[pos]
                data += p[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            indices = _gif_lzw_decode(bytes(data), min_code, w * h)
            if indices is None or len(indices) < w * h:
                return None
            if ipacked & 0x40:  # interlaced: 4-pass row order
                order = (
                    list(range(0, h, 8))
                    + list(range(4, h, 8))
                    + list(range(2, h, 4))
                    + list(range(1, h, 2))
                )
                deinter = bytearray(w * h)
                for src_row, dst_row in enumerate(order):
                    deinter[dst_row * w : (dst_row + 1) * w] = indices[
                        src_row * w : (src_row + 1) * w
                    ]
                indices = deinter
            out = bytearray(w * h * 3)
            for i in range(w * h):
                ci = indices[i] * 3
                if ci + 3 > len(ct):
                    return None
                out[i * 3 : i * 3 + 3] = ct[ci : ci + 3]
            return w, h, 3, out
        else:  # trailer (0x3B) or corrupt
            return None
    return None


def wav_decode_samples(
    payload: bytes | None,
) -> tuple[int, int, "array.array"] | None:
    """FULL PCM sample decode for 16-bit PCM WAV, stdlib only: returns
    (channels, sample_rate, interleaved int16 samples). None for
    compressed / non-16-bit payloads (mp3/flac/aac need real codec
    libraries and stay integration points)."""
    import array

    p = payload
    if p is None or len(p) < 44 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        return None
    pos = 12
    n = len(p)
    channels = rate = None
    fmt_tag = bits = None
    data = None
    while pos + 8 <= n:
        cid = p[pos : pos + 4]
        size = int.from_bytes(p[pos + 4 : pos + 8], "little")
        if cid == b"fmt " and pos + 24 <= n:
            fmt_tag = int.from_bytes(p[pos + 8 : pos + 10], "little")
            channels = int.from_bytes(p[pos + 10 : pos + 12], "little")
            rate = int.from_bytes(p[pos + 12 : pos + 16], "little")
            bits = int.from_bytes(p[pos + 22 : pos + 24], "little")
        elif cid == b"data":
            data = p[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    if fmt_tag != 1 or bits != 16 or not channels or not rate or data is None:
        return None
    usable = len(data) - (len(data) % (2 * channels))
    samples = array.array("h")
    samples.frombytes(data[:usable])
    if sys.byteorder == "big":  # pragma: no cover - WAV is little-endian
        samples.byteswap()
    return channels, rate, samples


_MP3_BITRATES = {
    # (version-group, layer) -> kbps by bitrate index 1..14 (0=free, 15=bad)
    (1, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (1, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (1, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (2, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (2, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_MP3_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000), 0: (11025, 12000, 8000)}


def _mp3_parse_header(p: bytes, pos: int):
    """Parse one MPEG audio frame header at ``pos``. Returns
    (frame_bytes, samples_per_frame, sample_rate, channels) or None."""
    if pos + 4 > len(p):
        return None
    b1, b2, b3 = p[pos], p[pos + 1], p[pos + 2]
    if b1 != 0xFF or (b2 & 0xE0) != 0xE0:
        return None
    version = (b2 >> 3) & 0x3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
    layer = (b2 >> 1) & 0x3  # 3=Layer I, 2=Layer II, 1=Layer III
    if version == 1 or layer == 0:
        return None
    br_idx = (b3 >> 4) & 0xF
    sr_idx = (b3 >> 2) & 0x3
    padding = (b3 >> 1) & 0x1
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    vgroup = 1 if version == 3 else 2
    lnum = {3: 1, 2: 2, 1: 3}[layer]
    kbps = _MP3_BITRATES[(vgroup, min(lnum, 2) if vgroup == 2 else lnum)][br_idx]
    rate = _MP3_RATES[version][sr_idx]
    if lnum == 1:
        samples = 384
        size = (12 * kbps * 1000 // rate + padding) * 4
    else:
        samples = 1152 if (vgroup == 1 or lnum == 2) else 576
        size = samples // 8 * kbps * 1000 // rate + padding
    mode = (p[pos + 3] >> 6) & 0x3 if pos + 4 <= len(p) else 0
    channels = 1 if mode == 3 else 2
    if size < 4:
        return None
    return size, samples, rate, channels


def mp3_frame_table(
    payload: bytes | None,
) -> list[tuple[int, int, int]] | None:
    """REAL stdlib-only MPEG-audio frame walk (the MP4-sample-table
    analogue for MP3): skips a leading ID3v2 tag, finds the first valid
    frame sync, then resolves every frame's exact byte extent from the
    header's bitrate/samplerate/padding tables — one
    ``(start_time_ms, byte_offset, byte_size)`` entry per frame. This is
    the demuxer half of audio seeking (duration, frame offsets, chunk
    boundaries); only the Huffman DECODE of each frame stays a codec
    integration point. Requires at least two consecutive valid frames
    (or one frame ending exactly at EOF) so random bytes containing a
    lone 0xFFE sync don't parse as audio. Returns None otherwise."""
    p = payload
    if p is None or len(p) < 4:
        return None
    pos = 0
    if p[:3] == b"ID3" and len(p) >= 10:
        syncsafe = (
            (p[6] & 0x7F) << 21 | (p[7] & 0x7F) << 14 | (p[8] & 0x7F) << 7 | (p[9] & 0x7F)
        )
        pos = 10 + syncsafe
    n = len(p)
    # scan to the first header that chains to a second valid frame / EOF
    start = None
    scan = pos
    while scan + 4 <= n:
        h = _mp3_parse_header(p, scan)
        if h is not None:
            size = h[0]
            nxt = scan + size
            if nxt == n or _mp3_parse_header(p, nxt) is not None:
                start = scan
                break
        scan += 1
    if start is None:
        return None
    frames = []
    # Elapsed time accumulates as an exact rational sum of
    # samples*1000/rate PER FRAME — MPEG streams may switch sample rate
    # mid-file (e.g. MPEG1<->MPEG2 splices), so scaling a single global
    # sample counter by the FIRST frame's rate would drift every frame
    # after the switch. Within a constant-rate run the integer pair
    # (run_t0_ms_num/den + run_samples) keeps the math exact without a
    # per-frame Fraction allocation.
    t_ms_num = 0  # elapsed ms * den, at the start of the current run
    t_den = 1
    run_samples = 0
    run_rate = None
    pos = start
    while pos + 4 <= n:
        h = _mp3_parse_header(p, pos)
        if h is None:
            break
        size, samples, rate, _ch = h
        if pos + size > n:
            break  # truncated final frame
        if rate != run_rate:
            if run_rate is not None:
                # fold the finished run into the exact base: num/den + s*1000/r
                t_ms_num = t_ms_num * run_rate + run_samples * 1000 * t_den
                t_den = t_den * run_rate
                # MPEG rates share large factors (all multiples of 8000 or
                # 11025): reduce by gcd each fold so an adversarial stream
                # alternating rates per frame cannot grow the denominator
                # (and the per-frame big-int cost) without bound
                g = math.gcd(t_ms_num, t_den)
                if g > 1:
                    t_ms_num //= g
                    t_den //= g
            run_rate = rate
            run_samples = 0
        frames.append(
            (
                int((t_ms_num * run_rate + run_samples * 1000 * t_den)
                    // (t_den * run_rate)),
                pos,
                size,
            )
        )
        run_samples += samples
        pos += size
    return frames or None


def audio_header_info(
    payload: bytes | None,
) -> tuple[str, int, int, int] | None:
    """REAL stdlib-only audio metadata: (format, channels, sample_rate,
    duration_ms). WAV (RIFF/WAVE): walks the chunk chain to 'fmt '
    (channels/rate/byte-rate) and 'data' (payload size → duration).
    MPEG audio (MP3): walks the frame-header chain via
    :func:`mp3_frame_table` — exact per-frame sizes from the bitrate/
    samplerate tables give duration without decoding (VBR-correct, no
    Xing header needed). Returns None for other/corrupt payloads —
    fully-compressed codec DECODE (mp3 Huffman, flac, aac) stays the
    integration point."""
    p = payload
    if p is None or len(p) < 44 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        frames = mp3_frame_table(p)
        if frames:
            h = _mp3_parse_header(p, frames[0][1])
            assert h is not None
            _size, _samples, rate, channels = h
            # duration = last frame start + the LAST frame's own span
            # (its header carries its own samples/rate — a mid-stream
            # sample-rate switch would make the first frame's wrong)
            h_last = _mp3_parse_header(p, frames[-1][1])
            assert h_last is not None
            dur = frames[-1][0] + int(h_last[1] * 1000 // h_last[2])
            return ("mp3", channels, rate, dur)
        return None
    pos = 12
    channels = rate = byte_rate = None
    data_size = None
    n = len(p)
    while pos + 8 <= n:
        cid = p[pos : pos + 4]
        size = int.from_bytes(p[pos + 4 : pos + 8], "little")
        if cid == b"fmt " and pos + 20 <= n:
            channels = int.from_bytes(p[pos + 10 : pos + 12], "little")
            rate = int.from_bytes(p[pos + 12 : pos + 16], "little")
            byte_rate = int.from_bytes(p[pos + 16 : pos + 20], "little")
        elif cid == b"data":
            data_size = size
        # chunks are word-aligned (odd sizes padded by one byte)
        pos += 8 + size + (size & 1)
    if not channels or not rate or not byte_rate or data_size is None:
        return None
    duration_ms = int(data_size * 1000 // byte_rate)
    return ("wav", channels, rate, duration_ms)


def mp4_sample_table(
    payload: bytes | None,
) -> list[tuple[int, int, int]] | None:
    """REAL ISO-BMFF sample-table extraction, stdlib only: walks
    moov/trak/mdia for the first VIDEO track and resolves its stbl tables
    (stts time-to-sample, stsz sizes, stsc sample-to-chunk, stco/co64
    chunk offsets) into one entry per sample:
    ``(start_time_ms, byte_offset, byte_size)``. This is the container
    half of frame seeking — exactly what an ffmpeg demuxer does before
    the codec runs; only the bitstream DECODE of each sample stays a
    codec integration point."""
    p = payload
    if p is None or len(p) < 16 or p[4:8] != b"ftyp":
        return None

    def boxes(start: int, end: int):
        pos = start
        while pos + 8 <= end:
            size = int.from_bytes(p[pos : pos + 4], "big")
            typ = p[pos + 4 : pos + 8]
            hdr = 8
            if size == 1:
                if pos + 16 > end:
                    return
                size = int.from_bytes(p[pos + 8 : pos + 16], "big")
                hdr = 16
            if size < hdr or pos + size > end:
                return
            yield typ, pos + hdr, pos + size
            pos += size

    def child(start: int, end: int, name: bytes):
        for typ, b, e in boxes(start, end):
            if typ == name:
                return b, e
        return None

    moov = child(0, len(p), b"moov")
    if moov is None:
        return None
    for typ, tb, te in boxes(*moov):
        if typ != b"trak":
            continue
        mdia = child(tb, te, b"mdia")
        if mdia is None:
            continue
        hdlr = child(*mdia, b"hdlr")
        if hdlr is None or p[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        mdhd = child(*mdia, b"mdhd")
        if mdhd is None:
            return None
        mb = mdhd[0]
        timescale = int.from_bytes(
            p[mb + 20 : mb + 24] if p[mb] == 1 else p[mb + 12 : mb + 16],
            "big",
        )
        if timescale == 0:
            return None
        minf = child(*mdia, b"minf")
        stbl = child(*minf, b"stbl") if minf else None
        if stbl is None:
            return None
        stts = child(*stbl, b"stts")
        stsz = child(*stbl, b"stsz")
        stsc = child(*stbl, b"stsc")
        stco = child(*stbl, b"stco")
        co64 = child(*stbl, b"co64")
        if stts is None or stsz is None or stsc is None or (
            stco is None and co64 is None
        ):
            return None
        # stts -> per-sample start times in the media timescale
        b0 = stts[0]
        n_ent = int.from_bytes(p[b0 + 4 : b0 + 8], "big")
        starts: list[int] = []
        t = 0
        for i in range(n_ent):
            cnt = int.from_bytes(p[b0 + 8 + i * 8 : b0 + 12 + i * 8], "big")
            dur = int.from_bytes(p[b0 + 12 + i * 8 : b0 + 16 + i * 8], "big")
            for _ in range(cnt):
                starts.append(t)
                t += dur
        # stsz -> per-sample sizes
        b0 = stsz[0]
        fixed = int.from_bytes(p[b0 + 4 : b0 + 8], "big")
        n_samples = int.from_bytes(p[b0 + 8 : b0 + 12], "big")
        if fixed:
            sizes = [fixed] * n_samples
        else:
            sizes = [
                int.from_bytes(p[b0 + 12 + i * 4 : b0 + 16 + i * 4], "big")
                for i in range(n_samples)
            ]
        if len(starts) < n_samples:
            return None
        # chunk offsets
        if stco is not None:
            b0 = stco[0]
            nch = int.from_bytes(p[b0 + 4 : b0 + 8], "big")
            offsets = [
                int.from_bytes(p[b0 + 8 + i * 4 : b0 + 12 + i * 4], "big")
                for i in range(nch)
            ]
        else:
            b0 = co64[0]
            nch = int.from_bytes(p[b0 + 4 : b0 + 8], "big")
            offsets = [
                int.from_bytes(p[b0 + 8 + i * 8 : b0 + 16 + i * 8], "big")
                for i in range(nch)
            ]
        # stsc -> samples per chunk runs
        b0 = stsc[0]
        nsc = int.from_bytes(p[b0 + 4 : b0 + 8], "big")
        runs = [
            (
                int.from_bytes(p[b0 + 8 + i * 12 : b0 + 12 + i * 12], "big"),
                int.from_bytes(p[b0 + 12 + i * 12 : b0 + 16 + i * 12], "big"),
            )
            for i in range(nsc)
        ]
        out: list[tuple[int, int, int]] = []
        si = 0
        for ri, (first_chunk, spc) in enumerate(runs):
            last_chunk = (
                runs[ri + 1][0] - 1 if ri + 1 < len(runs) else len(offsets)
            )
            for ci in range(first_chunk - 1, last_chunk):
                if ci >= len(offsets):
                    break
                off = offsets[ci]
                for _ in range(spc):
                    if si >= n_samples:
                        break
                    out.append(
                        (starts[si] * 1000 // timescale, off, sizes[si])
                    )
                    off += sizes[si]
                    si += 1
        if si != n_samples:
            return None
        return out
    return None


def video_header_info(payload: bytes | None) -> tuple[str, int] | None:
    """REAL stdlib-only video metadata from an ISO-BMFF (MP4/MOV)
    container: (format, duration_ms) out of the moov/mvhd box (timescale +
    duration). Walks top-level boxes, then moov children; supports mvhd
    version 0 (32-bit) and 1 (64-bit). Frame decode still needs ffmpeg."""
    p = payload
    if p is None or len(p) < 16:
        return None

    def boxes(start: int, end: int):
        pos = start
        while pos + 8 <= end:
            size = int.from_bytes(p[pos : pos + 4], "big")
            typ = p[pos + 4 : pos + 8]
            if size == 1:  # 64-bit largesize
                if pos + 16 > end:
                    return
                size = int.from_bytes(p[pos + 8 : pos + 16], "big")
            if size < 8 or pos + size > end:
                return
            yield typ, pos + 8, pos + size
            pos += size

    if p[4:8] != b"ftyp":
        return None
    for typ, body, bend in boxes(0, len(p)):
        if typ != b"moov":
            continue
        for ctyp, cbody, cbend in boxes(body, bend):
            if ctyp != b"mvhd":
                continue
            version = p[cbody]
            if version == 1 and cbody + 28 <= cbend:
                timescale = int.from_bytes(p[cbody + 20 : cbody + 24], "big")
                duration = int.from_bytes(p[cbody + 24 : cbody + 32], "big")
            elif version == 0 and cbody + 20 <= cbend:
                timescale = int.from_bytes(p[cbody + 12 : cbody + 16], "big")
                duration = int.from_bytes(p[cbody + 16 : cbody + 20], "big")
            else:
                return None
            if not timescale:
                return None
            return ("mp4", int(duration * 1000 // timescale))
    return None


IMAGE_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("format", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)


def decode_image_metadata(df: DataFrame) -> DataFrame:
    """Real image metadata through the production Arrow path: one
    ``mapInPandas`` stage calling :func:`image_header_dims` per payload.
    Unparseable/missing payloads yield NULL format/dims (kept, so the
    caller can quarantine them) — the standard curation gate 'drop media
    outside [min_dim, max_dim] or with unknown container'."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                image_header_dims(bytes(b) if b is not None else None)
                for b in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": [m[0] if m else None for m in metas],
                    "width": pd.array(
                        [m[1] if m else None for m in metas], dtype="Int32"
                    ),
                    "height": pd.array(
                        [m[2] if m else None for m in metas], dtype="Int32"
                    ),
                    "n_bytes": [
                        len(b) if b is not None else 0 for b in pdf["content"]
                    ],
                }
            )

    return df.select("media_id", "content").mapInPandas(
        process, schema=IMAGE_META_SCHEMA
    )


def decode_image_pixels(
    payload: bytes | None,
) -> tuple[str, int, int, int, bytearray] | None:
    """Magic-sniffed dispatch over the four REAL pixel decoders:
    (format, width, height, channels, row-major samples) from a
    PNG/BMP/GIF/JPEG payload, None otherwise. The single entry point the
    pixel-level operators (:func:`image_phash`) use so they are container-
    agnostic — the same image encoded as PNG and BMP produces the same
    pixel buffer, hence the same perceptual hash."""
    p = payload
    if p is None or len(p) < 8:
        return None
    if p[:8] == b"\x89PNG\r\n\x1a\n":
        d = png_decode_pixels(p)
        fmt = "png"
    elif p[:2] == b"BM":
        d = bmp_decode_pixels(p)
        fmt = "bmp"
    elif p[:6] in (b"GIF87a", b"GIF89a"):
        d = gif_decode_pixels(p)
        fmt = "gif"
    elif p[:2] == b"\xff\xd8":
        d = jpeg_decode_pixels(p)
        fmt = "jpeg"
    else:
        return None
    if d is None:
        return None
    w, h, ch, samples = d
    return fmt, w, h, ch, samples


def phash64(payload: bytes | None, grid: int = 32, keep: int = 8):
    """64-bit DCT perceptual hash of one image payload (the classic pHash
    recipe): decode → luma → ``grid``×``grid`` area-average downsample →
    orthonormal 2-D DCT-II → keep the ``keep``×``keep`` low-frequency
    block → bit k = coefficient k > median. Deterministic (no smoothing
    kernels, exact box averaging, double-precision DCT); robust to
    re-encoding, resizing, and small pixel noise — the image twin of
    SimHash for text. Returns (phash signed-int64, format, width, height)
    or None when the payload doesn't decode."""
    import numpy as np

    d = decode_image_pixels(payload)
    if d is None:
        return None
    fmt, w, h, ch, samples = d
    if w < 1 or h < 1:
        return None
    arr = np.frombuffer(bytes(samples), dtype=np.uint8).astype(np.float64)
    try:
        arr = arr.reshape(h, w, ch)
    except ValueError:
        return None
    if ch >= 3:
        luma = 0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1] + 0.114 * arr[:, :, 2]
    else:
        luma = arr[:, :, 0]
    # exact area-average resample to grid x grid: every source pixel
    # contributes to exactly one bin (reduceat over bin edges), so the
    # downsample is sampling-grid-free and deterministic
    re = np.minimum((np.arange(grid) * h) // grid, h - 1)
    ce = np.minimum((np.arange(grid) * w) // grid, w - 1)
    rows = np.add.reduceat(luma, re, axis=0)
    cells = np.add.reduceat(rows, ce, axis=1)
    r_cnt = np.diff(np.append(re, h))
    c_cnt = np.diff(np.append(ce, w))
    small = cells / np.outer(np.maximum(r_cnt, 1), np.maximum(c_cnt, 1))
    # orthonormal DCT-II basis (type-II, norm='ortho')
    k = np.arange(grid)
    basis = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * grid))
    scale = np.full(grid, np.sqrt(2.0 / grid))
    scale[0] = np.sqrt(1.0 / grid)
    dct_m = basis * scale[:, None]
    coeffs = dct_m @ small @ dct_m.T
    block = coeffs[:keep, :keep].ravel()
    med = float(np.median(block))
    bits = 0
    for i, c in enumerate(block):
        if c > med:
            bits |= 1 << i
    if bits >= 1 << 63:
        bits -= 1 << 64
    return bits, fmt, w, h


def image_phash(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Perceptual-hash fingerprints for an image corpus: one Arrow
    ``mapInPandas`` stage calling :func:`phash64` per payload — the
    multimodal analogue of :func:`..dedup.simhash` (text). Undecodable
    payloads yield NULL phash (quarantine semantics, like
    :func:`decode_image_metadata`). Returns (id, phash, format, width,
    height); feed into ``dedup.hamming_near_dup`` for banded near-dup
    pairs — re-encoded/lightly-edited copies of one image land within a
    few Hamming bits while distinct images are ~32 bits apart.

    100 TB shape: zero shuffles here (pure projection); the banded join
    downstream is equijoin-only. Media rows are large — lower
    ``spark.sql.files.maxPartitionBytes`` per the module scale note."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                phash64(bytes(b) if b is not None else None)
                for b in pdf[content_col]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "phash": pd.array(
                        [o[0] if o else None for o in out], dtype="Int64"
                    ),
                    "format": [o[1] if o else None for o in out],
                    "width": pd.array(
                        [o[2] if o else None for o in out], dtype="Int32"
                    ),
                    "height": pd.array(
                        [o[3] if o else None for o in out], dtype="Int32"
                    ),
                }
            )

    sel = df.select(F.col(id_col), F.col(content_col))
    id_type = dict(sel.dtypes)[id_col]
    return sel.mapInPandas(
        process,
        schema=f"id {id_type}, phash long, format string, "
        "width int, height int",
    )


def _fake_features(payload: bytes | None, dim: int) -> list[float] | None:
    """Deterministic stand-in for a real decode+embed: bytes of the sha256
    digest scaled to [0, 1). Stable across runs and engines. NULL payload
    -> NULL features (nothing was decoded — same quarantine semantics as
    the 'real' mode and the DuckDB oracle, which must not fabricate a
    zero vector for missing media)."""
    if payload is None:
        return None
    digest = hashlib.sha256(payload).digest()
    need = (dim + len(digest) - 1) // len(digest)
    raw = (digest * need)[:dim]
    return [b / 256.0 for b in raw]


def extract_media_features(
    df: DataFrame,
    feature_dim: int = 8,
    decode_stub: str = "deterministic",
) -> DataFrame:
    """Decode media content and emit per-item features via ``mapInPandas``.

    Modes: ``'deterministic'`` (default) hashes the payload into a seeded
    fake feature vector — stable cross-engine, used by the oracle gate.
    ``'real'`` performs the WORKING container decode (stdlib-only):
    images via :func:`image_header_dims` → [width, height, aspect,
    ln(bytes)]; audio via :func:`audio_header_info` (WAV) → [channels,
    sample_rate, duration_ms, ln(bytes)]; video via
    :func:`video_header_info` (MP4 mvhd) → [duration_ms, ln(bytes)];
    all zero-padded to ``feature_dim``. Unparseable payloads yield NULL
    features (quarantine rows). Pixel/sample-level decode still needs
    PIL/ffmpeg and remains an integration point in the frame/chunk/resize
    operators. The Arrow batch loop, output schema, and partition
    behavior are production-shaped in every mode. Batch sizing is
    governed by ``spark.sql.execution.arrow.maxRecordsPerBatch``
    (session conf), not a per-call knob.
    """
    import math

    if decode_stub not in ("deterministic", "real"):
        raise ValueError("decode_stub must be 'deterministic' or 'real'")

    def _real_features(modality: str, payload: bytes | None) -> list[float] | None:
        lb = math.log(len(payload)) if payload else 0.0
        if modality == "image":
            meta = image_header_dims(payload)
            if meta is None:
                return None
            _fmt, w, h = meta
            feats = [float(w), float(h), float(w) / float(h) if h else 0.0, lb]
        elif modality == "audio":
            ainfo = audio_header_info(payload)
            if ainfo is None:
                return None
            _fmt, channels, rate, dur_ms = ainfo
            feats = [float(channels), float(rate), float(dur_ms), lb]
        elif modality == "video":
            vinfo = video_header_info(payload)
            if vinfo is None:
                return None
            _fmt, dur_ms = vinfo
            feats = [float(dur_ms), lb]
        else:
            return None
        return (feats + [0.0] * feature_dim)[:feature_dim]

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "real":
                feats = [
                    _real_features(m, bytes(b) if b is not None else None)
                    for m, b in zip(pdf["modality"], pdf["content"])
                ]
            else:
                feats = [
                    _fake_features(b, feature_dim) for b in pdf["content"]
                ]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["content"].map(
                        lambda b: len(b) if b is not None else None
                    ),
                    "content_sha256": pdf["content"].map(
                        lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                    ),
                    "features": feats,
                }
            )
            yield out

    return df.mapInPandas(process, schema=FEATURE_SCHEMA)


def synthesize_media_table(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (binary payloads derived from
    the row id — no external data)."""
    base = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("modality"),
        F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string")), 256)
        .cast("binary")
        .alias("content"),
        F.lit("application/octet-stream").alias("mime_type"),
        F.lit(64).cast("int").alias("width"),
        F.lit(64).cast("int").alias("height"),
        (F.col("id") * 1000).alias("duration_ms"),
    )
    return base


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("frame_ts_ms", LongType(), False),
        StructField("frame_sha256", StringType(), True),
        # real-mode extras (NULL in stub mode): the container sample this
        # timestamp resolves to, and its byte size
        StructField("sample_idx", LongType(), True),
        StructField("sample_size", LongType(), True),
    ]
)


def sample_video_frames(
    df: DataFrame,
    every_ms: int = 1000,
    decode_stub: str = "deterministic",
) -> DataFrame:
    """Sample frames at a fixed cadence from video rows.

    Frame TIMESTAMPS are enumerated Catalyst-side (``sequence`` + explode —
    cheap, prunable, proportional to output) so the Arrow kernel receives one
    row per target frame, which is exactly the shape a real ffmpeg-seek
    decode produces.

    ``decode_stub='real'`` runs the REAL container half of the seek for
    MP4 payloads: :func:`mp4_sample_table` resolves stts/stsz/stsc/stco
    into per-sample (time, offset, size); each requested timestamp maps to
    the sample covering it and the emitted hash is over the sample's
    ACTUAL bytes from mdat, with its index and size alongside. Non-BMFF
    payloads yield NULLs. Only the per-sample BITSTREAM decode (H.264 et
    al.) remains a codec integration point; ``'deterministic'`` stands the
    whole step in with sha256(content:ts)."""
    if decode_stub not in ("deterministic", "raise", "real"):
        raise ValueError("decode_stub must be 'deterministic'|'raise'|'real'")
    frames = (
        # duration must be known and positive: greatest/least SKIP null
        # operands in Spark, so an unfiltered null duration would fabricate
        # a phantom frame at ts=0 instead of dropping the row
        df.filter(
            (F.col("modality") == "video")
            & F.col("duration_ms").isNotNull()
            & (F.col("duration_ms") > 0)
        )
        .select(
            "media_id",
            "content",
            F.posexplode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)).cast("long"),
                    F.lit(int(every_ms)).cast("long"),
                )
            ).alias("frame_idx", "frame_ts_ms"),
        )
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import bisect

        for pdf in batches:
            if decode_stub == "raise":
                raise CodecIntegrationPoint(
                    "video bitstream decode requires a native codec "
                    "(ffmpeg); integrate the per-sample decode here"
                )
            if decode_stub == "real":
                cache: dict[int, object] = {}
                hashes, sidx, ssize = [], [], []
                for mid, c, ts in zip(
                    pdf["media_id"], pdf["content"], pdf["frame_ts_ms"]
                ):
                    if mid not in cache:
                        cache[mid] = (
                            mp4_sample_table(bytes(c))
                            if c is not None
                            else None
                        )
                    table = cache[mid]
                    if not table:
                        hashes.append(None)
                        sidx.append(None)
                        ssize.append(None)
                        continue
                    times = [t for t, _, _ in table]
                    i = bisect.bisect_right(times, int(ts)) - 1
                    if i < 0:
                        i = 0
                    _, off, size = table[i]
                    payload = bytes(c)[off : off + size]
                    hashes.append(hashlib.sha256(payload).hexdigest())
                    sidx.append(i)
                    ssize.append(size)
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "frame_idx": pdf["frame_idx"].astype("int64"),
                        "frame_ts_ms": pdf["frame_ts_ms"].astype("int64"),
                        "frame_sha256": hashes,
                        "sample_idx": pd.array(sidx, dtype="Int64"),
                        "sample_size": pd.array(ssize, dtype="Int64"),
                    }
                )
                continue
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_idx": pdf["frame_idx"].astype("int64"),
                    "frame_ts_ms": pdf["frame_ts_ms"].astype("int64"),
                    "frame_sha256": [
                        hashlib.sha256(
                            bytes(c) + b":" + str(ts).encode()
                        ).hexdigest()
                        if c is not None
                        else None
                        for c, ts in zip(pdf["content"], pdf["frame_ts_ms"])
                    ],
                    "sample_idx": pd.array([None] * len(pdf), dtype="Int64"),
                    "sample_size": pd.array([None] * len(pdf), dtype="Int64"),
                }
            )

    return frames.mapInPandas(decode, schema=FRAME_SCHEMA)


CHUNK_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("chunk_idx", LongType(), False),
        StructField("start_ms", LongType(), False),
        StructField("end_ms", LongType(), False),
        StructField("chunk_sha256", StringType(), True),
        # real-decode extras (NULL in stub mode): RMS of the chunk's PCM
        # samples in milli-units, and the decoded frame count
        StructField("rms_milli", LongType(), True),
        StructField("n_frames", LongType(), True),
    ]
)


def chunk_audio(
    df: DataFrame,
    window_ms: int = 30_000,
    hop_ms: int = 15_000,
    decode_stub: str = "deterministic",
) -> DataFrame:
    """Overlapping audio windows (the ASR/embedding pre-segmentation shape):
    window starts every ``hop_ms`` while they begin inside the clip, end
    clamped to the clip. Same Catalyst-enumerate / Arrow-decode split as
    :func:`sample_video_frames`.

    ``decode_stub='real'`` runs ACTUAL sample decode for 16-bit PCM WAV
    (:func:`wav_decode_samples`): per-chunk seek+slice of the interleaved
    frames, content hash over the sliced bytes, RMS (milli-units) and
    frame count. Non-PCM payloads yield NULL features; compressed codecs
    (mp3/flac/aac) remain the codec integration point."""
    if decode_stub not in ("deterministic", "raise", "real"):
        raise ValueError("decode_stub must be 'deterministic'|'raise'|'real'")
    chunks = (
        # same null/zero-duration guard as sample_video_frames: least()
        # skipping a null _dur would un-clamp end_ms to a full window
        df.filter(
            (F.col("modality") == "audio")
            & F.col("duration_ms").isNotNull()
            & (F.col("duration_ms") > 0)
        )
        .select(
            "media_id",
            "content",
            F.col("duration_ms").cast("long").alias("_dur"),
            F.posexplode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)).cast("long"),
                    F.lit(int(hop_ms)).cast("long"),
                )
            ).alias("chunk_idx", "start_ms"),
        )
        .withColumn("end_ms", F.least(F.col("start_ms") + window_ms, F.col("_dur")))
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise CodecIntegrationPoint(
                    "compressed-audio entropy decode (mp3/aac/flac) "
                    "requires a native codec; integrate it here"
                )
            if decode_stub == "real":
                # ACTUAL sample-level decode for PCM16 WAV: seek + slice
                # per chunk (what an ffmpeg segmenter does for raw PCM),
                # content hash over the sliced bytes, RMS + frame count as
                # the per-chunk features. Decode once per media row, not
                # per chunk — the chunks of a clip share one payload.
                cache: dict[int, object] = {}
                hashes, rmss, frames = [], [], []
                for mid, c, s, e in zip(
                    pdf["media_id"], pdf["content"], pdf["start_ms"],
                    pdf["end_ms"],
                ):
                    if mid not in cache:
                        cache[mid] = (
                            wav_decode_samples(bytes(c))
                            if c is not None
                            else None
                        )
                    dec = cache[mid]
                    if dec is None:
                        hashes.append(None)
                        rmss.append(None)
                        frames.append(None)
                        continue
                    ch, rate, samples = dec
                    f0 = int(s) * rate // 1000
                    f1 = int(e) * rate // 1000
                    seg = samples[f0 * ch : f1 * ch]
                    hashes.append(
                        hashlib.sha256(seg.tobytes()).hexdigest()
                    )
                    n = len(seg)
                    if n:
                        mean_sq = sum(int(x) * int(x) for x in seg) / n
                        rmss.append(int(mean_sq ** 0.5 * 1000 + 0.5))
                    else:
                        rmss.append(0)
                    # Actual decoded frame count — the data chunk may be
                    # shorter than duration_ms implies, in which case the
                    # slice (and hash) covers fewer samples than f1 - f0.
                    frames.append(n // ch if ch else 0)
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "chunk_idx": pdf["chunk_idx"].astype("int64"),
                        "start_ms": pdf["start_ms"].astype("int64"),
                        "end_ms": pdf["end_ms"].astype("int64"),
                        "chunk_sha256": hashes,
                        "rms_milli": pd.array(rmss, dtype="Int64"),
                        "n_frames": pd.array(frames, dtype="Int64"),
                    }
                )
                continue
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "chunk_idx": pdf["chunk_idx"].astype("int64"),
                    "start_ms": pdf["start_ms"].astype("int64"),
                    "end_ms": pdf["end_ms"].astype("int64"),
                    "chunk_sha256": [
                        hashlib.sha256(
                            bytes(c) + b":" + str(s).encode() + b"-" + str(e).encode()
                        ).hexdigest()
                        if c is not None
                        else None
                        for c, s, e in zip(
                            pdf["content"], pdf["start_ms"], pdf["end_ms"]
                        )
                    ],
                    "rms_milli": pd.array([None] * len(pdf), dtype="Int64"),
                    "n_frames": pd.array([None] * len(pdf), dtype="Int64"),
                }
            )

    return chunks.mapInPandas(decode, schema=CHUNK_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("resized", BinaryType(), True),
        StructField("resized_sha256", StringType(), True),
    ]
)


def resize_images(
    df: DataFrame,
    target_w: int = 224,
    target_h: int = 224,
    decode_stub: str = "deterministic",
) -> DataFrame:
    """Image resize stage (decode -> resample -> re-encode).

    ``decode_stub='deterministic'`` (default, oracle mode) emits a
    deterministic pseudo-bitmap (sha256 digest bytes) tagged with the
    target geometry. ``decode_stub='real'`` runs the ACTUAL pixel path for
    8-bit non-interlaced PNGs — :func:`png_decode_pixels` (stdlib zlib
    inflate + unfilter) then :func:`png_resize_nearest` — and emits the
    resampled interleaved samples; non-PNG / unsupported payloads yield
    NULLs (the quarantine row a production pipeline dead-letters). A PIL/
    libjpeg deployment swaps only the kernel body; schema, Arrow batching,
    and partition behavior are identical in all modes."""
    if decode_stub not in ("deterministic", "raise", "real"):
        raise ValueError("decode_stub must be 'deterministic'|'raise'|'real'")
    imgs = df.filter(F.col("modality") == "image").select("media_id", "content")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise CodecIntegrationPoint(
                    "vendor image codec decode (webp/heic/avif) requires "
                    "a native library; integrate it here"
                )
            if decode_stub == "real":
                payloads = []
                for c in pdf["content"]:
                    d = None
                    if c is not None:
                        b = bytes(c)
                        d = (
                            png_decode_pixels(b)
                            or bmp_decode_pixels(b)
                            or gif_decode_pixels(b)
                            or jpeg_decode_pixels(b)
                        )
                    payloads.append(
                        png_resize_nearest(d, target_w, target_h)
                        if d is not None
                        else None
                    )
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "width": [
                            target_w if p is not None else None
                            for p in payloads
                        ],
                        "height": [
                            target_h if p is not None else None
                            for p in payloads
                        ],
                        "resized": payloads,
                        "resized_sha256": [
                            hashlib.sha256(p).hexdigest()
                            if p is not None
                            else None
                            for p in payloads
                        ],
                    }
                )
                continue
            payloads = [
                hashlib.sha256(
                    bytes(c) + f":{target_w}x{target_h}".encode()
                ).digest()
                if c is not None
                else None
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": target_w,
                    "height": target_h,
                    "resized": payloads,
                    "resized_sha256": [
                        hashlib.sha256(p).hexdigest() if p is not None else None
                        for p in payloads
                    ],
                }
            )

    return imgs.mapInPandas(decode, schema=RESIZE_SCHEMA)
