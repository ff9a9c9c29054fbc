"""Baseline JPEG decode (operators/multimodal.py:jpeg_decode_pixels).

The fixtures are genuine baseline JFIF streams produced by a spec-side
ENCODER written here — forward DCT (orthonormal, the exact inverse of the
decoder's basis), quantization, zigzag, canonical Huffman (custom valid
tables carried in DHT segments), byte stuffing, optional 4:2:0
subsampling and restart intervals. Flat blocks must decode EXACTLY
(quantization error is zero there); textured images within DCT rounding
tolerance. This validates the decoder against the format's forward
direction, not against itself."""

from __future__ import annotations

import math
import struct

from etdtransform_spark.operators.multimodal import jpeg_decode_pixels

_C = [math.sqrt(1 / 8)] + [0.5] * 7
_ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _fdct(block: list[float]) -> list[float]:
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for y in range(8):
                for x in range(8):
                    s += (block[y * 8 + x]
                          * math.cos((2 * y + 1) * u * math.pi / 16)
                          * math.cos((2 * x + 1) * v * math.pi / 16))
            out[u * 8 + v] = _C[u] * _C[v] * s
    return out


# canonical Huffman: 12 DC symbols at code length 4, 162 AC symbols at
# code length 8 (all-ones code unused in both -> spec-valid tables)
_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [(r << 4) | s for r in range(16)
                           for s in range(1, 11)]


def _enc_table(syms: list[int], length: int) -> dict[int, tuple[int, int]]:
    return {s: (i, length) for i, s in enumerate(syms)}


_DC_ENC = _enc_table(_DC_SYMS, 4)
_AC_ENC = _enc_table(_AC_SYMS, 8)


def _dht(tc: int, th: int, syms: list[int], length: int) -> bytes:
    counts = [0] * 16
    counts[length - 1] = len(syms)
    body = bytes([(tc << 4) | th]) + bytes(counts) + bytes(syms)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.write(1, 1)


def _magnitude(v: int) -> tuple[int, int]:
    s = 0
    a = abs(v)
    while a:
        s += 1
        a >>= 1
    bits = v if v >= 0 else v + (1 << s) - 1
    return s, bits


def _encode_block(w: _BitWriter, samples: list[int], q: list[int],
                  pred: int) -> int:
    coefs = _fdct([s - 128.0 for s in samples])
    zz = [int(round(coefs[_ZZ[k]] / q[k])) for k in range(64)]
    diff = zz[0] - pred
    s, bits = _magnitude(diff)
    code, length = _DC_ENC[s]
    w.write(code, length)
    if s:
        w.write(bits, s)
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if zz[k]:
            last_nz = k
    for k in range(1, last_nz + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run >= 16:
            code, length = _AC_ENC[0xF0]
            w.write(code, length)
            run -= 16
        s, bits = _magnitude(zz[k])
        code, length = _AC_ENC[(run << 4) | s]
        w.write(code, length)
        w.write(bits, s)
        run = 0
    if last_nz < 63:
        code, length = _AC_ENC[0x00]
        w.write(code, length)
    return zz[0]


def _plane_block(plane: list[int], pw: int, ph: int, x0: int, y0: int):
    out = []
    for y in range(8):
        for x in range(8):
            sx = min(x0 + x, pw - 1)
            sy = min(y0 + y, ph - 1)
            out.append(plane[sy * pw + sx])
    return out


def make_jpeg(width: int, height: int, pixels: bytes, gray: bool = False,
              q_val: int = 1, subsample_420: bool = False,
              restart_interval: int = 0) -> bytes:
    q = [q_val] * 64
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(q)
    if gray:
        comps = [(1, 1, 1, 0)]
        planes = {1: (list(pixels), width, height)}
    else:
        ys, cbs, crs = [], [], []
        for i in range(width * height):
            r, g, b = pixels[i * 3], pixels[i * 3 + 1], pixels[i * 3 + 2]
            ys.append(min(255, max(0, int(0.299 * r + 0.587 * g + 0.114 * b + 0.5))))
            cbs.append(min(255, max(0, int(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.5))))
            crs.append(min(255, max(0, int(0.5 * r - 0.418688 * g - 0.081312 * b + 128.5))))
        if subsample_420:
            cw, chh = (width + 1) // 2, (height + 1) // 2
            def sub(pl):
                o = []
                for y in range(chh):
                    for x in range(cw):
                        acc = cnt = 0
                        for dy in (0, 1):
                            for dx in (0, 1):
                                sx, sy = 2 * x + dx, 2 * y + dy
                                if sx < width and sy < height:
                                    acc += pl[sy * width + sx]
                                    cnt += 1
                        o.append((acc + cnt // 2) // cnt)
                return o
            comps = [(1, 2, 2, 0), (2, 1, 1, 0), (3, 1, 1, 0)]
            planes = {1: (ys, width, height),
                      2: (sub(cbs), cw, chh), 3: (sub(crs), cw, chh)}
        else:
            comps = [(1, 1, 1, 0), (2, 1, 1, 0), (3, 1, 1, 0)]
            planes = {1: (ys, width, height), 2: (cbs, width, height),
                      3: (crs, width, height)}
    sof = struct.pack(">BHHB", 8, height, width, len(comps))
    for cid, hs, vs, tq in comps:
        sof += bytes([cid, (hs << 4) | vs, tq])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht(0, 0, _DC_SYMS, 4) + _dht(1, 0, _AC_SYMS, 8)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([len(comps)])
    for cid, _, _, _ in comps:
        sos += bytes([cid, 0x00])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
    w = _BitWriter()
    pred = {cid: 0 for cid, _, _, _ in comps}
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                w.flush()
                out += w.buf
                w = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                pred = {cid: 0 for cid, _, _, _ in comps}
            mcu_count += 1
            for cid, hs, vs, tq in comps:
                pl, pw_, ph_ = planes[cid]
                for by in range(vs):
                    for bx in range(hs):
                        block = _plane_block(
                            pl, pw_, ph_, (mx * hs + bx) * 8, (my * vs + by) * 8
                        )
                        pred[cid] = _encode_block(w, block, q, pred[cid])
    w.flush()
    out += w.buf + b"\xff\xd9"
    return bytes(out)


def _gray_gradient(w, h):
    return bytes(((x * 29 + y * 17) % 256) for y in range(h) for x in range(w))


def test_flat_gray_decodes_exactly():
    for v in (0, 60, 128, 200, 255):
        px = bytes([v]) * (16 * 8)
        got = jpeg_decode_pixels(make_jpeg(16, 8, px, gray=True))
        assert got is not None
        assert got[:3] == (16, 8, 1)
        assert bytes(got[3]) == px, v


def test_blockwise_flat_gray_decodes_exactly():
    # constant per 8x8 block: only the DC coefficient is nonzero and it is
    # an exact integer multiple of the basis -> bit-exact round trip
    vals = [10, 250, 128, 77]
    px = bytearray(16 * 16)
    for by in range(2):
        for bx in range(2):
            v = vals[by * 2 + bx]
            for y in range(8):
                for x in range(8):
                    px[(by * 8 + y) * 16 + bx * 8 + x] = v
    got = jpeg_decode_pixels(make_jpeg(16, 16, bytes(px), gray=True))
    assert bytes(got[3]) == bytes(px)


def test_gray_gradient_within_dct_rounding():
    px = _gray_gradient(24, 16)
    got = jpeg_decode_pixels(make_jpeg(24, 16, px, gray=True))
    assert got is not None and got[:3] == (24, 16, 1)
    diffs = [abs(a - b) for a, b in zip(got[3], px)]
    assert max(diffs) <= 3, max(diffs)


def test_gray_non_multiple_of_8_dims():
    px = _gray_gradient(10, 6)
    got = jpeg_decode_pixels(make_jpeg(10, 6, px, gray=True))
    assert got is not None and got[:3] == (10, 6, 1)
    assert max(abs(a - b) for a, b in zip(got[3], px)) <= 3


def test_color_444_within_tolerance():
    px = bytes(((x * 31 + y * 7 + c * 11) % 256)
               for y in range(16) for x in range(16) for c in range(3))
    got = jpeg_decode_pixels(make_jpeg(16, 16, px))
    assert got is not None and got[:3] == (16, 16, 3)
    # YCbCr forward+inverse rounding + DCT rounding
    assert max(abs(a - b) for a, b in zip(got[3], px)) <= 6


def test_color_420_flat_exact_and_textured_bounded():
    flat = bytes([90, 160, 40]) * (16 * 16)
    got = jpeg_decode_pixels(make_jpeg(16, 16, flat, subsample_420=True))
    assert got is not None and got[:3] == (16, 16, 3)
    assert max(abs(a - b) for a, b in zip(got[3], flat)) <= 2
    # luma-textured, chroma-constant: nearest upsample introduces no error
    tex = bytes(c for y in range(16) for x in range(16)
                for c in ((x * 13 + y * 5) % 256,) * 3)
    got2 = jpeg_decode_pixels(make_jpeg(16, 16, tex, subsample_420=True))
    assert max(abs(a - b) for a, b in zip(got2[3], tex)) <= 8


def test_restart_intervals():
    px = _gray_gradient(32, 8)
    plain = jpeg_decode_pixels(make_jpeg(32, 8, px, gray=True))
    rst = jpeg_decode_pixels(
        make_jpeg(32, 8, px, gray=True, restart_interval=2)
    )
    assert rst is not None
    assert bytes(rst[3]) == bytes(plain[3])


def test_resize_images_real_handles_jpeg(spark):
    from etdtransform_spark.operators.multimodal import resize_images

    px = _gray_gradient(16, 16)
    jpg = make_jpeg(16, 16, px, gray=True)
    df = spark.createDataFrame(
        [(5, "image", bytearray(jpg))],
        "media_id long, modality string, content binary",
    )
    out = resize_images(df, 4, 4, decode_stub="real").collect()[0]
    assert out.width == 4 and out.height == 4
    assert out.resized is not None and len(bytes(out.resized)) == 16


def test_rejects_progressive_and_corrupt():
    assert jpeg_decode_pixels(None) is None
    assert jpeg_decode_pixels(b"\xff\xd8\xff\xe0") is None
    ok = bytearray(make_jpeg(8, 8, _gray_gradient(8, 8), gray=True))
    i = ok.find(b"\xff\xc0")
    ok[i + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
    assert jpeg_decode_pixels(bytes(ok)) is None
