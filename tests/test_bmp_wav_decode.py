"""Real BMP pixel decode and PCM16 WAV sample decode (round 3): fixtures
are genuine files assembled with struct, so the parsers are verified
against the formats, not against themselves."""

from __future__ import annotations

import hashlib
import struct

from etdtransform_spark.operators.multimodal import (
    bmp_decode_pixels,
    chunk_audio,
    png_resize_nearest,
    resize_images,
    wav_decode_samples,
)


def make_bmp(width: int, height: int, rgb: bytes, top_down: bool = False) -> bytes:
    """24-bit uncompressed BITMAPINFOHEADER BMP from row-major RGB."""
    stride = (width * 3 + 3) & ~3
    rows = []
    order = range(height) if top_down else range(height - 1, -1, -1)
    for y in order:
        row = bytearray()
        for x in range(width):
            i = (y * width + x) * 3
            row += bytes((rgb[i + 2], rgb[i + 1], rgb[i]))  # BGR
        row += b"\x00" * (stride - width * 3)
        rows.append(bytes(row))
    pixel_data = b"".join(rows)
    h = height if not top_down else -height
    info = struct.pack("<IiiHHIIiiII", 40, width, h, 1, 24, 0,
                       len(pixel_data), 2835, 2835, 0, 0)
    off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", off + len(pixel_data), 0, 0, off)
    return header + info + pixel_data


def make_wav(channels: int, rate: int, samples: list[int]) -> bytes:
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * 2, channels * 2, 16)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def _rgb_gradient(w: int, h: int) -> bytes:
    return bytes((x * 37 + y * 11 + c * 73) & 0xFF
                 for y in range(h) for x in range(w) for c in range(3))


def test_bmp_decode_bottom_up_and_top_down():
    px = _rgb_gradient(5, 4)
    for top_down in (False, True):
        got = bmp_decode_pixels(make_bmp(5, 4, px, top_down))
        assert got is not None
        assert got[:3] == (5, 4, 3)
        assert bytes(got[3]) == px


def test_bmp_decode_rejects_unsupported():
    assert bmp_decode_pixels(None) is None
    assert bmp_decode_pixels(b"BM too short") is None
    bad = bytearray(make_bmp(2, 2, _rgb_gradient(2, 2)))
    bad[28] = 32  # 32-bit bpp -> unsupported
    assert bmp_decode_pixels(bytes(bad)) is None


def test_resize_images_real_handles_bmp(spark):
    px = _rgb_gradient(6, 4)
    bmp = make_bmp(6, 4, px)
    df = spark.createDataFrame(
        [(7, "image", bytearray(bmp))],
        "media_id long, modality string, content binary",
    )
    out = resize_images(df, 2, 2, decode_stub="real").collect()[0]
    expected = png_resize_nearest((6, 4, 3, bytearray(px)), 2, 2)
    assert bytes(out.resized) == expected


def test_wav_decode_roundtrip():
    samples = [0, 1000, -1000, 32767, -32768, 5, -5, 250]
    got = wav_decode_samples(make_wav(2, 8000, samples))
    assert got is not None
    ch, rate, arr = got
    assert (ch, rate) == (2, 8000)
    assert list(arr) == samples
    assert wav_decode_samples(b"RIFFxxxxWAVE") is None
    assert wav_decode_samples(None) is None


def test_chunk_audio_real_mode(spark):
    """End-to-end: a 2-second mono PCM16 WAV chunked at 1s windows / 1s hop
    — per-chunk slices hash/measure exactly the frames the seek math says."""
    rate = 1000
    samples = list(range(-1000, 1000))  # 2000 frames = 2 s mono
    wav = make_wav(1, rate, samples)
    df = spark.createDataFrame(
        [(1, "audio", bytearray(wav), 2000), (2, "audio", bytearray(b"mp3?"), 1500)],
        "media_id long, modality string, content binary, duration_ms long",
    )
    rows = {(r.media_id, r.chunk_idx): r for r in
            chunk_audio(df, window_ms=1000, hop_ms=1000,
                        decode_stub="real").collect()}
    r0 = rows[(1, 0)]
    seg = samples[0:1000]
    assert r0.n_frames == 1000
    assert r0.chunk_sha256 == hashlib.sha256(
        struct.pack("<1000h", *seg)).hexdigest()
    rms = (sum(x * x for x in seg) / len(seg)) ** 0.5
    assert r0.rms_milli == int(rms * 1000 + 0.5)
    r1 = rows[(1, 1)]
    assert r1.n_frames == 1000 and r1.start_ms == 1000
    # non-PCM payload: chunk enumerated, features NULL
    bad = rows[(2, 0)]
    assert bad.chunk_sha256 is None and bad.rms_milli is None
