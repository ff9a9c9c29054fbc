"""Full PNG pixel decode (operators/multimodal.py:png_decode_pixels) — the
round-3 'real' decode wired behind the previously header-only integration
point. Fixtures are genuine PNG files assembled with struct+zlib, with
every scanline filter type (0-4) exercised explicitly, so the unfilter
implementation is verified against the spec, not against itself."""

from __future__ import annotations

import hashlib
import struct
import zlib

from etdtransform_spark.operators.multimodal import (
    png_decode_pixels,
    png_resize_nearest,
    resize_images,
)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def _forward_filter(ftype: int, row: bytes, prev: bytes, ch: int) -> bytes:
    """Encoder-side filter (PNG spec §9) — the inverse of what the decoder
    undoes, so round-tripping proves the unfilter paths."""
    out = bytearray(len(row))
    for i in range(len(row)):
        left = row[i - ch] if i >= ch else 0
        up = prev[i] if prev else 0
        ul = prev[i - ch] if (prev and i >= ch) else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = left
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (left + up) >> 1
        else:  # Paeth
            pa, pb, pc = abs(up - ul), abs(left - ul), abs(left + up - 2 * ul)
            pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
        out[i] = (row[i] - pred) & 0xFF
    return bytes(out)


def make_png(width: int, height: int, pixels: bytes, color_type: int = 2,
             filters: list[int] | None = None) -> bytes:
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    stride = width * ch
    assert len(pixels) == height * stride
    filters = filters or [0] * height
    raw = bytearray()
    prev = b""
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        raw.append(filters[y])
        raw += _forward_filter(filters[y], row, prev, ch)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def _gradient(width: int, height: int, ch: int) -> bytes:
    return bytes(
        (x * 40 + y * 11 + c * 77) & 0xFF
        for y in range(height)
        for x in range(width)
        for c in range(ch)
    )


def test_decode_rgb_all_filters_exact():
    px = _gradient(5, 5, 3)
    for filters in ([0] * 5, [1] * 5, [0, 2, 2, 2, 2], [3] * 5, [0, 4, 4, 4, 4],
                    [0, 1, 2, 3, 4]):
        png = make_png(5, 5, px, color_type=2, filters=filters)
        got = png_decode_pixels(png)
        assert got is not None, filters
        w, h, ch, out = got
        assert (w, h, ch) == (5, 5, 3)
        assert bytes(out) == px, filters


def test_decode_gray_and_rgba():
    for color_type, ch in ((0, 1), (4, 2), (6, 4)):
        px = _gradient(4, 3, ch)
        got = png_decode_pixels(make_png(4, 3, px, color_type,
                                         filters=[0, 1, 4]))
        assert got is not None
        assert got[:3] == (4, 3, ch)
        assert bytes(got[3]) == px


def test_decode_rejects_non_png_and_unsupported():
    assert png_decode_pixels(None) is None
    assert png_decode_pixels(b"\xff\xd8\xff\xe0 not a png") is None
    # 16-bit depth: header parses but pixel path declines (returns None)
    px = _gradient(2, 2, 3)
    png = bytearray(make_png(2, 2, px))
    png[24] = 16  # bit depth byte inside IHDR
    assert png_decode_pixels(bytes(png)) is None


def test_pixel_stats_from_decode():
    """The 'pixel stats' proof: channel means computed from decoded samples
    match the values the fixture was built from."""
    px = _gradient(8, 8, 3)
    w, h, ch, out = png_decode_pixels(make_png(8, 8, px))
    for c in range(ch):
        samples = out[c::ch]
        expect = [px[i] for i in range(c, len(px), ch)]
        assert sum(samples) / len(samples) == sum(expect) / len(expect)
        assert min(samples) == min(expect) and max(samples) == max(expect)


def test_resize_nearest_known_mapping():
    # 4x2 -> 2x1: centers sample sx in {1, 3}, sy = 1
    px = bytes(range(4 * 2 * 3))
    decoded = png_decode_pixels(make_png(4, 2, px))
    out = png_resize_nearest(decoded, 2, 1)
    stride = 4 * 3
    expect = px[stride + 3 : stride + 6] + px[stride + 9 : stride + 12]
    assert out == expect


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(1, 8),
        h=st.integers(1, 8),
        color_type=st.sampled_from([0, 2, 4, 6]),
        data=st.data(),
    )
    def test_decode_roundtrip_property(w, h, color_type, data):
        """Any 8-bit image under any per-row filter assignment decodes back
        to the exact source samples — the unfilter paths are inverses of the
        spec's forward filters for arbitrary pixel data, not just
        gradients."""
        ch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
        px = bytes(
            data.draw(
                st.lists(
                    st.integers(0, 255),
                    min_size=w * h * ch,
                    max_size=w * h * ch,
                )
            )
        )
        filters = data.draw(
            st.lists(st.integers(0, 4), min_size=h, max_size=h)
        )
        got = png_decode_pixels(make_png(w, h, px, color_type, filters))
        assert got is not None
        assert got[:3] == (w, h, ch)
        assert bytes(got[3]) == px
except ImportError:  # pragma: no cover - hypothesis is baked in
    pass


def test_resize_images_real_mode(spark):
    """End-to-end Arrow kernel: decode_stub='real' resizes actual PNG
    payloads and NULLs non-PNG rows; schema identical to stub mode."""
    px = _gradient(6, 4, 3)
    png = make_png(6, 4, px, filters=[0, 1, 2, 4])
    rows = [
        (1, "image", bytearray(png)),
        (2, "image", bytearray(b"not an image")),
        (3, "audio", bytearray(b"RIFF....")),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, modality string, content binary"
    )
    out = {r.media_id: r for r in
           resize_images(df, 2, 2, decode_stub="real").collect()}
    assert set(out) == {1, 2}
    expected = png_resize_nearest(png_decode_pixels(png), 2, 2)
    assert bytes(out[1].resized) == expected
    assert out[1].width == 2 and out[1].height == 2
    assert out[1].resized_sha256 == hashlib.sha256(expected).hexdigest()
    assert out[2].resized is None and out[2].resized_sha256 is None
    assert out[2].width is None
