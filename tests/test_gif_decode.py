"""GIF first-frame pixel decode (operators/multimodal.py:gif_decode_pixels).

The fixtures are genuine GIF files produced by a spec-side LZW ENCODER
written here (LSB-first packing, CLEAR/END codes, table growth at
2^width, 12-bit cap) — so decode is validated as the inverse of the
format's compression, across literal-only streams, dictionary growth,
per-frame local color tables, and interlacing."""

from __future__ import annotations

import struct

from etdtransform_spark.operators.multimodal import (
    gif_decode_pixels,
    png_resize_nearest,
    resize_images,
)


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code_size + 1
    out_bits: list[tuple[int, int]] = [(clear, code_size)]
    w = b""
    for k in indices:
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        out_bits.append((table[w], code_size))
        table[wk] = next_code
        next_code += 1
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code >= 4096:
            out_bits.append((clear, code_size))
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        w = bytes([k])
    if w:
        out_bits.append((table[w], code_size))
    out_bits.append((end, code_size))
    # LSB-first bit packing
    acc = 0
    nacc = 0
    data = bytearray()
    for code, width in out_bits:
        acc |= code << nacc
        nacc += width
        while nacc >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8
    if nacc:
        data.append(acc & 0xFF)
    return bytes(data)


def make_gif(width: int, height: int, indices: list[int],
             palette: list[tuple[int, int, int]],
             interlaced: bool = False, local_table: bool = False,
             with_extensions: bool = False) -> bytes:
    bits = max(2, (len(palette) - 1).bit_length())
    size_field = bits - 1
    table = b"".join(bytes(c) for c in palette)
    table += b"\x00" * (3 * (2 ** bits) - len(table))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    if local_table:
        out += bytes((0x00, 0, 0))  # no global table
    else:
        out += bytes((0x80 | (size_field << 4) | size_field, 0, 0))
        out += table
    if interlaced:
        order = (list(range(0, height, 8)) + list(range(4, height, 8))
                 + list(range(2, height, 4)) + list(range(1, height, 2)))
        stream = []
        for row in order:
            stream += indices[row * width:(row + 1) * width]
    else:
        stream = list(indices)
    if with_extensions:
        # Graphic Control Extension + a comment extension — the decoder
        # must skip both sub-block chains to reach the image descriptor
        out += b"\x21\xF9\x04\x00\x00\x00\x00\x00"
        out += b"\x21\xFE\x05hello\x00"
    out += b"\x2C" + struct.pack("<HHHH", 0, 0, width, height)
    out += bytes([(0x80 | size_field if local_table else 0)
                  | (0x40 if interlaced else 0)])
    if local_table:
        out += table
    out += bytes([bits])
    data = _lzw_encode(stream, bits)
    for i in range(0, len(data), 255):
        block = data[i:i + 255]
        out += bytes([len(block)]) + block
    out += b"\x00\x3B"
    return bytes(out)


PALETTE = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255),
           (255, 255, 0), (0, 255, 255), (255, 0, 255), (255, 255, 255)]


def _expected_rgb(indices: list[int]) -> bytes:
    return b"".join(bytes(PALETTE[i]) for i in indices)


def test_gif_decode_roundtrip_with_dict_growth():
    # repeating runs force dictionary entries beyond the literal range
    idx = [(x // 3) % 8 for x in range(12 * 9)]
    got = gif_decode_pixels(make_gif(12, 9, idx, PALETTE))
    assert got is not None
    assert got[:3] == (12, 9, 3)
    assert bytes(got[3]) == _expected_rgb(idx)


def test_gif_decode_interlaced_and_local_table():
    idx = [(x * 5 + 3) % 8 for x in range(10 * 11)]
    for interlaced, local in ((True, False), (False, True), (True, True)):
        got = gif_decode_pixels(
            make_gif(10, 11, idx, PALETTE, interlaced, local)
        )
        assert got is not None, (interlaced, local)
        assert bytes(got[3]) == _expected_rgb(idx), (interlaced, local)


def test_gif_decode_skips_extension_blocks():
    idx = [(x * 3) % 8 for x in range(7 * 5)]
    got = gif_decode_pixels(
        make_gif(7, 5, idx, PALETTE, with_extensions=True)
    )
    assert got is not None
    assert bytes(got[3]) == _expected_rgb(idx)


def test_gif_decode_long_stream_multiple_subblocks():
    # > 255 bytes of LZW data forces multi-sub-block framing
    idx = [(x * 7 + x // 13) % 8 for x in range(40 * 40)]
    got = gif_decode_pixels(make_gif(40, 40, idx, PALETTE))
    assert got is not None
    assert bytes(got[3]) == _expected_rgb(idx)


def test_gif_decode_rejects_corrupt():
    assert gif_decode_pixels(None) is None
    assert gif_decode_pixels(b"GIF89a\x00") is None
    ok = make_gif(4, 4, [1] * 16, PALETTE)
    assert gif_decode_pixels(ok[: len(ok) // 2]) is None  # truncated


def test_resize_images_real_handles_gif(spark):
    idx = [(x + 1) % 8 for x in range(8 * 6)]
    gif = make_gif(8, 6, idx, PALETTE)
    df = spark.createDataFrame(
        [(3, "image", bytearray(gif))],
        "media_id long, modality string, content binary",
    )
    out = resize_images(df, 4, 3, decode_stub="real").collect()[0]
    expected = png_resize_nearest(
        (8, 6, 3, bytearray(_expected_rgb(idx))), 4, 3
    )
    assert bytes(out.resized) == expected
