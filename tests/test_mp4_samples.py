"""MP4 sample-table extraction (operators/multimodal.py:mp4_sample_table)
and the real container-seek mode of sample_video_frames. The fixture is a
hand-assembled ISO-BMFF file: ftyp + mdat (five distinct sample payloads
split across TWO chunks, so the stsc run logic is exercised) + moov with
mvhd and a video trak carrying stts/stsz/stsc/stco."""

from __future__ import annotations

import hashlib
import struct

from etdtransform_spark.operators.multimodal import (
    mp4_sample_table,
    sample_video_frames,
)


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


SAMPLES = [b"frame0!!", b"frame-1", b"fr2", b"frame__3x", b"f4"]
# chunk 1: samples 0-2 contiguous; chunk 2: samples 3-4
CHUNK1 = b"".join(SAMPLES[:3])
CHUNK2 = b"".join(SAMPLES[3:])
DUR_PER_SAMPLE = 500  # timescale 1000 -> 500 ms per sample


def make_mp4() -> bytes:
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    # mdat: chunk1 then a 4-byte gap of padding then chunk2 (offsets are
    # explicit in stco, so non-contiguous chunks must work)
    mdat_payload = CHUNK1 + b"\xde\xad\xbe\xef" + CHUNK2
    mdat = _box(b"mdat", mdat_payload)
    c1_off = len(ftyp) + 8
    c2_off = c1_off + len(CHUNK1) + 4

    stts = _box(b"stts", struct.pack(">II", 0, 1)
                + struct.pack(">II", len(SAMPLES), DUR_PER_SAMPLE))
    stsz = _box(b"stsz", struct.pack(">III", 0, 0, len(SAMPLES))
                + b"".join(struct.pack(">I", len(s)) for s in SAMPLES))
    stsc = _box(b"stsc", struct.pack(">II", 0, 2)
                + struct.pack(">III", 1, 3, 1)
                + struct.pack(">III", 2, 2, 1))
    stco = _box(b"stco", struct.pack(">II", 0, 2)
                + struct.pack(">II", c1_off, c2_off))
    stbl = _box(b"stbl", stts + stsz + stsc + stco)
    minf = _box(b"minf", stbl)
    mdhd = _box(b"mdhd", struct.pack(">IIIIIHH", 0, 0, 0, 1000,
                                     DUR_PER_SAMPLE * len(SAMPLES), 0, 0))
    hdlr = _box(b"hdlr", struct.pack(">II", 0, 0) + b"vide"
                + b"\x00" * 12 + b"h\x00")
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", mdia)
    mvhd = _box(b"mvhd", struct.pack(">IIIII", 0, 0, 0, 1000, 2500)
                + b"\x00" * 80)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def test_sample_table_resolution():
    table = mp4_sample_table(make_mp4())
    assert table is not None
    assert len(table) == 5
    p = make_mp4()
    for i, (t, off, size) in enumerate(table):
        assert t == i * DUR_PER_SAMPLE
        assert p[off : off + size] == SAMPLES[i], i


def test_sample_table_rejects_non_bmff():
    assert mp4_sample_table(None) is None
    assert mp4_sample_table(b"RIFFxxxxWAVEdata") is None
    p = make_mp4()
    assert mp4_sample_table(p[: len(p) // 3]) is None  # moov truncated away


def test_sample_video_frames_real_mode(spark):
    mp4 = make_mp4()
    rows = [
        (1, "video", bytearray(mp4), 2500),
        (2, "video", bytearray(b"not a video"), 1500),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, modality string, content binary, duration_ms long"
    )
    out = {(r.media_id, r.frame_ts_ms): r for r in
           sample_video_frames(df, every_ms=1000,
                               decode_stub="real").collect()}
    # ts 0 -> sample 0; ts 1000 -> sample 2 (starts at 1000); ts 2000 -> 4
    for ts, si in ((0, 0), (1000, 2), (2000, 4)):
        r = out[(1, ts)]
        assert r.sample_idx == si, (ts, r.sample_idx)
        assert r.sample_size == len(SAMPLES[si])
        assert r.frame_sha256 == hashlib.sha256(SAMPLES[si]).hexdigest()
    # non-BMFF payload: frames enumerated, features NULL
    bad = out[(2, 0)]
    assert bad.frame_sha256 is None and bad.sample_idx is None
