"""MP3 frame-header walk (operators/multimodal.py:mp3_frame_table /
audio_header_info): exact per-frame sizes and duration from the MPEG
bitrate/samplerate tables, stdlib only — the demuxer half of audio
seeking; frame DECODE stays the codec integration point."""

from __future__ import annotations

from etdtransform_spark.operators.multimodal import (
    audio_header_info,
    mp3_frame_table,
)

# MPEG1 Layer III, 128 kbps, 44100 Hz, no padding, stereo:
# frame size = 144 * 128000 // 44100 = 417 bytes, 1152 samples/frame
_V1L3_HDR = bytes([0xFF, 0xFA, 0x90, 0x00])
_FRAME = _V1L3_HDR + bytes(417 - 4)


def _id3(tag_payload: int) -> bytes:
    return b"ID3\x04\x00\x00" + bytes(
        [(tag_payload >> 21) & 0x7F, (tag_payload >> 14) & 0x7F,
         (tag_payload >> 7) & 0x7F, tag_payload & 0x7F]
    ) + bytes(tag_payload)


def test_frame_table_exact_offsets_and_times():
    frames = mp3_frame_table(_FRAME * 3)
    assert frames == [
        (0, 0, 417),
        (1152 * 1000 // 44100, 417, 417),
        (2304 * 1000 // 44100, 834, 417),
    ]


def test_id3v2_tag_skipped():
    frames = mp3_frame_table(_id3(20) + _FRAME * 2)
    assert frames is not None
    assert frames[0][1] == 10 + 20


def test_padding_bit_changes_frame_size():
    padded = bytes([0xFF, 0xFA, 0x92, 0x00]) + bytes(418 - 4)
    frames = mp3_frame_table(padded + _FRAME)
    assert frames is not None
    assert frames[0][2] == 418
    assert frames[1][1] == 418


def test_mpeg2_layer3_sizes():
    # MPEG2 Layer III, 64 kbps, 22050 Hz: 576//8 * 64000 // 22050 = 208
    hdr = bytes([0xFF, 0xF2, 0x80, 0x00])  # version=2, L3, br_idx=8 -> 64k
    frame = hdr + bytes(208 - 4)
    frames = mp3_frame_table(frame * 2)
    assert frames is not None
    assert frames[0][2] == 208
    assert frames[1][0] == 576 * 1000 // 22050


def test_lone_sync_in_junk_rejected():
    junk = bytes(100) + bytes([0xFF, 0xFA, 0x90, 0x00]) + bytes(50)
    assert mp3_frame_table(junk) is None
    assert mp3_frame_table(None) is None
    assert mp3_frame_table(b"\x00" * 500) is None


def test_truncated_final_frame_dropped():
    frames = mp3_frame_table(_FRAME * 2 + _FRAME[:100])
    assert frames is not None and len(frames) == 2


def test_audio_header_info_mp3():
    fmt, ch, rate, dur = audio_header_info(_FRAME * 3)
    assert (fmt, ch, rate) == ("mp3", 2, 44100)
    assert dur == (2304 * 1000 // 44100) + (1152 * 1000 // 44100)


def test_audio_header_info_mono_flag():
    mono = bytes([0xFF, 0xFA, 0x90, 0xC0]) + bytes(417 - 4)
    fmt, ch, rate, dur = audio_header_info(mono * 2)
    assert (fmt, ch) == ("mp3", 1)


def test_audio_header_info_still_rejects_junk():
    assert audio_header_info(b"\x89PNG" + bytes(100)) is None


# MPEG1 Layer III, 128 kbps, 48000 Hz (sr_idx=1): 144*128000//48000 = 384
_V1L3_48K = bytes([0xFF, 0xFA, 0x94, 0x00]) + bytes(384 - 4)


def test_mid_stream_sample_rate_switch_times_exact():
    # 2 frames @44100 then 2 @48000 — each frame's start time must come
    # from the rational sum of samples/rate per frame, not a global
    # sample counter scaled by the FIRST frame's rate.
    frames = mp3_frame_table(_FRAME * 2 + _V1L3_48K * 2)
    assert frames is not None and len(frames) == 4
    assert frames[0][0] == 0
    assert frames[1][0] == 1152 * 1000 // 44100  # 26
    assert frames[2][0] == 2304 * 1000 // 44100  # 52
    # exact: 2304/44100 s + 1152/48000 s = 76.24 ms -> 76 (rate0 math said 78)
    assert frames[3][0] == int((2304 * 1000 * 48000 + 1152 * 1000 * 44100)
                               // (44100 * 48000))
    assert frames[3][0] == 76
    assert frames[2][1] == 834 and frames[2][2] == 384


def test_duration_uses_last_frames_own_header():
    fmt, ch, rate, dur = audio_header_info(_FRAME * 2 + _V1L3_48K * 2)
    assert (fmt, ch, rate) == ("mp3", 2, 44100)
    # last frame starts at 76 ms and spans 1152 samples @ ITS 48 kHz rate
    assert dur == 76 + 1152 * 1000 // 48000
