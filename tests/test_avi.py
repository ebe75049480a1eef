"""RIFF/AVI container codec tests (operators/avi.py): raw BI_RGB and
MJPG round trips, header metadata, idx1/alignment structure, dirty
payload behavior, and the video_frames operator seam."""
from __future__ import annotations

import struct

import numpy as np
import pytest

from sigraph_spark.operators.avi import (
    _raw_frame_bytes,
    _raw_frame_to_rgb,
    avi_metadata,
    decode_avi_frames,
    encode_avi_mjpeg,
    video_frames,
)
from sigraph_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _noise(w, h, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8).tobytes()


def test_raw_round_trip_exact():
    # width 19 -> row stride 57 needs 3 pad bytes: exercises padding.
    w, h = 19, 13
    frames = [_noise(w, h, s) for s in range(4)]
    avi = encode_avi_mjpeg(
        [_raw_frame_bytes(w, h, f) for f in frames], w, h,
        fps_num=30, raw=True)
    out = list(decode_avi_frames(avi))
    assert [o[0] for o in out] == [0, 1, 2, 3]
    for (idx, ow, oh, rgb), orig in zip(out, frames):
        assert (ow, oh) == (w, h)
        assert rgb == orig  # bottom-up + BGR swap must invert exactly


def test_raw_pixel_array_layout():
    # 2x2, known colors: bottom row comes first, channels are BGR.
    rgb = bytes((1, 2, 3, 4, 5, 6,      # top row:    (1,2,3) (4,5,6)
                 7, 8, 9, 10, 11, 12))  # bottom row: (7,8,9) (10,11,12)
    arr = _raw_frame_bytes(2, 2, rgb)
    stride = 2 * 3 + 2  # 6 bytes + 2 pad
    assert len(arr) == stride * 2
    assert arr[0:3] == bytes((9, 8, 7))          # bottom-left, BGR
    assert arr[stride:stride + 3] == bytes((3, 2, 1))  # top-left, BGR
    assert _raw_frame_to_rgb(2, 2, arr) == rgb


def test_mjpeg_frames_bit_identical_to_direct_decode():
    w, h = 21, 10
    jpegs = [encode_jpeg(w, h, _noise(w, h, s), quality=q)
             for s, q in ((0, 50), (1, 75), (2, 90))]
    avi = encode_avi_mjpeg(jpegs, w, h, fps_num=24)
    out = list(decode_avi_frames(avi))
    assert len(out) == 3
    for (idx, ow, oh, rgb), jp in zip(out, jpegs):
        assert (ow, oh, rgb) == decode_jpeg(jp)


def test_metadata_fields():
    frames = [b"x" * 11, b"y" * 12]
    meta = avi_metadata(encode_avi_mjpeg(frames, 320, 240,
                                         fps_num=30000, fps_den=1001))
    assert meta == {
        "format": "avi", "duration_ms": 2 * 1000 * 1001 // 30000,
        "n_tracks": 1, "width": 320, "height": 240,
        "video_codec": "mjpg", "audio_codec": None,
    }
    raw = avi_metadata(encode_avi_mjpeg([b"z" * 8], 16, 8,
                                        fps_num=25, raw=True))
    assert raw["video_codec"] == "rawvideo"
    assert raw["duration_ms"] == 40


def test_structure_idx1_and_alignment():
    # Odd-sized frame payloads force RIFF pad bytes; idx1 offsets are
    # relative to the 'movi' fourcc and must land on each chunk id.
    frames = [b"a" * 7, b"b" * 9, b"c" * 4]
    avi = encode_avi_mjpeg(frames, 8, 8, fps_num=25)
    (riff_size,) = struct.unpack_from("<I", avi, 4)
    assert 8 + riff_size == len(avi)
    movi_at = avi.index(b"movi")
    idx_at = avi.index(b"idx1")
    (idx_size,) = struct.unpack_from("<I", avi, idx_at + 4)
    assert idx_size == 16 * len(frames)
    for k in range(len(frames)):
        cc, flags, off, size = struct.unpack_from(
            "<4sIII", avi, idx_at + 8 + 16 * k)
        assert cc == b"00dc" and flags == 0x10
        assert avi[movi_at + off: movi_at + off + 4] == b"00dc"
        assert size == len(frames[k])


def test_truncated_and_garbage_payloads_raise():
    avi = encode_avi_mjpeg([b"q" * 6], 8, 8)
    for bad in (b"", b"RIFF\x04\x00\x00\x00WAVE", avi[:20], b"\x00" * 64):
        with pytest.raises(ValueError):
            avi_metadata(bad)


def test_unsupported_codec_raises_loud():
    avi = bytearray(encode_avi_mjpeg([b"q" * 6], 8, 8))
    at = avi.index(b"MJPG")          # strh handler
    avi[at: at + 4] = b"DX50"
    at2 = avi.index(b"MJPG")         # strf biCompression
    avi[at2: at2 + 4] = b"DX50"
    with pytest.raises(ValueError, match="unsupported AVI video codec"):
        list(decode_avi_frames(bytes(avi)))
    # metadata walk still works and reports the fourcc
    assert avi_metadata(bytes(avi))["video_codec"] == "dx50"


def test_video_frames_operator(spark):
    w, h = 10, 6
    solid = bytes((5, 7, 9)) * (w * h)
    raw_avi = encode_avi_mjpeg(
        [_raw_frame_bytes(w, h, solid)] * 2, w, h, fps_num=30, raw=True)
    jp = encode_jpeg(w, h, _noise(w, h, 3), quality=80)
    mj_avi = encode_avi_mjpeg([jp], w, h, fps_num=24)
    df = spark.createDataFrame(
        [("a", bytearray(raw_avi)), ("b", bytearray(mj_avi)),
         ("junk", bytearray(b"\x01\x02"))],
        "media_id string, payload binary")
    rows = {(r.media_id, r.frame_idx): r for r in video_frames(df).collect()}
    assert len(rows) == 4
    for j in range(2):
        r = rows[("a", j)]
        assert (r.width, r.height, r.codec) == (w, h, "rawvideo")
        assert (r.sum_r, r.sum_g, r.sum_b) == (
            w * h * 5, w * h * 7, w * h * 9)
    exp = np.frombuffer(decode_jpeg(jp)[2], dtype=np.uint8)
    s = exp.reshape(-1, 3).astype(np.int64).sum(axis=0)
    r = rows[("b", 0)]
    assert (r.codec, r.sum_r, r.sum_g, r.sum_b) == (
        "mjpg", int(s[0]), int(s[1]), int(s[2]))
    junk = rows[("junk", None)]
    assert junk.codec == "unknown" and junk.sum_r is None
