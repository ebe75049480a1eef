"""mp4 sample extraction (operators/mp4frames.py) — sample-table
round trips incl. multi-chunk stsc runs and co64, bit-identity of
extracted sample bytes via the JPEG decode path, metadata-walk
compatibility, and the operator contract."""

from __future__ import annotations

import numpy as np
import pytest

from sigraph_spark.operators.jpeg import decode_jpeg, encode_jpeg
from sigraph_spark.operators.mp4frames import (
    decode_mp4_frames,
    encode_mp4_samples,
    mp4_video_frames,
)


def _jpegs(n, w=16, h=12, seed=0):
    out = []
    for j in range(n):
        rng = np.random.default_rng(seed * 100 + j)
        rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8).tobytes()
        out.append(encode_jpeg(w, h, rgb, quality=75))
    return out


@pytest.mark.parametrize("chunking,co64", [
    (None, False), ([2, 2, 1], False), ([1, 4], True), ([5], True),
])
def test_sample_roundtrip(chunking, co64):
    js = _jpegs(5)
    payload = encode_mp4_samples(js, 16, 12, chunking=chunking, co64=co64)
    codec, frames = decode_mp4_frames(payload)
    assert codec == "jpeg" and len(frames) == 5
    for j, (idx, w, h, rgb) in enumerate(frames):
        assert (idx, w, h) == (j, 16, 12)
        assert rgb == decode_jpeg(js[j])[2]  # bit-identical sample bytes


def test_stsc_runs_collapse_and_expand():
    # chunking [2,2,1] collapses to runs [(1,2),(3,1)]; the expansion
    # must place exactly 5 samples
    js = _jpegs(5, seed=3)
    payload = encode_mp4_samples(js, 16, 12, chunking=[2, 2, 1])
    _, frames = decode_mp4_frames(payload)
    assert [f[0] for f in frames] == [0, 1, 2, 3, 4]


def test_metadata_walk_still_reads_it():
    from sigraph_spark.operators.multimodal import mp4_metadata

    payload = encode_mp4_samples(_jpegs(3, seed=5), 16, 12)
    meta = mp4_metadata(payload)
    assert meta["video_codec"] == "jpeg"
    assert (meta["width"], meta["height"]) == (16, 12)
    assert meta["n_tracks"] == 1


def test_non_jpeg_codec_raises():
    js = _jpegs(2, seed=7)
    payload = encode_mp4_samples(js, 16, 12, codec=b"avc1")
    with pytest.raises(ValueError, match="no bitstream decoder"):
        decode_mp4_frames(payload)


def test_operator_sums_and_dirty_rows(spark):
    js = _jpegs(2, seed=9)
    payload = encode_mp4_samples(js, 16, 12)
    df = spark.createDataFrame(
        [("a", bytearray(payload)), ("junk", bytearray(b"\x00" * 40))],
        "media_id string, payload binary",
    )
    rows = {(r["media_id"], r["frame_idx"]): r
            for r in mp4_video_frames(df).collect()}
    assert rows[("junk", None)]["codec"] == "unknown"
    for j in range(2):
        px = np.frombuffer(decode_jpeg(js[j])[2], dtype=np.uint8)
        s = px.reshape(-1, 3).astype(np.int64).sum(axis=0)
        r = rows[("a", j)]
        assert (r["sum_r"], r["sum_g"], r["sum_b"]) == tuple(int(v) for v in s)
        assert (r["width"], r["height"], r["codec"]) == (16, 12, "jpeg")
