"""Audio activity segmentation (operators/audioseg.py)."""

from __future__ import annotations

import numpy as np

from sigraph_spark.operators.audiofp import encode_wav16
from sigraph_spark.operators.audioseg import (
    audio_segments,
    frame_energies,
    trim_bounds,
)

FL = 256


def _clip(spans):
    """spans: list of (n_frames, amplitude) -> int16 samples."""
    xs = []
    for nf, amp in spans:
        if amp == 0:
            xs.append(np.zeros(nf * FL, dtype=np.int64))
        else:
            rng = np.random.default_rng(amp)
            xs.append(rng.integers(-amp, amp, size=nf * FL,
                                   endpoint=True).astype(np.int64))
    return np.concatenate(xs)


def _df(spark, rows):
    return spark.createDataFrame(
        [(k, bytearray(encode_wav16(8000, v))) for k, v in rows],
        "media_id string, payload binary")


def test_energies_exact_and_dirty(spark):
    x = np.arange(FL * 2, dtype=np.int64) % 100
    df = _df(spark, [("a", x)])
    df = df.unionByName(spark.createDataFrame(
        [("junk", bytearray(b"\x00x" * 10))],
        "media_id string, payload binary"))
    got = {(r["id"], r["frame_idx"]): r["energy"]
           for r in frame_energies(df, frame_len=FL).collect()}
    assert got[("a", 0)] == int(np.dot(x[:FL], x[:FL]))
    assert got[("a", 1)] == int(np.dot(x[FL:], x[FL:]))
    assert got[("junk", None)] is None


def test_segments_islands(spark):
    clip = _clip([(3, 0), (4, 5000), (2, 0), (1, 5000)])
    e = frame_energies(_df(spark, [("c", clip)]), frame_len=FL)
    segs = [(r["seg_idx"], r["voiced"], r["start_frame"],
             r["end_frame"], r["n_frames"])
            for r in audio_segments(e, threshold=10_000)
            .orderBy("seg_idx").collect()]
    assert segs == [(0, False, 0, 2, 3), (1, True, 3, 6, 4),
                    (2, False, 7, 8, 2), (3, True, 9, 9, 1)]


def test_trim_bounds_and_all_silent(spark):
    loud = _clip([(2, 0), (3, 8000), (1, 0)])
    quiet = _clip([(4, 0)])
    e = frame_energies(_df(spark, [("x", loud), ("s", quiet)]),
                       frame_len=FL)
    got = {r["id"]: r for r in trim_bounds(e, threshold=10_000).collect()}
    assert (got["x"]["first_voiced"], got["x"]["last_voiced"]) == (2, 4)
    assert (got["x"]["n_frames"], got["x"]["voiced_frames"]) == (6, 3)
    assert got["s"]["first_voiced"] is None
    assert got["s"]["voiced_frames"] == 0
