"""Audio segmentation: energy-based activity detection (round 5).

The trim/segment step of audio curation (the audio analog of the text
funnel's length/whitespace rules): training clips ship with leading
and trailing silence and long dead air, and an energy-threshold
activity detector — exact integer frame energies, no float — finds
the voiced spans:

* :func:`frame_energies` — decode through the repo codecs
  (``audiofp._pcm16_channel0``: WAV-PCM / IMA ADPCM / FLAC /
  Ogg-FLAC), then per non-overlapping frame of ``frame_len`` samples
  the INTEGER energy ``sum(x^2)`` (one Arrow pass; a 16-bit frame of
  4096 samples peaks at ~2^44 — int64-safe by construction).
* :func:`audio_segments` — frames -> maximal voiced/silent runs via
  gaps-and-islands (the ``pagination.py`` / text-reuse device:
  ``frame_idx - row_number()`` per (clip, voiced) is
  constant within a run), JVM-side — ``(id, seg_idx, voiced,
  start_frame, end_frame, n_frames)``.
* :func:`trim_bounds` — per clip, the first and last voiced frame
  (the keep-span a trimming rewrite would cut to) + total voiced
  ratio in exact integers.

Threshold contract: a frame is VOICED iff ``energy > threshold``
(absolute, in squared-sample units) — deterministic and
engine-portable; adaptive thresholds are a caller policy (compute a
corpus quantile with ``corpus.py``'s exact percentile and pass it).

Scale shape: decode+energy is one narrow Arrow pass; islands are one
per-clip window (bounded by clip length); no other shuffle.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["frame_energies", "audio_segments", "trim_bounds"]


def frame_energies(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    frame_len: int = 256,
) -> DataFrame:
    """-> ``(id, frame_idx, energy)`` with exact integer energies;
    undecodable payloads yield a single NULL row. The trailing
    partial frame is kept (its energy is over fewer samples — callers
    comparing against absolute thresholds see a quieter tail frame,
    which errs toward trimming silence, the safe side)."""
    import pandas as pd  # noqa: F401

    cols = media.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.col(payload_col).alias("payload"),
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from sigraph_spark.operators.audiofp import _pcm16_channel0

        for pdf in batches:
            ids, idxs, ens = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    x = _pcm16_channel0(
                        bytes(payload) if payload is not None else b"")
                except ValueError:
                    ids.append(mid)
                    idxs.append(None)
                    ens.append(None)
                    continue
                n = x.shape[0]
                for fi in range(0, max(n, 1), frame_len):
                    seg = x[fi:fi + frame_len]
                    ids.append(mid)
                    idxs.append(fi // frame_len)
                    ens.append(int(np.dot(seg, seg)) if seg.size else 0)
            yield pd.DataFrame({
                "id": pd.Series(ids, dtype=object),
                "frame_idx": pd.Series(idxs, dtype="Int64"),
                "energy": pd.Series(ens, dtype="Int64"),
            })

    return cols.mapInPandas(run, "id string, frame_idx int, energy long")


def audio_segments(
    energies: DataFrame,
    threshold: int,
) -> DataFrame:
    """Frame energies -> maximal constant-activity runs ``(id,
    seg_idx, voiced, start_frame, end_frame, n_frames)`` (end
    inclusive), ordered by start within each clip."""
    e = energies.filter(F.col("frame_idx").isNotNull()).select(
        "id", "frame_idx", (F.col("energy") > threshold).alias("voiced"))
    w = Window.partitionBy("id", "voiced").orderBy("frame_idx")
    grouped = e.withColumn(
        "_isl", F.col("frame_idx") - F.row_number().over(w))
    segs = (
        grouped.groupBy("id", "voiced", "_isl")
        .agg(
            F.min("frame_idx").alias("start_frame"),
            F.max("frame_idx").alias("end_frame"),
            F.count(F.lit(1)).cast("long").alias("n_frames"),
        )
    )
    w2 = Window.partitionBy("id").orderBy("start_frame")
    return segs.select(
        "id",
        (F.row_number().over(w2) - 1).alias("seg_idx"),
        "voiced", "start_frame", "end_frame", "n_frames",
    )


def trim_bounds(
    energies: DataFrame,
    threshold: int,
) -> DataFrame:
    """Per clip: the voiced keep-span and activity ratio ->
    ``(id, first_voiced, last_voiced, n_frames, voiced_frames)``;
    all-silent clips carry NULL bounds (drop candidates)."""
    e = energies.filter(F.col("frame_idx").isNotNull())
    v = F.when(F.col("energy") > threshold, F.col("frame_idx"))
    return e.groupBy("id").agg(
        F.min(v).alias("first_voiced"),
        F.max(v).alias("last_voiced"),
        F.count(F.lit(1)).cast("long").alias("n_frames"),
        F.count(v).cast("long").alias("voiced_frames"),
    )
