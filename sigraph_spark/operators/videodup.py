"""Video near-duplicate detection via frame-hash overlap (round 5).

Ties the two media planes together: a video is a SEQUENCE of frames,
each frame dHashes exactly like a still image
(``imagehash.dhash64``), and two videos are near-dups when they share
frames — re-containered (AVI <-> mp4) or re-muxed copies of the same
footage carry pixel-identical decoded frames, so their frame-hash
SETS overlap exactly. The signature-overlap formulation (the video
fingerprinting literature's frame-level voting) makes the join an
equi-join on 64-bit frame hashes, never a pairwise video comparison:

* :func:`video_frame_hashes` — container sniff (RIFF/AVI vs
  ISO-BMFF) -> sample decode through the in-repo paths
  (``avi.decode_avi_frames`` / ``mp4frames.decode_mp4_frames``) ->
  one dHash row per frame; undecodable payloads yield a NULL row.
* :func:`video_neardup` — distinct (video, frame-hash) pairs joined
  on the hash; video pairs ranked by the number of DISTINCT shared
  frame hashes, kept at ``min_shared``. Exact hash equality is the
  contract (re-containered dups are pixel-identical); perceptual
  closeness of individual frames is the still-image operators' job.

Scale shape: decode + hash is one narrow Arrow pass (the blob never
leaves the stage); the only shuffle is the frame-hash equi-join,
whose keys are 64-bit hashes — a hash hot enough to matter is a
duplicated intro/outro card, and ``max_hash_df`` drops such
boilerplate frames loudly, the same device as text shingle DF cuts.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["video_frame_hashes", "video_neardup"]


def video_frame_hashes(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """-> ``(id, frame_idx, dh)`` per decoded frame (NULL row for
    undecodable payloads — crawl data is dirty by definition)."""
    import pandas as pd  # noqa: F401

    cols = media.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.col(payload_col).alias("payload"),
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from sigraph_spark.operators.avi import decode_avi_frames
        from sigraph_spark.operators.imagehash import dhash64
        from sigraph_spark.operators.mp4frames import decode_mp4_frames

        for pdf in batches:
            ids, idxs, dhs = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    b = bytes(payload) if payload is not None else b""
                    if b[:4] == b"RIFF":
                        frames = [(i, w, h, rgb)
                                  for i, w, h, rgb in decode_avi_frames(b)]
                    else:
                        _codec, frames = decode_mp4_frames(b)
                    for i, w, h, rgb in frames:
                        dh = dhash64(w, h, rgb)
                        if dh >= 1 << 63:
                            dh -= 1 << 64
                        ids.append(mid)
                        idxs.append(i)
                        dhs.append(dh)
                except ValueError:
                    ids.append(mid)
                    idxs.append(None)
                    dhs.append(None)
            # nullable Int64: the imagehash float64-coercion trap
            yield pd.DataFrame({
                "id": pd.Series(ids, dtype=object),
                "frame_idx": pd.Series(idxs, dtype="Int64"),
                "dh": pd.Series(dhs, dtype="Int64"),
            })

    return cols.mapInPandas(run, "id string, frame_idx int, dh long")


def video_neardup(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    min_shared: int = 2,
    max_hash_df: int = 20,
) -> DataFrame:
    """Video pairs sharing >= ``min_shared`` distinct frame hashes ->
    ``(a, b, shared)``. Frame hashes appearing in more than
    ``max_hash_df`` videos (intro cards, test patterns) are dropped
    before the join."""
    # fh feeds the document-frequency cut, its anti-join, and both
    # self-join legs — without a boundary each consumer re-runs the
    # video DECODE pass (opaque Arrow subplan, no reuse). One lazy
    # materialization of the per-video distinct frame hashes serves all.
    fh = (
        video_frame_hashes(media, id_col, payload_col)
        .filter(F.col("dh").isNotNull())
        .select("id", "dh")
        .distinct()
        .localCheckpoint(eager=False)
    )
    common = (
        fh.groupBy("dh").agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > max_hash_df)
        .select("dh")
    )
    fh = fh.join(F.broadcast(common), "dh", "left_anti")
    a = fh.select("dh", F.col("id").alias("a"))
    b = fh.select("dh", F.col("id").alias("b"))
    return (
        a.join(b, "dh")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
