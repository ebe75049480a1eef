"""Image tiling + per-tile statistics: vision patch extraction
(round 5).

The Spark-side plumbing of vision training-data prep: models consume
fixed-grid patches, and corpus-level curation wants per-region
statistics (uniform tiles = screenshots/blanks, extreme tiles =
artifacts) without shipping pixels out of the decode stage. One Arrow
pass decodes (``imagehash.decode_rgb_payload`` — PNG/GIF/BMP/JPEG)
and emits per-tile EXACT integer channel sums:

* :func:`image_tiles` — ``(id, tx, ty, tile_w, tile_h, n_px, sum_r,
  sum_g, sum_b)`` over a ``grid x grid`` floor-bound tiling (the
  dHash block convention: tile t spans ``[floor(t*dim/grid),
  floor((t+1)*dim/grid))``, so every pixel lands in exactly one tile
  and ragged edges are real, not padded). Undecodable payloads yield
  one NULL row.
* :func:`tile_profile` — corpus rollup: per tile position the exact
  mean channel intensity (integer sums / pixel counts, division at
  the boundary) and the count of FLAT tiles (zero within-tile range
  on every channel — the blank-region detector).

Scale shape: decode + tiling is one narrow map; the profile is one
grid²-key aggregation with map-side partials. Pixel bytes never leave
the first stage.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["image_tiles", "tile_profile", "box_resize", "image_resize"]


def box_resize(px, out_w: int, out_h: int):
    """Exact-integer box resize of an (h, w, 3) int array -> (out_h,
    out_w, 3) uint8: output pixel (oy, ox) is the FLOOR mean of its
    floor-bound source box (the dHash block convention; degenerate
    boxes when upscaling clamp to one source pixel). Deterministic —
    no float appears anywhere."""
    import numpy as np

    h, w = px.shape[0], px.shape[1]
    acc = np.zeros((h + 1, w + 1, 3), dtype=np.int64)
    acc[1:, 1:] = px.astype(np.int64).cumsum(axis=0).cumsum(axis=1)

    def bounds(nb, dim):
        out = []
        for b in range(nb):
            lo, hi = b * dim // nb, (b + 1) * dim // nb
            if hi <= lo:
                lo = min(b, dim - 1)
                hi = lo + 1
            out.append((lo, hi))
        return out

    rb, cb = bounds(out_h, h), bounds(out_w, w)
    out = np.zeros((out_h, out_w, 3), dtype=np.uint8)
    for oy, (y0, y1) in enumerate(rb):
        for ox, (x0, x1) in enumerate(cb):
            s = (acc[y1, x1] - acc[y0, x1] - acc[y1, x0] + acc[y0, x0])
            out[oy, ox] = s // ((y1 - y0) * (x1 - x0))
    return out


def image_resize(
    media: DataFrame,
    out_w: int,
    out_h: int,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Decode -> exact box resize -> re-encode as PNG (lossless, so
    downstream consumers see the precise resized pixels) -> ``(id,
    width, height, resized binary, sum_r, sum_g, sum_b)`` with the
    sums over the RESIZED pixels (the gate evidence). Undecodable
    payloads yield a NULL row. One Arrow pass; bytes stay in-stage."""
    import pandas as pd  # noqa: F401

    cols = media.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.col(payload_col).alias("payload"),
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from sigraph_spark.operators.imagehash import decode_rgb_payload
        from sigraph_spark.operators.multimodal import encode_png

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    w, h, rgb = decode_rgb_payload(
                        bytes(payload) if payload is not None else b"")
                except ValueError:
                    rows.append({"id": mid, "width": None, "height": None,
                                 "resized": None, "sum_r": None,
                                 "sum_g": None, "sum_b": None})
                    continue
                px = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
                out = box_resize(px, out_w, out_h)
                s = out.astype(np.int64).sum(axis=(0, 1))
                rows.append({
                    "id": mid, "width": out_w, "height": out_h,
                    "resized": encode_png(out_w, out_h, out.tobytes()),
                    "sum_r": int(s[0]), "sum_g": int(s[1]),
                    "sum_b": int(s[2]),
                })
            yield pd.DataFrame(rows)

    schema = ("id string, width int, height int, resized binary, "
              "sum_r long, sum_g long, sum_b long")
    return cols.mapInPandas(run, schema)


def image_tiles(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    grid: int = 4,
) -> DataFrame:
    """-> one row per tile with exact integer channel sums and the
    per-channel min/max (flatness evidence)."""
    import pandas as pd  # noqa: F401

    cols = media.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.col(payload_col).alias("payload"),
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from sigraph_spark.operators.imagehash import decode_rgb_payload

        for pdf in batches:
            out = {k: [] for k in
                   ("id", "tx", "ty", "tile_w", "tile_h", "n_px",
                    "sum_r", "sum_g", "sum_b", "flat")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    w, h, rgb = decode_rgb_payload(
                        bytes(payload) if payload is not None else b"")
                except ValueError:
                    out["id"].append(mid)
                    for k in out:
                        if k != "id":
                            out[k].append(None)
                    continue
                px = np.frombuffer(rgb, dtype=np.uint8).reshape(
                    h, w, 3).astype(np.int64)
                for ty in range(grid):
                    y0, y1 = ty * h // grid, (ty + 1) * h // grid
                    for tx in range(grid):
                        x0, x1 = tx * w // grid, (tx + 1) * w // grid
                        t = px[y0:y1, x0:x1]
                        if t.size == 0:
                            continue  # image smaller than the grid
                        s = t.sum(axis=(0, 1))
                        flat = bool((t.max(axis=(0, 1))
                                     == t.min(axis=(0, 1))).all())
                        out["id"].append(mid)
                        out["tx"].append(tx)
                        out["ty"].append(ty)
                        out["tile_w"].append(x1 - x0)
                        out["tile_h"].append(y1 - y0)
                        out["n_px"].append((x1 - x0) * (y1 - y0))
                        out["sum_r"].append(int(s[0]))
                        out["sum_g"].append(int(s[1]))
                        out["sum_b"].append(int(s[2]))
                        out["flat"].append(flat)
            yield pd.DataFrame({
                "id": pd.Series(out["id"], dtype=object),
                **{k: pd.Series(out[k], dtype="Int64")
                   for k in ("tx", "ty", "tile_w", "tile_h", "n_px",
                             "sum_r", "sum_g", "sum_b")},
                "flat": pd.Series(out["flat"], dtype=object),
            })

    schema = ("id string, tx int, ty int, tile_w int, tile_h int, "
              "n_px long, sum_r long, sum_g long, sum_b long, "
              "flat boolean")
    return cols.mapInPandas(run, schema)


def tile_profile(tiles: DataFrame) -> DataFrame:
    """Corpus rollup per tile position: exact integer sums, pixel
    counts, and flat-tile counts — division only at the boundary."""
    t = tiles.filter(F.col("tx").isNotNull())
    return (
        t.groupBy("tx", "ty")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tiles"),
            F.sum("n_px").cast("long").alias("n_px"),
            F.sum("sum_r").cast("long").alias("sum_r"),
            F.sum("sum_g").cast("long").alias("sum_g"),
            F.sum("sum_b").cast("long").alias("sum_b"),
            F.sum(F.col("flat").cast("long")).cast("long").alias("n_flat"),
        )
    )
