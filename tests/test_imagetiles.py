"""Image tiling (operators/imagetiles.py) — exact tile sums on a
quadrant image, floor-bound ragged grids, flat detection, rollup."""

from __future__ import annotations

import numpy as np

from sigraph_spark.operators.imagetiles import image_tiles, tile_profile
from sigraph_spark.operators.multimodal import encode_bmp, encode_png


def test_quadrant_sums_and_flat(spark):
    # 8x8 image, 2x2 grid: four solid 4x4 quadrants
    px = np.zeros((8, 8, 3), dtype=np.uint8)
    px[:4, :4] = (10, 20, 30)
    px[:4, 4:] = (40, 50, 60)
    px[4:, :4] = (70, 80, 90)
    px[4:, 4:] = (100, 110, 120)
    df = spark.createDataFrame(
        [("q", bytearray(encode_png(8, 8, px.tobytes())))],
        "media_id string, payload binary")
    got = {(r["tx"], r["ty"]): r
           for r in image_tiles(df, grid=2).collect()}
    assert got[(0, 0)]["sum_r"] == 16 * 10
    assert got[(1, 0)]["sum_g"] == 16 * 50
    assert got[(0, 1)]["sum_b"] == 16 * 90
    assert all(r["flat"] for r in got.values())
    assert all(r["n_px"] == 16 for r in got.values())


def test_ragged_grid_and_nonflat(spark):
    # 5x3 image, grid 2: floor bounds -> widths (2,3), heights (1,2)
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(3, 5, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [("r", bytearray(encode_bmp(5, 3, px.tobytes())))],
        "media_id string, payload binary")
    got = {(r["tx"], r["ty"]): r
           for r in image_tiles(df, grid=2).collect()}
    assert (got[(0, 0)]["tile_w"], got[(0, 0)]["tile_h"]) == (2, 1)
    assert (got[(1, 1)]["tile_w"], got[(1, 1)]["tile_h"]) == (3, 2)
    exp = px[1:3, 2:5].astype(np.int64).sum(axis=(0, 1))
    assert got[(1, 1)]["sum_r"] == int(exp[0])
    assert not got[(1, 1)]["flat"]


def test_box_resize_matches_naive_reference():
    from sigraph_spark.operators.imagetiles import box_resize

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(13, 17, 3), dtype=np.uint8)
    out = box_resize(px, 5, 4)
    for oy in range(4):
        for ox in range(5):
            y0, y1 = oy * 13 // 4, (oy + 1) * 13 // 4
            x0, x1 = ox * 17 // 5, (ox + 1) * 17 // 5
            box = px[y0:y1, x0:x1].astype(np.int64)
            exp = box.sum(axis=(0, 1)) // box.shape[0] // box.shape[1]
            assert (out[oy, ox] == exp.astype(np.uint8)).all(), (oy, ox)


def test_box_resize_upscale_clamps():
    from sigraph_spark.operators.imagetiles import box_resize

    px = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    out = box_resize(px, 4, 4)  # upscale: nearest source pixel
    assert out.shape == (4, 4, 3)
    assert (out[0, 0] == px[0, 0]).all()
    assert (out[3, 3] == px[1, 1]).all()


def test_image_resize_operator_roundtrip(spark):
    from sigraph_spark.operators.imagehash import decode_rgb_payload
    from sigraph_spark.operators.imagetiles import box_resize, image_resize

    rng = np.random.default_rng(13)
    px = rng.integers(0, 256, size=(12, 16, 3), dtype=np.uint8)
    rows = [("a", bytearray(encode_png(16, 12, px.tobytes()))),
            ("junk", bytearray(b"\x00no" * 5))]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    got = {r["id"]: r for r in image_resize(df, 8, 6).collect()}
    assert got["junk"]["resized"] is None
    w, h, rgb = decode_rgb_payload(bytes(got["a"]["resized"]))
    assert (w, h) == (8, 6)
    exp = box_resize(px, 8, 6)
    assert rgb == exp.tobytes()  # lossless PNG round trip, exact pixels
    assert got["a"]["sum_r"] == int(exp[:, :, 0].astype(np.int64).sum())


def test_dirty_payload_and_profile(spark):
    px = np.full((4, 4, 3), 7, dtype=np.uint8)
    rows = [("a", bytearray(encode_png(4, 4, px.tobytes()))),
            ("b", bytearray(encode_png(4, 4, px.tobytes()))),
            ("junk", bytearray(b"\x00nope" * 4))]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    tiles = image_tiles(df, grid=2)
    null_rows = tiles.filter(tiles.tx.isNull()).collect()
    assert [r["id"] for r in null_rows] == ["junk"]
    prof = {(r["tx"], r["ty"]): r for r in tile_profile(tiles).collect()}
    assert prof[(0, 0)]["n_tiles"] == 2
    assert prof[(0, 0)]["sum_r"] == 2 * 4 * 7
    assert prof[(0, 0)]["n_flat"] == 2
