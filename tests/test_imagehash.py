"""Perceptual image dedup (operators/imagehash.py) — exact-integer
dHash vs a Fraction-arithmetic naive reference, format invariance
through the repo codecs, controlled-bit-flip Hamming behaviour of the
band blocking, and the operator contract."""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pytest

from sigraph_spark.operators.imagehash import (
    dhash64,
    dhash_from_payload,
    image_hashes,
    image_neardup,
)


def _naive_dhash(width, height, rgb):
    """Independent reference: Fraction means over the same floor-bound
    boxes (clamped the same way when dim < grid)."""
    px = np.frombuffer(rgb, dtype=np.uint8)[: width * height * 3]
    px = px.reshape(height, width, 3).astype(object)
    lum = px[:, :, 0] * 299 + px[:, :, 1] * 587 + px[:, :, 2] * 114

    def bounds(nb, dim):
        out = []
        for b in range(nb):
            lo, hi = b * dim // nb, (b + 1) * dim // nb
            if hi <= lo:
                lo = min(b, dim - 1)
                hi = lo + 1
            out.append((lo, hi))
        return out

    rb, cb = bounds(8, height), bounds(9, width)
    mean = [[Fraction(int(lum[r0:r1, c0:c1].sum()),
                      (r1 - r0) * (c1 - c0))
             for (c0, c1) in cb] for (r0, r1) in rb]
    h = 0
    for r in range(8):
        for c in range(8):
            h = (h << 1) | int(mean[r][c] > mean[r][c + 1])
    return h


def _rgb(width, height, seed=0, colors=2):
    rng = np.random.default_rng(seed)
    blocks = rng.integers(0, colors, size=(8, 9))
    px = np.kron(blocks, np.ones((max(1, height // 8 + 1),
                                  max(1, width // 9 + 1))))
    px = px[:height, :width] * (255 // max(1, colors - 1))
    return np.stack([px] * 3, axis=-1).astype(np.uint8).tobytes()


@pytest.mark.parametrize("w,h,seed", [(9, 8, 1), (37, 23, 2), (64, 64, 3),
                                      (5, 3, 4), (100, 31, 5)])
def test_dhash_matches_fraction_reference(w, h, seed):
    rng = np.random.default_rng(seed)
    rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8).tobytes()
    assert dhash64(w, h, rgb) == _naive_dhash(w, h, rgb)


def test_format_invariance_lossless():
    from sigraph_spark.operators.multimodal import (encode_bmp, encode_gif,
                                                    encode_png)

    w, h = 37, 23
    rgb = _rgb(w, h, seed=9)
    d = dhash64(w, h, rgb)
    assert dhash_from_payload(encode_png(w, h, rgb)) == d
    assert dhash_from_payload(encode_bmp(w, h, rgb)) == d
    assert dhash_from_payload(encode_gif(w, h, rgb)) == d


def test_jpeg_decodes_and_stays_close():
    from sigraph_spark.operators.jpeg import encode_jpeg

    # smooth gradient: block-mean comparisons have wide margins, so the
    # hash survives JPEG loss (hard-edged 2-color patterns sit on
    # comparison ties and flip under ringing — that is expected dHash
    # behaviour, not a defect)
    w, h = 48, 32
    g = np.add.outer(np.arange(h) * 3, np.arange(w) * 4) % 200
    rgb = np.stack([g] * 3, axis=-1).astype(np.uint8).tobytes()
    d = dhash64(w, h, rgb)
    dj = dhash_from_payload(encode_jpeg(w, h, rgb, quality=95))
    assert dj is not None
    assert bin((d ^ dj) & ((1 << 64) - 1)).count("1") <= 4  # lossy, close


def test_controlled_bit_flips():
    # 9x8 image: each pixel IS a block, so each of the 64 bits is the
    # comparison of two adjacent pixels — flip bits by swapping values.
    base = np.full((8, 9), 100, dtype=np.int64)
    for r in range(8):
        for c in range(9):
            base[r, c] = 100 + ((r * 9 + c) * 7) % 50
    rgb = np.stack([base] * 3, axis=-1).astype(np.uint8).tobytes()
    d0 = dhash64(9, 8, rgb)
    # swap one adjacent pair -> exactly that comparison can flip
    mod = base.copy()
    mod[0, 0], mod[0, 1] = base[0, 1], base[0, 0]
    rgb1 = np.stack([mod] * 3, axis=-1).astype(np.uint8).tobytes()
    d1 = dhash64(9, 8, rgb1)
    assert bin(d0 ^ d1).count("1") == 1


def test_undecodable_yields_null(spark):
    import pandas as pd  # noqa: F401

    rows = [("a", bytearray(b"not an image")), ("b", None),
            ("c", bytearray(_png_bytes()))]
    # one partition: the NULLs share a pandas batch with the real hash,
    # which must NOT coerce dh to float64 (low ~11 bits would round off)
    df = spark.createDataFrame(rows, "media_id string, payload binary") \
        .coalesce(1)
    got = {r["id"]: r["dh"] for r in image_hashes(df).collect()}
    assert got["a"] is None and got["b"] is None
    exp = dhash_from_payload(_png_bytes())
    if exp >= 1 << 63:
        exp -= 1 << 64
    assert got["c"] == exp  # bit-exact despite NULL neighbours


def _png_bytes(seed=21, w=30, h=20):
    from sigraph_spark.operators.multimodal import encode_png

    return encode_png(w, h, _rgb(w, h, seed=seed))


def test_neardup_groups_and_bands(spark):
    from sigraph_spark.operators.multimodal import (encode_bmp, encode_gif,
                                                    encode_png)

    rows = []
    for g in range(4):
        w, h = 24 + 3 * g, 16 + 2 * g
        rgb = _rgb(w, h, seed=500 + g)
        rows.append((f"g{g}-png", bytearray(encode_png(w, h, rgb))))
        rows.append((f"g{g}-bmp", bytearray(encode_bmp(w, h, rgb))))
        rows.append((f"g{g}-gif", bytearray(encode_gif(w, h, rgb))))
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    pairs = image_neardup(df).collect()
    got = {(r["a"], r["b"]) for r in pairs}
    exp = set()
    for g in range(4):
        ids = sorted([f"g{g}-png", f"g{g}-bmp", f"g{g}-gif"])
        exp |= {(ids[0], ids[1]), (ids[0], ids[2]), (ids[1], ids[2])}
    assert got == exp
    assert all(r["hamming"] == 0 for r in pairs)


def test_incremental_equals_filtered_full(spark):
    """neardup(old ∪ new) restricted to pairs with a new endpoint must
    equal incremental(new, index(old)) — the decomposition the stored
    index relies on; and appending the delta index reproduces
    index(old ∪ new)."""
    from sigraph_spark.operators.imagehash import (
        image_index,
        incremental_image_candidates,
    )
    from sigraph_spark.operators.multimodal import (encode_bmp, encode_gif,
                                                    encode_png)

    old_rows, new_rows = [], []
    for g in range(5):
        w, h = 24 + 3 * g, 16 + 2 * g
        rgb = _rgb(w, h, seed=700 + g)
        old_rows.append((f"g{g}-png", bytearray(encode_png(w, h, rgb))))
        old_rows.append((f"g{g}-bmp", bytearray(encode_bmp(w, h, rgb))))
        new_rows.append((f"g{g}-gif", bytearray(encode_gif(w, h, rgb))))
    new_rows.append(("junk", bytearray(b"\x00nope" * 5)))
    schema = "media_id string, payload binary"
    old_df = spark.createDataFrame(old_rows, schema)
    new_df = spark.createDataFrame(new_rows, schema)

    full = image_neardup(
        old_df.unionByName(new_df)).collect()
    new_ids = {r[0] for r in new_rows}
    expected = {(r["a"], r["b"], r["hamming"]) for r in full
                if r["a"] in new_ids or r["b"] in new_ids}

    pairs, delta = incremental_image_candidates(new_df,
                                                image_index(old_df))
    got = {(r["a"], r["b"], r["hamming"]) for r in pairs.collect()}
    assert got == expected and len(expected) == 10  # 2 per group x 5

    merged = {tuple(r) for r in
              image_index(old_df).unionByName(delta).collect()}
    whole = {tuple(r) for r in
             image_index(old_df.unionByName(new_df)).collect()}
    assert merged == whole


def test_neardup_finds_hamming_le3(spark):
    from sigraph_spark.operators.multimodal import encode_png

    base = np.full((8, 9), 100, dtype=np.int64)
    for r in range(8):
        for c in range(9):
            base[r, c] = 100 + ((r * 9 + c) * 7) % 50

    def png_of(arr):
        rgb = np.stack([arr] * 3, axis=-1).astype(np.uint8).tobytes()
        return bytearray(encode_png(9, 8, rgb))

    mod = base.copy()
    # three swaps in different rows -> Hamming <= 3 (pigeonhole-covered)
    for r in (0, 3, 6):
        mod[r, 0], mod[r, 1] = base[r, 1], base[r, 0]
    df = spark.createDataFrame(
        [("x", png_of(base)), ("y", png_of(mod))],
        "media_id string, payload binary",
    )
    pairs = image_neardup(df, max_hamming=3).collect()
    assert len(pairs) == 1
    assert pairs[0]["hamming"] <= 3
