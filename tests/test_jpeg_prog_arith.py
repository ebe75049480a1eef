"""Progressive-arithmetic JPEG (SOF10, operators/jpeg_prog_arith.py):
bit-identity vs the baseline decode over the same grid the other three
codecs use, refinement-walk stress, restart resets, conditioning
variants, malformed-stream behavior."""
from __future__ import annotations

import numpy as np
import pytest

from sigraph_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)
from sigraph_spark.operators.jpeg_arith import encode_jpeg_arithmetic
from sigraph_spark.operators.jpeg_prog_arith import (
    encode_jpeg_progressive_arithmetic,
)


def _image(kind: str, w: int, h: int, seed: int = 0) -> bytes:
    if kind == "noise":
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8).tobytes()
    if kind == "gradient":
        x = np.linspace(0, 255, w)
        g = np.stack(
            [np.tile(x, (h, 1)), np.tile(x[::-1], (h, 1)),
             np.full((h, w), 77.0)], axis=2)
        return g.astype(np.uint8).tobytes()
    return np.full((h, w, 3), 190, dtype=np.uint8).tobytes()


@pytest.mark.parametrize("kind", ["noise", "gradient", "solid"])
@pytest.mark.parametrize("w,h", [(8, 8), (19, 13), (32, 24)])
@pytest.mark.parametrize("quality", [50, 90])
def test_bit_identical_to_baseline(kind, w, h, quality):
    rgb = _image(kind, w, h)
    base = decode_jpeg(encode_jpeg(w, h, rgb, quality=quality))
    pa = decode_jpeg(
        encode_jpeg_progressive_arithmetic(w, h, rgb, quality=quality))
    assert pa == base


def test_all_four_codecs_agree():
    rgb = _image("noise", 24, 17, seed=7)
    outs = {
        decode_jpeg(enc(24, 17, rgb, quality=75))
        for enc in (encode_jpeg, encode_jpeg_progressive,
                    encode_jpeg_arithmetic,
                    encode_jpeg_progressive_arithmetic)
    }
    assert len(outs) == 1


@pytest.mark.parametrize("ri", [1, 2, 3])
def test_restart_intervals_reset_coder_and_stats(ri):
    # Multi-MCU image so every scan crosses restart boundaries; the
    # encoder must re-read its stats dicts after each reset (the bug
    # class this test pins: stale stats refs across _fresh()).
    rgb = _image("noise", 40, 24, seed=ri)
    base = decode_jpeg(encode_jpeg(40, 24, rgb, quality=75))
    pa = decode_jpeg(encode_jpeg_progressive_arithmetic(
        40, 24, rgb, quality=75, restart_interval=ri))
    assert pa == base


def test_nondefault_conditioning():
    rgb = _image("gradient", 21, 18)
    base = decode_jpeg(encode_jpeg(21, 18, rgb, quality=90))
    for kx, lo, hi in ((1, 0, 1), (63, 0, 1), (5, 1, 3), (17, 2, 2)):
        pa = decode_jpeg(encode_jpeg_progressive_arithmetic(
            21, 18, rgb, quality=90, ac_kx=kx, dc_lo=lo, dc_hi=hi))
        assert pa == base, (kx, lo, hi)


def test_refinement_walk_stress():
    # Sparse high-frequency content maximizes newly-nonzero vs
    # history-nonzero interleave in the AC refinement scans.
    rng = np.random.default_rng(42)
    img = np.zeros((24, 24, 3), dtype=np.uint8)
    img[::3, ::5] = rng.integers(0, 256, size=img[::3, ::5].shape)
    rgb = img.tobytes()
    for q in (50, 75, 90):
        base = decode_jpeg(encode_jpeg(24, 24, rgb, quality=q))
        pa = decode_jpeg(
            encode_jpeg_progressive_arithmetic(24, 24, rgb, quality=q))
        assert pa == base


def test_compression_is_real():
    # The adaptive QM coder should beat Huffman progressive on smooth
    # content (same check the sequential arithmetic tests make).
    rgb = _image("gradient", 64, 48)
    pa = encode_jpeg_progressive_arithmetic(64, 48, rgb, quality=75)
    ph = encode_jpeg_progressive(64, 48, rgb, quality=75)
    assert len(pa) < len(ph)


def test_truncated_stream_raises():
    rgb = _image("noise", 16, 16)
    payload = encode_jpeg_progressive_arithmetic(16, 16, rgb, quality=75)
    with pytest.raises(ValueError):
        decode_jpeg(payload[: len(payload) // 2])


def test_bad_conditioning_rejected():
    rgb = _image("solid", 8, 8)
    with pytest.raises(ValueError):
        encode_jpeg_progressive_arithmetic(8, 8, rgb, ac_kx=0)
    with pytest.raises(ValueError):
        encode_jpeg_progressive_arithmetic(8, 8, rgb, dc_lo=3, dc_hi=1)


def test_sof10_classified_not_stub():
    # mediameta's header walk should see progressive AND arithmetic.
    from sigraph_spark.operators.mediameta import jpeg_dims

    rgb = _image("solid", 10, 9)
    meta = jpeg_dims(encode_jpeg_progressive_arithmetic(10, 9, rgb))
    assert (meta["width"], meta["height"]) == (10, 9)
