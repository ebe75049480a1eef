"""Baseline JPEG codec: spec-pinned units + lossy round-trips."""

from __future__ import annotations

import numpy as np
import pytest

from sigraph_spark.operators.jpeg import (
    ZIGZAG,
    _BitReader,
    _build_huffman,
    _C,
    _extend,
    decode_jpeg,
    encode_jpeg,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10.0 * np.log10(255.0**2 / mse)


def test_zigzag_is_the_spec_table():
    # T.81 figure 5 spot values (independent of any code above)
    assert ZIGZAG[0] == 0 and ZIGZAG[1] == 1 and ZIGZAG[2] == 8
    assert ZIGZAG[63] == 63 and ZIGZAG[33] == 42 and ZIGZAG[10] == 32
    # independent reconstruction: diagonal walk, even diagonals downward
    walk = []
    for s in range(15):
        cols = (
            range(max(0, s - 7), min(s, 7) + 1)
            if s % 2 == 0
            else range(min(s, 7), max(0, s - 7) - 1, -1)
        )
        walk += [(s - i) * 8 + i for i in cols]
    assert ZIGZAG.tolist() == walk
    # a permutation of 0..63
    assert sorted(ZIGZAG.tolist()) == list(range(64))


def test_idct_matches_cosine_sum():
    """_C-based IDCT vs the textbook double cosine sum, computed here
    from scratch (catches any basis-matrix transposition/scale bug the
    encoder round-trip would mask)."""
    rng = np.arange(64, dtype=np.float64).reshape(8, 8) - 31.5
    fast = _C.T @ rng @ _C
    slow = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = np.sqrt(0.125) if u == 0 else 0.5
                    cv = np.sqrt(0.125) if v == 0 else 0.5
                    s += (
                        cu * cv * rng[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            slow[x, y] = s
    assert np.allclose(fast, slow, atol=1e-9)


def test_huffman_canonical_codes():
    # bits: one 2-bit code, two 3-bit codes -> canonical 00, 010, 011
    table = _build_huffman([0, 1, 2] + [0] * 13, [7, 3, 9])
    assert table == {(2, 0b00): 7, (3, 0b010): 3, (3, 0b011): 9}


def test_bitreader_unstuffing_and_extend():
    # 0xFF 0x00 is a stuffed literal 0xFF byte
    r = _BitReader(bytes([0b10110010, 0xFF, 0x00, 0b01000000]), 0)
    assert r.bits(8) == 0b10110010
    assert r.bits(8) == 0xFF
    assert r.bits(2) == 0b01
    assert _extend(0, 2) == -3 and _extend(3, 2) == 3
    assert _extend(0, 0) == 0 and _extend(5, 3) == 5 and _extend(2, 3) == -5


def test_roundtrip_solid_color_exact():
    rgb = bytes([120, 130, 140]) * (16 * 16)
    payload = encode_jpeg(16, 16, rgb, quality=90)
    assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
    w, h, out = decode_jpeg(payload)
    assert (w, h) == (16, 16)
    got = np.frombuffer(out, dtype=np.uint8).reshape(-1, 3)
    want = np.array([120, 130, 140])
    assert np.abs(got.astype(int) - want).max() <= 2  # rounding only


def test_roundtrip_gradient_psnr():
    w, h = 40, 24  # non-multiple-of-8 width/height exercise edge padding
    px = np.zeros((h, w, 3), dtype=np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    px[:, :, 0] = (xx * 255) // (w - 1)
    px[:, :, 1] = (yy * 255) // (h - 1)
    px[:, :, 2] = ((xx + yy) * 255) // (w + h - 2)
    payload = encode_jpeg(w, h, px.tobytes(), quality=90)
    dw, dh, out = decode_jpeg(payload)
    assert (dw, dh) == (w, h)
    got = np.frombuffer(out, dtype=np.uint8).reshape(h, w, 3)
    assert _psnr(px, got) > 35.0


def test_roundtrip_noise_quality_ordering():
    rng = np.uint64(2463534242)
    vals = []
    for _ in range(24 * 24 * 3):
        rng ^= rng << np.uint64(13)
        rng ^= rng >> np.uint64(7)
        rng ^= rng << np.uint64(17)
        vals.append(int(rng) & 0xFF)
    px = np.array(vals, dtype=np.uint8).reshape(24, 24, 3)
    lo = decode_jpeg(encode_jpeg(24, 24, px.tobytes(), quality=30))[2]
    hi = decode_jpeg(encode_jpeg(24, 24, px.tobytes(), quality=95))[2]
    p_lo = _psnr(px, np.frombuffer(lo, dtype=np.uint8).reshape(24, 24, 3))
    p_hi = _psnr(px, np.frombuffer(hi, dtype=np.uint8).reshape(24, 24, 3))
    assert p_hi > p_lo  # quality knob does what it says


def test_decode_deterministic():
    px = bytes(((i * 7) % 256) for i in range(12 * 12 * 3))
    payload = encode_jpeg(12, 12, px, quality=80)
    assert decode_jpeg(payload) == decode_jpeg(payload)


def test_malformed_and_unsupported_raise():
    good = encode_jpeg(8, 8, bytes(8 * 8 * 3), quality=90)
    with pytest.raises(ValueError):
        decode_jpeg(b"")
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG" + good[2:])
    with pytest.raises(ValueError):
        decode_jpeg(good[:40])  # truncated before SOS
    # progressive SOF2 must be rejected, not mis-decoded
    prog = bytearray(good)
    idx = prog.find(b"\xff\xc0")
    prog[idx + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(prog))


def test_feature_and_resize_seams():
    from sigraph_spark.operators.multimodal import (
        _decode_image_features,
        _decode_resize,
        _pixel_features,
    )

    rgb = bytes([200, 40, 90]) * (16 * 16)
    payload = encode_jpeg(16, 16, rgb, quality=92)
    feats = _decode_image_features(payload)
    w, h, decoded = decode_jpeg(payload)
    assert feats == _pixel_features(w, h, decoded)
    resized = _decode_resize(payload, 8, 8)
    assert resized[:2] == b"\xff\xd8"  # re-encoded as JPEG
    rw, rh, rrgb = decode_jpeg(resized)
    assert (rw, rh) == (8, 8)
    got = np.frombuffer(rrgb, dtype=np.uint8).reshape(-1, 3).mean(axis=0)
    assert np.abs(got - np.array([200, 40, 90])).max() < 8
