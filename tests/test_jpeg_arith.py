"""Arithmetic-coded JPEG (SOF9, T.81 Annex D QM-coder) — exact oracle
vs the baseline Huffman path.

The arithmetic encoder re-encodes the SAME quantized coefficients the
baseline encoder produces (shared block math in ``_quantized_blocks``),
so decoding its output must be BIT-IDENTICAL to decoding the baseline
bytes at the same quality: any error in the interval subdivision,
conditional MPS/LPS exchange, renormalization, carry resolution, byte
stuffing, DC context classification, or the magnitude-category chains
breaks exact equality somewhere in the image.

Also pinned: the QM coder primitive round-trips adversarial decision
streams (carry and 0xFF-run stress), the probability-estimation table's
structural invariants, DAC conditioning (non-default L/U/Kx), restart
intervals with full coder resets, and compression actually beating the
Huffman baseline (a broken estimator still round-trips — it just stops
compressing).

Conformance caveat (documented in the module docstring too): no
third-party arithmetic-capable JPEG decoder exists in this sandbox, so
interop with external codecs is untested here.
"""

from __future__ import annotations

import numpy as np
import pytest

from sigraph_spark.operators.jpeg import decode_jpeg, encode_jpeg
from sigraph_spark.operators.jpeg_arith import (
    _QM,
    _ArithDecoder,
    _ArithEncoder,
    _FIXED_BIN,
    encode_jpeg_arithmetic,
)


def _img(w, h, kind, seed=7):
    rng = np.random.default_rng(seed)
    if kind == "noise":
        return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8).tobytes()
    if kind == "gradient":
        x = np.linspace(0, 255, w)
        y = np.linspace(0, 255, h)
        g = np.stack(
            [
                np.tile(x, (h, 1)),
                np.tile(y[:, None], (1, w)),
                np.full((h, w), 64.0),
            ],
            axis=2,
        )
        return g.astype(np.uint8).tobytes()
    if kind == "solid":
        return np.full((h, w, 3), 130, dtype=np.uint8).tobytes()
    raise AssertionError(kind)


# --- QM coder primitive ---------------------------------------------------


def _roundtrip(decisions, n_bins=16):
    """Encode a (bin, bit) stream, then decode it with fresh stats and
    assert every bit comes back. Encoder and decoder adapt their own
    state copies independently — any mirror asymmetry desynchronizes
    the interval and corrupts the tail."""
    enc = _ArithEncoder()
    stats = bytearray(n_bins)
    for i, bit in decisions:
        enc.encode(stats, i, bit)
    data = enc.flush() + b"\xff\xd9"
    dec = _ArithDecoder(data, 0)
    stats2 = bytearray(n_bins)
    got = [dec.decode(stats2, i) for i, _ in decisions]
    assert got == [b for _, b in decisions]
    return data


def test_qm_roundtrip_random_streams():
    rng = np.random.default_rng(11)
    for trial in range(20):
        n = int(rng.integers(1, 4000))
        decisions = [
            (int(rng.integers(0, 16)), int(rng.integers(0, 2)))
            for _ in range(n)
        ]
        _roundtrip(decisions)


def test_qm_roundtrip_biased_streams_compress():
    # 99%-zero stream in one bin: must round-trip AND beat 1 bit/decision
    rng = np.random.default_rng(5)
    decisions = [(0, int(rng.random() < 0.01)) for _ in range(8000)]
    data = _roundtrip(decisions)
    assert len(data) < 8000 // 8 // 2  # at least 2x under raw bits


def test_qm_carry_and_ff_stress():
    # Alternating near-0.5 decisions produce dense streams with 0xFF
    # bytes and carries; stuffing must keep every 0xFF data byte
    # followed by 0x00 so the marker scan can't misfire.
    rng = np.random.default_rng(99)
    found_ff = False
    for trial in range(30):
        decisions = [
            (int(rng.integers(0, 4)), int(rng.integers(0, 2)))
            for _ in range(2000)
        ]
        data = _roundtrip(decisions)
        for j, b in enumerate(data[:-2]):
            if b == 0xFF:
                found_ff = True
                assert data[j + 1] == 0x00
    assert found_ff  # the stress actually exercised stuffing


def test_qm_table_invariants():
    assert len(_QM) == 114
    for idx, (qe, nmps, nlps, sw) in enumerate(_QM):
        assert 0 < qe < 0x8000
        assert 0 <= nmps < len(_QM) and 0 <= nlps < len(_QM)
        assert sw in (0, 1)
        if sw:  # MPS switch only on the ~0.5 fast-attack states
            assert qe > 0x5000
    # the sign bin never adapts
    qe, nmps, nlps, sw = _QM[_FIXED_BIN]
    assert (nmps, nlps, sw) == (_FIXED_BIN, _FIXED_BIN, 0)


# --- full codec vs the Huffman baseline -----------------------------------


@pytest.mark.parametrize("kind", ["noise", "gradient", "solid"])
@pytest.mark.parametrize("size", [(16, 16), (24, 8), (20, 13)])
@pytest.mark.parametrize("quality", [90, 50])
def test_arith_decode_bit_identical_to_baseline(kind, size, quality):
    w, h = size
    rgb = _img(w, h, kind)
    base = decode_jpeg(encode_jpeg(w, h, rgb, quality=quality))
    ar_bytes = encode_jpeg_arithmetic(w, h, rgb, quality=quality)
    assert b"\xff\xc9" in ar_bytes and b"\xff\xcc" in ar_bytes
    assert decode_jpeg(ar_bytes) == base


def test_arith_compresses_better_than_huffman():
    rgb = _img(48, 48, "gradient")
    hf = encode_jpeg(48, 48, rgb, quality=75)
    ar = encode_jpeg_arithmetic(48, 48, rgb, quality=75)
    assert len(ar) < len(hf)


def test_arith_nondefault_conditioning():
    rgb = _img(32, 24, "noise", seed=3)
    base = decode_jpeg(encode_jpeg(32, 24, rgb, quality=60))
    for dc_lo, dc_hi, kx in ((0, 0, 1), (2, 5, 63), (1, 3, 2)):
        ar = encode_jpeg_arithmetic(
            32, 24, rgb, quality=60, dc_lo=dc_lo, dc_hi=dc_hi, ac_kx=kx
        )
        assert decode_jpeg(ar) == base


def test_arith_restart_interval():
    rgb = _img(40, 24, "noise", seed=13)
    base = decode_jpeg(encode_jpeg(40, 24, rgb, quality=70))
    for ri in (1, 3):
        ar = encode_jpeg_arithmetic(40, 24, rgb, quality=70,
                                    restart_interval=ri)
        assert b"\xff\xd0" in ar  # RST0 present
        assert decode_jpeg(ar) == base


def test_arith_malformed():
    rgb = _img(16, 16, "solid")
    ar = encode_jpeg_arithmetic(16, 16, rgb, quality=80)
    with pytest.raises(ValueError):
        encode_jpeg_arithmetic(16, 16, rgb, dc_lo=5, dc_hi=2)
    with pytest.raises(ValueError):
        encode_jpeg_arithmetic(16, 16, rgb, ac_kx=0)
    # truncation mid-scan: zero-feed decodes garbage coefficients but
    # must either finish or raise ValueError — never crash elsewhere
    try:
        decode_jpeg(ar[: len(ar) // 2] + b"\xff\xd9")
    except ValueError:
        pass


def test_progressive_arithmetic_still_rejected():
    rgb = _img(16, 16, "solid")
    ar = bytearray(encode_jpeg_arithmetic(16, 16, rgb))
    sof = ar.index(b"\xff\xc9")
    ar[sof + 1] = 0xCA  # SOF10: progressive arithmetic — declared stub
    with pytest.raises(ValueError):
        decode_jpeg(bytes(ar))
