"""Acoustic fingerprint dedup (operators/audiofp.py) — exact-integer
Haar sub-band fingerprint vs an independent pure-Python reference,
gain/polarity/codec invariance through the repo codecs, and the
banded near-dup operator contract."""

from __future__ import annotations

import numpy as np
import pytest

from sigraph_spark.operators.audiofp import (
    afp_from_payload,
    audio_fp64,
    audio_hashes,
    audio_neardup,
    encode_wav16,
)


def _naive_fp(samples):
    """Independent reference: big-int Haar energies, no numpy."""
    x = [int(v) for v in samples]
    energies = [[0] * 9 for _ in range(8)]
    n = len(x)
    for s in range(9):
        a = x[s * n // 9: (s + 1) * n // 9]
        for lev in range(8):
            if len(a) < 2:
                break
            m = (len(a) // 2) * 2
            d = [a[i] - a[i + 1] for i in range(0, m, 2)]
            energies[lev][s] = sum(v * v for v in d)
            a = [a[i] + a[i + 1] for i in range(0, m, 2)]
    h = 0
    for lev in range(8):
        for s in range(8):
            h = (h << 1) | int(energies[lev][s] > energies[lev][s + 1])
    return h


def _noise(seed, n=9 * 512, lo=-1000, hi=1000):
    rng = np.random.default_rng(seed)
    return rng.integers(lo, hi, size=n, endpoint=True).astype(np.int64)


@pytest.mark.parametrize("seed,n", [(1, 9 * 512), (2, 1000), (3, 17),
                                    (4, 0), (5, 9 * 2048)])
def test_fp_matches_pure_python_reference(seed, n):
    x = _noise(seed, n=n) if n else np.array([], dtype=np.int64)
    assert audio_fp64(x) == _naive_fp(x)


def test_gain_polarity_invariance():
    x = _noise(7)
    f = audio_fp64(x)
    assert audio_fp64(x * 2) == f
    assert audio_fp64(x * 11) == f
    assert audio_fp64(-x) == f


def test_silence_is_zero():
    assert audio_fp64(np.zeros(4608, dtype=np.int64)) == 0
    assert audio_fp64(np.full(4608, 123, dtype=np.int64)) == 0


def test_codec_invariance_lossless():
    from sigraph_spark.operators.flac import encode_flac
    from sigraph_spark.operators.oggflac import encode_ogg_flac

    x = _noise(11)
    f = audio_fp64(x)
    assert afp_from_payload(encode_wav16(8000, x)) == f
    assert afp_from_payload(encode_flac(8000, x)) == f
    assert afp_from_payload(encode_ogg_flac(8000, x)) == f


def test_stereo_uses_channel0():
    from sigraph_spark.operators.flac import encode_flac

    left = _noise(13)
    right = _noise(14)
    stereo = np.stack([left, right], axis=1)
    assert afp_from_payload(encode_flac(8000, stereo)) == audio_fp64(left)


def test_adpcm_decodes():
    # IMA ADPCM is a 4-bit lossy codec: the fingerprint COMPUTES (the
    # decoder path works) but proximity is NOT claimed — quantization
    # noise dominates fine-level Haar details.
    from sigraph_spark.operators.multimodal import encode_ima_adpcm_wav

    x = _noise(15)
    fp = afp_from_payload(encode_ima_adpcm_wav(8000, x / 32768.0))
    assert fp is not None


def test_undecodable_yields_null_and_exact_longs(spark):
    x = _noise(21)
    f = audio_fp64(x)
    if f >= 1 << 63:
        f -= 1 << 64
    rows = [("a", bytearray(b"not audio at all")), ("b", None),
            ("c", bytearray(encode_wav16(8000, x)))]
    df = spark.createDataFrame(rows, "media_id string, payload binary") \
        .coalesce(1)
    got = {r["id"]: r["afp"] for r in audio_hashes(df).collect()}
    assert got["a"] is None and got["b"] is None
    assert got["c"] == f  # bit-exact despite NULL neighbours (Int64)


def test_incremental_equals_filtered_full(spark):
    from sigraph_spark.operators.audiofp import (
        audio_index,
        incremental_audio_candidates,
    )
    from sigraph_spark.operators.flac import encode_flac

    old_rows, new_rows = [], []
    for g in range(4):
        x = _noise(800 + g)
        old_rows.append((f"g{g}-wav", bytearray(encode_wav16(8000, x))))
        new_rows.append((f"g{g}-flac", bytearray(encode_flac(8000, x))))
    new_rows.append(("junk", bytearray(b"\x00static" * 4)))
    schema = "media_id string, payload binary"
    old_df = spark.createDataFrame(old_rows, schema)
    new_df = spark.createDataFrame(new_rows, schema)

    full = audio_neardup(old_df.unionByName(new_df)).collect()
    new_ids = {r[0] for r in new_rows}
    expected = {(r["a"], r["b"], r["hamming"]) for r in full
                if r["a"] in new_ids or r["b"] in new_ids}

    pairs, delta = incremental_audio_candidates(new_df,
                                                audio_index(old_df))
    got = {(r["a"], r["b"], r["hamming"]) for r in pairs.collect()}
    assert got == expected and len(expected) == 4  # 1 per group

    merged = {tuple(r) for r in
              audio_index(old_df).unionByName(delta).collect()}
    whole = {tuple(r) for r in
             audio_index(old_df.unionByName(new_df)).collect()}
    assert merged == whole


def test_neardup_lossless_groups(spark):
    from sigraph_spark.operators.flac import encode_flac
    from sigraph_spark.operators.oggflac import encode_ogg_flac

    rows = []
    for g in range(4):
        x = _noise(500 + g)
        rows.append((f"g{g}-wav", bytearray(encode_wav16(8000, x))))
        rows.append((f"g{g}-flac", bytearray(encode_flac(8000, x))))
        rows.append((f"g{g}-ogg", bytearray(encode_ogg_flac(8000, x))))
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    pairs = audio_neardup(df).collect()
    got = {(r["a"], r["b"]) for r in pairs}
    exp = set()
    for g in range(4):
        ids = sorted([f"g{g}-wav", f"g{g}-flac", f"g{g}-ogg"])
        exp |= {(ids[0], ids[1]), (ids[0], ids[2]), (ids[1], ids[2])}
    assert got == exp
    assert all(r["hamming"] == 0 for r in pairs)
