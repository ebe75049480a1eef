"""Pure-Python FLAC codec (operators/flac.py) — lossless round-trip
oracle plus white-box decode-path coverage.

Losslessness is structural (the encoder's integer predictors mirror
the decoder's exactly), so ``decode(encode(pcm)) == pcm`` bit-for-bit
is the primary pin over a waveform × bits × channels × blocksize ×
partition-order grid. Decode-only paths the encoder doesn't emit
(Rice method 1 / 5-bit parameters, forced escape partitions, every
stereo assignment, reserved-type rejection) are exercised through
hand-assembled frames built with the module's own bit primitives.

Conformance caveat (documented in the module docstring too): no
third-party FLAC codec exists in this sandbox, so external interop is
untested here — CRC-8/CRC-16/MD5 self-checks and the spec-table pins
below are the in-sandbox evidence.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sigraph_spark.operators.flac import (
    _BitReader,
    _BitWriter,
    _crc8,
    _crc16,
    _utf8_code,
    _utf8_decode,
    decode_flac,
    encode_flac,
    flac_pcm_md5,
)


def _pcm(kind: str, n: int, bits: int, channels: int, seed: int = 3):
    rng = np.random.default_rng(seed)
    lim = 1 << (bits - 1)
    if kind == "noise":
        x = rng.integers(-lim, lim, size=(n, channels))
    elif kind == "sine":
        t = np.arange(n)
        base = (0.7 * lim * np.sin(2 * np.pi * 440 * t / 44100)).astype(np.int64)
        x = np.stack([base + c * 11 for c in range(channels)], axis=1)
    elif kind == "walk":
        x = np.cumsum(rng.integers(-lim // 64, lim // 64, size=(n, channels)), axis=0)
        x = np.clip(x, -lim, lim - 1)
    elif kind == "const":
        x = np.full((n, channels), -lim // 3)
    else:  # wasted: shared low zero bits
        x = rng.integers(-lim // 16, lim // 16, size=(n, channels)) * 8
    return np.asarray(x, dtype=np.int64)


@pytest.mark.parametrize("kind", ["noise", "sine", "walk", "const", "wasted"])
@pytest.mark.parametrize("bits,channels", [(8, 1), (16, 1), (16, 2), (24, 2)])
def test_roundtrip_bit_identical(kind, bits, channels):
    x = _pcm(kind, 1500, bits, channels)
    for bs, po in ((256, 0), (4096, 2), (192, 1)):
        enc = encode_flac(44100, x, bits=bits, block_size=bs, partition_order=po)
        rate, ch, b, dec = decode_flac(enc)
        assert (rate, ch, b) == (44100, channels, bits)
        assert dec.shape == x.shape
        assert np.array_equal(dec, x)


def test_compression_real():
    """Predictors must actually compress: tonal and correlated signals
    come out well under raw size; the MD5/CRC overhead stays bounded on
    pure noise."""
    sine = _pcm("sine", 8000, 16, 1)
    walk = _pcm("walk", 8000, 24, 2)
    noise = _pcm("noise", 8000, 16, 2)
    assert len(encode_flac(44100, sine)) < 0.35 * sine.size * 2
    # walk steps are ±2^17 -> ~19-20 Rice bits of 24 raw
    assert len(encode_flac(96000, walk, bits=24)) < 0.85 * walk.size * 3
    assert len(encode_flac(48000, noise)) < 1.05 * noise.size * 2


def test_lpc_beats_fixed_on_tonal():
    # a PURE sine is FIXED-4's best case (high-order differencing kills
    # it); tone + dither is where LPC pays, as in real audio
    rng = np.random.default_rng(5)
    t = np.arange(6000)
    x = ((9000 * np.sin(2 * np.pi * 440 * t / 44100)).astype(np.int64)
         + rng.integers(-64, 64, size=6000))
    with_lpc = encode_flac(44100, x, max_lpc_order=8)
    fixed_only = encode_flac(44100, x, max_lpc_order=0)
    assert len(with_lpc) < len(fixed_only)
    for enc in (with_lpc, fixed_only):
        assert np.array_equal(decode_flac(enc)[3][:, 0], x)


def test_wasted_bits_shrink_stream():
    rng = np.random.default_rng(9)
    base = rng.integers(-2000, 2000, size=4000)
    shifted = base * 8           # 3 wasted bits per sample
    no_shift = base * 8 + 1      # same residual structure, no shared zeros
    e_shift = encode_flac(44100, shifted)
    e_ref = encode_flac(44100, no_shift)
    # the wasted-bits path must realise >=2 of the 3 removable bits/sample
    assert len(e_shift) < len(e_ref) - 2 * 4000 // 8
    assert np.array_equal(decode_flac(e_shift)[3][:, 0], shifted)


def test_stereo_decorrelation_chosen():
    """Correlated stereo must pick a side-coded assignment (8/9/10) and
    beat independent coding of the same channels."""
    x = _pcm("walk", 4000, 16, 1)[:, 0]
    st = np.stack([x, x + np.arange(4000) % 7], axis=1)
    enc = encode_flac(44100, st, block_size=4096)
    frame0 = 42  # 4 magic + 4 block header + 34 STREAMINFO
    assert enc[frame0:frame0 + 2] == b"\xff\xf8"
    chan_assign = enc[frame0 + 3] >> 4
    assert chan_assign in (8, 9, 10)
    mono_l = encode_flac(44100, st[:, 0], block_size=4096)
    mono_r = encode_flac(44100, st[:, 1], block_size=4096)
    assert len(enc) < len(mono_l) + len(mono_r)
    assert np.array_equal(decode_flac(enc)[3], st)


def test_many_frames_utf8_numbers():
    x = _pcm("walk", 192 * 150 + 17, 16, 1)  # 151 frames, idx > 0x7F
    enc = encode_flac(8000, x, block_size=192)
    assert np.array_equal(decode_flac(enc)[3], x)


@pytest.mark.parametrize("n", [0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF,
                               0x1FFFFF, 0x3FFFFFF, (1 << 31) - 1, (1 << 36) - 1])
def test_coded_number_roundtrip(n):
    b = _utf8_code(n)
    got, pos = _utf8_decode(b, 0)
    assert got == n and pos == len(b)


def test_empty_and_tiny():
    for x in (np.zeros((0,), dtype=np.int64), np.array([5]), np.array([-3, 3])):
        enc = encode_flac(44100, x)
        rate, ch, b, dec = decode_flac(enc)
        assert np.array_equal(dec[:, 0], x)


def test_md5_signature_guard():
    x = _pcm("sine", 2000, 16, 1)
    enc = bytearray(encode_flac(44100, x))
    enc[26] ^= 0xFF  # STREAMINFO MD5 byte (offset 8 + 18)
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(enc))
    # zeroed signature means "unset" -> no verification
    enc2 = bytearray(encode_flac(44100, x))
    enc2[26:42] = b"\x00" * 16
    assert np.array_equal(decode_flac(bytes(enc2))[3], x)


def test_frame_corruption_raises():
    x = _pcm("noise", 3000, 16, 2, seed=1)
    enc = bytearray(encode_flac(44100, x, block_size=1024))
    enc[len(enc) // 2] ^= 0x10
    with pytest.raises(ValueError):
        decode_flac(bytes(enc))


def test_truncation_and_magic():
    x = _pcm("sine", 1000, 16, 1)
    enc = encode_flac(44100, x)
    with pytest.raises(ValueError):
        decode_flac(enc[: len(enc) - 7])
    with pytest.raises(ValueError, match="magic"):
        decode_flac(b"OggS" + enc[4:])


def test_crc_vectors():
    # CRC-8 poly 0x07 and CRC-16 poly 0x8005 against published vectors
    assert _crc8(b"123456789") == 0xF4
    assert _crc16(b"123456789") == 0xFEE8
    assert _crc8(b"") == 0 and _crc16(b"") == 0


def _hand_frame(samples, bits, rate, method, param, escape_bits=None,
                stype=None):
    """Assemble a one-frame mono stream through paths the encoder never
    emits: Rice method 1, forced escape partitions, reserved types."""
    n = len(samples)
    hdr = bytearray([0xFF, 0xF8])
    hdr.append((6 << 4) | 13)                  # 8-bit blocksize, 16-bit rate
    hdr.append((0 << 4) | (4 << 1))            # mono, 16 bps
    hdr += _utf8_code(0)
    hdr.append(n - 1)
    hdr += struct.pack(">H", rate)
    hdr.append(_crc8(bytes(hdr)))
    w = _BitWriter()
    w.write(0, 1)
    w.write(stype if stype is not None else 0b001000 | 1, 6)  # FIXED order 1
    w.write(0, 1)                               # no wasted bits
    if stype is not None and not (8 <= stype <= 12):
        w.align()
        body = bytes(hdr) + w.bytes()
        return _stream(body, n, rate, bits)
    w.write_signed(int(samples[0]), bits)       # warmup
    res = np.diff(np.asarray(samples, dtype=np.int64))
    w.write(method, 2)
    w.write(0, 4)                               # partition order 0
    pbits, esc = (4, 15) if method == 0 else (5, 31)
    if escape_bits is not None:
        w.write(esc, pbits)
        w.write(escape_bits, 5)
        for v in res:
            w.write_signed(int(v), escape_bits)
    else:
        w.write(param, pbits)
        for v in res:
            u = (int(v) << 1) if v >= 0 else ((-int(v)) << 1) - 1
            w.write_unary(u >> param)
            if param:
                w.write(u & ((1 << param) - 1), param)
    w.align()
    body = bytes(hdr) + w.bytes()
    return _stream(body, n, rate, bits)


def _stream(frame_body, n, rate, bits):
    frame = frame_body + struct.pack(">H", _crc16(frame_body))
    si = _BitWriter()
    si.write(16, 16); si.write(16, 16); si.write(0, 24); si.write(0, 24)
    si.write(rate, 20); si.write(0, 3); si.write(bits - 1, 5); si.write(n, 36)
    streaminfo = si.bytes() + b"\x00" * 16
    return (b"fLaC" + bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:]
            + streaminfo + frame)


def test_decode_rice_method1():
    samples = np.cumsum(np.arange(24) % 5) + 3
    enc = _hand_frame(samples, 16, 32000, method=1, param=2)
    rate, ch, b, dec = decode_flac(enc)
    assert rate == 32000 and np.array_equal(dec[:, 0], samples)


def test_decode_escape_partition():
    samples = np.array([100, -20000, 30000, -15000, 25000, -9000, 12, 7])
    enc = _hand_frame(samples, 16, 16000, method=0, param=0, escape_bits=17)
    assert np.array_equal(decode_flac(enc)[3][:, 0], samples)


def test_decode_rejects_reserved_subframe():
    enc = _hand_frame(np.arange(8), 16, 8000, method=0, param=1, stype=2)
    with pytest.raises(ValueError, match="reserved subframe"):
        decode_flac(enc)


def test_decoder_lpc_path_from_encoder():
    """The encoder's quantized-LPC frames exercise the decoder's IIR
    reconstruction; force LPC by giving it a strongly tonal block."""
    rng = np.random.default_rng(5)
    t = np.arange(4096)
    x = ((9000 * np.sin(2 * np.pi * 440 * t / 44100)).astype(np.int64)
         + rng.integers(-64, 64, size=4096))
    enc = encode_flac(44100, x, block_size=4096, max_lpc_order=8)
    # white-box: the first subframe header carries an LPC type (1xxxxx).
    # 4096/44100 are both in the frame-header code tables, so the first
    # subframe starts right after hdr(4) + utf8(1) + crc8(1).
    frame0 = 42
    assert enc[frame0:frame0 + 2] == b"\xff\xf8"
    r = _BitReader(enc, frame0 + 6)
    assert r.read(1) == 0
    assert r.read(6) >= 32
    assert np.array_equal(decode_flac(enc)[3][:, 0], x)


def test_audio_features_flac_path():
    """audio_features' kernel takes the REAL codec path for fLaC
    payloads: window count from the decoded rate, RMS from the decoded
    samples — and a corrupted stream falls back to the byte stub
    instead of raising."""
    from sigraph_spark.operators.multimodal import _decode_audio_features

    rate = 16000
    x = _pcm("sine", rate, 16, 2)  # one second, stereo
    enc = encode_flac(rate, x, bits=16)
    n_windows, energies = _decode_audio_features(enc, None, 100)
    assert n_windows == 10  # 1 s / 100 ms, from the DECODED rate
    mono = x.astype("float64").mean(axis=1) / 32768.0
    expect = float(np.sqrt(np.mean(mono[: rate // 10] ** 2)))
    assert abs(energies[0] - expect) < 1e-9
    bad = bytearray(enc)
    bad[len(bad) // 2] ^= 0x40
    n2, e2 = _decode_audio_features(bytes(bad), 1000, 100)
    assert n2 >= 1  # stub fallback, no raise


def test_md5_helper_matches_hashlib():
    import hashlib

    x = np.array([[1, -2], [300, -400], [5, 6]], dtype=np.int64)
    manual = b"".join(int(v).to_bytes(2, "little", signed=True)
                      for v in x.reshape(-1))
    assert flac_pcm_md5(x, 16) == hashlib.md5(manual).digest()
