"""Real GIF codec: LZW state machine, palettes, interlace, seams."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sigraph_spark.operators.multimodal import (
    _decode_image_features,
    _decode_resize,
    _lzw_decode,
    _lzw_encode,
    _pixel_features,
    decode_gif,
    encode_gif,
)

PALETTE4 = bytes([0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255])


def _pack(codes_widths):
    """LSB-first GIF bit packing, widths given explicitly — independent
    of the encoder under test."""
    acc = nbits = 0
    out = bytearray()
    for code, width in codes_widths:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _manual_gif():
    """Hand-assembled 2x2 GIF (indices 0,1,2,1; 4-color GCT) with the
    code stream packed by hand per the spec: CLEAR,0,1,2 at 3 bits, then
    1,END at 4 bits (the width bump lands after the table reaches 8)."""
    stream = _pack([(4, 3), (0, 3), (1, 3), (2, 3), (1, 4), (5, 4)])
    return (
        b"GIF89a"
        + struct.pack("<HH", 2, 2)
        + bytes([0x80 | 0x70 | 0x01, 0, 0])  # GCT of 4 entries
        + PALETTE4
        + b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 2) + b"\x00"
        + bytes([2])  # LZW min code size
        + bytes([len(stream)]) + stream + b"\x00"
        + b"\x3b"
    )


def test_decode_hand_packed_stream():
    w, h, rgb = decode_gif(_manual_gif())
    assert (w, h) == (2, 2)
    px = np.frombuffer(rgb, dtype=np.uint8).reshape(2, 2, 3)
    assert px[0, 0].tolist() == [0, 0, 0]
    assert px[0, 1].tolist() == [255, 0, 0]
    assert px[1, 0].tolist() == [0, 255, 0]
    assert px[1, 1].tolist() == [255, 0, 0]


def test_lzw_roundtrip_with_table_growth():
    """16k pixels of deterministic 8-symbol noise: drives the code width
    through several bumps and fills the 4096-entry table, forcing the
    clear+reset path on the encoder and the add-stop path on the
    decoder."""
    rng = np.uint64(88172645463325252)
    vals = []
    for _ in range(16384):
        rng ^= rng << np.uint64(13)
        rng ^= rng >> np.uint64(7)
        rng ^= rng << np.uint64(17)
        vals.append(int(rng) & 7)
    data = bytes(vals)
    enc = _lzw_encode(3, data)
    assert _lzw_decode(3, enc, len(data)) == data
    assert len(enc) < len(data)  # actually compresses


def test_encode_decode_roundtrip_gradient():
    w, h = 31, 17
    px = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            px[y, x] = ((x % 5) * 50, (y % 5) * 45, ((x + y) % 5) * 40)
    payload = encode_gif(w, h, px.tobytes())
    assert payload[:6] == b"GIF89a"
    dw, dh, rgb = decode_gif(payload)
    assert (dw, dh) == (w, h)
    assert rgb == px.tobytes()


def test_interlace_roundtrip():
    w, h = 8, 13  # odd height exercises every interlace pass boundary
    px = np.arange(w * h * 3, dtype=np.uint64) % 7 * 36
    rgb = px.astype(np.uint8).tobytes()
    payload = encode_gif(w, h, rgb, interlace=True)
    assert payload[10 + 3 + 12 * 0 :].count(b"") >= 0  # smoke
    dw, dh, out = decode_gif(payload)
    assert (dw, dh, out) == (w, h, rgb)
    # interlace flag actually set in the image descriptor
    idesc = payload.index(b"\x2c")
    assert payload[idesc + 9] & 0x40


def test_single_color_and_max_palette():
    solid = encode_gif(4, 4, bytes([7, 7, 7]) * 16)
    assert decode_gif(solid)[2] == bytes([7, 7, 7]) * 16
    # exactly 256 distinct colors (16x16, unique per pixel)
    px = np.zeros((256, 3), dtype=np.uint8)
    px[:, 0] = np.arange(256)
    px[:128, 1] = 200
    payload = encode_gif(16, 16, px.tobytes())
    assert decode_gif(payload)[2] == px.tobytes()
    with pytest.raises(ValueError):
        big = np.zeros((300, 3), dtype=np.uint8)
        big[:, 0] = np.arange(300) % 256
        big[:, 1] = np.arange(300) // 256 + 1
        encode_gif(300, 1, big.tobytes())


def test_extensions_skipped_and_local_palette():
    base = _manual_gif()
    # splice a graphic-control extension between header+GCT and image
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    idesc = base.index(b"\x2c")
    with_ext = base[:idesc] + gce + base[idesc:]
    assert decode_gif(with_ext) == decode_gif(base)
    # local color table overrides: rewrite descriptor to carry its own
    # palette (reversed colors) and drop the global one
    stream_part = base[idesc + 10 :]
    lct = bytes(reversed(PALETTE4))
    no_gct_header = (
        b"GIF89a" + struct.pack("<HH", 2, 2) + bytes([0x00, 0, 0])
    )
    local = (
        no_gct_header
        + b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 2) + bytes([0x80 | 0x01])
        + lct
        + stream_part
    )
    _, _, rgb = decode_gif(local)
    pal = np.frombuffer(lct, dtype=np.uint8).reshape(-1, 3)
    px = np.frombuffer(rgb, dtype=np.uint8).reshape(-1, 3)
    assert px[0].tolist() == pal[0].tolist()


def test_malformed_inputs_raise():
    good = _manual_gif()
    for bad in (
        b"",
        b"GIF89a",
        good[:-2],  # missing terminator+trailer
        good[:20],  # truncated palette/stream
        b"NOTGIF" + good[6:],
    ):
        with pytest.raises(ValueError):
            decode_gif(bad)


def test_feature_seam_uses_real_decode():
    payload = encode_gif(4, 4, bytes([10, 20, 30]) * 16)
    assert _decode_image_features(payload) == _pixel_features(
        4, 4, bytes([10, 20, 30]) * 16
    )


def test_resize_seam_reencodes_gif():
    w, h = 12, 12
    px = np.zeros((h, w, 3), dtype=np.uint8)
    px[:, : w // 2] = (255, 0, 0)
    out = _decode_resize(encode_gif(w, h, px.tobytes()), 6, 6)
    assert out[:6] == b"GIF89a"
    dw, dh, rgb = decode_gif(out)
    assert (dw, dh) == (6, 6)
    got = np.frombuffer(rgb, dtype=np.uint8).reshape(6, 6, 3)
    assert got[0, 0].tolist() == [255, 0, 0]
    assert got[0, 5].tolist() == [0, 0, 0]
