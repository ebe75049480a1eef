"""Progressive JPEG (SOF2) decode — exact oracle vs the baseline path.

The progressive encoder re-encodes the SAME quantized coefficients the
baseline encoder produces (shared block math in ``_quantized_blocks``),
so decoding its output must be BIT-IDENTICAL to decoding the baseline
bytes at the same quality: any error in spectral-selection bookkeeping,
successive-approximation shifts, EOB-run accounting, or the AC
correction-bit protocol breaks exact equality somewhere in the image.

Reference semantics: ITU T.81 G.1.2 (encode) / G.2.2 (decode);
reference repo has no media pipeline (this is a beyond-ref
training-data operator family, SURVEY.md "multimodal").
"""

from __future__ import annotations

import numpy as np
import pytest

from sigraph_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
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


@pytest.mark.parametrize("kind", ["noise", "gradient", "solid"])
@pytest.mark.parametrize("size", [(16, 16), (24, 8), (20, 13)])
@pytest.mark.parametrize("quality", [90, 50])
def test_progressive_decode_bit_identical_to_baseline(kind, size, quality):
    w, h = size
    rgb = _img(w, h, kind)
    base = decode_jpeg(encode_jpeg(w, h, rgb, quality=quality))
    prog_bytes = encode_jpeg_progressive(w, h, rgb, quality=quality)
    assert prog_bytes[2:4] != b"\xff\xc0" and b"\xff\xc2" in prog_bytes
    prog = decode_jpeg(prog_bytes)
    assert prog == base


def test_solid_image_exercises_eob_runs():
    """A big solid image makes every AC band empty: the encoder must
    fold the whole component into EOBn runs (eobrun >> 1) and the
    decoder must skip exactly that many blocks."""
    w, h = 64, 64  # 64 blocks per component
    rgb = _img(w, h, "solid")
    prog_bytes = encode_jpeg_progressive(w, h, rgb, quality=90)
    assert decode_jpeg(prog_bytes) == decode_jpeg(
        encode_jpeg(w, h, rgb, quality=90)
    )


def test_sparse_blocks_mix_eobruns_and_symbols():
    """Mostly-flat image with a few hot pixels: AC scans interleave
    EOB runs with coded coefficients, crossing the run boundary."""
    w, h = 48, 48
    arr = np.full((h, w, 3), 128, dtype=np.uint8)
    rng = np.random.default_rng(3)
    for _ in range(9):
        y, x = rng.integers(0, h), rng.integers(0, w)
        arr[y, x] = rng.integers(0, 256, size=3)
    rgb = arr.tobytes()
    assert decode_jpeg(encode_jpeg_progressive(w, h, rgb)) == decode_jpeg(
        encode_jpeg(w, h, rgb)
    )


def test_progressive_headers_and_scan_count():
    b = encode_jpeg_progressive(16, 16, _img(16, 16, "noise"))
    assert b.count(b"\xff\xda") >= 9  # DC first+refine, 4 AC first, 3 refine
    assert b.count(b"\xff\xc2") == 1


def test_invalid_progressive_scan_params_raise():
    """A baseline stream relabeled SOF2 carries an Ss=0..Se=63 scan —
    illegal in a progressive frame (DC band must be 0..0)."""
    good = encode_jpeg(8, 8, bytes(8 * 8 * 3), quality=90)
    prog = bytearray(good)
    idx = prog.find(b"\xff\xc0")
    prog[idx + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(prog))


def test_truncated_progressive_raises():
    b = encode_jpeg_progressive(16, 16, _img(16, 16, "noise"))
    with pytest.raises(ValueError):
        decode_jpeg(b[: len(b) // 2])


def test_multimodal_seam_accepts_progressive():
    """The media feature path decodes progressive payloads for real now
    instead of falling back to the byte-histogram stub."""
    from sigraph_spark.operators.multimodal import (
        _decode_image_features,
        _pixel_features,
    )

    rgb = _img(16, 16, "gradient")
    b = encode_jpeg_progressive(16, 16, rgb)
    assert _decode_image_features(b) == _pixel_features(*decode_jpeg(b))


def test_ac_refine_roundtrip_fuzz():
    """Encoder/decoder pair for the AC refinement protocol in isolation:
    200 random sparse coefficient blocks through first(Al=1) +
    refine(Al=0) must reconstruct every coefficient exactly. This is
    the layer where correction-bit mis-ordering hides (the bits are
    consumed positionally during each symbol's walk, split at ZRL
    16-zero boundaries — a bulk flush decodes fine on most blocks and
    corrupts the stream on the rest)."""
    import numpy as np

    from sigraph_spark.operators.jpeg import (
        _BitReader,
        _BitWriter,
        _build_huffman,
        _emit_ac_first,
        _emit_ac_refine,
        _encode_table,
        _FLAT_BITS,
        _FLAT_VALS,
        _prog_block_ac_first,
        _prog_block_ac_refine,
    )

    enc_tab = _encode_table(_FLAT_BITS, _FLAT_VALS)
    dec_tab = _build_huffman(_FLAT_BITS, _FLAT_VALS)
    rng = np.random.default_rng(12345)
    for _ in range(200):
        nblocks = int(rng.integers(1, 6))
        blocks = []
        for _b in range(nblocks):
            zz = np.zeros(64, dtype=np.int64)
            for _c in range(int(rng.integers(0, 12))):
                zz[int(rng.integers(1, 64))] = int(rng.integers(-9, 10))
            blocks.append(zz)
        ss, se = 1, 63
        w1 = _BitWriter()
        _emit_ac_first(w1, blocks, enc_tab, ss, se, 1)
        w1.flush()
        w2 = _BitWriter()
        _emit_ac_refine(w2, blocks, enc_tab, ss, se, 0)
        w2.flush()
        dec = [np.zeros(64, dtype=np.int32) for _ in range(nblocks)]
        r1 = _BitReader(bytes(w1.out) + b"\xff\xd9", 0)
        st = {"eobrun": 0}
        for b in dec:
            _prog_block_ac_first(b, r1, dec_tab, ss, se, 1, st)
        r2 = _BitReader(bytes(w2.out) + b"\xff\xd9", 0)
        st = {"eobrun": 0}
        for b in dec:
            _prog_block_ac_refine(b, r2, dec_tab, ss, se, 0, st)
        for zz, d in zip(blocks, dec):
            assert list(map(int, d[1:])) == list(map(int, zz[1:]))


def test_fill_bytes_between_scans_decode_identically():
    # T.81 B.1.1.2: runs of 0xFF are legal fill before any marker. The
    # end-of-scan search must return the LAST 0xFF before the real
    # marker id, not treat a fill 0xFF as the marker id (ADVICE r4).
    w, h = 24, 16
    payload = encode_jpeg_progressive(w, h, _img(w, h, "gradient"))
    clean = decode_jpeg(payload)
    # inject fill bytes before the SECOND SOS (i.e. at the end of the
    # first scan's entropy data) and before the EOI
    sos2 = payload.index(b"\xff\xda", payload.index(b"\xff\xda") + 2)
    stuffed = payload[:sos2] + b"\xff\xff\xff" + payload[sos2:]
    eoi = stuffed.rindex(b"\xff\xd9")
    stuffed = stuffed[:eoi] + b"\xff\xff" + stuffed[eoi:]
    assert decode_jpeg(stuffed) == clean


def test_fill_bytes_before_header_segments_decode_identically():
    w, h = 16, 16
    payload = encode_jpeg_progressive(w, h, _img(w, h, "noise"))
    clean = decode_jpeg(payload)
    # fill bytes between SOI and the first header marker
    stuffed = payload[:2] + b"\xff\xff" + payload[2:]
    assert decode_jpeg(stuffed) == clean
