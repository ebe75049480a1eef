"""FLAC-in-Ogg encapsulation (operators/oggflac.py) — mapping v1.0
round-trips, cross-page packet reassembly, page-CRC / granule /
mapping-header guards, and the metadata/tags/features integrations.

The codec underneath is the RFC 9639 implementation pinned by
tests/test_flac.py; these tests pin the Ogg layer: BOS packet layout
(magic, version, header count, embedded STREAMINFO), one-frame-per-
packet audio, granule positions, and that every verification hook
(Ogg CRC-32, continuation-flag consistency, EOS granule vs decoded
length) raises instead of returning wrong samples.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sigraph_spark.operators.oggflac import (
    _ogg_crc,
    _walk_packets,
    decode_ogg_flac,
    encode_ogg_flac,
    ogg_flac_streaminfo,
)


def _pcm(n: int, bits: int, channels: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    lim = 1 << (bits - 1)
    return rng.integers(-lim, lim, size=(n, channels)).astype(np.int64)


@pytest.mark.parametrize("bits,channels", [(8, 1), (16, 1), (16, 2), (24, 2)])
@pytest.mark.parametrize("split", [False, True])
def test_roundtrip_bit_identical(bits, channels, split):
    x = _pcm(1200, bits, channels)
    enc = encode_ogg_flac(48000, x, bits=bits, block_size=256,
                          split_first_frame=split)
    rate, ch, b, dec = decode_ogg_flac(enc)
    assert (rate, ch, b) == (48000, channels, bits)
    assert np.array_equal(dec, x)


def test_first_packet_layout():
    x = _pcm(300, 16, 1)
    enc = encode_ogg_flac(44100, x, comments=[("TITLE", "t")])
    packets, last_granule = _walk_packets(enc)
    first = packets[0]
    assert first[:5] == b"\x7fFLAC"
    assert first[5] == 1 and first[6] == 0          # mapping version 1.0
    assert struct.unpack(">H", first[7:9])[0] == 1  # one header packet
    assert first[9:13] == b"fLaC"
    assert (first[13] & 0x7F) == 0                  # STREAMINFO block
    assert len(first) == 13 + 4 + 34
    assert (packets[1][0] & 0x7F) == 4              # VORBIS_COMMENT block
    assert last_granule == 300
    # one audio frame per remaining packet, each with FLAC frame sync
    for pkt in packets[2:]:
        assert pkt[0] == 0xFF and (pkt[1] >> 1) == 0x7C


def test_split_packet_spans_pages_with_continuation():
    x = _pcm(8192, 16, 2, seed=11)
    enc = encode_ogg_flac(44100, x, block_size=4096, split_first_frame=True)
    # find a page whose header carries the continuation flag
    flags, granules = [], []
    pos = 0
    while pos + 27 <= len(enc):
        flags.append(enc[pos + 5])
        granules.append(struct.unpack_from("<q", enc, pos + 6)[0])
        nsegs = enc[pos + 26]
        pos += 27 + nsegs + sum(enc[pos + 27:pos + 27 + nsegs])
    assert any(f & 1 for f in flags)
    assert -1 in granules  # the page ending mid-packet
    rate, ch, b, dec = decode_ogg_flac(enc)
    assert np.array_equal(dec, x)


def test_page_crc_guard():
    enc = encode_ogg_flac(8000, _pcm(500, 16, 1))
    bad = bytearray(enc)
    bad[60] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        decode_ogg_flac(bytes(bad))


def test_eos_granule_guard():
    enc = bytearray(encode_ogg_flac(8000, _pcm(500, 16, 1)))
    # find the last page header and overstate its granule, re-CRC it
    pos, pages = 0, []
    while pos + 27 <= len(enc):
        nsegs = enc[pos + 26]
        size = 27 + nsegs + sum(enc[pos + 27:pos + 27 + nsegs])
        pages.append((pos, size))
        pos += size
    start, size = pages[-1]
    struct.pack_into("<q", enc, start + 6, 9999)
    enc[start + 22:start + 26] = b"\x00" * 4
    page = bytes(enc[start:start + size])
    enc[start + 22:start + 26] = struct.pack("<I", _ogg_crc(page))
    with pytest.raises(ValueError, match="granule"):
        decode_ogg_flac(bytes(enc))


def test_mapping_header_guards():
    enc = bytearray(encode_ogg_flac(8000, _pcm(200, 16, 1)))
    # first packet body starts right after the BOS page header (1 seg)
    body = 27 + enc[27 - 1 + 1]  # 27 header bytes + nsegs lacing bytes
    nsegs = enc[26]
    body = 27 + nsegs
    for off, val, msg in [(body, 0x7E, "magic|mapping"),
                          (body + 5, 2, "version|mapping")]:
        bad = bytearray(enc)
        bad[off] = val
        bad[22:26] = b"\x00" * 4
        # re-CRC the first page
        size = 27 + nsegs + sum(enc[27:27 + nsegs])
        page = bytearray(bad[:size])
        page[22:26] = b"\x00" * 4
        bad[22:26] = struct.pack("<I", _ogg_crc(bytes(page)))
        with pytest.raises(ValueError):
            decode_ogg_flac(bytes(bad))


def test_streaminfo_helper_matches_native():
    from sigraph_spark.operators.flac import encode_flac

    x = _pcm(700, 24, 2)
    native = encode_flac(32000, x, bits=24)
    enc = encode_ogg_flac(32000, x, bits=24)
    assert ogg_flac_streaminfo(enc) == native[8:42]


def test_ogg_metadata_recognizes_flac():
    from sigraph_spark.operators.mediameta import ogg_metadata

    enc = encode_ogg_flac(44100, _pcm(44100, 16, 2))
    meta = ogg_metadata(enc)
    assert meta["format"] == "ogg-flac"
    assert meta["sample_rate"] == 44100
    assert meta["channels"] == 2
    assert meta["duration_ms"] == 1000


def test_ogg_tags_reads_flac_comments():
    from sigraph_spark.operators.mediatags import ogg_tags

    enc = encode_ogg_flac(8000, _pcm(100, 16, 1),
                          comments=[("TITLE", "T1"), ("ARTIST", "A2")])
    assert ogg_tags(enc) == [("TITLE", "T1"), ("ARTIST", "A2")]
    bare = encode_ogg_flac(8000, _pcm(100, 16, 1))
    with pytest.raises(ValueError):
        ogg_tags(bare)  # no VORBIS_COMMENT header packet


def test_audio_features_oggflac_path():
    from sigraph_spark.operators.multimodal import _decode_audio_features

    rate, n = 8000, 8000
    t = np.arange(n)
    loud = (20000 * np.sin(2 * np.pi * 440 * t / rate)).astype(np.int64)
    quiet = (200 * np.sin(2 * np.pi * 440 * t / rate)).astype(np.int64)
    pcm = np.concatenate([loud[: n // 2], quiet[n // 2:]])[:, None]
    enc = encode_ogg_flac(rate, pcm, bits=16)
    n_win, feats = _decode_audio_features(enc, duration_ms=None,
                                          window_ms=250)
    assert n_win == 4
    # windowed RMS from REAL decoded samples: loud half >> quiet half
    assert min(feats[0], feats[1]) > 10 * max(feats[2], feats[3])


def test_declared_stub_still_covers_vorbis():
    from sigraph_spark.operators.mediameta import encode_ogg_skeleton
    from sigraph_spark.operators.multimodal import _decode_audio_features

    vorbis = encode_ogg_skeleton("vorbis", 44100, 2, 44100)
    n_win, feats = _decode_audio_features(vorbis, duration_ms=1000,
                                          window_ms=250)
    assert n_win >= 1  # falls back to the declared stub, never raises
