"""Matroska/WebM (EBML, RFC 8794) metadata walk: parser vs the
skeleton builder, vint edges, unknown-size (live-mux) Segments,
float32/float64 Durations, and the two-container operator dispatch.
Container metadata only — sample decode stays a declared non-goal."""
from __future__ import annotations

import pytest

from sigraph_spark.operators.multimodal import (
    _ebml_read_id,
    _ebml_read_size,
    encode_mkv,
    encode_mp4,
    mkv_metadata,
    video_metadata,
)


def test_roundtrip_webm_video_and_audio():
    p = encode_mkv(
        1_000_000, 90_000.0,
        [{"type": 1, "codec": "V_VP9", "width": 640, "height": 360},
         {"type": 2, "codec": "A_OPUS"}],
        doctype="webm",
    )
    m = mkv_metadata(p)
    assert m == {
        "format": "matroska-webm", "duration_ms": 90_000, "n_tracks": 2,
        "width": 640, "height": 360, "video_codec": "V_VP9",
        "audio_codec": "A_OPUS",
    }


def test_timestamp_scale_and_float64_duration():
    # 500µs ticks: 90000 ticks -> 45000 ms, via an 8-byte Duration
    p = encode_mkv(
        500_000, 90_000.0,
        [{"type": 1, "codec": "V_AV1", "width": 1920, "height": 1080}],
        float64_duration=True,
    )
    m = mkv_metadata(p)
    assert m["format"] == "matroska-matroska"
    assert m["duration_ms"] == 45_000
    assert (m["width"], m["height"]) == (1920, 1080)
    assert m["audio_codec"] is None and m["n_tracks"] == 1


def test_unknown_size_segment_extends_to_eof():
    args = (1_000_000, 5_000.0,
            [{"type": 2, "codec": "A_MPEG/L3"}])
    known = encode_mkv(*args)
    live = encode_mkv(*args, unknown_segment_size=True)
    assert mkv_metadata(live) == mkv_metadata(known)
    assert mkv_metadata(live)["audio_codec"] == "A_MPEG/L3"


def test_first_video_track_wins_dimensions():
    p = encode_mkv(
        1_000_000, 1_000.0,
        [{"type": 1, "codec": "V_VP8", "width": 320, "height": 240},
         {"type": 1, "codec": "V_VP9", "width": 640, "height": 480}],
    )
    m = mkv_metadata(p)
    assert (m["width"], m["height"], m["video_codec"]) == (320, 240, "V_VP8")
    assert m["n_tracks"] == 2


def test_vint_edges():
    # 1-byte id 0xAE; 2-byte id 0x42 0x82 compares as the registry int
    assert _ebml_read_id(b"\xae", 0) == (0xAE, 1)
    assert _ebml_read_id(b"\x42\x82", 0) == (0x4282, 2)
    # size marker bit cleared: 0x81 -> 1; 0x40 0x80 -> 128
    assert _ebml_read_size(b"\x81", 0) == (1, False, 1)
    assert _ebml_read_size(b"\x40\x80", 0) == (128, False, 2)
    # all-ones payload = unknown
    assert _ebml_read_size(b"\xff", 0) == (127, True, 1)
    with pytest.raises(ValueError):
        _ebml_read_id(b"\x00\x01", 0)
    with pytest.raises(ValueError):
        _ebml_read_size(b"\x40", 0)  # truncated 2-byte size


def test_malformed_raises():
    good = encode_mkv(1_000_000, 1_000.0,
                      [{"type": 1, "codec": "V_VP9",
                        "width": 16, "height": 16}])
    with pytest.raises(ValueError):
        mkv_metadata(b"\x00\x01garbage")  # invalid lead byte
    with pytest.raises(ValueError):
        mkv_metadata(b"\x1aE\xdf\xa3")  # header id, nothing else
    with pytest.raises(ValueError):
        mkv_metadata(good[:20])  # truncated mid-Segment
    # no Tracks element at all
    no_tracks = encode_mkv(1_000_000, 1_000.0, [])
    with pytest.raises(ValueError):
        mkv_metadata(no_tracks)


def test_video_metadata_operator_dispatches_both_containers(spark):
    rows = [
        ("v-mp4", bytearray(encode_mp4(
            1000, 2000, [{"handler": "vide", "codec": "avc1",
                          "width": 320, "height": 240}]))),
        ("v-mkv", bytearray(encode_mkv(
            1_000_000, 3_000.0,
            [{"type": 1, "codec": "V_VP9", "width": 640, "height": 360}],
            doctype="webm"))),
        ("v-bad", bytearray(b"neither container")),
    ]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    got = {r["media_id"]: r.asDict() for r in video_metadata(df).collect()}
    assert got["v-mp4"]["format"] == "isobmff-isom"
    assert got["v-mkv"]["format"] == "matroska-webm"
    assert got["v-mkv"]["duration_ms"] == 3000
    assert got["v-mkv"]["video_codec"] == "V_VP9"
    assert got["v-bad"]["format"] == "unknown"
