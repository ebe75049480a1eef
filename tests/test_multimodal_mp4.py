"""ISO-BMFF (mp4) box-walk metadata: parser vs the skeleton builder,
64-bit forms, fill/truncation edges, and the Spark operator contract.
Container metadata only — sample decode stays a declared non-goal
(no codec libs in scope)."""
from __future__ import annotations

import pytest

from sigraph_spark.operators.multimodal import (
    encode_mp4,
    mp4_metadata,
    video_metadata,
)


def test_roundtrip_v0_video_and_audio():
    p = encode_mp4(
        1000, 90_000,
        [{"handler": "vide", "codec": "avc1", "width": 640, "height": 360},
         {"handler": "soun", "codec": "mp4a"}],
        brand=b"mp42",
    )
    m = mp4_metadata(p)
    assert m == {
        "format": "isobmff-mp42", "duration_ms": 90_000, "n_tracks": 2,
        "width": 640, "height": 360, "video_codec": "avc1",
        "audio_codec": "mp4a",
    }


def test_roundtrip_v1_64bit_and_largesize_mdat():
    p = encode_mp4(
        600, 1_234_567,
        [{"handler": "vide", "codec": "hev1", "width": 1920, "height": 1080}],
        version=1, largesize_mdat=True,
    )
    m = mp4_metadata(p)
    assert m["duration_ms"] == 1_234_567 * 1000 // 600
    assert (m["width"], m["height"]) == (1920, 1080)
    assert m["video_codec"] == "hev1" and m["audio_codec"] is None
    assert m["n_tracks"] == 1


def test_size_zero_box_extends_to_eof():
    p = encode_mp4(1000, 5000, [{"handler": "soun", "codec": "mp4a"}])
    # rewrite the trailing mdat's size field to 0 (to-end-of-file form)
    mdat_at = p.rindex(b"mdat") - 4
    p2 = p[:mdat_at] + b"\x00\x00\x00\x00" + p[mdat_at + 4:]
    assert mp4_metadata(p2) == mp4_metadata(p)


def test_first_video_track_wins_dimensions():
    p = encode_mp4(
        1000, 1000,
        [{"handler": "vide", "codec": "avc1", "width": 320, "height": 240},
         {"handler": "vide", "codec": "vp09", "width": 640, "height": 480}],
    )
    m = mp4_metadata(p)
    assert (m["width"], m["height"], m["video_codec"]) == (320, 240, "avc1")
    assert m["n_tracks"] == 2


def test_malformed_raises():
    good = encode_mp4(1000, 1000, [{"handler": "vide", "codec": "avc1",
                                    "width": 16, "height": 16}])
    with pytest.raises(ValueError):
        mp4_metadata(b"\x00\x00\x00\x08free")  # no ftyp
    with pytest.raises(ValueError):
        mp4_metadata(good[:40])  # truncated mid-moov
    with pytest.raises(ValueError):
        mp4_metadata(good[:12])  # too short
    # box overrunning its parent
    bad = bytearray(good)
    moov_at = good.index(b"moov") - 4
    bad[moov_at:moov_at + 4] = (len(good) * 2).to_bytes(4, "big")
    with pytest.raises(ValueError):
        mp4_metadata(bytes(bad))


def test_video_metadata_operator_contract(spark):
    rows = [
        ("v-0", bytearray(encode_mp4(
            1000, 2000, [{"handler": "vide", "codec": "avc1",
                          "width": 320, "height": 240}]))),
        ("v-1", bytearray(b"not a video at all")),
        ("v-2", None),
    ]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    got = {r["media_id"]: r.asDict() for r in video_metadata(df).collect()}
    assert got["v-0"]["format"] == "isobmff-isom"
    assert got["v-0"]["duration_ms"] == 2000
    assert got["v-0"]["video_codec"] == "avc1"
    assert got["v-1"]["format"] == "unknown"
    assert got["v-1"]["width"] is None
    assert got["v-2"]["format"] == "unknown"
