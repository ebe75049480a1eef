"""Multimodal plumbing: mapInPandas schema/batch contracts (stub decode)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sigraph_spark.operators.multimodal import (
    _decode_image_features,
    gen_media,
    image_features,
    rebalance_by_bytes,
    sample_frames,
)


def test_image_features_schema_and_rows(spark):
    media = gen_media(spark, n=32)
    out = image_features(media)
    assert out.columns == ["media_id", "n_bytes", "feature"]
    rows = out.collect()
    assert len(rows) == 32
    for r in rows:
        assert len(r["feature"]) == 16
        assert r["n_bytes"] > 0
        assert abs(sum(r["feature"]) - 1.0) < 1e-6  # normalized histogram


def test_decode_stub_handles_null_and_empty():
    assert _decode_image_features(None) == [0.0] * 16
    assert _decode_image_features(b"") == [0.0] * 16


def test_frame_sampling_fanout(spark):
    media = gen_media(spark, n=12)
    frames = sample_frames(media)
    per = {
        r["media_id"]: r["n"]
        for r in frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # duration (id%5+1) seconds -> that many frames
    assert per["m-0"] == 1 and per["m-4"] == 5
    one = frames.filter(
        (F.col("media_id") == "m-4") & (F.col("frame_idx") == 2)
    ).collect()[0]
    assert one["frame_ts_ms"] == 2000


def test_rebalance_preserves_rows(spark):
    media = gen_media(spark, n=20)
    out = rebalance_by_bytes(media)
    assert out.count() == 20
    assert set(out.columns) == set(media.columns)


def test_audio_features_contract(spark):
    from sigraph_spark.operators.multimodal import audio_features

    media = gen_media(spark, n=12)
    out = audio_features(media)
    assert out.columns == ["media_id", "n_windows", "feature"]
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 12
    # duration (id%5+1)s at 1000ms windows -> that many windows
    assert rows["m-4"]["n_windows"] == 5 and rows["m-0"]["n_windows"] == 1
    for r in rows.values():
        assert len(r["feature"]) == 16
        assert all(0.0 <= x <= 1.0 for x in r["feature"])


def test_resize_images_contract(spark):
    from sigraph_spark.operators.multimodal import resize_images

    media = gen_media(spark, n=8)
    out = resize_images(media, width=64, height=64)
    rows = out.collect()
    assert len(rows) == 8
    for r in rows:
        assert (r["width"], r["height"]) == (64, 64)
        assert len(bytes(r["payload"])) == 64 * 64 // 64  # stub size contract
    # deterministic across partitionings
    a = sorted((r["media_id"], bytes(r["payload"])) for r in rows)
    b = sorted(
        (r["media_id"], bytes(r["payload"]))
        for r in resize_images(media.repartition(5), 64, 64).collect()
    )
    assert a == b


def test_features_deterministic_across_partitionings(spark):
    media = gen_media(spark, n=16)
    a = sorted((r["media_id"], tuple(r["feature"])) for r in image_features(media.repartition(1)).collect())
    b = sorted((r["media_id"], tuple(r["feature"])) for r in image_features(media.repartition(8)).collect())
    assert a == b


# ---------------------------------------------------------------------------
# Real BMP codec path
# ---------------------------------------------------------------------------

def _checker_rgb(w, h):
    # deterministic checkerboard: red/blue alternating
    rows = bytearray()
    for y in range(h):
        for x in range(w):
            rows += b"\xff\x00\x00" if (x + y) % 2 == 0 else b"\x00\x00\xff"
    return bytes(rows)


def test_bmp_roundtrip_exact():
    from sigraph_spark.operators.multimodal import decode_bmp, encode_bmp

    for w, h in [(1, 1), (3, 2), (5, 5), (8, 4)]:  # incl. padded rows
        rgb = _checker_rgb(w, h)
        w2, h2, rgb2 = decode_bmp(encode_bmp(w, h, rgb))
        assert (w2, h2) == (w, h)
        assert rgb2 == rgb


def test_bmp_rejects_non_bmp_and_truncated():
    import pytest as _pytest

    from sigraph_spark.operators.multimodal import decode_bmp, encode_bmp

    with _pytest.raises(ValueError):
        decode_bmp(b"JUNKJUNKJUNK" * 10)
    good = encode_bmp(4, 4, _checker_rgb(4, 4))
    with _pytest.raises(ValueError):
        decode_bmp(good[:40])


def test_bmp_real_feature_path(spark):
    """A solid-color BMP produces the REAL pixel features (channel means +
    luma histogram), not the byte-histogram stub."""
    from sigraph_spark.operators.multimodal import encode_bmp, image_features

    solid_green = encode_bmp(6, 6, b"\x00\xff\x00" * 36)
    df = spark.createDataFrame(
        [("g", bytearray(solid_green))], "media_id string, payload binary"
    )
    feat = image_features(df).collect()[0]["feature"]
    assert abs(feat[0] - 0.0) < 1e-9          # mean R
    assert abs(feat[1] - 1.0) < 1e-9          # mean G
    assert abs(feat[2] - 0.0) < 1e-9          # mean B
    assert abs(feat[3] - 0.587) < 1e-3        # luma of pure green
    # all luma mass in one histogram bin
    assert max(feat[4:]) == 1.0 and sum(feat[4:]) == 1.0


def test_bmp_real_resize_path(spark):
    """resize_images on a BMP decodes -> nearest-neighbor -> re-encodes:
    the output payload is itself a valid BMP at the target dims."""
    from sigraph_spark.operators.multimodal import (
        decode_bmp, encode_bmp, resize_images,
    )

    src = encode_bmp(4, 4, _checker_rgb(4, 4))
    df = spark.createDataFrame(
        [("c", bytearray(src))], "media_id string, payload binary"
    )
    out = resize_images(df, 2, 2).collect()[0]
    w, h, rgb = decode_bmp(bytes(out["payload"]))
    assert (w, h) == (2, 2) and (out["width"], out["height"]) == (2, 2)
    # nearest-neighbor of the checker at stride 2 picks (0,0),(0,2),... all red
    assert rgb == b"\xff\x00\x00" * 4


# ---------------------------------------------------------------------------
# Real PNG codec path (compressed: zlib IDAT + scanline filters)
# ---------------------------------------------------------------------------

def _manual_png(width, height, color_type, pixel_bytes):
    """Hand-build a filter-0 PNG of arbitrary color type (0=gray, 6=RGBA)
    so decode branches the RGB-only encoder can't emit are still tested."""
    import struct
    import zlib

    nch = {0: 1, 2: 3, 6: 4}[color_type]
    lines = bytearray()
    for y in range(height):
        lines.append(0)
        lines += pixel_bytes[y * width * nch : (y + 1) * width * nch]

    def chunk(ctype, data):
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )


def test_png_roundtrip_all_filters():
    import numpy as np

    from sigraph_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.RandomState(7)
    for w, h in [(1, 1), (3, 2), (17, 9)]:
        rgb = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8).tobytes()
        for ft in range(5):  # None, Sub, Up, Average, Paeth all decode
            assert decode_png(encode_png(w, h, rgb, filter_type=ft)) == (w, h, rgb)


def test_png_gray_and_rgba_decode():
    from sigraph_spark.operators.multimodal import decode_png

    # gray 2x2 ramp -> replicated to RGB
    w, h, rgb = decode_png(_manual_png(2, 2, 0, bytes([0, 85, 170, 255])))
    assert (w, h) == (2, 2)
    assert rgb == bytes([0, 0, 0, 85, 85, 85, 170, 170, 170, 255, 255, 255])
    # RGBA 1x2 -> alpha dropped
    w, h, rgb = decode_png(_manual_png(1, 2, 6, bytes([1, 2, 3, 9, 4, 5, 6, 9])))
    assert (w, h) == (1, 2)
    assert rgb == bytes([1, 2, 3, 4, 5, 6])


def test_png_rejects_malformed():
    import pytest as _pytest

    from sigraph_spark.operators.multimodal import decode_png, encode_png

    good = encode_png(4, 4, bytes(48))
    for bad in [b"", b"\x89PNG\r\n\x1a\nXXXX", good[:30], good[:-8]]:
        with _pytest.raises(ValueError):
            decode_png(bad)
    corrupt = bytearray(good)
    corrupt[45] ^= 0xFF  # inside the deflate stream
    with _pytest.raises(ValueError):
        decode_png(bytes(corrupt))


def test_png_real_feature_path(spark):
    """A solid-color PNG produces the REAL pixel features, same as BMP —
    the compressed-format decode path is live end-to-end in Spark."""
    from sigraph_spark.operators.multimodal import encode_png, image_features

    solid_green = encode_png(6, 6, b"\x00\xff\x00" * 36, filter_type=4)
    df = spark.createDataFrame(
        [("g", bytearray(solid_green))], "media_id string, payload binary"
    )
    feat = image_features(df).collect()[0]["feature"]
    assert abs(feat[0] - 0.0) < 1e-9 and abs(feat[1] - 1.0) < 1e-9
    assert abs(feat[3] - 0.587) < 1e-3
    assert max(feat[4:]) == 1.0 and sum(feat[4:]) == 1.0


def test_png_real_resize_path(spark):
    """resize_images on a PNG re-encodes as PNG at the target dims."""
    from sigraph_spark.operators.multimodal import (
        decode_png, encode_png, resize_images,
    )

    src = encode_png(4, 4, _checker_rgb(4, 4), filter_type=2)
    df = spark.createDataFrame(
        [("c", bytearray(src))], "media_id string, payload binary"
    )
    out = resize_images(df, 2, 2).collect()[0]
    w, h, rgb = decode_png(bytes(out["payload"]))
    assert (w, h) == (2, 2)
    assert rgb == b"\xff\x00\x00" * 4  # nearest-neighbor stride-2 picks red


def test_non_bmp_payloads_keep_stub_behavior(spark):
    """The stub byte-histogram path is unchanged for non-BMP payloads —
    the media_features gate contract stays stable."""
    from sigraph_spark.operators.multimodal import _decode_image_features

    payload = b"MEDIA7xxxxxxxx"
    feats = _decode_image_features(payload)
    hist = [0] * 16
    for b in payload:
        hist[b % 16] += 1
    assert feats == [h / len(payload) for h in hist]


# ---------------------------------------------------------------------------
# Real WAV/PCM codec path (stdlib wave + numpy)
# ---------------------------------------------------------------------------

def test_wav_roundtrip_widths():
    import numpy as np

    from sigraph_spark.operators.multimodal import decode_wav, encode_wav

    t = np.arange(800) / 8000.0
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    # 8-bit: half-step 1/256 + encode(127)/decode(128) scale asymmetry
    for width, tol in [(1, 2e-2), (2, 1e-4), (4, 1e-8)]:
        rate, mono = decode_wav(encode_wav(8000, sig, width=width))
        assert rate == 8000 and len(mono) == 800
        assert float(np.abs(mono - sig).max()) < tol


def test_wav_stereo_downmix():
    import numpy as np

    from sigraph_spark.operators.multimodal import decode_wav, encode_wav

    sig = np.linspace(-0.9, 0.9, 64)
    rate, mono = decode_wav(encode_wav(16000, sig, width=2, channels=2))
    # both channels carry the same signal -> downmix reproduces it
    assert rate == 16000 and len(mono) == 64
    assert float(np.abs(mono - sig).max()) < 1e-3


def test_wav_windowed_rms_features(spark):
    """A 2-second WAV at known amplitudes: window RMS must equal the
    analytic sine RMS (a/sqrt(2)) per second, and n_windows must come
    from the REAL sample rate, not the metadata duration."""
    import numpy as np

    from sigraph_spark.operators.multimodal import audio_features, encode_wav

    rate = 8000
    t = np.arange(rate) / rate
    loud = 0.8 * np.sin(2 * np.pi * 100 * t)
    quiet = 0.2 * np.sin(2 * np.pi * 100 * t)
    wav = encode_wav(rate, np.concatenate([loud, quiet]), width=2)
    df = spark.createDataFrame(
        [("a", bytearray(wav), (99999,))],
        "media_id string, payload binary, meta struct<duration_ms:long>",
    )
    row = audio_features(df, window_ms=1000).collect()[0]
    assert row["n_windows"] == 2  # real duration, NOT meta's 99999ms
    feats = row["feature"]
    assert abs(feats[0] - 0.8 / np.sqrt(2)) < 1e-3
    assert abs(feats[1] - 0.2 / np.sqrt(2)) < 1e-3
    assert all(f == 0.0 for f in feats[2:])


def test_non_wav_audio_keeps_stub_behavior():
    from sigraph_spark.operators.multimodal import _decode_audio_features

    payload = b"NOTAWAVE" + bytes(range(64))
    n, feats = _decode_audio_features(payload, 4000, 1000)
    assert n == 4  # stub: duration_ms // window_ms
    assert len(feats) == 16


def test_truncated_wav_falls_back_to_stub():
    from sigraph_spark.operators.multimodal import (
        _decode_audio_features,
        encode_wav,
    )

    wav = encode_wav(8000, [0.1] * 100, width=2)
    broken = wav[:20]  # RIFF/WAVE magic intact, fmt chunk truncated
    n, feats = _decode_audio_features(broken, 2000, 1000)
    assert n == 2 and len(feats) == 16  # stub path, no raise


def test_ima_adpcm_roundtrip_and_feature_path(spark):
    import numpy as np

    from sigraph_spark.operators.multimodal import (
        _decode_audio_features, decode_ima_adpcm_wav, decode_wav,
        encode_ima_adpcm_wav, encode_wav,
    )

    t = np.arange(4000) / 8000.0
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    payload = encode_ima_adpcm_wav(8000, sig)
    rate, mono = decode_ima_adpcm_wav(payload)
    assert rate == 8000
    got = mono[: len(sig)]
    # ADPCM is lossy AND adapts from step 7, so the first ~10 samples
    # slew-limit (standard behavior): pin steady-state reconstruction
    assert float(np.max(np.abs(got[100:] - sig[100:]))) < 0.05
    assert float(np.corrcoef(got[100:], sig[100:])[0, 1]) > 0.995
    # stdlib wave refuses the compressed fmt tag -> PCM decoder raises
    import pytest

    with pytest.raises(ValueError):
        decode_wav(payload)
    # the audio-feature kernel routes 0x11 WAVs through the REAL decode:
    # window count comes from the true sample rate, and energies match
    # the PCM encoding of the same signal closely
    nw_adpcm, en_adpcm = _decode_audio_features(payload, None, 100)
    nw_pcm, en_pcm = _decode_audio_features(encode_wav(8000, sig), None, 100)
    assert nw_pcm == 5  # 4000 samples / (8000Hz * 100ms)
    # ADPCM pads the last block to a full 505-sample grid: 8 blocks =
    # 4040 decoded samples -> one extra (near-silent) window
    assert nw_adpcm == 6
    assert max(abs(a - b) for a, b in zip(en_adpcm[:5], en_pcm[:5])) < 0.01


def _mk_mp3(n_frames=10, bitrate_idx=9, id3=False):
    """Synthesize a CBR MPEG-1 Layer III stream: valid headers + zero
    payload (the parser never decodes samples)."""
    # sync=7FF, MPEG1 (ver bits 11), Layer III (bits 01), no CRC ->
    # 0xFFFB; bitrate idx<<4 | samplerate idx(00=44100)<<2, joint stereo
    frames = b""
    for _ in range(n_frames):
        hdr = bytes([0xFF, 0xFB, (bitrate_idx << 4) | 0x00, 0x40])
        # 128 kbps @ 44100: frame_len = 144*128000/44100 = 417
        frame_len = 1152 // 8 * (128_000) // 44100
        frames += hdr + b"\x00" * (frame_len - 4)
    if id3:
        # ID3v2 header, synchsafe size 200
        return b"ID3\x04\x00\x00" + bytes([0, 0, 1, 72]) + b"\x00" * 200 + frames
    return frames


def test_mp3_metadata_frame_walk(spark):
    from sigraph_spark.operators.multimodal import mp3_metadata

    meta = mp3_metadata(_mk_mp3(10))
    assert meta["format"] == "mpeg1-layer3"
    assert meta["sample_rate"] == 44100
    assert meta["channels"] == 2
    assert meta["bitrate_kbps"] == 128
    assert meta["n_frames"] == 10
    assert meta["duration_ms"] == 10 * (1152 * 1_000_000 // 44100) // 1000
    # ID3v2 prefix skipped via synchsafe size
    assert mp3_metadata(_mk_mp3(4, id3=True))["n_frames"] == 4
    import pytest

    with pytest.raises(ValueError):
        mp3_metadata(b"not audio at all")


def test_audio_metadata_operator(spark):
    import numpy as np

    from sigraph_spark.operators.multimodal import (
        audio_metadata, encode_ima_adpcm_wav, encode_wav,
    )

    sig = 0.2 * np.sin(np.arange(1600) / 10.0)
    rows = [
        ("m1", bytearray(_mk_mp3(8))),
        ("m2", bytearray(encode_wav(8000, sig))),
        ("m3", bytearray(encode_ima_adpcm_wav(8000, sig))),
        ("m4", bytearray(b"garbage")),
        ("m5", None),
    ]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    got = {r["media_id"]: r.asDict() for r in audio_metadata(df).collect()}
    assert got["m1"]["format"] == "mpeg1-layer3" and got["m1"]["n_frames"] == 8
    assert got["m2"]["format"] == "pcm16"
    assert got["m2"]["n_frames"] == 1600 and got["m2"]["duration_ms"] == 200
    assert got["m3"]["format"] == "ima-adpcm"
    # ADPCM pads to full 505-sample blocks: 4 blocks = 2020 frames
    assert got["m3"]["n_frames"] == 2020
    assert got["m4"]["format"] == "unknown"
    assert got["m5"]["format"] == "unknown"
