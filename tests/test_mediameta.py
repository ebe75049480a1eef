"""Header-walk media metadata (operators/mediameta.py): image format
sniffers vs the repo's own encoders (JPEG baseline/progressive/
arithmetic, PNG, GIF incl. interlace, BMP) and vs the skeleton
builders for the walk-only formats (WebP VP8/VP8L/VP8X, TIFF both
endians, FLAC, Ogg Vorbis/Opus with real page CRCs); plus the Spark
operator contracts (image_metadata, and FLAC/Ogg joining
audio_metadata's parser chain). No pixel/sample decode anywhere —
that is the point of the operator."""
from __future__ import annotations

import struct

import pytest

from sigraph_spark.operators.jpeg import encode_jpeg, encode_jpeg_progressive
from sigraph_spark.operators.jpeg_arith import encode_jpeg_arithmetic
from sigraph_spark.operators.mediameta import (
    _ogg_crc,
    bmp_dims,
    encode_flac_skeleton,
    encode_ogg_skeleton,
    encode_tiff_skeleton,
    encode_webp_skeleton,
    flac_metadata,
    gif_dims,
    image_metadata,
    jpeg_dims,
    ogg_metadata,
    png_dims,
    tiff_dims,
    webp_dims,
)
from sigraph_spark.operators.multimodal import (
    audio_metadata,
    encode_bmp,
    encode_gif,
    encode_png,
)


def test_jpeg_dims_all_three_codings():
    rgb = bytes(24 * 16 * 3)
    assert jpeg_dims(encode_jpeg(24, 16, rgb)) == {
        "format": "jpeg", "width": 24, "height": 16, "bit_depth": 8,
        "channels": 3, "interlaced": False,
    }
    m = jpeg_dims(encode_jpeg_progressive(24, 16, rgb))
    assert (m["format"], m["interlaced"]) == ("jpeg-progressive", True)
    m = jpeg_dims(encode_jpeg_arithmetic(24, 16, rgb))
    assert (m["format"], m["width"], m["height"]) == ("jpeg-arith", 24, 16)


def test_png_gif_bmp_dims():
    assert png_dims(encode_png(16, 12, bytes(16 * 12 * 3)))["width"] == 16
    g = gif_dims(encode_gif(10, 8, bytes(10 * 8 * 3), interlace=True))
    assert (g["width"], g["height"], g["interlaced"]) == (10, 8, True)
    b = bmp_dims(encode_bmp(9, 7, bytes(9 * 7 * 3)))
    assert (b["width"], b["height"], b["channels"]) == (9, 7, 3)


def test_webp_variants():
    assert webp_dims(encode_webp_skeleton(320, 200, "vp8")) == {
        "format": "webp", "width": 320, "height": 200, "bit_depth": 8,
        "channels": 3, "interlaced": False,
    }
    m = webp_dims(encode_webp_skeleton(100, 50, "vp8l", alpha=True))
    assert (m["format"], m["width"], m["height"], m["channels"]) == (
        "webp-lossless", 100, 50, 4,
    )
    m = webp_dims(encode_webp_skeleton(16384, 3000, "vp8x", alpha=True))
    assert (m["format"], m["width"], m["channels"]) == (
        "webp-extended", 16384, 4,
    )
    with pytest.raises(ValueError):
        bad = bytearray(encode_webp_skeleton(32, 32, "vp8"))
        bad[23] = 0x00  # break the 9D 01 2A start code
        webp_dims(bytes(bad))


def test_tiff_both_endians_and_indirection():
    for be in (False, True):
        m = tiff_dims(encode_tiff_skeleton(640, 480, bits=16, samples=3,
                                           big_endian=be))
        assert m == {
            "format": "tiff", "width": 640, "height": 480,
            "bit_depth": 16, "channels": 3, "interlaced": False,
        }
    m = tiff_dims(encode_tiff_skeleton(33, 22, bits=8, samples=1))
    assert (m["bit_depth"], m["channels"]) == (8, 1)
    with pytest.raises(ValueError):
        tiff_dims(b"II*\x00\xff\xff\xff\xff")  # IFD offset past end


def test_avif_heic_property_walk():
    from sigraph_spark.operators.mediameta import (
        avif_dims,
        encode_avif_skeleton,
    )

    m = avif_dims(encode_avif_skeleton(1200, 800))
    assert m == {
        "format": "avif", "width": 1200, "height": 800, "bit_depth": 8,
        "channels": 3, "interlaced": False,
    }
    m = avif_dims(encode_avif_skeleton(64, 48, brand="heic", bits=10,
                                       channels=1))
    assert (m["format"], m["bit_depth"], m["channels"]) == ("heic", 10, 1)
    m = avif_dims(encode_avif_skeleton(2, 2, brand="mif1"))
    assert m["format"] == "heif"
    with pytest.raises(ValueError):
        avif_dims(b"\x00\x00\x00\x10ftypmp42" + bytes(8))  # video brand
    with pytest.raises(ValueError):
        # meta present but no ispe property
        skel = bytearray(encode_avif_skeleton(9, 9))
        at = bytes(skel).index(b"ispe")
        skel[at : at + 4] = b"free"
        avif_dims(bytes(skel))


def test_svg_dims_attrs_viewbox_and_relative():
    from sigraph_spark.operators.mediameta import svg_dims

    m = svg_dims(b'<svg width="120" height="80.5"><rect/></svg>')
    assert (m["format"], m["width"], m["height"]) == ("svg", 120, 80)
    m = svg_dims(b'<?xml version="1.0"?>\n<svg viewBox="0 0 640 480"/>')
    assert (m["width"], m["height"]) == (640, 480)
    # %-sized root falls back to the viewBox extent
    m = svg_dims(b'<svg width="100%" height="50%" '
                 b'viewBox="-10,-10, 30, 20"/>')
    assert (m["width"], m["height"]) == (30, 20)
    # em-sized with no viewBox: format known, dims NULL
    m = svg_dims(b'<svg width="2em" height="1em"/>')
    assert (m["format"], m["width"]) == ("svg", None)
    with pytest.raises(ValueError):
        svg_dims(b'<?xml version="1.0"?><html></html>')


def test_ico_largest_entry_wins():
    from sigraph_spark.operators.mediameta import (
        encode_ico_skeleton,
        ico_dims,
    )

    m = ico_dims(encode_ico_skeleton([(16, 16, 32), (48, 48, 8)]))
    assert (m["width"], m["height"], m["bit_depth"], m["channels"]) == (
        48, 48, 8, 3,
    )
    # the 0 byte means 256
    m = ico_dims(encode_ico_skeleton([(256, 256, 32), (16, 16, 8)]))
    assert (m["width"], m["channels"]) == (256, 4)
    with pytest.raises(ValueError):
        ico_dims(b"\x00\x00\x01\x00\x00\x00")  # zero entries
    with pytest.raises(ValueError):
        ico_dims(b"\x00\x00\x02\x00" + bytes(20))  # CUR, not ICO


def test_flac_streaminfo():
    m = flac_metadata(encode_flac_skeleton(44100, 2, 16, 441000))
    assert m["format"] == "flac"
    assert (m["sample_rate"], m["channels"], m["duration_ms"]) == (
        44100, 2, 10000,
    )
    m = flac_metadata(encode_flac_skeleton(96000, 8, 24, 0))
    assert (m["channels"], m["duration_ms"]) == (8, None)
    with pytest.raises(ValueError):
        flac_metadata(b"fLaC" + bytes([0x81]) + b"\x00\x00\x22" + bytes(34))


def test_ogg_vorbis_and_opus():
    m = ogg_metadata(encode_ogg_skeleton("vorbis", 48000, 2, 96000,
                                         nominal_bitrate=128000))
    assert m["format"] == "ogg-vorbis"
    assert (m["sample_rate"], m["bitrate_kbps"], m["duration_ms"]) == (
        48000, 128, 2000,
    )
    # Opus: granules run at 48 kHz and pre-skip comes off the total
    m = ogg_metadata(encode_ogg_skeleton("opus", 48000, 1, 48000,
                                         pre_skip=312))
    assert (m["format"], m["duration_ms"]) == ("ogg-opus", 1000)


def test_ogg_crc_and_structure():
    # The builder's pages carry real Ogg CRCs: recompute each page's
    # CRC with the field zeroed and compare.
    data = encode_ogg_skeleton("vorbis", 44100, 2, 44100)
    pos = 0
    n_pages = 0
    while pos < len(data):
        nsegs = data[pos + 26]
        size = 27 + nsegs + sum(data[pos + 27 : pos + 27 + nsegs])
        page = bytearray(data[pos : pos + size])
        want = struct.unpack_from("<I", page, 22)[0]
        page[22:26] = b"\x00\x00\x00\x00"
        assert _ogg_crc(bytes(page)) == want
        pos += size
        n_pages += 1
    assert n_pages == 3
    with pytest.raises(ValueError):
        ogg_metadata(b"OggS" + bytes(30))  # version byte wrong? body short
    with pytest.raises(ValueError):
        ogg_metadata(b"not ogg")


def test_image_metadata_operator(spark):
    rows = [
        ("jp", bytearray(encode_jpeg(16, 16, bytes(16 * 16 * 3)))),
        ("pn", bytearray(encode_png(8, 4, bytes(8 * 4 * 3)))),
        ("wb", bytearray(encode_webp_skeleton(64, 32, "vp8l"))),
        ("tf", bytearray(encode_tiff_skeleton(12, 34))),
        ("xx", bytearray(b"definitely not an image")),
        ("nn", None),
    ]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    got = {r["media_id"]: r.asDict() for r in image_metadata(df).collect()}
    assert got["jp"]["format"] == "jpeg" and got["jp"]["width"] == 16
    assert got["pn"]["height"] == 4
    assert got["wb"]["format"] == "webp-lossless"
    assert got["tf"]["width"] == 12 and got["tf"]["channels"] == 3
    assert got["xx"]["format"] == "unknown" and got["xx"]["width"] is None
    assert got["nn"]["format"] == "unknown"


def test_audio_metadata_chain_gains_flac_and_ogg(spark):
    rows = [
        ("fl", bytearray(encode_flac_skeleton(22050, 1, 16, 22050))),
        ("og", bytearray(encode_ogg_skeleton("opus", 48000, 2, 96000))),
        ("xx", bytearray(b"static noise")),
    ]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    got = {r["media_id"]: r.asDict() for r in audio_metadata(df).collect()}
    assert got["fl"]["format"] == "flac"
    assert got["fl"]["duration_ms"] == 1000
    assert got["og"]["format"] == "ogg-opus"
    assert got["og"]["duration_ms"] == 2000
    assert got["xx"]["format"] == "unknown"
