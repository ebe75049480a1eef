"""Container text metadata (operators/mediatags.py): EXIF IFD walks
inside JPEG APP1 (both endiannesses, inline + offset ASCII), ID3v2.3
and v2.4 text frames across all text encodings, FLAC VORBIS_COMMENT,
Ogg Vorbis/Opus comment headers with REAL packet reassembly (a
comment packet spanning two pages via 255-lacing + the continuation
flag), and the Spark media_tags explode contract."""
from __future__ import annotations

import pytest

from sigraph_spark.operators.jpeg import encode_jpeg
from sigraph_spark.operators.mediameta import flac_metadata, ogg_metadata
from sigraph_spark.operators.mediatags import (
    encode_flac_with_comments,
    encode_id3v2,
    encode_jpeg_with_exif,
    encode_ogg_with_comments,
    flac_tags,
    id3_tags,
    jpeg_exif,
    media_tags,
    ogg_tags,
)


def _jpeg():
    return encode_jpeg(16, 16, bytes(16 * 16 * 3))


def test_exif_both_endians_and_offset_ascii():
    fields = {"make": "ACME", "model": "Cam 9000",
              "orientation": 6, "datetime": "2026:08:19 12:00:00"}
    for be in (False, True):
        got = jpeg_exif(encode_jpeg_with_exif(_jpeg(), fields,
                                              big_endian=be))
        assert got == fields
    # short ASCII stays inline (count <= 4 path)
    got = jpeg_exif(encode_jpeg_with_exif(_jpeg(), {"make": "X",
                                                    "orientation": 1}))
    assert got == {"make": "X", "orientation": 1}
    with pytest.raises(ValueError):
        jpeg_exif(_jpeg())  # no APP1 at all


def test_id3_versions_and_encodings():
    tags = [("TIT2", "Song Title"), ("TPE1", "Artist"),
            ("TXXX:mood", "calm")]
    assert id3_tags(encode_id3v2(tags, version=4, encoding=3)) == tags
    assert id3_tags(encode_id3v2(tags, version=3, encoding=0)) == tags
    uni = [("TALB", "Ünïcode Album")]
    assert id3_tags(encode_id3v2(uni, version=3, encoding=1)) == uni
    assert id3_tags(encode_id3v2(uni, version=4, encoding=2)) == uni
    with pytest.raises(ValueError):
        id3_tags(b"ID3\x02\x00\x00\x00\x00\x00\x00")  # v2.2 unsupported
    with pytest.raises(ValueError):
        id3_tags(b"not id3")


def test_flac_comments_and_metadata_coexist():
    fl = encode_flac_with_comments(
        44100, 2, 16, 44100, [("TITLE", "Flac Song"), ("ARTIST", "S")]
    )
    assert flac_tags(fl) == [("TITLE", "Flac Song"), ("ARTIST", "S")]
    # the dims walk still reads the (now non-last) STREAMINFO
    assert flac_metadata(fl)["duration_ms"] == 1000
    with pytest.raises(ValueError):
        flac_tags(b"fLaC" + bytes([0x80, 0, 0, 34]) + bytes(34))


@pytest.mark.parametrize("span", [False, True])
def test_ogg_comments_vorbis_and_spanning(span):
    og = encode_ogg_with_comments(
        "vorbis", 48000, 2, 96000,
        [("TITLE", "Ogg Song"), ("album", "A")], span_pages=span,
    )
    # keys normalize to upper case per the spec's case-insensitivity
    assert ogg_tags(og) == [("TITLE", "Ogg Song"), ("ALBUM", "A")]
    # the metadata walk coexists (granule -1 pages are ignored)
    assert ogg_metadata(og)["duration_ms"] == 2000


def test_ogg_comments_opus():
    op = encode_ogg_with_comments("opus", 48000, 1, 48000,
                                  [("title", "Opus Song")])
    assert ogg_tags(op) == [("TITLE", "Opus Song")]
    assert ogg_metadata(op)["format"] == "ogg-opus"


def test_ogg_truncation_raises():
    og = encode_ogg_with_comments("vorbis", 48000, 2, 96000,
                                  [("TITLE", "x")], span_pages=True)
    # cut inside the spanned comment packet: reassembly must fail loud
    first_len = 27 + og[26] + sum(og[27 : 27 + og[26]])
    with pytest.raises(ValueError):
        ogg_tags(og[: first_len + 40])


def test_media_tags_operator(spark):
    rows = [
        ("ex", bytearray(encode_jpeg_with_exif(
            _jpeg(), {"make": "ACME", "orientation": 3}))),
        ("id", bytearray(encode_id3v2([("TIT2", "T"), ("TPE1", "P")]))),
        ("fl", bytearray(encode_flac_with_comments(
            8000, 1, 16, 8000, [("TITLE", "F")]))),
        ("og", bytearray(encode_ogg_with_comments(
            "opus", 48000, 1, 480, [("ARTIST", "O")]))),
        ("xx", bytearray(b"no tags here")),
        ("nn", None),
    ]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    got = {(r["media_id"], r["tag"]): (r["container"], r["value"])
           for r in media_tags(df).collect()}
    assert got[("ex", "make")] == ("exif", "ACME")
    assert got[("ex", "orientation")] == ("exif", "3")
    assert got[("id", "TIT2")] == ("id3", "T")
    assert got[("fl", "TITLE")] == ("flac", "F")
    assert got[("og", "ARTIST")] == ("ogg", "O")
    assert not any(mid in ("xx", "nn") for mid, _ in got)


def test_id3_unsync_and_extended_header():
    """Tag-level unsynchronisation (0xFF 0x00 -> 0xFF, incl. a latin-1
    0xFF character in the text) and extended headers, both versions."""
    tags = [("TIT2", "Song \xff title"), ("TPE1", "Artist")]
    for ver in (3, 4):
        for unsync in (False, True):
            for ext in (False, True):
                blob = encode_id3v2(tags, version=ver, encoding=0,
                                    unsync=unsync, extended=ext)
                assert id3_tags(blob) == tags, (ver, unsync, ext)
    # the flag really is set and the transform applied
    plain = encode_id3v2(tags, encoding=0)
    unsynced = encode_id3v2(tags, encoding=0, unsync=True)
    assert plain[5] == 0 and unsynced[5] & 0x80
    assert len(unsynced) > len(plain)


def test_png_text_all_chunk_kinds():
    from sigraph_spark.operators.mediatags import (
        encode_png_with_text,
        png_text,
    )
    from sigraph_spark.operators.multimodal import decode_png, encode_png

    png = encode_png(8, 6, bytes(8 * 6 * 3))
    items = [("Title", "A café", "text"),
             ("Description", "long " * 80, "ztxt"),
             ("Author", "Ünïcode 作者", "itxt"),
             ("Note", "compressed ünïcode", "itxt-z")]
    p2 = encode_png_with_text(png, items)
    assert png_text(p2) == [(k, v) for k, v, _ in items]
    # pixel decode and the dims sniffer coexist with the text chunks
    assert decode_png(p2)[:2] == (8, 6)
    with pytest.raises(ValueError):
        png_text(png)  # no text chunks
    with pytest.raises(ValueError):
        png_text(b"\x89PNG\r\n\x1a\njunk")


def test_gif_comment_extension():
    from sigraph_spark.operators.mediatags import (
        encode_gif_with_comment,
        gif_comments,
    )
    from sigraph_spark.operators.multimodal import decode_gif, encode_gif

    gif = encode_gif(5, 4, bytes(5 * 4 * 3))
    long = "hello comment " * 30  # spans multiple 255-byte sub-blocks
    g2 = encode_gif_with_comment(gif, long)
    assert gif_comments(g2) == [("comment", long)]
    assert decode_gif(g2)[:2] == (5, 4)
    with pytest.raises(ValueError):
        gif_comments(gif)  # no comments


def test_media_tags_dispatches_png_and_gif(spark):
    from sigraph_spark.operators.mediatags import (
        encode_gif_with_comment,
        encode_png_with_text,
    )
    from sigraph_spark.operators.multimodal import encode_gif, encode_png

    rows = [
        ("pn", bytearray(encode_png_with_text(
            encode_png(4, 4, bytes(48)), [("Title", "t", "text")]))),
        ("gf", bytearray(encode_gif_with_comment(
            encode_gif(4, 4, bytes(48)), "c"))),
    ]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    got = {(r["media_id"], r["tag"]): (r["container"], r["value"])
           for r in media_tags(df).collect()}
    assert got[("pn", "Title")] == ("png", "t")
    assert got[("gf", "comment")] == ("gif", "c")
