"""Container TEXT metadata — the tag/caption side of a multimodal
training corpus (alt-text-like signals carried INSIDE media blobs):
EXIF fields from JPEG APP1 (a TIFF IFD walk relative to the embedded
header, per the Exif 2.3 spec), ID3v2.3/2.4 text frames (synchsafe
sizes, all four text encodings, TXXX description/value pairs), FLAC
VORBIS_COMMENT blocks, and Ogg Vorbis/Opus comment headers — the Ogg
path does REAL packet reassembly across pages (lacing runs of 255 +
the continuation flag, RFC 3533 §5), test-pinned with a comment
packet that spans two pages.

:func:`media_tags` is the Spark surface: one narrow mapInPandas over
the blob column exploding every (container, tag, value) triple; dirty
payloads yield zero rows, never a batch failure. Orientation is the
one numeric Exif tag a pipeline must honor before any pixel work, so
it is extracted even when the string fields are absent.

Specs: Exif 2.3 / TIFF 6.0, id3v2.3.0 + id3v2.4.0-structure, FLAC
format (METADATA_BLOCK_VORBIS_COMMENT), Vorbis I §5 comment header,
RFC 7845 §5.2 (OpusTags). The reference repo has no media layer;
this is training-pipeline scope (SURVEY.md "beyond the reference").
"""
from __future__ import annotations

import struct

from pyspark.sql import DataFrame, functions as F, types as T

from sigraph_spark.operators.mediameta import _ogg_crc

__all__ = [
    "media_tags",
    "jpeg_exif",
    "id3_tags",
    "flac_tags",
    "ogg_tags",
    "png_text",
    "gif_comments",
    "encode_jpeg_with_exif",
    "encode_id3v2",
    "encode_flac_with_comments",
    "encode_ogg_with_comments",
    "encode_png_with_text",
    "encode_gif_with_comment",
]


# --- EXIF (JPEG APP1 -> embedded TIFF IFD) ----------------------------------

_EXIF_TAGS = {271: "make", 272: "model", 274: "orientation",
              306: "datetime"}


def _ifd_ascii(buf, e, base, count, vpos):
    """TIFF ASCII field: inline when count <= 4, else through an
    offset RELATIVE TO THE TIFF HEADER (the Exif quirk)."""
    if count <= 4:
        raw = buf[vpos : vpos + count]
    else:
        off = struct.unpack_from(e + "I", buf, vpos)[0]
        raw = buf[base + off : base + off + count]
    return raw.split(b"\x00")[0].decode("ascii", "replace")


def jpeg_exif(payload: bytes) -> dict:
    """Scan JPEG markers for the Exif APP1 segment and walk IFD0 for
    Make/Model/Orientation/DateTime. Raises ValueError when no Exif
    segment exists or the embedded TIFF is malformed."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    seg = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = payload[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker in (0xD8, 0xD9, 0xDA) or 0xD0 <= marker <= 0xD7:
            if marker in (0xD9, 0xDA):
                break
            pos += 2
            continue
        seg_len = struct.unpack_from(">H", payload, pos + 2)[0]
        if marker == 0xE1 and payload[pos + 4 : pos + 10] == b"Exif\x00\x00":
            seg = (pos + 10, pos + 2 + seg_len)
            break
        pos += 2 + seg_len
    if seg is None:
        raise ValueError("JPEG has no Exif APP1 segment")
    base, end = seg
    if payload[base : base + 4] == b"II*\x00":
        e = "<"
    elif payload[base : base + 4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("bad Exif TIFF header")
    ifd = base + struct.unpack_from(e + "I", payload, base + 4)[0]
    if ifd + 2 > end:
        raise ValueError("truncated Exif IFD")
    n = struct.unpack_from(e + "H", payload, ifd)[0]
    out: dict = {}
    for i in range(n):
        at = ifd + 2 + 12 * i
        if at + 12 > end:
            raise ValueError("truncated Exif entry")
        tag, etype = struct.unpack_from(e + "HH", payload, at)
        count = struct.unpack_from(e + "I", payload, at + 4)[0]
        name = _EXIF_TAGS.get(tag)
        if name is None:
            continue
        if etype == 2:  # ASCII
            out[name] = _ifd_ascii(payload, e, base, count, at + 8)
        elif etype == 3:  # SHORT
            out[name] = struct.unpack_from(e + "H", payload, at + 8)[0]
        elif etype == 4:  # LONG
            out[name] = struct.unpack_from(e + "I", payload, at + 8)[0]
    if not out:
        raise ValueError("Exif IFD carries none of the known tags")
    return out


# --- ID3v2 text frames -------------------------------------------------------

_ID3_ENCODINGS = {0: "latin-1", 1: "utf-16", 2: "utf-16-be", 3: "utf-8"}


def _synchsafe(raw: bytes) -> int:
    v = 0
    for b in raw:
        if b & 0x80:
            raise ValueError("bad synchsafe byte")
        v = (v << 7) | b
    return v


def id3_tags(payload: bytes) -> list:
    """ID3v2.3 / v2.4 text frames -> [(frame_id_or_TXXX_desc, text)].
    v2.4 frame sizes are synchsafe, v2.3 are plain big-endian — the
    version byte decides. Tag-level unsynchronisation (header flag
    0x80: 0xFF 0x00 -> 0xFF) is reversed and extended headers (flag
    0x40; v2.3 size excludes its own field, v2.4 synchsafe includes
    it) are skipped. Non-text frames are skipped; the walk stops at
    zero padding."""
    if payload[:3] != b"ID3" or len(payload) < 10:
        raise ValueError("no ID3v2 header")
    ver = payload[3]
    if ver not in (3, 4):
        raise ValueError(f"unsupported ID3v2.{ver}")
    flags = payload[5]
    size = _synchsafe(payload[6:10])
    body = payload[10 : 10 + size]
    if flags & 0x80:  # tag-level unsynchronisation
        body = body.replace(b"\xff\x00", b"\xff")
    if flags & 0x40:  # extended header
        if ver == 4:
            body = body[_synchsafe(body[0:4]) :]
        else:
            body = body[4 + struct.unpack_from(">I", body, 0)[0] :]
    payload = body
    end = len(body)
    pos = 0
    tags = []
    while pos + 10 <= end:
        fid = payload[pos : pos + 4]
        if fid == b"\x00\x00\x00\x00":
            break  # padding
        if ver == 4:
            fsize = _synchsafe(payload[pos + 4 : pos + 8])
        else:
            fsize = struct.unpack_from(">I", payload, pos + 4)[0]
        body = payload[pos + 10 : pos + 10 + fsize]
        pos += 10 + fsize
        if not fid.startswith(b"T") or len(body) < 2:
            continue
        enc = _ID3_ENCODINGS.get(body[0])
        if enc is None:
            raise ValueError("bad ID3 text encoding byte")
        text = body[1:].decode(enc, "replace").rstrip("\x00")
        key = fid.decode("ascii")
        if key == "TXXX":
            desc, _, val = text.partition("\x00")
            tags.append((f"TXXX:{desc}", val))
        else:
            tags.append((key, text))
    if not tags:
        raise ValueError("ID3v2 tag carries no text frames")
    return tags


# --- PNG text chunks + GIF comment extensions --------------------------------


def png_text(payload: bytes) -> list:
    """PNG textual chunks -> [(keyword, text)]: tEXt (latin-1),
    zTXt (deflate-compressed latin-1), iTXt (utf-8, optionally
    deflate-compressed, language/translated-keyword fields skipped)."""
    import zlib

    from sigraph_spark.operators.multimodal import _PNG_SIG, _png_chunks

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    out = []
    for ctype, data in _png_chunks(payload):
        if ctype == b"tEXt":
            key, _, val = data.partition(b"\x00")
            out.append((key.decode("latin-1"), val.decode("latin-1")))
        elif ctype == b"zTXt":
            key, _, rest = data.partition(b"\x00")
            if not rest or rest[0] != 0:
                raise ValueError("bad zTXt compression method")
            out.append((key.decode("latin-1"),
                        zlib.decompress(rest[1:]).decode("latin-1")))
        elif ctype == b"iTXt":
            key, _, rest = data.partition(b"\x00")
            if len(rest) < 2:
                raise ValueError("truncated iTXt")
            comp_flag, comp_method = rest[0], rest[1]
            rest = rest[2:]
            _lang, _, rest = rest.partition(b"\x00")
            _tkey, _, text = rest.partition(b"\x00")
            if comp_flag:
                if comp_method != 0:
                    raise ValueError("bad iTXt compression method")
                text = zlib.decompress(text)
            out.append((key.decode("latin-1"), text.decode("utf-8")))
    if not out:
        raise ValueError("PNG carries no text chunks")
    return out


def gif_comments(payload: bytes) -> list:
    """GIF comment extensions (label 0xFE) -> [('comment', text)];
    walks blocks the same way the dims sniffer does."""
    if payload[:6] not in (b"GIF87a", b"GIF89a") or len(payload) < 13:
        raise ValueError("not a GIF")
    flags = payload[10]
    pos = 13
    if flags & 0x80:
        pos += 3 * (2 << (flags & 0x07))
    out = []
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = payload[pos + 1]
            pos += 2
            parts = bytearray()
            while pos < len(payload) and payload[pos]:
                n = payload[pos]
                parts += payload[pos + 1 : pos + 1 + n]
                pos += 1 + n
            pos += 1
            if label == 0xFE:
                out.append(("comment", parts.decode("utf-8", "replace")))
            continue
        if b == 0x2C:  # image descriptor: dims sniffing's job, stop
            break
        raise ValueError("bad GIF block")
    if not out:
        raise ValueError("GIF carries no comment extensions")
    return out


# --- Vorbis-comment structure (FLAC blocks + Ogg headers) -------------------


def _vorbis_comments(buf: bytes, pos: int) -> list:
    """vendor_len/vendor + n x (len + 'KEY=value') — the shared
    structure of FLAC VORBIS_COMMENT, Vorbis comment headers, and
    OpusTags. Keys normalize to upper case (the spec makes them
    case-insensitive)."""
    vlen = struct.unpack_from("<I", buf, pos)[0]
    pos += 4 + vlen
    n = struct.unpack_from("<I", buf, pos)[0]
    pos += 4
    out = []
    for _ in range(n):
        clen = struct.unpack_from("<I", buf, pos)[0]
        pos += 4
        entry = buf[pos : pos + clen].decode("utf-8", "replace")
        pos += clen
        key, sep, val = entry.partition("=")
        if not sep:
            raise ValueError("vorbis comment without '='")
        out.append((key.upper(), val))
    return out


def flac_tags(payload: bytes) -> list:
    """Walk FLAC metadata blocks to VORBIS_COMMENT (type 4)."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    while pos + 4 <= len(payload):
        hdr = payload[pos]
        blen = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = pos + 4
        if body + blen > len(payload):
            raise ValueError("truncated FLAC block")
        if hdr & 0x7F == 4:
            return _vorbis_comments(payload, body)
        pos = body + blen
        if hdr & 0x80:
            break  # last metadata block
    raise ValueError("FLAC has no VORBIS_COMMENT block")


def _ogg_packets(payload: bytes, max_packets: int = 2) -> list:
    """Reassemble the first ``max_packets`` packets across pages per
    RFC 3533 §5: lacing 255 continues a packet within the page; the
    continuation flag (header_type & 1) continues it across pages."""
    packets: list = []
    cur = bytearray()
    open_packet = False
    pos = 0
    while pos + 27 <= len(payload) and len(packets) < max_packets:
        if payload[pos : pos + 4] != b"OggS" or payload[pos + 4] != 0:
            raise ValueError("bad Ogg page capture")
        htype = payload[pos + 5]
        nsegs = payload[pos + 26]
        lace = payload[pos + 27 : pos + 27 + nsegs]
        if len(lace) < nsegs:
            raise ValueError("truncated Ogg lacing")
        body = pos + 27 + nsegs
        if open_packet and not (htype & 0x01):
            raise ValueError("Ogg packet truncated at page boundary")
        if not open_packet and (htype & 0x01):
            raise ValueError("Ogg continuation without an open packet")
        at = body
        for lv in lace:
            cur += payload[at : at + lv]
            at += lv
            if lv < 255:
                packets.append(bytes(cur))
                cur = bytearray()
                open_packet = False
                if len(packets) >= max_packets:
                    break
            else:
                open_packet = True
        pos = body + sum(lace)
    if len(packets) < max_packets:
        raise ValueError("Ogg stream ended before the comment header")
    return packets


def ogg_tags(payload: bytes) -> list:
    """Vorbis comment header (packet 2, type 3) or OpusTags."""
    if payload[:4] != b"OggS":
        raise ValueError("not an Ogg stream")
    ident, comment = _ogg_packets(payload, 2)
    if ident[:7] == b"\x01vorbis":
        if comment[:7] != b"\x03vorbis":
            raise ValueError("Vorbis comment header missing")
        return _vorbis_comments(comment, 7)
    if ident[:8] == b"OpusHead":
        if comment[:8] != b"OpusTags":
            raise ValueError("OpusTags header missing")
        return _vorbis_comments(comment, 8)
    if ident[:5] == b"\x7fFLAC":
        # FLAC-to-Ogg mapping: the header packet after the first is a
        # native FLAC metadata block — VORBIS_COMMENT is type 4, body
        # starts after the 1-byte header + 3-byte big-endian length.
        if (comment[0] & 0x7F) != 4:
            raise ValueError("Ogg-FLAC VORBIS_COMMENT header missing")
        return _vorbis_comments(comment, 4)
    raise ValueError("unknown Ogg codec")


# --- Spark surface -----------------------------------------------------------

MEDIA_TAGS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("container", T.StringType()),
        T.StructField("tag", T.StringType()),
        T.StructField("value", T.StringType()),
    ]
)


def media_tags(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """binary payload -> exploded (container, tag, value) rows via
    mapInPandas; payloads without extractable tags contribute zero
    rows (crawl data is dirty by definition). The blob column is
    materialized only inside this stage."""
    import pandas as pd

    cols = media.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.col(payload_col).alias("payload"),
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if not payload:
                    continue
                b = bytes(payload)
                try:
                    if b[:2] == b"\xff\xd8":
                        for k, v in sorted(jpeg_exif(b).items()):
                            rows.append((mid, "exif", k, str(v)))
                    elif b[:3] == b"ID3":
                        for k, v in id3_tags(b):
                            rows.append((mid, "id3", k, v))
                    elif b[:4] == b"fLaC":
                        for k, v in flac_tags(b):
                            rows.append((mid, "flac", k, v))
                    elif b[:4] == b"OggS":
                        for k, v in ogg_tags(b):
                            rows.append((mid, "ogg", k, v))
                    elif b[:4] == b"\x89PNG":
                        for k, v in png_text(b):
                            rows.append((mid, "png", k, v))
                    elif b[:4] == b"GIF8":
                        for k, v in gif_comments(b):
                            rows.append((mid, "gif", k, v))
                except (ValueError, struct.error):
                    pass
            yield pd.DataFrame(
                rows, columns=["media_id", "container", "tag", "value"]
            )

    return cols.mapInPandas(run, MEDIA_TAGS_SCHEMA)


# --- deterministic builders (exist to test the walks) ------------------------


def encode_jpeg_with_exif(jpeg: bytes, fields: dict,
                          big_endian: bool = False) -> bytes:
    """Splice an Exif APP1 segment (IFD0 with the four supported
    tags) right after SOI of an existing JPEG."""
    e = ">" if big_endian else "<"
    entries = []
    extra = b""
    items = sorted(fields.items())
    n = len(items)
    data_off = 8 + 2 + 12 * n + 4  # header + count + entries + next-IFD

    tag_ids = {v: k for k, v in _EXIF_TAGS.items()}
    for name, val in items:
        tag = tag_ids[name]
        if name == "orientation":
            entries.append(
                struct.pack(e + "HHI", tag, 3, 1)
                + struct.pack(e + "H", int(val)) + b"\x00\x00"
            )
        else:
            raw = str(val).encode("ascii") + b"\x00"
            if len(raw) <= 4:
                entries.append(
                    struct.pack(e + "HHI", tag, 2, len(raw))
                    + raw.ljust(4, b"\x00")
                )
            else:
                entries.append(
                    struct.pack(e + "HHI", tag, 2, len(raw))
                    + struct.pack(e + "I", data_off + len(extra))
                )
                extra += raw
    magic = b"MM\x00*" if big_endian else b"II*\x00"
    tiff = magic + struct.pack(e + "I", 8)
    tiff += struct.pack(e + "H", n) + b"".join(entries)
    tiff += struct.pack(e + "I", 0) + extra
    body = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", 2 + len(body)) + body
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    return jpeg[:2] + app1 + jpeg[2:]


def encode_id3v2(tags: list, version: int = 4, encoding: int = 3,
                 unsync: bool = False, extended: bool = False) -> bytes:
    """ID3v2.{3,4} tag block (prepend to any mp3 body). ``tags`` is
    [(frame_id, text)]; TXXX entries pass 'TXXX:desc' as the id.
    ``unsync`` applies tag-level unsynchronisation (and sets flag
    0x80); ``extended`` prepends an extended header (flag 0x40)."""
    frames = b""
    for fid, text in tags:
        if fid.startswith("TXXX:"):
            body_text = fid[5:] + "\x00" + text
            fid = "TXXX"
        else:
            body_text = text
        codec = _ID3_ENCODINGS[encoding]
        body = bytes([encoding]) + body_text.encode(codec)
        if version == 4:
            raw = bytes((len(body) >> s) & 0x7F for s in (21, 14, 7, 0))
        else:
            raw = struct.pack(">I", len(body))
        frames += fid.encode("ascii") + raw + b"\x00\x00" + body
    if extended:
        if version == 4:
            frames = b"\x00\x00\x00\x06\x01\x00" + frames  # synchsafe 6
        else:
            frames = struct.pack(">I", 6) + bytes(6) + frames
    frames += bytes(16)  # a little padding
    flags = 0
    if unsync:
        frames = frames.replace(b"\xff", b"\xff\x00")
        flags |= 0x80
    if extended:
        flags |= 0x40
    ss = bytes((len(frames) >> s) & 0x7F for s in (21, 14, 7, 0))
    return b"ID3" + bytes([version, 0, flags]) + ss + frames


def _comment_block(vendor: str, comments: list) -> bytes:
    out = struct.pack("<I", len(vendor.encode())) + vendor.encode()
    out += struct.pack("<I", len(comments))
    for k, v in comments:
        entry = f"{k}={v}".encode("utf-8")
        out += struct.pack("<I", len(entry)) + entry
    return out


def encode_flac_with_comments(rate: int, channels: int, bits: int,
                              total_samples: int,
                              comments: list) -> bytes:
    """STREAMINFO (no longer last) + VORBIS_COMMENT (last)."""
    from sigraph_spark.operators.mediameta import encode_flac_skeleton

    skel = encode_flac_skeleton(rate, channels, bits, total_samples)
    body = _comment_block("sigraph-spark", comments)
    block = bytes([0x84]) + len(body).to_bytes(3, "big") + body
    return skel[:4] + bytes([skel[4] & 0x7F]) + skel[5:] + block


def encode_ogg_with_comments(codec: str, rate: int, channels: int,
                             total_samples: int, comments: list,
                             span_pages: bool = False) -> bytes:
    """Ogg stream whose second packet is a real comment header; with
    ``span_pages`` the comment packet is split across two pages via a
    255-lacing run + the continuation flag (exercising reassembly)."""
    from sigraph_spark.operators.mediameta import _ogg_page

    if codec == "vorbis":
        ident = b"\x01vorbis" + struct.pack("<I", 0)
        ident += bytes([channels]) + struct.pack("<I", rate)
        ident += struct.pack("<iii", 0, 0, 0) + bytes([0xB8, 0x01])
        comment = b"\x03vorbis" + _comment_block("sigraph-spark",
                                                 comments) + b"\x01"
        end_granule = total_samples
    elif codec == "opus":
        ident = b"OpusHead" + bytes([1, channels])
        ident += struct.pack("<H", 312)
        ident += struct.pack("<I", rate) + struct.pack("<h", 0) + b"\x00"
        comment = b"OpusTags" + _comment_block("sigraph-spark", comments)
        end_granule = total_samples + 312
    else:
        raise ValueError(codec)
    out = _ogg_page(0x7A11, 0, 0, ident, header_type=2)
    if span_pages:
        comment = comment + bytes(300 - len(comment) % 255)
        cut = 255 * (len(comment) // 255 // 2 + 1)
        head, tail = comment[:cut], comment[cut:]
        out += _ogg_page_partial(0x7A11, 1, head)
        out += _ogg_page(0x7A11, 2, 0, tail, header_type=1)
        out += _ogg_page(0x7A11, 3, end_granule, b"\x00" * 32,
                         header_type=4)
    else:
        out += _ogg_page(0x7A11, 1, 0, comment)
        out += _ogg_page(0x7A11, 2, end_granule, b"\x00" * 32,
                         header_type=4)
    return out


def _ogg_page_partial(serial: int, seq: int, head: bytes) -> bytes:
    """A page whose single packet does NOT terminate (every lacing
    value 255): the next page must carry the continuation flag."""
    if len(head) % 255:
        raise ValueError("partial page body must be a multiple of 255")
    lace = bytes([255] * (len(head) // 255))
    hdr = b"OggS" + bytes([0, 0])
    hdr += struct.pack("<q", -1)  # granule -1: no packet completes
    hdr += struct.pack("<II", serial, seq)
    hdr += b"\x00\x00\x00\x00" + bytes([len(lace)]) + lace
    page = bytearray(hdr + head)
    page[22:26] = struct.pack("<I", _ogg_crc(bytes(page)))
    return bytes(page)


def encode_png_with_text(png: bytes, items: list) -> bytes:
    """Splice textual chunks before IEND; ``items`` is
    [(keyword, text, kind)] with kind in {'text', 'ztxt', 'itxt',
    'itxt-z'}. Chunk CRCs are real (zlib.crc32 over type+data)."""
    import zlib

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    extra = b""
    for key, text, kind in items:
        k = key.encode("latin-1")
        if kind == "text":
            extra += chunk(b"tEXt", k + b"\x00" + text.encode("latin-1"))
        elif kind == "ztxt":
            extra += chunk(
                b"zTXt",
                k + b"\x00\x00" + zlib.compress(text.encode("latin-1")),
            )
        elif kind in ("itxt", "itxt-z"):
            comp = kind == "itxt-z"
            body = text.encode("utf-8")
            if comp:
                body = zlib.compress(body)
            extra += chunk(
                b"iTXt",
                k + b"\x00" + bytes([int(comp), 0])
                + b"en\x00\x00" + body,
            )
        else:
            raise ValueError(kind)
    at = png.rindex(b"IEND") - 4
    return png[:at] + extra + png[at:]


def encode_gif_with_comment(gif: bytes, text: str) -> bytes:
    """Splice a comment extension right after the header/color table
    (before the first image descriptor, where the tag walk looks)."""
    if gif[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    flags = gif[10]
    at = 13 + (3 * (2 << (flags & 0x07)) if flags & 0x80 else 0)
    data = text.encode("utf-8")
    ext = bytearray(b"\x21\xfe")
    for i in range(0, len(data), 255):
        part = data[i : i + 255]
        ext += bytes([len(part)]) + part
    ext += b"\x00"
    return gif[:at] + bytes(ext) + gif[at:]
