"""Header-walk media metadata — dimensions/format/depth WITHOUT
decoding, the scale-correct first pass over a 100 TB image/audio
corpus (you sniff every blob's header, then decode only the selected
subset; full decodes live in ``multimodal.py``/``jpeg.py``).

Image side (:func:`image_metadata`): JPEG (SOF marker walk — also
classifies progressive/arithmetic coding), PNG (IHDR), GIF (screen
descriptor + first image-descriptor interlace flag), BMP
(BITMAPINFOHEADER), and two formats with no decoder here but heavy
crawl presence: WebP (RIFF VP8 lossy frame tag / VP8L lossless
signature / VP8X extended canvas) and TIFF (both endiannesses, IFD
entry walk for ImageWidth/ImageLength/BitsPerSample/SamplesPerPixel).

Audio side: FLAC STREAMINFO (:func:`flac_metadata`) and Ogg
(:func:`ogg_metadata` — Vorbis and Opus id headers, duration from the
last page's granule position; Opus subtracts pre-skip per RFC 7845).
These two join the mp3/WAV walks in ``multimodal.audio_metadata``'s
parser chain. ``encode_*_skeleton`` builders exist to test the walks
(the same contract as ``encode_mp4``/``encode_mkv``); Ogg skeletons
carry REAL page CRCs (the Ogg CRC-32: poly 0x04C11DB7, unreflected,
zero init/xorout) so the builder output is structurally honest.

Specs: ITU T.81 B.2.2 (SOF), PNG (RFC 2083 IHDR), GIF89a spec, BMP
BITMAPINFOHEADER, WebP container + VP8 (RFC 6386 9.1) + VP8L bit
layout, TIFF 6.0 baseline, FLAC format (STREAMINFO), RFC 3533 (Ogg),
Vorbis I spec 4.2.2, RFC 7845 (Opus-in-Ogg). The reference repo has
no media layer; this is training-pipeline scope (SURVEY.md "beyond
the reference").

Scale notes: one narrow mapInPandas over the blob column; every
walk reads a bounded prefix except the Ogg duration scan (last-page
granule), which is linear in pages but touches no packet payloads.
"""
from __future__ import annotations

import struct

from pyspark.sql import DataFrame, functions as F, types as T

__all__ = [
    "image_metadata",
    "jpeg_dims",
    "png_dims",
    "gif_dims",
    "bmp_dims",
    "webp_dims",
    "tiff_dims",
    "avif_dims",
    "svg_dims",
    "ico_dims",
    "encode_avif_skeleton",
    "encode_ico_skeleton",
    "flac_metadata",
    "ogg_metadata",
    "encode_webp_skeleton",
    "encode_tiff_skeleton",
    "encode_flac_skeleton",
    "encode_ogg_skeleton",
]


# --- image header walks ----------------------------------------------------

_SOF_PROG = (0xC2, 0xC6, 0xCA, 0xCE)
_SOF_ARITH = (0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF)
_SOF_ALL = tuple(range(0xC0, 0xD0))
_NOT_SOF = (0xC4, 0xC8, 0xCC)  # DHT, JPG, DAC share the SOFn range


def jpeg_dims(payload: bytes) -> dict:
    """Marker walk to the first SOFn (T.81 B.2.2) — no entropy decode."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = payload[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker in (0xD8,) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker in (0xD9, 0xDA):
            break  # EOI / entropy data without a SOF first
        seg_len = struct.unpack_from(">H", payload, pos + 2)[0]
        if marker in _SOF_ALL and marker not in _NOT_SOF:
            seg = payload[pos + 4 : pos + 2 + seg_len]
            if len(seg) < 6:
                raise ValueError("truncated SOF")
            height, width = struct.unpack_from(">HH", seg, 1)
            fmt = "jpeg"
            if marker in _SOF_PROG:
                fmt += "-progressive"
            if marker in _SOF_ARITH:
                fmt += "-arith"
            return {
                "format": fmt, "width": width, "height": height,
                "bit_depth": seg[0], "channels": seg[5],
                "interlaced": marker in _SOF_PROG,
            }
        pos += 2 + seg_len
    raise ValueError("JPEG missing SOF")


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def png_dims(payload: bytes) -> dict:
    if payload[:8] != b"\x89PNG\r\n\x1a\n" or len(payload) < 33:
        raise ValueError("not a PNG")
    if payload[12:16] != b"IHDR":
        raise ValueError("PNG missing IHDR")
    width, height = struct.unpack_from(">II", payload, 16)
    depth, ctype, _comp, _filt, interlace = payload[24:29]
    if ctype not in _PNG_CHANNELS:
        raise ValueError("bad PNG color type")
    return {
        "format": "png", "width": width, "height": height,
        "bit_depth": depth, "channels": _PNG_CHANNELS[ctype],
        "interlaced": interlace == 1,
    }


def gif_dims(payload: bytes) -> dict:
    if payload[:6] not in (b"GIF87a", b"GIF89a") or len(payload) < 13:
        raise ValueError("not a GIF")
    width, height = struct.unpack_from("<HH", payload, 6)
    flags = payload[10]
    pos = 13
    if flags & 0x80:  # global color table
        pos += 3 * (2 << (flags & 0x07))
    interlaced = False
    while pos < len(payload):
        b = payload[pos]
        if b == 0x2C:  # image descriptor
            if pos + 10 > len(payload):
                raise ValueError("truncated GIF descriptor")
            interlaced = bool(payload[pos + 9] & 0x40)
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b == 0x3B:  # trailer
            break
        raise ValueError("bad GIF block")
    return {
        "format": "gif", "width": width, "height": height,
        "bit_depth": 8, "channels": 3, "interlaced": interlaced,
    }


def bmp_dims(payload: bytes) -> dict:
    if payload[:2] != b"BM" or len(payload) < 30:
        raise ValueError("not a BMP")
    hsize = struct.unpack_from("<I", payload, 14)[0]
    if hsize < 40:
        raise ValueError("unsupported BMP header")
    width, height = struct.unpack_from("<ii", payload, 18)
    bits = struct.unpack_from("<H", payload, 28)[0]
    return {
        "format": "bmp", "width": width, "height": abs(height),
        "bit_depth": min(bits, 8), "channels": max(1, bits // 8),
        "interlaced": False,
    }


def webp_dims(payload: bytes) -> dict:
    """WebP container: VP8 (lossy frame tag), VP8L (lossless 14-bit
    dims), or VP8X (extended, 24-bit canvas-minus-one)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP")
    if len(payload) < 30:
        raise ValueError("truncated WebP")
    fourcc = payload[12:16]
    body = payload[20:]
    if fourcc == b"VP8 ":
        # RFC 6386 9.1: 3-byte frame tag, start code 9D 01 2A, then
        # 14-bit width/height (low 14 of two LE u16s)
        if body[3:6] != b"\x9d\x01\x2a":
            raise ValueError("bad VP8 start code")
        w = struct.unpack_from("<H", body, 6)[0] & 0x3FFF
        h = struct.unpack_from("<H", body, 8)[0] & 0x3FFF
        return {"format": "webp", "width": w, "height": h,
                "bit_depth": 8, "channels": 3, "interlaced": False}
    if fourcc == b"VP8L":
        if body[0] != 0x2F:
            raise ValueError("bad VP8L signature")
        bits = struct.unpack_from("<I", body, 1)[0]
        w = (bits & 0x3FFF) + 1
        h = ((bits >> 14) & 0x3FFF) + 1
        alpha = (bits >> 28) & 1
        return {"format": "webp-lossless", "width": w, "height": h,
                "bit_depth": 8, "channels": 4 if alpha else 3,
                "interlaced": False}
    if fourcc == b"VP8X":
        flags = body[0]
        w = 1 + int.from_bytes(body[4:7], "little")
        h = 1 + int.from_bytes(body[7:10], "little")
        return {"format": "webp-extended", "width": w, "height": h,
                "bit_depth": 8,
                "channels": 4 if flags & 0x10 else 3,
                "interlaced": False}
    raise ValueError("unknown WebP variant")


def tiff_dims(payload: bytes) -> dict:
    """TIFF 6.0 baseline IFD walk, both endiannesses. BitsPerSample
    with count > 1 is read through its value offset (first sample)."""
    if payload[:4] == b"II*\x00":
        e = "<"
    elif payload[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF")
    ifd = struct.unpack_from(e + "I", payload, 4)[0]
    if ifd + 2 > len(payload):
        raise ValueError("truncated TIFF IFD")
    n = struct.unpack_from(e + "H", payload, ifd)[0]
    width = height = None
    bits = 8
    samples = 1

    def entry_value(etype, count, vpos):
        if etype == 3:  # SHORT
            if count == 1:
                return struct.unpack_from(e + "H", payload, vpos)[0]
            off = struct.unpack_from(e + "I", payload, vpos)[0]
            return struct.unpack_from(e + "H", payload, off)[0]
        if etype == 4:  # LONG
            return struct.unpack_from(e + "I", payload, vpos)[0]
        raise ValueError("unsupported TIFF field type")

    for i in range(n):
        at = ifd + 2 + 12 * i
        if at + 12 > len(payload):
            raise ValueError("truncated TIFF entry")
        tag, etype = struct.unpack_from(e + "HH", payload, at)
        count = struct.unpack_from(e + "I", payload, at + 4)[0]
        if tag == 256:
            width = entry_value(etype, count, at + 8)
        elif tag == 257:
            height = entry_value(etype, count, at + 8)
        elif tag == 258:
            bits = entry_value(etype, count, at + 8)
        elif tag == 277:
            samples = entry_value(etype, count, at + 8)
    if width is None or height is None:
        raise ValueError("TIFF missing dimensions")
    return {
        "format": "tiff", "width": width, "height": height,
        "bit_depth": bits, "channels": samples, "interlaced": False,
    }


import re as _re

_SVG_TAG = _re.compile(rb"<svg\b[^>]*>", _re.S)
_SVG_NUM = rb"""["']\s*([0-9]+(?:\.[0-9]+)?)\s*(?:px)?\s*["']"""
_SVG_W = _re.compile(rb"\bwidth\s*=\s*" + _SVG_NUM)
_SVG_H = _re.compile(rb"\bheight\s*=\s*" + _SVG_NUM)
_SVG_VB = _re.compile(
    rb"""\bviewBox\s*=\s*["']\s*[-0-9.]+[\s,]+[-0-9.]+[\s,]+"""
    rb"""([0-9.]+)[\s,]+([0-9.]+)\s*["']"""
)


def svg_dims(payload: bytes) -> dict:
    """SVG root-element scan (first 64 KB): numeric/px width+height
    attributes win; else the viewBox extent; percentage/em sizes give
    NULL dims (they are viewport-relative). Vector — bit depth and
    interlace are not meaningful (NULL/False)."""
    head = payload[:65536].lstrip(b"\xef\xbb\xbf \t\r\n")
    if not (head.startswith(b"<svg") or head.startswith(b"<?xml")
            or head.startswith(b"<!DOCTYPE svg")):
        raise ValueError("not an SVG")
    m = _SVG_TAG.search(head)
    if m is None:
        raise ValueError("no <svg> root element")
    tag = m.group(0)
    w = h = None
    mw, mh = _SVG_W.search(tag), _SVG_H.search(tag)
    if mw and mh:
        w, h = int(float(mw.group(1))), int(float(mh.group(1)))
    else:
        vb = _SVG_VB.search(tag)
        if vb:
            w, h = int(float(vb.group(1))), int(float(vb.group(2)))
    return {
        "format": "svg", "width": w, "height": h,
        "bit_depth": None, "channels": None, "interlaced": False,
    }


def ico_dims(payload: bytes) -> dict:
    """ICO directory walk: the LARGEST image entry wins (the favicon
    convention); a 0 width/height byte means 256."""
    if len(payload) < 22 or payload[:4] != b"\x00\x00\x01\x00":
        raise ValueError("not an ICO")
    n = struct.unpack_from("<H", payload, 4)[0]
    if n == 0 or 6 + 16 * n > len(payload):
        raise ValueError("bad ICO directory")
    best = (0, 0, 8)
    for i in range(n):
        at = 6 + 16 * i
        w = payload[at] or 256
        h = payload[at + 1] or 256
        bits = struct.unpack_from("<H", payload, at + 6)[0] or 8
        if w * h > best[0] * best[1]:
            best = (w, h, bits)
    w, h, bits = best
    return {
        "format": "ico", "width": w, "height": h,
        "bit_depth": min(bits, 32), "channels": 4 if bits == 32 else 3,
        "interlaced": False,
    }


_AVIF_BRANDS = {b"avif": "avif", b"avis": "avif", b"heic": "heic",
                b"heix": "heic", b"mif1": "heif"}


def avif_dims(payload: bytes) -> dict:
    """AVIF/HEIC dimensions via the ISO-BMFF image-item path:
    meta/iprp/ipco/ispe (first spatial-extents property wins — the
    primary item's, in every real encoder's layout) plus bit depth /
    channel count from the sibling pixi property when present. Reuses
    multimodal's box iterator (meta and its properties are FULL boxes:
    4 version/flags bytes before the payload)."""
    from sigraph_spark.operators.multimodal import _iter_boxes

    if len(payload) < 16 or payload[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF image")
    brand = _AVIF_BRANDS.get(payload[8:12])
    if brand is None:
        raise ValueError("not an AVIF/HEIC brand")
    buf = memoryview(payload)
    width = height = None
    bits = 8
    channels = 3
    for btype, s, e in _iter_boxes(buf, 0, len(payload)):
        if btype != b"meta":
            continue
        for b2, s2, e2 in _iter_boxes(buf, s + 4, e):  # meta is FULL
            if b2 != b"iprp":
                continue
            for b3, s3, e3 in _iter_boxes(buf, s2, e2):
                if b3 != b"ipco":
                    continue
                for b4, s4, e4 in _iter_boxes(buf, s3, e3):
                    if b4 == b"ispe" and width is None:
                        width, height = struct.unpack_from(
                            ">II", payload, s4 + 4
                        )
                    elif b4 == b"pixi":
                        n = payload[s4 + 4]
                        channels = n
                        if n:
                            bits = payload[s4 + 5]
    if width is None:
        raise ValueError("AVIF/HEIC missing ispe property")
    return {
        "format": brand, "width": width, "height": height,
        "bit_depth": bits, "channels": channels, "interlaced": False,
    }


_IMAGE_SNIFFERS = (
    (b"\xff\xd8", jpeg_dims),
    (b"\x89PNG", png_dims),
    (b"GIF8", gif_dims),
    (b"BM", bmp_dims),
    (b"RIFF", webp_dims),
    (b"II*\x00", tiff_dims),
    (b"MM\x00*", tiff_dims),
    (b"\x00\x00\x01\x00", ico_dims),
    (b"<svg", svg_dims),
    (b"<?xml", svg_dims),
    (b"<!DOCTYPE svg", svg_dims),
    (b"\xef\xbb\xbf<", svg_dims),
)

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("bit_depth", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("interlaced", T.BooleanType()),
    ]
)


def image_metadata(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """binary image payload -> header metadata via mapInPandas, no
    pixel decode; unparseable payloads yield format 'unknown' with
    NULL fields (crawl data is dirty by definition). Same scale shape
    as the container walks: the blob column is materialized only
    inside this stage."""
    import pandas as pd

    cols = media.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.col(payload_col).alias("payload"),
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                meta = None
                if payload:
                    b = bytes(payload)
                    sniff = None
                    for magic, fn in _IMAGE_SNIFFERS:
                        if b[: len(magic)] == magic:
                            sniff = fn
                            break
                    if sniff is None and b[4:8] == b"ftyp":
                        sniff = avif_dims
                    if sniff is not None:
                        try:
                            meta = sniff(b)
                        except (ValueError, struct.error):
                            meta = None
                if meta is None:
                    meta = {
                        "format": "unknown", "width": None,
                        "height": None, "bit_depth": None,
                        "channels": None, "interlaced": None,
                    }
                rows.append({"media_id": mid, **meta})
            yield pd.DataFrame(rows)

    return cols.mapInPandas(run, IMAGE_META_SCHEMA)


# --- audio container walks: FLAC + Ogg --------------------------------------


def flac_metadata(payload: bytes) -> dict:
    """FLAC STREAMINFO: sample rate (20 bits), channels-1 (3),
    bits-per-sample-1 (5), total samples (36) from the packed 8-byte
    window after the block sizes/frame sizes."""
    if payload[:4] != b"fLaC" or len(payload) < 4 + 4 + 34:
        raise ValueError("not a FLAC stream")
    btype = payload[4] & 0x7F
    blen = int.from_bytes(payload[5:8], "big")
    if btype != 0 or blen != 34:
        raise ValueError("FLAC missing leading STREAMINFO")
    info = payload[8 : 8 + 34]
    packed = int.from_bytes(info[10:18], "big")
    rate = packed >> 44
    channels = ((packed >> 41) & 0x7) + 1
    total = packed & ((1 << 36) - 1)
    if rate == 0:
        raise ValueError("FLAC zero sample rate")
    duration_ms = total * 1000 // rate if total else None
    return {
        "format": "flac", "sample_rate": rate, "channels": channels,
        "bitrate_kbps": None, "n_frames": None,
        "duration_ms": duration_ms,
    }


def _ogg_pages(payload: bytes):
    """Yield (granulepos, body_start, body_end) per Ogg page (RFC
    3533); stops at the first structural break."""
    pos = 0
    while pos + 27 <= len(payload):
        if payload[pos : pos + 4] != b"OggS" or payload[pos + 4] != 0:
            raise ValueError("bad Ogg page capture")
        granule = struct.unpack_from("<q", payload, pos + 6)[0]
        nsegs = payload[pos + 26]
        lace = payload[pos + 27 : pos + 27 + nsegs]
        if len(lace) < nsegs:
            raise ValueError("truncated Ogg lacing")
        body = pos + 27 + nsegs
        size = sum(lace)
        if body + size > len(payload):
            raise ValueError("truncated Ogg page body")
        yield granule, body, body + size
        pos = body + size


def ogg_metadata(payload: bytes) -> dict:
    """Ogg container walk: the first page's packet identifies the
    codec (Vorbis id header or OpusHead); the LAST page's granule
    position gives the PCM length (Opus granules run at 48 kHz and
    subtract pre-skip, RFC 7845 §4)."""
    if payload[:4] != b"OggS":
        raise ValueError("not an Ogg stream")
    pages = list(_ogg_pages(payload))
    if not pages:
        raise ValueError("no Ogg pages")
    _, s, e = pages[0]
    first = payload[s:e]
    last_granule = max((g for g, _, _ in pages if g >= 0), default=0)
    if first[:7] == b"\x01vorbis":
        channels = first[11]
        rate = struct.unpack_from("<I", first, 12)[0]
        nominal = struct.unpack_from("<i", first, 20)[0]
        if rate == 0:
            raise ValueError("Vorbis zero sample rate")
        return {
            "format": "ogg-vorbis", "sample_rate": rate,
            "channels": channels,
            "bitrate_kbps": nominal // 1000 if nominal > 0 else None,
            "n_frames": None,
            "duration_ms": last_granule * 1000 // rate,
        }
    if first[:8] == b"OpusHead":
        channels = first[9]
        pre_skip = struct.unpack_from("<H", first, 10)[0]
        in_rate = struct.unpack_from("<I", first, 12)[0]
        pcm = max(0, last_granule - pre_skip)
        return {
            "format": "ogg-opus",
            "sample_rate": in_rate or 48000,  # informational input rate
            "channels": channels, "bitrate_kbps": None,
            "n_frames": None,
            "duration_ms": pcm * 1000 // 48000,
        }
    if first[:5] == b"\x7fFLAC" and first[9:13] == b"fLaC":
        # FLAC-to-Ogg mapping v1.0 (round 5): STREAMINFO rides inside
        # the first packet after magic+version+header-count+signature.
        if len(first) < 17 + 34 or (first[13] & 0x7F) != 0:
            raise ValueError("Ogg-FLAC first block is not STREAMINFO")
        info = first[17:17 + 34]
        packed = int.from_bytes(info[10:18], "big")
        rate = packed >> 44
        channels = ((packed >> 41) & 0x7) + 1
        total = packed & ((1 << 36) - 1)
        if rate == 0:
            raise ValueError("Ogg-FLAC zero sample rate")
        total = total or last_granule
        return {
            "format": "ogg-flac", "sample_rate": rate,
            "channels": channels, "bitrate_kbps": None,
            "n_frames": None,
            "duration_ms": total * 1000 // rate if total else None,
        }
    raise ValueError("unknown Ogg codec")


# --- deterministic skeleton builders (exist to test the walks) -------------


def encode_webp_skeleton(width: int, height: int, kind: str = "vp8",
                         alpha: bool = False) -> bytes:
    if kind == "vp8":
        tag = b"\x00\x00\x00" + b"\x9d\x01\x2a"
        tag += struct.pack("<HH", width & 0x3FFF, height & 0x3FFF)
        body = tag + bytes(8)
        chunk = b"VP8 " + struct.pack("<I", len(body)) + body
    elif kind == "vp8l":
        bits = (width - 1) | ((height - 1) << 14) | (int(alpha) << 28)
        body = b"\x2f" + struct.pack("<I", bits) + bytes(6)
        chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    elif kind == "vp8x":
        body = bytes([0x10 if alpha else 0x00]) + bytes(3)
        body += (width - 1).to_bytes(3, "little")
        body += (height - 1).to_bytes(3, "little")
        chunk = b"VP8X" + struct.pack("<I", len(body)) + body
    else:
        raise ValueError(kind)
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def encode_tiff_skeleton(width: int, height: int, bits: int = 8,
                         samples: int = 3,
                         big_endian: bool = False) -> bytes:
    """Minimal single-IFD TIFF; BitsPerSample uses count=samples with
    an out-of-line value array when samples > 1 (exercising the
    offset-indirection path)."""
    e = ">" if big_endian else "<"
    entries = []
    extra = b""
    hdr_len = 8
    n_entries = 4
    ifd_size = 2 + 12 * n_entries + 4
    extra_off = hdr_len + ifd_size

    def ent(tag, etype, count, value_bytes):
        return struct.pack(e + "HHI", tag, etype, count) + value_bytes

    def short_val(v):
        return struct.pack(e + "H", v) + b"\x00\x00"

    entries.append(ent(256, 4, 1, struct.pack(e + "I", width)))
    entries.append(ent(257, 3, 1, short_val(height)))
    if samples > 1:
        arr = b"".join(struct.pack(e + "H", bits) for _ in range(samples))
        entries.append(
            ent(258, 3, samples, struct.pack(e + "I", extra_off))
        )
        extra = arr
    else:
        entries.append(ent(258, 3, 1, short_val(bits)))
    entries.append(ent(277, 3, 1, short_val(samples)))
    magic = b"MM\x00*" if big_endian else b"II*\x00"
    out = magic + struct.pack(e + "I", hdr_len)
    out += struct.pack(e + "H", n_entries) + b"".join(entries)
    out += struct.pack(e + "I", 0)  # next-IFD terminator
    return out + extra


def encode_ico_skeleton(entries: list) -> bytes:
    """ICO directory + dummy image data; ``entries`` is a list of
    (width, height, bits) with 256 encoded as the 0 byte."""
    n = len(entries)
    out = bytearray(b"\x00\x00\x01\x00" + struct.pack("<H", n))
    data_off = 6 + 16 * n
    for w, h, bits in entries:
        out += bytes([w % 256, h % 256, 0, 0])
        out += struct.pack("<HH", 1, bits)
        out += struct.pack("<II", 8, data_off)
        data_off += 8
    out += bytes(8 * n)
    return bytes(out)


def encode_avif_skeleton(width: int, height: int, brand: str = "avif",
                         bits: int = 8, channels: int = 3) -> bytes:
    """ftyp + meta{iprp{ipco{ispe, pixi}}} skeleton (no coded image
    item — exists to test the property walk)."""
    def box(fourcc: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + fourcc + body

    ispe = box(b"ispe", bytes(4) + struct.pack(">II", width, height))
    pixi = box(b"pixi", bytes(4) + bytes([channels])
               + bytes([bits]) * channels)
    ipco = box(b"ipco", ispe + pixi)
    iprp = box(b"iprp", ipco)
    meta = box(b"meta", bytes(4) + iprp)
    ftyp = box(b"ftyp", brand.encode("ascii") + struct.pack(">I", 0)
               + b"mif1")
    return ftyp + meta


def encode_flac_skeleton(rate: int, channels: int, bits: int,
                         total_samples: int) -> bytes:
    packed = (rate << 44) | ((channels - 1) << 41) | ((bits - 1) << 36)
    packed |= total_samples & ((1 << 36) - 1)
    info = struct.pack(">HH", 4096, 4096)  # min/max block size
    info += bytes(6)  # min/max frame size (24-bit each, unknown)
    info += packed.to_bytes(8, "big")
    info += bytes(16)  # md5 (unset)
    return b"fLaC" + bytes([0x80]) + len(info).to_bytes(3, "big") + info


def _ogg_crc(data: bytes) -> int:
    """Ogg CRC-32: poly 0x04C11DB7, no reflection, zero init/xorout."""
    crc = 0
    for b in data:
        crc ^= b << 24
        for _ in range(8):
            crc = ((crc << 1) ^ 0x04C11DB7) if crc & 0x80000000 else crc << 1
            crc &= 0xFFFFFFFF
    return crc


def _ogg_page(serial: int, seq: int, granule: int, packet: bytes,
              header_type: int = 0) -> bytes:
    lace = []
    n = len(packet)
    while n >= 255:
        lace.append(255)
        n -= 255
    lace.append(n)
    hdr = b"OggS" + bytes([0, header_type])
    hdr += struct.pack("<q", granule)
    hdr += struct.pack("<II", serial, seq)
    hdr += b"\x00\x00\x00\x00"  # crc placeholder
    hdr += bytes([len(lace)]) + bytes(lace)
    page = bytearray(hdr + packet)
    crc = _ogg_crc(bytes(page))
    page[22:26] = struct.pack("<I", crc)
    return bytes(page)


def encode_ogg_skeleton(codec: str, rate: int, channels: int,
                        total_samples: int,
                        nominal_bitrate: int = 0,
                        pre_skip: int = 312) -> bytes:
    """Structurally-valid Ogg stream (real page CRCs): id-header page,
    one data page at half the granule count, and a final page carrying
    the end granule. ``total_samples`` is PCM samples at the codec
    clock (Vorbis: sample rate; Opus: 48 kHz, pre-skip added on top
    so the decoded length round-trips)."""
    if codec == "vorbis":
        ident = b"\x01vorbis" + struct.pack("<I", 0)
        ident += bytes([channels]) + struct.pack("<I", rate)
        ident += struct.pack("<iii", 0, nominal_bitrate, 0)
        ident += bytes([0xB8, 0x01])
        end_granule = total_samples
    elif codec == "opus":
        ident = b"OpusHead" + bytes([1, channels])
        ident += struct.pack("<H", pre_skip)
        ident += struct.pack("<I", rate) + struct.pack("<h", 0) + b"\x00"
        end_granule = total_samples + pre_skip
    else:
        raise ValueError(codec)
    out = _ogg_page(0x5173, 0, 0, ident, header_type=2)
    out += _ogg_page(0x5173, 1, end_granule // 2, b"\x00" * 64)
    out += _ogg_page(0x5173, 2, end_granule, b"\x00" * 32, header_type=4)
    return out
