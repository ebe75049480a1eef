"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with a
typed metadata struct; the expensive decode/feature steps run as
Arrow-batched functions over ``mapInPandas`` so one task processes a whole
record batch without per-row Python overhead.

Six formats decode for REAL (pure Python + stdlib + numpy):
uncompressed BMP (``decode_bmp``/``encode_bmp``), PNG
(``decode_png``/``encode_png``: zlib-inflated IDAT, all five scanline
filters incl. Paeth, gray/RGB/RGBA at bit depth 8), GIF
(``decode_gif``/``encode_gif``: full LZW state machine with variable
code width, clear/end codes and table-full handling; global/local color
tables; interlace), JPEG (``operators/jpeg.py`` + ``jpeg_arith.py`` +
``jpeg_prog_arith.py``: real ITU T.81 Huffman baseline,
progressive/SOF2, arithmetic/SOF9 AND progressive-arithmetic/SOF10
QM-coder decoders with restart markers and chroma subsampling),
RIFF/WAVE PCM audio (``decode_wav``/``encode_wav``: 8/16/32-bit, any
channel count, stdlib ``wave``) and IMA ADPCM WAVE (4-bit predictor
per the IMA rev 3.00 tables). mp3 gets a real FRAME METADATA walk
(bitrate/samplerate/duration from frame headers) but no SAMPLE decode
— mp3/ogg audio features fall back to a clearly-declared
byte-statistics stub (``_audio_feature_kernel`` docstring); 12-bit
and lossless/hierarchical JPEG raise loud ``ValueError``s inside the
codec.
Every seam is clearly marked, swappable, and unit-tested for the
Spark-side contract that IS always real: schema, batch shape,
partitioning, and null/size handling.

Scale notes:
* binary payloads are only materialized inside the mapInPandas stage; all
  other stages select metadata columns so parquet scans prune the blob;
* ``repartition`` before decode sizes tasks by bytes, not rows — a few
  huge videos must not land in one task (``rebalance_by_bytes``);
* outputs are fixed-size feature vectors -> normal columnar processing
  downstream (dedup/similarity operators apply unchanged).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image|audio|video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

_FEATURE_DIM = 16


# ---------------------------------------------------------------------------
# REAL codec: uncompressed BMP (pure Python + numpy, zero dependencies)
# ---------------------------------------------------------------------------
# BI_RGB 24/32-bit BMPs decode to actual pixels, so image_features /
# resize_images exercise a genuine bytes -> pixels -> features path for at
# least one real format. Compressed formats (JPEG/PNG/...) still hit the
# declared stub fallback below (no codecs in this container).

def decode_bmp(payload: bytes) -> tuple[int, int, bytes]:
    """Decode an uncompressed (BI_RGB) 24- or 32-bit BMP.

    Returns ``(width, height, rgb)`` with ``rgb`` a row-major TOP-DOWN
    bytes buffer of RGB triples (BMP stores BGR bottom-up with 4-byte row
    padding unless height is negative). Raises ValueError for anything
    that is not a supported BMP."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError("unsupported DIB header")
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32) or width <= 0 or height == 0:
        raise ValueError("unsupported BMP variant")
    top_down = height < 0
    h = abs(height)
    nch = bpp // 8
    row_bytes = ((width * nch + 3) // 4) * 4
    if data_offset + row_bytes * h > len(payload):
        raise ValueError("truncated BMP")

    import numpy as np

    raw = np.frombuffer(
        payload, dtype=np.uint8, count=row_bytes * h, offset=data_offset
    ).reshape(h, row_bytes)
    px = raw[:, : width * nch].reshape(h, width, nch)
    if not top_down:
        px = px[::-1]
    rgb = px[:, :, [2, 1, 0]]  # BGR(A) -> RGB, alpha dropped
    return width, h, rgb.tobytes()


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Encode row-major top-down RGB triples as a 24-bit BI_RGB BMP
    (bottom-up, 4-byte row padding) — the round-trip twin of
    :func:`decode_bmp`, also used to synthesize test fixtures."""
    import struct

    import numpy as np

    px = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    bgr = px[::-1, :, [2, 1, 0]]  # top-down RGB -> bottom-up BGR
    row_bytes = ((width * 3 + 3) // 4) * 4
    rows = np.zeros((height, row_bytes), dtype=np.uint8)
    rows[:, : width * 3] = bgr.reshape(height, width * 3)
    body = rows.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(body), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + body


# ---------------------------------------------------------------------------
# REAL codec #2: PNG (pure Python: stdlib zlib inflate + numpy unfiltering)
# ---------------------------------------------------------------------------
# The genuinely-compressed format path: IDAT chunks are zlib streams of
# filtered scanlines. Supported: bit depth 8, color types 0 (gray),
# 2 (RGB), 6 (RGBA), interlace 0 — the overwhelmingly common web shapes.
# All five scanline filters (None/Sub/Up/Average/Paeth) decode; Sub and Up
# are vectorized with numpy, Average/Paeth fall back to the per-byte
# recurrence the spec defines (they are sequential by construction).

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunks(payload: bytes):
    """Yield (chunk_type, data) pairs; raises ValueError on truncation."""
    import struct

    pos = 8
    while pos + 8 <= len(payload):
        length, ctype = struct.unpack_from(">I4s", payload, pos)
        data_start = pos + 8
        if data_start + length + 4 > len(payload):
            raise ValueError("truncated PNG chunk")
        yield ctype, payload[data_start : data_start + length]
        pos = data_start + length + 4  # skip CRC
        if ctype == b"IEND":
            return
    raise ValueError("missing IEND")


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §6.6): nearest of left/up/up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter_scanlines(raw: bytes, width: int, height: int, nch: int):
    """Reverse the per-row PNG filters -> (height, width*nch) uint8."""
    import numpy as np

    stride = width * nch
    if len(raw) < height * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    rows = np.frombuffer(raw, dtype=np.uint8, count=height * (stride + 1))
    rows = rows.reshape(height, stride + 1)
    filters = rows[:, 0]
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(height):
        ft = int(filters[y])
        cur = rows[y, 1:].astype(np.int64)
        if ft == 0:  # None
            rec = cur
        elif ft == 1:  # Sub: x += left(x) -> per-channel-offset cumsum
            rec = cur.copy()
            for ch in range(nch):
                rec[ch::nch] = np.cumsum(cur[ch::nch])
        elif ft == 2:  # Up
            rec = cur + prev
        elif ft == 3:  # Average: sequential on left
            rec = cur.copy()
            for i in range(stride):
                left = rec[i - nch] & 0xFF if i >= nch else 0
                rec[i] = cur[i] + ((left + int(prev[i] & 0xFF)) >> 1)
        elif ft == 4:  # Paeth: sequential on left/up-left
            rec = cur.copy()
            for i in range(stride):
                a = rec[i - nch] & 0xFF if i >= nch else 0
                b = int(prev[i] & 0xFF)
                c = int(prev[i - nch] & 0xFF) if i >= nch else 0
                rec[i] = cur[i] + _paeth(a, b, c)
        else:
            raise ValueError(f"unknown PNG filter {ft}")
        rec &= 0xFF
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out


def decode_png(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a PNG (bit depth 8; gray/RGB/RGBA; no interlace).

    Returns ``(width, height, rgb)`` with ``rgb`` row-major top-down RGB
    triples (gray replicated to 3 channels, alpha dropped). Raises
    ValueError for unsupported or malformed input."""
    import struct
    import zlib

    import numpy as np

    if len(payload) < 8 or payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    width = height = nch = -1
    idat = bytearray()
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
                raise ValueError("unsupported PNG variant")
            nch = {0: 1, 2: 3, 6: 4}.get(color, -1)
            if nch < 0 or width <= 0 or height <= 0:
                raise ValueError("unsupported PNG color type")
        elif ctype == b"IDAT":
            idat += data
    if width < 0 or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:  # corrupt deflate stream -> uniform error type
        raise ValueError(f"bad PNG IDAT stream: {exc}") from exc
    px = _unfilter_scanlines(raw, width, height, nch).reshape(height, width, nch)
    if nch == 1:
        px = np.repeat(px, 3, axis=2)
    elif nch == 4:
        px = px[:, :, :3]
    return width, height, px.tobytes()


def encode_png(width: int, height: int, rgb: bytes, filter_type: int = 0) -> bytes:
    """Encode top-down RGB triples as an 8-bit RGB PNG. ``filter_type``
    selects the per-row filter (0-4) so tests can exercise every decode
    branch; the filtered bytes are derived by inverting the same spec
    recurrences :func:`decode_png` reverses."""
    import struct
    import zlib

    import numpy as np

    px = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    stride = width * 3
    nch = 3
    lines = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(height):
        rec = px[y].reshape(stride).astype(np.int64)
        if filter_type == 0:
            filt = rec
        elif filter_type == 1:
            left = np.concatenate([np.zeros(nch, dtype=np.int64), rec[:-nch]])
            filt = rec - left
        elif filter_type == 2:
            filt = rec - prev
        elif filter_type == 3:
            left = np.concatenate([np.zeros(nch, dtype=np.int64), rec[:-nch]])
            filt = rec - ((left + prev) >> 1)
        elif filter_type == 4:
            filt = rec.copy()
            for i in range(stride):
                a = int(rec[i - nch]) if i >= nch else 0
                b = int(prev[i])
                c = int(prev[i - nch]) if i >= nch else 0
                filt[i] = rec[i] - _paeth(a, b, c)
        else:
            raise ValueError("filter_type must be 0-4")
        lines.append(filter_type)
        lines += (filt & 0xFF).astype(np.uint8).tobytes()
        prev = rec

    def chunk(ctype: bytes, data: bytes) -> bytes:
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# REAL codec: GIF (LZW-compressed, palette-indexed) — pure Python
# ---------------------------------------------------------------------------
# Decodes the FIRST image frame of a GIF87a/GIF89a: global or local color
# table, interlaced or sequential, full LZW state machine (variable code
# width 3..12 bits, clear/end codes, deferred-clear handling when the
# table fills). The encoder emits a real LZW stream (deterministic
# lexicographic palette), so round-trips exercise both directions; decode
# correctness is additionally pinned against a hand-packed code stream
# built independently of the encoder (tests/test_multimodal_gif.py).

_GIF_SIGS = (b"GIF87a", b"GIF89a")
_GIF_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # interlace (start, step)


def _gif_subblocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate GIF data sub-blocks starting at ``pos``; returns
    (data, position after the block terminator)."""
    out = bytearray()
    while True:
        if pos >= len(payload):
            raise ValueError("truncated GIF sub-blocks")
        n = payload[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(payload):
            raise ValueError("truncated GIF sub-block")
        out += payload[pos : pos + n]
        pos += n


def _lzw_decode(min_code_size: int, data: bytes, npix: int) -> bytes:
    """GIF-flavor LZW: LSB-first variable-width codes, clear/end codes,
    code width grows when the table reaches 2^width (cap 12); table adds
    stop at 4096 until a clear arrives."""
    if not 2 <= min_code_size <= 11:
        raise ValueError("bad LZW min code size")
    clear = 1 << min_code_size
    end = clear + 1
    literals = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(literals)
    code_size = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                table = list(literals)
                code_size = min_code_size + 1
                prev = None
                continue
            if code == end:
                if len(out) < npix:
                    raise ValueError("LZW ended short of pixel count")
                return bytes(out[:npix])
            if code < len(table):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]
            else:
                raise ValueError("bad LZW code")
            out += entry
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
                if len(table) == (1 << code_size) and code_size < 12:
                    code_size += 1
            prev = entry
            if len(out) >= npix:
                return bytes(out[:npix])  # tolerate missing end code
    raise ValueError("truncated LZW stream")


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """Inverse of :func:`_lzw_decode` (same width-growth schedule: bump
    after the add that makes next_code == 2^width + 1; clear+reset when
    the table fills)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = nbits = 0
    code_size = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh() -> dict[bytes, int]:
        return {bytes([i]): i for i in range(clear)}

    emit(clear)
    table = fresh()
    next_code = end + 1
    w = b""
    for px in indices:
        if px >= clear:
            raise ValueError("pixel index outside palette")
        wc = w + bytes([px])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        if next_code < 4096:
            table[wc] = next_code
            next_code += 1
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        else:
            emit(clear)
            table = fresh()
            next_code = end + 1
            code_size = min_code_size + 1
        w = bytes([px])
    if w:
        emit(table[w])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def decode_gif(payload: bytes) -> tuple[int, int, bytes]:
    """Decode the first frame of a GIF87a/GIF89a.

    Returns ``(width, height, rgb)`` — the FRAME's dimensions, row-major
    top-down RGB triples through the active (local-over-global) color
    table; interlaced frames are deinterlaced. Extensions are skipped.
    Raises ValueError for malformed/unsupported input (the decode seams
    fall back to the stub histogram)."""
    import struct

    import numpy as np

    if len(payload) < 13 or payload[:6] not in _GIF_SIGS:
        raise ValueError("not a GIF")
    packed = payload[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(payload):
            raise ValueError("truncated GIF global color table")
        gct = payload[pos : pos + 3 * n]
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label byte + sub-blocks
            _, pos = _gif_subblocks(payload, pos + 2)
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        if pos + 10 > len(payload):
            raise ValueError("truncated GIF image descriptor")
        _, _, iw, ih = struct.unpack_from("<HHHH", payload, pos + 1)
        ipacked = payload[pos + 9]
        pos += 10
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            if pos + 3 * n > len(payload):
                raise ValueError("truncated GIF local color table")
            pal = payload[pos : pos + 3 * n]
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF frame has no color table")
        if iw <= 0 or ih <= 0:
            raise ValueError("empty GIF frame")
        min_code = payload[pos]
        data, pos = _gif_subblocks(payload, pos + 1)
        idx = np.frombuffer(_lzw_decode(min_code, data, iw * ih), dtype=np.uint8)
        rows = idx.reshape(ih, iw)
        if ipacked & 0x40:  # interlaced: rows arrive in pass order
            order = [y for start, step in _GIF_PASSES for y in range(start, ih, step)]
            deinter = np.empty_like(rows)
            deinter[order] = rows
            rows = deinter
        colors = np.frombuffer(pal, dtype=np.uint8).reshape(-1, 3)
        if int(rows.max(initial=0)) >= len(colors):
            raise ValueError("GIF pixel index outside color table")
        return iw, ih, colors[rows.reshape(-1)].tobytes()
    raise ValueError("GIF has no image data")


def encode_gif(
    width: int, height: int, rgb: bytes, interlace: bool = False
) -> bytes:
    """Encode top-down RGB triples as a single-frame GIF89a with a real
    LZW stream. The palette is the image's distinct colors in
    lexicographic order (deterministic); requires ≤256 distinct colors
    (quantization is out of scope — callers resample, never invent
    colors)."""
    import struct

    import numpy as np

    if len(rgb) != width * height * 3:
        raise ValueError("rgb length != width*height*3")
    px = np.frombuffer(rgb, dtype=np.uint8).reshape(-1, 3)
    colors, inverse = np.unique(px, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("more than 256 distinct colors")
    k = max(1, int(len(colors) - 1).bit_length())  # GCT size = 2^k entries
    min_code = max(2, k)
    pal = colors.tobytes() + b"\x00" * (3 * ((1 << k) - len(colors)))
    idx = inverse.astype(np.uint8).reshape(height, width)
    if interlace:
        order = [y for start, step in _GIF_PASSES for y in range(start, height, step)]
        idx = idx[order]
    stream = _lzw_encode(min_code, idx.reshape(-1).tobytes())
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HH", width, height)
    out.append(0x80 | 0x70 | (k - 1))  # GCT present, max color resolution
    out += b"\x00\x00"  # background index, aspect ratio
    out += pal
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height)
    out.append(0x40 if interlace else 0x00)
    out.append(min_code)
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def _pixel_features(width: int, height: int, rgb: bytes) -> list[float]:
    """Real pixel features for decoded images (BMP/PNG): [mean R, mean G,
    mean B, mean luma] + a 12-bin luma histogram, all normalized to [0, 1]."""
    import numpy as np

    px = np.frombuffer(rgb, dtype=np.uint8).reshape(-1, 3).astype(np.float64)
    means = px.mean(axis=0) / 255.0
    luma = px @ np.array([0.299, 0.587, 0.114])
    hist, _ = np.histogram(luma, bins=_FEATURE_DIM - 4, range=(0.0, 256.0))
    return [
        float(means[0]), float(means[1]), float(means[2]),
        float(luma.mean() / 255.0),
        *(hist / max(len(luma), 1)).astype(float).tolist(),
    ]


def _decode_image_features(payload: bytes | None) -> list[float]:
    """Image feature kernel. BMP and PNG payloads take the REAL decode
    paths (``decode_bmp``/``decode_png`` -> pixel statistics). Everything
    else is the declared STUB fallback (no PIL/ffmpeg in this container):
    a deterministic 16-bin byte histogram. Raises nothing; null/empty ->
    zeros."""
    if not payload:
        return [0.0] * _FEATURE_DIM
    if payload[:2] == b"BM":
        try:
            return _pixel_features(*decode_bmp(payload))
        except ValueError:
            pass  # malformed/unsupported BMP -> stub fallback
    elif payload[:8] == _PNG_SIG:
        try:
            return _pixel_features(*decode_png(payload))
        except ValueError:
            pass  # malformed/unsupported PNG -> stub fallback
    elif payload[:6] in _GIF_SIGS:
        try:
            return _pixel_features(*decode_gif(payload))
        except ValueError:
            pass  # malformed GIF -> stub fallback
    elif payload[:2] == b"\xff\xd8":
        try:
            from sigraph_spark.operators.jpeg import decode_jpeg

            return _pixel_features(*decode_jpeg(payload))
        except ValueError:
            pass  # malformed/lossless-mode JPEG -> stub fallback
    hist = [0] * _FEATURE_DIM
    for byte in payload:
        hist[byte % _FEATURE_DIM] += 1
    total = float(len(payload))
    return [h / total for h in hist]


def _decode_frame_count(payload: bytes | None, duration_ms: int | None) -> int:
    """STUB: pretend 1 frame per second of duration, min 1."""
    if not payload:
        return 0
    return max(1, int((duration_ms or 1000) // 1000))


def image_features(media: DataFrame, id_col: str = "media_id", payload_col: str = "payload") -> DataFrame:
    """binary payload -> fixed-dim feature vector via mapInPandas.

    Batch contract: each pandas batch holds (media_id, payload); output is
    one row per input row with the feature array. The iterator form keeps
    peak memory to one Arrow batch of blobs.
    """
    cols = media.select(F.col(id_col).alias("media_id"), F.col(payload_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": [_decode_image_features(p) for p in pdf["payload"]],
                }
            )

    return cols.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def sample_frames(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    meta_col: str = "meta",
    stride_ms: int = 1000,
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (fan-out
    inside mapInPandas — allowed: output batches need not align 1:1 with
    input rows)."""
    cols = media.select(
        F.col(id_col).alias("media_id"),
        F.col(payload_col).alias("payload"),
        F.col(meta_col + ".duration_ms").alias("duration_ms"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"media_id": [], "frame_idx": [], "frame_ts_ms": [], "feature": []}
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                n = _decode_frame_count(payload, None if pd.isna(dur) else int(dur))
                for i in range(n):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_ts_ms"].append(i * stride_ms)
                    out["feature"].append(_decode_image_features(payload))
            yield pd.DataFrame(out)

    return cols.mapInPandas(run, FRAME_SAMPLE_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("n_windows", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


# ---------------------------------------------------------------------------
# REAL codec #3: WAV / PCM audio (stdlib `wave` + numpy, zero dependencies)
# ---------------------------------------------------------------------------
# RIFF/WAVE PCM (8/16/32-bit, any channel count) decodes to actual
# samples, so audio_features exercises a genuine bytes -> waveform ->
# windowed-RMS path. Compressed audio (mp3/ogg/aac) still hits the
# declared stub fallback (no codecs in this container).

def decode_wav(payload: bytes) -> tuple[int, "object"]:
    """Decode a PCM WAV: returns ``(sample_rate, mono float64 array in
    [-1, 1])`` (channels averaged). Raises ValueError on non-PCM or
    malformed input."""
    import io
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(payload)) as wf:
            rate = wf.getframerate()
            nch = wf.getnchannels()
            width = wf.getsampwidth()
            frames = wf.readframes(wf.getnframes())
    except (wave.Error, EOFError) as exc:
        raise ValueError(f"bad WAV: {exc}") from exc
    if width == 1:  # 8-bit PCM is unsigned, midpoint 128
        x = (np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:
        x = np.frombuffer(frames, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if nch > 1:
        x = x[: (len(x) // nch) * nch].reshape(-1, nch).mean(axis=1)
    return rate, x


def encode_wav(rate: int, samples, width: int = 2, channels: int = 1) -> bytes:
    """Encode mono float samples in [-1, 1] as PCM WAV (test fixture
    path; ``channels`` > 1 duplicates the mono signal)."""
    import io
    import wave

    import numpy as np

    x = np.asarray(samples, dtype=np.float64)
    if width == 1:
        data = (np.clip(x, -1, 1) * 127 + 128).astype(np.uint8)
    elif width == 2:
        data = (np.clip(x, -1, 1) * 32767).astype("<i2")
    elif width == 4:
        data = (np.clip(x, -1, 1) * 2147483647).astype("<i4")
    else:
        raise ValueError("width must be 1, 2 or 4")
    if channels > 1:
        data = np.repeat(data, channels)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(width)
        wf.setframerate(rate)
        wf.writeframes(data.tobytes())
    return buf.getvalue()


# --- REAL codec #3b: IMA ADPCM (WAV format tag 0x11) -----------------------
# The one compressed-audio branch that is implementable zero-dep in pure
# Python: 4-bit differential coding with the standard IMA step/index
# tables (spec: IMA "Recommended Practices for Enhancing Digital Audio
# Compatibility", rev 3.00 — the same tables every adpcm-ima decoder
# ships). The stdlib ``wave`` module rejects non-PCM, so the RIFF/fmt/
# data chunks are parsed directly. mp3/ogg/aac remain declared stubs.

_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]


def _riff_chunks(payload: bytes) -> dict[bytes, bytes]:
    """First occurrence of each top-level RIFF chunk (fmt /data/fact)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    out: dict[bytes, bytes] = {}
    pos = 12
    while pos + 8 <= len(payload):
        cid, size = payload[pos:pos + 4], struct.unpack(
            "<I", payload[pos + 4:pos + 8]
        )[0]
        body = payload[pos + 8:pos + 8 + size]
        out.setdefault(cid, body)
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    return out


def _ima_step(pred: int, idx: int, nibble: int) -> tuple[int, int]:
    """One IMA ADPCM nibble update -> (new predictor, new step index)."""
    step = _IMA_STEPS[idx]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + _IMA_INDEX[nibble & 7]))
    return pred, idx


def decode_ima_adpcm_wav(payload: bytes) -> tuple[int, "object"]:
    """Decode an IMA ADPCM WAV (fmt tag 0x11): returns ``(sample_rate,
    mono float64 array in [-1, 1])``, channels averaged. Block layout:
    per channel a 4-byte header (int16 predictor — emitted as the
    block's first sample — step index, reserved), then 4-byte nibble
    groups interleaved channel by channel. Raises ValueError on
    malformed / non-ADPCM input."""
    import struct

    import numpy as np

    ch = _riff_chunks(payload)
    if b"fmt " not in ch or b"data" not in ch:
        raise ValueError("WAV missing fmt /data chunks")
    fmt = ch[b"fmt "]
    tag, nch, rate, _, block_align, bits = struct.unpack("<HHIIHH", fmt[:16])
    if tag != 0x11:
        raise ValueError(f"not IMA ADPCM (fmt tag {tag:#x})")
    if bits != 4 or nch < 1 or block_align < 4 * nch:
        raise ValueError("malformed IMA ADPCM fmt chunk")
    data = ch[b"data"]
    chans: list[list[int]] = [[] for _ in range(nch)]
    for b0 in range(0, len(data) - block_align + 1, block_align):
        block = data[b0:b0 + block_align]
        preds, idxs = [], []
        for c in range(nch):
            p, i = struct.unpack_from("<hBx", block, 4 * c)
            preds.append(p)
            idxs.append(min(88, i))
            chans[c].append(p)  # header predictor is the first sample
        pos = 4 * nch
        while pos + 4 * nch <= block_align:
            for c in range(nch):
                for byte in block[pos + 4 * c:pos + 4 * c + 4]:
                    for nib in (byte & 0x0F, byte >> 4):
                        preds[c], idxs[c] = _ima_step(preds[c], idxs[c], nib)
                        chans[c].append(preds[c])
            pos += 4 * nch
    x = np.array(chans, dtype=np.float64) / 32768.0
    return rate, x.mean(axis=0)


def encode_ima_adpcm_wav(
    rate: int, samples, block_samples: int = 505
) -> bytes:
    """Encode mono float samples in [-1, 1] as a mono IMA ADPCM WAV
    (fixture/round-trip path). ``block_samples`` must be 8k+1."""
    import struct

    import numpy as np

    if (block_samples - 1) % 8:
        raise ValueError("block_samples must be 8k+1")
    pcm = (np.clip(np.asarray(samples, dtype=np.float64), -1, 1) * 32767
           ).astype(np.int64)
    block_align = 4 + (block_samples - 1) // 2
    blocks = []
    idx = 0
    for b0 in range(0, len(pcm), block_samples):
        chunk = pcm[b0:b0 + block_samples]
        pred = int(chunk[0])
        out = bytearray(struct.pack("<hBx", pred, idx))
        nibbles = []
        for s in chunk[1:]:
            step = _IMA_STEPS[idx]
            diff = int(s) - pred
            nib = 8 if diff < 0 else 0
            diff = abs(diff)
            if diff >= step:
                nib |= 4
                diff -= step
            if diff >= step >> 1:
                nib |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                nib |= 1
            pred, idx = _ima_step(pred, idx, nib)
            nibbles.append(nib)
        nibbles += [0] * ((block_samples - 1) - len(nibbles))
        for lo, hi in zip(nibbles[::2], nibbles[1::2]):
            out.append(lo | (hi << 4))
        blocks.append(bytes(out))
    data = b"".join(blocks)
    n_samples = len(pcm)
    byte_rate = rate * block_align // block_samples
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, rate, byte_rate, block_align, 4,
        2, block_samples,
    )
    fact = struct.pack("<I", n_samples)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


# --- REAL parser: MPEG audio (mp3) frame-header metadata --------------------
# Full mp3 SAMPLE decode stays a declared stub (no codec libs, and a
# pure-Python MDCT/huffman decoder is out of zero-dep scope), but the
# CONTAINER is trivially parseable: ID3v2 skip + frame-header walk gives
# real sample rate / bitrate / channel mode / frame count / duration —
# the metadata a crawl curation pipeline actually filters on.

_MP3_BITRATES = {  # kbps; (version_key, layer) -> index table, 0=free
    ("1", 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    ("1", 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    ("1", 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    ("2", 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    ("2", 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    ("2", 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
}
_MP3_RATES = {"1": [44100, 48000, 32000], "2": [22050, 24000, 16000],
              "2.5": [11025, 12000, 8000]}
_MP3_SPF = {("1", 1): 384, ("1", 2): 1152, ("1", 3): 1152,
            ("2", 1): 384, ("2", 2): 1152, ("2", 3): 576}


def mp3_metadata(payload: bytes) -> dict:
    """Walk MPEG audio frame headers: ``{format, sample_rate, channels,
    bitrate_kbps, n_frames, duration_ms}``. Handles the ID3v2 prefix
    (synchsafe size), MPEG-1/2/2.5 x Layer I/II/III, per-frame bitrates
    (VBR duration = sum of frame durations; reported bitrate is the
    first frame's). Raises ValueError when no valid frame parses."""
    pos = 0
    if payload[:3] == b"ID3" and len(payload) >= 10:
        sz = 0
        for b in payload[6:10]:
            sz = (sz << 7) | (b & 0x7F)
        pos = 10 + sz
    n_frames = 0
    dur_us = 0
    first: dict | None = None
    while pos + 4 <= len(payload):
        h = int.from_bytes(payload[pos:pos + 4], "big")
        if (h >> 21) != 0x7FF:
            break
        ver_bits = (h >> 19) & 3
        layer_bits = (h >> 17) & 3
        if ver_bits == 1 or layer_bits == 0:
            break
        version = {0: "2.5", 2: "2", 3: "1"}[ver_bits]
        layer = 4 - layer_bits
        br_idx = (h >> 12) & 0xF
        sr_idx = (h >> 10) & 3
        if br_idx in (0, 0xF) or sr_idx == 3:
            break  # free/bad bitrate or reserved rate: stop the walk
        vkey = "1" if version == "1" else "2"
        bitrate = _MP3_BITRATES[(vkey, layer)][br_idx] * 1000
        rate = _MP3_RATES[version][sr_idx]
        padding = (h >> 9) & 1
        if layer == 1:
            frame_len = (12 * bitrate // rate + padding) * 4
        else:
            spf = _MP3_SPF[(vkey, layer)]
            frame_len = spf // 8 * bitrate // rate + padding
        if frame_len <= 4:
            break
        spf = _MP3_SPF[(vkey, layer)]
        if first is None:
            first = {
                "format": f"mpeg{version}-layer{layer}",
                "sample_rate": rate,
                "channels": 1 if ((h >> 6) & 3) == 3 else 2,
                "bitrate_kbps": bitrate // 1000,
            }
        n_frames += 1
        dur_us += spf * 1_000_000 // rate
        pos += frame_len
    if first is None:
        raise ValueError("no valid MPEG audio frame found")
    first["n_frames"] = n_frames
    first["duration_ms"] = dur_us // 1000
    return first


def wav_metadata(payload: bytes) -> dict:
    """RIFF/WAVE container metadata from the fmt /data chunks (PCM and
    IMA ADPCM): ``{format, sample_rate, channels, bitrate_kbps,
    n_frames, duration_ms}`` — n_frames = sample frames."""
    import struct

    ch = _riff_chunks(payload)
    if b"fmt " not in ch or b"data" not in ch:
        raise ValueError("WAV missing fmt /data chunks")
    tag, nch, rate, byte_rate, block_align, bits = struct.unpack(
        "<HHIIHH", ch[b"fmt "][:16]
    )
    n_data = len(ch[b"data"])
    if tag == 1 and bits in (8, 16, 32):
        frames = n_data // max(1, nch * bits // 8)
        fmt = f"pcm{bits}"
    elif tag == 0x11:
        spb = (block_align - 4 * nch) * 2 // nch + 1
        frames = (n_data // block_align) * spb
        fmt = "ima-adpcm"
    else:
        raise ValueError(f"unsupported WAV fmt tag {tag:#x}")
    return {
        "format": fmt,
        "sample_rate": int(rate),
        "channels": int(nch),
        "bitrate_kbps": int(byte_rate * 8 // 1000),
        "n_frames": int(frames),
        "duration_ms": int(frames * 1000 // max(1, rate)),
    }


# --- REAL parser: ISO-BMFF (mp4/mov) box-walk metadata ----------------------
# Video SAMPLE decode stays out of zero-dep scope, but the CONTAINER
# (ISO/IEC 14496-12) is a plain size+fourcc box tree: ftyp brand, mvhd
# timescale/duration, per-trak tkhd dimensions + hdlr handler + stsd
# sample-entry codec — the metadata a crawl curation pipeline filters
# video assets on, with no codec libs.

_MP4_UNITY_MATRIX = bytes().join(
    int(v).to_bytes(4, "big")
    for v in (0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
)


def _iter_boxes(buf, pos: int, end: int):
    """Yield (fourcc, body_start, box_end) over a box sequence. Handles
    the 64-bit largesize form (size == 1) and the to-end-of-file form
    (size == 0); raises ValueError on truncated/overrunning boxes."""
    while pos + 8 <= end:
        size = int.from_bytes(buf[pos:pos + 4], "big")
        btype = bytes(buf[pos + 4:pos + 8])
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize box header")
            size = int.from_bytes(buf[pos + 8:pos + 16], "big")
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"bad box size {size} for {btype!r}")
        yield btype, pos + hdr, pos + size
        pos += size


def mp4_metadata(payload: bytes) -> dict:
    """ISO-BMFF box walk: ``{format, duration_ms, n_tracks, width,
    height, video_codec, audio_codec}`` without touching sample data.

    Requires a leading ``ftyp`` (format = 'isobmff-<major brand>');
    reads ``moov/mvhd`` (version 0 and 1) for timescale/duration and
    each ``trak``'s ``tkhd`` (16.16 fixed-point dimensions),
    ``mdia/hdlr`` handler and ``mdia/minf/stbl/stsd`` first
    sample-entry fourcc. First video track wins the dimensions/codec;
    first audio track wins audio_codec. Raises ValueError on anything
    structurally malformed."""
    if len(payload) < 16:
        raise ValueError("too short for ISO-BMFF")
    buf = memoryview(payload)
    boxes = list(_iter_boxes(buf, 0, len(payload)))
    if not boxes or boxes[0][0] != b"ftyp":
        raise ValueError("not ISO-BMFF (no leading ftyp)")
    _, fs, _fe = boxes[0]
    brand = bytes(buf[fs:fs + 4]).decode("ascii", "replace").strip()
    moov = None
    for t, s, e in boxes:
        if t == b"moov":
            moov = (s, e)
    if moov is None:
        raise ValueError("no moov box")

    timescale = duration = None
    n_tracks = 0
    width = height = None
    video_codec = audio_codec = None

    def walk_trak(s: int, e: int) -> None:
        nonlocal width, height, video_codec, audio_codec
        handler = codec = None
        w = h = None
        for t, bs, be in _iter_boxes(buf, s, e):
            if t == b"tkhd":
                ver = buf[bs]
                off = bs + 4 + (32 if ver == 1 else 20)
                off += 8 + 2 + 2 + 2 + 2 + 36  # reserved..matrix
                w = int.from_bytes(buf[off:off + 4], "big") >> 16
                h = int.from_bytes(buf[off + 4:off + 8], "big") >> 16
            elif t == b"mdia":
                for t2, cs, ce in _iter_boxes(buf, bs, be):
                    if t2 == b"hdlr":
                        handler = bytes(buf[cs + 8:cs + 12])
                    elif t2 == b"minf":
                        for t3, ds, de in _iter_boxes(buf, cs, ce):
                            if t3 != b"stbl":
                                continue
                            for t4, es, ee in _iter_boxes(buf, ds, de):
                                if t4 == b"stsd" and int.from_bytes(
                                    buf[es + 4:es + 8], "big"
                                ) >= 1:
                                    codec = bytes(
                                        buf[es + 12:es + 16]
                                    ).decode("ascii", "replace")
        if handler == b"vide" and video_codec is None:
            video_codec, width, height = codec, w, h
        elif handler == b"soun" and audio_codec is None:
            audio_codec = codec

    for t, s, e in _iter_boxes(buf, *moov):
        if t == b"mvhd":
            ver = buf[s]
            if ver == 1:
                timescale = int.from_bytes(buf[s + 20:s + 24], "big")
                duration = int.from_bytes(buf[s + 24:s + 32], "big")
            else:
                timescale = int.from_bytes(buf[s + 12:s + 16], "big")
                duration = int.from_bytes(buf[s + 16:s + 20], "big")
        elif t == b"trak":
            n_tracks += 1
            walk_trak(s, e)
    if not timescale:
        raise ValueError("no mvhd timescale")
    return {
        "format": "isobmff-" + brand,
        "duration_ms": int(duration * 1000 // timescale),
        "n_tracks": n_tracks,
        "width": width,
        "height": height,
        "video_codec": video_codec,
        "audio_codec": audio_codec,
    }


def encode_mp4(
    timescale: int,
    duration: int,
    tracks: list,
    brand: bytes = b"isom",
    version: int = 0,
    largesize_mdat: bool = False,
) -> bytes:
    """Structurally-valid ISO-BMFF skeleton (exists to test the box
    walk, like the JPEG encoder): ftyp + moov{mvhd, trak{tkhd,
    mdia{mdhd, hdlr, minf{stbl{stsd{entry}}}}}*} + mdat. ``tracks``
    is a list of {handler: 'vide'|'soun', codec: fourcc str,
    width, height}; ``version`` selects 32/64-bit mvhd+tkhd forms;
    ``largesize_mdat`` emits the size==1 + 64-bit largesize header."""
    import struct

    def box(t: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + t + body

    full = bytes([version & 0xFF, 0, 0, 0])
    ftyp = box(b"ftyp", brand + struct.pack(">I", 0) + b"isommp41")
    if version == 1:
        mvhd_head = struct.pack(">QQIQ", 0, 0, timescale, duration)
    else:
        mvhd_head = struct.pack(">IIII", 0, 0, timescale, duration)
    mvhd = box(
        b"mvhd",
        full + mvhd_head + struct.pack(">i", 0x00010000)
        + struct.pack(">h", 0x0100) + b"\x00" * 10 + _MP4_UNITY_MATRIX
        + b"\x00" * 24 + struct.pack(">I", len(tracks) + 1),
    )
    traks = b""
    for tid, tr in enumerate(tracks, 1):
        w, h = int(tr.get("width") or 0), int(tr.get("height") or 0)
        if version == 1:
            tkhd_head = struct.pack(">QQIIQ", 0, 0, tid, 0, duration)
        else:
            tkhd_head = struct.pack(">IIIII", 0, 0, tid, 0, duration)
        tkhd = box(
            b"tkhd",
            full + tkhd_head + b"\x00" * 8
            + struct.pack(">hhhh", 0, 0,
                          0x0100 if tr["handler"] == "soun" else 0, 0)
            + _MP4_UNITY_MATRIX + struct.pack(">II", w << 16, h << 16),
        )
        mdhd = box(
            b"mdhd",
            bytes(4) + struct.pack(">IIII", 0, 0, timescale, duration)
            + struct.pack(">HH", 0x55C4, 0),
        )
        hdlr = box(
            b"hdlr",
            bytes(4) + bytes(4) + tr["handler"].encode("ascii")
            + bytes(12) + b"hdl\x00",
        )
        entry = box(
            tr["codec"].encode("ascii"),
            bytes(6) + struct.pack(">H", 1) + bytes(70),
        )
        stsd = box(b"stsd", bytes(4) + struct.pack(">I", 1) + entry)
        mdia = box(b"mdia", mdhd + hdlr + box(b"minf", box(b"stbl", stsd)))
        traks += box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + traks)
    if largesize_mdat:
        mdat = (
            struct.pack(">I", 1) + b"mdat"
            + struct.pack(">Q", 16 + 8) + bytes(8)
        )
    else:
        mdat = box(b"mdat", bytes(8))
    return ftyp + moov + mdat


# --- Matroska / WebM (EBML, RFC 8794 + the public Matroska element
# registry) container metadata: the same walk-don't-decode contract as
# mp4_metadata, over the second container family crawls actually carry.

_EBML_HEADER = 0x1A45DFA3
_EBML_DOCTYPE = 0x4282
_MKV_SEGMENT = 0x18538067
_MKV_INFO = 0x1549A966
_MKV_TIMESTAMP_SCALE = 0x2AD7B1
_MKV_DURATION = 0x4489
_MKV_TRACKS = 0x1654AE6B
_MKV_TRACK_ENTRY = 0xAE
_MKV_TRACK_TYPE = 0x83
_MKV_CODEC_ID = 0x86
_MKV_VIDEO = 0xE0
_MKV_PIXEL_WIDTH = 0xB0
_MKV_PIXEL_HEIGHT = 0xBA


def _ebml_read_id(buf, pos: int) -> tuple[int, int]:
    """Element ID vint: length = leading zeros of the first byte + 1
    (IDs keep their marker bit, so 0xAE and 0x42 0x82 compare as the
    registry constants above). IDs are 1-4 bytes."""
    if pos >= len(buf):
        raise ValueError("EBML id past end")
    b0 = buf[pos]
    if b0 == 0:
        raise ValueError("invalid EBML id lead byte 0x00")
    n = 9 - b0.bit_length()
    if n > 4 or pos + n > len(buf):
        raise ValueError("EBML id too long")
    return int.from_bytes(buf[pos:pos + n], "big"), pos + n


def _ebml_read_size(buf, pos: int) -> tuple[int, bool, int]:
    """Size vint: marker bit cleared; all-ones payload means UNKNOWN
    size (streaming muxers emit it on Segment) -> (size, unknown, pos)."""
    if pos >= len(buf):
        raise ValueError("EBML size past end")
    b0 = buf[pos]
    if b0 == 0:
        raise ValueError("invalid EBML size lead byte 0x00")
    n = 9 - b0.bit_length()
    if pos + n > len(buf):
        raise ValueError("EBML size truncated")
    raw = int.from_bytes(buf[pos:pos + n], "big")
    val = raw - (1 << (7 * n))
    return val, val == (1 << (7 * n)) - 1, pos + n


def _iter_ebml(buf, start: int, end: int):
    """Yield (element_id, body_start, body_end) for the siblings in
    [start, end); an unknown-size element extends to the parent end."""
    pos = start
    while pos < end:
        eid, pos = _ebml_read_id(buf, pos)
        size, unknown, pos = _ebml_read_size(buf, pos)
        if unknown:
            size = end - pos
        if pos + size > end:
            raise ValueError("EBML element overruns its parent")
        yield eid, pos, pos + size
        pos += size


def mkv_metadata(payload: bytes) -> dict:
    """Matroska/WebM EBML walk -> the same ``{format, duration_ms,
    n_tracks, width, height, video_codec, audio_codec}`` dict as
    :func:`mp4_metadata`, without touching Cluster/Block sample data.

    Requires a leading EBML header (format = 'matroska-<DocType>');
    reads Segment/Info's TimestampScale (ns per tick, default 10^6) and
    float Duration (ticks, 4- or 8-byte IEEE), and each Tracks/
    TrackEntry's TrackType/CodecID plus Video PixelWidth/PixelHeight.
    First video track (TrackType 1) wins dimensions/codec; first audio
    track (TrackType 2) wins audio_codec. Unknown-size Segments (live
    muxer output) extend to end-of-file. Raises ValueError on anything
    structurally malformed."""
    import struct

    if len(payload) < 8:
        raise ValueError("too short for EBML")
    buf = memoryview(payload)
    top = list(_iter_ebml(buf, 0, len(payload)))
    if not top or top[0][0] != _EBML_HEADER:
        raise ValueError("not EBML (no leading header)")
    doctype = "matroska"
    for eid, s, e in _iter_ebml(buf, top[0][1], top[0][2]):
        if eid == _EBML_DOCTYPE:
            doctype = bytes(buf[s:e]).split(b"\x00")[0].decode(
                "ascii", "replace"
            )
    seg = next(
        ((s, e) for eid, s, e in top if eid == _MKV_SEGMENT), None
    )
    if seg is None:
        raise ValueError("no Segment element")

    ts_scale = 1_000_000  # Matroska default: 1 ms ticks
    dur_ticks = None
    n_tracks = 0
    width = height = None
    video_codec = audio_codec = None
    for eid, s, e in _iter_ebml(buf, *seg):
        if eid == _MKV_INFO:
            for eid2, s2, e2 in _iter_ebml(buf, s, e):
                if eid2 == _MKV_TIMESTAMP_SCALE:
                    ts_scale = int.from_bytes(buf[s2:e2], "big")
                elif eid2 == _MKV_DURATION:
                    if e2 - s2 == 4:
                        dur_ticks = struct.unpack(
                            ">f", bytes(buf[s2:e2])
                        )[0]
                    elif e2 - s2 == 8:
                        dur_ticks = struct.unpack(
                            ">d", bytes(buf[s2:e2])
                        )[0]
                    else:
                        raise ValueError(
                            f"Duration float width {e2 - s2}"
                        )
        elif eid == _MKV_TRACKS:
            for eid2, s2, e2 in _iter_ebml(buf, s, e):
                if eid2 != _MKV_TRACK_ENTRY:
                    continue
                n_tracks += 1
                ttype = codec = w = h = None
                for eid3, s3, e3 in _iter_ebml(buf, s2, e2):
                    if eid3 == _MKV_TRACK_TYPE:
                        ttype = int.from_bytes(buf[s3:e3], "big")
                    elif eid3 == _MKV_CODEC_ID:
                        codec = bytes(buf[s3:e3]).decode(
                            "ascii", "replace"
                        )
                    elif eid3 == _MKV_VIDEO:
                        for eid4, s4, e4 in _iter_ebml(buf, s3, e3):
                            if eid4 == _MKV_PIXEL_WIDTH:
                                w = int.from_bytes(buf[s4:e4], "big")
                            elif eid4 == _MKV_PIXEL_HEIGHT:
                                h = int.from_bytes(buf[s4:e4], "big")
                if ttype == 1 and video_codec is None:
                    video_codec, width, height = codec, w, h
                elif ttype == 2 and audio_codec is None:
                    audio_codec = codec
    if n_tracks == 0:
        raise ValueError("no Tracks element")
    duration_ms = None
    if dur_ticks is not None:
        duration_ms = int(dur_ticks * ts_scale / 1_000_000)
    return {
        "format": "matroska-" + doctype,
        "duration_ms": duration_ms,
        "n_tracks": n_tracks,
        "width": width,
        "height": height,
        "video_codec": video_codec,
        "audio_codec": audio_codec,
    }


def _ebml_encode_size(n: int) -> bytes:
    """Minimal-length size vint (marker bit set, all-ones reserved)."""
    for ln in range(1, 9):
        if n < (1 << (7 * ln)) - 1:
            return ((1 << (7 * ln)) | n).to_bytes(ln, "big")
    raise ValueError(f"EBML size {n} too large")


def encode_mkv(
    timescale_ns: int,
    duration_ticks: float,
    tracks: list,
    doctype: str = "matroska",
    float64_duration: bool = False,
    unknown_segment_size: bool = False,
) -> bytes:
    """Structurally-valid Matroska/WebM skeleton (exists to test the
    EBML walk, like ``encode_mp4``): EBML header{DocType} +
    Segment{Info{TimestampScale, Duration}, Tracks{TrackEntry*}} +
    a dummy non-registry element standing in for Cluster data.
    ``tracks`` is a list of {type: 1|2, codec: str, width, height};
    ``unknown_segment_size`` emits the all-ones live-mux Segment size."""
    import struct

    def el(eid: bytes, body: bytes) -> bytes:
        return eid + _ebml_encode_size(len(body)) + body

    def uint(v: int) -> bytes:
        return v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big")

    header = el(
        b"\x1aE\xdf\xa3", el(b"\x42\x82", doctype.encode("ascii"))
    )
    dur = struct.pack(
        ">d" if float64_duration else ">f", float(duration_ticks)
    )
    info = el(
        b"\x15\x49\xa9\x66",
        el(b"\x2a\xd7\xb1", uint(timescale_ns)) + el(b"\x44\x89", dur),
    )
    entries = b""
    for tr in tracks:
        body = el(b"\x83", uint(int(tr["type"])))
        body += el(b"\x86", tr["codec"].encode("ascii"))
        if tr.get("width"):
            body += el(
                b"\xe0",
                el(b"\xb0", uint(int(tr["width"])))
                + el(b"\xba", uint(int(tr["height"]))),
            )
        entries += el(b"\xae", body)
    seg_body = (
        info + el(b"\x16\x54\xae\x6b", entries)
        + el(b"\xec", bytes(16))  # Void stand-in for Cluster data
    )
    if unknown_segment_size:
        return header + b"\x18\x53\x80\x67" + b"\xff" + seg_body
    return header + el(b"\x18\x53\x80\x67", seg_body)


VIDEO_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_tracks", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("video_codec", T.StringType()),
        T.StructField("audio_codec", T.StringType()),
    ]
)


def video_metadata(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """binary video payload -> container metadata via mapInPandas
    (Arrow batches, zero per-row Python in the plan): ISO-BMFF
    (:func:`mp4_metadata`) and Matroska/WebM (:func:`mkv_metadata`)
    tried in turn; unparseable payloads yield format 'unknown' with
    NULL fields — crawl data is dirty by definition. Same scale shape
    as :func:`audio_metadata`: the blob column is materialized only
    inside this stage."""
    cols = media.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.col(payload_col).alias("payload"),
    )

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                meta = None
                if payload:
                    from sigraph_spark.operators.avi import avi_metadata

                    for parser in (mp4_metadata, mkv_metadata, avi_metadata):
                        try:
                            meta = parser(bytes(payload))
                            break
                        except ValueError:
                            meta = None
                if meta is None:
                    meta = {
                        "format": "unknown", "duration_ms": None,
                        "n_tracks": None, "width": None, "height": None,
                        "video_codec": None, "audio_codec": None,
                    }
                rows.append({"media_id": mid, **meta})
            yield pd.DataFrame(rows)

    return cols.mapInPandas(run, VIDEO_META_SCHEMA)


AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("bitrate_kbps", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def audio_metadata(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """binary audio payload -> container metadata (mp3 frame walk /
    WAV fmt chunk / FLAC STREAMINFO / Ogg Vorbis-or-Opus pages, the
    last two in operators/mediameta.py) via mapInPandas; unparseable
    payloads yield format 'unknown' with NULL fields instead of
    failing the batch (crawl data is dirty by definition)."""
    from sigraph_spark.operators.mediameta import flac_metadata, ogg_metadata

    cols = media.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.col(payload_col).alias("payload"),
    )

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                meta = None
                if payload:
                    b = bytes(payload)
                    for parser in (wav_metadata, flac_metadata,
                                   ogg_metadata, mp3_metadata):
                        try:
                            meta = parser(b)
                            break
                        except ValueError:
                            continue
                if meta is None:
                    meta = {
                        "format": "unknown", "sample_rate": None,
                        "channels": None, "bitrate_kbps": None,
                        "n_frames": None, "duration_ms": None,
                    }
                rows.append({"media_id": mid, **meta})
            yield pd.DataFrame(rows)

    return cols.mapInPandas(run, AUDIO_META_SCHEMA)


def _wav_features(rate: int, mono, window_ms: int) -> tuple[int, list[float]]:
    """Real windowed features: per-window RMS energy over actual samples
    (same output contract as the stub: n_windows + _FEATURE_DIM-padded
    energies in [0, 1])."""
    import numpy as np

    spw = max(1, int(rate * window_ms / 1000))
    n_windows = max(1, -(-len(mono) // spw))  # ceil
    energies = []
    for w in range(min(n_windows, _FEATURE_DIM)):
        chunk = mono[w * spw : (w + 1) * spw]
        if len(chunk) == 0:
            energies.append(0.0)
        else:
            energies.append(float(min(1.0, np.sqrt(np.mean(chunk**2)))))
    energies += [0.0] * (_FEATURE_DIM - len(energies))
    return n_windows, energies


def _decode_audio_features(payload: bytes | None, duration_ms: int | None, window_ms: int) -> tuple[int, list[float]]:
    """Audio feature kernel. RIFF/WAVE PCM payloads take the REAL decode
    path (``decode_wav`` -> windowed RMS; window count from the actual
    sample rate, ignoring the metadata duration); IMA ADPCM WAVs (fmt
    tag 0x11) take the real COMPRESSED decode path
    (``decode_ima_adpcm_wav``); FLAC payloads take the real codec path
    (``operators/flac.decode_flac``, round 5 — CRC + MD5 verified,
    channels averaged), and Ogg-encapsulated FLAC the real
    ``operators/oggflac.decode_ogg_flac`` path (page CRCs + mapping
    header verified). Everything else (mp3, Ogg Vorbis/Opus) is the
    declared STUB fallback (no codecs in this container): per-window
    mean byte value over equal payload slices, padded to _FEATURE_DIM.
    Raises nothing; null/empty -> zeros."""
    if not payload:
        return 0, [0.0] * _FEATURE_DIM
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        for dec in (decode_wav, decode_ima_adpcm_wav):
            try:
                rate, mono = dec(payload)
                return _wav_features(rate, mono, max(window_ms, 1))
            except ValueError:
                continue  # malformed/other-codec WAV -> next / stub
    if payload[:4] == b"fLaC":
        try:
            from .flac import decode_flac

            rate, _ch, bits, samples = decode_flac(payload)
            mono = samples.astype("float64").mean(axis=1) / float(1 << (bits - 1))
            return _wav_features(rate, mono, max(window_ms, 1))
        except ValueError:
            pass  # malformed FLAC -> stub fallback
    if payload[:4] == b"OggS":
        try:
            from .oggflac import decode_ogg_flac

            rate, _ch, bits, samples = decode_ogg_flac(payload)
            mono = samples.astype("float64").mean(axis=1) / float(1 << (bits - 1))
            return _wav_features(rate, mono, max(window_ms, 1))
        except ValueError:
            pass  # vorbis/opus/malformed -> stub fallback
    n_windows = max(1, int((duration_ms or 1000) // max(window_ms, 1)))
    step = max(1, len(payload) // n_windows)
    energies = []
    for w in range(min(n_windows, _FEATURE_DIM)):
        chunk = payload[w * step:(w + 1) * step] or b"\x00"
        energies.append(sum(chunk) / (255.0 * len(chunk)))
    energies += [0.0] * (_FEATURE_DIM - len(energies))
    return n_windows, energies


def _decode_resize(payload: bytes | None, w: int, h: int) -> bytes:
    """Resize kernel. BMP, PNG, and GIF payloads take the REAL path:
    decode -> nearest-neighbor resample -> re-encode in the SAME format
    (nearest-neighbor never invents colors, so the GIF palette bound
    holds). Other formats keep the declared STUB (truncate/pad to
    w*h/64 bytes)."""
    codec = None
    if payload:
        if payload[:2] == b"BM":
            codec = (decode_bmp, encode_bmp)
        elif payload[:8] == _PNG_SIG:
            codec = (decode_png, encode_png)
        elif payload[:6] in _GIF_SIGS:
            codec = (decode_gif, encode_gif)
        elif payload[:2] == b"\xff\xd8":
            from sigraph_spark.operators.jpeg import decode_jpeg, encode_jpeg

            codec = (decode_jpeg, encode_jpeg)
    if codec is not None:
        try:
            sw, sh, rgb = codec[0](payload)
            import numpy as np

            px = np.frombuffer(rgb, dtype=np.uint8).reshape(sh, sw, 3)
            ys = (np.arange(h) * sh) // h
            xs = (np.arange(w) * sw) // w
            resized = px[ys][:, xs].tobytes()
            return codec[1](w, h, resized)
        except ValueError:
            pass
    size = max(1, (w * h) // 64)
    body = (payload or b"")[:size]
    return body + b"\x00" * (size - len(body))


def audio_features(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    meta_col: str = "meta",
    window_ms: int = 1000,
) -> DataFrame:
    """binary audio payload -> windowed energy feature vector via
    mapInPandas (same batch contract as image_features; the blob is read
    only inside this stage)."""
    cols = media.select(
        F.col(id_col).alias("media_id"),
        F.col(payload_col).alias("payload"),
        F.col(meta_col + ".duration_ms").alias("duration_ms"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_windows, feats = [], []
            for payload, dur in zip(pdf["payload"], pdf["duration_ms"]):
                n, f = _decode_audio_features(
                    payload, None if pd.isna(dur) else int(dur), window_ms
                )
                n_windows.append(n)
                feats.append(f)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "n_windows": n_windows, "feature": feats}
            )

    return cols.mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """binary image payload -> resized binary payload (stub kernel, real
    plumbing): output stays a binary column + typed dims so downstream
    stages keep pruning the blob everywhere else."""
    cols = media.select(F.col(id_col).alias("media_id"), F.col(payload_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [_decode_resize(p, width, height) for p in pdf["payload"]],
                    "width": width,
                    "height": height,
                }
            )

    return cols.mapInPandas(run, RESIZED_SCHEMA)


def rebalance_by_bytes(media: DataFrame, payload_col: str = "payload", target_bytes: int = 64 << 20) -> DataFrame:
    """Repartition so each decode task sees ~target_bytes of blobs:
    range-partition on a cumulative-ish proxy (hash spread weighted by
    size class). Heavy rows (>= target) isolate into their own partitions
    via a distinct salt range."""
    sized = media.withColumn("_sz", F.coalesce(F.length(F.col(payload_col)), F.lit(0)))
    return (
        sized.withColumn(
            "_wclass", F.least(F.col("_sz") / F.lit(target_bytes), F.lit(63.0)).cast("int")
        )
        .repartition(F.col("_wclass"), F.xxhash64(F.col(payload_col)))
        .drop("_sz", "_wclass")
    )


def gen_media(spark, n: int = 64, parts: int = 4) -> DataFrame:
    """Deterministic synthetic media table for tests: payload bytes derive
    from the id (no RNG)."""
    base = spark.range(0, n, 1, parts)
    payload = F.encode(
        F.concat(F.lit("MEDIA"), F.col("id").cast("string"), F.repeat(F.lit("x"), (F.col("id") % 7 + 1).cast("int") * 100)),
        "UTF-8",
    )
    meta = F.struct(
        F.when(F.col("id") % 3 == 0, "image").when(F.col("id") % 3 == 1, "audio").otherwise("video").alias("media_type"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        ((F.col("id") % 5 + 1) * 1000).cast("long").alias("duration_ms"),
    )
    return base.select(
        F.concat(F.lit("m-"), F.col("id").cast("string")).alias("media_id"),
        payload.alias("payload"),
        meta.alias("meta"),
    )
