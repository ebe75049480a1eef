"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with a
typed metadata struct; the expensive decode/feature steps run as
Arrow-batched functions over ``mapInPandas`` so one task processes a whole
record batch without per-row Python overhead.

Uncompressed BMP images decode for REAL (pure Python + numpy,
``decode_bmp``/``encode_bmp`` below) — image_features and resize_images
run a genuine bytes -> pixels path for that format. Compressed codecs
(PIL/ffmpeg/librosa) are NOT in this container, so those formats hit
deterministic fakes behind the same ``_decode_*`` seams — clearly marked,
swappable, and unit-tested for the Spark-side contract that IS real:
schema, batch shape, partitioning, and null/size handling.

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


def _bmp_features(width: int, height: int, rgb: bytes) -> list[float]:
    """Real pixel features for decoded BMPs: [mean R, mean G, mean B,
    mean luma] + a 12-bin luma histogram, all normalized to [0, 1]."""
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
    """Image feature kernel. BMP payloads take the REAL decode path
    (``decode_bmp`` -> pixel statistics). Everything else is the declared
    STUB fallback (no PIL/ffmpeg in this container): a deterministic
    16-bin byte histogram. Raises nothing; null/empty -> zeros."""
    if not payload:
        return [0.0] * _FEATURE_DIM
    if payload[:2] == b"BM":
        try:
            return _bmp_features(*decode_bmp(payload))
        except ValueError:
            pass  # malformed/unsupported BMP -> stub fallback
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


def _decode_audio_features(payload: bytes | None, duration_ms: int | None, window_ms: int) -> tuple[int, list[float]]:
    """STUB DECODE (no audio libs in this container): deterministic fake —
    per-window mean byte value over equal payload slices ("energy"),
    padded/truncated to _FEATURE_DIM. Swap in librosa/torchaudio here."""
    if not payload:
        return 0, [0.0] * _FEATURE_DIM
    n_windows = max(1, int((duration_ms or 1000) // max(window_ms, 1)))
    step = max(1, len(payload) // n_windows)
    energies = []
    for w in range(min(n_windows, _FEATURE_DIM)):
        chunk = payload[w * step:(w + 1) * step] or b"\x00"
        energies.append(sum(chunk) / (255.0 * len(chunk)))
    energies += [0.0] * (_FEATURE_DIM - len(energies))
    return n_windows, energies


def _decode_resize(payload: bytes | None, w: int, h: int) -> bytes:
    """Resize kernel. BMP payloads take the REAL path: decode ->
    nearest-neighbor resample -> re-encode as 24-bit BMP. Other formats
    keep the declared STUB (truncate/pad to w*h/64 bytes)."""
    if payload and payload[:2] == b"BM":
        try:
            sw, sh, rgb = decode_bmp(payload)
            import numpy as np

            px = np.frombuffer(rgb, dtype=np.uint8).reshape(sh, sw, 3)
            ys = (np.arange(h) * sh) // h
            xs = (np.arange(w) * sw) // w
            return encode_bmp(w, h, px[ys][:, xs].tobytes())
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
