"""Perceptual image hashing + near-duplicate blocking (round 5).

The image side of training-data dedup: re-encoded, re-saved, or
format-shifted copies of the same picture share (or almost share) a
64-bit difference hash, so exact-byte dedup misses them while dHash
blocking catches them — the standard curation step next to text
MinHash/SimHash (Krawetz's dHash; same family as pHash/aHash).

- ``dhash64(width, height, rgb)``: EXACT integer dHash — BT.601
  luminance in integer milli-weights (299/587/114), box resize to a
  9x8 grid with floor(i*dim/9) block boundaries and cross-multiplied
  mean comparisons (``sum_l*cnt_r > sum_r*cnt_l``) so NO float or
  division appears anywhere; bit (r, c) set iff the left block is
  brighter than its right neighbour, row-major from the MSB.
  Format-independent by construction: any two LOSSLESS encodings of the
  same pixels hash identically.
- ``image_hashes``: mapInPandas over payload bytes through the repo's
  own pure-Python codecs (PNG/GIF/BMP/JPEG — undecodable payloads yield
  NULL, never a batch failure).
- ``image_neardup``: the SimHash blocking shape re-used on the image
  plane (``dedup.py``): 4 16-bit bands (pigeonhole for Hamming<=3),
  bucket self-join, per-pair first-matching-band filter (no distinct),
  exact Hamming verify via ``bit_count(xor)``.

Scale shape: one narrow Arrow pass decodes + hashes (payload bytes
never leave the stage); the only shuffle is the band-bucket join on
uniform 16-bit keys. Reference parity: hongsam14/sigraph has no media
plane — this extends the multimodal dedup family SURVEY §2 adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["dhash64", "dhash_from_payload", "decode_rgb_payload",
           "image_hashes", "image_neardup", "image_index",
           "incremental_image_candidates", "banded_index",
           "banded_neardup_pairs"]

_GRID_W, _GRID_H = 9, 8  # dHash grid: 8 comparisons per row x 8 rows


def dhash64(width: int, height: int, rgb: bytes) -> int:
    """Exact-integer 64-bit dHash of a top-down RGB buffer."""
    import numpy as np

    if width < 1 or height < 1 or len(rgb) < width * height * 3:
        raise ValueError("dhash64: bad dimensions or short buffer")
    px = np.frombuffer(rgb, dtype=np.uint8)[: width * height * 3]
    px = px.reshape(height, width, 3).astype(np.int64)
    # BT.601 luminance in integer milli-weights — stays integral
    lum = px[:, :, 0] * 299 + px[:, :, 1] * 587 + px[:, :, 2] * 114
    # integer box-resize: block (r, c) spans rows [floor(r*h/8),
    # floor((r+1)*h/8)) x cols [floor(c*w/9), floor((c+1)*w/9));
    # degenerate (empty) spans clamp to one source row/col
    col_sum = np.add.accumulate(lum, axis=1)
    col_sum = np.concatenate(
        [np.zeros((height, 1), dtype=np.int64), col_sum], axis=1)
    row_acc = np.add.accumulate(col_sum, axis=0)
    row_acc = np.concatenate(
        [np.zeros((1, width + 1), dtype=np.int64), row_acc], axis=0)

    def bounds(n_blocks: int, dim: int) -> list:
        out = []
        for b in range(n_blocks):
            lo = b * dim // n_blocks
            hi = (b + 1) * dim // n_blocks
            if hi <= lo:  # dim < n_blocks: clamp to one pixel
                lo = min(b, dim - 1)
                hi = lo + 1
            out.append((lo, hi))
        return out

    rb = bounds(_GRID_H, height)
    cb = bounds(_GRID_W, width)
    sums = [[0] * _GRID_W for _ in range(_GRID_H)]
    cnts = [[0] * _GRID_W for _ in range(_GRID_H)]
    for r, (r0, r1) in enumerate(rb):
        for c, (c0, c1) in enumerate(cb):
            s = (row_acc[r1][c1] - row_acc[r0][c1]
                 - row_acc[r1][c0] + row_acc[r0][c0])
            sums[r][c] = int(s)
            cnts[r][c] = (r1 - r0) * (c1 - c0)
    h = 0
    for r in range(_GRID_H):
        for c in range(_GRID_W - 1):
            # mean_l > mean_r without division: cross-multiply
            bit = int(sums[r][c] * cnts[r][c + 1]
                      > sums[r][c + 1] * cnts[r][c])
            h = (h << 1) | bit
    return h


def decode_rgb_payload(payload: bytes) -> tuple[int, int, bytes]:
    """Sniff + decode via the repo codecs -> ``(w, h, rgb)``. Raises
    ValueError when no codec accepts the payload — the shared pixel
    entry point for every image operator (hashing, tiling, stats)."""
    if not payload or len(payload) < 8:
        raise ValueError("image payload too short")
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from .multimodal import decode_png
        return decode_png(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from .multimodal import decode_gif
        return decode_gif(payload)
    if payload[:2] == b"BM":
        from .multimodal import decode_bmp
        return decode_bmp(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg
        return decode_jpeg(payload)
    raise ValueError("unrecognized image container")


def dhash_from_payload(payload: bytes | None) -> int | None:
    """Sniff + decode via the repo codecs, then dHash; None when the
    payload is missing or no codec accepts it."""
    if payload is None:
        return None
    try:
        w, h, rgb = decode_rgb_payload(payload)
        return dhash64(w, h, rgb)
    except ValueError:
        return None


def image_hashes(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """-> ``(id, dh)`` with ``dh`` the signed-long dHash (NULL when
    undecodable). One Arrow-batched narrow pass; bytes stay in-stage."""
    import pandas as pd

    schema = "id string, dh long"

    def run(batches):
        for pdf in batches:
            ids, dhs = [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                dh = dhash_from_payload(bytes(p) if p is not None
                                        else None)
                # store as signed 64-bit (two's complement) for LongType
                if dh is not None and dh >= 1 << 63:
                    dh -= 1 << 64
                ids.append(i)
                dhs.append(dh)
            # dh MUST be nullable Int64, not inferred: a plain
            # pd.DataFrame coerces int+None columns to float64, which
            # silently rounds away the low ~11 bits of a 64-bit hash
            # (53-bit mantissa) whenever an undecodable payload shares
            # the batch
            yield pd.DataFrame({
                "id": pd.Series(ids, dtype=object),
                "dh": pd.Series(dhs, dtype="Int64"),
            })

    return media.select(id_col, payload_col).mapInPandas(run, schema)


def _band(col, bi: int):
    """16-bit band ``bi`` (0..3) of a signed-long hash, JVM-side."""
    return F.shiftrightunsigned(col, 16 * (3 - bi)).bitwiseAND(
        F.lit(0xFFFF))


def _first_match(ca, cb):
    """Index of the first band where two hashes agree (pair dedup:
    a bucket-join pair is kept only at its first matching band, so no
    ``distinct`` shuffle is needed)."""
    return (
        F.when(_band(ca, 0) == _band(cb, 0), 0)
        .when(_band(ca, 1) == _band(cb, 1), 1)
        .when(_band(ca, 2) == _band(cb, 2), 2)
        .otherwise(3)
    )


def banded_index(hashes: DataFrame, hash_col: str = "dh") -> DataFrame:
    """Explode a 64-bit-hash relation ``(id, <hash_col>)`` into the
    4x16-bit pigeonhole band relation ``(id, <hash_col>, bi, bv)`` —
    the shared storage/blocking shape of every Hamming<=3 modality
    (SimHash text, dHash images, Haar-band audio). NULL hashes drop."""
    h = hashes.filter(F.col(hash_col).isNotNull())
    return h.select(
        "id",
        hash_col,
        F.explode(
            F.array(*[
                F.struct(F.lit(bi).alias("bi"),
                         _band(F.col(hash_col), bi).alias("bv"))
                for bi in range(4)
            ])
        ).alias("band"),
    ).select("id", hash_col, F.col("band.bi").alias("bi"),
             F.col("band.bv").alias("bv"))


def banded_neardup_pairs(
    banded: DataFrame,
    hash_col: str = "dh",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs from a ``banded_index`` relation: bucket
    self-join on (bi, bv), first-matching-band dedup (no distinct),
    exact Hamming verify via bit_count(xor). Complete for Hamming <=
    3 by the pigeonhole principle; best-effort above."""
    # the index feeds BOTH self-join legs, and its upstream is usually
    # the Arrow decode+hash pass — an opaque subplan the optimizer
    # cannot share across aliased legs (the dedup.simhash lesson), so
    # without a boundary every payload decodes twice. One lazy
    # materialization serves both legs; a deployment reads the STORED
    # index here anyway.
    banded = banded.localCheckpoint(eager=False)
    a = banded.select("bi", "bv", F.col("id").alias("a"),
                      F.col(hash_col).alias("ha"))
    b = banded.select("bi", "bv", F.col("id").alias("b"),
                      F.col(hash_col).alias("hb"))
    return (
        a.join(b, ["bi", "bv"])
        .filter(F.col("a") < F.col("b"))
        .filter(F.col("bi") == _first_match(F.col("ha"), F.col("hb")))
        .withColumn("hamming",
                    F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", F.col("hamming").cast("int").alias("hamming"))
    )


def image_index(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """The persistable image-dedup index relation: one row per
    ``(id, dh, bi, bv)`` — the four 16-bit pigeonhole bands of the
    64-bit dHash plus the hash itself (probe time verifies exact
    Hamming, exactly like ``dedup.simhash_index``).

    The table a 100 TB deployment stores (bucketed by ``(bi, bv)``) so
    each crawl snapshot deduplicates its images against the corpus
    WITHOUT re-decoding corpus pixels: decode + hash happen once, at
    ingest. Undecodable payloads drop here (no NULL index rows)."""
    return banded_index(image_hashes(media, id_col, payload_col), "dh")


def incremental_image_candidates(
    new_media: DataFrame,
    index: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    max_hamming: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Incremental image near-dup: NEW images vs the EXISTING corpus
    index (``image_index`` rows), plus new-vs-new — corpus pixels are
    never re-decoded. The image twin of
    ``dedup.incremental_simhash_candidates``.

    Returns ``(pairs, delta_index)``: verified pairs ``(a, b,
    hamming)`` (a < b) where at least one endpoint is new, and the
    delta index rows the caller appends to the stored index.

    Equivalence (oracled by the ``imagehash_incremental`` gate): bands
    are per-image independent, so ``neardup(old ∪ new) = neardup(old)
    ∪ incremental(new, index(old))`` exactly. Probe cost is
    O(|delta| x 4) rows against a bucketed index; dHash band values
    have no crawl-side hot key amplification beyond true duplicate
    clusters (the hot-bucket diagnostic ``dedup.bucket_histogram``
    applies unchanged)."""
    # the delta index feeds the probe leg, both new-vs-new legs, AND
    # the caller's append — without a boundary the delta's Arrow
    # decode+hash pass re-runs per consumer (opaque subplan, no reuse)
    delta_index = image_index(new_media, id_col, payload_col).localCheckpoint(
        eager=False
    )
    corpus = index.select(
        "bi", "bv", F.col("id").alias("x"), F.col("dh").alias("dhx")
    )
    fresh = delta_index.select(
        "bi", "bv", F.col("id").alias("y"), F.col("dh").alias("dhy")
    )
    new_vs_old = (
        corpus.join(fresh, ["bi", "bv"])
        .filter(F.col("x") != F.col("y"))
        .filter(F.col("bi") == _first_match(F.col("dhx"), F.col("dhy")))
        .withColumn("hamming",
                    F.bit_count(F.col("dhx").bitwiseXOR(F.col("dhy"))))
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.least("x", "y").alias("a"),
            F.greatest("x", "y").alias("b"),
            F.col("hamming").cast("int").alias("hamming"),
        )
    )
    n1 = delta_index.select("bi", "bv", F.col("id").alias("a"),
                            F.col("dh").alias("dha"))
    n2 = delta_index.select("bi", "bv", F.col("id").alias("b"),
                            F.col("dh").alias("dhb"))
    new_vs_new = (
        n1.join(n2, ["bi", "bv"])
        .filter(F.col("a") < F.col("b"))
        .filter(F.col("bi") == _first_match(F.col("dha"), F.col("dhb")))
        .withColumn("hamming",
                    F.bit_count(F.col("dha").bitwiseXOR(F.col("dhb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", F.col("hamming").cast("int").alias("hamming"))
    )
    # distinct: a re-fed image can surface the same pair from both legs
    return new_vs_old.unionByName(new_vs_new).distinct(), delta_index


def image_neardup(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup image pairs ``(a, b, hamming)`` with Hamming(dHash) <=
    ``max_hamming`` (<= 3 guaranteed complete by the 4-band pigeonhole;
    larger thresholds are best-effort, same contract as SimHash)."""
    return banded_neardup_pairs(image_index(media, id_col, payload_col),
                                "dh", max_hamming)
