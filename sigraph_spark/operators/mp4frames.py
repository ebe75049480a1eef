"""ISO-BMFF (mp4/mov) sample extraction + frame decode (round 5).

Extends the video plane from container METADATA (``multimodal.
mp4_metadata`` — mvhd/tkhd/hdlr/stsd walk) to SAMPLE-LEVEL access: the
full sample-table walk (stsd / stts / stsc / stsz / stco|co64 — ISO/IEC
14496-12 §8.5-8.7) recovers each video sample's file extent, and
JPEG-coded samples ('jpeg'/'mjpa' sample entries — the Motion-JPEG
mapping) decode through the repo's own T.81 codec. Non-JPEG codecs
(avc1/hvc1/...) walk fine but raise loudly at decode — bitstream
decoders for them are a declared non-goal, same contract as
``avi.py``'s unknown-codec branch.

* :func:`encode_mp4_samples` — structurally-valid single-video-track
  mp4 WITH real sample tables (the encoder exists to test the walk;
  ``chunking`` splits samples across chunks so stsc run-length
  expansion is actually exercised; ``co64`` emits 64-bit offsets).
* :func:`decode_mp4_frames` — payload -> (codec, [(idx, w, h, rgb)]).
* :func:`mp4_video_frames` — the DataFrame operator, schema-identical
  to ``avi.video_frames`` (exact integer per-channel pixel sums; dirty
  payloads yield one codec='unknown' NULL row, never a batch failure).

Scale shape: one narrow mapInPandas; the blob never leaves the stage.
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["encode_mp4_samples", "decode_mp4_frames", "mp4_video_frames"]


def _box(t: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + t + body


def _full(t: bytes, body: bytes, version: int = 0) -> bytes:
    return _box(t, bytes([version, 0, 0, 0]) + body)


def encode_mp4_samples(
    samples: list[bytes],
    width: int,
    height: int,
    codec: bytes = b"jpeg",
    timescale: int = 600,
    frame_duration: int = 25,
    chunking: list[int] | None = None,
    co64: bool = False,
) -> bytes:
    """Single-video-track mp4 with real stts/stsc/stsz/stco tables.
    ``chunking``: samples per chunk (must sum to len(samples)); default
    one chunk. ``co64`` selects 64-bit chunk offsets."""
    n = len(samples)
    chunking = chunking or [n]
    if sum(chunking) != n or any(c <= 0 for c in chunking):
        raise ValueError("chunking must be positive and sum to n")

    entry = _box(
        codec,
        b"\x00" * 6 + struct.pack(">H", 1)          # data_reference_index
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + b"\x00" * 4 + struct.pack(">H", 1)        # frame_count
        + b"\x00" * 32                               # compressorname
        + struct.pack(">Hh", 24, -1),
    )
    stsd = _full(b"stsd", struct.pack(">I", 1) + entry)
    stts = _full(b"stts", struct.pack(">III", 1, n, frame_duration))
    # stsc runs: consecutive chunks sharing samples-per-chunk collapse
    runs: list[tuple[int, int]] = []
    for ci, spc in enumerate(chunking, 1):
        if runs and runs[-1][1] == spc:
            continue
        runs.append((ci, spc))
    stsc = _full(
        b"stsc",
        struct.pack(">I", len(runs))
        + b"".join(struct.pack(">III", fc, spc, 1) for fc, spc in runs),
    )
    stsz = _full(
        b"stsz",
        struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", len(s)) for s in samples),
    )

    def tables(offsets: list[int]) -> bytes:
        if co64:
            stco = _full(
                b"co64",
                struct.pack(">I", len(offsets))
                + b"".join(struct.pack(">Q", o) for o in offsets),
            )
        else:
            stco = _full(
                b"stco",
                struct.pack(">I", len(offsets))
                + b"".join(struct.pack(">I", o) for o in offsets),
            )
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
        dinf = _box(b"dinf", _full(
            b"dref", struct.pack(">I", 1)
            + struct.pack(">I", 12) + b"url " + b"\x00\x00\x00\x01"))
        vmhd = _full(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0), 0)
        minf = _box(b"minf", vmhd + dinf + stbl)
        duration = n * frame_duration
        mdhd = _full(b"mdhd", struct.pack(">IIII", 0, 0, timescale,
                                          duration)
                     + struct.pack(">HH", 0x55C4, 0))
        hdlr = _full(b"hdlr", b"\x00" * 4 + b"vide" + b"\x00" * 12
                     + b"VideoHandler\x00")
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        tkhd = _full(b"tkhd", struct.pack(">IIIII", 0, 0, 1, 0, duration)
                     + b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0, 0)
                     + b"\x00\x01\x00\x00" + b"\x00" * 12
                     + b"\x00\x01\x00\x00" + b"\x00" * 12
                     + b"\x40\x00\x00\x00"
                     + struct.pack(">II", width << 16, height << 16))
        mvhd = _full(b"mvhd", struct.pack(">IIII", 0, 0, timescale,
                                          duration)
                     + struct.pack(">i", 0x00010000)
                     + struct.pack(">h", 0x0100) + b"\x00" * 10
                     + b"\x00\x01\x00\x00" + b"\x00" * 12
                     + b"\x00\x01\x00\x00" + b"\x00" * 12
                     + b"\x40\x00\x00\x00" + b"\x00" * 24
                     + struct.pack(">I", 2))
        return _box(b"moov", mvhd + _box(b"trak", tkhd + mdia))

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isommp41")
    moov_size = len(tables([0] * len(chunking)))
    mdat_payload = b"".join(samples)
    base = len(ftyp) + moov_size + 8  # mdat header
    offsets, pos, si = [], base, 0
    for spc in chunking:
        offsets.append(pos)
        pos += sum(len(samples[si + k]) for k in range(spc))
        si += spc
    moov = tables(offsets)
    assert len(moov) == moov_size
    return ftyp + moov + _box(b"mdat", mdat_payload)


def _sample_extents(buf: bytes, stbl: dict) -> list[tuple[int, int]]:
    """(offset, size) per sample from the stsc/stco/stsz tables."""
    sizes, stsc, offsets = stbl["sizes"], stbl["stsc"], stbl["offsets"]
    extents, si = [], 0
    for ci in range(len(offsets)):
        spc = 0
        for fc, run_spc in stsc:
            if fc <= ci + 1:
                spc = run_spc
            else:
                break
        pos = offsets[ci]
        for _ in range(spc):
            if si >= len(sizes):
                break
            extents.append((pos, sizes[si]))
            pos += sizes[si]
            si += 1
    if si != len(sizes):
        raise ValueError(
            f"sample tables inconsistent: {si} placed, {len(sizes)} sized")
    return extents


def decode_mp4_frames(payload: bytes):
    """-> ``(codec, frames)`` with frames ``[(idx, w, h, rgb)]`` for
    the FIRST video track. JPEG-coded samples decode; other codecs
    raise ValueError (loud non-goal)."""
    from .multimodal import _iter_boxes

    buf = payload
    moov = None
    for t, s, e in _iter_boxes(buf, 0, len(buf)):
        if t == b"moov":
            moov = (s, e)
    if moov is None:
        raise ValueError("mp4: no moov box")

    def find(pos: int, end: int, name: bytes):
        for t, s, e in _iter_boxes(buf, pos, end):
            if t == name:
                return s, e
        return None

    for t, ts_, te in _iter_boxes(buf, *moov):
        if t != b"trak":
            continue
        mdia = find(ts_, te, b"mdia")
        if not mdia:
            continue
        hdlr = find(*mdia, b"hdlr")
        if not hdlr or buf[hdlr[0] + 8:hdlr[0] + 12] != b"vide":
            continue
        minf = find(*mdia, b"minf")
        stbl_span = minf and find(*minf, b"stbl")
        if not stbl_span:
            raise ValueError("mp4: video trak without stbl")
        stsd = find(*stbl_span, b"stsd")
        stsz = find(*stbl_span, b"stsz")
        stsc = find(*stbl_span, b"stsc")
        stco = find(*stbl_span, b"stco") or find(*stbl_span, b"co64")
        if not (stsd and stsz and stsc and stco):
            raise ValueError("mp4: incomplete sample tables")
        s0 = stsd[0] + 8  # fullbox header + entry_count
        codec = buf[s0 + 4:s0 + 8].decode("latin-1")
        w = int.from_bytes(buf[s0 + 8 + 24:s0 + 8 + 26], "big")
        h = int.from_bytes(buf[s0 + 8 + 26:s0 + 8 + 28], "big")
        p = stsz[0] + 4
        fixed = int.from_bytes(buf[p:p + 4], "big")
        n = int.from_bytes(buf[p + 4:p + 8], "big")
        if fixed:
            sizes = [fixed] * n
        else:
            sizes = [int.from_bytes(buf[p + 8 + 4 * k:p + 12 + 4 * k],
                                    "big") for k in range(n)]
        p = stsc[0] + 4
        nruns = int.from_bytes(buf[p:p + 4], "big")
        runs = [(int.from_bytes(buf[p + 4 + 12 * k:p + 8 + 12 * k], "big"),
                 int.from_bytes(buf[p + 8 + 12 * k:p + 12 + 12 * k], "big"))
                for k in range(nruns)]
        p = stco[0] + 4
        nch = int.from_bytes(buf[p:p + 4], "big")
        wide = buf[stco[0] - 4:stco[0]] == b"co64"
        step = 8 if wide else 4
        offsets = [int.from_bytes(
            buf[p + 4 + step * k:p + 4 + step * (k + 1)], "big")
            for k in range(nch)]
        extents = _sample_extents(
            buf, {"sizes": sizes, "stsc": runs, "offsets": offsets})
        if codec not in ("jpeg", "mjpa"):
            raise ValueError(f"mp4: no bitstream decoder for {codec!r}")
        from .jpeg import decode_jpeg

        frames = []
        for idx, (off, size) in enumerate(extents):
            if off + size > len(buf):
                raise ValueError("mp4: sample extent beyond file")
            jw, jh, rgb = decode_jpeg(bytes(buf[off:off + size]))
            frames.append((idx, jw, jh, rgb))
        return codec, frames
    raise ValueError("mp4: no video track")


def mp4_video_frames(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """binary mp4 payload -> one row per decoded video frame with exact
    integer per-channel pixel sums — schema-identical to
    ``avi.video_frames`` so the two containers union cleanly."""
    import pandas as pd  # noqa: F401

    cols = media.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.col(payload_col).alias("payload"),
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    b = bytes(payload) if payload is not None else b""
                    codec, frames = decode_mp4_frames(b)
                    for idx, w, h, rgb in frames:
                        px = np.frombuffer(rgb, dtype=np.uint8)
                        px = px.reshape(-1, 3).astype(np.int64)
                        s = px.sum(axis=0)
                        rows.append({
                            "media_id": mid, "frame_idx": idx,
                            "width": w, "height": h, "codec": codec,
                            "sum_r": int(s[0]), "sum_g": int(s[1]),
                            "sum_b": int(s[2]),
                        })
                except ValueError:
                    rows.append({
                        "media_id": mid, "frame_idx": None,
                        "width": None, "height": None,
                        "codec": "unknown",
                        "sum_r": None, "sum_g": None, "sum_b": None,
                    })
            yield pd.DataFrame(rows)

    schema = ("media_id string, frame_idx int, width int, height int, "
              "codec string, sum_r long, sum_g long, sum_b long")
    return cols.mapInPandas(run, schema)
