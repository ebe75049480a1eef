"""Baseline + progressive JPEG codec — pure Python + numpy, zero deps.

Decodes baseline sequential DCT JPEGs (SOF0, 8-bit, Huffman): marker
parsing (APPn/COM skipped, DQT 8/16-bit tables, DHT canonical code
reconstruction, SOS, DRI/RSTn restart intervals, FF00 byte unstuffing),
MCU entropy decode (DC category+extend, AC run/size with ZRL and EOB),
dequantize → dezigzag → IDCT → level shift, chroma upsampling by
replication for any (h, v) ≤ 4 sampling factors, and JFIF YCbCr→RGB.

Also decodes **progressive** DCT JPEGs (SOF2, round 4 — closes the
former declared stub) per ITU T.81 G.2: multi-scan coefficient
accumulation with spectral selection (Ss..Se bands), successive
approximation (DC first/refine, AC first/refine with correction bits),
EOB run-length codes (EOBn), interleaved DC scans + single-component AC
scans, and restart intervals inside progressive scans. Arithmetic
coding and 12-bit precision still raise ValueError (the multimodal
seams fall back to the declared stub).

The encoders exist to make the decoders testable without external
fixtures: 4:4:4, Annex-K quantization tables with the libjpeg quality
scaling; Annex-K Huffman tables for baseline, a flat 8-bit table for
progressive scans (Annex K has no EOBn symbols). Baseline round-trips
are lossy (PSNR-bounded tests); the decode path is additionally pinned
against hand-built streams and an independent cosine-sum IDCT so
symmetric encoder/decoder bugs cannot hide (tests/test_jpeg.py).
Progressive has a stronger oracle: it re-encodes the SAME quantized
coefficients as the baseline encoder, so ``decode(progressive bytes)``
must be BIT-IDENTICAL to ``decode(baseline bytes)``
(tests/test_jpeg_progressive.py).

This is a driver/UDF-side kernel like the BMP/PNG/GIF/WAV codecs in
``multimodal.py``: it runs inside Arrow-batched ``mapInPandas`` stages,
never per-row Python in a hot Column path.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg", "encode_jpeg_progressive"]

# Annex K / ITU T.81 zigzag order: ZIGZAG[i] = block index of the i-th
# coefficient in zigzag scan order.
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K luminance / chrominance quantization tables (natural order).
_QL = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
)
_QC = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.float64,
)

# Annex K "typical" Huffman tables: (bits[1..16], values)
_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_L = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_C = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """8x8 DCT-II basis C with C[u, x] = a(u)/2 * cos((2x+1)uπ/16):
    block_dct = C @ block @ C.T; idct = C.T @ coeffs @ C."""
    c = np.zeros((8, 8))
    for u in range(8):
        a = np.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            c[u, x] = a * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return c


_C = _dct_matrix()


def _build_huffman(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman table -> {(code_length, code): symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over the entropy segment with FF00
    unstuffing; RSTn markers are surfaced via ``restart()``."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG entropy stream")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                raise ValueError("hit restart marker mid-symbol")
            else:
                # EOI or other marker: pad with 1-bits per spec
                self.acc = (self.acc << 8) | 0xFF
                self.n += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.acc = 0
        self.n = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("missing restart marker")

    def decode(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("bad Huffman code")


def _extend(v: int, t: int) -> int:
    """DC/AC magnitude-category sign extension (T.81 F.2.2.1)."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline JPEG; returns ``(width, height, rgb)`` top-down
    row-major RGB triples (grayscale replicated). Raises ValueError for
    non-baseline or malformed input."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    dac: dict[tuple[int, int], int] = {}
    comps: list[dict] = []
    width = height = -1
    restart_interval = 0
    progressive = False
    arith = False
    coef: list[np.ndarray] | None = None  # per-comp zigzag coefficients
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = payload[pos + 1]
        if marker == 0xFF:  # legal fill byte run before a marker (T.81 B.1.1.2)
            pos += 1
            continue
        if marker == 0xD8:
            pos += 2
            continue
        if marker == 0xD9:  # EOI — only reached on the progressive path
            break
        seg_len = struct.unpack_from(">H", payload, pos + 2)[0]
        seg = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            s = 0
            while s < len(seg):
                pq, tq = seg[s] >> 4, seg[s] & 0x0F
                s += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[s : s + 64], dtype=np.uint8).astype(
                        np.float64
                    )
                    s += 64
                else:
                    tbl = np.frombuffer(seg[s : s + 128], dtype=">u2").astype(
                        np.float64
                    )
                    s += 128
                nat = np.zeros(64)
                nat[ZIGZAG] = tbl  # stored in zigzag order
                qt[tq] = nat
        elif marker == 0xC4:  # DHT
            s = 0
            while s < len(seg):
                tc, th = seg[s] >> 4, seg[s] & 0x0F
                bits = list(seg[s + 1 : s + 17])
                n = sum(bits)
                vals = list(seg[s + 17 : s + 17 + n])
                huff[(tc, th)] = _build_huffman(bits, vals)
                s += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA):
            # SOF0/1 baseline, SOF2 progressive, SOF9 arithmetic
            # sequential, SOF10 progressive-arithmetic
            prec = seg[0]
            if prec != 8:
                raise ValueError("unsupported JPEG precision")
            progressive = marker in (0xC2, 0xCA)
            arith = marker in (0xC9, 0xCA)
            height, width = struct.unpack_from(">HH", seg, 1)
            nc = seg[5]
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("unsupported JPEG coding")
        elif marker == 0xCC:  # DAC — arithmetic conditioning (B.2.4.3)
            s = 0
            while s + 1 < len(seg):
                dac[(seg[s] >> 4, seg[s] & 0x0F)] = seg[s + 1]
                s += 2
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS -> entropy data follows
            if not progressive:
                ns = seg[0]
                for i in range(ns):
                    cid, tabs = seg[1 + 2 * i], seg[2 + 2 * i]
                    for c in comps:
                        if c["id"] == cid:
                            c["td"], c["ta"] = tabs >> 4, tabs & 0x0F
                if arith:
                    from sigraph_spark.operators.jpeg_arith import (
                        _decode_arith_scan,
                    )

                    return _decode_arith_scan(
                        payload, pos + 2 + seg_len, width, height, comps,
                        qt, dac, restart_interval,
                    )
                return _decode_scan(
                    payload, pos + 2 + seg_len, width, height, comps, qt,
                    huff, restart_interval,
                )
            if coef is None:
                coef = _prog_alloc(width, height, comps)
            if arith:
                from sigraph_spark.operators.jpeg_prog_arith import (
                    _decode_prog_arith_scan,
                )

                pos = _decode_prog_arith_scan(
                    payload, pos + 2 + seg_len, seg, width, height,
                    comps, dac, restart_interval, coef,
                )
            else:
                pos = _decode_prog_scan(
                    payload, pos + 2 + seg_len, seg, width, height,
                    comps, huff, restart_interval, coef,
                )
            continue
        pos += 2 + seg_len
    if progressive and coef is not None:
        return _prog_reconstruct(width, height, comps, qt, coef)
    raise ValueError("JPEG missing SOS")


def _decode_scan(payload, pos, width, height, comps, qt, huff, restart_interval):
    if width <= 0 or height <= 0 or not comps:
        raise ValueError("JPEG missing SOF before SOS")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise ValueError("bad sampling factors")
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    planes = []
    for c in comps:
        if c["tq"] not in qt:
            raise ValueError("missing quant table")
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        )
    reader = _BitReader(payload, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.restart()
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, c in enumerate(comps):
                dc_tab = huff.get((0, c.get("td", 0)))
                ac_tab = huff.get((1, c.get("ta", 0)))
                if dc_tab is None or ac_tab is None:
                    raise ValueError("missing Huffman table")
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64)
                        t = reader.decode(dc_tab)
                        diff = _extend(reader.bits(t), t) if t else 0
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode(ac_tab)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(reader.bits(s), s)
                            k += 1
                        coeffs = np.zeros(64)
                        coeffs[ZIGZAG] = zz
                        block = (coeffs * q).reshape(8, 8)
                        px = _C.T @ block @ _C + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
    return _finish(planes, comps, width, height, hmax, vmax)


def _finish(planes, comps, width, height, hmax, vmax):
    """Upsample + color-convert decoded planes (shared by the baseline
    and progressive paths)."""
    out_planes = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if vmax % c["v"] or hmax % c["h"]:
            raise ValueError("non-integer sampling ratio")
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:height, :width])
    if len(comps) == 1:
        g = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return width, height, np.repeat(g[:, :, None], 3, axis=2).tobytes()
    if len(comps) != 3:
        raise ValueError("unsupported component count")
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return width, height, np.clip(np.round(rgb), 0, 255).astype(np.uint8).tobytes()


# ---------------------------------------------------------------------------
# progressive decode (SOF2, T.81 G.2) — multi-scan coefficient accumulation
# ---------------------------------------------------------------------------

def _prog_geometry(width, height, comps):
    """(hmax, vmax, mcux, mcuy, per-comp non-interleaved block grid)."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise ValueError("bad sampling factors")
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    grids = []
    for c in comps:
        cw = -(-width * c["h"] // hmax)
        ch = -(-height * c["v"] // vmax)
        grids.append((-(-ch // 8), -(-cw // 8)))  # (bh, bw)
    return hmax, vmax, mcux, mcuy, grids


def _prog_alloc(width, height, comps):
    """Per-component zigzag-order coefficient store, padded to the
    interleaved MCU grid so DC scans can address every MCU block."""
    if width <= 0 or height <= 0 or not comps:
        raise ValueError("JPEG missing SOF before SOS")
    hmax, vmax, mcux, mcuy, _ = _prog_geometry(width, height, comps)
    return [
        np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
        for c in comps
    ]


def _refine_nonzero(blk, k, reader, p1, m1):
    """Correction bit for a nonzero-history coefficient (G.2.2)."""
    if reader.bit():
        c = int(blk[k])
        if (c & p1) == 0:
            blk[k] = c + (p1 if c >= 0 else m1)


def _prog_block_dc(blk, reader, dc_tab, pred, ci, ah, al):
    if ah == 0:  # first scan: diff-coded point-transformed DC
        t = reader.decode(dc_tab)
        diff = _extend(reader.bits(t), t) if t else 0
        pred[ci] += diff
        blk[0] = pred[ci] << al
    else:  # refinement: one raw bit per block
        if reader.bit():
            blk[0] = int(blk[0]) | (1 << al)


def _prog_block_ac_first(blk, reader, ac_tab, ss, se, al, state):
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = reader.decode(ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r != 15:
                state["eobrun"] = (1 << r) - 1 + (reader.bits(r) if r else 0)
                break
            k += 16
            continue
        k += r
        if k > se:
            raise ValueError("AC index overflow in progressive scan")
        blk[k] = _extend(reader.bits(s), s) << al
        k += 1


def _prog_block_ac_refine(blk, reader, ac_tab, ss, se, al, state):
    p1, m1 = 1 << al, -(1 << al)
    if state["eobrun"] > 0:
        for k in range(ss, se + 1):
            if blk[k]:
                _refine_nonzero(blk, k, reader, p1, m1)
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = reader.decode(ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r != 15:
                state["eobrun"] = (1 << r) + (reader.bits(r) if r else 0)
                break
            val = 0  # ZRL: skip 16 zero-history coefficients
        elif s == 1:
            val = p1 if reader.bit() else m1
        else:
            raise ValueError("bad refinement symbol")
        while k <= se:
            if blk[k]:
                _refine_nonzero(blk, k, reader, p1, m1)
            else:
                if r == 0:
                    break
                r -= 1
            k += 1
        if val and k <= se:
            blk[k] = val
        k += 1
    if state["eobrun"] > 0:  # EOBn covers the rest of this block too
        while k <= se:
            if blk[k]:
                _refine_nonzero(blk, k, reader, p1, m1)
            k += 1
        state["eobrun"] -= 1


def _decode_prog_scan(payload, pos, seg, width, height, comps, huff,
                      restart_interval, coef):
    """One progressive SOS: consume its entropy data into ``coef`` and
    return the offset of the next marker."""
    ns = seg[0]
    scan = []
    for i in range(ns):
        cid, tabs = seg[1 + 2 * i], seg[2 + 2 * i]
        for ci, c in enumerate(comps):
            if c["id"] == cid:
                scan.append((ci, tabs >> 4, tabs & 0x0F))
                break
        else:
            raise ValueError("SOS references unknown component")
    ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
    ahal = seg[3 + 2 * ns]
    ah, al = ahal >> 4, ahal & 0x0F
    dc_scan = ss == 0
    if dc_scan and se != 0:
        raise ValueError("invalid progressive scan (DC band must be 0..0)")
    if not dc_scan and (ns != 1 or se < ss or se > 63):
        raise ValueError("invalid progressive AC scan")
    hmax, vmax, mcux, mcuy, grids = _prog_geometry(width, height, comps)
    reader = _BitReader(payload, pos)
    pred = [0] * len(comps)
    state = {"eobrun": 0}
    unit = 0  # MCU counter (interleaved) / block counter (single-comp)

    def maybe_restart():
        nonlocal pred
        if restart_interval and unit and unit % restart_interval == 0:
            reader.restart()
            pred = [0] * len(comps)
            state["eobrun"] = 0

    if dc_scan and ns > 1:  # interleaved DC scan over the MCU grid
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart()
                unit += 1
                for ci, td, _ta in scan:
                    c = comps[ci]
                    dc_tab = huff.get((0, td))
                    if dc_tab is None and ah == 0:
                        raise ValueError("missing Huffman table")
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blk = coef[ci][my * c["v"] + by, mx * c["h"] + bx]
                            _prog_block_dc(blk, reader, dc_tab, pred, ci, ah, al)
    else:  # single-component scan over the component's own block grid
        ci, td, ta = scan[0]
        bh, bw = grids[ci]
        tab = huff.get((0, td)) if dc_scan else huff.get((1, ta))
        if tab is None and not (dc_scan and ah > 0):
            raise ValueError("missing Huffman table")
        for by in range(bh):
            for bx in range(bw):
                maybe_restart()
                unit += 1
                blk = coef[ci][by, bx]
                if dc_scan:
                    _prog_block_dc(blk, reader, tab, pred, ci, ah, al)
                elif ah == 0:
                    _prog_block_ac_first(blk, reader, tab, ss, se, al, state)
                else:
                    _prog_block_ac_refine(blk, reader, tab, ss, se, al, state)
    # skip to the next real marker (stuffed FF00 and RSTn are data;
    # runs of FF are legal fill bytes — the marker id is the byte after
    # the LAST FF of the run, so also skip while payload[p+1] == 0xFF)
    p = reader.pos
    while p + 1 < len(payload):
        if (
            payload[p] == 0xFF
            and payload[p + 1] != 0x00
            and payload[p + 1] != 0xFF
            and not (0xD0 <= payload[p + 1] <= 0xD7)
        ):
            return p
        p += 1
    raise ValueError("progressive JPEG missing EOI")


def _prog_reconstruct(width, height, comps, qt, coef):
    """Dequantize + IDCT every accumulated block, then finish like the
    baseline path."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for ci, c in enumerate(comps):
        if c["tq"] not in qt:
            raise ValueError("missing quant table")
        q = qt[c["tq"]]
        nby, nbx, _ = coef[ci].shape
        plane = np.zeros((nby * 8, nbx * 8), dtype=np.float64)
        for by in range(nby):
            for bx in range(nbx):
                zz = coef[ci][by, bx].astype(np.float64)
                coeffs = np.zeros(64)
                coeffs[ZIGZAG] = zz
                block = (coeffs * q).reshape(8, 8)
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _C.T @ block @ _C + 128.0
                )
        planes.append(plane)
    return _finish(planes, comps, width, height, hmax, vmax)


# ---------------------------------------------------------------------------
# encoder (4:4:4, Annex-K tables) — exists to test the decoder
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)


def _encode_table(bits, values) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) from the canonical (bits, values) spec."""
    dec = _build_huffman(bits, values)
    return {sym: (code, length) for (length, code), sym in dec.items()}


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _scaled_q(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling, clamped to [1, 255]."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip(np.floor((base * s + 50) / 100), 1, 255)


def encode_jpeg(width: int, height: int, rgb: bytes, quality: int = 90) -> bytes:
    """Encode top-down RGB triples as a baseline 4:4:4 JFIF JPEG."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length != width*height*3")
    px = (
        np.frombuffer(rgb, dtype=np.uint8)
        .reshape(height, width, 3)
        .astype(np.float64)
    )
    r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
    planes = [
        0.299 * r + 0.587 * g + 0.114 * b,
        128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
        128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
    ]
    ql = _scaled_q(_QL, quality)
    qc = _scaled_q(_QC, quality)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, q in ((0, ql), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(q[i]) for i in ZIGZAG)
    out += b"\xff\xc0" + struct.pack(">H", 17) + bytes([8])
    out += struct.pack(">HH", height, width) + bytes([3])
    out += bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])
    for tc, th, (bits, vals) in (
        (0, 0, _DC_L), (1, 0, _AC_L), (0, 1, _DC_C), (1, 1, _AC_C)
    ):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">H", 12) + bytes([3])
    out += bytes([1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    dcl, acl = _encode_table(*_DC_L), _encode_table(*_AC_L)
    dcc, acc_ = _encode_table(*_DC_C), _encode_table(*_AC_C)
    w = _BitWriter()
    pred = [0, 0, 0]
    by_max = -(-height // 8)
    bx_max = -(-width // 8)
    for my in range(by_max):
        for mx in range(bx_max):
            for ci in range(3):
                plane = planes[ci]
                blk = np.full((8, 8), 128.0)
                ys = min(8, height - my * 8)
                xs = min(8, width - mx * 8)
                blk[:ys, :xs] = plane[
                    my * 8 : my * 8 + ys, mx * 8 : mx * 8 + xs
                ]
                # pad by edge replication (better than zeros for DC)
                blk[ys:, :xs] = blk[ys - 1, :xs]
                blk[:, xs:] = blk[:, xs - 1 : xs]
                coeffs = _C @ (blk - 128.0) @ _C.T
                q = ql if ci == 0 else qc
                quant = np.round(coeffs / q.reshape(8, 8)).astype(np.int64)
                zz = quant.reshape(-1)[ZIGZAG]
                dct, act = (dcl, acl) if ci == 0 else (dcc, acc_)
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                t = _category(diff)
                code, ln = dct[t]
                w.put(code, ln)
                if t:
                    w.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
                run = 0
                last_nz = 0
                for k in range(1, 64):
                    if zz[k]:
                        last_nz = k
                for k in range(1, last_nz + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = act[0xF0]
                        w.put(code, ln)
                        run -= 16
                    s = _category(v)
                    code, ln = act[(run << 4) | s]
                    w.put(code, ln)
                    w.put(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if last_nz < 63:
                    code, ln = act[0x00]
                    w.put(code, ln)
    w.flush()
    out += w.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (SOF2) — exists to test the progressive decoder.
# It re-encodes the SAME quantized coefficients the baseline encoder
# produces, so decode(progressive) must be bit-identical to
# decode(baseline) at the same quality (the exact oracle in
# tests/test_jpeg_progressive.py).
# ---------------------------------------------------------------------------

# Flat Huffman table covering every possible rs symbol: 255 symbols at
# 8 bits + one at 9 bits (the all-ones 8/9-bit codes stay unused, as the
# spec requires for the 1-padding). Annex K tables lack the EOBn symbols
# progressive scans need, and a fixed table keeps the encoder one-pass.
_FLAT_BITS = [0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0, 0]
_FLAT_VALS = list(range(256))


def _point(v: int, al: int) -> int:
    """AC point transform: truncation toward zero by 2^al (G.1.2.1)."""
    return -((-v) >> al) if v < 0 else v >> al


def _quantized_blocks(width, height, rgb, quality):
    """Per-component zigzag-order quantized coefficient grids, using
    the identical block math as :func:`encode_jpeg` (edge-replication
    padding, same rounding) — the bit-identity oracle depends on it."""
    px = (
        np.frombuffer(rgb, dtype=np.uint8)
        .reshape(height, width, 3)
        .astype(np.float64)
    )
    r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
    planes = [
        0.299 * r + 0.587 * g + 0.114 * b,
        128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
        128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
    ]
    ql = _scaled_q(_QL, quality)
    qc = _scaled_q(_QC, quality)
    by_max = -(-height // 8)
    bx_max = -(-width // 8)
    coefs = [np.zeros((by_max, bx_max, 64), dtype=np.int64) for _ in range(3)]
    for my in range(by_max):
        for mx in range(bx_max):
            for ci in range(3):
                plane = planes[ci]
                blk = np.full((8, 8), 128.0)
                ys = min(8, height - my * 8)
                xs = min(8, width - mx * 8)
                blk[:ys, :xs] = plane[
                    my * 8 : my * 8 + ys, mx * 8 : mx * 8 + xs
                ]
                blk[ys:, :xs] = blk[ys - 1, :xs]
                blk[:, xs:] = blk[:, xs - 1 : xs]
                coeffs = _C @ (blk - 128.0) @ _C.T
                q = ql if ci == 0 else qc
                quant = np.round(coeffs / q.reshape(8, 8)).astype(np.int64)
                coefs[ci][my, mx] = quant.reshape(-1)[ZIGZAG]
    return coefs, ql, qc, by_max, bx_max


def _emit_dc_first(w, coefs, tab, al, by_max, bx_max):
    pred = [0, 0, 0]
    for my in range(by_max):
        for mx in range(bx_max):
            for ci in range(3):
                tv = int(coefs[ci][my, mx, 0]) >> al  # DC: arithmetic shift
                diff = tv - pred[ci]
                pred[ci] = tv
                s = _category(diff)
                code, ln = tab[s]
                w.put(code, ln)
                if s:
                    w.put(diff if diff >= 0 else diff + (1 << s) - 1, s)


def _emit_dc_refine(w, coefs, al, by_max, bx_max):
    for my in range(by_max):
        for mx in range(bx_max):
            for ci in range(3):
                w.put((int(coefs[ci][my, mx, 0]) >> al) & 1, 1)


def _emit_ac_first(w, blocks, tab, ss, se, al):
    """AC first scan for one component's row-major blocks, with EOB-run
    accumulation (EOBn symbols)."""
    eobrun = 0

    def flush():
        nonlocal eobrun
        if eobrun:
            rr = eobrun.bit_length() - 1
            code, ln = tab[rr << 4]
            w.put(code, ln)
            if rr:
                w.put(eobrun - (1 << rr), rr)
            eobrun = 0

    for zz in blocks:
        t = [_point(int(zz[k]), al) for k in range(ss, se + 1)]
        last = -1
        for i, v in enumerate(t):
            if v:
                last = i
        if last < 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
            continue
        flush()
        run = 0
        for i in range(last + 1):
            v = t[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = tab[0xF0]
                w.put(code, ln)
                run -= 16
            s = _category(v)
            code, ln = tab[(run << 4) | s]
            w.put(code, ln)
            w.put(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if ss + last < se:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
    flush()


def _emit_ac_refine(w, blocks, tab, ss, se, al):
    """AC refinement scan (Ah = al+1 -> Al = al) — T.81 G.1.2.3.

    Newly-nonzero coefficients (|t| == 1) are coded as (run, 1) symbols
    + a sign bit, where run counts ZERO-HISTORY positions only; every
    nonzero-history coefficient passed contributes one correction bit.
    Bit placement must mirror the decoder's walk exactly: after each
    symbol the decoder consumes correction bits for the history
    coefficients its span covers — a ZRL span ends at its 16th
    zero-history position, so history bits are split across ZRL chunks
    by position, not emitted in bulk. Bits after the last newly-nonzero
    coefficient are deferred to the pending EOB run and consumed by the
    covered blocks' tail walks, in block order."""
    eobrun = 0
    br: list[int] = []  # bits the EOBn tail walks will consume, in order

    def emit_eobrun():
        nonlocal eobrun, br
        if eobrun > 0:
            rr = eobrun.bit_length() - 1
            code, ln = tab[rr << 4]
            w.put(code, ln)
            if rr:
                w.put(eobrun - (1 << rr), rr)
            eobrun = 0
            for bit in br:
                w.put(bit, 1)
            br = []

    for zz in blocks:
        t = [_point(int(zz[k]), al) for k in range(ss, se + 1)]
        absv = [abs(v) for v in t]
        lastn = -1
        for i, a in enumerate(absv):
            if a == 1:
                lastn = i
        if lastn < 0:  # no new nonzeros: whole block folds into the EOB run
            br.extend(a & 1 for a in absv if a > 1)
            eobrun += 1
            if eobrun == 0x7FFF:
                emit_eobrun()
            continue
        emit_eobrun()
        i = 0
        while i <= lastn:
            # span up to and including the next newly-nonzero coef
            zeros = 0
            hist: list[tuple[int, int]] = []  # (zero-history count before, bit)
            while absv[i] != 1:
                if absv[i] == 0:
                    zeros += 1
                else:
                    hist.append((zeros, absv[i] & 1))
                i += 1
            sign = 1 if t[i] > 0 else 0
            i += 1
            nzrl, rr = 0, zeros
            while rr > 15:
                nzrl += 1
                rr -= 16
            # symbol s consumes zero-history positions (16 per ZRL, rr+1
            # for the final (rr,1)); a history bit with z zeros before it
            # is read during symbol min(z // 16, nzrl)'s walk
            for s_idx in range(nzrl + 1):
                if s_idx < nzrl:
                    code, ln = tab[0xF0]
                    w.put(code, ln)
                else:
                    code, ln = tab[(rr << 4) | 1]
                    w.put(code, ln)
                    w.put(sign, 1)
                for z, bit in hist:
                    if min(z // 16, nzrl) == s_idx:
                        w.put(bit, 1)
        # trailing positions after the last newly-nonzero coefficient
        tail_bits = [absv[j] & 1 for j in range(lastn + 1, len(absv))
                     if absv[j] > 1]
        if lastn + 1 < len(absv):
            br.extend(tail_bits)
            eobrun += 1
            if eobrun == 0x7FFF:
                emit_eobrun()
    emit_eobrun()


def encode_jpeg_progressive(
    width: int, height: int, rgb: bytes, quality: int = 90
) -> bytes:
    """Encode top-down RGB triples as a progressive (SOF2) 4:4:4 JFIF
    JPEG. Scan script exercises every progressive decode path: an
    interleaved DC-first scan at Al=1, a DC refinement, per-component
    AC-first scans in two spectral bands at Al=1 (with EOB runs), and
    per-component AC refinement scans down to Al=0."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length != width*height*3")
    coefs, ql, qc, by_max, bx_max = _quantized_blocks(
        width, height, rgb, quality
    )
    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0" + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    for tq, q in ((0, ql), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(q[i]) for i in ZIGZAG)
    out += b"\xff\xc2" + struct.pack(">H", 17) + bytes([8])
    out += struct.pack(">HH", height, width) + bytes([3])
    out += bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])
    for tc in (0, 1):  # same flat table as DC id 0 and AC id 0
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(_FLAT_VALS))
        out += bytes([tc << 4]) + bytes(_FLAT_BITS) + bytes(_FLAT_VALS)
    tab = _encode_table(_FLAT_BITS, _FLAT_VALS)

    def sos(comp_ids, ss, se, ah, al, emit):
        hdr = bytes([len(comp_ids)])
        for cid in comp_ids:
            hdr += bytes([cid, 0x00])
        hdr += bytes([ss, se, (ah << 4) | al])
        nonlocal out
        out += b"\xff\xda" + struct.pack(">H", 2 + len(hdr)) + hdr
        w = _BitWriter()
        emit(w)
        w.flush()
        out += w.out

    def comp_blocks(ci):
        return [
            coefs[ci][my, mx]
            for my in range(by_max)
            for mx in range(bx_max)
        ]

    sos([1, 2, 3], 0, 0, 0, 1,
        lambda w: _emit_dc_first(w, coefs, tab, 1, by_max, bx_max))
    sos([1, 2, 3], 0, 0, 1, 0,
        lambda w: _emit_dc_refine(w, coefs, 0, by_max, bx_max))
    sos([1], 1, 5, 0, 1,
        lambda w: _emit_ac_first(w, comp_blocks(0), tab, 1, 5, 1))
    sos([1], 6, 63, 0, 1,
        lambda w: _emit_ac_first(w, comp_blocks(0), tab, 6, 63, 1))
    sos([2], 1, 63, 0, 1,
        lambda w: _emit_ac_first(w, comp_blocks(1), tab, 1, 63, 1))
    sos([3], 1, 63, 0, 1,
        lambda w: _emit_ac_first(w, comp_blocks(2), tab, 1, 63, 1))
    sos([1], 1, 63, 1, 0,
        lambda w: _emit_ac_refine(w, comp_blocks(0), tab, 1, 63, 0))
    sos([2], 1, 63, 1, 0,
        lambda w: _emit_ac_refine(w, comp_blocks(1), tab, 1, 63, 0))
    sos([3], 1, 63, 1, 0,
        lambda w: _emit_ac_refine(w, comp_blocks(2), tab, 1, 63, 0))
    out += b"\xff\xd9"
    return bytes(out)
