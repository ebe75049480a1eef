"""Arithmetic-coded sequential JPEG (SOF9) — the QM-coder entropy
option of ITU-T T.81 Annex D, with the DC/AC statistical models of
Annex F.1.4/F.2.4 — closing the former declared "arithmetic JPEG"
stub next to the baseline/progressive Huffman codecs in ``jpeg.py``.

What is shared and what is new
------------------------------
Everything outside the entropy coder is reused from ``jpeg.py``: the
encoder re-encodes the IDENTICAL quantized coefficients the baseline
Huffman encoder produces (``_quantized_blocks``), and the decoder
feeds decoded blocks through the same dequant/IDCT/upsample path
(``_finish``) — so ``decode_jpeg(encode_jpeg_arithmetic(img)) ==
decode_jpeg(encode_jpeg(img))`` BIT-IDENTICALLY at the same quality,
which is the exact oracle in tests/test_jpeg_arith.py (the same
scheme the progressive codec uses).

Conformance status — read this before trusting interop
-------------------------------------------------------
The probability-estimation state machine (``_QM``) and the DC/AC
conditioning models are transcribed from the public spec (T.81
Table D.3 / D.2; F.1.4.4); the register discipline (interval
subdivision, conditional MPS/LPS exchange, renormalization, carry
resolution, 0xFF byte stuffing, trailing-zero-dropping termination)
follows the Annex D flowcharts. Encoder<->decoder bit-consistency,
carry/stuffing stress, restart intervals, and coefficient
bit-identity vs the Huffman path are all test-pinned — but this
sandbox has NO arithmetic-capable third-party decoder and no sample
arithmetic JPEGs, so conformance against external codecs is
UNTESTED here; treat cross-implementation interop as unverified.
Progressive-arithmetic (SOF10) lives in ``jpeg_prog_arith.py``, built
on this module's QM coder and DC/AC models.

Reference parity: the reference repo has no media layer at all; this
module exists for the training-data pipeline's multimodal columns
(SURVEY.md "beyond the reference" scope).

Scale notes: entropy decisions are inherently sequential WITHIN one
image; at corpus scale parallelism comes from the mapInPandas stage
running one image per row across partitions (`media_features`), the
same shape as every other codec here.
"""
from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_jpeg_arithmetic"]

# --- T.81 Table D.3: Qe value and probability estimation state
# machine. Row = (Qe, NMPS, NLPS, SWITCH); index 113 is the
# non-adaptive ~0.5 bin used for AC sign decisions (F.1.4.3.1) — it
# transitions to itself so it never adapts.
_QM = (
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1),
    (0x5A1D, 113, 113, 0),  # 113: fixed ~0.5, non-adaptive (sign bin)
)

_FIXED_BIN = 113

# Statistics areas (T.81 F.1.4.4.1.3 / F.1.4.4.2): a bin is one byte,
# (state_index << 1) | MPS. DC: 5 context groups x 4 decision bins,
# then the shared X (magnitude-category) chain at 20 and the M
# (magnitude-bit) bins at X+14. AC: 3 bins per coefficient index k
# (end-of-block, zero/nonzero, magnitude>1), then two X chains — low
# spectrum (k <= Kx) at 189, high spectrum at 217 — each with M bins
# at +14.
_DC_STAT_BINS = 64
_AC_STAT_BINS = 256
_AC_XLOW = 189
_AC_XHIGH = 217


class _ArithEncoder:
    """QM arithmetic encoder (T.81 Annex D.1). Interval convention:
    the MPS owns the bottom subinterval [0, A-Qe) (base C unchanged)
    and the LPS the top [A-Qe, A) (C += A-Qe, A = Qe), swapped under
    conditional exchange when A-Qe < Qe so the larger subinterval
    always codes the MPS. Probability estimation state moves only on
    renormalization. Carry resolution walks the emitted bytes (a
    carry turns a run of 0xFF into 0x00 and increments the byte
    before it); 0xFF stuffing is applied at flush time, after every
    carry is resolved — byte-equivalent to the spec's stack scheme."""

    def __init__(self) -> None:
        self.a = 0x10000
        self.c = 0
        self.nbits = 0  # pending bits above the 16-bit fraction zone
        self.out = bytearray()

    def _emit(self, byte: int) -> None:
        if byte > 0xFF:  # carry from a C addition after a flush
            i = len(self.out) - 1
            while i >= 0 and self.out[i] == 0xFF:
                self.out[i] = 0x00
                i -= 1
            if i < 0:
                raise ValueError("arithmetic carry past stream start")
            self.out[i] += 1
        self.out.append(byte & 0xFF)

    def _renorm(self) -> None:
        while self.a < 0x8000:
            self.a <<= 1
            self.c <<= 1
            self.nbits += 1
            if self.nbits == 8:
                self._emit(self.c >> 16)
                self.c &= 0xFFFF
                self.nbits = 0

    def encode(self, stats: bytearray, i: int, bit: int) -> None:
        sv = stats[i]
        mps = sv & 1
        qe, nmps, nlps, sw = _QM[sv >> 1]
        amq = self.a - qe
        if bit == mps:
            if amq & 0x8000:  # no renorm -> no estimation update
                self.a = amq
                return
            if amq < qe:  # conditional exchange: MPS takes the top
                self.c += amq
                self.a = qe
            else:
                self.a = amq
            stats[i] = (nmps << 1) | mps
        else:
            if amq < qe:  # conditional exchange: LPS keeps the bottom
                self.a = amq
            else:
                self.c += amq
                self.a = qe
            if sw:
                mps = 1 - mps
            stats[i] = (nlps << 1) | mps
        self._renorm()

    def flush(self) -> bytes:
        """Terminate (T.81 D.1.8): pick the value in [C, C+A) whose
        low 16 bits clear, emit the pending window, then drop trailing
        zero bytes (the decoder zero-feeds past the data)."""
        t = (self.c + self.a - 1) & ~0xFFFF
        self.c = t if t >= self.c else t + 0x8000
        total = 16 + self.nbits
        pad = (-total) % 8
        v = self.c << pad
        chunks = (total + pad) // 8
        for shift in range(chunks - 1, -1, -1):
            b = v >> (8 * shift)
            if shift != chunks - 1:
                b &= 0xFF  # only the top chunk may carry into the stream
            self._emit(b)
        while self.out and self.out[-1] == 0x00:
            self.out.pop()
        stuffed = bytearray()
        for b in self.out:
            stuffed.append(b)
            if b == 0xFF:
                stuffed.append(0x00)
        return bytes(stuffed)


class _ArithDecoder:
    """QM arithmetic decoder mirroring :class:`_ArithEncoder`:
    maintains the offset of the coded value within the current
    interval; offset < A-Qe selects the bottom subinterval. Bytes are
    de-stuffed on the fly (0xFF 0x00 -> data 0xFF); the first
    non-stuffed marker ends the entropy segment and the decoder feeds
    zero bits from then on (matching the encoder's dropped trailing
    zeros)."""

    def __init__(self, payload: bytes, pos: int) -> None:
        self.payload = payload
        self.pos = pos
        self.ended = False
        self.a = 0x10000
        self.acc = 0
        self.nacc = 0
        self.off = (self._byte() << 8) | self._byte()

    def _byte(self) -> int:
        p, data = self.pos, self.payload
        if self.ended or p >= len(data):
            self.ended = True
            return 0
        b = data[p]
        if b != 0xFF:
            self.pos = p + 1
            return b
        if p + 1 < len(data) and data[p + 1] == 0x00:
            self.pos = p + 2  # stuffed data byte
            return 0xFF
        self.ended = True  # marker: leave pos AT the 0xFF
        return 0

    def _bit(self) -> int:
        if self.nacc == 0:
            self.acc = self._byte()
            self.nacc = 8
        self.nacc -= 1
        return (self.acc >> self.nacc) & 1

    def _renorm(self) -> None:
        while self.a < 0x8000:
            self.a <<= 1
            self.off = (self.off << 1) | self._bit()

    def decode(self, stats: bytearray, i: int) -> int:
        sv = stats[i]
        mps = sv & 1
        qe, nmps, nlps, sw = _QM[sv >> 1]
        amq = self.a - qe
        if self.off < amq:
            self.a = amq
            if amq & 0x8000:
                return mps
            if amq < qe:  # conditional exchange: bottom was the LPS
                bit = 1 - mps
                if sw:
                    mps = 1 - mps
                stats[i] = (nlps << 1) | mps
            else:
                bit = mps
                stats[i] = (nmps << 1) | mps
        else:
            self.off -= amq
            self.a = qe
            if amq < qe:  # conditional exchange: top was the MPS
                bit = mps
                stats[i] = (nmps << 1) | mps
            else:
                bit = 1 - mps
                if sw:
                    mps = 1 - mps
                stats[i] = (nlps << 1) | mps
        self._renorm()
        return bit

    def seek_marker(self) -> int:
        """Skip unconsumed entropy bytes up to the next marker and
        return its second byte (for RSTn handling at restarts)."""
        data, p = self.payload, self.pos
        while p + 1 < len(data):
            if data[p] == 0xFF and data[p + 1] != 0x00:
                self.pos = p
                return data[p + 1]
            p += 2 if data[p] == 0xFF else 1
        raise ValueError("arithmetic scan ran past end of stream")


# --- DC / AC statistical models (T.81 F.1.4.4, decode mirror F.2.4).
# The DC context classifies the PREVIOUS block's diff as zero / small
# / large (signed), selecting one of five 4-bin groups; L and U are
# the DAC-conditioning thresholds (defaults 0 and 1).


def _dc_context(m: int, sign: int, lo: int, hi: int) -> int:
    if m < (1 << lo) >> 1:
        return 0
    if m > (1 << hi) >> 1:
        return 12 + 4 * sign
    return 4 + 4 * sign


def _encode_dc(enc, stats, ctx, diff, lo, hi):
    st = ctx
    if diff == 0:
        enc.encode(stats, st, 0)
        return 0
    enc.encode(stats, st, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(stats, st + 1, sign)
    mag = -diff if sign else diff
    t = mag - 1
    if t == 0:
        enc.encode(stats, st + 2 + sign, 0)
        return _dc_context(0, sign, lo, hi)
    enc.encode(stats, st + 2 + sign, 1)
    c = t.bit_length() - 1
    if c > 14:
        raise ValueError("DC diff magnitude out of range")
    for j in range(c):
        enc.encode(stats, 20 + j, 1)
    enc.encode(stats, 20 + c, 0)
    for bitpos in range(c - 1, -1, -1):
        enc.encode(stats, 20 + c + 14, (t >> bitpos) & 1)
    return _dc_context(1 << c, sign, lo, hi)


def _decode_dc(dec, stats, ctx, lo, hi):
    st = ctx
    if dec.decode(stats, st) == 0:
        return 0, 0
    sign = dec.decode(stats, st + 1)
    m = 0
    if dec.decode(stats, st + 2 + sign):
        m = 1
        st2 = 20
        while dec.decode(stats, st2):
            m <<= 1
            st2 += 1
            if m == 0x8000:
                raise ValueError("DC magnitude chain overflow")
        t = m
        bits = m
        while bits > 1:
            bits >>= 1
            if dec.decode(stats, st2 + 14):
                t |= bits
    else:
        t = 0
    diff = t + 1
    return (-diff if sign else diff), _dc_context(m, sign, lo, hi)


def _encode_ac(enc, stats, fixed, zz, kx, ss=1, se=63, al=0):
    """Sequential AC model (F.1.4.3), generalized to a spectral band
    [ss, se] with point transform ``al`` so the progressive-arithmetic
    first scans (T.81 G.1.3.2) can reuse it verbatim; the sequential
    caller passes the defaults (1, 63, 0)."""
    from sigraph_spark.operators.jpeg import _point

    ke = ss - 1
    for k in range(se, ss - 1, -1):
        if _point(int(zz[k]), al):
            ke = k
            break
    k = ss
    while k <= ke:
        st = 3 * (k - 1)
        enc.encode(stats, st, 0)  # not end-of-block
        v = _point(int(zz[k]), al)
        while v == 0:
            enc.encode(stats, st + 1, 0)
            st += 3
            k += 1
            v = _point(int(zz[k]), al)
        enc.encode(stats, st + 1, 1)
        sign = 1 if v < 0 else 0
        enc.encode(fixed, 0, sign)
        mag = -v if sign else v
        t = mag - 1
        st += 2
        if t == 0:
            enc.encode(stats, st, 0)
        else:
            enc.encode(stats, st, 1)
            if t == 1:
                enc.encode(stats, st, 0)
                bits_at = st + 14
            else:
                enc.encode(stats, st, 1)
                c = t.bit_length() - 1
                if c > 14:
                    raise ValueError("AC magnitude out of range")
                st2 = _AC_XLOW if k <= kx else _AC_XHIGH
                for j in range(c - 1):
                    enc.encode(stats, st2 + j, 1)
                enc.encode(stats, st2 + c - 1, 0)
                bits_at = st2 + c - 1 + 14
                for bitpos in range(c - 1, -1, -1):
                    enc.encode(stats, bits_at, (t >> bitpos) & 1)
        k += 1
    if ke < se:
        enc.encode(stats, 3 * ke, 1)  # end-of-block at index ke+1


def _decode_ac(dec, stats, fixed, zz, kx, ss=1, se=63, al=0):
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if dec.decode(stats, st):
            return  # end-of-block
        while dec.decode(stats, st + 1) == 0:
            st += 3
            k += 1
            if k > se:
                raise ValueError("AC run past block end")
        sign = dec.decode(fixed, 0)
        st += 2
        m = dec.decode(stats, st)
        bits_at = st + 14
        if m and dec.decode(stats, st):
            m = 2
            st2 = _AC_XLOW if k <= kx else _AC_XHIGH
            while dec.decode(stats, st2):
                m <<= 1
                st2 += 1
                if m == 0x8000:
                    raise ValueError("AC magnitude chain overflow")
            bits_at = st2 + 14
        t = m
        bits = m
        while bits > 1:
            bits >>= 1
            if dec.decode(stats, bits_at):
                t |= bits
        v = (t + 1) << al
        zz[k] = -v if sign else v
        k += 1


def _cond_params(dac, comps):
    """Per-component (L, U, Kx) from the DAC conditioning dict
    {(tc, tb): value}; T.81 defaults L=0, U=1, Kx=5."""
    out = []
    for c in comps:
        dc = dac.get((0, c.get("td", 0)), 0x10)
        ac = dac.get((1, c.get("ta", 0)), 5)
        lo, hi = dc & 0x0F, dc >> 4
        if lo > hi or hi > 15:
            raise ValueError("bad DC arithmetic conditioning bounds")
        if not 1 <= ac <= 63:
            raise ValueError("bad AC arithmetic conditioning Kx")
        out.append((lo, hi, ac))
    return out


def _decode_arith_scan(payload, pos, width, height, comps, qt, dac,
                       restart_interval):
    """Sequential arithmetic scan (F.2.4) -> pixels via the shared
    dequant/IDCT path. Mirrors jpeg._decode_scan's MCU walk."""
    from sigraph_spark.operators.jpeg import ZIGZAG, _C, _finish

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
    cond = _cond_params(dac, comps)

    def fresh_state():
        dc_stats = {c.get("td", 0): bytearray(_DC_STAT_BINS) for c in comps}
        ac_stats = {c.get("ta", 0): bytearray(_AC_STAT_BINS) for c in comps}
        fixed = bytearray([_FIXED_BIN << 1])
        return dc_stats, ac_stats, fixed

    dec = _ArithDecoder(payload, pos)
    dc_stats, ac_stats, fixed = fresh_state()
    pred = [0] * len(comps)
    ctx = [0] * len(comps)
    mcu_count = 0
    expected_rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                marker = dec.seek_marker()
                if marker != 0xD0 + expected_rst:
                    raise ValueError("missing restart marker")
                expected_rst = (expected_rst + 1) & 7
                dec = _ArithDecoder(payload, dec.pos + 2)
                dc_stats, ac_stats, fixed = fresh_state()
                pred = [0] * len(comps)
                ctx = [0] * len(comps)
            mcu_count += 1
            for ci, c in enumerate(comps):
                lo, hi, kx = cond[ci]
                dstats = dc_stats[c.get("td", 0)]
                astats = ac_stats[c.get("ta", 0)]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64)
                        diff, ctx[ci] = _decode_dc(
                            dec, dstats, ctx[ci], lo, hi
                        )
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        _decode_ac(dec, astats, fixed, zz, kx)
                        coeffs = np.zeros(64)
                        coeffs[ZIGZAG] = zz
                        block = (coeffs * q).reshape(8, 8)
                        px = _C.T @ block @ _C + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
    return _finish(planes, comps, width, height, hmax, vmax)


def encode_jpeg_arithmetic(
    width: int,
    height: int,
    rgb: bytes,
    quality: int = 90,
    dc_lo: int = 0,
    dc_hi: int = 1,
    ac_kx: int = 5,
    restart_interval: int = 0,
) -> bytes:
    """Encode top-down RGB triples as a sequential ARITHMETIC-coded
    4:4:4 JFIF JPEG (SOF9 + DAC + QM-coded scan). Re-encodes the
    identical quantized coefficients as :func:`jpeg.encode_jpeg`, so
    decoding both at the same quality yields bit-identical pixels
    (the test oracle). ``dc_lo``/``dc_hi``/``ac_kx`` set the DAC
    conditioning (T.81 defaults 0/1/5); ``restart_interval`` > 0
    emits DRI + RSTn with full coder/statistics resets."""
    from sigraph_spark.operators.jpeg import ZIGZAG, _quantized_blocks

    if len(rgb) != width * height * 3:
        raise ValueError("rgb length != width*height*3")
    if not (0 <= dc_lo <= dc_hi <= 15 and 1 <= ac_kx <= 63):
        raise ValueError("bad arithmetic conditioning parameters")
    coefs, ql, qc, by_max, bx_max = _quantized_blocks(
        width, height, rgb, quality
    )
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16)
    out += b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, q in ((0, ql), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(q[i]) for i in ZIGZAG)
    out += b"\xff\xc9" + struct.pack(">H", 17) + bytes([8])
    out += struct.pack(">HH", height, width) + bytes([3])
    out += bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])
    # DAC: DC conditioning for tables 0 and 1, AC Kx for tables 0 and 1
    dc_cond = (dc_hi << 4) | dc_lo
    out += b"\xff\xcc" + struct.pack(">H", 10)
    out += bytes([0x00, dc_cond, 0x01, dc_cond, 0x10, ac_kx, 0x11, ac_kx])
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">H", 4)
        out += struct.pack(">H", restart_interval)
    out += b"\xff\xda" + struct.pack(">H", 12) + bytes([3])
    out += bytes([1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])

    def fresh():
        return (
            _ArithEncoder(),
            {0: bytearray(_DC_STAT_BINS), 1: bytearray(_DC_STAT_BINS)},
            {0: bytearray(_AC_STAT_BINS), 1: bytearray(_AC_STAT_BINS)},
            bytearray([_FIXED_BIN << 1]),
            [0, 0, 0],
            [0, 0, 0],
        )

    enc, dc_stats, ac_stats, fixed, pred, ctx = fresh()
    mcu_count = 0
    rst = 0
    for my in range(by_max):
        for mx in range(bx_max):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                out += enc.flush()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                enc, dc_stats, ac_stats, fixed, pred, ctx = fresh()
            mcu_count += 1
            for ci in range(3):
                tbl = 0 if ci == 0 else 1
                zz = coefs[ci][my, mx]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                ctx[ci] = _encode_dc(
                    enc, dc_stats[tbl], ctx[ci], diff, dc_lo, dc_hi
                )
                _encode_ac(enc, ac_stats[tbl], fixed, zz, ac_kx)
    out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out)
