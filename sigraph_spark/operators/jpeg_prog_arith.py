"""Progressive ARITHMETIC-coded JPEG (SOF10) — the last JPEG coding
process seam: T.81 Annex G successive-approximation/spectral-selection
scans entropy-coded with the Annex D QM-coder, composing the two
engines this repo already ships (the SOF2 progressive scan machinery
in ``jpeg.py`` and the SOF9 QM-coder + DC/AC statistical models in
``jpeg_arith.py``).

What each scan kind codes (T.81 G.1.3, decode mirror G.2; the public
libjpeg arithmetic codecs implement the same structure):

* DC first scan (Ah=0): the sequential DC model (F.1.4.1) applied to
  point-transformed values (DC >> Al), per-component prediction and
  context conditioning via the DAC L/U bounds.
* DC refinement (Ah>0): ONE decision per block — the Al-th bit of the
  DC coefficient — coded with the fixed non-adaptive ~0.5 bin.
* AC first scans (Ah=0): the sequential AC model (F.1.4.3) restricted
  to the [Ss, Se] band with point transform Al; unlike Huffman
  progressive there are no EOBn run symbols — each block codes its own
  (cheap, adaptive) end-of-block decisions.
* AC refinement (Ah>0): per coefficient position k, an EOB decision
  (context 3*(k-1)) is coded only past kex — the last history-nonzero
  position; zero-history positions code a newly-nonzero decision at
  st+1 (sign via the fixed bin), history-nonzero positions code one
  correction bit at st+2.

Statistics areas are freshly initialized at every scan and at every
restart marker, matching the sequential-arithmetic discipline.

The encoder re-encodes the IDENTICAL quantized coefficients the
baseline Huffman encoder produces and the same scan script as
``encode_jpeg_progressive``, so ``decode_jpeg(encode_jpeg_progressive_
arithmetic(img)) == decode_jpeg(encode_jpeg(img))`` BIT-IDENTICALLY at
the same quality — the oracle in tests/test_jpeg_prog_arith.py.

Conformance status: same caveat as ``jpeg_arith.py`` — encoder<->
decoder consistency, refinement walks, restart resets and coefficient
bit-identity vs the Huffman paths are test-pinned, but the sandbox has
no arithmetic-capable external decoder, so cross-implementation
interop is UNVERIFIED here. The reference repo has no media layer;
this is training-pipeline scope (SURVEY.md "beyond the reference").
"""
from __future__ import annotations

import struct

__all__ = ["encode_jpeg_progressive_arithmetic"]


def _next_marker(payload: bytes, pos: int) -> int:
    """Offset of the next real marker after a scan's entropy data:
    stuffed FF00 is data, RSTn belong to the scan, FF runs are legal
    fill (the marker id is the byte after the LAST FF of the run)."""
    p = pos
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


def _scan_cond(dac: dict, td: int, ta: int) -> tuple[int, int, int]:
    """(L, U, Kx) for one scan component from the DAC dict; T.81
    defaults 0/1/5."""
    dc = dac.get((0, td), 0x10)
    ac = dac.get((1, ta), 5)
    lo, hi = dc & 0x0F, dc >> 4
    if lo > hi or hi > 15:
        raise ValueError("bad DC arithmetic conditioning bounds")
    if not 1 <= ac <= 63:
        raise ValueError("bad AC arithmetic conditioning Kx")
    return lo, hi, ac


def _decode_ac_refine_arith(dec, stats, fixed, blk, ss, se, al):
    """AC successive-approximation refinement (T.81 G.2): kex is the
    last history-nonzero position; EOB decisions only past it."""
    p1, m1 = 1 << al, -(1 << al)
    kex = ss - 1
    for k in range(se, ss - 1, -1):
        if blk[k]:
            kex = k
            break
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex and dec.decode(stats, st):
            return  # end-of-block
        while True:
            c = int(blk[k])
            if c:  # history-nonzero: one correction bit
                if dec.decode(stats, st + 2):
                    blk[k] = c + (m1 if c < 0 else p1)
                break
            if dec.decode(stats, st + 1):  # newly nonzero
                blk[k] = m1 if dec.decode(fixed, 0) else p1
                break
            st += 3
            k += 1
            if k > se:
                raise ValueError("AC refinement run past band end")
        k += 1


def _encode_ac_refine_arith(enc, stats, fixed, zz, ss, se, ah, al):
    """Encoder mirror of :func:`_decode_ac_refine_arith`, driven by
    the FULL-precision coefficients: history = |v| >> Ah nonzero,
    newly-nonzero = |v| >> Al == 1, correction bit = bit Al of |v|."""
    ke = ss - 1   # last nonzero at the current (Al) precision
    kex = ss - 1  # last nonzero at the previous (Ah) precision
    for k in range(se, ss - 1, -1):
        if abs(int(zz[k])) >> al:
            ke = k
            break
    for k in range(ke, ss - 1, -1):
        if abs(int(zz[k])) >> ah:
            kex = k
            break
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex:
            if k > ke:
                enc.encode(stats, st, 1)  # end-of-block
                return
            enc.encode(stats, st, 0)
        while True:
            a = abs(int(zz[k])) >> al
            if a >> (ah - al):  # history-nonzero: correction bit
                enc.encode(stats, st + 2, a & 1)
                break
            if a:  # newly nonzero at this precision (a == 1)
                enc.encode(stats, st + 1, 1)
                enc.encode(fixed, 0, 1 if int(zz[k]) < 0 else 0)
                break
            enc.encode(stats, st + 1, 0)
            st += 3
            k += 1
        k += 1


def _decode_prog_arith_scan(payload, pos, seg, width, height, comps, dac,
                            restart_interval, coef):
    """One progressive-arithmetic SOS: consume its entropy data into
    ``coef`` and return the offset of the next marker. Mirrors
    ``jpeg._decode_prog_scan``'s walk with the QM entropy layer."""
    from sigraph_spark.operators.jpeg import _prog_geometry
    from sigraph_spark.operators.jpeg_arith import (
        _AC_STAT_BINS,
        _DC_STAT_BINS,
        _FIXED_BIN,
        _ArithDecoder,
        _decode_ac,
        _decode_dc,
    )

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
    cond = [_scan_cond(dac, td, ta) for _ci, td, ta in scan]

    def fresh_state():
        dc_stats = {td: bytearray(_DC_STAT_BINS) for _ci, td, _ta in scan}
        ac_stats = {ta: bytearray(_AC_STAT_BINS) for _ci, _td, ta in scan}
        fixed = bytearray([_FIXED_BIN << 1])
        return dc_stats, ac_stats, fixed

    dec = _ArithDecoder(payload, pos)
    dc_stats, ac_stats, fixed = fresh_state()
    pred = [0] * len(comps)
    ctx = [0] * len(comps)
    unit = 0
    expected_rst = 0

    def maybe_restart():
        nonlocal dec, dc_stats, ac_stats, fixed, pred, ctx, expected_rst
        if restart_interval and unit and unit % restart_interval == 0:
            marker = dec.seek_marker()
            if marker != 0xD0 + expected_rst:
                raise ValueError("missing restart marker")
            expected_rst = (expected_rst + 1) & 7
            dec = _ArithDecoder(payload, dec.pos + 2)
            dc_stats, ac_stats, fixed = fresh_state()
            pred = [0] * len(comps)
            ctx = [0] * len(comps)

    def do_dc(blk, ci, si):
        lo, hi, _kx = cond[si]
        if ah == 0:
            diff, ctx[ci] = _decode_dc(
                dec, dc_stats[scan[si][1]], ctx[ci], lo, hi)
            pred[ci] += diff
            blk[0] = pred[ci] << al
        elif dec.decode(fixed, 0):
            blk[0] = int(blk[0]) | (1 << al)

    if dc_scan and ns > 1:  # interleaved DC scan over the MCU grid
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart()
                unit += 1
                for si, (ci, _td, _ta) in enumerate(scan):
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blk = coef[ci][my * c["v"] + by,
                                           mx * c["h"] + bx]
                            do_dc(blk, ci, si)
    else:  # single-component scan over the component's own block grid
        ci, td, ta = scan[0]
        bh, bw = grids[ci]
        _lo, _hi, kx = cond[0]
        for by in range(bh):
            for bx in range(bw):
                maybe_restart()
                unit += 1
                blk = coef[ci][by, bx]
                if dc_scan:
                    do_dc(blk, ci, 0)
                elif ah == 0:
                    _decode_ac(dec, ac_stats[ta], fixed, blk, kx, ss, se, al)
                else:
                    _decode_ac_refine_arith(
                        dec, ac_stats[ta], fixed, blk, ss, se, al)
    return _next_marker(payload, dec.pos)


def encode_jpeg_progressive_arithmetic(
    width: int,
    height: int,
    rgb: bytes,
    quality: int = 90,
    dc_lo: int = 0,
    dc_hi: int = 1,
    ac_kx: int = 5,
    restart_interval: int = 0,
) -> bytes:
    """Encode top-down RGB triples as a progressive ARITHMETIC-coded
    4:4:4 JFIF JPEG (SOF10 + DAC + QM-coded scans). Same scan script
    as :func:`jpeg.encode_jpeg_progressive` — interleaved DC first at
    Al=1, DC refinement, per-component AC first scans in two spectral
    bands at Al=1, per-component AC refinements down to Al=0 — over
    the IDENTICAL quantized coefficients as the baseline encoder, so
    all four codecs decode bit-identically at the same quality.
    ``restart_interval`` > 0 emits DRI + RSTn inside every scan with
    full coder/statistics resets."""
    from sigraph_spark.operators.jpeg import ZIGZAG, _quantized_blocks
    from sigraph_spark.operators.jpeg_arith import (
        _AC_STAT_BINS,
        _DC_STAT_BINS,
        _FIXED_BIN,
        _ArithEncoder,
        _encode_ac,
        _encode_dc,
    )

    if len(rgb) != width * height * 3:
        raise ValueError("rgb length != width*height*3")
    if not (0 <= dc_lo <= dc_hi <= 15 and 1 <= ac_kx <= 63):
        raise ValueError("bad arithmetic conditioning parameters")
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
    out += b"\xff\xca" + struct.pack(">H", 17) + bytes([8])
    out += struct.pack(">HH", height, width) + bytes([3])
    out += bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])
    dc_cond = (dc_hi << 4) | dc_lo
    out += b"\xff\xcc" + struct.pack(">H", 10)
    out += bytes([0x00, dc_cond, 0x01, dc_cond, 0x10, ac_kx, 0x11, ac_kx])
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">H", 4)
        out += struct.pack(">H", restart_interval)

    tbl_of = (0, 1, 1)  # component -> stats/conditioning table id

    def sos_header(comp_ids, ss, se, ah, al):
        nonlocal out
        hdr = bytes([len(comp_ids)])
        for cid in comp_ids:
            t = tbl_of[cid - 1]
            hdr += bytes([cid, (t << 4) | t])
        hdr += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(hdr)) + hdr

    class _ScanCoder:
        """Per-scan QM state with restart handling shared by every
        scan kind (fresh encoder + statistics per scan and per RSTn)."""

        def __init__(self):
            self.rst = 0
            self.unit = 0
            self._fresh()

        def _fresh(self):
            self.enc = _ArithEncoder()
            self.dc_stats = {0: bytearray(_DC_STAT_BINS),
                             1: bytearray(_DC_STAT_BINS)}
            self.ac_stats = {0: bytearray(_AC_STAT_BINS),
                             1: bytearray(_AC_STAT_BINS)}
            self.fixed = bytearray([_FIXED_BIN << 1])
            self.pred = [0, 0, 0]
            self.ctx = [0, 0, 0]

        def step(self):
            nonlocal out
            if restart_interval and self.unit and \
                    self.unit % restart_interval == 0:
                out += self.enc.flush()
                out += bytes([0xFF, 0xD0 + self.rst])
                self.rst = (self.rst + 1) & 7
                self._fresh()
            self.unit += 1

        def finish(self):
            nonlocal out
            out += self.enc.flush()

    def dc_first_scan(al):
        sos_header([1, 2, 3], 0, 0, 0, al)
        sc = _ScanCoder()
        for my in range(by_max):
            for mx in range(bx_max):
                sc.step()
                for ci in range(3):
                    tv = int(coefs[ci][my, mx, 0]) >> al
                    diff = tv - sc.pred[ci]
                    sc.pred[ci] = tv
                    sc.ctx[ci] = _encode_dc(
                        sc.enc, sc.dc_stats[tbl_of[ci]], sc.ctx[ci],
                        diff, dc_lo, dc_hi)
        sc.finish()

    def dc_refine_scan(al):
        sos_header([1, 2, 3], 0, 0, al + 1, al)
        sc = _ScanCoder()
        for my in range(by_max):
            for mx in range(bx_max):
                sc.step()
                for ci in range(3):
                    sc.enc.encode(
                        sc.fixed, 0, (int(coefs[ci][my, mx, 0]) >> al) & 1)
        sc.finish()

    def ac_scan(ci, ss, se, ah, al):
        sos_header([ci + 1], ss, se, ah, al)
        sc = _ScanCoder()
        for my in range(by_max):
            for mx in range(bx_max):
                sc.step()  # may reset the coder: re-read stats after it
                stats = sc.ac_stats[tbl_of[ci]]
                zz = coefs[ci][my, mx]
                if ah == 0:
                    _encode_ac(sc.enc, stats, sc.fixed, zz, ac_kx, ss, se, al)
                else:
                    _encode_ac_refine_arith(
                        sc.enc, stats, sc.fixed, zz, ss, se, ah, al)
        sc.finish()

    dc_first_scan(1)
    dc_refine_scan(0)
    ac_scan(0, 1, 5, 0, 1)
    ac_scan(0, 6, 63, 0, 1)
    ac_scan(1, 1, 63, 0, 1)
    ac_scan(2, 1, 63, 0, 1)
    ac_scan(0, 1, 63, 1, 0)
    ac_scan(1, 1, 63, 1, 0)
    ac_scan(2, 1, 63, 1, 0)
    out += b"\xff\xd9"
    return bytes(out)
