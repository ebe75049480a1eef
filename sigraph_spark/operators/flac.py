"""Pure-Python FLAC codec: real sample DECODE + ENCODE (round 5).

Closes the declared FLAC sample-decode stub (``multimodal.py`` parses
FLAC/Ogg CONTAINERS since round 5; samples stayed stubbed). Implements
the free FLAC format per RFC 9639 / the xiph.org format spec:

- ``decode_flac``: STREAMINFO walk, frame sync + CRC-8 header / CRC-16
  frame checks, CONSTANT / VERBATIM / FIXED(0-4) / LPC subframes,
  Rice-coded residuals (both the 4-bit and 5-bit parameter methods,
  escape partitions, arbitrary partition orders), all stereo
  decorrelation modes (left/side, right/side, mid/side), wasted-bits
  tracking, and the STREAMINFO MD5 signature over the unencoded PCM
  (verified when present — a failed signature raises, it never returns
  silently-wrong samples).
- ``encode_flac``: fixed-blocksize streams; per block and channel the
  cheapest of CONSTANT / FIXED(0-4) / quantized-LPC (Levinson-Durbin,
  like libFLAC's default path) / VERBATIM, per-stereo-block the
  cheapest of independent / left-side / right-side / mid-side,
  per-partition best Rice parameter, wasted-bits extraction, real MD5.

Losslessness is structural, not numeric: the encoder's integer
predictors mirror the decoder's exactly, so ``decode(encode(pcm)) ==
pcm`` bit-for-bit for ANY input regardless of how good the LPC fit is
— the property the ``flac_roundtrip`` gate and tests/test_flac.py pin.

Scale shape: the codec runs inside ``mapInPandas`` batches next to the
JPEG codecs (see ``audio_features``); payload bytes never leave the
stage. Reference parity: hongsam14/sigraph has no media plane — this
extends the multimodal family SURVEY §2 adds for training-data
curation.
"""

from __future__ import annotations

import hashlib
import struct

__all__ = ["encode_flac", "decode_flac", "flac_pcm_md5"]

_SYNC = 0b11111111111110

# frame-header code tables (RFC 9639 §9.1)
_BLOCKSIZE_CODES = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5,
                    256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12,
                    8192: 13, 16384: 14, 32768: 15}
_RATE_CODES = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5,
               22050: 6, 24000: 7, 32000: 8, 44100: 9, 48000: 10,
               96000: 11}
_BPS_CODES = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}
_BPS_FROM_CODE = {v: k for k, v in _BPS_CODES.items()}
_RATE_FROM_CODE = {v: k for k, v in _RATE_CODES.items()}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, nbits: int) -> None:
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int) -> None:
        # q zero bits then a one bit
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.bytepos = pos
        self.bitpos = 0

    def read(self, nbits: int) -> int:
        v = 0
        data, bp, bit = self.data, self.bytepos, self.bitpos
        while nbits > 0:
            if bp >= len(data):
                raise ValueError("FLAC: truncated bitstream")
            avail = 8 - bit
            take = avail if avail < nbits else nbits
            cur = data[bp]
            v = (v << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            bit += take
            nbits -= take
            if bit == 8:
                bit = 0
                bp += 1
        self.bytepos, self.bitpos = bp, bit
        return v

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        if v >= (1 << (nbits - 1)):
            v -= 1 << nbits
        return v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bitpos:
            self.bitpos = 0
            self.bytepos += 1


def _utf8_code(n: int) -> bytes:
    """FLAC's UTF-8-style coded number (extended to 36 bits)."""
    if n < 0x80:
        return bytes([n])
    for k in range(2, 8):
        datab = 6 * (k - 1) + (7 - k if k < 7 else 0)
        if n < (1 << datab):
            out = bytearray()
            lead_data = 7 - k if k < 7 else 0
            lead = (0xFF << (8 - k)) & 0xFF
            lead |= (n >> (6 * (k - 1))) & ((1 << lead_data) - 1)
            out.append(lead)
            for j in range(k - 2, -1, -1):
                out.append(0x80 | ((n >> (6 * j)) & 0x3F))
            return bytes(out)
    raise ValueError("coded number out of range")


def _utf8_decode(data: bytes, pos: int) -> tuple[int, int]:
    b0 = data[pos]
    if b0 < 0x80:
        return b0, pos + 1
    k = 0
    while (b0 << k) & 0x80:
        k += 1
    if k < 2 or k > 7:
        raise ValueError("FLAC: bad coded number")
    n = b0 & ((1 << (7 - k)) - 1) if k < 7 else 0
    for j in range(1, k):
        b = data[pos + j]
        if b & 0xC0 != 0x80:
            raise ValueError("FLAC: bad coded-number continuation")
        n = (n << 6) | (b & 0x3F)
    return n, pos + k


# ---------------------------------------------------------------------------
# residual (Rice) coding — shared by FIXED and LPC subframes
# ---------------------------------------------------------------------------

def _zigzag(res):
    import numpy as np

    r = np.asarray(res, dtype=np.int64)
    return np.where(r >= 0, r << 1, ((-r) << 1) - 1)


def _best_rice_param(u, max_param: int) -> tuple[int, int]:
    """(param, bits) minimizing unary-quotient + remainder cost."""
    import numpy as np

    n = len(u)
    best_p, best_bits = 0, None
    total = int(np.sum(u))
    for p in range(max_param + 1):
        bits = n * (1 + p) + (total >> p) if p == 0 else n * (1 + p) + int(np.sum(u >> p))
        if best_bits is None or bits < best_bits:
            best_p, best_bits = p, bits
    return best_p, best_bits


def _write_residual(w: _BitWriter, res, blocksize: int, pred_order: int,
                    partition_order: int) -> None:
    import numpy as np

    u = _zigzag(res)
    w.write(0, 2)  # method 0: 4-bit Rice parameters
    w.write(partition_order, 4)
    nparts = 1 << partition_order
    psize = blocksize >> partition_order
    start = 0
    for part in range(nparts):
        cnt = psize - pred_order if part == 0 else psize
        pu = u[start:start + cnt]
        start += cnt
        maxbits = int(pu.max()).bit_length() if len(pu) and int(pu.max()) else 1
        p, rice_bits = _best_rice_param(pu, 14)
        raw_bits = 5 + cnt * maxbits
        if raw_bits < rice_bits:
            w.write(15, 4)  # escape
            w.write(maxbits, 5)
            for v in np.asarray(res, dtype=np.int64)[start - cnt:start]:
                w.write_signed(int(v), maxbits)
        else:
            w.write(p, 4)
            for uv in pu:
                uv = int(uv)
                w.write_unary(uv >> p)
                if p:
                    w.write(uv & ((1 << p) - 1), p)


def _residual_cost(res, blocksize: int, pred_order: int,
                   partition_order: int) -> int:
    u = _zigzag(res)
    bits = 2 + 4
    nparts = 1 << partition_order
    psize = blocksize >> partition_order
    start = 0
    for part in range(nparts):
        cnt = psize - pred_order if part == 0 else psize
        pu = u[start:start + cnt]
        start += cnt
        maxbits = int(pu.max()).bit_length() if len(pu) and int(pu.max()) else 1
        _, rice_bits = _best_rice_param(pu, 14)
        bits += 4 + min(rice_bits, 5 + cnt * maxbits)
    return bits


def _read_residual(r: _BitReader, blocksize: int, pred_order: int):
    import numpy as np

    method = r.read(2)
    if method > 1:
        raise ValueError("FLAC: reserved residual coding method")
    pbits, escape = (4, 15) if method == 0 else (5, 31)
    partition_order = r.read(4)
    nparts = 1 << partition_order
    if blocksize % nparts:
        raise ValueError("FLAC: blocksize not divisible by partition count")
    psize = blocksize >> partition_order
    out = np.empty(blocksize - pred_order, dtype=np.int64)
    idx = 0
    for part in range(nparts):
        cnt = psize - pred_order if part == 0 else psize
        if cnt < 0:
            raise ValueError("FLAC: partition order exceeds blocksize")
        p = r.read(pbits)
        if p == escape:
            nb = r.read(5)
            for i in range(cnt):
                out[idx + i] = r.read_signed(nb) if nb else 0
        else:
            for i in range(cnt):
                q = r.read_unary()
                u = (q << p) | (r.read(p) if p else 0)
                out[idx + i] = (u >> 1) ^ -(u & 1)
        idx += cnt
    return out


# ---------------------------------------------------------------------------
# predictors
# ---------------------------------------------------------------------------

def _fixed_residual(x, order: int):
    import numpy as np

    r = np.asarray(x, dtype=np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _fixed_restore(order: int, warmup, resid):
    import numpy as np

    w = np.asarray(warmup, dtype=np.int64)
    if order == 0:
        return np.asarray(resid, dtype=np.int64)
    seqs = [w]
    for _ in range(order - 1):
        seqs.append(np.diff(seqs[-1]))
    cur = np.asarray(resid, dtype=np.int64)
    for j in range(order - 1, -1, -1):
        cur = seqs[j][-1] + np.cumsum(cur)
    return np.concatenate([w, cur])


def _lpc_residual(x, coefs, shift: int):
    import numpy as np

    x = np.asarray(x, dtype=np.int64)
    order = len(coefs)
    c = np.asarray(coefs, dtype=np.int64)
    conv = np.convolve(x, c)
    pred = conv[order - 1: len(x) - 1] >> shift
    return x[order:] - pred


def _lpc_restore(warmup, coefs, shift: int, resid):
    import numpy as np

    order = len(coefs)
    n = order + len(resid)
    x = [0] * n
    x[:order] = [int(v) for v in warmup]
    cl = [int(c) for c in coefs]
    rl = [int(v) for v in resid]
    for i in range(order, n):
        s = 0
        for j in range(order):
            s += cl[j] * x[i - 1 - j]
        x[i] = rl[i - order] + (s >> shift)
    return np.asarray(x, dtype=np.int64)


def _quantize_lpc(x, max_order: int, precision: int = 12):
    """Levinson-Durbin + coefficient quantization (libFLAC's default
    path). Returns (order, coefs, shift) or None when the block is too
    short / degenerate. Any output is VALID — losslessness never
    depends on fit quality."""
    import numpy as np

    xf = np.asarray(x, dtype=np.float64)
    n = len(xf)
    if n <= max_order + 1:
        return None
    autoc = [float(np.dot(xf[: n - lag], xf[lag:])) for lag in range(max_order + 1)]
    if autoc[0] == 0.0:
        return None
    err = autoc[0]
    lpc = np.zeros(max_order)
    for i in range(max_order):
        acc = autoc[i + 1]
        for j in range(i):
            acc -= lpc[j] * autoc[i - j]
        k = acc / err
        lpc[i] = k
        for j in range(i // 2):
            t = lpc[j]
            lpc[j] = t - k * lpc[i - 1 - j]
            lpc[i - 1 - j] -= k * t
        if i % 2:
            lpc[i // 2] -= k * lpc[i // 2]
        err *= 1.0 - k * k
        if err <= 0:
            return None
    cmax = float(np.max(np.abs(lpc)))
    if cmax == 0.0 or not np.isfinite(cmax):
        return None
    # shift so the largest coefficient uses the full precision
    shift = precision - 1 - max(0, int(np.floor(np.log2(cmax))) + 1)
    shift = max(1, min(31, shift))
    q = np.round(lpc * (1 << shift)).astype(np.int64)
    lim = 1 << (precision - 1)
    q = np.clip(q, -lim, lim - 1)
    if not np.any(q):
        return None
    return max_order, q, shift


# ---------------------------------------------------------------------------
# subframes
# ---------------------------------------------------------------------------

def _encode_subframe(w: _BitWriter, x, bps: int, blocksize: int,
                     partition_order: int, max_lpc_order: int) -> None:
    import numpy as np

    x = np.asarray(x, dtype=np.int64)
    # wasted bits: shared low zero bits across the block
    wasted = 0
    if np.any(x):
        orv = int(np.bitwise_or.reduce(x))
        while wasted < bps - 1 and not (orv >> wasted) & 1:
            wasted += 1
        if wasted:
            x = x >> wasted
    eff_bps = bps - wasted

    def header(type_code: int) -> None:
        w.write(0, 1)
        w.write(type_code, 6)
        if wasted:
            w.write(1, 1)
            w.write_unary(wasted - 1)
        else:
            w.write(0, 1)

    if np.all(x == x[0]):
        header(0)  # CONSTANT
        w.write_signed(int(x[0]), eff_bps)
        return

    # candidate: best fixed order by exact residual cost
    porder = partition_order
    while porder > 0 and (blocksize % (1 << porder)
                          or (blocksize >> porder) <= 8):
        porder -= 1
    best = None  # (cost, kind, payload)
    for order in range(0, 5):
        if blocksize <= order:
            break
        res = _fixed_residual(x, order)
        cost = order * eff_bps + _residual_cost(res, blocksize, order, porder)
        if best is None or cost < best[0]:
            best = (cost, "fixed", (order, res))
    lpc_cap = min(max_lpc_order, blocksize - 2,
                  (blocksize >> porder) - 1 if porder else blocksize - 2)
    if max_lpc_order and lpc_cap >= 1:
        ql = _quantize_lpc(x, lpc_cap)
        if ql is not None:
            order, coefs, shift = ql
            res = _lpc_residual(x, coefs, shift)
            cost = (order * eff_bps + 4 + 5 + order * 12
                    + _residual_cost(res, blocksize, order, porder))
            if cost < best[0]:
                best = (cost, "lpc", (order, coefs, shift, res))
    verbatim_cost = blocksize * eff_bps
    if best[0] >= verbatim_cost:
        header(1)  # VERBATIM
        for v in x:
            w.write_signed(int(v), eff_bps)
        return
    if best[1] == "fixed":
        order, res = best[2]
        header(0b001000 | order)
        for v in x[:order]:
            w.write_signed(int(v), eff_bps)
        _write_residual(w, res, blocksize, order, porder)
    else:
        order, coefs, shift, res = best[2]
        header(0b100000 | (order - 1))
        for v in x[:order]:
            w.write_signed(int(v), eff_bps)
        w.write(12 - 1, 4)  # precision-1
        w.write(shift, 5)
        for c in coefs:
            w.write_signed(int(c), 12)
        _write_residual(w, res, blocksize, order, porder)


def _decode_subframe(r: _BitReader, blocksize: int, bps: int):
    import numpy as np

    if r.read(1):
        raise ValueError("FLAC: bad subframe padding bit")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
    eff_bps = bps - wasted
    if eff_bps <= 0:
        raise ValueError("FLAC: wasted bits exceed sample size")
    if stype == 0:  # CONSTANT
        v = r.read_signed(eff_bps)
        x = np.full(blocksize, v, dtype=np.int64)
    elif stype == 1:  # VERBATIM
        x = np.asarray([r.read_signed(eff_bps) for _ in range(blocksize)],
                       dtype=np.int64)
    elif 8 <= stype <= 12:  # FIXED
        order = stype - 8
        warm = [r.read_signed(eff_bps) for _ in range(order)]
        res = _read_residual(r, blocksize, order)
        x = _fixed_restore(order, warm, res)
    elif stype >= 32:  # LPC
        order = (stype & 31) + 1
        warm = [r.read_signed(eff_bps) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:
            raise ValueError("FLAC: invalid LPC precision")
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift")
        coefs = [r.read_signed(precision) for _ in range(order)]
        res = _read_residual(r, blocksize, order)
        x = _lpc_restore(warm, coefs, shift, res)
    else:
        raise ValueError(f"FLAC: reserved subframe type {stype}")
    return x << wasted if wasted else x


# ---------------------------------------------------------------------------
# streams
# ---------------------------------------------------------------------------

def flac_pcm_md5(samples, bits: int) -> bytes:
    """STREAMINFO MD5: interleaved signed little-endian PCM, sample
    size rounded up to whole bytes (RFC 9639 §8.2)."""
    import numpy as np

    x = np.asarray(samples, dtype=np.int64)
    flat = x.reshape(-1)
    nbytes = (bits + 7) // 8
    b = np.empty((len(flat), nbytes), dtype=np.uint8)
    for i in range(nbytes):
        b[:, i] = (flat >> (8 * i)) & 0xFF
    return hashlib.md5(b.tobytes()).digest()


def encode_flac(rate: int, samples, bits: int = 16, block_size: int = 4096,
                partition_order: int = 0, max_lpc_order: int = 8,
                _frames_out: list | None = None) -> bytes:
    """Encode PCM to a real FLAC stream. ``samples``: int array-like,
    shape (n,) for mono or (n, channels). Fixed-blocksize frames; the
    last frame may be short. Lossless for any input in
    [-2^(bits-1), 2^(bits-1)-1].

    ``_frames_out``: when a list is passed, one ``(frame_bytes,
    n_block_samples)`` tuple is appended per encoded frame — the
    FLAC-in-Ogg mapping needs frame-level packets (``oggflac.py``)."""
    import numpy as np

    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, channels = x.shape
    if not 1 <= channels <= 8:
        raise ValueError("FLAC: 1..8 channels")
    if bits not in _BPS_CODES:
        raise ValueError(f"FLAC: unsupported bits-per-sample {bits}")
    lim = 1 << (bits - 1)
    if np.any(x < -lim) or np.any(x >= lim):
        raise ValueError("FLAC: samples out of range for bits-per-sample")

    frames = bytearray()
    bs_code = _BLOCKSIZE_CODES.get(block_size, 7)
    rate_code = _RATE_CODES.get(rate)
    if rate_code is None:
        rate_code = 13 if rate < 65536 else 0
    bps_code = _BPS_CODES[bits]
    min_fs = max_fs = None

    frame_idx = 0
    for start in range(0, max(n, 1), block_size):
        blk = x[start:start + block_size]
        bsz = len(blk)
        if bsz == 0:
            break
        hdr = bytearray([0xFF, 0xF8])
        this_bs_code = _BLOCKSIZE_CODES.get(bsz, 7) if bsz != block_size else bs_code
        # choose stereo decorrelation for 2-channel blocks
        if channels == 2:
            L, R = blk[:, 0], blk[:, 1]
            mid, side = (L + R) >> 1, L - R

            def est(sig, b):
                res = _fixed_residual(sig, min(2, max(0, bsz - 1)))
                u = _zigzag(res)
                _, bits_ = _best_rice_param(u, 14)
                return bits_ + 2 * b

            costs = {
                0b0001: est(L, bits) + est(R, bits),
                0b1000: est(L, bits) + est(side, bits + 1),
                0b1001: est(side, bits + 1) + est(R, bits),
                0b1010: est(mid, bits) + est(side, bits + 1),
            }
            chan_assign = min(costs, key=costs.get)
            if chan_assign == 0b0001:
                subs = [(L, bits), (R, bits)]
            elif chan_assign == 0b1000:
                subs = [(L, bits), (side, bits + 1)]
            elif chan_assign == 0b1001:
                subs = [(side, bits + 1), (R, bits)]
            else:
                subs = [(mid, bits), (side, bits + 1)]
        else:
            chan_assign = channels - 1
            subs = [(blk[:, c], bits) for c in range(channels)]

        hdr.append((this_bs_code << 4) | rate_code)
        hdr.append((chan_assign << 4) | (bps_code << 1))
        hdr += _utf8_code(frame_idx)
        if this_bs_code == 6:
            hdr.append(bsz - 1)
        elif this_bs_code == 7:
            hdr += struct.pack(">H", bsz - 1)
        if rate_code == 12:
            hdr.append(rate // 1000)
        elif rate_code == 13:
            hdr += struct.pack(">H", rate)
        elif rate_code == 14:
            hdr += struct.pack(">H", rate // 10)
        hdr.append(_crc8(bytes(hdr)))

        w = _BitWriter()
        for sig, b in subs:
            _encode_subframe(w, sig, b, bsz, partition_order, max_lpc_order)
        w.align()
        frame = bytes(hdr) + w.bytes()
        frame += struct.pack(">H", _crc16(frame))
        frames += frame
        if _frames_out is not None:
            _frames_out.append((frame, bsz))
        fs = len(frame)
        min_fs = fs if min_fs is None or fs < min_fs else min_fs
        max_fs = fs if max_fs is None or fs > max_fs else max_fs
        frame_idx += 1

    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(min_fs or 0, 24)
    si.write(max_fs or 0, 24)
    si.write(rate, 20)
    si.write(channels - 1, 3)
    si.write(bits - 1, 5)
    si.write(n, 36)
    streaminfo = si.bytes() + flac_pcm_md5(x, bits)
    header = b"fLaC" + bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:]
    return header + streaminfo + bytes(frames)


def decode_flac(payload: bytes, verify_md5: bool = True):
    """Decode a FLAC stream -> ``(rate, channels, bits, samples)`` with
    ``samples`` an int64 ndarray of shape (n, channels). Verifies frame
    CRC-8/CRC-16 and (when the STREAMINFO signature is set) the PCM
    MD5; raises ValueError on any mismatch rather than returning wrong
    samples."""
    import numpy as np

    if payload[:4] != b"fLaC":
        raise ValueError("FLAC: bad magic")
    pos = 4
    si = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("FLAC: truncated metadata")
        h = payload[pos]
        last, btype = h & 0x80, h & 0x7F
        blen = int.from_bytes(payload[pos + 1:pos + 4], "big")
        body = payload[pos + 4:pos + 4 + blen]
        if btype == 0:
            if blen != 34:
                raise ValueError("FLAC: bad STREAMINFO length")
            si = body
        pos += 4 + blen
        if last:
            break
    if si is None:
        raise ValueError("FLAC: missing STREAMINFO")
    r0 = _BitReader(si)
    r0.read(16); r0.read(16); r0.read(24); r0.read(24)
    rate = r0.read(20)
    channels = r0.read(3) + 1
    bits = r0.read(5) + 1
    total = r0.read(36)
    md5_sig = si[18:34]

    chunks = []
    got = 0
    while pos < len(payload):
        if payload[pos] != 0xFF or (payload[pos + 1] >> 1) != 0x7C:
            raise ValueError("FLAC: lost frame sync")
        variable = payload[pos + 1] & 1
        b2, b3 = payload[pos + 2], payload[pos + 3]
        bs_code, rate_code = b2 >> 4, b2 & 0xF
        chan_assign, bps_code = b3 >> 4, (b3 >> 1) & 7
        if b3 & 1:
            raise ValueError("FLAC: reserved frame-header bit set")
        _, p = _utf8_decode(payload, pos + 4)
        if bs_code == 0:
            raise ValueError("FLAC: reserved blocksize code")
        if bs_code == 1:
            bsz = 192
        elif bs_code <= 5:
            bsz = 576 << (bs_code - 2)
        elif bs_code == 6:
            bsz = payload[p] + 1
            p += 1
        elif bs_code == 7:
            bsz = struct.unpack(">H", payload[p:p + 2])[0] + 1
            p += 2
        else:
            bsz = 256 << (bs_code - 8)
        if rate_code == 12:
            p += 1
        elif rate_code in (13, 14):
            p += 2
        elif rate_code == 15:
            raise ValueError("FLAC: invalid sample-rate code")
        if _crc8(payload[pos:p]) != payload[p]:
            raise ValueError("FLAC: frame header CRC-8 mismatch")
        p += 1
        fbits = _BPS_FROM_CODE.get(bps_code, bits) if bps_code else bits

        r = _BitReader(payload, p)
        if chan_assign <= 7:
            nch = chan_assign + 1
            cols = [_decode_subframe(r, bsz, fbits) for _ in range(nch)]
            blk = np.stack(cols, axis=1)
        elif chan_assign in (8, 9, 10):
            nch = 2
            b0 = fbits + (1 if chan_assign == 9 else 0)
            b1 = fbits + (1 if chan_assign in (8, 10) else 0)
            c0 = _decode_subframe(r, bsz, b0)
            c1 = _decode_subframe(r, bsz, b1)
            if chan_assign == 8:      # left/side
                L, R = c0, c0 - c1
            elif chan_assign == 9:    # right/side
                L, R = c0 + c1, c1
            else:                      # mid/side
                m = (c0 << 1) | (c1 & 1)
                L, R = (m + c1) >> 1, (m - c1) >> 1
            blk = np.stack([L, R], axis=1)
        else:
            raise ValueError("FLAC: reserved channel assignment")
        if nch != channels:
            raise ValueError("FLAC: frame channel count != STREAMINFO")
        r.align()
        fend = r.bytepos
        crc = struct.unpack(">H", payload[fend:fend + 2])[0]
        if _crc16(payload[pos:fend]) != crc:
            raise ValueError("FLAC: frame CRC-16 mismatch")
        pos = fend + 2
        chunks.append(blk)
        got += bsz
        if total and got >= total:
            break

    samples = (np.concatenate(chunks, axis=0) if chunks
               else np.empty((0, channels), dtype=np.int64))
    if total:
        samples = samples[:total]
    if verify_md5 and md5_sig != b"\x00" * 16:
        if flac_pcm_md5(samples, bits) != md5_sig:
            raise ValueError("FLAC: PCM MD5 signature mismatch")
    return rate, channels, bits, samples
