"""FLAC-in-Ogg: real encapsulation + sample decode (round 5).

Implements the xiph.org "FLAC-to-Ogg mapping" version 1.0 on top of the
pure-Python FLAC codec (``operators/flac.py``, RFC 9639) and RFC 3533
Ogg paging:

- first packet (its own BOS page): ``0x7F 'FLAC' <major> <minor>
  <u16be n-header-packets> 'fLaC' <STREAMINFO metadata block>``;
- each following header packet is one FLAC metadata block (we emit an
  optional VORBIS_COMMENT);
- each audio packet is exactly ONE FLAC frame; the page granule
  position is the index of the last sample of the last frame that
  COMPLETES on the page (header pages carry granule 0).

``decode_ogg_flac`` verifies every Ogg page CRC-32 (poly 0x04C11DB7),
reassembles packets across pages (255-lacing runs + the continuation
flag), validates the mapping magic/version, re-wraps the STREAMINFO +
frame packets as a native FLAC stream, and hands it to ``decode_flac``
— so the frame CRC-8/CRC-16 and STREAMINFO MD5 self-checks stay armed;
it also cross-checks the EOS granule position against the decoded
sample count. Any mismatch raises; it never returns wrong samples.

Scale shape: like the sibling codecs this runs inside ``mapInPandas``
batches (see ``_decode_audio_features`` in ``multimodal.py``); payload
bytes never leave the stage. Reference parity: hongsam14/sigraph has no
media plane — this extends the multimodal family SURVEY §2 adds for
training-data curation.
"""

from __future__ import annotations

import struct

from .flac import decode_flac, encode_flac

__all__ = ["encode_ogg_flac", "decode_ogg_flac", "ogg_flac_streaminfo"]

_MAPPING_MAGIC = b"\x7fFLAC"


def _ogg_crc(data: bytes) -> int:
    """Ogg CRC-32: poly 0x04C11DB7, no reflection, zero init/xorout
    (RFC 3533 §6; same polynomial as mediameta's skeleton builder)."""
    crc = 0
    for b in data:
        crc ^= b << 24
        for _ in range(8):
            crc = ((crc << 1) ^ 0x04C11DB7) if crc & 0x80000000 else crc << 1
            crc &= 0xFFFFFFFF
    return crc


def _page(serial: int, seq: int, granule: int, segments: list,
          header_type: int = 0) -> bytes:
    """One Ogg page from pre-laced segments: ``segments`` is a list of
    (chunk, continues) where ``continues`` marks a packet whose tail
    runs into the NEXT page (its final lacing value must then be 255 —
    enforced by the caller splitting on 255-byte boundaries)."""
    lace = []
    body = bytearray()
    for chunk, continues in segments:
        n = len(chunk)
        while n >= 255:
            lace.append(255)
            n -= 255
        if continues and n:
            raise ValueError("continued packet must cut on a 255 boundary")
        if n or not continues:
            lace.append(n)
        body += chunk
    if len(lace) > 255:
        raise ValueError("Ogg page overflow: >255 lacing values")
    hdr = b"OggS" + bytes([0, header_type])
    hdr += struct.pack("<q", granule)
    hdr += struct.pack("<II", serial, seq)
    hdr += b"\x00\x00\x00\x00"
    hdr += bytes([len(lace)]) + bytes(lace)
    page = bytearray(hdr + bytes(body))
    page[22:26] = struct.pack("<I", _ogg_crc(bytes(page)))
    return bytes(page)


def encode_ogg_flac(rate: int, samples, bits: int = 16,
                    block_size: int = 4096, partition_order: int = 0,
                    max_lpc_order: int = 8, serial: int = 0x46C1,
                    comments: list | None = None,
                    split_first_frame: bool = False) -> bytes:
    """Encode PCM into an Ogg-FLAC stream (mapping v1.0). ``comments``:
    optional (key, value) pairs emitted as a VORBIS_COMMENT header
    packet. ``split_first_frame`` forces the first audio frame to span
    TWO pages via the continuation flag — exercises cross-page packet
    reassembly in the decoder (tests/gate)."""
    frames: list = []
    native = encode_flac(rate, samples, bits=bits, block_size=block_size,
                         partition_order=partition_order,
                         max_lpc_order=max_lpc_order, _frames_out=frames)
    # native = 'fLaC' + one last-flagged STREAMINFO block + frames
    streaminfo_block = native[4:42]
    n_headers = 1 if comments is not None else 0
    first = (_MAPPING_MAGIC + bytes([1, 0]) + struct.pack(">H", n_headers)
             + b"fLaC" + streaminfo_block)
    out = _page(serial, 0, 0, [(first, False)], header_type=2)
    seq = 1
    if comments is not None:
        body = struct.pack("<I", 0)  # empty vendor string
        body += struct.pack("<I", len(comments))
        for k, v in comments:
            item = f"{k}={v}".encode()
            body += struct.pack("<I", len(item)) + item
        blk = bytes([0x84]) + struct.pack(">I", len(body))[1:] + body
        out += _page(serial, seq, 0, [(blk, False)])
        seq += 1
    done = 0
    for i, (frame, bsz) in enumerate(frames):
        done += bsz
        eos = 4 if i == len(frames) - 1 else 0
        if i == 0 and split_first_frame and len(frames) > 1:
            # tail must start at a 255-byte lacing boundary
            cut = max(255, (len(frame) // 2 // 255) * 255)
            if cut >= len(frame):
                cut = (len(frame) - 1) // 255 * 255
            if cut <= 0:
                out += _page(serial, seq, done, [(frame, False)],
                             header_type=eos)
                seq += 1
                continue
            # page with an incomplete packet: granule -1 per RFC 3533
            out += _page(serial, seq, -1, [(frame[:cut], True)])
            seq += 1
            out += _page(serial, seq, done, [(frame[cut:], False)],
                         header_type=1 | eos)
            seq += 1
        else:
            out += _page(serial, seq, done, [(frame, False)],
                         header_type=eos)
            seq += 1
    return out


def _walk_packets(payload: bytes):
    """Verify every page CRC and reassemble all packets. Returns
    ``(packets, last_granule)``; raises on structural damage."""
    pos = 0
    packets: list = []
    cur = bytearray()
    open_packet = False
    last_granule = 0
    while pos + 27 <= len(payload):
        if payload[pos:pos + 4] != b"OggS" or payload[pos + 4] != 0:
            raise ValueError("Ogg-FLAC: bad page capture")
        htype = payload[pos + 5]
        granule = struct.unpack_from("<q", payload, pos + 6)[0]
        nsegs = payload[pos + 26]
        lace = payload[pos + 27:pos + 27 + nsegs]
        if len(lace) < nsegs:
            raise ValueError("Ogg-FLAC: truncated lacing")
        body = pos + 27 + nsegs
        size = sum(lace)
        if body + size > len(payload):
            raise ValueError("Ogg-FLAC: truncated page body")
        stored = struct.unpack_from("<I", payload, pos + 22)[0]
        zeroed = bytearray(payload[pos:body + size])
        zeroed[22:26] = b"\x00\x00\x00\x00"
        if _ogg_crc(bytes(zeroed)) != stored:
            raise ValueError("Ogg-FLAC: page CRC mismatch")
        if open_packet != bool(htype & 1):
            raise ValueError("Ogg-FLAC: continuation flag inconsistent")
        p = body
        for lv in lace:
            cur += payload[p:p + lv]
            p += lv
            if lv < 255:
                packets.append(bytes(cur))
                cur = bytearray()
        open_packet = bool(lace) and lace[-1] == 255
        if granule >= 0:
            last_granule = granule
        pos = body + size
    if open_packet or cur:
        raise ValueError("Ogg-FLAC: unterminated packet at EOS")
    return packets, last_granule


def ogg_flac_streaminfo(payload: bytes) -> bytes:
    """Return the raw 34-byte STREAMINFO body from the mapping's first
    packet (for the metadata walk), validating magic + version."""
    packets, _ = _walk_packets(payload)
    if not packets:
        raise ValueError("Ogg-FLAC: no packets")
    first = packets[0]
    if first[:5] != _MAPPING_MAGIC:
        raise ValueError("Ogg-FLAC: bad mapping magic")
    if first[5] != 1:
        raise ValueError("Ogg-FLAC: unsupported mapping major version")
    if first[9:13] != b"fLaC":
        raise ValueError("Ogg-FLAC: missing native signature")
    if (first[13] & 0x7F) != 0 or len(first) < 13 + 4 + 34:
        raise ValueError("Ogg-FLAC: first block is not STREAMINFO")
    return first[17:17 + 34]


def decode_ogg_flac(payload: bytes, verify_md5: bool = True):
    """Decode an Ogg-FLAC stream -> ``(rate, channels, bits, samples)``
    exactly like ``decode_flac``, with the Ogg page CRCs, the mapping
    header, and the EOS granule position all verified."""
    packets, last_granule = _walk_packets(payload)
    if not packets:
        raise ValueError("Ogg-FLAC: no packets")
    first = packets[0]
    if first[:5] != _MAPPING_MAGIC or first[5] != 1:
        raise ValueError("Ogg-FLAC: bad mapping header")
    n_headers = struct.unpack(">H", first[7:9])[0]
    if first[9:13] != b"fLaC":
        raise ValueError("Ogg-FLAC: missing native signature")
    streaminfo_block = bytearray(first[13:])
    if len(streaminfo_block) < 4 + 34 or (streaminfo_block[0] & 0x7F) != 0:
        raise ValueError("Ogg-FLAC: first block is not STREAMINFO")
    streaminfo_block[0] |= 0x80  # force last-metadata flag on the rewrap
    audio = packets[1 + n_headers:]
    if len(packets) < 1 + n_headers:
        raise ValueError("Ogg-FLAC: missing declared header packets")
    native = b"fLaC" + bytes(streaminfo_block) + b"".join(audio)
    rate, channels, bits, samples = decode_flac(native,
                                                verify_md5=verify_md5)
    if last_granule and last_granule != samples.shape[0]:
        raise ValueError("Ogg-FLAC: EOS granule != decoded sample count")
    return rate, channels, bits, samples
