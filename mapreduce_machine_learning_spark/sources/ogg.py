"""Ogg container (RFC 3533) with the FLAC-in-Ogg mapping — pure Python.

Round 11's container seam. The Ogg page layer is fully structural:
fixed little-endian page headers, a segment lacing table (segments of
255 continue a packet, shorter ones end it, packets may span pages via
the continued-packet flag), and a CRC-32 whose generator polynomial
(0x04C11DB7, no reflection, zero init/xorout) the page spec names —
computed here from that polynomial, nothing memorized.

``decode_ogg`` reassembles the logical packet stream (verifying every
page CRC, so corruption quarantines instead of returning noise).
``decode_ogg_flac`` applies the published FLAC-to-Ogg mapping: the BOS
packet is ``0x7F "FLAC" major minor n_headers`` followed by the native
``fLaC`` signature + STREAMINFO, later header packets are native
metadata blocks, and every audio packet is one native FLAC frame — so
reconstruction is concatenation and the whole decode path (CRC-8/16,
MD5, predictors) is shared with ``sources/flac.py``.

Ogg streams that carry Vorbis or Opus are recognized by their first
packet and quarantine with a precise reason: those codecs' normative
constant tables (Vorbis floor/window setup, Opus SILK/CELT tables) are
not available in this container — the same honesty line drawn for MP3
in ``sources/flac.py``.

The encoder twin (``encode_ogg_flac``) wraps ``encode_flac_parts``
output into real pages — BOS page for the mapping packet, one audio
packet per page by default, a settable segments-per-page cap so tests
exercise packet-spanning-pages reassembly — making round trips
BIT-EXACT end to end: ``decode_ogg_flac(encode_ogg_flac(x))`` equals
``decode_flac_pcm(encode_flac(x))`` equals ``x``.

Scale note: container walking is cheap; the per-sample work lives in
the shared FLAC decoder and carries its scale note.
"""

from __future__ import annotations

import struct

import numpy as np

from mapreduce_machine_learning_spark.sources.flac import (
    decode_flac_pcm,
    encode_flac_parts,
)


def _crc32_table(poly: int) -> "np.ndarray":
    tab = np.zeros(256, dtype=np.uint64)
    for byte in range(256):
        reg = byte << 24
        for _ in range(8):
            reg = ((reg << 1) ^ poly) if reg & 0x80000000 else (reg << 1)
            reg &= 0xFFFFFFFF
        tab[byte] = reg
    return tab


_OGG_CRC_TAB = _crc32_table(0x04C11DB7)
# plain tuple for the per-byte loop — a numpy scalar fetch costs ~5x a
# tuple index (round 12; same fix as the FLAC CRC tables)
_OGG_CRC_LIST = tuple(int(v) for v in _OGG_CRC_TAB)


def _ogg_crc(data: bytes) -> int:
    reg = 0
    tab = _OGG_CRC_LIST
    for b in data:
        reg = ((reg << 8) & 0xFFFFFFFF) ^ tab[((reg >> 24) & 0xFF) ^ b]
    return reg


def is_ogg(payload: bytes) -> bool:
    return len(payload) > 27 and payload[:4] == b"OggS"


def decode_ogg(payload: bytes) -> list:
    """The logical packet stream of the FIRST bitstream serial in the
    file: every page CRC-verified, lacing rules applied (255-byte
    segments continue, packets span pages via the continued flag).
    Malformed pages raise ``NotImplementedError`` (callers quarantine)."""
    if not is_ogg(payload):
        raise NotImplementedError("not an Ogg payload")
    packets = []
    partial = bytearray()
    open_packet = False
    serial = None
    pos = 0
    while pos + 27 <= len(payload):
        if payload[pos : pos + 4] != b"OggS":
            raise NotImplementedError("Ogg page sync lost")
        version, htype = payload[pos + 4], payload[pos + 5]
        if version != 0:
            raise NotImplementedError(f"Ogg stream version {version}")
        page_serial = struct.unpack_from("<I", payload, pos + 14)[0]
        crc = struct.unpack_from("<I", payload, pos + 22)[0]
        nsegs = payload[pos + 26]
        table = payload[pos + 27 : pos + 27 + nsegs]
        if len(table) < nsegs:
            raise NotImplementedError("truncated Ogg segment table")
        body_len = sum(table)
        end = pos + 27 + nsegs + body_len
        if end > len(payload):
            raise NotImplementedError("truncated Ogg page body")
        page = bytearray(payload[pos:end])
        page[22:26] = b"\x00\x00\x00\x00"
        if _ogg_crc(bytes(page)) != crc:
            raise NotImplementedError("Ogg page CRC mismatch")
        if serial is None:
            serial = page_serial
        if page_serial == serial:
            if open_packet and not (htype & 0x01):
                raise NotImplementedError("Ogg packet continuity violated")
            if not open_packet and (htype & 0x01):
                raise NotImplementedError("Ogg continued packet without start")
            off = pos + 27 + nsegs
            for seg in table:
                partial += payload[off : off + seg]
                off += seg
                if seg < 255:
                    packets.append(bytes(partial))
                    partial = bytearray()
                    open_packet = False
                else:
                    open_packet = True
        pos = end
    if open_packet:
        raise NotImplementedError("Ogg stream ends mid-packet")
    if not packets:
        raise NotImplementedError("Ogg stream has no packets")
    return packets


def decode_ogg_flac(payload: bytes) -> tuple["np.ndarray", int, int]:
    """((n, channels) int64, rate, bps) from FLAC-in-Ogg — packets
    reassembled here, samples decoded by the shared native decoder.
    Vorbis/Opus payloads quarantine with the codec named."""
    packets = decode_ogg(payload)
    first = packets[0]
    if first[:7] == b"\x01vorbis":
        raise NotImplementedError(
            "Ogg-Vorbis needs the Vorbis codec (normative setup tables "
            "unavailable in-container); only FLAC-in-Ogg decodes"
        )
    if first[:8] == b"OpusHead":
        raise NotImplementedError(
            "Ogg-Opus needs the Opus codec (SILK/CELT tables unavailable "
            "in-container); only FLAC-in-Ogg decodes"
        )
    if len(first) < 13 or first[0] != 0x7F or first[1:5] != b"FLAC":
        raise NotImplementedError("Ogg stream is not FLAC-mapped")
    n_headers = struct.unpack_from(">H", first, 7)[0]
    native = bytearray(first[9:])  # "fLaC" + STREAMINFO block
    if native[:4] != b"fLaC":
        raise NotImplementedError("Ogg-FLAC BOS packet missing fLaC signature")
    if n_headers == 0:
        # mapping spec: header count 0 means "unknown", not "exactly
        # zero" — keep consuming packets that parse as one complete
        # metadata block (type 1-6, declared length matching the packet)
        # until the first audio frame (sync byte 0xFF can never collide:
        # its block-type field would read 0x7F, which is invalid)
        for pkt in packets[1:]:
            if (
                len(pkt) >= 4
                and 1 <= (pkt[0] & 0x7F) <= 6
                and int.from_bytes(pkt[1:4], "big") == len(pkt) - 4
            ):
                n_headers += 1
            else:
                break
    if n_headers + 1 > len(packets):
        raise NotImplementedError("Ogg-FLAC promises more header packets than exist")
    for pkt in packets[1 : 1 + n_headers]:
        if len(pkt) < 4:
            raise NotImplementedError("Ogg-FLAC header packet too short")
        native += pkt
    # the mapping keeps native block flags, but tolerate a stream whose
    # final header packet forgot the last-metadata flag
    native[4] &= 0x7F
    if n_headers == 0:
        native[4] |= 0x80
    else:
        last_off = len(native) - len(packets[n_headers])
        native[last_off] |= 0x80
    for pkt in packets[1 + n_headers :]:
        native += pkt
    return decode_flac_pcm(bytes(native))


def decode_ogg_audio(payload: bytes) -> tuple["np.ndarray", int]:
    """(int16 samples, rate) — the ``features_for`` contract, same depth
    normalization and channel-0 downmix as ``decode_flac``."""
    pcm, rate, bps = decode_ogg_flac(payload)
    mono = pcm[:, 0]
    if bps > 16:
        mono = mono >> (bps - 16)
    elif bps < 16:
        mono = mono << (16 - bps)
    return mono.astype(np.int16), rate


def _page(
    serial: int,
    seq: int,
    htype: int,
    granule: int,
    segments: list,
) -> bytes:
    header = (
        b"OggS"
        + bytes([0, htype])
        + struct.pack("<q", granule)
        + struct.pack("<III", serial, seq, 0)
        + bytes([len(segments)])
        + bytes(len(s) for s in segments)
    )
    body = b"".join(segments)
    crc = _ogg_crc(header + body)
    return header[:22] + struct.pack("<I", crc) + header[26:] + body


def encode_ogg_flac(
    samples: "np.ndarray",
    rate: int,
    bps: int = 16,
    block_size: int = 4096,
    max_segments_per_page: int = 255,
) -> bytes:
    """FLAC-in-Ogg from an int array: BOS page carries the mapping
    packet with an accurate header count of 1, a minimal VorbisComment
    header packet follows on its own page (the mapping spec makes that
    packet mandatory), then one audio frame per packet, paged under
    ``max_segments_per_page`` (lower it to force packets to span pages;
    decoders must reassemble)."""
    if not 1 <= max_segments_per_page <= 255:
        raise ValueError("max_segments_per_page must be in 1..255")
    header, frames = encode_flac_parts(samples, rate, bps, block_size)
    serial = 0x464C4143  # arbitrary but fixed: deterministic output
    # one mandatory VorbisComment header packet, last-metadata-flagged;
    # STREAMINFO in the BOS packet drops its last flag accordingly
    header = bytearray(header)
    header[4] &= 0x7F
    vendor = b"mrml-spark"
    vc_body = struct.pack("<I", len(vendor)) + vendor + struct.pack("<I", 0)
    vorbis_comment = bytes([0x84]) + len(vc_body).to_bytes(3, "big") + vc_body
    mapping = b"\x7fFLAC\x01\x00" + struct.pack(">H", 1) + bytes(header)
    pages = []
    seq = 0

    def lace(packet: bytes) -> list:
        segs = []
        for off in range(0, len(packet), 255):
            segs.append(packet[off : off + 255])
        if not segs or len(segs[-1]) == 255:
            segs.append(b"")  # terminating short segment
        return segs

    bos_segs = lace(mapping)
    if len(bos_segs) > 255:
        raise ValueError("Ogg-FLAC mapping packet too large for one page")
    pages.append(_page(serial, seq, 0x02, 0, bos_segs))
    seq += 1
    # header packets ride their own pages (granule 0) before any audio
    pages.append(_page(serial, seq, 0x00, 0, lace(vorbis_comment)))
    seq += 1

    # audio segment stream: each entry is (segment bytes, granule position
    # if this segment COMPLETES its packet else None)
    n = np.asarray(samples).shape[0]
    stream: list = []
    for fi, frame in enumerate(frames):
        granule = min((fi + 1) * block_size, n)
        fsegs = lace(frame)
        for si, seg in enumerate(fsegs):
            stream.append((seg, granule if si == len(fsegs) - 1 else None))
    # paginate: a page whose last segment is a 255-byte continuation hands
    # its packet to the next page (continued-packet flag); a page where no
    # packet completes carries granule -1 per the page spec
    i = 0
    continued = False
    while i < len(stream):
        chunk = stream[i : i + max_segments_per_page]
        i += len(chunk)
        completed = [g for _, g in chunk if g is not None]
        htype = (0x01 if continued else 0x00) | (
            0x04 if i == len(stream) else 0x00
        )
        granule = completed[-1] if completed else -1
        pages.append(
            _page(serial, seq, htype, granule, [s for s, _ in chunk])
        )
        seq += 1
        continued = chunk[-1][1] is None
    return b"".join(pages)
