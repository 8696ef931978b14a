"""Ogg container + FLAC-in-Ogg mapping tests.

Pinning strategy mirrors the other codec suites:

1. encoder round-trips — FLAC-in-Ogg is lossless end to end, so
   ``decode_ogg_flac(encode_ogg_flac(x))`` must equal both the input
   and the native ``decode_flac_pcm(encode_flac(x))`` BIT-EXACTLY,
   including when the segments-per-page cap forces packets to span
   page boundaries;
2. hand-assembled pages — an independent page builder in THIS file
   (with its own bitwise CRC-32 over the documented 0x04C11DB7
   polynomial) constructs multi-packet, multi-page, and continued-
   packet streams byte by byte from RFC 3533's layout, so the page
   walker is checked independently of the module's ``_page`` writer;
3. quarantine — CRC corruption, truncation, continuity violations,
   and the named Vorbis/Opus codec seams all raise
   ``NotImplementedError`` and degrade to ``fake_features``.
"""

import struct

import numpy as np
import pytest

from mapreduce_machine_learning_spark.sources.flac import (
    decode_flac_pcm,
    encode_flac,
    encode_flac_parts,
)
from mapreduce_machine_learning_spark.sources.multimodal import (
    fake_features,
    features_for,
    real_audio_features,
)
from mapreduce_machine_learning_spark.sources.ogg import (
    decode_ogg,
    decode_ogg_audio,
    decode_ogg_flac,
    encode_ogg_flac,
    is_ogg,
)


def _tone(n=30000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (np.sin(t / 30) * 12000 + rng.integers(-50, 50, n)).astype(np.int16)


# ---------------------------------------------------------------------------
# round trips


def test_roundtrip_matches_native_flac_bit_exactly():
    x = _tone()
    ogg_pcm, rate, bps = decode_ogg_flac(encode_ogg_flac(x, 44100))
    nat_pcm, nat_rate, nat_bps = decode_flac_pcm(encode_flac(x, 44100))
    assert (rate, bps) == (nat_rate, nat_bps) == (44100, 16)
    assert np.array_equal(ogg_pcm, nat_pcm)
    assert np.array_equal(ogg_pcm[:, 0], x.astype(np.int64))


@pytest.mark.parametrize("cap", [1, 2, 3, 255])
def test_roundtrip_survives_packets_spanning_pages(cap):
    # cap=1 puts every 255-byte lace segment on its own page: every
    # multi-segment packet spans pages and the continued flag is load-bearing
    x = _tone(12000, seed=cap)
    payload = encode_ogg_flac(x, 44100, max_segments_per_page=cap)
    pcm, rate, _ = decode_ogg_flac(payload)
    assert rate == 44100
    assert np.array_equal(pcm[:, 0], x.astype(np.int64))


def test_roundtrip_stereo_and_depths():
    t = np.arange(9000)
    left = (np.sin(t / 25) * 9000).astype(np.int64)
    right = left - (t % 37) + 18
    st = np.stack([left, right], axis=1)
    pcm, rate, _ = decode_ogg_flac(encode_ogg_flac(st, 48000))
    assert rate == 48000 and np.array_equal(pcm, st)
    pcm8, _, bps8 = decode_ogg_flac(encode_ogg_flac(left >> 8, 8000, bps=8))
    assert bps8 == 8 and np.array_equal(pcm8[:, 0], left >> 8)


def test_feature_contract_and_dispatch():
    x = _tone(5000, seed=7)
    payload = encode_ogg_flac(x, 24000)
    assert is_ogg(payload)
    mono, rate = decode_ogg_audio(payload)
    assert rate == 24000 and np.array_equal(mono, x)
    assert np.array_equal(
        features_for(payload), real_audio_features(x, 24000)
    )


# ---------------------------------------------------------------------------
# hand-assembled pages (independent page builder + bitwise CRC)


def _crc32_ref(data):
    reg = 0
    for byte in data:
        reg ^= byte << 24
        for _ in range(8):
            reg = (
                ((reg << 1) ^ 0x04C11DB7) & 0xFFFFFFFF
                if reg & 0x80000000
                else (reg << 1) & 0xFFFFFFFF
            )
    return reg


def _ref_page(serial, seq, htype, segments, granule=0):
    hdr = (
        b"OggS"
        + bytes([0, htype])
        + struct.pack("<q", granule)
        + struct.pack("<III", serial, seq, 0)
        + bytes([len(segments)])
        + bytes(len(s) for s in segments)
    )
    body = b"".join(segments)
    crc = _crc32_ref(hdr + body)
    return hdr[:22] + struct.pack("<I", crc) + hdr[26:] + body


def test_hand_assembled_lacing_multi_packet_and_cross_page():
    # packet A: 300 bytes → lacing [255, 45] inside one page;
    # packet B: exactly 255 bytes → [255] on page 1, 0-length terminator
    #   on page 2 (a packet spanning pages via the continued flag);
    # packet C: 100 bytes on page 2
    pkt_a = bytes((i * 7) % 256 for i in range(300))
    pkt_b = bytes((i * 13) % 256 for i in range(255))
    pkt_c = bytes((i * 29) % 256 for i in range(100))
    page1 = _ref_page(
        5, 0, 0x02, [pkt_a[:255], pkt_a[255:], pkt_b], granule=-1
    )
    page2 = _ref_page(5, 1, 0x05, [b"", pkt_c], granule=2)  # cont + EOS
    assert decode_ogg(page1 + page2) == [pkt_a, pkt_b, pkt_c]


def test_hand_assembled_other_serials_are_ignored():
    pkt = b"hello ogg"
    mine1 = _ref_page(5, 0, 0x02, [pkt])
    other = _ref_page(9, 0, 0x02, [b"other stream"])
    mine2 = _ref_page(5, 1, 0x04, [pkt[::-1]])
    assert decode_ogg(mine1 + other + mine2) == [pkt, pkt[::-1]]


def test_module_pages_verify_under_reference_crc():
    # the module's writer and this file's bitwise CRC agree
    x = _tone(2000, seed=3)
    payload = encode_ogg_flac(x, 44100)
    nsegs = payload[26]
    body_len = sum(payload[27 : 27 + nsegs])
    page0 = bytearray(payload[: 27 + nsegs + body_len])
    crc = struct.unpack_from("<I", page0, 22)[0]
    page0[22:26] = b"\x00\x00\x00\x00"
    assert _crc32_ref(bytes(page0)) == crc


# ---------------------------------------------------------------------------
# quarantine


def test_crc_corruption_quarantines():
    x = _tone(4000, seed=11)
    payload = bytearray(encode_ogg_flac(x, 44100))
    payload[-10] ^= 0x20
    with pytest.raises(NotImplementedError):
        decode_ogg_flac(bytes(payload))
    assert np.array_equal(
        features_for(bytes(payload)), fake_features(bytes(payload))
    )


def test_truncation_and_continuity_violations_quarantine():
    x = _tone(4000, seed=13)
    payload = encode_ogg_flac(x, 44100, max_segments_per_page=2)
    with pytest.raises(NotImplementedError):
        decode_ogg(payload[: len(payload) // 2 + 3])
    # a continued packet arriving without an open packet
    bad = _ref_page(5, 0, 0x02, [b"done"]) + _ref_page(5, 1, 0x01, [b"x"])
    with pytest.raises(NotImplementedError):
        decode_ogg(bad)
    # a stream that ends mid-packet
    open_end = _ref_page(5, 0, 0x02, [bytes(255)])
    with pytest.raises(NotImplementedError):
        decode_ogg(open_end)


def test_vorbis_and_opus_quarantine_with_named_codec():
    vorbis = _ref_page(5, 0, 0x02, [b"\x01vorbis" + bytes(23)])
    opus = _ref_page(5, 0, 0x02, [b"OpusHead" + bytes(11)])
    with pytest.raises(NotImplementedError, match="Vorbis"):
        decode_ogg_flac(vorbis)
    with pytest.raises(NotImplementedError, match="Opus"):
        decode_ogg_flac(opus)
    # and both flow to the stand-in through the pipeline entry point
    for p in (vorbis, opus):
        assert np.array_equal(features_for(p), fake_features(p))


def test_bos_packet_sanity_checks():
    # FLAC-mapped but lying header count
    x = _tone(1000, seed=17)
    header, frames = encode_flac_parts(x, 44100)
    mapping = b"\x7fFLAC\x01\x00" + struct.pack(">H", 9) + header
    segs = [frames[0][i : i + 255] for i in range(0, len(frames[0]), 255)]
    if len(segs[-1]) == 255:
        segs.append(b"")
    pages = _ref_page(5, 0, 0x02, [mapping]) + _ref_page(5, 1, 0x04, segs)
    with pytest.raises(NotImplementedError):
        decode_ogg_flac(pages)
    # not FLAC-mapped at all
    junk = _ref_page(5, 0, 0x06, [b"\x7fJUNKxxxxxxxxxx"])
    with pytest.raises(NotImplementedError):
        decode_ogg_flac(junk)


# ---------------------------------------------------------------------------
# ADVICE r11: header-count 0 means "unknown" per the mapping spec, and the
# encoder carries the mandatory VorbisComment header with an accurate count


def test_zero_header_count_means_unknown_not_exactly_zero():
    # a conformant stream may declare header count 0 ("unknown"); the
    # decoder must keep consuming packets that parse as metadata blocks
    # before switching to audio, instead of decoding them as frames
    x = _tone(2000, seed=7)
    header, frames = encode_flac_parts(x, 44100)
    header = bytearray(header)
    header[4] &= 0x7F  # STREAMINFO is not the last metadata block here
    mapping = b"\x7fFLAC\x01\x00" + struct.pack(">H", 0) + bytes(header)
    vendor = b"ref"
    vc_body = struct.pack("<I", len(vendor)) + vendor + struct.pack("<I", 0)
    vc = bytes([0x84]) + len(vc_body).to_bytes(3, "big") + vc_body
    pad = bytes([0x01]) + (6).to_bytes(3, "big") + b"\x00" * 6

    def lace(p):
        segs = [p[i : i + 255] for i in range(0, len(p), 255)]
        if not segs or len(segs[-1]) == 255:
            segs.append(b"")
        return segs

    audio_segs = []
    for f in frames:
        audio_segs += lace(f)
    pages = _ref_page(5, 0, 0x02, lace(mapping))
    pages += _ref_page(5, 1, 0x00, lace(pad) + lace(vc))
    pages += _ref_page(5, 2, 0x04, audio_segs, granule=len(x))
    pcm, rate, bps = decode_ogg_flac(pages)
    assert (rate, bps) == (44100, 16)
    assert np.array_equal(pcm[:, 0], x.astype(np.int64))


def test_encoder_emits_mandatory_vorbis_comment_with_accurate_count():
    x = _tone(1500, seed=11)
    payload = encode_ogg_flac(x, 44100)
    packets = decode_ogg(payload)
    # mapping packet declares exactly one following header packet ...
    assert struct.unpack_from(">H", packets[0], 7)[0] == 1
    # ... and STREAMINFO inside the BOS packet drops its last flag
    assert packets[0][13] & 0x80 == 0
    # the header packet is a well-formed, last-flagged VorbisComment
    vc = packets[1]
    assert vc[0] == 0x84
    assert int.from_bytes(vc[1:4], "big") == len(vc) - 4
    vlen = struct.unpack_from("<I", vc, 4)[0]
    assert vc[8 : 8 + vlen] == b"mrml-spark"
    assert struct.unpack_from("<I", vc, 8 + vlen)[0] == 0  # no user comments
    pcm, rate, bps = decode_ogg_flac(payload)
    assert (rate, bps) == (44100, 16)
    assert np.array_equal(pcm[:, 0], x.astype(np.int64))
