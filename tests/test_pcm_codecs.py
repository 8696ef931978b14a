"""Speech-corpus container tests (AIFF/AIFC, Sun AU, NIST SPHERE, G.711).

Pinning strategy mirrors the other codec suites:

1. encoder round-trips — 16-bit PCM payloads come back BIT-EXACTLY in
   every container; G.711 paths come back value-exactly over the
   companded domain (decode∘encode is idempotent);
2. published anchor values — the G.711 expansion is formula-derived, so
   the tests pin it to the independently published table facts (µ-law
   peak ±32124 with a true zero at code 0xFF, A-law peak ±32256 with no
   zero and ±8 at codes 0xD5/0x55, byte-level involution for all codes
   except µ-law's duplicated ±0 pair) — a slip anywhere in the
   sign/segment/mantissa arithmetic breaks at least one anchor;
3. hand-assembled headers — AIFF/AU/SPHERE payloads are built with raw
   ``struct``/text in THIS file (including the 80-bit extended-float
   sample rate), so the parsers are checked independently of the
   encoders under test;
4. quarantine — truncated/malformed/unsupported-coding payloads raise
   ``NotImplementedError`` and degrade to ``fake_features``.
"""

import struct

import numpy as np
import pytest

from mapreduce_machine_learning_spark.sources.multimodal import (
    fake_features,
    features_for,
    real_audio_features,
)
from mapreduce_machine_learning_spark.sources.pcm_codecs import (
    _ALAW2LIN,
    _ULAW2LIN,
    alaw_decode,
    alaw_encode,
    decode_aiff,
    decode_au,
    decode_sphere,
    encode_aiff,
    encode_au,
    encode_sphere,
    is_aiff,
    is_au,
    is_sphere,
    ulaw_decode,
    ulaw_encode,
)


def _tone(n=5000, scale=11000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (
        np.sin(t / 14) * scale + rng.integers(-200, 200, n)
    ).astype(np.int16)


# ---------------------------------------------------------------------------
# G.711 anchors + involution


def test_g711_published_anchor_values():
    # µ-law: true zero at 0xFF (and its ± twin 0x7F), peak ±32124
    assert _ULAW2LIN[0xFF] == 0 and _ULAW2LIN[0x7F] == 0
    assert _ULAW2LIN[0x00] == -32124 and _ULAW2LIN[0x80] == 32124
    assert int(np.abs(_ULAW2LIN.astype(np.int32)).max()) == 32124
    # A-law: no zero, ±8 at 0xD5/0x55, peak ±32256
    assert _ALAW2LIN[0xD5] == 8 and _ALAW2LIN[0x55] == -8
    assert int(np.abs(_ALAW2LIN.astype(np.int32)).min()) == 8
    assert int(np.abs(_ALAW2LIN.astype(np.int32)).max()) == 32256
    # sign symmetry: flipping the code sign bit negates the value
    codes = np.arange(256, dtype=np.uint8)
    assert np.array_equal(
        _ULAW2LIN[codes].astype(np.int32),
        -_ULAW2LIN[codes ^ 0x80].astype(np.int32),
    )
    assert np.array_equal(
        _ALAW2LIN[codes].astype(np.int32),
        -_ALAW2LIN[codes ^ 0x80].astype(np.int32),
    )


def test_g711_byte_involution_and_idempotence():
    codes = np.arange(256, dtype=np.uint8)
    # A-law: all 256 codes survive decode→encode byte-exactly
    assert np.array_equal(alaw_encode(alaw_decode(codes)), codes)
    # µ-law: everything except the duplicated ±0 pair
    back = ulaw_encode(ulaw_decode(codes))
    mismatch = np.flatnonzero(back != codes)
    assert set(mismatch.tolist()) <= {0x7F, 0xFF}
    assert all(_ULAW2LIN[c] == 0 for c in mismatch)
    # companding is idempotent on arbitrary linear input
    x = np.linspace(-32768, 32767, 4001).astype(np.int16)
    once_u = ulaw_decode(ulaw_encode(x))
    once_a = alaw_decode(alaw_encode(x))
    assert np.array_equal(ulaw_decode(ulaw_encode(once_u)), once_u)
    assert np.array_equal(alaw_decode(alaw_encode(once_a)), once_a)
    # and quantization error is bounded by the coarsest segment step
    assert int(np.abs(once_u.astype(np.int32) - x.astype(np.int32)).max()) < 1024
    assert int(np.abs(once_a.astype(np.int32) - x.astype(np.int32)).max()) < 1024


# ---------------------------------------------------------------------------
# container round trips


def test_aiff_pcm_roundtrip_bit_exact():
    x = _tone()
    payload = encode_aiff(x, 16000)
    assert is_aiff(payload)
    s, rate = decode_aiff(payload)
    assert rate == 16000 and np.array_equal(s, x)


@pytest.mark.parametrize("rate", [8000, 11025, 22050, 44100, 96000, 7, 192000])
def test_aiff_extended_float_rate_survives(rate):
    s, r = decode_aiff(encode_aiff(_tone(64), rate))
    assert r == rate


@pytest.mark.parametrize("comp", [b"ulaw", b"alaw"])
def test_aifc_g711_roundtrip_value_exact(comp):
    x = _tone(seed=3)
    dec = ulaw_decode if comp == b"ulaw" else alaw_decode
    enc = ulaw_encode if comp == b"ulaw" else alaw_encode
    s, rate = decode_aiff(encode_aiff(x, 8000, compression=comp))
    assert rate == 8000 and np.array_equal(s, dec(enc(x)))


@pytest.mark.parametrize("enc,exact", [(3, True), (1, False), (27, False)])
def test_au_roundtrips(enc, exact):
    x = _tone(seed=enc)
    payload = encode_au(x, 8000, encoding=enc)
    assert is_au(payload)
    s, rate = decode_au(payload)
    assert rate == 8000
    if exact:
        assert np.array_equal(s, x)
    else:
        table = ulaw_decode if enc == 1 else alaw_decode
        coder = ulaw_encode if enc == 1 else alaw_encode
        assert np.array_equal(s, table(coder(x)))


@pytest.mark.parametrize("coding", ["pcm", "ulaw"])
def test_sphere_roundtrips(coding):
    x = _tone(seed=9)
    payload = encode_sphere(x, 16000, coding=coding)
    assert is_sphere(payload)
    s, rate = decode_sphere(payload)
    assert rate == 16000
    if coding == "pcm":
        assert np.array_equal(s, x)
    else:
        assert np.array_equal(s, ulaw_decode(ulaw_encode(x)))


# ---------------------------------------------------------------------------
# hand-assembled headers, independent of the encoders


def test_hand_assembled_aiff_with_odd_chunks_and_stereo():
    # COMM after an unknown word-padded chunk; stereo 16-bit; frame count
    # limits the SSND read; sample rate 48000 as a raw 80-bit float
    frames = 5
    left = np.array([100, -200, 300, -400, 500], dtype=np.int16)
    right = -left
    inter = np.empty(10, dtype=np.int16)
    inter[0::2], inter[1::2] = left, right
    f80 = struct.pack(">HQ", 16383 + 15, 48000 << (63 - 15))
    comm = struct.pack(">HIH", 2, frames, 16) + f80
    ssnd = struct.pack(">II", 0, 0) + inter.astype(">i2").tobytes()
    odd = b"ANNO" + struct.pack(">I", 3) + b"hi!" + b"\x00"  # word pad
    body = (
        b"AIFF"
        + odd
        + b"COMM" + struct.pack(">I", len(comm)) + comm
        + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    )
    payload = b"FORM" + struct.pack(">I", len(body)) + body
    s, rate = decode_aiff(payload)
    assert rate == 48000
    assert np.array_equal(s, left)  # downmix = channel 0


def test_hand_assembled_aifc_sowt_little_endian_pcm():
    # AIFC with compression 'sowt' = byte-swapped (little-endian) PCM —
    # a branch our encoder never emits
    vals = np.array([1000, -2000, 32000, -32768], dtype=np.int16)
    f80 = struct.pack(">HQ", 16383 + 13, 8000 << (63 - 13))
    comm = (
        struct.pack(">HIH", 1, 4, 16)
        + f80
        + b"sowt"
        + b"\x00\x00"  # empty pstring name, padded
    )
    ssnd = struct.pack(">II", 0, 0) + vals.astype("<i2").tobytes()
    body = (
        b"AIFC"
        + b"COMM" + struct.pack(">I", len(comm)) + comm
        + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    )
    payload = b"FORM" + struct.pack(">I", len(body)) + body
    s, rate = decode_aiff(payload)
    assert rate == 8000 and np.array_equal(s, vals.astype(np.int16))


def test_hand_assembled_au_24bit_pcm_and_unknown_size():
    # 24-bit big-endian PCM, data_size = 0xFFFFFFFF (unknown, per spec)
    vals = [0x123456, -0x123456, 0x7FFF00]
    data = b"".join(
        (v & 0xFFFFFF).to_bytes(3, "big") for v in vals
    )
    payload = struct.pack(
        ">IIIIII", 0x2E736E64, 24, 0xFFFFFFFF, 4, 16000, 1
    ) + data
    s, rate = decode_au(payload)
    assert rate == 16000
    assert s.tolist() == [v >> 8 for v in vals]  # top 16 bits


def test_hand_assembled_sphere_big_endian_pcm():
    x = np.array([1000, -2000, 3000, -4000], dtype=np.int16)
    header = (
        b"NIST_1A\n    512\n"
        b"sample_rate -i 8000\n"
        b"channel_count -i 1\n"
        b"sample_n_bytes -i 2\n"
        b"sample_byte_format -s2 10\n"
        b"sample_coding -s3 pcm\n"
        b"end_head\n"
    )
    payload = header + b" " * (512 - len(header)) + x.astype(">i2").tobytes()
    s, rate = decode_sphere(payload)
    assert rate == 8000 and np.array_equal(s, x)


# ---------------------------------------------------------------------------
# float / extensible WAV (handled by multimodal's manual RIFF fallback,
# tested here with the rest of the round-11 audio surface)


def _wav_container(fmt_body: bytes, data: bytes) -> bytes:
    def chunk(tag, body):
        return tag + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    inner = b"WAVE" + chunk(b"fmt ", fmt_body) + chunk(b"data", data)
    return b"RIFF" + struct.pack("<I", len(inner)) + inner


def test_float32_and_float64_wav_decode():
    from mapreduce_machine_learning_spark.sources.multimodal import decode_wav

    vals = np.array([0.0, 0.5, -0.5, 1.0, -1.0, 2.0, -2.0, np.nan])
    want = np.clip(np.nan_to_num(vals) * 32767.0, -32768, 32767).astype(
        np.int16
    )
    for bits, dt in ((32, "<f4"), (64, "<f8")):
        fmt = struct.pack("<HHIIHH", 3, 1, 16000, 16000 * bits // 8, bits // 8, bits)
        payload = _wav_container(fmt, vals.astype(dt).tobytes())
        s, rate = decode_wav(payload)
        assert rate == 16000 and np.array_equal(s, want), bits


def test_extensible_wav_pcm_and_float_subformats():
    from mapreduce_machine_learning_spark.sources.multimodal import decode_wav

    guid_tail = bytes(14)  # decoder reads only the 2-byte format code
    # extensible 24-bit stereo PCM
    x = np.array([0x123456, -0x123456, 0x7FFF00, -0x400000], dtype=np.int64)
    interleaved = np.repeat(x, 2)  # L == R
    data = b"".join(
        int(v & 0xFFFFFF).to_bytes(3, "little") for v in interleaved
    )
    fmt = (
        struct.pack("<HHIIHH", 0xFFFE, 2, 48000, 48000 * 6, 6, 24)
        + struct.pack("<HHI", 22, 24, 3)
        + struct.pack("<H", 1)
        + guid_tail
    )
    s, rate = decode_wav(_wav_container(fmt, data))
    assert rate == 48000 and s.tolist() == [int(v) >> 8 for v in x]
    # extensible float32 mono
    fvals = np.array([0.25, -0.75], dtype=np.float32)
    fmt_f = (
        struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 32000, 4, 32)
        + struct.pack("<HHI", 22, 32, 4)
        + struct.pack("<H", 3)
        + guid_tail
    )
    s, rate = decode_wav(_wav_container(fmt_f, fvals.tobytes()))
    assert s.tolist() == [8191, -24575]


def test_compressed_wav_still_quarantines():
    from mapreduce_machine_learning_spark.sources.multimodal import (
        decode_wav,
        fake_features,
        features_for,
    )

    fmt = struct.pack("<HHIIHH", 2, 1, 8000, 4000, 1, 4)  # MS ADPCM
    payload = _wav_container(fmt, b"\x00" * 64)
    with pytest.raises(NotImplementedError):
        decode_wav(payload)
    assert np.array_equal(features_for(payload), fake_features(payload))


# ---------------------------------------------------------------------------
# feature-pipeline dispatch + quarantine


def test_features_for_dispatches_all_three_containers():
    x = _tone(2000)
    for payload in (
        encode_aiff(x, 16000),
        encode_au(x, 8000, encoding=3),
        encode_sphere(x, 16000),
    ):
        want = real_audio_features(x, 16000 if payload[:4] != b".snd" else 8000)
        got = features_for(payload)
        assert np.array_equal(got, want), payload[:8]


def test_quarantine_paths():
    x = _tone(500)
    aiff = encode_aiff(x, 16000)
    # truncated SSND
    with pytest.raises(NotImplementedError):
        decode_aiff(aiff[: len(aiff) // 2])
    # unsupported AIFC compression type
    bad_comm = struct.pack(">HIH", 1, 4, 16) + b"\x00" * 10 + b"ima4"
    body = b"AIFC" + b"COMM" + struct.pack(">I", len(bad_comm)) + bad_comm \
        + b"SSND" + struct.pack(">I", 8) + b"\x00" * 8
    with pytest.raises(NotImplementedError):
        decode_aiff(b"FORM" + struct.pack(">I", len(body)) + body)
    # AU float encoding
    au_float = struct.pack(">IIIIII", 0x2E736E64, 24, 4, 6, 8000, 1) + b"\x00" * 4
    with pytest.raises(NotImplementedError):
        decode_au(au_float)
    # SPHERE shorten coding
    sph = bytearray(encode_sphere(x, 8000))
    sph_text = bytes(sph).replace(b"-s3 pcm", b"-s12 pcm,embedded")
    with pytest.raises(NotImplementedError):
        decode_sphere(sph_text)
    # all of them degrade to the md5 stand-in through features_for
    for bad in (aiff[: len(aiff) // 2], au_float, sph_text):
        assert np.array_equal(features_for(bad), fake_features(bad))


# ---------------------------------------------------------------------------
# ADVICE r11: declared-size fields bound the audio region


def test_au_data_size_field_clips_trailing_annotation():
    x = np.array([100, -200, 300], dtype=np.int16)
    data = x.astype(">i2").tobytes()
    payload = (
        struct.pack(">IIIIII", 0x2E736E64, 24, len(data), 3, 8000, 1)
        + data
        + b"trailing annotation\x00\x00"
    )
    s, rate = decode_au(payload)
    assert rate == 8000 and np.array_equal(s, x)


def test_sphere_sample_count_clips_and_guards_trailing_data():
    x = np.array([10, -20, 30, -40], dtype=np.int16)

    def build(count, extra=b""):
        header = (
            b"NIST_1A\n    512\n"
            b"sample_rate -i 8000\n"
            b"channel_count -i 1\n"
            b"sample_count -i " + str(count).encode() + b"\n"
            b"sample_n_bytes -i 2\n"
            b"sample_byte_format -s2 01\n"
            b"sample_coding -s3 pcm\n"
            b"end_head\n"
        )
        pad = b" " * (512 - len(header))
        return header + pad + x.astype("<i2").tobytes() + extra

    s, rate = decode_sphere(build(4, extra=b"trailing-annotation"))
    assert rate == 8000 and np.array_equal(s, x)
    # declaring more samples than the payload holds is a truncated file
    with pytest.raises(NotImplementedError):
        decode_sphere(build(9))


# ---------------------------------------------------------------------------
# ADVICE r12: AU truncation quarantines like SPHERE (no silent clip)


def test_au_payload_shorter_than_declared_size_quarantines():
    """A declared data-size LARGER than the available payload is a
    truncated file and must quarantine — mirroring the SPHERE
    sample_count check — not silently decode the shortfall."""
    x = _tone(400)
    payload = encode_au(x, 8000)  # declares size = 2 * len(x)
    with pytest.raises(NotImplementedError):
        decode_au(payload[: 24 + len(x)])  # half the declared bytes
    # the boundary case (exactly the declared size) still decodes
    s, rate = decode_au(payload)
    assert rate == 8000 and np.array_equal(s, x)
    # and through features_for the truncation degrades to the stand-in
    short = payload[: 24 + len(x)]
    assert np.array_equal(features_for(short), fake_features(short))
