"""ADPCM-in-WAV codecs (sources/adpcm.py): scalar-vs-vectorized
differential oracles, encoder-twin round trips, geometry quarantine,
and the decode_wav dispatch.

The vectorized block decoders are the scale path; the scalar reference
decoders HERE are the bit-level spec transcription they must match on
random code streams — the FLAC Rice discipline."""

import struct

import numpy as np
import pytest

from mapreduce_machine_learning_spark.sources.adpcm import (
    _MS_DELTA_MAX,
    _IMA_INDEX_ADJ,
    _IMA_STEPS,
    _MS_ADAPT,
    _MS_COEFS,
    decode_ima_wav_body,
    decode_ms_wav_body,
    encode_wav_ima,
    encode_wav_ms,
    ima_decode_blocks,
    ms_decode_blocks,
)
from mapreduce_machine_learning_spark.sources.multimodal import (
    decode_audio,
    decode_wav,
    is_wav,
)


def _tone(n, rate=16000, freq=440.0, amp=11000):
    t = np.arange(n) / rate
    return (np.sin(2 * np.pi * freq * t) * amp).astype(np.int16)


# ---------------------------------------------------------------------------
# scalar references (spec transcription) vs the vectorized kernels


def _ima_scalar(pred, idx, codes):
    out = [pred]
    steps = _IMA_STEPS.tolist()
    adj = _IMA_INDEX_ADJ.tolist()
    for c in codes:
        step = steps[idx]
        diff = step >> 3
        if c & 1:
            diff += step >> 2
        if c & 2:
            diff += step >> 1
        if c & 4:
            diff += step
        if c & 8:
            diff = -diff
        pred = max(-32768, min(32767, pred + diff))
        idx = max(0, min(88, idx + adj[c]))
        out.append(pred)
    return out


def _ms_scalar(ci, delta, s1, s2, codes):
    c1, c2 = int(_MS_COEFS[ci, 0]), int(_MS_COEFS[ci, 1])
    out = [s2, s1]
    for c in codes:
        signed = c - 16 if c >= 8 else c
        predicted = (s1 * c1 + s2 * c2) >> 8
        sample = max(-32768, min(32767, predicted + signed * delta))
        out.append(sample)
        s2, s1 = s1, sample
        # same documented delta clamp as the vectorized kernel
        delta = min(_MS_DELTA_MAX, max(16, (int(_MS_ADAPT[c]) * delta) >> 8))
    return out


def test_ima_vectorized_matches_scalar_reference_on_random_streams():
    rng = np.random.default_rng(7)
    nblk, ncodes = 37, 64
    preds = rng.integers(-32768, 32768, nblk).astype(np.int32)
    idxs = rng.integers(0, 89, nblk).astype(np.int32)
    nibs = rng.integers(0, 16, (nblk, ncodes)).astype(np.uint8)
    got = ima_decode_blocks(preds, idxs, nibs)
    for b in range(nblk):
        ref = _ima_scalar(int(preds[b]), int(idxs[b]), nibs[b].tolist())
        assert got[b].tolist() == ref, b


def test_ms_vectorized_matches_scalar_reference_on_random_streams():
    rng = np.random.default_rng(11)
    nblk, ncodes = 29, 48
    ci = rng.integers(0, 7, nblk)
    deltas = rng.integers(16, 4000, nblk).astype(np.int16)
    s1 = rng.integers(-32768, 32768, nblk).astype(np.int16)
    s2 = rng.integers(-32768, 32768, nblk).astype(np.int16)
    nibs = rng.integers(0, 16, (nblk, ncodes)).astype(np.uint8)
    got = ms_decode_blocks(ci, deltas, s1, s2, nibs)
    for b in range(nblk):
        ref = _ms_scalar(
            int(ci[b]), int(deltas[b]), int(s1[b]), int(s2[b]),
            nibs[b].tolist(),
        )
        assert got[b].tolist() == ref, b


# ---------------------------------------------------------------------------
# encoder-twin round trips through the full WAV container


def _snr_db(clean, decoded):
    n = min(len(clean), len(decoded))
    err = clean[:n].astype(np.float64) - decoded[:n].astype(np.float64)
    p_sig = float(np.mean(clean[:n].astype(np.float64) ** 2))
    p_err = float(np.mean(err**2)) or 1e-12
    return 10 * np.log10(p_sig / p_err)


def test_ima_wav_roundtrip_tone_snr_and_exact_length():
    x = _tone(5000)
    payload = encode_wav_ima(x, 16000)
    assert is_wav(payload)
    s, rate = decode_wav(payload)
    assert rate == 16000 and len(s) == len(x)
    # 4-bit ADPCM on a mid-level tone: >25 dB is comfortably in-spec
    assert _snr_db(x, s) > 25.0


def test_ms_wav_roundtrip_tone_snr_and_length():
    x = _tone(5000)
    payload = encode_wav_ms(x, 16000)
    assert is_wav(payload)
    s, rate = decode_wav(payload)
    assert rate == 16000 and len(s) == 5000
    assert _snr_db(x, s) > 25.0


def test_ima_partial_trailing_block_and_fact_trim():
    # 505 samples/block; 700 samples = one full block + a partial one
    x = _tone(700)
    s, rate = decode_wav(encode_wav_ima(x, 8000))
    assert rate == 8000 and len(s) == 700
    assert _snr_db(x, s) > 20.0


def test_decode_audio_dispatch_reaches_adpcm():
    x = _tone(2000)
    s, rate = decode_audio(encode_wav_ima(x, 16000))
    assert rate == 16000 and len(s) == 2000
    s2, rate2 = decode_audio(encode_wav_ms(x, 22050))
    assert rate2 == 22050 and len(s2) == 2000


def test_ima_stereo_channel0_extraction():
    """Hand-build a 2-channel IMA block: channel 0's nibble groups must
    be the ones the decoder reads."""
    ncodes = 8  # per channel
    spb = ncodes + 1
    block_align = 4 * 2 + 2 * 4  # two headers + one 4-byte group each
    hdr0 = struct.pack("<hBB", 1000, 40, 0)
    hdr1 = struct.pack("<hBB", -5000, 10, 0)
    g0 = bytes([0x21, 0x43, 0x65, 0x87])  # ch0 codes 1,2,3,4,5,6,7,8
    g1 = bytes([0xFF, 0xFF, 0xFF, 0xFF])  # ch1 junk that must be ignored
    data = hdr0 + hdr1 + g0 + g1
    got = decode_ima_wav_body(data, block_align, 2, spb)
    ref = _ima_scalar(1000, 40, [1, 2, 3, 4, 5, 6, 7, 8])
    assert got.tolist() == ref


def test_ms_stereo_channel0_high_nibbles():
    ncodes = 4
    spb = ncodes + 2
    block_align = 7 * 2 + 4  # two headers + 4 shared nibble bytes
    hdr = struct.pack(
        "<BBhhhhhh", 1, 2, 500, 700, 100, -200, 3000, -4000
    )  # preds: ch0=1 ch1=2; deltas 500/700; s1 100/-200; s2 3000/-4000
    data = hdr + bytes([0x1F, 0x2F, 0x3F, 0x4F])  # ch0 nibbles 1,2,3,4
    got = decode_ms_wav_body(data, block_align, 2, spb)
    ref = _ms_scalar(1, 500, 100, 3000, [1, 2, 3, 4])
    assert got.tolist() == ref


# ---------------------------------------------------------------------------
# geometry quarantine


def test_bad_geometry_quarantines():
    x = _tone(600)
    good = encode_wav_ima(x, 8000)
    with pytest.raises(NotImplementedError):
        decode_ima_wav_body(b"\x00" * 3, 256, 1, 505)  # < one header
    with pytest.raises(NotImplementedError):
        decode_ima_wav_body(b"\x00" * 256, 256, 1, 9999)  # spb too big
    with pytest.raises(NotImplementedError):
        decode_ima_wav_body(b"\x00" * 256, 4, 1, 505)  # align <= header
    with pytest.raises(NotImplementedError):
        decode_ms_wav_body(b"\x00" * 6, 512, 1, 500)  # no whole block
    # step index byte > 88 in a crafted block
    bad = bytearray(256)
    bad[2] = 120
    with pytest.raises(NotImplementedError):
        decode_ima_wav_body(bytes(bad), 256, 1, 505)
    # MS coefficient index out of range
    badms = bytearray(256)
    badms[0] = 9
    badms[1:3] = struct.pack("<h", 100)
    with pytest.raises(NotImplementedError):
        decode_ms_wav_body(bytes(badms), 256, 1, 500)
    # MS zero delta
    badms2 = bytearray(256)
    badms2[1:3] = struct.pack("<h", 0)
    with pytest.raises(NotImplementedError):
        decode_ms_wav_body(bytes(badms2), 256, 1, 500)
    # sanity: the good payload still decodes after all that
    assert len(decode_wav(good)[0]) == 600


def test_truncated_adpcm_wav_payload_quarantines():
    x = _tone(3000)
    payload = encode_wav_ima(x, 16000)
    with pytest.raises(NotImplementedError):
        decode_wav(payload[:30])  # inside the fmt chunk
    # cut inside data: the RIFF walk sees a truncated chunk
    with pytest.raises(NotImplementedError):
        decode_wav(payload[: len(payload) - 37])


def test_encoder_twin_validation():
    with pytest.raises(ValueError):
        encode_wav_ima(np.array([], np.int16), 8000)
    with pytest.raises(ValueError):
        encode_wav_ima(_tone(100), 8000, samples_per_block=8)  # even
    with pytest.raises(ValueError):
        encode_wav_ms(_tone(1), 8000)  # needs 2 samples
    with pytest.raises(ValueError):
        encode_wav_ms(_tone(100), 8000, samples_per_block=7)  # odd


def test_fuzzed_adpcm_wav_quarantines_or_decodes():
    """Decoder-level quarantine contract through the full WAV dispatch:
    mutated ADPCM WAVs either decode or raise NotImplementedError.
    Seeded slice of the clean round-13 unseeded sweep."""
    rng = np.random.default_rng(1319)
    x = _tone(3000)
    bases = [encode_wav_ima(x, 8000), encode_wav_ms(x, 8000)]
    for base in bases:
        for trial in range(150):
            p = bytearray(base)
            if trial % 3 == 2:
                p = p[: int(rng.integers(1, len(p)))]
            else:
                for _ in range(int(rng.integers(1, 8))):
                    p[int(rng.integers(0, len(p)))] = int(rng.integers(0, 256))
            try:
                decode_wav(bytes(p))
            except NotImplementedError:
                pass  # the quarantine contract
