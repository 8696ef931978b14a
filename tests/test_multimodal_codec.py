"""REAL in-container media codecs (round 8): 24-bit BMP + 16-bit PCM WAV.

The multimodal pipeline's codec layer was a documented NotImplementedError
seam ("no PIL/ffmpeg in this container"). Round 8 closes the stdlib-reachable
part of that gap: BMP images parse with struct/numpy (real pixels, real
nearest-neighbor resize) and WAV audio with the stdlib ``wave`` module (real
samples, RMS/ZCR features), dispatched by magic bytes so unknown formats
still flow through the deterministic stand-ins. Video codecs remain the
environment-bound seam.

These tests pin: exact encode/decode round-trips (including row padding and
top-down BMPs), the Spark ``mapInPandas`` path computing the same features
the local decoder computes, real resizes verified pixel-for-pixel against
local numpy, fallback behavior for unsupported sub-formats, and
partitioning-independence of everything."""

import struct

import numpy as np
import pytest

from mapreduce_machine_learning_spark.sources.multimodal import (
    decode_bmp,
    decode_image,
    decode_wav,
    encode_bmp,
    encode_wav,
    extract_features,
    fake_features,
    features_for,
    real_audio_features,
    real_image_features,
    resize_image,
    resize_media,
    synth_media_real,
)


def _arr(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint16).astype(np.uint8)


def test_bmp_round_trip_exact_including_padded_rows():
    # widths 5/6/7/8 exercise every row-padding residue (0-3 pad bytes)
    for w in (5, 6, 7, 8):
        a = _arr(9, w, seed=w)
        assert np.array_equal(decode_bmp(encode_bmp(a)), a), w


def test_bmp_top_down_storage_decodes():
    a = _arr(4, 6, seed=1)
    payload = bytearray(encode_bmp(a))
    # flip the DIB height sign to declare top-down, and re-order the rows
    # (encode writes bottom-up): decoded output must still equal `a`
    h = struct.unpack_from("<i", payload, 22)[0]
    struct.pack_into("<i", payload, 22, -h)
    off = struct.unpack_from("<I", payload, 10)[0]
    row = 6 * 3 + (4 - (6 * 3) % 4) % 4
    body = bytes(payload[off:])
    rows = [body[i * row : (i + 1) * row] for i in range(h)]
    payload[off:] = b"".join(reversed(rows))
    assert np.array_equal(decode_bmp(bytes(payload)), a)


def test_wav_round_trip_exact():
    samples = (np.sin(np.linspace(0, 40, 777)) * 12345).astype(np.int16)
    back, rate = decode_wav(encode_wav(samples, 8000))
    assert rate == 8000
    assert np.array_equal(back, samples)


def test_unsupported_formats_raise_and_fall_back():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n" + b"\x00" * 100)
    # 8-bit BMP: header parses, depth is unsupported -> seam raises...
    a = _arr(3, 3)
    payload = bytearray(encode_bmp(a))
    struct.pack_into("<H", payload, 28, 8)
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(payload))
    # ...and the dispatcher degrades to the md5 stand-in instead of dying
    assert list(features_for(bytes(payload))) == list(
        fake_features(bytes(payload))
    )
    # lying magic / truncated body: a payload that CLAIMS to be BMP or WAV
    # but is garbage must also quarantine to the stand-in, never raise —
    # one corrupt row cannot be allowed to kill a 100k-row task
    corrupt_bmp = b"BM" + b"\x07" * 60
    corrupt_wav = b"RIFF\x00\x00\x00\x00WAVE" + b"\x07" * 40
    for c in (corrupt_bmp, corrupt_wav):
        assert list(features_for(c)) == list(fake_features(c))


def test_spark_features_match_local_decoders(spark):
    media = synth_media_real(spark, n=48).repartition(7)
    got = {r.media_id: r for r in extract_features(media).collect()}
    src = {r.media_id: r for r in media.collect()}
    assert len(got) == 48
    for i, row in src.items():
        payload = bytes(row.payload)
        if row.kind == "image":
            want = real_image_features(decode_bmp(payload))
        elif row.kind == "audio":
            want = real_audio_features(*decode_wav(payload))
        else:  # video: still the documented stand-in
            want = fake_features(payload)
        assert got[i].features == pytest.approx(list(want)), (i, row.kind)
    # real features actually separate content: two different images differ
    imgs = [got[i].features for i in got if src[i].kind == "image"]
    assert len({tuple(f) for f in imgs}) == len(imgs)


def test_spark_resize_is_real_nearest_neighbor_for_bmp(spark):
    media = synth_media_real(spark, n=24)
    out = {r.media_id: r for r in resize_media(media, 8, 6).collect()}
    for row in media.collect():
        payload = bytes(row.payload)
        if row.kind == "image":
            resized = decode_bmp(bytes(out[row.media_id].payload))
            assert resized.shape == (6, 8, 3)
            src = decode_bmp(payload)
            h, w = src.shape[:2]
            yi = np.minimum((np.arange(6) * h) // 6, h - 1)
            xi = np.minimum((np.arange(8) * w) // 8, w - 1)
            assert np.array_equal(resized, src[yi][:, xi])
        elif row.kind == "audio":
            assert bytes(out[row.media_id].payload) == payload  # untouched
    # and the seam contract: resize_image refuses non-BMP outright
    with pytest.raises(NotImplementedError):
        resize_image(b"not-an-image", 8, 6)


def test_features_partitioning_independent(spark):
    a = {
        r.media_id: tuple(r.features)
        for r in extract_features(synth_media_real(spark, 30).repartition(1)).collect()
    }
    b = {
        r.media_id: tuple(r.features)
        for r in extract_features(synth_media_real(spark, 30).repartition(5)).collect()
    }
    assert a == b
