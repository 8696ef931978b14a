"""Sample-rate conversion (sources/resample.py) and the resample_media
pipeline stage.

The kernel tests pin the DSP contract (identity exactness, length law,
frequency/amplitude preservation, anti-aliasing, chunk invariance,
roundtrip bound); the Spark tests pin the pipeline contract (schema,
passthrough, quarantine, partition/Arrow-batch invariance, composition
with extract_features).
"""

import hashlib

import numpy as np
import pytest

from mapreduce_machine_learning_spark.sources.flac import encode_flac
from mapreduce_machine_learning_spark.sources.multimodal import (
    RESAMPLED_SCHEMA,
    decode_wav,
    encode_wav,
    fake_resample,
    resample_media,
    synth_media_real,
)
from mapreduce_machine_learning_spark.sources.pcm_codecs import encode_au
from mapreduce_machine_learning_spark.sources.resample import resample_audio


def _tone(freq, rate, secs=0.5, amp=12000):
    t = np.arange(int(rate * secs)) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.int16)


def _dominant_freq(x, rate):
    spec = np.abs(np.fft.rfft(x.astype(np.float64) * np.hanning(len(x))))
    return np.argmax(spec) * rate / len(x)


# ---------------------------------------------------------------------------
# kernel


def test_identity_rate_is_bit_exact():
    x = _tone(440, 16000)
    y = resample_audio(x, 16000, 16000)
    assert np.array_equal(y, x)
    assert y is not x  # a copy, not a view the caller could mutate


def test_output_length_law():
    for n, ri, ro in [(8000, 8000, 16000), (16000, 16000, 8000),
                      (44100, 44100, 16000), (1, 8000, 48000),
                      (7, 48000, 8000)]:
        x = np.zeros(n, np.int16)
        got = len(resample_audio(x, ri, ro))
        assert got == max(1, int(round(n * ro / ri))), (n, ri, ro)
    assert len(resample_audio(np.zeros(0, np.int16), 8000, 16000)) == 0


def test_invalid_rates_raise():
    x = np.zeros(8, np.int16)
    with pytest.raises(ValueError):
        resample_audio(x, 0, 8000)
    with pytest.raises(ValueError):
        resample_audio(x, 8000, -1)


def test_tone_survives_up_and_down():
    # mid-band tone: frequency exact to the FFT bin, amplitude ~exact
    x8 = _tone(440, 8000)
    up = resample_audio(x8, 8000, 16000)
    assert abs(_dominant_freq(up, 16000) - 440) < 4
    assert abs(up.astype(float).std() / x8.astype(float).std() - 1) < 0.01
    x16 = _tone(440, 16000)
    down = resample_audio(x16, 16000, 8000)
    assert abs(_dominant_freq(down, 8000) - 440) < 4
    assert abs(down.astype(float).std() / x16.astype(float).std() - 1) < 0.01
    # non-rational-friendly pair (44.1k -> 16k)
    x44 = _tone(1000, 44100)
    y = resample_audio(x44, 44100, 16000)
    assert abs(_dominant_freq(y, 16000) - 1000) < 4


def test_downsampling_antialiases():
    # 7 kHz at 16 kHz is above the 8 kHz target's Nyquist: it must be
    # attenuated (>= 40 dB here), not folded to a 1 kHz alias
    x = _tone(7000, 16000)
    y = resample_audio(x, 16000, 8000)
    ratio = y.astype(float).std() / x.astype(float).std()
    assert ratio < 0.01, ratio
    # while an in-band 3 kHz tone (0.75x the target Nyquist, inside the
    # 0.945-rolloff passband) passes nearly untouched
    x_ok = _tone(3000, 16000)
    y_ok = resample_audio(x_ok, 16000, 8000)
    assert y_ok.astype(float).std() / x_ok.astype(float).std() > 0.98


def test_chunk_size_invariance():
    # the memory-bounding chunk loop must not change a single sample —
    # this is what makes the stage deterministic under any Arrow batching
    x = _tone(1234, 44100, secs=0.3)
    full = resample_audio(x, 44100, 16000)
    tiny = resample_audio(x, 44100, 16000, _chunk_elems=2048)
    assert np.array_equal(full, tiny)


def test_roundtrip_error_bounded():
    x = _tone(440, 8000)
    rt = resample_audio(resample_audio(x, 8000, 16000), 16000, 8000)
    # ignore the filter-length edges; interior error is quantization-level
    core = slice(200, -200)
    err = np.abs(rt[core].astype(np.int32) - x[core].astype(np.int32))
    assert err.max() <= 2, int(err.max())


def test_extreme_values_clip_not_wrap():
    x = np.array([32767, -32768] * 64, np.int16)
    y = resample_audio(x, 8000, 16000)
    assert y.dtype == np.int16
    # ringing past full scale must clip to the int16 rails, never wrap
    assert y.max() <= 32767 and y.min() >= -32768


def test_determinism_same_bytes():
    x = _tone(777, 22050, secs=0.2)
    a = resample_audio(x, 22050, 16000)
    b = resample_audio(x.copy(), 22050, 16000)
    assert np.array_equal(a, b)


# ---------------------------------------------------------------------------
# pipeline stage


def test_resample_media_normalizes_every_audio_row(spark):
    media = synth_media_real(spark, n=36)
    out = resample_media(media, target_rate=16000)
    assert out.schema == RESAMPLED_SCHEMA
    rows = {r["media_id"]: r for r in out.collect()}
    src = {r["media_id"]: r for r in media.collect()}
    assert rows.keys() == src.keys()
    for mid, r in rows.items():
        if r["kind"] == "audio":
            assert r["sample_rate"] == 16000
            s, rate = decode_wav(bytes(r["payload"]))
            assert rate == 16000
            assert r["duration_ms"] == len(s) * 1000 // 16000
        else:
            # image/video passthrough: payload and duration untouched
            assert bytes(r["payload"]) == bytes(src[mid]["payload"])
            assert r["sample_rate"] == 0
            assert r["duration_ms"] == src[mid]["duration_ms"]


def test_resample_media_rate_and_tone_content(spark):
    # one known 440 Hz AU at 8 kHz and one FLAC at 16 kHz through the
    # stage: both come out as 16 kHz WAVs still dominated by 440 Hz
    x8, x16 = _tone(440, 8000), _tone(440, 16000)
    df = spark.createDataFrame(
        [
            (0, "audio", bytearray(encode_au(x8, 8000)), 0, 0, 1000),
            (1, "audio", bytearray(encode_flac(x16, 16000)), 0, 0, 1000),
        ],
        "media_id long, kind string, payload binary, width int, "
        "height int, duration_ms int",
    )
    for r in resample_media(df, target_rate=16000).collect():
        s, rate = decode_wav(bytes(r["payload"]))
        assert rate == 16000
        assert abs(_dominant_freq(s, 16000) - 440) < 6, r["media_id"]


def test_resample_media_quarantines_corrupt_audio(spark):
    good = encode_wav(_tone(440, 8000), 8000)
    corrupt = good[:40]  # truncated WAV: decodable magic, broken body
    opaque = hashlib.md5(b"not-audio").digest() * 3
    df = spark.createDataFrame(
        [
            (0, "audio", bytearray(good), 0, 0, 500),
            (1, "audio", bytearray(corrupt), 0, 0, 500),
            (2, "audio", bytearray(opaque), 0, 0, 500),
        ],
        "media_id long, kind string, payload binary, width int, "
        "height int, duration_ms int",
    )
    rows = {r["media_id"]: r for r in resample_media(df, 16000).collect()}
    s, rate = decode_wav(bytes(rows[0]["payload"]))
    assert rate == 16000 and len(s) == 8000  # 0.5 s of audio at 16 kHz
    # corrupt + unknown-container rows quarantine to the stand-in —
    # the task survives and the output stays deterministic
    assert bytes(rows[1]["payload"]) == fake_resample(corrupt, 16000)
    assert bytes(rows[2]["payload"]) == fake_resample(opaque, 16000)
    assert rows[1]["duration_ms"] == 0 and rows[2]["duration_ms"] == 0


def test_resample_media_partition_and_arrow_batch_invariant(spark):
    media = synth_media_real(spark, n=30)

    def fingerprint(df):
        return {
            r["media_id"]: (
                r["kind"],
                hashlib.md5(bytes(r["payload"])).hexdigest(),
                r["sample_rate"],
                r["duration_ms"],
            )
            for r in resample_media(df, 16000).collect()
        }

    base = fingerprint(media.repartition(8))
    assert base == fingerprint(media.repartition(3))
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        assert base == fingerprint(media.repartition(8))
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")


def test_resample_composes_with_extract_features(spark):
    # resample -> extract_features: the normalized WAVs feed the feature
    # stage with real (not stand-in) features at the new rate
    from mapreduce_machine_learning_spark.sources.multimodal import (
        extract_features,
        real_audio_features,
    )

    media = synth_media_real(spark, n=18)
    resampled = resample_media(media, target_rate=16000)
    feats = {
        r["media_id"]: r["features"]
        for r in extract_features(
            resampled.withColumn("width", resampled.sample_rate)
            .withColumn("height", resampled.sample_rate)
            .withColumn("duration_ms", resampled.duration_ms)
        ).collect()
        if r["kind"] == "audio"
    }
    audio_payloads = {
        r["media_id"]: bytes(r["payload"])
        for r in resampled.collect()
        if r["kind"] == "audio"
    }
    assert feats and feats.keys() == audio_payloads.keys()
    for mid, payload in audio_payloads.items():
        want = real_audio_features(*decode_wav(payload))
        assert np.allclose(feats[mid], want, atol=1e-6), mid
