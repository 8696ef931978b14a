"""Native-codec seam (sources/native.py): dispatch, fallback, parity.

The container ships no native codec libraries (that absence is why the
pure decoders exist), so the dispatch machinery is exercised with
INJECTED backends via ``register_backend`` — including an identity
backend built from the pure decoders themselves, which runs the same
parity comparator the real-backend tests use. The real-backend tests
(Pillow, soundfile) are ``importorskip``-gated: they skip cleanly here
and run wherever a deployment installs the backend, which is exactly
the environment whose parity they certify.
"""

import numpy as np
import pytest

from mapreduce_machine_learning_spark.sources import native
from mapreduce_machine_learning_spark.sources.multimodal import (
    decode_audio,
    decode_bmp,
    decode_image,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_wav,
    features_for,
)
from mapreduce_machine_learning_spark.sources.pcm_codecs import (
    decode_aiff,
    decode_au,
    decode_sphere,
    encode_aiff,
    encode_au,
    encode_sphere,
)


@pytest.fixture(autouse=True)
def _isolated_backend_state():
    """Every test starts from a clean registry and 'auto' mode."""
    native.clear_backends()
    native.set_backend("auto")
    yield
    native.clear_backends()
    native.set_backend("auto")


def _img(h=9, w=11, seed=5):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint16).astype(np.uint8)


def _tone(n=800, rate_div=13):
    return (np.sin(np.arange(n) / rate_div) * 12000).astype(np.int16)


# ---------------------------------------------------------------------------
# dispatch order and modes


def test_no_backend_in_container_resolves_to_pure():
    assert native.active_image_backend() is None
    assert native.active_audio_backend() is None
    rep = native.backend_report()
    assert rep["image_backend"] == "pure-python"
    assert rep["audio_backend"] == "pure-python"
    # and the dispatchers still decode via the pure path
    a = _img()
    assert np.array_equal(decode_image(encode_bmp(a)), a)
    x = _tone()
    s, rate = decode_audio(encode_wav(x, 8000))
    assert rate == 8000 and np.array_equal(s, x)


def test_registered_backend_wins_and_pure_mode_bypasses_it():
    sentinel = np.full((2, 2, 3), 7, np.uint8)
    native.register_backend("image", lambda p: sentinel, name="fake")
    assert native.active_image_backend() == "fake"
    assert np.array_equal(decode_image(b"anything"), sentinel)
    # mode "pure" must ignore the registered backend entirely
    native.set_backend("pure")
    assert native.active_image_backend() is None
    a = _img()
    assert np.array_equal(decode_image(encode_bmp(a)), a)
    with pytest.raises(NotImplementedError):
        decode_image(b"anything")  # unknown magic: pure seam raises


def test_backend_failure_falls_back_to_pure_and_quarantine_holds():
    calls = []

    def refusing(payload):
        calls.append(payload[:2])
        raise RuntimeError("backend can't decode this")

    native.register_backend("image", refusing, name="refuser")
    a = _img()
    # valid payload the backend declines: pure decoder takes over
    assert np.array_equal(decode_image(encode_bmp(a)), a)
    # corrupt payload: backend declines AND pure quarantines — the
    # NotImplementedError contract survives a broken native backend
    with pytest.raises(NotImplementedError):
        decode_image(encode_png(a)[:40])
    assert len(calls) == 2  # the backend really was consulted first


def test_nonconforming_backend_output_falls_back():
    # wrong dtype / shape / type must not escape to callers
    for bad in (
        lambda p: np.zeros((4, 4, 3), np.float32),  # wrong dtype
        lambda p: np.zeros((4, 4, 4), np.uint8),  # RGBA, not RGB
        lambda p: "not an array",
    ):
        native.clear_backends()
        native.register_backend("image", bad)
        a = _img()
        assert np.array_equal(decode_image(encode_bmp(a)), a)
    for bad_audio in (
        lambda p: (np.zeros(8, np.float64), 8000),  # wrong dtype
        lambda p: np.zeros(8, np.int16),  # missing rate
        lambda p: (np.zeros((2, 8), np.int16), 8000),  # not mono
    ):
        native.clear_backends()
        native.register_backend("audio", bad_audio)
        x = _tone()
        s, rate = decode_audio(encode_wav(x, 8000))
        assert rate == 8000 and np.array_equal(s, x)


def test_native_mode_without_backend_is_an_install_smoke_check():
    native.set_backend("native")
    with pytest.raises(NotImplementedError):
        decode_image(encode_bmp(_img()))
    with pytest.raises(ValueError):
        native.set_backend("fastest")  # invalid mode name


def test_audio_dispatch_covers_every_container_format_and_raises_otherwise():
    x = _tone()
    for payload, rate in (
        (encode_wav(x, 16000), 16000),
        (encode_aiff(x, 22050), 22050),
        (encode_au(x, 8000), 8000),
        (encode_sphere(x, 16000), 16000),
    ):
        s, r = decode_audio(payload)
        assert r == rate and np.array_equal(s, x)
    with pytest.raises(NotImplementedError):
        decode_audio(b"\x00" * 64)  # unknown container


# ---------------------------------------------------------------------------
# parity harness — identity backend (runs in-container)


def _image_parity(decode_native, fmt_payloads, atol=0):
    """The comparator the real-backend tests reuse: decode every payload
    through the backend and through the pure path (mode=pure), compare
    within atol (0 = bit-exact, the lossless contract)."""
    for name, payload in fmt_payloads:
        native.set_backend("pure")
        pure = decode_image(payload)
        got = decode_native(payload)
        native.set_backend("auto")
        assert got.shape == pure.shape, name
        diff = np.abs(got.astype(np.int16) - pure.astype(np.int16))
        assert diff.max() <= atol, (name, int(diff.max()))


def test_identity_backend_parity_and_feature_stability():
    """Register the pure decoders AS the native backend: the dispatch
    goes through the native path end-to-end and must be bit-identical —
    this exercises the exact parity harness the Pillow test uses, in a
    container with no Pillow."""
    from mapreduce_machine_learning_spark.sources.gif import encode_gif_rgb
    from mapreduce_machine_learning_spark.sources.jpeg import encode_jpeg
    from mapreduce_machine_learning_spark.sources.webp import encode_webp

    a = _img(16, 16, seed=3)
    payloads = [
        ("bmp", encode_bmp(a)),
        ("png", encode_png(a)),
        ("png-interlaced", encode_png(a, interlace=True)),
        ("gif", encode_gif_rgb([a])),
        ("webp-lossless", encode_webp(a)),
        ("jpeg", encode_jpeg(a)),
    ]

    def identity_backend(payload):
        native.set_backend("pure")
        try:
            return decode_image(payload)
        finally:
            native.set_backend("auto")

    native.register_backend("image", identity_backend, name="identity")
    _image_parity(decode_image, payloads, atol=0)
    # features through the dispatch are identical to the pure features
    for name, payload in payloads:
        via_backend = features_for(payload)
        native.set_backend("pure")
        pure = features_for(payload)
        native.set_backend("auto")
        assert np.array_equal(via_backend, pure), name


# ---------------------------------------------------------------------------
# real-backend parity — runs wherever the backend is installed


def test_pillow_parity_lossless_exact_jpeg_bounded():
    pytest.importorskip("PIL")
    native.clear_backends()  # force a fresh probe: Pillow must resolve
    assert native.active_image_backend() == "pillow"
    from mapreduce_machine_learning_spark.sources.gif import encode_gif_rgb
    from mapreduce_machine_learning_spark.sources.jpeg import encode_jpeg
    from mapreduce_machine_learning_spark.sources.webp import encode_webp

    a = _img(24, 32, seed=11)
    lossless = [
        ("bmp", encode_bmp(a)),
        ("png", encode_png(a)),
        ("png-interlaced", encode_png(a, interlace=True)),
        ("gif", encode_gif_rgb([a])),
        ("webp-lossless", encode_webp(a)),
    ]
    _image_parity(decode_image, lossless, atol=0)
    # JPEG: IDCT rounding differs across implementations — T.81 Annex A
    # accuracy class, documented tolerance <= 2 levels per sample
    _image_parity(decode_image, [("jpeg", encode_jpeg(a))], atol=2)


# ---------------------------------------------------------------------------
# resample backend kind


def test_no_resample_backend_resolves_to_pure():
    assert native.active_resample_backend() is None
    assert native.backend_report()["resample_backend"] == "pure-python"
    x = _tone()
    assert native.native_resample_audio(x, 8000, 16000) is None


def test_registered_resample_backend_wins_and_pure_mode_bypasses():
    x = _tone(n=400)
    n_out = 800  # round(400 * 16000 / 8000)
    sentinel = np.full(n_out, 123, np.int16)
    native.register_backend("resample", lambda s, ri, ro: sentinel, name="fake-src")
    assert native.active_resample_backend() == "fake-src"
    assert np.array_equal(native.native_resample_audio(x, 8000, 16000), sentinel)
    native.set_backend("pure")
    assert native.active_resample_backend() is None
    assert native.native_resample_audio(x, 8000, 16000) is None


def test_resample_identity_and_empty_input_never_dispatch():
    calls = []

    def recording(s, ri, ro):
        calls.append((ri, ro))
        return np.zeros(max(1, round(len(s) * ro / ri)), np.int16)

    native.register_backend("resample", recording, name="recorder")
    x = _tone(n=64)
    # identity conversion: the pure kernel's bit-exact copy, no dispatch
    assert native.native_resample_audio(x, 16000, 16000) is None
    # empty input: nothing to convert, no dispatch
    assert native.native_resample_audio(x[:0], 8000, 16000) is None
    assert calls == []


def test_resample_backend_failure_and_nonconforming_fall_back():
    x = _tone(n=400)

    def refusing(s, ri, ro):
        raise RuntimeError("backend can't convert this")

    for bad in (
        refusing,
        lambda s, ri, ro: np.zeros(799, np.int16),  # off-contract length
        lambda s, ri, ro: np.zeros(800, np.float32),  # wrong dtype
        lambda s, ri, ro: np.zeros((2, 400), np.int16),  # not mono
    ):
        native.clear_backends()
        native.register_backend("resample", bad)
        assert native.native_resample_audio(x, 8000, 16000) is None


def test_identity_resample_backend_parity():
    """Register the pure windowed-sinc kernel AS the native backend: the
    dispatch path end-to-end must be bit-identical to calling the kernel
    directly — the parity harness the soxr/scipy tests reuse with a
    tolerance."""
    from mapreduce_machine_learning_spark.sources.resample import resample_audio

    native.register_backend("resample", resample_audio, name="identity")
    x = _tone(n=1000)
    for ri, ro in ((8000, 16000), (44100, 16000), (16000, 22050)):
        got = native.native_resample_audio(x, ri, ro)
        assert got is not None
        assert np.array_equal(got, resample_audio(x, ri, ro)), (ri, ro)


def test_conform_length_trims_and_zero_pads():
    y = np.arange(10, dtype=np.int16)
    assert np.array_equal(native._conform_length(y, 8), y[:8])
    padded = native._conform_length(y, 12)
    assert len(padded) == 12 and padded.dtype == np.int16
    assert np.array_equal(padded[:10], y) and not padded[10:].any()
    assert np.array_equal(native._conform_length(y, 10), y)


def test_invalid_backend_kind_rejected():
    with pytest.raises(ValueError):
        native.register_backend("video", lambda p: p)


# ---------------------------------------------------------------------------
# real resample backends — run wherever soxr / scipy is installed


def _resample_parity(backend_fn, tol_levels=400):
    """Interior-sample agreement with the pure kernel on passband
    content: both are good SRCs, so they agree to the pure kernel's
    ~44 dB stopband/transition error (~-40 dB of full scale on a
    12000-amplitude tone); edges excluded by one filter support."""
    from mapreduce_machine_learning_spark.sources.resample import resample_audio

    x = _tone(n=4000, rate_div=40)  # low-frequency tone, well in passband
    for ri, ro in ((8000, 16000), (44100, 16000)):
        got = backend_fn(x, ri, ro)
        pure = resample_audio(x, ri, ro)
        assert len(got) == len(pure)
        edge = int(np.ceil(64 * max(1.0, ri / ro)))
        interior = slice(edge, -edge)
        diff = np.abs(
            got[interior].astype(np.int32) - pure[interior].astype(np.int32)
        )
        assert diff.max() <= tol_levels, (ri, ro, int(diff.max()))


def test_soxr_resample_parity():
    pytest.importorskip("soxr")
    native.clear_backends()
    assert native.active_resample_backend() == "soxr"
    _resample_parity(lambda s, ri, ro: native.native_resample_audio(s, ri, ro))


def test_scipy_resample_parity():
    pytest.importorskip("scipy")
    native.clear_backends()
    native.register_backend("resample", native._scipy_resample, name="scipy")
    _resample_parity(lambda s, ri, ro: native.native_resample_audio(s, ri, ro))


def test_soundfile_parity_pcm_exact():
    pytest.importorskip("soundfile")
    native.clear_backends()
    assert native.active_audio_backend() == "soundfile"
    from mapreduce_machine_learning_spark.sources.flac import encode_flac

    x = _tone(1200)
    for name, payload, rate in (
        ("wav", encode_wav(x, 16000), 16000),
        ("flac", encode_flac(x, 16000), 16000),
        ("aiff", encode_aiff(x, 22050), 22050),
        ("au", encode_au(x, 8000), 8000),
    ):
        got_s, got_r = decode_audio(payload)
        native.set_backend("pure")
        pure_s, pure_r = decode_audio(payload)
        native.set_backend("auto")
        assert got_r == pure_r == rate, name
        assert np.array_equal(got_s, pure_s), name
