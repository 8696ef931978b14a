"""Property-based invariants over the in-container media codecs.

No Spark here — the codecs are pure per-payload functions, so hypothesis
can run many more examples than the frame-level properties afford. Pinned
per format: the LOSSLESS codecs (BMP, PNG sequential + Adam7, WAV, AVI)
round-trip bit-exactly on arbitrary arrays, and the LOSSY one (JPEG)
round-trips within a fixed error bound and exact dimensions on arbitrary
arrays at every sampling geometry — with the dispatcher
(``features_for``) total on arbitrary bytes: real features or the md5
stand-in, never an exception (the quarantine contract).
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mapreduce_machine_learning_spark.sources.avi import (
    decode_avi,
    encode_avi,
)
from mapreduce_machine_learning_spark.sources.gif import (
    decode_gif,
    encode_gif,
)
from mapreduce_machine_learning_spark.sources.jpeg import (
    decode_jpeg,
    encode_jpeg,
)
from mapreduce_machine_learning_spark.sources.multimodal import (
    decode_bmp,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_wav,
    features_for,
    FEATURE_DIM,
)

SETTINGS = settings(max_examples=40, deadline=None)

dims = st.tuples(
    st.integers(min_value=1, max_value=21),  # h
    st.integers(min_value=1, max_value=21),  # w
)


def _arr(h, w, seed):
    return (
        np.random.default_rng(seed)
        .integers(0, 256, (h, w, 3))
        .astype(np.uint8)
    )


@given(hw=dims, seed=st.integers(0, 2**31))
@SETTINGS
def test_bmp_and_png_round_trip_exact(hw, seed):
    a = _arr(*hw, seed)
    assert np.array_equal(decode_bmp(encode_bmp(a)), a)
    assert np.array_equal(decode_png(encode_png(a)), a)
    assert np.array_equal(decode_png(encode_png(a, interlace=True)), a)


@given(hw=dims, seed=st.integers(0, 2**31), sub=st.sampled_from(
    [False, True, (2, 1), (1, 2)]
), q=st.integers(min_value=70, max_value=100))
@SETTINGS
def test_jpeg_round_trip_bounded(hw, seed, sub, q):
    a = _arr(*hw, seed)
    back = decode_jpeg(encode_jpeg(a, quality=q, subsample=sub))
    assert back.shape == a.shape
    # compare the BT.601 LUMA the codec actually codes at full
    # resolution (an unweighted RGB mean leaks subsampled-chroma error,
    # which on noise is unrecoverable by design). Random noise at q70 is
    # the worst case and legitimately costs ~45-50 counts on a
    # high-frequency block — so this is a BUG bound, not a precision
    # bound: channel swaps, block misplacement, or DC-predictor bugs all
    # blow past 64 (hand-verified at ~128+), honest quantization never did
    def luma(x):
        f = x.astype(np.float64)
        return 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]

    assert np.abs(luma(back) - luma(a)).max() <= 64


@given(
    n=st.integers(min_value=1, max_value=300),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31),
)
@SETTINGS
def test_wav_round_trip_exact(n, rate, seed):
    samples = (
        np.random.default_rng(seed)
        .integers(-32768, 32768, n)
        .astype(np.int16)
    )
    back, got_rate = decode_wav(encode_wav(samples, rate))
    assert got_rate == rate
    assert np.array_equal(back, samples)


@given(
    hw=dims,
    n_frames=st.integers(min_value=1, max_value=5),
    seed=st.integers(0, 2**31),
)
@SETTINGS
def test_avi_round_trip_exact(hw, n_frames, seed):
    frames = [_arr(*hw, seed + i) for i in range(n_frames)]
    back = decode_avi(encode_avi(frames, fps=7))
    assert np.array_equal(back, np.stack(frames))


@given(
    hw=dims,
    n_frames=st.integers(min_value=1, max_value=4),
    n_colors=st.sampled_from([2, 4, 16, 256]),
    seed=st.integers(0, 2**31),
)
@SETTINGS
def test_gif_round_trip_exact(hw, n_frames, n_colors, seed):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (n_colors, 3)).astype(np.uint8)
    frames = [
        rng.integers(0, n_colors, hw).astype(np.uint8)
        for _ in range(n_frames)
    ]
    back = decode_gif(encode_gif(frames, pal))
    assert np.array_equal(back, pal[np.stack(frames)])


@given(payload=st.binary(min_size=0, max_size=200))
@SETTINGS
def test_features_for_is_total_on_arbitrary_bytes(payload):
    # ANY byte string — including ones that start with a real magic and
    # then lie — must produce FEATURE_DIM finite floats, never raise
    feats = features_for(payload)
    assert feats.shape == (FEATURE_DIM,)
    assert np.isfinite(feats).all()


@given(payload=st.binary(min_size=0, max_size=64))
@SETTINGS
def test_features_for_magic_prefixed_garbage(payload):
    for magic in (b"BM", b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff", b"GIF89a",
                  b"RIFF\x20\x00\x00\x00WAVE", b"RIFF\x20\x00\x00\x00AVI "):
        feats = features_for(magic + payload)
        assert feats.shape == (FEATURE_DIM,)
        assert np.isfinite(feats).all()


@given(
    hw=dims,
    seed=st.integers(0, 2**31),
    sub=st.sampled_from([False, True, (2, 1), (1, 2)]),
    q=st.integers(min_value=50, max_value=100),
    ri=st.sampled_from([0, 0, 0, 1, 3]),
)
@SETTINGS
def test_progressive_jpeg_equals_baseline_exactly(hw, seed, sub, q, ri):
    # property-generated progressive corpus (VERDICT r9 #7): a progressive
    # stream carries the same quantized coefficients as its baseline twin,
    # so decode() must be BIT-IDENTICAL — the strongest cross-check two
    # in-container codecs can give each other, and it pins every scan
    # kind (spectral bands, DC/AC refinement, EOB runs, restarts)
    from mapreduce_machine_learning_spark.sources.jpeg import (
        encode_jpeg_progressive,
    )

    a = _arr(*hw, seed)
    base = decode_jpeg(encode_jpeg(a, quality=q, subsample=sub))
    prog = decode_jpeg(
        encode_jpeg_progressive(
            a, quality=q, subsample=sub, restart_interval=ri
        )
    )
    assert np.array_equal(base, prog)
