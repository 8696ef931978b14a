"""Y4M codec (sources/y4m.py): header parsing, colorspace round trips,
BT.601 conversion anchors, the quarantine seam, and composition with
the frame-sampling / resize stages."""

import numpy as np
import pytest

from mapreduce_machine_learning_spark.sources.y4m import (
    _rgb_to_yuv,
    _yuv_to_rgb,
    decode_y4m,
    encode_y4m,
    is_y4m,
    y4m_fps,
)


def _frames(n=3, h=8, w=12, seed=5):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n, h, w, 3), dtype=np.uint16).astype(
        np.uint8
    )


# ---------------------------------------------------------------------------
# conversion anchors — published BT.601 limited-range values


def test_bt601_anchor_values():
    # pure black, white, red in full-range RGB
    rgb = np.array(
        [[[0, 0, 0], [255, 255, 255], [255, 0, 0]]], dtype=np.uint8
    )
    y, u, v = _rgb_to_yuv(rgb)
    assert y.tolist() == [[16, 235, 81]]  # red: 16 + 65.481 -> 81
    assert u.tolist() == [[128, 128, 90]]
    assert v.tolist() == [[128, 128, 240]]
    # and back within rounding
    back = _yuv_to_rgb(y, u, v)
    assert np.abs(back.astype(int) - rgb.astype(int)).max() <= 2


def test_444_roundtrip_within_quantization():
    f = _frames()
    out = decode_y4m(encode_y4m(f, fps=10, colorspace="444"))
    assert out.shape == f.shape
    assert np.abs(out.astype(int) - f.astype(int)).max() <= 2


@pytest.mark.parametrize("cs", ["422", "420jpeg"])
def test_subsampled_modes_lossy_but_close_on_flat_content(cs):
    # flat color blocks survive chroma subsampling almost exactly
    f = np.zeros((2, 8, 12, 3), np.uint8)
    f[0] = (200, 40, 90)
    f[1] = (10, 220, 130)
    out = decode_y4m(encode_y4m(f, fps=10, colorspace=cs))
    assert out.shape == f.shape
    assert np.abs(out.astype(int) - f.astype(int)).max() <= 3


def test_mono_roundtrip_is_grayscale():
    f = _frames(2, 8, 8)
    out = decode_y4m(encode_y4m(f, fps=5, colorspace="mono"))
    # all three channels close to each other (gray) and to luma
    assert np.abs(out[..., 0].astype(int) - out[..., 1].astype(int)).max() <= 2
    y, _u, _v = _rgb_to_yuv(f)
    yr = _yuv_to_rgb(y, np.full_like(y, 128), np.full_like(y, 128))
    assert np.array_equal(out, yr)


def test_fps_and_header_defaults():
    f = _frames(1)
    payload = encode_y4m(f, fps=30)
    assert is_y4m(payload)
    assert y4m_fps(payload) == 30.0
    # hand-built header without F: spec default 25, C absent -> 420
    raw = b"YUV4MPEG2 W4 H4\nFRAME\n" + bytes(16 + 4 + 4)
    assert y4m_fps(raw) == 25.0
    assert decode_y4m(raw).shape == (1, 4, 4, 3)


def test_multiframe_and_dims_survive():
    f = _frames(5, 6, 10)
    out = decode_y4m(encode_y4m(f, fps=12, colorspace="444"))
    assert out.shape == (5, 6, 10, 3)


# ---------------------------------------------------------------------------
# quarantine seam


def test_quarantine_paths():
    f = _frames(2, 8, 8)
    good = encode_y4m(f, fps=10, colorspace="420jpeg")
    with pytest.raises(NotImplementedError):
        decode_y4m(b"NOT A Y4M")
    with pytest.raises(NotImplementedError):
        decode_y4m(b"YUV4MPEG2 W8 H8 C420jpeg\n")  # no frames
    with pytest.raises(NotImplementedError):
        decode_y4m(good[:-5])  # truncated final frame
    with pytest.raises(NotImplementedError):
        decode_y4m(good.replace(b"C420jpeg", b"C411zzzz"))  # bad colorspace
    with pytest.raises(NotImplementedError):
        # odd dimensions under 4:2:0
        decode_y4m(b"YUV4MPEG2 W7 H8 C420\n" + b"FRAME\n" + bytes(100))
    with pytest.raises(NotImplementedError):
        # per-frame parameters are out of surface
        decode_y4m(
            good.replace(b"FRAME\n", b"FRAME Ix\n", 1)
        )
    with pytest.raises(NotImplementedError):
        decode_y4m(b"YUV4MPEG2 W0 H8\nFRAME\n")  # zero width
    with pytest.raises(NotImplementedError):
        decode_y4m(b"YUV4MPEG2 W8 H8 F0:1\nFRAME\n" + bytes(96))  # 0 fps
    with pytest.raises(NotImplementedError):
        decode_y4m(b"YUV4MPEG2 W8 H8 Zq\nFRAME\n" + bytes(96))  # bad key


def test_encoder_validation():
    with pytest.raises(ValueError):
        encode_y4m(np.zeros((4, 4, 3), np.uint8))  # missing frame axis
    with pytest.raises(ValueError):
        encode_y4m(_frames(1, 7, 7), colorspace="420jpeg")  # odd dims
    with pytest.raises(ValueError):
        encode_y4m(_frames(1), colorspace="440")


# ---------------------------------------------------------------------------
# pipeline composition


def test_features_and_frame_sampling_see_real_y4m(spark):
    from mapreduce_machine_learning_spark.sources.multimodal import (
        decode_image,
        features_for,
        real_video_features,
        sample_frames,
        synth_media_real,
    )

    f = _frames(4, 8, 12, seed=9)
    payload = encode_y4m(f, fps=10, colorspace="444")
    want = real_video_features(decode_y4m(payload))
    assert features_for(payload) == pytest.approx(want)
    # frame sampling yields REAL decoded frames, BMP-re-encoded
    media = synth_media_real(spark, n=48)
    y4m_rows = [
        r
        for r in media.collect()
        if r.kind == "video" and is_y4m(bytes(r.payload))
    ]
    assert y4m_rows, "rotation must emit Y4M rows"
    out = sample_frames(media, n_frames=2).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.media_id, []).append(r)
    for row in y4m_rows:
        frames = decode_y4m(bytes(row.payload))
        got = sorted(by_id[row.media_id], key=lambda r: r.frame_idx)
        assert len(got) == 2
        # first sampled frame is frame 0, decoded and BMP-round-tripped
        first = decode_image(bytes(got[0].frame_payload))
        assert np.array_equal(first, frames[0])


def test_fuzzed_y4m_decoder_quarantines_or_decodes():
    """Decoder-level quarantine contract: mutated Y4M either decodes or
    raises NotImplementedError (non-UTF8 junk in header tokens included
    — error messages must not themselves throw). Seeded slice of the
    clean round-13 unseeded sweep."""
    rng = np.random.default_rng(1313)
    f = _frames(3, 8, 12, seed=2)
    bases = [
        encode_y4m(f, fps=10, colorspace="444"),
        encode_y4m(f, fps=10, colorspace="420jpeg"),
        encode_y4m(f, fps=10, colorspace="mono"),
    ]
    for base in bases:
        for trial in range(150):
            p = bytearray(base)
            if trial % 3 == 2:
                p = p[: int(rng.integers(1, len(p)))]
            else:
                for _ in range(int(rng.integers(1, 8))):
                    p[int(rng.integers(0, len(p)))] = int(rng.integers(0, 256))
            try:
                decode_y4m(bytes(p))
            except NotImplementedError:
                pass  # the quarantine contract
