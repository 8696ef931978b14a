"""Netpbm codec (sources/netpbm.py): bit-exact round trips for all six
kinds, 16-bit normalization, header tokenizer edge cases, quarantine,
and a seeded fuzz pin."""

import numpy as np
import pytest

from mapreduce_machine_learning_spark.sources.netpbm import (
    decode_netpbm,
    encode_netpbm,
    is_netpbm,
)


def _rgb(h=9, w=13, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint16).astype(np.uint8)


def _gray(h=7, w=11, seed=5):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w), dtype=np.uint16).astype(np.uint8)


@pytest.mark.parametrize("kind", [6, 3])
def test_rgb_roundtrip_binary_and_ascii(kind):
    a = _rgb()
    payload = encode_netpbm(a, kind=kind)
    assert is_netpbm(payload)
    assert np.array_equal(decode_netpbm(payload), a)


@pytest.mark.parametrize("kind", [5, 2])
def test_gray_roundtrip_replicates_channels(kind):
    g = _gray()
    out = decode_netpbm(encode_netpbm(g, kind=kind))
    for c in range(3):
        assert np.array_equal(out[..., c], g)


@pytest.mark.parametrize("kind", [4, 1])
def test_bitmap_roundtrip_and_black_convention(kind):
    rng = np.random.default_rng(11)
    bm = (rng.integers(0, 2, (10, 19)) * 255).astype(np.uint8)
    out = decode_netpbm(encode_netpbm(bm, kind=kind))
    assert np.array_equal(out[..., 0], bm)  # 1=black inverts back
    # P4 row padding: width not divisible by 8 exercises the bit slice
    bm2 = (np.eye(5, 13) * 255).astype(np.uint8)
    assert np.array_equal(
        decode_netpbm(encode_netpbm(bm2, kind=4))[..., 0], bm2
    )


def test_16bit_bigendian_normalization():
    # hand-built P5 with maxval 65535: value v -> round(v*255/65535)
    vals = np.array([[0, 32768, 65535]], dtype=">u2")
    payload = b"P5\n3 1\n65535\n" + vals.tobytes()
    out = decode_netpbm(payload)
    assert out[0, :, 0].tolist() == [0, 128, 255]
    # odd maxval scaling (maxval 100, value 50 -> 128)
    p2 = b"P2\n2 1\n100\n50 100\n"
    assert decode_netpbm(p2)[0, :, 0].tolist() == [128, 255]


def test_header_comments_and_whitespace_runs():
    a = _gray(2, 3, seed=7)
    body = a.tobytes()
    payload = b"P5 # pixmap\n# another comment\n  3\t\t2 # dims\n255\n" + body
    assert np.array_equal(decode_netpbm(payload)[..., 0], a)


def test_multi_image_stream_decodes_first():
    a, b = _gray(4, 4, seed=1), _gray(4, 4, seed=2)
    stream = encode_netpbm(a, kind=5) + encode_netpbm(b, kind=5)[3:]
    assert np.array_equal(decode_netpbm(stream)[..., 0], a)


def test_quarantine_paths():
    a = _rgb(4, 4)
    good = encode_netpbm(a)
    with pytest.raises(NotImplementedError):
        decode_netpbm(b"P7\n")  # PAM is out of surface (not 1..6)
    with pytest.raises(NotImplementedError):
        decode_netpbm(good[:-5])  # truncated pixels
    with pytest.raises(NotImplementedError):
        decode_netpbm(b"P6\n4 4\n")  # header truncated
    with pytest.raises(NotImplementedError):
        decode_netpbm(b"P6\n4 x\n255\n" + bytes(48))  # non-integer dim
    with pytest.raises(NotImplementedError):
        decode_netpbm(b"P6\n0 4\n255\n")  # zero width
    with pytest.raises(NotImplementedError):
        decode_netpbm(b"P2\n2 1\n100\n50 101\n")  # sample > maxval
    with pytest.raises(NotImplementedError):
        decode_netpbm(b"P6\n4 4\n0\n" + bytes(48))  # maxval 0
    with pytest.raises(NotImplementedError):
        decode_netpbm(b"P1\n2 1\n0 2\n")  # non-bit in a bitmap


def test_encoder_validation():
    with pytest.raises(ValueError):
        encode_netpbm(_rgb(), kind=5)  # colored input for a graymap
    with pytest.raises(ValueError):
        encode_netpbm(_gray() // 3, kind=4)  # non-0/255 bitmap input
    with pytest.raises(ValueError):
        encode_netpbm(np.zeros((4, 4, 2), np.uint8), kind=6)


def test_pipeline_dispatch_and_features():
    from mapreduce_machine_learning_spark.sources.multimodal import (
        decode_image,
        features_for,
        real_image_features,
    )

    a = _rgb(8, 8, seed=9)
    payload = encode_netpbm(a)
    assert np.array_equal(decode_image(payload), a)
    assert features_for(payload) == pytest.approx(
        real_image_features(a)
    )


def test_fuzzed_netpbm_decoder_quarantines_or_decodes():
    """Same decoder-level quarantine pin as the other round-13 codecs."""
    rng = np.random.default_rng(1323)
    a = _rgb(12, 16, seed=4)
    bases = [
        encode_netpbm(a, kind=6),
        encode_netpbm(a, kind=3),
        encode_netpbm((_gray(8, 9) > 128).astype(np.uint8) * 255, kind=4),
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
                decode_netpbm(bytes(p))
            except NotImplementedError:
                pass  # the quarantine contract
