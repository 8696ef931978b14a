"""TGA codec (sources/tga.py): bit-exact round trips across type/RLE/
origin axes, the structural sniff (TGA has no magic), cross-scanline
RLE packets, quarantine, and a seeded fuzz pin."""

import numpy as np
import pytest

from mapreduce_machine_learning_spark.sources.tga import (
    decode_tga,
    encode_tga,
    is_tga,
)


def _rgb(h=11, w=14, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint16).astype(np.uint8)


@pytest.mark.parametrize("rle", [False, True])
@pytest.mark.parametrize("top_down", [True, False])
def test_rgb_roundtrip_all_axes(rle, top_down):
    a = _rgb()
    payload = encode_tga(a, rle=rle, top_down=top_down)
    assert is_tga(payload)
    assert np.array_equal(decode_tga(payload), a)


@pytest.mark.parametrize("rle", [False, True])
def test_gray_roundtrip_replicates(rle):
    g = (np.arange(120, dtype=np.uint8).reshape(10, 12) * 2) % 256
    out = decode_tga(encode_tga(g, rle=rle))
    for c in range(3):
        assert np.array_equal(out[..., c], g)


def test_rle_actually_compresses_runs():
    a = np.zeros((16, 64, 3), np.uint8)
    a[:, :32] = (200, 10, 30)
    raw = encode_tga(a, rle=False)
    packed = encode_tga(a, rle=True)
    assert len(packed) < len(raw) // 4
    assert np.array_equal(decode_tga(packed), a)


def test_rle_packets_crossing_scanlines_decode():
    """The spec allows a run to cross row boundaries; hand-build one:
    4x2 solid image as a single 8-pixel run packet."""
    hdr = bytes([0, 0, 10, 0, 0, 0, 0, 0, 0, 0, 0, 0, 4, 0, 2, 0, 24, 0x20])
    payload = hdr + bytes([0x87]) + bytes([10, 20, 30])  # 8-px run, BGR
    out = decode_tga(payload)
    assert out.shape == (2, 4, 3)
    assert (out == (30, 20, 10)).all()


def test_id_field_skipped():
    a = _rgb(4, 5)
    payload = bytearray(encode_tga(a))
    payload[0] = 7  # declare a 7-byte id field
    payload[18:18] = b"COMMENT"
    assert np.array_equal(decode_tga(bytes(payload)), a)


def test_sniff_rejects_other_formats_and_junk():
    from mapreduce_machine_learning_spark.sources.multimodal import (
        encode_bmp,
        encode_png,
        encode_wav,
    )
    from mapreduce_machine_learning_spark.sources.netpbm import encode_netpbm

    a = _rgb(8, 8)
    x = (np.sin(np.arange(500) / 9) * 9000).astype(np.int16)
    for payload in (
        encode_bmp(a),
        encode_png(a),
        encode_netpbm(a),
        encode_wav(x, 8000),
        b"\x00" * 17,  # too short
    ):
        assert not is_tga(bytes(payload))


def test_quarantine_paths():
    a = _rgb(8, 8)
    good_raw = encode_tga(a)
    good_rle = encode_tga(a, rle=True)
    with pytest.raises(NotImplementedError):
        decode_tga(good_raw[:30])  # truncated pixels (fails the sniff)
    with pytest.raises(NotImplementedError):
        decode_tga(good_rle[:25])  # truncated RLE stream
    # color-mapped type is out of surface
    cm = bytearray(good_raw)
    cm[1], cm[2] = 1, 1
    with pytest.raises(NotImplementedError):
        decode_tga(bytes(cm))
    # 16-bit truecolor is out of surface
    b16 = bytearray(good_raw)
    b16[16] = 16
    with pytest.raises(NotImplementedError):
        decode_tga(bytes(b16))


def test_pipeline_dispatch_and_features():
    from mapreduce_machine_learning_spark.sources.multimodal import (
        decode_image,
        features_for,
        real_image_features,
    )

    a = _rgb(9, 9, seed=8)
    payload = encode_tga(a, rle=True)
    assert np.array_equal(decode_image(payload), a)
    assert features_for(payload) == pytest.approx(real_image_features(a))


def test_catalog_reports_tga():
    from mapreduce_machine_learning_spark.sources.mediainfo import media_info

    a = _rgb(6, 9)
    info = media_info(encode_tga(a, rle=True))
    assert info["container"] == "tga"
    assert info["codec"] == "rle24"
    assert (info["width"], info["height"]) == (9, 6)
    assert info["decodable"] is True
    info2 = media_info(encode_tga(a))
    assert info2["codec"] == "raw24"


def test_fuzzed_tga_decoder_quarantines_or_decodes():
    """Same decoder-level quarantine pin as the other round-13 codecs."""
    rng = np.random.default_rng(1341)
    a = _rgb(12, 16, seed=4)
    bases = [encode_tga(a), encode_tga(a, rle=True, top_down=False)]
    for base in bases:
        for trial in range(200):
            p = bytearray(base)
            if trial % 3 == 2:
                p = p[: int(rng.integers(1, len(p)))]
            else:
                for _ in range(int(rng.integers(1, 8))):
                    p[int(rng.integers(0, len(p)))] = int(rng.integers(0, 256))
            try:
                decode_tga(bytes(p))
            except NotImplementedError:
                pass  # the quarantine contract
