"""GIF codec (sources/gif.py): pure-Python LZW + numpy, no image library.

GIF is palette-indexed with lossless LZW, so — like BMP/PNG — round-trips
are BIT-EXACT. These tests pin: index/RGB round-trips across palette
sizes and geometries, animated multi-frame streams, the 4-pass GIF
interlace, transparency compositing, disposal methods, the LZW KwKwK
corner case (hand-packed codes), the >256-color quantization seam, the
corrupt-payload quarantine, and the pipeline dispatch (still GIF = image
features, animated GIF = video features, exact NN resize via palette
re-encode).
"""

import struct

import numpy as np
import pytest

from mapreduce_machine_learning_spark.sources.gif import (
    _INTERLACE,
    _lzw_decode,
    decode_gif,
    encode_gif,
    encode_gif_rgb,
    is_gif,
)
from mapreduce_machine_learning_spark.sources.multimodal import (
    decode_image,
    fake_features,
    features_for,
    real_image_features,
    resize_image,
)
from mapreduce_machine_learning_spark.sources.avi import real_video_features

PAL16 = np.stack(
    [
        np.arange(16) * 17,
        np.arange(16) * 13 % 256,
        255 - np.arange(16) * 11 % 256,
    ],
    axis=1,
).astype(np.uint8)


def test_round_trip_exact_across_palettes_and_sizes():
    rng = np.random.default_rng(1)
    for n_colors in (2, 4, 16, 256):
        pal = rng.integers(0, 256, (n_colors, 3)).astype(np.uint8)
        for h, w in ((1, 1), (7, 9), (13, 21)):
            idx = rng.integers(0, n_colors, (h, w)).astype(np.uint8)
            payload = encode_gif([idx], pal)
            assert is_gif(payload)
            out = decode_gif(payload)
            assert out.shape == (1, h, w, 3)
            assert np.array_equal(out[0], pal[idx]), (n_colors, h, w)


def test_animated_round_trip_exact():
    rng = np.random.default_rng(2)
    frames = [rng.integers(0, 16, (9, 11)).astype(np.uint8) for _ in range(4)]
    out = decode_gif(encode_gif(frames, PAL16, delay_cs=5))
    assert out.shape == (4, 9, 11, 3)
    for t, f in enumerate(frames):
        assert np.array_equal(out[t], PAL16[f]), t


def test_rgb_reencode_exact_and_quantization_seam():
    rng = np.random.default_rng(3)
    frames = [PAL16[rng.integers(0, 16, (9, 12))] for _ in range(3)]
    assert np.array_equal(
        decode_gif(encode_gif_rgb(frames)), np.stack(frames)
    )
    # >256 distinct colors cannot re-encode without (lossy) quantization
    noise = rng.integers(0, 256, (20, 20, 3)).astype(np.uint8)
    with pytest.raises(NotImplementedError, match="quantization"):
        encode_gif_rgb([noise])


def test_interlaced_stream_deinterlaces():
    # rewrite a sequential stream as interlaced: rows reordered into the
    # 4-pass layout and the interlace flag set on the image descriptor
    rng = np.random.default_rng(4)
    h, w = 13, 6
    idx = rng.integers(0, 16, (h, w)).astype(np.uint8)
    rows = []
    for start, step in _INTERLACE:
        rows.extend(range(start, h, step))
    payload = bytearray(encode_gif([idx[rows]], PAL16))
    at = bytes(payload).find(b"\x2c")  # image descriptor
    payload[at + 9] |= 0x40  # set the interlace flag
    out = decode_gif(bytes(payload))
    assert np.array_equal(out[0], PAL16[idx])


def test_transparency_composites_onto_previous_frame():
    base = np.zeros((4, 4), np.uint8)
    overlay = np.full((4, 4), 2, np.uint8)
    overlay[1:3, 1:3] = 1  # index 1 will be declared transparent
    payload = bytearray(encode_gif([base, overlay], PAL16))
    # the SECOND graphic control extension: set transparency flag + index
    first = bytes(payload).find(b"\x21\xf9")
    second = bytes(payload).find(b"\x21\xf9", first + 2)
    payload[second + 3] |= 0x01  # transparent-color flag
    payload[second + 6] = 1  # transparent index
    out = decode_gif(bytes(payload))
    want = PAL16[overlay].copy()
    want[1:3, 1:3] = PAL16[base[1:3, 1:3]]  # transparent: frame 1 shows
    assert np.array_equal(out[1], want)


def test_lzw_kwkwk_corner_case():
    # hand-packed stream for min_code_size=2: CLEAR(4), literal 1, then
    # code 6 == len(table) — the KwKwK case, decoding to prev + prev[0]
    codes, width = [4, 1, 6, 5], 3
    acc = n = 0
    data = bytearray()
    for c in codes:
        acc |= c << n
        n += width
        while n >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        data.append(acc & 0xFF)
    assert _lzw_decode(2, bytes(data), 3).tolist() == [1, 1, 1]


def test_seams_and_quarantine():
    with pytest.raises(NotImplementedError, match="not a GIF"):
        decode_gif(b"BM" + bytes(40))
    # truncated LZW data
    good = encode_gif([np.zeros((4, 4), np.uint8)], PAL16)
    with pytest.raises(NotImplementedError):
        decode_gif(good[:20] + b"\x3b")
    # corrupt GIF quarantines through the dispatcher
    corrupt = b"GIF89a" + b"\x07" * 40
    assert list(features_for(corrupt)) == list(fake_features(corrupt))


def test_pipeline_dispatch_image_vs_video():
    rng = np.random.default_rng(5)
    still = encode_gif([rng.integers(0, 16, (8, 10)).astype(np.uint8)], PAL16)
    animated = encode_gif(
        [rng.integers(0, 16, (8, 10)).astype(np.uint8) for _ in range(3)],
        PAL16,
    )
    # still GIF: image features of the (only) frame, via decode_image
    assert list(features_for(still)) == list(
        real_image_features(decode_image(still))
    )
    # animated GIF: video features over all frames
    assert list(features_for(animated)) == list(
        real_video_features(decode_gif(animated))
    )


def test_resize_is_exact_and_format_preserving():
    rng = np.random.default_rng(6)
    idx = rng.integers(0, 16, (12, 16)).astype(np.uint8)
    payload = encode_gif([idx], PAL16)
    out = resize_image(payload, 8, 6)
    assert is_gif(out)  # GIF in -> GIF out
    src = decode_image(payload)
    yi = np.minimum((np.arange(6) * 12) // 6, 11)
    xi = np.minimum((np.arange(8) * 16) // 8, 15)
    # NN resample never invents a color -> palette re-encode is EXACT
    assert np.array_equal(decode_image(out), src[yi][:, xi])


# ---- round 10: >256-color quantization (opt-in median cut) ----

from mapreduce_machine_learning_spark.sources.gif import (  # noqa: E402
    encode_gif_rgb,
    quantize_colors,
)


def test_quantize_opt_in_closes_the_256_color_seam():
    yy, xx = np.mgrid[0:40, 0:60]
    grad = np.stack(
        [(xx * 4) % 256, (yy * 6) % 256, ((xx + yy) * 3) % 256], axis=2
    ).astype(np.uint8)
    assert len(np.unique(grad.reshape(-1, 3), axis=0)) > 256
    # the DEFAULT still refuses — quantization stays an explicit choice
    with pytest.raises(NotImplementedError, match="quantization"):
        encode_gif_rgb([grad])
    back = decode_gif(encode_gif_rgb([grad], quantize=True))[0]
    assert back.shape == grad.shape
    assert len(np.unique(back.reshape(-1, 3), axis=0)) <= 256
    err = np.abs(back.astype(int) - grad.astype(int))
    # smooth content quantizes tightly; a channel-swap or box-mapping bug
    # blows far past this (hand-verified ~100+)
    assert err.max() <= 24 and err.mean() <= 8.0, (err.max(), err.mean())


def test_quantize_noise_bounded_and_deterministic():
    rng = np.random.default_rng(11)
    noise = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    p1 = encode_gif_rgb([noise], quantize=True)
    p2 = encode_gif_rgb([noise], quantize=True)
    assert p1 == p2  # same input -> byte-identical stream
    back = decode_gif(p1)[0]
    err = np.abs(back.astype(int) - noise.astype(int))
    # 16.7M-color noise into 256 cells: generous but bug-detecting bound
    assert err.max() <= 48 and err.mean() <= 16.0, (err.max(), err.mean())


def test_quantize_flag_keeps_small_palettes_exact():
    yy, xx = np.mgrid[0:24, 0:24]
    small = (
        np.stack([(xx * 4) % 256, (yy * 6) % 256, ((xx + yy) * 3) % 256],
                 axis=2).astype(np.uint8) // 64 * 64
    )
    assert len(np.unique(small.reshape(-1, 3), axis=0)) <= 256
    back = decode_gif(encode_gif_rgb([small], quantize=True))[0]
    assert np.array_equal(back, small)  # lossless when lossless is possible


def test_quantize_colors_shapes_and_weighting():
    rng = np.random.default_rng(4)
    frames = [rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
              for _ in range(3)]
    palette, idx = quantize_colors(frames, 256)
    assert palette.shape[0] in (256,) and palette.dtype == np.uint8
    assert len(idx) == 3 and all(i.shape == (16, 16) for i in idx)
    assert all(i.max() < palette.shape[0] for i in idx)
    # a dominant color must survive quantization almost exactly: weight
    # by count means a 90%-red image keeps red as a palette entry
    dom = np.zeros((32, 32, 3), np.uint8)
    dom[..., 0] = 200
    dom[:4, :4] = rng.integers(0, 256, (4, 4, 3))
    pal2, idx2 = quantize_colors([dom], 16)
    main = pal2[idx2[0][16, 16]]
    assert np.abs(main.astype(int) - [200, 0, 0]).max() <= 4
