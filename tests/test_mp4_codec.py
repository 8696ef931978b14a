"""MP4/MOV container (sources/mp4.py): sample-table resolution in both
chunk layouts, MJPEG frame decode parity with the JPEG codec, named
quarantine for compressed codecs, structural quarantine, and a seeded
fuzz pin."""

import struct

import numpy as np
import pytest

from mapreduce_machine_learning_spark.sources.jpeg import (
    decode_jpeg,
    encode_jpeg,
)
from mapreduce_machine_learning_spark.sources.mp4 import (
    decode_mp4,
    encode_mp4_mjpeg,
    is_mp4,
    mp4_fps,
    mp4_video_codec,
)


def _frames(n=4, h=16, w=24, seed=3):
    rng = np.random.default_rng(seed)
    return [
        rng.integers(0, 256, (h, w, 3), dtype=np.uint16).astype(np.uint8)
        for _ in range(n)
    ]


def test_mjpeg_roundtrip_matches_per_sample_jpeg_decode():
    frames = _frames()
    payload = encode_mp4_mjpeg(frames, fps=12)
    assert is_mp4(payload)
    assert mp4_video_codec(payload) == "jpeg"
    assert mp4_fps(payload) == 12.0
    got = decode_mp4(payload)
    assert got.shape == (4, 16, 24, 3)
    # frame k must equal decoding that JPEG sample standalone
    for k, f in enumerate(frames):
        assert np.array_equal(got[k], decode_jpeg(encode_jpeg(f, quality=95)))


def test_one_chunk_and_chunk_per_frame_layouts_agree():
    frames = _frames(5, 8, 8, seed=7)
    one = decode_mp4(encode_mp4_mjpeg(frames, fps=10, chunked=False))
    per = decode_mp4(encode_mp4_mjpeg(frames, fps=10, chunked=True))
    assert np.array_equal(one, per)


def test_named_codec_quarantine():
    payload = bytearray(encode_mp4_mjpeg(_frames(1), fps=10))
    # patch the stsd sample description 4CC to avc1
    i = bytes(payload).index(b"jpeg", payload.index(b"stsd"))
    payload[i : i + 4] = b"avc1"
    with pytest.raises(NotImplementedError, match="H.264"):
        decode_mp4(bytes(payload))
    payload[i : i + 4] = b"vp09"
    with pytest.raises(NotImplementedError, match="VP9"):
        decode_mp4(bytes(payload))
    payload[i : i + 4] = b"zzzz"
    with pytest.raises(NotImplementedError, match="unsupported"):
        decode_mp4(bytes(payload))


def test_structural_quarantine():
    good = encode_mp4_mjpeg(_frames(2), fps=10)
    with pytest.raises(NotImplementedError):
        decode_mp4(b"\x00" * 32)  # not MP4 at all
    with pytest.raises(NotImplementedError):
        decode_mp4(good[:40])  # no moov reachable
    # moov present but mdat truncated: sample ranges overrun
    i = good.index(b"moov") - 4
    clipped = good[: len(good) // 4] + good[i:]
    with pytest.raises(NotImplementedError):
        decode_mp4(clipped)
    # lying stsz: inflate a sample size beyond the payload
    j = good.index(b"stsz")
    bad = bytearray(good)
    bad[j + 16 : j + 20] = struct.pack(">I", 1 << 30)
    with pytest.raises(NotImplementedError):
        decode_mp4(bytes(bad))


def test_audio_only_mp4_quarantines_as_no_video_track():
    # rewrite the handler subtype to 'soun': the only track stops being video
    payload = bytearray(encode_mp4_mjpeg(_frames(1), fps=10))
    i = payload.index(b"vide")
    payload[i : i + 4] = b"soun"
    with pytest.raises(NotImplementedError, match="no video track"):
        decode_mp4(bytes(payload))


def test_fps_fallback_without_stts_timing():
    payload = bytearray(encode_mp4_mjpeg(_frames(1), fps=10))
    # zero out the stts entry count: nominal 25 fps fallback
    i = payload.index(b"stts")
    payload[i + 8 : i + 12] = struct.pack(">I", 0)
    assert mp4_fps(bytes(payload)) == 25.0


def test_pipeline_dispatch_features_sampling_resize(spark):
    from mapreduce_machine_learning_spark.sources.multimodal import (
        decode_image,
        features_for,
        real_video_features,
        resize_media,
        sample_frames,
        synth_media_real,
    )

    frames = _frames(3, 12, 16, seed=11)
    payload = encode_mp4_mjpeg(frames, fps=8)
    want = real_video_features(decode_mp4(payload))
    assert features_for(payload) == pytest.approx(want)
    media = synth_media_real(spark, n=60)
    mp4_rows = [
        r
        for r in media.collect()
        if r.kind == "video" and is_mp4(bytes(r.payload))
    ]
    assert mp4_rows, "rotation must emit MP4 rows"
    # frame sampling yields real decoded frames
    out = {}
    for r in sample_frames(media, n_frames=2).collect():
        out.setdefault(r.media_id, {})[r.frame_idx] = bytes(r.frame_payload)
    for row in mp4_rows:
        fs = decode_mp4(bytes(row.payload))
        got0 = decode_image(out[row.media_id][0])
        assert np.array_equal(got0, fs[0])
    # resize keeps the container and the frame rate
    resized = {
        r.media_id: bytes(r.payload)
        for r in resize_media(media, 6, 4).collect()
    }
    for row in mp4_rows:
        rp = resized[row.media_id]
        assert is_mp4(rp)
        assert mp4_fps(rp) == mp4_fps(bytes(row.payload))
        assert decode_mp4(rp).shape[1:3] == (4, 6)


def test_fuzzed_mp4_decoder_quarantines_or_decodes():
    """Same decoder-level quarantine pin as the other round-13 codecs."""
    rng = np.random.default_rng(1331)
    bases = [
        encode_mp4_mjpeg(_frames(2, 8, 8, seed=1), fps=10),
        encode_mp4_mjpeg(_frames(3, 8, 8, seed=2), fps=10, chunked=True),
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
                decode_mp4(bytes(p))
            except NotImplementedError:
                pass  # the quarantine contract
