"""Header-only media catalog (sources/mediainfo.py + describe_media):
per-format field correctness against the encoder twins, the
beyond-the-decoders paths (lossy-WebP VP8 dims, named MP4 codecs,
Vorbis/Opus rates, MP3 frame walk), the never-raises contract, and the
Spark stage."""

import struct

import numpy as np
import pytest

from mapreduce_machine_learning_spark.sources.mediainfo import (
    is_mp3,
    media_info,
)


def _img(h=12, w=16, seed=5):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint16).astype(np.uint8)


def _tone(n=16000, rate_div=9):
    return (np.sin(np.arange(n) / rate_div) * 9000).astype(np.int16)


# ---------------------------------------------------------------------------
# decodable formats: catalog fields match encoder-twin ground truth


def test_image_formats_report_geometry_and_decodability():
    from mapreduce_machine_learning_spark.sources.jpeg import (
        encode_jpeg,
        encode_jpeg_progressive,
    )
    from mapreduce_machine_learning_spark.sources.multimodal import (
        encode_bmp,
        encode_png,
    )
    from mapreduce_machine_learning_spark.sources.netpbm import encode_netpbm
    from mapreduce_machine_learning_spark.sources.tiff import encode_tiff
    from mapreduce_machine_learning_spark.sources.webp import encode_webp

    a = _img()
    for payload, container, codec in (
        (encode_bmp(a), "bmp", "rgb24"),
        (encode_png(a), "png", "deflate"),
        (encode_jpeg(a), "jpeg", "JPEG SOF0"),
        (encode_jpeg_progressive(a), "jpeg", "JPEG SOF2"),
        (encode_webp(a), "webp", "VP8L (lossless)"),
        (encode_tiff(a, compression="lzw"), "tiff", "lzw"),
        (encode_tiff(a, compression="packbits"), "tiff", "packbits"),
        (encode_netpbm(a), "netpbm", "P6"),
    ):
        info = media_info(payload)
        assert info["container"] == container, container
        assert info["codec"] == codec, container
        assert (info["width"], info["height"]) == (16, 12), container
        assert info["decodable"] is True, container


def test_audio_formats_report_rate_and_duration():
    from mapreduce_machine_learning_spark.sources.adpcm import (
        encode_wav_ima,
        encode_wav_ms,
    )
    from mapreduce_machine_learning_spark.sources.flac import encode_flac
    from mapreduce_machine_learning_spark.sources.multimodal import encode_wav
    from mapreduce_machine_learning_spark.sources.ogg import encode_ogg_flac
    from mapreduce_machine_learning_spark.sources.pcm_codecs import (
        encode_aiff,
        encode_au,
        encode_sphere,
    )

    x = _tone(16000)  # exactly 1 s at 16 kHz
    for payload, container, codec in (
        (encode_wav(x, 16000), "wav", "pcm16"),
        (encode_wav_ima(x, 16000), "wav", "IMA ADPCM"),
        (encode_wav_ms(x, 16000), "wav", "MS ADPCM"),
        (encode_flac(x, 16000), "flac", "flac"),
        (encode_aiff(x, 16000), "aiff", "pcm16"),
        (encode_au(x, 16000, encoding=3), "au", "pcm16"),
        (encode_sphere(x, 16000), "sphere", "pcm"),
        (encode_ogg_flac(x, 16000), "ogg", "FLAC-in-Ogg"),
    ):
        info = media_info(payload)
        assert info["container"] == container, container
        assert info["codec"] == codec, container
        assert info["sample_rate"] == 16000, container
        assert abs(info["duration_ms"] - 1000) <= 5, (container, info)
        assert info["decodable"] is True, container


def test_video_formats_report_frames_and_fps_derived_duration():
    from mapreduce_machine_learning_spark.sources.avi import encode_avi
    from mapreduce_machine_learning_spark.sources.mp4 import encode_mp4_mjpeg
    from mapreduce_machine_learning_spark.sources.y4m import encode_y4m

    frames = [_img(8, 10, seed=k) for k in range(5)]
    for payload, container, codec in (
        (encode_avi(frames, fps=10), "avi", "dib"),
        (encode_avi(frames, fps=10, codec="mjpg"), "avi", "mjpg"),
        (encode_y4m(np.stack(frames), fps=10), "y4m", "rawvideo"),
        (encode_mp4_mjpeg(frames, fps=10), "mp4", "jpeg"),
    ):
        info = media_info(payload)
        assert info["container"] == container, container
        assert info["codec"] == codec, container
        assert (info["width"], info["height"]) == (10, 8), container
        assert info["n_frames"] == 5, container
        assert info["duration_ms"] == 500, container
        assert info["decodable"] is True, container


def test_gif_frame_count_without_decode():
    from mapreduce_machine_learning_spark.sources.gif import encode_gif_rgb

    frames = [(_img(6, 8, seed=k) // 40 * 40) for k in range(4)]
    info = media_info(encode_gif_rgb(frames))
    assert info["container"] == "gif"
    assert info["n_frames"] == 4
    assert (info["width"], info["height"]) == (8, 6)


# ---------------------------------------------------------------------------
# beyond the decoders: headers readable where samples are not


def test_lossy_webp_vp8_dimensions_from_frame_tag():
    # hand-built VP8 chunk: 3-byte frame tag, start code, 14-bit dims
    vp8 = (
        b"\x00\x00\x00"  # frame tag (keyframe bits irrelevant here)
        + b"\x9d\x01\x2a"
        + struct.pack("<HH", 320, 240)
    )
    payload = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(vp8))
        + b"WEBP"
        + b"VP8 "
        + struct.pack("<I", len(vp8))
        + vp8
    )
    info = media_info(payload)
    assert info["codec"] == "VP8 (lossy)"
    assert (info["width"], info["height"]) == (320, 240)
    assert info["decodable"] is False


def test_named_codec_mp4_reports_geometry():
    from mapreduce_machine_learning_spark.sources.mp4 import encode_mp4_mjpeg

    payload = bytearray(encode_mp4_mjpeg([_img(8, 10)], fps=10))
    i = bytes(payload).index(b"jpeg", payload.index(b"stsd"))
    payload[i : i + 4] = b"avc1"
    info = media_info(bytes(payload))
    assert info["codec"] == "H.264/AVC"
    assert (info["width"], info["height"]) == (10, 8)
    assert info["decodable"] is False


def test_ogg_vorbis_and_opus_rates_from_id_headers():
    def page(packet):
        seg = bytes([len(packet)])
        return (
            b"OggS\x00\x02" + b"\x00" * 20 + b"\x01" + seg + packet
        )

    # Vorbis ID header: packet type 1 + 'vorbis' + version(4) +
    # channels(1) + rate(4 LE)
    vorbis = b"\x01vorbis" + bytes(4) + b"\x02" + struct.pack("<I", 44100)
    info = media_info(page(vorbis))
    assert info["codec"] == "Vorbis"
    assert info["sample_rate"] == 44100
    assert info["decodable"] is False
    opus = b"OpusHead\x01\x02" + bytes(2) + struct.pack("<I", 48000)
    info = media_info(page(opus))
    assert info["codec"] == "Opus"
    assert info["sample_rate"] == 48000


def test_mp3_frame_walk_counts_and_duration():
    # 128 kbit/s, 44.1 kHz, no padding: frame_len = 144*128000/44100 = 417
    hdr = bytes([0xFF, 0xFB, 0x90, 0x00])
    frame = hdr + bytes(417 - 4)
    payload = frame * 38  # ~0.99 s
    assert is_mp3(payload)
    info = media_info(payload)
    assert info["container"] == "mp3"
    assert info["codec"] == "MPEG-1 Layer III"
    assert info["sample_rate"] == 44100
    assert info["n_frames"] == 38
    assert abs(info["duration_ms"] - 992) <= 1
    # with an ID3v2 tag in front (syncsafe size 100)
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 100]) + bytes(100)
    info2 = media_info(id3 + payload)
    assert info2["n_frames"] == 38


def test_g711_in_wav_named_but_not_decodable():
    # hand-built fmt tag 7 (µ-law) WAV
    fmt = struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)
    data = bytes(8000)
    wav = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    info = media_info(wav)
    assert info["codec"] == "G.711 µ-law (WAV)"
    assert info["decodable"] is False
    assert info["duration_ms"] == 1000


# ---------------------------------------------------------------------------
# the never-raises contract


def test_catalog_never_raises_on_mutations():
    from mapreduce_machine_learning_spark.sources.mp4 import encode_mp4_mjpeg
    from mapreduce_machine_learning_spark.sources.multimodal import (
        encode_png,
        encode_wav,
    )
    from mapreduce_machine_learning_spark.sources.tiff import encode_tiff

    rng = np.random.default_rng(1337)
    bases = [
        encode_png(_img()),
        encode_wav(_tone(2000), 8000),
        encode_tiff(_img(), compression="lzw"),
        encode_mp4_mjpeg([_img(8, 8)], fps=10),
        b"\xff\xfb\x90\x00" + bytes(800),
    ]
    for base in bases:
        for trial in range(200):
            p = bytearray(base)
            if trial % 3 == 2:
                p = p[: int(rng.integers(1, len(p)))]
            else:
                for _ in range(int(rng.integers(1, 10))):
                    p[int(rng.integers(0, len(p)))] = int(
                        rng.integers(0, 256)
                    )
            info = media_info(bytes(p))  # must never raise
            assert isinstance(info["container"], str)


def test_unknown_payload_degrades_cleanly():
    info = media_info(b"\x00" * 64)
    assert info["container"] == "unknown"
    assert info["decodable"] is False


# ---------------------------------------------------------------------------
# the Spark stage


def test_describe_media_stage_catalogs_the_full_rotation(spark):
    from mapreduce_machine_learning_spark.sources.multimodal import (
        describe_media,
        synth_media_real,
    )

    media = synth_media_real(spark, n=60).repartition(7)
    rows = {r.media_id: r for r in describe_media(media).collect()}
    src = {r.media_id: r for r in media.collect()}
    assert len(rows) == 60
    containers = set()
    for i, r in rows.items():
        containers.add(r.container)
        # local ground truth per payload
        want = media_info(bytes(src[i].payload))
        assert r.container == want["container"], i
        assert r.codec == want["codec"], i
        assert r.decodable == want["decodable"], i
    # the rotation's containers all show up; opaque rows stay unknown
    assert {
        "bmp", "png", "jpeg", "gif", "webp", "tiff", "netpbm",
        "wav", "flac", "aiff", "au", "sphere", "ogg",
        "avi", "y4m", "mp4", "unknown",
    } <= containers
    # decodable split exists both ways (opaque video rows are False)
    vals = {r.decodable for r in rows.values()}
    assert vals == {True, False}


def test_describe_media_partition_and_arrow_batch_invariant(spark):
    """The catalog is pure per payload, so its output must be identical
    under any partitioning and any Arrow batch fragmentation — the same
    deployment-shape contract the other media stages pin."""
    from mapreduce_machine_learning_spark.sources.multimodal import (
        describe_media,
        synth_media_real,
    )

    media = synth_media_real(spark, n=36)

    def snapshot(df):
        return {
            r.media_id: (
                r.container, r.codec, r.width, r.height, r.n_frames,
                r.sample_rate, r.duration_ms, r.decodable,
            )
            for r in describe_media(df).collect()
        }

    base = snapshot(media.repartition(12))
    assert snapshot(media.repartition(3)) == base
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        assert snapshot(media.repartition(12)) == base
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
