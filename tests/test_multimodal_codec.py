"""REAL in-container media codecs: BMP + PNG + baseline JPEG + PCM WAV.

The multimodal pipeline's codec layer was a documented NotImplementedError
seam ("no PIL/ffmpeg in this container"). Round 8 closed the struct-reachable
part of that gap (BMP via struct/numpy, WAV via the stdlib ``wave`` module);
round 9 adds 8-bit PNG — stdlib ``zlib`` inflate plus numpy unfiltering of
all five RFC 2083 scanline filters, color types 0/2/3/4/6 — and baseline
JPEG (sources/jpeg.py, covered by test_jpeg_codec.py), dispatched by magic
bytes so unknown formats still flow through the deterministic stand-ins.
Video codecs remain the environment-bound seam.

These tests pin: exact encode/decode round-trips (including BMP row padding,
top-down BMPs, and every PNG filter type and color type), the Spark
``mapInPandas`` path computing the same features the local decoder computes,
real resizes verified pixel-for-pixel against local numpy (PNG in → PNG
out), fallback behavior for unsupported sub-formats, and
partitioning-independence of everything."""

import struct
import zlib

import numpy as np
import pytest

from mapreduce_machine_learning_spark.sources.avi import (
    decode_avi,
    is_avi,
    real_video_features,
)
from mapreduce_machine_learning_spark.sources.flac import decode_flac, is_flac
from mapreduce_machine_learning_spark.sources.ogg import (
    decode_ogg_audio,
    is_ogg,
)
from mapreduce_machine_learning_spark.sources.pcm_codecs import (
    decode_aiff,
    decode_au,
    decode_sphere,
    is_aiff,
    is_au,
    is_sphere,
)
from mapreduce_machine_learning_spark.sources.gif import decode_gif, is_gif
from mapreduce_machine_learning_spark.sources.mp4 import decode_mp4, is_mp4
from mapreduce_machine_learning_spark.sources.netpbm import is_netpbm
from mapreduce_machine_learning_spark.sources.tga import is_tga
from mapreduce_machine_learning_spark.sources.y4m import decode_y4m, is_y4m
from mapreduce_machine_learning_spark.sources.multimodal import (
    _png_chunk,
    _PNG_MAGIC,
    decode_bmp,
    decode_image,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_wav,
    extract_features,
    fake_features,
    features_for,
    is_jpeg,
    is_png,
    is_tiff,
    is_webp,
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


def _png_forward_filter(arr, ftypes):
    """Hand-encode a PNG applying the GIVEN per-row filter types (RFC 2083
    §6 forward direction) — the encoder in the package always emits filter
    0, so decoding payloads built here is the only way to prove the
    unfilter path inverts Sub/Up/Average/Paeth, not just None."""
    h, w, bpp = arr.shape
    px = arr.astype(np.int16)
    raw = bytearray()
    for y in range(h):
        line = px[y].reshape(-1)
        prev = px[y - 1].reshape(-1) if y else np.zeros(w * bpp, np.int16)
        left = np.zeros(w * bpp, np.int16)
        left[bpp:] = line[:-bpp]
        ul = np.zeros(w * bpp, np.int16)
        ul[bpp:] = prev[:-bpp]
        f = ftypes[y]
        if f == 0:
            enc = line
        elif f == 1:
            enc = line - left
        elif f == 2:
            enc = line - prev
        elif f == 3:
            enc = line - (left + prev) // 2
        elif f == 4:
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            enc = line - pred
        raw.append(f)
        raw.extend((enc & 0xFF).astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def test_png_round_trip_exact():
    for h, w in ((1, 1), (3, 7), (9, 5), (12, 16)):
        a = _arr(h, w, seed=h * 100 + w)
        payload = encode_png(a)
        assert is_png(payload)
        assert np.array_equal(decode_png(payload), a), (h, w)
        # and through the generic dispatcher
        assert np.array_equal(decode_image(payload), a)


def test_png_unfilter_inverts_every_filter_type():
    a = _arr(7, 6, seed=42)
    # each filter type as a uniform choice, plus a mixed sequence — the
    # mixed case catches cross-row state bugs (Up/Average/Paeth read the
    # RECONSTRUCTED previous row, not the filtered one)
    for ftypes in ([0] * 7, [1] * 7, [2] * 7, [3] * 7, [4] * 7,
                   [0, 1, 2, 3, 4, 2, 4]):
        payload = _png_forward_filter(a, ftypes)
        assert np.array_equal(decode_png(payload), a), ftypes


def test_png_color_types_decode_to_rgb():
    h, w = 4, 5
    rng = np.random.default_rng(7)

    def build(ctype, body_px, plte=None):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
        raw = b"".join(
            b"\x00" + body_px[y].tobytes() for y in range(h)
        )
        chunks = _PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
        if plte is not None:
            chunks += _png_chunk(b"PLTE", plte.tobytes())
        return chunks + _png_chunk(
            b"IDAT", zlib.compress(raw)
        ) + _png_chunk(b"IEND", b"")

    # type 0 (gray): luma replicated across RGB
    gray = rng.integers(0, 256, (h, w, 1), dtype=np.uint16).astype(np.uint8)
    out = decode_png(build(0, gray))
    assert np.array_equal(out, np.repeat(gray, 3, axis=2))
    # type 4 (gray+alpha): alpha dropped
    ga = rng.integers(0, 256, (h, w, 2), dtype=np.uint16).astype(np.uint8)
    out = decode_png(build(4, ga))
    assert np.array_equal(out, np.repeat(ga[..., :1], 3, axis=2))
    # type 6 (RGBA): alpha dropped
    rgba = rng.integers(0, 256, (h, w, 4), dtype=np.uint16).astype(np.uint8)
    out = decode_png(build(6, rgba))
    assert np.array_equal(out, rgba[..., :3])
    # type 3 (palette): PLTE lookup
    plte = rng.integers(0, 256, (16, 3), dtype=np.uint16).astype(np.uint8)
    idx = rng.integers(0, 16, (h, w, 1), dtype=np.uint16).astype(np.uint8)
    out = decode_png(build(3, idx, plte=plte))
    assert np.array_equal(out, plte[idx[..., 0]])


def test_png_seams_raise_and_quarantine():
    a = _arr(3, 3, seed=9)
    good = bytearray(encode_png(a))
    # sub-byte TRUECOLOR is illegal in the format (sub-byte depths are
    # gray/palette only) — flipping an RGB payload's depth byte to 4
    # must refuse, not misparse (IHDR body byte 8; offset: magic 8 +
    # len 4 + tag 4 + 8)
    shallow = bytearray(good)
    shallow[8 + 8 + 8] = 4
    with pytest.raises(NotImplementedError):
        decode_png(bytes(shallow))
    # invalid interlace method
    inter = bytearray(good)
    inter[8 + 8 + 12] = 2
    with pytest.raises(NotImplementedError):
        decode_png(bytes(inter))
    # truncated IDAT (valid magic, garbage body) quarantines via the
    # dispatcher — one corrupt row never kills the task
    trunc = bytes(good[:40])
    assert list(features_for(trunc)) == list(fake_features(trunc))


def test_png_adam7_interlace_round_trips_exactly():
    # every size class Adam7 cares about: single pixel (only pass 1),
    # smaller than one 8x8 tile (several empty passes), exactly one
    # tile, and a ragged multi-tile image
    for h, w in ((1, 1), (3, 7), (8, 8), (13, 21)):
        a = _arr(h, w, seed=h * 31 + w)
        payload = encode_png(a, interlace=True)
        # genuinely interlaced: IHDR interlace byte is 1...
        assert payload[8 + 8 + 12] == 1
        # ...the stream differs from the sequential encoding...
        if h * w > 1:
            assert payload != encode_png(a)
        # ...and the deinterlacer reconstructs every pixel exactly
        assert np.array_equal(decode_png(payload), a), (h, w)
        assert np.array_equal(decode_image(payload), a)


def _pack_subbyte_rows(vals, depth, filt=0):
    """MSB-first bit-packed scanlines (one filter byte each) for a
    (h, w) sample array of sub-byte values."""
    h, w = vals.shape
    raw = b""
    for y in range(h):
        bits = np.zeros(w * depth, np.uint8)
        for x in range(w):
            for b in range(depth):
                bits[x * depth + b] = (vals[y, x] >> (depth - 1 - b)) & 1
        raw += bytes([filt]) + np.packbits(bits).tobytes()
    return raw


def test_png_subbyte_depths_decode_exactly():
    h, w = 5, 11  # w*depth not a multiple of 8: exercises row bit-padding
    rng = np.random.default_rng(5)

    def build(depth, ctype, raw, plte=None, interlace=0):
        ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
        chunks = _PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
        if plte is not None:
            chunks += _png_chunk(b"PLTE", plte.tobytes())
        return (
            chunks
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b"")
        )

    # 1/2/4-bit grayscale: exact integral scaling to 8-bit
    for depth in (1, 2, 4):
        vals = rng.integers(0, 1 << depth, (h, w)).astype(np.uint8)
        out = decode_png(build(depth, 0, _pack_subbyte_rows(vals, depth)))
        want = (vals * (255 // ((1 << depth) - 1))).astype(np.uint8)
        assert np.array_equal(out, np.repeat(want[..., None], 3, axis=2)), depth
    # 4-bit palette: direct PLTE lookup, no scaling
    plte = rng.integers(0, 256, (16, 3), dtype=np.uint16).astype(np.uint8)
    idx = rng.integers(0, 16, (h, w)).astype(np.uint8)
    out = decode_png(build(4, 3, _pack_subbyte_rows(idx, 4), plte=plte))
    assert np.array_equal(out, plte[idx])


def test_png_subbyte_adam7_interlace_decodes_exactly():
    from mapreduce_machine_learning_spark.sources.multimodal import _ADAM7

    h, w = 13, 9
    rng = np.random.default_rng(6)
    vals = rng.integers(0, 2, (h, w)).astype(np.uint8)
    raw = b"".join(
        _pack_subbyte_rows(vals[y0::dy, x0::dx], 1)
        for x0, y0, dx, dy in _ADAM7
        if vals[y0::dy, x0::dx].size
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 1, 0, 0, 0, 1)
    payload = (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    out = decode_png(payload)
    assert np.array_equal(out, np.repeat((vals * 255)[..., None], 3, axis=2))


def test_png_16bit_decodes_to_high_byte():
    h, w = 5, 9
    rng = np.random.default_rng(16)

    def build16(ctype, samples16):
        ihdr = struct.pack(">IIBBBBB", w, h, 16, ctype, 0, 0, 0)
        raw = b"".join(
            b"\x00" + samples16[y].astype(">u2").tobytes() for y in range(h)
        )
        return (
            _PNG_MAGIC
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b"")
        )

    # 16-bit RGB (color type 2): high byte is the 8-bit rendering
    rgb16 = rng.integers(0, 65536, (h, w, 3), dtype=np.uint16)
    out = decode_png(build16(2, rgb16))
    assert np.array_equal(out, (rgb16 >> 8).astype(np.uint8))
    # 16-bit grayscale (color type 0): replicated across RGB
    g16 = rng.integers(0, 65536, (h, w, 1), dtype=np.uint16)
    out = decode_png(build16(0, g16))
    assert np.array_equal(
        out, np.repeat((g16 >> 8).astype(np.uint8), 3, axis=2)
    )
    # filters still invert at 16-bit (6-byte pixel deltas): Sub row
    rgb = rng.integers(0, 65536, (1, w, 3), dtype=np.uint16)
    row = rgb[0].astype(">u2").tobytes()
    line = np.frombuffer(row, np.uint8).astype(np.int16)
    filtered = line.copy()
    filtered[6:] = (line[6:] - line[:-6]) & 0xFF  # forward Sub, bpp=6
    ihdr = struct.pack(">IIBBBBB", w, 1, 16, 2, 0, 0, 0)
    payload = (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(
            b"IDAT",
            zlib.compress(b"\x01" + filtered.astype(np.uint8).tobytes()),
        )
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(payload), (rgb >> 8).astype(np.uint8))


def test_wav_round_trip_exact():
    samples = (np.sin(np.linspace(0, 40, 777)) * 12345).astype(np.int16)
    back, rate = decode_wav(encode_wav(samples, 8000))
    assert rate == 8000
    assert np.array_equal(back, samples)


def test_unsupported_formats_raise_and_fall_back():
    # JPEG magic with a garbage body: the (real, round-9) JPEG decoder
    # raises on the malformed stream and the dispatcher quarantines
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 100)
    # near-PNG magic (truncated signature) is NOT dispatched as PNG
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
    corrupt_jpg = b"\xff\xd8\xff\xe0" + b"\x07" * 60
    for c in (corrupt_bmp, corrupt_wav, corrupt_jpg):
        assert list(features_for(c)) == list(fake_features(c))


def test_fuzzed_audio_payloads_always_quarantine_fast():
    """Seeded mutation fuzz over every round-11 audio container: bit
    flips, byte splats, truncations, header-focused corruption, and
    magic-prefixed garbage. ``features_for`` must return the 8-float
    contract for every one — never raise, hang, or blow memory (one
    corrupt row cannot kill a 100k-row task). An unseeded 3700-payload
    run was clean at round-11 time; this pins a 1400-payload seeded
    slice of it."""
    import time as _time

    from mapreduce_machine_learning_spark.sources.flac import encode_flac
    from mapreduce_machine_learning_spark.sources.ogg import encode_ogg_flac
    from mapreduce_machine_learning_spark.sources.pcm_codecs import (
        encode_aiff,
        encode_au,
        encode_sphere,
    )

    rng = np.random.default_rng(42)
    x = (np.sin(np.arange(3000) / 17) * 9000).astype(np.int16)
    bases = (
        encode_flac(x, 44100),
        encode_ogg_flac(x, 44100),
        encode_aiff(x, 16000),
        encode_aiff(x, 8000, compression=b"ulaw"),
        encode_au(x, 8000, encoding=1),
        encode_sphere(x, 16000),
        encode_wav(x, 8000),
    )
    t0 = _time.time()
    for base in bases:
        for trial in range(150):
            p = bytearray(base)
            kind = trial % 4
            if kind == 0:
                for _ in range(int(rng.integers(1, 4))):
                    p[rng.integers(0, len(p))] ^= 1 << rng.integers(0, 8)
            elif kind == 1:
                i = int(rng.integers(0, len(p)))
                j = min(len(p), i + int(rng.integers(1, 64)))
                p[i:j] = bytes(
                    rng.integers(0, 256, j - i, dtype=np.uint8).tolist()
                )
            elif kind == 2:
                p = p[: rng.integers(1, len(p))]
            else:
                for _ in range(3):
                    p[rng.integers(0, min(64, len(p)))] ^= 0xFF
            assert features_for(bytes(p)).shape == (8,)
    for magic in (b"fLaC", b"OggS", b"FORM....AIFF", b".snd", b"NIST_1A\n"):
        for _ in range(70):
            blob = magic + bytes(
                rng.integers(
                    0, 256, int(rng.integers(8, 4000)), dtype=np.uint8
                ).tolist()
            )
            assert features_for(blob).shape == (8,)
    assert _time.time() - t0 < 60  # the whole batch is sub-second normally


def test_spark_features_match_local_decoders(spark):
    media = synth_media_real(spark, n=48).repartition(7)
    got = {r.media_id: r for r in extract_features(media).collect()}
    src = {r.media_id: r for r in media.collect()}
    assert len(got) == 48
    fmts = set()
    for i, row in src.items():
        payload = bytes(row.payload)
        if row.kind == "image":
            # synth rotates BMP/PNG/JPEG/GIF/WebP/TIFF images (round 13)
            fmts.add(
                "png" if is_png(payload)
                else "jpeg" if is_jpeg(payload)
                else "gif" if is_gif(payload)
                else "webp" if is_webp(payload)
                else "tiff" if is_tiff(payload)
                else "netpbm" if is_netpbm(payload)
                else "tga" if is_tga(payload)
                else "bmp"
            )
            want = real_image_features(decode_image(payload))
        elif row.kind == "audio":
            # synth rotates WAV/FLAC/AIFF/AU/SPHERE/Ogg-FLAC (round 11)
            if is_flac(payload):
                fmts.add("flac")
                decoded = decode_flac(payload)
            elif is_ogg(payload):
                fmts.add("ogg")
                decoded = decode_ogg_audio(payload)
            elif is_aiff(payload):
                fmts.add("aiff")
                decoded = decode_aiff(payload)
            elif is_au(payload):
                fmts.add("au")
                decoded = decode_au(payload)
            elif is_sphere(payload):
                fmts.add("sphere")
                decoded = decode_sphere(payload)
            else:
                fmts.add("wav")
                decoded = decode_wav(payload)
            want = real_audio_features(*decoded)
        elif is_avi(payload):  # video: real for DIB/MJPEG AVI...
            want = real_video_features(decode_avi(payload))
        elif is_gif(payload):  # ...and for animated GIF...
            want = real_video_features(decode_gif(payload))
        elif is_y4m(payload):  # ...and for raw Y4M (round 13)
            want = real_video_features(decode_y4m(payload))
        elif is_mp4(payload):  # ...and for MJPEG MP4/MOV (round 13)
            want = real_video_features(decode_mp4(payload))
        else:  # ...and still the documented stand-in for opaque bytes
            want = fake_features(payload)
        assert got[i].features == pytest.approx(list(want)), (i, row.kind)
    # real features actually separate content: two different images differ
    imgs = [got[i].features for i in got if src[i].kind == "image"]
    assert len({tuple(f) for f in imgs}) == len(imgs)
    # and ALL SIX real image formats + ALL SIX audio containers were
    # actually exercised (the two ADPCM WAV rows sniff as "wav" and
    # decode through the same decode_wav dispatch)
    assert fmts == {
        "bmp", "png", "jpeg", "gif", "webp", "tiff", "netpbm", "tga",
        "wav", "flac", "aiff", "au", "sphere", "ogg",
    }


def test_spark_resize_is_real_nearest_neighbor_for_images(spark):
    media = synth_media_real(spark, n=24)
    out = {r.media_id: r for r in resize_media(media, 8, 6).collect()}
    for row in media.collect():
        payload = bytes(row.payload)
        if row.kind == "image":
            out_payload = bytes(out[row.media_id].payload)
            # format-preserving re-encode: PNG in -> PNG out, JPEG ->
            # JPEG, GIF -> GIF, WebP -> WebP, BMP -> BMP
            assert is_png(out_payload) == is_png(payload)
            assert is_jpeg(out_payload) == is_jpeg(payload)
            assert is_gif(out_payload) == is_gif(payload)
            assert is_webp(out_payload) == is_webp(payload)
            resized = decode_image(out_payload)
            assert resized.shape == (6, 8, 3)
            src = decode_image(payload)
            h, w = src.shape[:2]
            yi = np.minimum((np.arange(6) * h) // 6, h - 1)
            xi = np.minimum((np.arange(8) * w) // 8, w - 1)
            want = src[yi][:, xi]
            if is_jpeg(payload):
                # lossless NN resample + LOSSY re-encode: bit-exactness
                # is impossible by construction, the bound is tight
                err = np.abs(resized.astype(int) - want.astype(int))
                assert err.max() <= 16, err.max()
            else:
                assert np.array_equal(resized, want)
        elif row.kind == "audio":
            assert bytes(out[row.media_id].payload) == payload  # untouched
    # and the seam contract: resize_image refuses unknown formats outright
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


# ---- round 10: 8/24/32-bit PCM WAV depths ----


def test_wav_depths_normalize_to_int16_exactly():
    rng = np.random.default_rng(2)
    s = rng.integers(-32768, 32768, 700).astype(np.int16)
    for width in (2, 3, 4):  # lossless containers for int16 content
        back, rate = decode_wav(encode_wav(s, 16000, sampwidth=width))
        assert rate == 16000 and back.dtype == np.int16
        assert np.array_equal(back, s), width
    # 8-bit keeps the top byte (offset-binary re-centered)
    back8, _ = decode_wav(encode_wav(s, 16000, sampwidth=1))
    want = ((s.astype(np.int32) >> 8) << 8).astype(np.int16)
    assert np.array_equal(back8, want)


def test_wav_depth_invariant_features():
    # the SAME audio at 16 and 24 bit must produce identical features —
    # depth is a container property, not a signal property
    t = np.arange(2000)
    s = (np.sin(2 * np.pi * 440 * t / 8000) * 12000).astype(np.int16)
    f16 = features_for(encode_wav(s, 8000, sampwidth=2))
    f24 = features_for(encode_wav(s, 8000, sampwidth=3))
    assert f16 == pytest.approx(f24)


def test_fuzzed_image_video_decoders_quarantine_or_decode():
    """Round 12: decoder-level quarantine contract for the image/video
    codecs — a mutated payload either decodes or raises
    NotImplementedError, NEVER any other exception. (features_for's
    except-Exception seam would contain a stray IndexError in
    production, but the decoders' own contract is the quarantine error;
    a 4800-payload unseeded sweep was clean at round-12 time after
    hardening GIF's LZW/frame-rect paths, JPEG's DHT/DQT/SOF/SOS
    truncation and DC/spectral ranges, and AVI's signed biWidth. This
    pins a seeded slice.)"""
    from mapreduce_machine_learning_spark.sources.avi import (
        decode_avi,
        encode_avi,
    )
    from mapreduce_machine_learning_spark.sources.gif import (
        decode_gif,
        encode_gif_rgb,
    )
    from mapreduce_machine_learning_spark.sources.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )
    from mapreduce_machine_learning_spark.sources.webp import (
        decode_webp,
        encode_webp,
    )

    rng = np.random.default_rng(1207)
    img = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    # few distinct colors so encode_gif_rgb recovers an exact palette
    frames = [
        (rng.integers(0, 6, (24, 32, 3), dtype=np.uint8) * 40).astype(
            np.uint8
        )
        for _ in range(3)
    ]
    cases = [
        (decode_jpeg, encode_jpeg(img)),
        (decode_jpeg, encode_jpeg_progressive(img)),
        (decode_gif, encode_gif_rgb(frames)),
        (decode_webp, encode_webp(img)),
        (decode_avi, encode_avi(frames, codec="dib")),
        (decode_avi, encode_avi(frames, codec="mjpg")),
    ]
    for fn, base in cases:
        for trial in range(120):
            p = bytearray(base)
            if trial % 3 == 2:
                p = p[: int(rng.integers(1, len(p)))]  # truncation
            else:
                for _ in range(int(rng.integers(1, 7))):
                    p[int(rng.integers(0, len(p)))] = int(
                        rng.integers(0, 256)
                    )
            try:
                fn(bytes(p))
            except NotImplementedError:
                pass  # the quarantine contract


def test_fuzzed_image_audio_decoders_quarantine_or_decode():
    """Round 12 companion to the image/video pin: the PNG/BMP/WAV and
    speech-container decoders uphold the same decoder-level quarantine
    contract (zlib errors, partial PCM tails, stdlib wave's bare
    RuntimeError escapes, truncated BMP pixel data and PLTE/IHDR all
    convert to NotImplementedError). A 21,000-payload unseeded sweep was
    clean at round-12 time; this pins a seeded slice."""
    from mapreduce_machine_learning_spark.sources.multimodal import (
        decode_bmp,
        decode_png,
        encode_bmp,
        encode_png,
    )
    from mapreduce_machine_learning_spark.sources.pcm_codecs import (
        decode_aiff,
        decode_au,
        decode_sphere,
        encode_aiff,
        encode_au,
        encode_sphere,
    )

    rng = np.random.default_rng(1212)
    img = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    x = (np.sin(np.arange(2000) / 17) * 9000).astype(np.int16)
    cases = [
        (decode_png, encode_png(img)),
        (decode_bmp, encode_bmp(img)),
        (decode_wav, encode_wav(x, 8000)),
        (decode_wav, encode_wav(x, 8000, sampwidth=3)),
        (decode_aiff, encode_aiff(x, 8000)),
        (decode_au, encode_au(x, 8000)),
        (decode_sphere, encode_sphere(x, 8000)),
    ]
    for fn, base in cases:
        for trial in range(120):
            p = bytearray(base)
            if trial % 3 == 2:
                p = p[: int(rng.integers(1, len(p)))]
            else:
                for _ in range(int(rng.integers(1, 8))):
                    p[int(rng.integers(0, len(p)))] = int(
                        rng.integers(0, 256)
                    )
            try:
                fn(bytes(p))
            except NotImplementedError:
                pass  # the quarantine contract


def test_png_plte_truncated_mid_triple_quarantines():
    """ADVICE r12: a PLTE chunk whose declared length is valid (multiple
    of 3) but whose BODY is clamped by a truncated payload must
    quarantine, not reach reshape(-1, 3) and escape as ValueError."""
    h, w = 4, 5
    rng = np.random.default_rng(31)
    plte = rng.integers(0, 256, (16, 3), dtype=np.uint16).astype(np.uint8)
    idx = rng.integers(0, 16, (h, w), dtype=np.uint16).astype(np.uint8)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))
    payload = (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", plte.tobytes())
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(payload), plte[idx])  # intact: fine
    # cut the file 44 bytes into the 48-byte PLTE body (not % 3 == 0):
    # magic 8 + IHDR chunk 25 + PLTE len/tag 8 + 44
    truncated = payload[: 8 + 25 + 8 + 44]
    with pytest.raises(NotImplementedError):
        decode_png(truncated)
    # and a declared length larger than the real body inside an intact
    # stream (chunk-length corruption) quarantines the same way
    corrupt = bytearray(payload)
    struct.pack_into(">I", corrupt, 8 + 25, 48 + 3)
    with pytest.raises(NotImplementedError):
        decode_png(bytes(corrupt))
