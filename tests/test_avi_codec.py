"""Uncompressed AVI codec (sources/avi.py): RIFF + 24-bit DIB frames.

Round 9 closes the struct-reachable part of the VIDEO seam: an AVI of
uncompressed DIB frames has no entropy coding, so — like the BMP codec —
round-trips are BIT-EXACT and every invariant pins exactly. What these
tests cover: encode/decode round-trips across geometries, frame counts,
and row-padding residues; fps preservation through the stream header; the
compressed-stream seam; the corrupt-payload quarantine; and the Spark
``mapInPandas`` stages (feature extraction, REAL frame sampling, per-frame
resize) agreeing with the local decoder pixel-for-pixel.
"""

import struct

import numpy as np
import pytest

from mapreduce_machine_learning_spark.sources.avi import (
    avi_codec,
    avi_fps,
    decode_avi,
    encode_avi,
    is_avi,
    real_video_features,
)
from mapreduce_machine_learning_spark.sources.gif import decode_gif, is_gif
from mapreduce_machine_learning_spark.sources.mp4 import decode_mp4, is_mp4
from mapreduce_machine_learning_spark.sources.y4m import decode_y4m, is_y4m
from mapreduce_machine_learning_spark.sources.multimodal import (
    decode_image,
    extract_features,
    fake_features,
    features_for,
    resize_media,
    sample_frames,
    synth_media_real,
)


def _frames(n, h, w, seed=0):
    rng = np.random.default_rng(seed)
    return [
        rng.integers(0, 256, (h, w, 3)).astype(np.uint8) for _ in range(n)
    ]


def test_round_trip_exact_across_geometries_and_padding():
    # widths 5/6/7/8 exercise every DIB row-padding residue
    for w in (5, 6, 7, 8):
        frames = _frames(3, 9, w, seed=w)
        back = decode_avi(encode_avi(frames, fps=12))
        assert np.array_equal(back, np.stack(frames)), w
    # single frame and longer sequences
    for n in (1, 7):
        frames = _frames(n, 6, 11, seed=n)
        back = decode_avi(encode_avi(frames))
        assert back.shape == (n, 6, 11, 3)
        assert np.array_equal(back, np.stack(frames)), n


def test_fps_survives_the_stream_header():
    frames = _frames(2, 4, 4)
    for fps in (1, 10, 30):
        assert avi_fps(encode_avi(frames, fps=fps)) == fps


def _gradient_frames(n, h, w, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    return [
        np.stack(
            [
                (xx * 3 + yy + t * 9 + seed) % 256,
                (yy * 5 + t * 3) % 256,
                (xx + t * 7 + seed) % 256,
            ],
            axis=2,
        ).astype(np.uint8)
        for t in range(n)
    ]


def test_mjpeg_round_trip_error_bounded():
    # MJPEG = one baseline JPEG per '00dc' chunk, decoded by the
    # in-container JPEG codec — lossy, so the bound is per-pixel error,
    # with structure (codec fourcc, fps, frame count, dims) exact
    frames = _gradient_frames(4, 12, 16, seed=2)
    p = encode_avi(frames, fps=8, codec="mjpg", quality=92)
    assert is_avi(p) and avi_codec(p) == "mjpg" and avi_fps(p) == 8
    back = decode_avi(p)
    assert back.shape == (4, 12, 16, 3)
    err = np.abs(back.astype(int) - np.stack(frames).astype(int))
    assert err.max() <= 24 and err.mean() <= 4.0
    # at real frame sizes compression wins (at 12x16 the per-frame
    # DQT/DHT tables dominate, so measure on 48x64)
    big = _gradient_frames(4, 48, 64, seed=2)
    assert len(encode_avi(big, fps=8, codec="mjpg")) < len(
        encode_avi(big, fps=8)
    )
    # features run off the real decoded frames
    assert list(features_for(p)) == list(real_video_features(back))


def test_unknown_video_fourcc_raises_at_the_seam():
    p = bytearray(encode_avi(_frames(2, 5, 5)))
    strf_at = bytes(p).find(b"strf")
    struct.pack_into("<4s", p, strf_at + 8 + 16, b"H264")
    with pytest.raises(NotImplementedError, match="MJPEG"):
        decode_avi(bytes(p))


def test_features_are_real_and_content_sensitive():
    a = decode_avi(encode_avi(_frames(4, 8, 8, seed=1)))
    b = decode_avi(encode_avi(_frames(4, 8, 8, seed=2)))
    fa, fb = real_video_features(a), real_video_features(b)
    assert fa.shape == (8,) and fb.shape == (8,)
    assert not np.array_equal(fa, fb)
    # a static video has zero temporal delta; a changing one does not
    static = np.stack([a[0]] * 3)
    assert real_video_features(static)[7] == 0.0
    assert real_video_features(a)[7] > 0.0


def test_seams_raise_and_quarantine():
    payload = bytearray(encode_avi(_frames(2, 5, 5)))
    # compressed stream: flip biCompression in the strf BITMAPINFOHEADER
    strf_at = bytes(payload).find(b"strf")
    comp = bytearray(payload)
    struct.pack_into("<I", comp, strf_at + 8 + 16, 1)  # BI_RLE8
    with pytest.raises(NotImplementedError, match="uncompressed"):
        decode_avi(bytes(comp))
    # 8-bit depth
    shallow = bytearray(payload)
    struct.pack_into("<H", shallow, strf_at + 8 + 14, 8)
    with pytest.raises(NotImplementedError, match="24-bit"):
        decode_avi(bytes(shallow))
    # no frames at all
    empty = encode_avi(_frames(1, 4, 4))
    head = empty[: empty.find(b"00db")]
    with pytest.raises(NotImplementedError, match="no frames"):
        decode_avi(head + b"\x00" * 4)
    # not an AVI
    with pytest.raises(NotImplementedError, match="not an AVI"):
        decode_avi(b"RIFF\x00\x00\x00\x00WAVE" + b"\x00" * 40)
    # corrupt AVI quarantines to the stand-in via the dispatcher
    corrupt = b"RIFF\x10\x00\x00\x00AVI " + b"\x07" * 40
    assert list(features_for(corrupt)) == list(fake_features(corrupt))
    # ...and a REAL AVI takes the real-feature path
    good = bytes(payload)
    assert list(features_for(good)) == list(
        real_video_features(decode_avi(good))
    )


def test_spark_sample_frames_are_real_decoded_frames(spark):
    media = synth_media_real(spark, n=48).repartition(5)
    src = {r.media_id: bytes(r.payload) for r in media.collect()}
    out = {}
    for r in sample_frames(media, n_frames=4).collect():
        out.setdefault(r.media_id, {})[r.frame_idx] = bytes(r.frame_payload)
    # every video row fanned out to exactly 4 frames
    vids = {i: p for i, p in src.items() if i % 3 == 2}
    assert set(out) == set(vids)
    n_real = n_standin = 0
    for i, p in vids.items():
        assert sorted(out[i]) == [0, 1, 2, 3]
        if is_avi(p) or is_gif(p) or is_y4m(p) or is_mp4(p):
            n_real += 1
            if is_avi(p):
                frames = decode_avi(p)
            elif is_gif(p):
                frames = decode_gif(p)
            elif is_y4m(p):
                frames = decode_y4m(p)
            else:
                frames = decode_mp4(p)
            n = frames.shape[0]
            idx = np.minimum((np.arange(4) * n) // 4, n - 1)
            for fi in range(4):
                got = decode_image(out[i][fi])  # frames re-encode as BMP
                assert np.array_equal(got, frames[idx[fi]]), (i, fi)
        else:
            n_standin += 1
            assert len(out[i][0]) == 16  # md5 stand-in
    assert n_real > 0 and n_standin > 0  # both paths exercised


def test_spark_resize_resamples_every_avi_frame(spark):
    media = synth_media_real(spark, n=36)
    out = {r.media_id: bytes(r.payload) for r in resize_media(media, 6, 4).collect()}
    codecs_seen = set()
    for row in media.collect():
        p = bytes(row.payload)
        if row.kind != "video" or not is_avi(p):
            continue
        resized = decode_avi(out[row.media_id])
        frames = decode_avi(p)
        n, h, w = frames.shape[:3]
        assert resized.shape == (n, 4, 6, 3)
        yi = np.minimum((np.arange(4) * h) // 4, h - 1)
        xi = np.minimum((np.arange(6) * w) // 6, w - 1)
        want = np.stack([f[yi][:, xi] for f in frames])
        codec = avi_codec(p)
        codecs_seen.add(codec)
        if codec == "mjpg":  # lossy re-encode: bounded, not bit-exact
            err = np.abs(resized.astype(int) - want.astype(int))
            assert err.max() <= 32, (row.media_id, err.max())
        else:
            assert np.array_equal(resized, want), row.media_id
        assert avi_fps(out[row.media_id]) == avi_fps(p)  # timing kept
        assert avi_codec(out[row.media_id]) == codec  # layout kept
    assert codecs_seen == {"dib", "mjpg"}  # both real layouts exercised


def test_spark_features_route_avi_through_real_decoder(spark):
    media = synth_media_real(spark, n=30)
    got = {r.media_id: r.features for r in extract_features(media).collect()}
    src = {r.media_id: bytes(r.payload) for r in media.collect()}
    checked = 0
    for i, p in src.items():
        if is_avi(p):
            want = real_video_features(decode_avi(p))
            assert got[i] == pytest.approx(list(want)), i
            checked += 1
    assert checked > 0


# ---- ADVICE r9 regressions: mixed audio/video files, real idx1 ----

from mapreduce_machine_learning_spark.sources.avi import _encode_dib


def _chunk(tag, body):
    return tag + struct.pack("<I", len(body)) + body + (
        b"\x00" if len(body) % 2 else b""
    )


def _lst(kind, body):
    return _chunk(b"LIST", kind + body)


def _mixed_av_avi(frames, fps=12, audio_first=False, audio_rate=8000):
    """RIFF-AVI with a 24-bit DIB 'vids' stream AND a 16-bit PCM 'auds'
    stream, in either strl order — the ADVICE r9 repro: the audio strf is
    a WAVEFORMATEX, and a walker that parses every strf as a
    BITMAPINFOHEADER fails the whole decode (and leaks the audio sample
    rate as the "fps")."""
    h, w, _ = frames[0].shape
    bodies = [_encode_dib(f) for f in frames]
    frame_size = max(len(b) for b in bodies)
    vid_no, aud_no = (1, 0) if audio_first else (0, 1)
    vid_strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh", b"vids", b"DIB ", 0, 0, 0, 0,
        1, fps, 0, len(frames), frame_size, 0xFFFFFFFF, frame_size,
        0, 0, int(w), int(h),
    )
    vid_strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0,
    )
    aud_strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh", b"auds", b"\x00\x00\x00\x00", 0, 0, 0, 0,
        1, audio_rate, 0, audio_rate, audio_rate * 2, 0xFFFFFFFF, 2,
        0, 0, 0, 0,
    )
    aud_strf = struct.pack(  # WAVEFORMATEX: PCM mono 16-bit
        "<HHIIHH", 1, 1, audio_rate, audio_rate * 2, 2, 16,
    )
    vid_strl = _lst(b"strl", _chunk(b"strh", vid_strh) + _chunk(b"strf", vid_strf))
    aud_strl = _lst(b"strl", _chunk(b"strh", aud_strh) + _chunk(b"strf", aud_strf))
    strls = aud_strl + vid_strl if audio_first else vid_strl + aud_strl
    avih = struct.pack(
        "<IIIIIIIIIIIIII", 1_000_000 // fps, frame_size * fps, 0, 0,
        len(frames), 0, 2, frame_size, w, h, 0, 0, 0, 0,
    )
    hdrl = _lst(b"hdrl", _chunk(b"avih", avih) + strls)
    vtag = b"%02ddb" % vid_no
    atag = b"%02dwb" % aud_no
    movi_body = b""
    for b in bodies:  # interleave: audio chunk then video frame
        movi_body += _chunk(atag, b"\x01\x02" * 50) + _chunk(vtag, b)
    riff_body = b"AVI " + hdrl + _lst(b"movi", movi_body)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def test_mixed_av_file_decodes_video_and_reads_video_fps():
    frames = _frames(3, 6, 7, seed=3)
    for audio_first in (False, True):
        p = _mixed_av_avi(frames, fps=12, audio_first=audio_first)
        assert is_avi(p)
        back = decode_avi(p)  # used to raise NotImplementedError
        assert np.array_equal(back, np.stack(frames)), audio_first
        assert avi_fps(p) == 12, audio_first  # NOT the 8000 Hz audio rate
        assert avi_codec(p) == "dib", audio_first


def test_audio_only_avi_quarantines_cleanly():
    # a file whose ONLY stream is audio: one auds strl, audio chunks only
    aud_strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh", b"auds", b"\x00\x00\x00\x00", 0, 0, 0, 0,
        1, 8000, 0, 8000, 16000, 0xFFFFFFFF, 2, 0, 0, 0, 0,
    )
    aud_strf = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    avih = struct.pack(
        "<IIIIIIIIIIIIII", 100000, 16000, 0, 0, 0, 0, 1, 0, 0, 0,
        0, 0, 0, 0,
    )
    hdrl = _lst(b"hdrl", _chunk(b"avih", avih) + _lst(
        b"strl", _chunk(b"strh", aud_strh) + _chunk(b"strf", aud_strf)))
    movi = _lst(b"movi", _chunk(b"00wb", b"\x01\x02" * 50))
    body = b"AVI " + hdrl + movi
    p = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError):
        decode_avi(p)  # no video stream: quarantine, not a misparse


def test_encoder_writes_a_real_idx1_backing_the_hasindex_flag():
    frames = _frames(4, 5, 5, seed=9)
    for codec in ("dib", "mjpg"):
        p = encode_avi(frames, codec=codec)
        pos, end = 12, 8 + struct.unpack_from("<I", p, 4)[0]
        movi_at = idx = avih = None
        while pos + 8 <= end:
            tag = p[pos : pos + 4]
            (size,) = struct.unpack_from("<I", p, pos + 4)
            if tag == b"LIST" and p[pos + 8 : pos + 12] == b"movi":
                movi_at = pos + 8  # position of the 'movi' fourcc
            elif tag == b"idx1":
                idx = p[pos + 8 : pos + 8 + size]
            elif tag == b"LIST" and p[pos + 8 : pos + 12] == b"hdrl":
                avih = p[pos + 20 : pos + 20 + 56]  # avih body
            pos += 8 + size + (size % 2)
        assert movi_at is not None and idx is not None
        (flags,) = struct.unpack_from("<I", avih, 12)
        assert flags & 0x10  # AVIF_HASINDEX — and the index exists
        assert len(idx) == 16 * len(frames)
        want_tag = b"00dc" if codec == "mjpg" else b"00db"
        for i in range(len(frames)):
            tag, fl, off, size = struct.unpack_from("<4sIII", idx, 16 * i)
            assert tag == want_tag and fl == 0x10
            # offsets are relative to the 'movi' fourcc (the common
            # convention) and must land on the frame chunk they index
            assert p[movi_at + off : movi_at + off + 4] == want_tag
            (csz,) = struct.unpack_from("<I", p, movi_at + off + 4)
            assert csz == size


def test_truncated_strh_chunk_is_skipped_not_overread():
    # ADVICE r10 (low): a strh whose DECLARED size is < 28 must be
    # skipped. The old guard only checked the payload buffer was long
    # enough, so a truncated strh read fccType/scale/rate from the
    # FOLLOWING chunk's bytes — here that would claim stream 0 is the
    # video stream and decode would then look for frames under '00db'
    # (there are none). With the size guard, the walker skips the
    # truncated header and finds the REAL video stream at strl #1.
    frames = _frames(2, 5, 6, seed=11)
    bodies = [_encode_dib(f) for f in frames]
    h, w, _ = frames[0].shape
    frame_size = max(len(b) for b in bodies)
    # strl #0: strh truncated to 4 bytes (just an fccType that SAYS
    # vids) — the following strf bytes would be misread as scale/rate
    bad_strl = _lst(b"strl", _chunk(b"strh", b"vids") + _chunk(
        b"strf", struct.pack("<IiiHHI", 40, w, h, 1, 24, 0)))
    vid_strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh", b"vids", b"DIB ", 0, 0, 0, 0,
        1, 12, 0, len(frames), frame_size, 0xFFFFFFFF, frame_size,
        0, 0, int(w), int(h),
    )
    vid_strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0,
    )
    vid_strl = _lst(
        b"strl", _chunk(b"strh", vid_strh) + _chunk(b"strf", vid_strf))
    avih = struct.pack(
        "<IIIIIIIIIIIIII", 83333, frame_size * 12, 0, 0,
        len(frames), 0, 2, frame_size, w, h, 0, 0, 0, 0,
    )
    hdrl = _lst(b"hdrl", _chunk(b"avih", avih) + bad_strl + vid_strl)
    movi = _lst(
        b"movi", b"".join(_chunk(b"01db", b) for b in bodies))
    body = b"AVI " + hdrl + movi
    p = b"RIFF" + struct.pack("<I", len(body)) + body
    back = decode_avi(p)  # real stream is #1; frames live under 01db
    assert np.array_equal(back, np.stack(frames))
    assert avi_fps(p) == 12  # from the VALID strh, not garbage bytes


def test_truncated_strf_chunk_quarantines_instead_of_misparse():
    # companion guard: a strf declaring size < 24 after a valid vids
    # strh must be skipped — the old code read geometry/compression
    # from bytes past the chunk's declared extent. With no other strf,
    # comp stays None and decode quarantines cleanly.
    vid_strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh", b"vids", b"DIB ", 0, 0, 0, 0,
        1, 12, 0, 1, 90, 0xFFFFFFFF, 90, 0, 0, 5, 6,
    )
    strl = _lst(b"strl", _chunk(b"strh", vid_strh) + _chunk(
        b"strf", struct.pack("<Ii", 40, 6)))  # 8 bytes: truncated
    avih = struct.pack(
        "<IIIIIIIIIIIIII", 83333, 0, 0, 0, 1, 0, 1, 90, 6, 5,
        0, 0, 0, 0,
    )
    hdrl = _lst(b"hdrl", _chunk(b"avih", avih) + strl)
    movi = _lst(b"movi", _chunk(b"00db", b"\x00" * 90))
    body = b"AVI " + hdrl + movi
    p = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError):
        decode_avi(p)
