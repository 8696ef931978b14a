"""AVI video codec (RIFF container): uncompressed DIB and MJPEG frames.

Round 9 closes the reachable part of the VIDEO seam in
``sources/multimodal.py`` twice over:

- **uncompressed 24-bit DIB** ('DIB ' fourcc, BI_RGB, '00db' chunks) is
  pure RIFF structure — no entropy coding — so it parses with ``struct``
  and numpy exactly like the BMP codec (each frame body IS a BMP pixel
  array: bottom-up BGR rows padded to 4 bytes), bit-exact round-trips;
- **MJPEG** ('MJPG' fourcc, '00dc' chunks) is one baseline JPEG per
  frame, and this repo carries its own baseline JPEG codec
  (``sources/jpeg.py``) — so the container's COMPRESSED layout decodes
  in-container too (lossy like any JPEG, error-bounded in tests).

That makes the multimodal pipeline's frame-sampling stage REAL for both
layouts: ``sample_frames`` decodes actual frames and re-encodes each as a
BMP payload downstream stages can ``decode_image``. Inter-frame codecs
(H.264, VP9, …) still need libraries this container lacks and raise at
the documented seam; callers quarantine to the deterministic stand-ins.

Scale note: same as the other codecs — the per-frame Python loop is fine
for test-table media; a 100 TB video pipeline decodes in a native library
at this seam, and the surrounding ``mapInPandas`` plumbing is what scales.
"""

from __future__ import annotations

import struct

import numpy as np

from mapreduce_machine_learning_spark.sources.jpeg import (
    decode_jpeg,
    encode_jpeg,
)

_MJPG_FOURCC = struct.unpack("<I", b"MJPG")[0]


def is_avi(payload: bytes) -> bool:
    return (
        len(payload) > 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"AVI "
    )


def _dib_row_pad(w: int) -> int:
    return (4 - (w * 3) % 4) % 4


def _encode_dib(frame: "np.ndarray") -> bytes:
    """Bottom-up padded BGR rows — a BMP body without headers."""
    h, w, _ = frame.shape
    pad = _dib_row_pad(w)
    return b"".join(
        frame[y, :, ::-1].tobytes() + b"\x00" * pad
        for y in range(h - 1, -1, -1)
    )


def _decode_dib(body: bytes, w: int, h: int) -> "np.ndarray":
    row = w * 3
    pad = _dib_row_pad(w)
    if len(body) < h * (row + pad):
        raise NotImplementedError("truncated AVI DIB frame")
    out = np.empty((h, w, 3), np.uint8)
    pos = 0
    for y in range(h - 1, -1, -1):
        out[y] = np.frombuffer(body, np.uint8, row, pos).reshape(w, 3)[
            :, ::-1
        ]
        pos += row + pad
    return out


def encode_avi(
    frames: list, fps: int = 10, codec: str = "dib", quality: int = 90
) -> bytes:
    """Minimal RIFF-AVI from uint8 (h, w, 3) RGB frames: one 'vids'
    stream, one frame chunk per frame. ``codec="dib"`` writes
    uncompressed BI_RGB '00db' chunks (bit-exact); ``codec="mjpg"``
    writes one baseline JPEG per '00dc' chunk at the given quality
    (4:2:0, tables included per frame as MJPEG players expect — lossy
    like any JPEG). All frames must share a geometry. Readable by any
    standard AVI demuxer."""
    if codec not in ("dib", "mjpg"):
        raise ValueError(f"unknown AVI codec {codec!r}")
    if not frames:
        raise ValueError("encode_avi needs at least one frame")
    h, w, c = frames[0].shape
    if c != 3 or any(
        f.shape != (h, w, 3) or f.dtype != np.uint8 for f in frames
    ):
        raise ValueError("encode_avi expects uniform uint8 (h, w, 3) frames")
    mjpg = codec == "mjpg"
    bodies = (
        [encode_jpeg(f, quality=quality, subsample=True) for f in frames]
        if mjpg
        else [_encode_dib(f) for f in frames]
    )
    frame_size = max(len(b) for b in bodies)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return tag + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) % 2 else b""
        )

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # microseconds per frame
        frame_size * fps,  # max bytes per second
        0,  # padding granularity
        0x10,  # flags: AVIF_HASINDEX (an idx1 chunk is written below)
        len(frames),  # total frames
        0,  # initial frames
        1,  # streams
        frame_size,  # suggested buffer size
        w,
        h,
        0, 0, 0, 0,  # reserved
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids",
        b"MJPG" if mjpg else b"DIB ",
        0,  # flags
        0,  # priority
        0,  # language
        0,  # initial frames
        1,  # scale
        fps,  # rate (rate/scale = fps)
        0,  # start
        len(frames),  # length in frames
        frame_size,  # suggested buffer size
        0xFFFFFFFF,  # quality (default)
        0 if mjpg else frame_size,  # sample size (0 = variable, MJPEG)
        0, 0, int(w), int(h),  # rcFrame
    )
    strf = struct.pack(  # BITMAPINFOHEADER; biCompression = fourcc | BI_RGB
        "<IiiHHIIiiII",
        40, w, h, 1, 24,
        _MJPG_FOURCC if mjpg else 0,
        frame_size, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    tag = b"00dc" if mjpg else b"00db"
    movi = lst(b"movi", b"".join(chunk(tag, b) for b in bodies))
    # idx1 backs the AVIF_HASINDEX flag above: one AVIIF_KEYFRAME entry
    # per frame chunk, offsets relative to the 'movi' fourcc (the common
    # convention), so seek-dependent demuxers find the index they expect.
    entries, off = [], 4
    for b in bodies:
        entries.append(struct.pack("<4sIII", tag, 0x10, off, len(b)))
        off += 8 + len(b) + (len(b) % 2)
    idx1 = chunk(b"idx1", b"".join(entries))
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _video_stream_info(payload: bytes) -> dict:
    """Header facts for the FIRST 'vids' stream in the RIFF tree.

    Tracks each strl LIST's strh fccType while walking (streams are
    numbered by strl order, per the AVI spec), so non-video streams are
    SKIPPED rather than misparsed: a plain PCM audio track's strf is a
    WAVEFORMATEX, and reading it as a BITMAPINFOHEADER used to fail the
    whole decode — and leak the audio sample rate as the "fps" (ADVICE
    r9, medium). Returns {stream_no, fps, w, h, bpp, comp}; any field
    still None means the corresponding header was absent/truncated."""
    info = {
        "stream_no": None, "fps": None,
        "w": None, "h": None, "bpp": None, "comp": None,
    }
    state = {"next_no": 0, "cur_no": 0, "cur_type": None}

    def walk(pos: int, end: int) -> None:
        end = min(end, len(payload))  # declared sizes can lie; clamp
        while pos + 8 <= end:
            tag = payload[pos : pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            body_at = pos + 8
            if tag == b"LIST":
                if payload[body_at : body_at + 4] == b"strl":
                    state["cur_no"] = state["next_no"]
                    state["next_no"] += 1
                    state["cur_type"] = None
                walk(body_at + 4, body_at + size)  # skip the list kind
            elif (
                tag == b"strh"
                and size >= 28  # truncated chunk: don't read past its
                and body_at + 28 <= len(payload)  # declared extent
            ):
                state["cur_type"] = payload[body_at : body_at + 4]
                if (
                    state["cur_type"] == b"vids"
                    and info["stream_no"] is None
                ):
                    info["stream_no"] = state["cur_no"]
                    scale, rate = struct.unpack_from(
                        "<II", payload, body_at + 20
                    )
                    if scale and rate:
                        info["fps"] = max(1, rate // scale)
            elif (
                tag == b"strf"
                and state["cur_type"] == b"vids"
                and info["comp"] is None
                and size >= 24  # same truncation guard as strh above
                and body_at + 24 <= len(payload)
            ):
                (
                    _, bw, bh, _, bpp, comp
                ) = struct.unpack_from("<IiiHHI", payload, body_at)
                info["w"], info["h"] = bw, abs(bh)
                info["bpp"], info["comp"] = bpp, comp
            pos = body_at + size + (size % 2)  # chunks are word-aligned

    walk(12, 8 + struct.unpack_from("<I", payload, 4)[0])
    return info


def decode_avi(payload: bytes) -> "np.ndarray":
    """uint8 (n_frames, h, w, 3) RGB from a 24-bit DIB or MJPEG AVI.

    Resolves the first 'vids' stream's BITMAPINFOHEADER (geometry + bit
    depth + compression fourcc) via the fccType-aware walker, then
    decodes only THAT stream's frame chunks ('NNdb'/'NNdc' where NN is
    the stream number) — audio ('NNwb') and any other streams' chunks
    are skipped, so mixed AV files decode instead of failing. BI_RGB
    bodies decode as raw DIB rows, 'MJPG' bodies through the
    in-container baseline JPEG decoder. Other compressions (inter-frame
    codecs) raise at the seam."""
    if not is_avi(payload):
        raise NotImplementedError("not an AVI payload")
    info = _video_stream_info(payload)
    if info["comp"] is None:
        raise NotImplementedError("AVI has no video stream header")
    mjpg = info["comp"] == _MJPG_FOURCC
    if not mjpg and (info["bpp"] != 24 or info["comp"] != 0):
        raise NotImplementedError(
            f"only 24-bit uncompressed (BI_RGB) or MJPEG AVI decodes "
            f"in-container (got {info['bpp']}-bit, "
            f"compression {info['comp']})"
        )
    w, h = info["w"], info["h"]
    if w <= 0 or h <= 0 or w * h > 1 << 26:  # biWidth is SIGNED — a
        # corrupt negative width must quarantine, not reach np.empty
        # corrupt headers can demand multi-GB frame buffers before any
        # frame data validates — refuse (quarantine)
        raise NotImplementedError(
            f"AVI frame geometry {w}x{h} out of range"
        )
    prefix = b"%02d" % info["stream_no"]
    frames: list[np.ndarray] = []

    def walk(pos: int, end: int) -> None:
        end = min(end, len(payload))
        while pos + 8 <= end:
            tag = payload[pos : pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            body_at = pos + 8
            if tag == b"LIST":
                walk(body_at + 4, body_at + size)
            elif tag[:2] == prefix and tag[2:4] in (b"db", b"dc"):
                body = payload[body_at : body_at + size]
                frames.append(
                    decode_jpeg(body) if mjpg else _decode_dib(body, w, h)
                )
            pos = body_at + size + (size % 2)

    walk(12, 8 + struct.unpack_from("<I", payload, 4)[0])
    if not frames:
        raise NotImplementedError("AVI stream has no frames")
    return np.stack(frames)


def avi_codec(payload: bytes) -> str:
    """'mjpg' or 'dib' from the VIDEO stream's strf — for re-encode
    stages (resize) that must preserve the source layout. fccType-aware
    (an audio strf no longer shadows the video one)."""
    comp = _video_stream_info(payload)["comp"]
    return "mjpg" if comp == _MJPG_FOURCC else "dib"


def avi_fps(payload: bytes, default: int = 10) -> int:
    """Frame rate from the VIDEO stream's strh (rate/scale), for
    re-encode stages that must preserve timing. fccType-aware: an audio
    strh's sample rate no longer masquerades as fps (ADVICE r9). Falls
    back to ``default`` on malformed headers — callers that got far
    enough to re-encode should not die on a missing strh."""
    fps = _video_stream_info(payload)["fps"]
    return fps if fps else default


def real_video_features(frames: "np.ndarray") -> "np.ndarray":
    """8 deterministic floats from decoded frames: normalized count/dims,
    global channel means, luma std, mean inter-frame absolute delta."""
    n, h, w = frames.shape[:3]
    f = frames.astype(np.float64)
    gray = f.mean(axis=3)
    delta = (
        float(np.abs(np.diff(f, axis=0)).mean()) / 255.0 if n > 1 else 0.0
    )
    return np.array(
        [
            n / 256.0,
            w / 4096.0,
            h / 4096.0,
            f[..., 0].mean() / 255.0,
            f[..., 1].mean() / 255.0,
            f[..., 2].mean() / 255.0,
            gray.std() / 255.0,
            delta,
        ],
        dtype=np.float32,
    )
