"""YUV4MPEG2 (Y4M) video codec — pure Python + numpy.

Y4M is the standard UNCOMPRESSED video interchange format (the thing
``ffmpeg -f yuv4mpeg2`` and every codec test corpus emits): a one-line
ASCII header, then ``FRAME\\n``-delimited planar YUV. For an ML video
pipeline it matters twice — raw clips arrive in it, and it is the
lingua franca BETWEEN decode stages — and unlike the inter-frame
codecs it is fully structural, so real frame decode is a header walk
plus a reshape.

Supported surface:

- header params ``W`` ``H`` ``F`` (frame rate as num:den), ``I``
  (ignored — interlacing is metadata here), ``A`` (ignored), ``X``
  (ignored), ``C`` colorspaces ``420`` / ``420jpeg`` / ``420mpeg2`` /
  ``420paldv`` (decoded identically — chroma SITING differences are
  below the nearest-neighbor upsampling this decoder uses, and are
  documented as such) / ``422`` / ``444`` / ``mono``; absent ``C``
  defaults to 420 per the spec;
- YUV <-> RGB is ITU-R BT.601 **limited range** (Y 16..235, C
  16..240), the Y4M convention, computed in float64 and rounded —
  deterministic on any host;
- chroma upsampling is nearest-neighbor (pixel replication), chroma
  downsampling in the encoder twin is a 2x1/2x2 box mean — both
  deterministic and partition-independent.

Frame-level ``FRAME`` parameters and anything outside this surface
quarantine with ``NotImplementedError`` — same seam contract as every
other codec in this package.
"""

from __future__ import annotations

import numpy as np

__all__ = ["is_y4m", "decode_y4m", "encode_y4m", "y4m_fps"]

_MAGIC = b"YUV4MPEG2 "

#: colorspace -> (x_subsample, y_subsample) of the chroma planes;
#: None marks mono (no chroma planes at all)
_CHROMA = {
    b"420": (2, 2),
    b"420jpeg": (2, 2),
    b"420mpeg2": (2, 2),
    b"420paldv": (2, 2),
    b"422": (2, 1),
    b"444": (1, 1),
    b"mono": None,
}


def is_y4m(payload: bytes) -> bool:
    return payload[: len(_MAGIC)] == _MAGIC


def _parse_header(payload: bytes) -> tuple:
    nl = payload.find(b"\n")
    if nl < 0 or not is_y4m(payload):
        raise NotImplementedError("not a Y4M payload")
    w = h = 0
    fps_num, fps_den = 25, 1  # spec default when F is absent
    cs = b"420"
    for tok in payload[len(_MAGIC) : nl].split(b" "):
        if not tok:
            continue
        key, val = tok[:1], tok[1:]
        try:
            if key == b"W":
                w = int(val)
            elif key == b"H":
                h = int(val)
            elif key == b"F":
                num, den = val.split(b":")
                fps_num, fps_den = int(num), int(den)
            elif key == b"C":
                cs = val
            elif key in (b"I", b"A", b"X"):
                pass  # metadata, irrelevant to the sample layout
            else:
                raise NotImplementedError(
                    f"Y4M header parameter {key!r} unsupported"
                )
        except ValueError as e:
            raise NotImplementedError(f"malformed Y4M header token {tok!r}") from e
    if w < 1 or h < 1 or w > 1 << 14 or h > 1 << 14:
        raise NotImplementedError(f"Y4M dimensions out of range ({w}x{h})")
    if fps_num < 1 or fps_den < 1:
        raise NotImplementedError("Y4M frame rate must be positive")
    if cs not in _CHROMA:
        raise NotImplementedError(f"Y4M colorspace {cs!r} unsupported")
    sub = _CHROMA[cs]
    if sub is not None and (w % sub[0] or h % sub[1]):
        raise NotImplementedError(
            f"Y4M {w}x{h} not divisible by the {cs!r} subsampling"
        )
    return nl + 1, w, h, fps_num, fps_den, sub


def _yuv_to_rgb(y, u, v):
    """BT.601 limited-range -> full-range RGB, float64 then rint."""
    yf = (y.astype(np.float64) - 16.0) * 1.164383
    ub = u.astype(np.float64) - 128.0
    vb = v.astype(np.float64) - 128.0
    r = yf + 1.596027 * vb
    g = yf - 0.391762 * ub - 0.812968 * vb
    b = yf + 2.017232 * ub
    return np.clip(
        np.rint(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


def _rgb_to_yuv(arr):
    r = arr[..., 0].astype(np.float64)
    g = arr[..., 1].astype(np.float64)
    b = arr[..., 2].astype(np.float64)
    y = 16.0 + (65.481 * r + 128.553 * g + 24.966 * b) / 255.0
    u = 128.0 + (-37.797 * r - 74.203 * g + 112.0 * b) / 255.0
    v = 128.0 + (112.0 * r - 93.786 * g - 18.214 * b) / 255.0
    return (
        np.clip(np.rint(y), 16, 235).astype(np.uint8),
        np.clip(np.rint(u), 16, 240).astype(np.uint8),
        np.clip(np.rint(v), 16, 240).astype(np.uint8),
    )


def decode_y4m(payload: bytes) -> "np.ndarray":
    """uint8 (n_frames, h, w, 3) RGB from a Y4M stream. Same output
    presentation as ``decode_avi``/``decode_gif`` so the frame-sampling
    and resize stages compose over all three video containers."""
    pos, w, h, _fn, _fd, sub = _parse_header(payload)
    ysize = w * h
    if sub is None:
        csize = 0
    else:
        csize = (w // sub[0]) * (h // sub[1])
    frame_bytes = ysize + 2 * csize
    frames = []
    while pos < len(payload):
        nl = payload.find(b"\n", pos)
        if nl < 0 or payload[pos : pos + 5] != b"FRAME":
            raise NotImplementedError("Y4M frame marker missing")
        if nl != pos + 5:
            raise NotImplementedError("Y4M per-frame parameters unsupported")
        pos = nl + 1
        raw = payload[pos : pos + frame_bytes]
        if len(raw) < frame_bytes:
            raise NotImplementedError("Y4M frame truncated")
        pos += frame_bytes
        y = np.frombuffer(raw, np.uint8, ysize).reshape(h, w)
        if sub is None:
            u = np.full((h, w), 128, np.uint8)
            v = np.full((h, w), 128, np.uint8)
        else:
            cw, ch = w // sub[0], h // sub[1]
            u = np.frombuffer(raw, np.uint8, csize, ysize).reshape(ch, cw)
            v = np.frombuffer(raw, np.uint8, csize, ysize + csize).reshape(
                ch, cw
            )
            u = np.repeat(np.repeat(u, sub[1], axis=0), sub[0], axis=1)
            v = np.repeat(np.repeat(v, sub[1], axis=0), sub[0], axis=1)
        frames.append(_yuv_to_rgb(y, u, v))
    if not frames:
        raise NotImplementedError("Y4M stream holds no frames")
    return np.stack(frames)


def y4m_fps(payload: bytes) -> float:
    _pos, _w, _h, fn, fd, _sub = _parse_header(payload)
    return fn / fd


def encode_y4m(
    frames: "np.ndarray" | list,
    fps: int = 25,
    colorspace: str = "444",
) -> bytes:
    """Y4M stream from uint8 (n, h, w, 3) RGB frames — the decoder's
    encoder twin. ``colorspace`` in {"444", "422", "420jpeg", "mono"};
    chroma is box-averaged down. 444 round-trips within the BT.601
    limited-range quantization (+-2 per channel); the subsampled modes
    are lossy by construction, like any real 4:2:0 pipeline."""
    arr = np.asarray(frames, dtype=np.uint8)
    if arr.ndim != 4 or arr.shape[3] != 3 or arr.shape[0] < 1:
        raise ValueError("encode_y4m wants uint8 (n, h, w, 3)")
    n, h, w = arr.shape[:3]
    cs = colorspace.encode()
    if cs not in _CHROMA:
        raise ValueError(f"colorspace {colorspace!r} unsupported")
    sub = _CHROMA[cs]
    if sub is not None and (w % sub[0] or h % sub[1]):
        raise ValueError(f"{w}x{h} not divisible by C{colorspace} subsampling")
    out = bytearray(
        b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C%s\n" % (w, h, int(fps), cs)
    )
    for f in arr:
        y, u, v = _rgb_to_yuv(f)
        out += b"FRAME\n"
        out += y.tobytes()
        if sub is not None:
            sx, sy = sub
            for plane in (u, v):
                p = plane.reshape(h // sy, sy, w // sx, sx)
                p = np.rint(
                    p.astype(np.float64).mean(axis=(1, 3))
                ).astype(np.uint8)
                out += p.tobytes()
    return bytes(out)
