"""Netpbm (PBM/PGM/PPM) codec — pure Python + numpy.

The Netpbm family is the zero-dependency interchange format classic CV
datasets and tool pipelines ship (P5 grayscale / P6 RGB binary, their
ASCII twins P2/P3, and P1/P4 bitmaps). Fully structural — a whitespace
tokenizer and a reshape — so, like TIFF and Y4M, the whole surface is
bit-exact-verifiable in-container against the encoder twin.

Supported surface:

- P1..P6 (ASCII and binary bitmaps, graymaps, pixmaps);
- maxval 1..65535; 16-bit samples are big-endian per the spec and
  normalize to 8-bit as ``round(v * 255 / maxval)`` (the same
  top-bits presentation the other >8-bit decoders use);
- ``#`` comments anywhere in the header, any whitespace runs;
- output is uint8 (h, w, 3) RGB, gray/bitmap replicated, PBM's
  1-is-black convention inverted to intensity per the spec.

Multi-image streams (legal in binary Netpbm) decode their FIRST image,
matching the still-image semantics of the other image decoders. Junk
or truncation quarantines with ``NotImplementedError``.
"""

from __future__ import annotations

import numpy as np

__all__ = ["is_netpbm", "decode_netpbm", "encode_netpbm"]

_WS = b" \t\r\n\x0b\x0c"


def is_netpbm(payload: bytes) -> bool:
    return (
        len(payload) > 2
        and payload[0:1] == b"P"
        and payload[1:2] in b"123456"
        and payload[2:3] in _WS + b"#"
    )


def _tokens(payload: bytes, n: int, pos: int) -> tuple:
    """Read ``n`` whitespace-separated integer tokens starting at
    ``pos``, skipping ``#`` comments; returns (values, next_pos)."""
    vals = []
    i = pos
    end = len(payload)
    while len(vals) < n:
        while i < end and payload[i] in _WS:
            i += 1
        if i < end and payload[i : i + 1] == b"#":
            while i < end and payload[i] not in b"\n":
                i += 1
            continue
        j = i
        while j < end and payload[j] not in _WS and payload[j : j + 1] != b"#":
            j += 1
        if j == i:
            raise NotImplementedError("Netpbm header truncated")
        try:
            vals.append(int(payload[i:j]))
        except ValueError as e:
            raise NotImplementedError(
                f"Netpbm header token {payload[i:j]!r} not an integer"
            ) from e
        i = j
    return vals, i


def decode_netpbm(payload: bytes) -> "np.ndarray":
    """uint8 (h, w, 3) RGB from any of P1..P6 (see module docstring)."""
    if not is_netpbm(payload):
        raise NotImplementedError("not a Netpbm payload")
    kind = payload[1] - ord("0")
    bitmap = kind in (1, 4)
    nch = 3 if kind in (3, 6) else 1
    (w, h), pos = _tokens(payload, 2, 2)
    if w < 1 or h < 1 or w > 1 << 15 or h > 1 << 15:
        raise NotImplementedError(f"Netpbm dimensions out of range ({w}x{h})")
    if bitmap:
        maxval = 1
    else:
        (maxval,), pos = _tokens(payload, 1, pos)
        if not (1 <= maxval <= 65535):
            raise NotImplementedError(f"Netpbm maxval {maxval} out of range")
    n_vals = w * h * nch
    if kind in (1, 2, 3):  # ASCII
        if kind == 1:
            # P1 digits may run together without whitespace per the spec
            vals = []
            i = pos
            while len(vals) < n_vals and i < len(payload):
                c = payload[i : i + 1]
                if c in (b"0", b"1"):
                    vals.append(payload[i] - ord("0"))
                    i += 1
                elif payload[i] in _WS:
                    i += 1
                elif c == b"#":
                    while i < len(payload) and payload[i] not in b"\n":
                        i += 1
                else:
                    raise NotImplementedError("P1 bitmap holds a non-bit")
            if len(vals) < n_vals:
                raise NotImplementedError("Netpbm pixel data truncated")
            arr = np.array(vals, np.uint16)
        else:
            vals, _ = _tokens(payload, n_vals, pos)
            arr = np.array(vals, np.int64)
            if arr.min() < 0 or arr.max() > maxval:
                raise NotImplementedError("Netpbm sample exceeds maxval")
            arr = arr.astype(np.uint16)
    else:  # binary: exactly one whitespace byte after the header
        pos += 1
        if kind == 4:  # packed bits, rows padded to whole bytes
            rb = (w + 7) // 8
            need = rb * h
            raw = payload[pos : pos + need]
            if len(raw) < need:
                raise NotImplementedError("Netpbm pixel data truncated")
            bits = np.unpackbits(
                np.frombuffer(raw, np.uint8).reshape(h, rb), axis=1
            )
            arr = bits[:, :w].astype(np.uint16).reshape(-1)
        else:
            width = 2 if maxval > 255 else 1
            need = n_vals * width
            raw = payload[pos : pos + need]
            if len(raw) < need:
                raise NotImplementedError("Netpbm pixel data truncated")
            dt = ">u2" if width == 2 else np.uint8
            arr = np.frombuffer(raw, dt, n_vals).astype(np.uint16)
            if int(arr.max(initial=0)) > maxval:
                raise NotImplementedError("Netpbm sample exceeds maxval")
    if bitmap:
        # PBM: 1 = black per the spec -> invert to intensity
        out8 = ((1 - arr.astype(np.int64)) * 255).astype(np.uint8)
    elif maxval == 255:
        out8 = arr.astype(np.uint8)
    else:
        # exact integer round-half-up of v*255/maxval — no FP rounding
        # artifacts at the .5 boundaries (50/100 must give 128, not 127)
        a64 = arr.astype(np.int64)
        out8 = ((a64 * 510 + maxval) // (2 * maxval)).astype(np.uint8)
    img = out8.reshape(h, w, nch)
    if nch == 1:
        img = np.repeat(img, 3, axis=2)
    return np.ascontiguousarray(img)


def encode_netpbm(arr: "np.ndarray", kind: int = 6) -> bytes:
    """Netpbm from uint8 (h, w, 3) RGB or (h, w) grayscale — the
    decoder's encoder twin. ``kind``: 6 = P6 pixmap (default), 5 = P5
    graymap (input must be gray or single-channel), 3/2 = their ASCII
    twins, 4 = P4 bitmap (input must be 0/255), 1 = ASCII bitmap."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 3 and a.shape[2] == 3 and kind in (5, 2, 4, 1):
        if not (
            np.array_equal(a[..., 0], a[..., 1])
            and np.array_equal(a[..., 0], a[..., 2])
        ):
            raise ValueError("gray/bitmap kinds need grayscale input")
        a = a[..., 0]
    if kind in (6, 3):
        if a.ndim == 2:
            a = np.repeat(a[:, :, None], 3, axis=2)
        if a.ndim != 3 or a.shape[2] != 3:
            raise ValueError("P6/P3 wants (h, w, 3)")
    elif a.ndim != 2:
        raise ValueError("P5/P2/P4/P1 wants (h, w)")
    h, w = a.shape[:2]
    if kind in (4, 1):
        if not np.isin(a, (0, 255)).all():
            raise ValueError("bitmap kinds need pure 0/255 input")
        bits = (a == 0).astype(np.uint8)  # 1 = black per the spec
        if kind == 4:
            packed = np.packbits(bits, axis=1)
            return b"P4\n%d %d\n" % (w, h) + packed.tobytes()
        body = b"\n".join(
            b" ".join(b"%d" % v for v in row) for row in bits
        )
        return b"P1\n%d %d\n" % (w, h) + body + b"\n"
    hdr = b"P%d\n%d %d\n255\n" % (kind, w, h)
    if kind in (6, 5):
        return hdr + a.tobytes()
    flat = a.reshape(h, -1)
    body = b"\n".join(b" ".join(b"%d" % v for v in row) for row in flat)
    return hdr + body + b"\n"
