"""Truevision TGA codec — pure Python + numpy.

TGA is the game-asset/CV-texture format (type 2 uncompressed and
type 10 RLE truecolor are essentially all of what exists in the wild),
and like TIFF/Netpbm it is fully structural: bit-exact round trips
against the encoder twin verify the whole surface in-container.

Supported surface:

- image types 2 (uncompressed truecolor) and 10 (RLE truecolor),
  24-bit BGR and 32-bit BGRA (alpha dropped on decode — the package's
  RGB presentation), plus types 3/11 (grayscale, replicated);
- both vertical origins (descriptor bit 5: bottom-up default,
  top-down set) and an id field of any length;
- RLE packets may by spec cross scanline boundaries — the decoder
  handles that; the encoder twin restarts packets per row (also legal,
  and what most writers emit).

Color-mapped (type 1/9) and 15/16-bit images quarantine with
``NotImplementedError`` at the documented seam.

TGA has no magic number; ``is_tga`` is a structural sniff (header
field constraints + size arithmetic), so the pipeline dispatcher can
only use it AFTER every magic-bearing format — the catalog and
``decode_image`` both try it last.
"""

from __future__ import annotations

import numpy as np

__all__ = ["is_tga", "decode_tga", "encode_tga"]


def _header(p: bytes):
    """(id_len, cmap_type, img_type, w, h, bpp, desc) or None."""
    if len(p) < 18:
        return None
    id_len = p[0]
    cmap_type = p[1]
    img_type = p[2]
    w = p[12] | (p[13] << 8)
    h = p[14] | (p[15] << 8)
    bpp = p[16]
    desc = p[17]
    return id_len, cmap_type, img_type, w, h, bpp, desc


def is_tga(p: bytes) -> bool:
    """Structural sniff — TGA has no magic. Accepts only the shapes the
    decoder supports and requires the payload to be big enough for at
    least a plausible pixel block, which rejects random headers from
    other formats in practice."""
    hdr = _header(p)
    if hdr is None:
        return False
    id_len, cmap_type, img_type, w, h, bpp, desc = hdr
    if cmap_type != 0 or img_type not in (2, 3, 10, 11):
        return False
    if img_type in (2, 10) and bpp not in (24, 32):
        return False
    if img_type in (3, 11) and bpp != 8:
        return False
    if not (1 <= w <= 1 << 14 and 1 <= h <= 1 << 14):
        return False
    if desc & 0xC0:  # interleave bits must be zero
        return False
    need = 18 + id_len + (w * h * (bpp // 8) if img_type in (2, 3) else 1)
    return len(p) >= need


def decode_tga(p: bytes) -> "np.ndarray":
    """uint8 (h, w, 3) RGB (see module docstring for the surface)."""
    hdr = _header(p)
    if hdr is None or not is_tga(p):
        raise NotImplementedError("not a (supported) TGA payload")
    id_len, _cmap, img_type, w, h, bpp, desc = hdr
    nch = bpp // 8
    pos = 18 + id_len
    n_px = w * h
    if img_type in (2, 3):  # uncompressed
        need = n_px * nch
        raw = p[pos : pos + need]
        if len(raw) < need:
            raise NotImplementedError("TGA pixel data truncated")
        px = np.frombuffer(raw, np.uint8).reshape(n_px, nch)
    else:  # RLE
        out = np.empty((n_px, nch), np.uint8)
        filled = 0
        while filled < n_px:
            if pos >= len(p):
                raise NotImplementedError("TGA RLE stream truncated")
            packet = p[pos]
            pos += 1
            count = (packet & 0x7F) + 1
            count = min(count, n_px - filled)
            if packet & 0x80:  # run packet: one pixel value repeated
                if pos + nch > len(p):
                    raise NotImplementedError("TGA RLE run truncated")
                out[filled : filled + count] = np.frombuffer(
                    p, np.uint8, nch, pos
                )
                pos += nch
            else:  # raw packet
                need = count * nch
                if pos + need > len(p):
                    raise NotImplementedError("TGA RLE literal truncated")
                out[filled : filled + count] = np.frombuffer(
                    p, np.uint8, need, pos
                ).reshape(count, nch)
                pos += need
            filled += count
        px = out
    img = px.reshape(h, w, nch)
    if nch == 1:
        rgb = np.repeat(img, 3, axis=2)
    else:
        rgb = img[:, :, 2::-1]  # BGR(A) -> RGB, alpha dropped
    if not (desc & 0x20):  # bit 5 clear: bottom-up origin
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


def encode_tga(
    arr: "np.ndarray", rle: bool = False, top_down: bool = True
) -> bytes:
    """TGA from uint8 (h, w, 3) RGB or (h, w) grayscale — the decoder's
    encoder twin. ``rle=True`` writes type 10/11 with per-row packets;
    ``top_down=False`` writes the spec-default bottom-up origin."""
    a = np.asarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError("encode_tga wants (h, w, 3) RGB or (h, w) gray")
    h, w = a.shape[:2]
    img_type = (11 if gray else 10) if rle else (3 if gray else 2)
    bpp = 8 if gray else 24
    desc = 0x20 if top_down else 0x00
    hdr = bytes(
        [0, 0, img_type, 0, 0, 0, 0, 0, 0, 0, 0, 0,
         w & 0xFF, w >> 8, h & 0xFF, h >> 8, bpp, desc]
    )
    body = a if top_down else a[::-1]
    if not gray:
        body = body[:, :, ::-1]  # RGB -> BGR
    flat = body.reshape(h, -1) if gray else body.reshape(h, w, 3)
    if not rle:
        return hdr + body.tobytes()
    out = bytearray(hdr)
    for y in range(h):
        row = body[y].reshape(w, -1)
        x = 0
        while x < w:
            # measure the run at x
            run = 1
            while (
                x + run < w
                and run < 128
                and (row[x + run] == row[x]).all()
            ):
                run += 1
            if run >= 2:
                out.append(0x80 | (run - 1))
                out += row[x].tobytes()
                x += run
                continue
            # literal until the next >=2 run or the 128 cap
            lit = 1
            while (
                x + lit < w
                and lit < 128
                and not (
                    x + lit + 1 < w
                    and (row[x + lit + 1] == row[x + lit]).all()
                )
            ):
                lit += 1
            out.append(lit - 1)
            out += row[x : x + lit].tobytes()
            x += lit
    return bytes(out)
