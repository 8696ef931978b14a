"""GIF codec (87a/89a) — pure Python LZW + numpy, no image library.

Round 9's last image-format seam: GIF is palette + LZW, both
implementable in-container. The decoder handles global/local color
tables, the 4-pass GIF interlace, multiple image blocks (animated GIFs)
with graphic-control disposal methods 0/1 (composite onto the previous
canvas) and 2 (restore to background), transparency (transparent pixels
keep the underlying canvas), and variable-width LZW with CLEAR/END codes
and table growth to 4096 entries.

The encoder exists so the decoder is round-trip-testable without an
external library: it writes each frame as literal palette indices with
periodic CLEAR codes before the code width would grow — the classic
"uncompressed GIF" layout, larger than real LZW but a fully valid stream
any decoder reads. Index-level round-trips are therefore BIT-EXACT
(palette lookup is exact). RGB inputs with ≤256 distinct colors re-encode
exactly too; wider inputs quantize ONLY on explicit opt-in
(``encode_gif_rgb(..., quantize=True)``, count-weighted median cut in
``quantize_colors`` — round 10) so the lossy step is never silent.

Scale note (same as the other codecs): the per-code Python loop is fine
for test-table media; a 100 TB pipeline decodes in a native library at
this seam — the surrounding ``mapInPandas`` plumbing is what scales.
"""

from __future__ import annotations

import struct

import numpy as np


def is_gif(payload: bytes) -> bool:
    return len(payload) > 13 and payload[:4] == b"GIF8" and payload[4:6] in (
        b"7a",
        b"9a",
    )


#: GIF interlace pass layout: (row_start, row_step)
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> "np.ndarray":
    """Variable-width LZW (GIF flavor): CLEAR resets the table, END stops,
    widths grow when the table fills, capped at 12 bits."""
    if not 1 <= min_code_size <= 11:
        # a byte-valued corrupt size would otherwise demand a 2^255-entry
        # table; codes cap at 12 bits so 11 is the legal maximum
        raise NotImplementedError(
            f"GIF LZW minimum code size {min_code_size} out of range"
        )
    clear = 1 << min_code_size
    end = clear + 1
    # bit reader state: GIF packs codes LSB-first. Loop bookkeeping stays
    # in locals (round 12): the base table is built once and copied per
    # CLEAR (uncompressed-trick streams clear every ~2^width codes, and
    # rebuilding 256 bytes objects each time dominated the frame decode),
    # and table/output lengths are tracked instead of re-measured.
    acc = n_bits = pos = 0
    width = min_code_size + 1
    width_cap = 1 << width
    base: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = base[:]
    tlen = end + 1
    dlen = len(data)
    out = bytearray()
    out_len = 0
    prev: bytes | None = None
    while out_len < n_pixels:
        while n_bits < width:
            if pos >= dlen:
                raise NotImplementedError("truncated GIF LZW stream")
            acc |= data[pos] << n_bits
            pos += 1
            n_bits += 8
        code = acc & (width_cap - 1)
        acc >>= width
        n_bits -= width
        if code == clear:
            table = base[:]
            tlen = end + 1
            width = min_code_size + 1
            width_cap = 1 << width
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= tlen:
                raise NotImplementedError("corrupt GIF LZW code")
            entry = table[code]
        elif code < tlen:
            entry = table[code]
            table.append(prev + entry[:1])
            tlen += 1
        elif code == tlen:  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
            tlen += 1
        else:
            raise NotImplementedError("corrupt GIF LZW code")
        out += entry
        out_len += len(entry)
        prev = entry
        if tlen == width_cap and width < 12:
            width += 1
            width_cap <<= 1
    if out_len < n_pixels:
        # an early END code (or corrupt table state) left the frame short
        raise NotImplementedError("GIF LZW stream ended short")
    return np.frombuffer(bytes(out[:n_pixels]), np.uint8)


def _lzw_encode_literal(min_code_size: int, indices: "np.ndarray") -> bytes:
    """Valid LZW stream of pure literal codes: a CLEAR is emitted before
    the decoder's table would force a width change, so every code stays
    at min_code_size + 1 bits — the standard 'uncompressed GIF' trick."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    # decoder table grows by 1 per literal after the first; reset before
    # it reaches 2^width (when the decoder would bump the width)
    budget = (1 << width) - end - 2
    out = bytearray()
    acc = n_bits = 0

    def emit(code: int) -> None:
        nonlocal acc, n_bits
        acc |= code << n_bits
        n_bits += width
        while n_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_bits -= 8

    emit(clear)
    since_clear = 0
    for v in indices.tolist():
        if since_clear >= budget:
            emit(clear)
            since_clear = 0
        emit(int(v))
        since_clear += 1
    emit(end)
    if n_bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    return (
        b"".join(
            bytes([len(data[i : i + 255])]) + data[i : i + 255]
            for i in range(0, len(data), 255)
        )
        + b"\x00"
    )


def encode_gif(
    frames_idx: list, palette: "np.ndarray", delay_cs: int = 10
) -> bytes:
    """GIF89a bytes from uint8 (h, w) palette-index frames + an (n, 3)
    palette (n a power of two, 2..256). Multi-frame inputs get a graphic
    control extension per frame (animated GIF); index round-trips are
    exact by construction."""
    n_colors = len(palette)
    if n_colors & (n_colors - 1) or not 2 <= n_colors <= 256:
        raise ValueError("palette size must be a power of two in [2, 256]")
    h, w = frames_idx[0].shape
    if any(
        f.shape != (h, w) or f.dtype != np.uint8 or f.max() >= n_colors
        for f in frames_idx
    ):
        raise ValueError("frames must be uint8 (h, w) indices into palette")
    depth = max(1, (n_colors - 1).bit_length())
    lsd = struct.pack(
        "<HHBBB", w, h, 0x80 | ((depth - 1) << 4) | (depth - 1), 0, 0
    )
    out = bytearray(b"GIF89a" + lsd + palette.astype(np.uint8).tobytes())
    min_code = max(2, depth)
    for f in frames_idx:
        if len(frames_idx) > 1:
            out += b"\x21\xf9" + bytes([4]) + struct.pack(
                "<BHB", 0x04, delay_cs, 0  # disposal 1 (keep), no transp.
            ) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out += bytes([min_code])
        out += _sub_blocks(_lzw_encode_literal(min_code, f.reshape(-1)))
    out += b"\x3b"  # trailer
    return bytes(out)


def quantize_colors(frames_rgb: list, n_colors: int = 256) -> tuple:
    """Median-cut color quantization (Heckbert 1982): returns
    ``(palette, index_frames)`` with at most ``n_colors`` palette entries
    (padded to a power of two for the GIF header).

    The classic algorithm over the UNIQUE colors, pixel-count weighted:
    start with one box holding every distinct color; repeatedly split the
    box with the widest channel spread (ties: most pixels) at its
    count-weighted median along that channel; each box becomes one
    palette entry (the count-weighted mean of its colors) and every
    pixel maps to its color's box. Deterministic — same frames, same
    palette and indexes — so re-encodes are reproducible."""
    flat = np.concatenate([f.reshape(-1, 3) for f in frames_rgb])
    colors, inverse, counts = np.unique(
        flat, axis=0, return_inverse=True, return_counts=True
    )
    colors_i = colors.astype(np.int64)
    boxes = [np.arange(len(colors))]
    while len(boxes) < n_colors:
        best, best_key = None, None
        for bi, idx in enumerate(boxes):
            if len(idx) < 2:
                continue
            c = colors_i[idx]
            key = ((c.max(0) - c.min(0)).max(), int(counts[idx].sum()))
            if best is None or key > best_key:
                best, best_key = bi, key
        if best is None:  # every box is a single color already
            break
        idx = boxes.pop(best)
        c = colors_i[idx]
        ch = int(np.argmax(c.max(0) - c.min(0)))
        order = np.argsort(c[:, ch], kind="stable")
        w = counts[idx][order]
        half = int(np.searchsorted(np.cumsum(w), w.sum() / 2.0)) + 1
        half = min(max(half, 1), len(idx) - 1)
        boxes.append(idx[order[:half]])
        boxes.append(idx[order[half:]])
    n_pal = max(2, 1 << (len(boxes) - 1).bit_length())
    palette = np.zeros((n_pal, 3), np.uint8)
    color_to_pal = np.empty(len(colors), np.int64)
    for pi, idx in enumerate(boxes):
        w = counts[idx].astype(np.float64)
        palette[pi] = np.clip(
            np.round((colors_i[idx] * w[:, None]).sum(0) / w.sum()),
            0, 255,
        ).astype(np.uint8)
        color_to_pal[idx] = pi
    pal_flat = color_to_pal[inverse].astype(np.uint8)
    frames_idx, at = [], 0
    for f in frames_rgb:
        m = f.shape[0] * f.shape[1]
        frames_idx.append(pal_flat[at : at + m].reshape(f.shape[:2]))
        at += m
    return palette, frames_idx


def encode_gif_rgb(
    frames_rgb: list, delay_cs: int = 10, quantize: bool = False
) -> bytes:
    """GIF from uint8 (h, w, 3) RGB frames with ≤256 distinct colors —
    the palette is recovered from the pixels, so resample stages
    (nearest-neighbor never invents a color) re-encode EXACTLY. More
    than 256 colors needs quantization — a LOSSY design decision this
    codec only makes when the caller opts in with ``quantize=True``
    (median-cut via ``quantize_colors``); the silent default stays a
    refusal, and ≤256-color inputs stay exact either way."""
    if any(f.dtype != np.uint8 or f.ndim != 3 for f in frames_rgb):
        raise ValueError("encode_gif_rgb expects uint8 (h, w, 3) frames")
    flat = np.concatenate([f.reshape(-1, 3) for f in frames_rgb])
    colors = np.unique(flat, axis=0)
    if len(colors) > 256:
        if quantize:
            palette, frames_idx = quantize_colors(frames_rgb, 256)
            return encode_gif(frames_idx, palette, delay_cs=delay_cs)
        raise NotImplementedError(
            f"{len(colors)} distinct colors: GIF needs quantization to 256"
        )
    n = max(2, 1 << (len(colors) - 1).bit_length())
    palette = np.zeros((n, 3), np.uint8)
    palette[: len(colors)] = colors
    # color -> index via a void view (rows as scalars) + searchsorted
    void = np.dtype((np.void, 3))
    keys = np.ascontiguousarray(colors).view(void).reshape(-1)
    frames_idx = []
    for f in frames_rgb:
        px = np.ascontiguousarray(f.reshape(-1, 3)).view(void).reshape(-1)
        frames_idx.append(
            np.searchsorted(keys, px).astype(np.uint8).reshape(f.shape[:2])
        )
    return encode_gif(frames_idx, palette, delay_cs=delay_cs)


def decode_gif(payload: bytes) -> "np.ndarray":
    """uint8 (n_frames, h, w, 3) RGB from a GIF87a/89a stream — every
    frame composited onto the logical screen per its disposal method."""
    if not is_gif(payload):
        raise NotImplementedError("not a GIF payload")
    w, h, flags, bg_idx, _ = struct.unpack_from("<HHBBB", payload, 6)
    if w * h == 0 or w * h > 1 << 26:
        # a corrupt header can declare a 65535x65535 screen; allocating
        # a 12 GB canvas before any content validates is how one garbage
        # row stalls a task for minutes — refuse (quarantine) instead.
        # 67M pixels covers any real GIF this pipeline will meet.
        raise NotImplementedError(f"GIF logical screen {w}x{h} out of range")
    pos = 13
    global_pal = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        if pos + n * 3 > len(payload):
            raise NotImplementedError("truncated GIF color table")
        global_pal = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(
            n, 3
        )
        pos += n * 3
    bg_rgb = (
        global_pal[bg_idx]
        if global_pal is not None and bg_idx < len(global_pal)
        else np.zeros(3, np.uint8)
    )
    canvas = np.tile(bg_rgb, (h, w, 1)).astype(np.uint8)
    try:
        frames = _walk_gif_blocks(
            payload, pos, w, h, global_pal, bg_rgb, canvas
        )
    except (IndexError, struct.error):
        # every raw payload[...] access in the block walk can run off a
        # truncated stream; one seam converts them to the quarantine error
        raise NotImplementedError("truncated GIF stream") from None
    if not frames:
        raise NotImplementedError("GIF stream has no image blocks")
    return np.stack(frames)


def _walk_gif_blocks(payload, pos, w, h, global_pal, bg_rgb, canvas):
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = payload[pos]
                gflags = payload[pos + 1]
                disposal = (gflags >> 2) & 0x07
                transparent = (
                    payload[pos + 4] if gflags & 0x01 else None
                )
                pos += size + 1
            while payload[pos] != 0:  # skip (remaining) sub-blocks
                pos += payload[pos] + 1
            pos += 1
        elif block == 0x2C:  # image descriptor
            x0, y0, iw, ih, iflags = struct.unpack_from("<HHHHB", payload, pos)
            pos += 9
            if iw * ih == 0 or x0 + iw > w or y0 + ih > h:
                # a frame rect escaping the logical screen would silently
                # clip the numpy composite — corrupt, not representable
                raise NotImplementedError(
                    "GIF frame rect outside the logical screen"
                )
            pal = global_pal
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                pal = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(
                    n, 3
                )
                pos += n * 3
            if pal is None:
                raise NotImplementedError("GIF image with no color table")
            min_code = payload[pos]
            pos += 1
            lzw = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                lzw += payload[pos + 1 : pos + 1 + ln]
                pos += ln + 1
            pos += 1
            idx = _lzw_decode(min_code, bytes(lzw), iw * ih).reshape(ih, iw)
            if iflags & 0x40:  # 4-pass interlace
                de = np.empty_like(idx)
                r = 0
                for start, step in _INTERLACE:
                    rows = range(start, ih, step)
                    de[list(rows)] = idx[r : r + len(rows)]
                    r += len(rows)
                idx = de
            before = canvas.copy()
            region = canvas[y0 : y0 + ih, x0 : x0 + iw]
            rgb = pal[np.minimum(idx, len(pal) - 1)]
            if transparent is not None:
                opaque = (idx != transparent)[..., None]
                region[...] = np.where(opaque, rgb, region)
            else:
                region[...] = rgb
            frames.append(canvas.copy())
            if disposal == 2:  # restore to background
                canvas[y0 : y0 + ih, x0 : x0 + iw] = bg_rgb
            elif disposal == 3:  # restore to previous
                canvas = before
            disposal = 0
            transparent = None
        else:
            raise NotImplementedError(f"unknown GIF block 0x{block:02X}")
    return frames
