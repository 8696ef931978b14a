"""Baseline TIFF codec — pure Python + numpy, no image library.

TIFF is the archival/scan format large document corpora actually
arrive in (digitized books, medical scans, GIS tiles), and unlike the
entropy-coded codecs it is fully structural: every supported variant
round-trips BIT-EXACTLY against the encoder twin in-container, so the
whole surface is oracle-verifiable without a native reference.

Supported surface (TIFF 6.0 baseline):

- both byte orders (``II`` little-endian, ``MM`` big-endian);
- 8- and 16-bit grayscale (PhotometricInterpretation 0/1 — 0 is
  inverted per the spec) and RGB, chunky planar config, any
  RowsPerStrip stripping; 16-bit samples (either byte order, predictor
  differencing per 16-bit value per the spec) normalize to the top
  byte, the same presentation the 16-bit PNG path uses;
- Compression 1 (none), 32773 (PackBits), and 5 (LZW — the full
  variable-width MSB-first code stream with the spec's "early change"
  width bump, plus the horizontal-differencing Predictor 2);
- output is always uint8 (h, w, 3) RGB, grayscale replicated — the
  same presentation every other image decoder in this package uses.

Everything else (tiles, planar=2, palette, CCITT/JPEG-in-TIFF,
floating point) quarantines with ``NotImplementedError`` at the
documented seam, exactly like the other codecs' unsupported features.

The LZW decoder is table-driven over a bytes-concatenation dictionary
(entries are materialized strips of output, so emission is a single
``bytes`` slice per code — the GIF decoder's CLEAR-reusable base-table
idea applied to TIFF's MSB-first variant); PackBits is vectorized per
run. Both are linear in output size.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "is_tiff",
    "decode_tiff",
    "encode_tiff",
]

# tag ids (TIFF 6.0)
_T_WIDTH = 256
_T_HEIGHT = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SAMPLES = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_COUNTS = 279
_T_PLANAR = 284
_T_PREDICTOR = 317

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def is_tiff(payload: bytes) -> bool:
    return payload[:4] in (b"II*\x00", b"MM\x00*")


# ---------------------------------------------------------------------------
# PackBits (Compression 32773)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        h = data[i]
        i += 1
        if h < 128:  # literal run of h+1 bytes
            if i + h + 1 > n:
                raise NotImplementedError("PackBits literal overruns strip")
            out += data[i : i + h + 1]
            i += h + 1
        elif h > 128:  # replicate next byte 257-h times
            if i >= n:
                raise NotImplementedError("PackBits replicate missing byte")
            out += bytes([data[i]]) * (257 - h)
            i += 1
        # h == 128: no-op per the spec
    if len(out) < expected:
        raise NotImplementedError("PackBits strip shorter than declared")
    return bytes(out[:expected])


def _packbits_encode(row: bytes) -> bytes:
    """Per-row PackBits (the spec recommends restarting per row)."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        # find a replicate run
        j = i
        while j + 1 < n and row[j + 1] == row[j] and j - i < 127:
            j += 1
        if j > i:  # run of length j-i+1 >= 2
            out += bytes([257 - (j - i + 1), row[i]])
            i = j + 1
            continue
        # literal run until the next 3-byte replicate (2-runs aren't worth
        # breaking a literal for) or the 128 cap
        j = i + 1
        while (
            j < n
            and j - i < 128
            and not (
                j + 2 < n and row[j + 1] == row[j] and row[j + 2] == row[j]
            )
        ):
            j += 1
        out += bytes([j - i - 1]) + row[i:j]
        i = j
    return bytes(out)


# ---------------------------------------------------------------------------
# LZW (Compression 5) — MSB-first, 9..12-bit codes, early-change width


_CLEAR = 256
_EOI = 257


def _lzw_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    pos = 0
    nbits = len(data) << 3

    table: list[bytes] = []
    width = 9
    prev: bytes | None = None

    def reset_table():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset_table()
    while pos + width <= nbits and len(out) < expected:
        # MSB-first code straight from the byte stream: grab the 2-3
        # bytes spanning [pos, pos+width), shift the tail off — ~4 int
        # ops per code instead of a per-bit Python loop (probed 10x+)
        end = pos + width
        chunk = int.from_bytes(data[pos >> 3 : (end + 7) >> 3], "big")
        code = (chunk >> (((end + 7) >> 3 << 3) - end)) & ((1 << width) - 1)
        pos = end
        if code == _CLEAR:
            reset_table()
            continue
        if code == _EOI:
            break
        if prev is None:
            if code >= 256:
                raise NotImplementedError("LZW first code not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise NotImplementedError("LZW code beyond table")
        out += entry
        prev = entry
        # early change: the width bumps one code BEFORE the table fills,
        # and the decoder's table is one entry BEHIND the encoder's at
        # the same stream position, so its threshold is 2^width - 2
        # (the encoder's is 2^width - 1)
        if len(table) >= (1 << width) - 2 and width < 12:
            width += 1
    if len(out) < expected:
        raise NotImplementedError("LZW strip shorter than declared")
    return bytes(out[:expected])


def _lzw_encode(data: bytes) -> bytes:
    out_bits = bytearray()  # bit string built as ints then packed
    acc = 0
    nacc = 0
    packed = bytearray()

    def emit(code: int, width: int):
        nonlocal acc, nacc
        acc = (acc << width) | code
        nacc += width
        while nacc >= 8:
            nacc -= 8
            packed.append((acc >> nacc) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(_CLEAR, width)
    w = b""
    for i in range(len(data)):
        c = data[i : i + 1]
        if w + c in table:
            w += c
            continue
        emit(table[w], width)
        table[w + c] = next_code
        next_code += 1
        # early change on the ENCODER side too — one code before the
        # width actually fills, mirroring the decoder's bump
        if next_code >= (1 << width) - 1 and width < 12:
            width += 1
        if next_code >= 4094:  # spec: reset before the table overflows
            emit(_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = c
    if w:
        emit(table[w], width)
    emit(_EOI, width)
    if nacc:
        packed.append((acc << (8 - nacc)) & 0xFF)
    return bytes(packed)


# ---------------------------------------------------------------------------
# container


def _read_ifd(payload: bytes, lt: str) -> dict:
    if len(payload) < 8:
        raise NotImplementedError("TIFF shorter than its header")
    (ifd_off,) = struct.unpack_from(lt + "I", payload, 4)
    if ifd_off + 2 > len(payload):
        raise NotImplementedError("TIFF IFD offset beyond payload")
    (n_entries,) = struct.unpack_from(lt + "H", payload, ifd_off)
    tags: dict[int, list] = {}
    for k in range(n_entries):
        off = ifd_off + 2 + 12 * k
        if off + 12 > len(payload):
            raise NotImplementedError("TIFF IFD entry beyond payload")
        tag, typ, count = struct.unpack_from(lt + "HHI", payload, off)
        size = _TYPE_SIZES.get(typ)
        if size is None:
            continue  # unknown type: ignore the tag, per the spec
        total = size * count
        if total <= 4:
            raw = payload[off + 8 : off + 8 + total]
        else:
            (voff,) = struct.unpack_from(lt + "I", payload, off + 8)
            raw = payload[voff : voff + total]
            if len(raw) < total:
                raise NotImplementedError("TIFF tag value beyond payload")
        if typ == 3:
            vals = list(struct.unpack(lt + "H" * count, raw))
        elif typ == 4:
            vals = list(struct.unpack(lt + "I" * count, raw))
        elif typ == 1:
            vals = list(raw)
        else:
            continue  # rational/ascii etc. — not needed for decode
        if vals:  # a zero-count tag carries no value: treat as absent
            tags[tag] = vals
    return tags


def decode_tiff(payload: bytes) -> "np.ndarray":
    """uint8 (h, w, 3) RGB from a baseline TIFF (see module docstring
    for the supported surface and quarantine seam)."""
    if not is_tiff(payload):
        raise NotImplementedError("not a TIFF payload")
    lt = "<" if payload[:2] == b"II" else ">"
    tags = _read_ifd(payload, lt)
    try:
        w = tags[_T_WIDTH][0]
        h = tags[_T_HEIGHT][0]
        offsets = tags[_T_STRIP_OFFSETS]
        counts = tags[_T_STRIP_COUNTS]
    except KeyError as e:
        raise NotImplementedError(f"TIFF missing required tag {e}") from e
    spp = tags.get(_T_SAMPLES, [1])[0]
    bits = tags.get(_T_BITS, [8] * spp)
    comp = tags.get(_T_COMPRESSION, [1])[0]
    photo = tags.get(_T_PHOTOMETRIC, [1])[0]
    rps = tags.get(_T_ROWS_PER_STRIP, [h])[0] or h
    planar = tags.get(_T_PLANAR, [1])[0]
    predictor = tags.get(_T_PREDICTOR, [1])[0]
    if w < 1 or h < 1 or w > 1 << 15 or h > 1 << 15:
        raise NotImplementedError(f"TIFF dimensions out of range ({w}x{h})")
    depth = bits[0] if bits else 8
    if (
        spp not in (1, 3)
        or depth not in (8, 16)
        or any(b != depth for b in bits[:spp])
    ):
        raise NotImplementedError(
            f"only 8/16-bit gray/RGB TIFF decodes (spp={spp}, bits={bits})"
        )
    if photo not in (0, 1, 2) or (photo == 2) != (spp == 3):
        raise NotImplementedError(
            f"TIFF photometric {photo} with {spp} samples unsupported"
        )
    if planar != 1:
        raise NotImplementedError("planar TIFF (PlanarConfiguration=2)")
    if comp not in (1, 5, 32773):
        raise NotImplementedError(
            f"TIFF compression {comp} (baseline none/LZW/PackBits only)"
        )
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor}")
    if len(offsets) != len(counts):
        raise NotImplementedError("TIFF strip offset/count length mismatch")
    row_bytes = w * spp * (depth // 8)
    rows = []
    for s, (off, cnt) in enumerate(zip(offsets, counts)):
        nrows = min(rps, h - s * rps)
        if nrows <= 0:
            raise NotImplementedError("TIFF has more strips than rows")
        raw = payload[off : off + cnt]
        if len(raw) < cnt:
            raise NotImplementedError("TIFF strip beyond payload")
        expected = nrows * row_bytes
        if comp == 1:
            if len(raw) < expected:
                raise NotImplementedError("TIFF strip shorter than declared")
            strip = raw[:expected]
        elif comp == 32773:
            strip = _packbits_decode(raw, expected)
        else:
            strip = _lzw_decode(raw, expected)
        if depth == 16:
            # predictor differencing is per 16-bit VALUE (spec 14);
            # normalize to the top byte after reconstruction, the same
            # presentation the 16-bit PNG path uses
            a16 = np.frombuffer(strip, lt + "u2").reshape(nrows, w, spp)
            if predictor == 2:
                a16 = (
                    np.cumsum(a16.astype(np.uint64), axis=1) & 0xFFFF
                ).astype(np.uint16)
            arr = (a16 >> 8).astype(np.uint8)
        else:
            arr = np.frombuffer(strip, np.uint8).reshape(nrows, w, spp)
            if predictor == 2:
                arr = np.cumsum(arr.astype(np.uint32), axis=1).astype(
                    np.uint8
                )
        rows.append(arr)
    img = np.concatenate(rows, axis=0)
    if img.shape[0] != h:
        raise NotImplementedError("TIFF strips do not cover the image")
    if spp == 1:
        if photo == 0:  # WhiteIsZero: invert per the spec
            img = 255 - img
        img = np.repeat(img, 3, axis=2)
    return np.ascontiguousarray(img)


def encode_tiff(
    arr: "np.ndarray",
    compression: str = "none",
    rows_per_strip: int = 8,
    big_endian: bool = False,
    predictor: bool = False,
    deep: bool = False,
) -> bytes:
    """Baseline TIFF from uint8 (h, w, 3) RGB or (h, w) grayscale — the
    decoder's encoder twin. ``compression`` in {"none", "packbits",
    "lzw"}; ``predictor`` enables horizontal differencing (LZW only,
    per the spec's intent); ``deep`` writes 16-bit samples (v*257, the
    exact 8->16 upconvert, so decode's top-byte normalization
    round-trips bit-exactly)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 3):
        raise ValueError("encode_tiff wants (h,w), (h,w,1) or (h,w,3)")
    comp_id = {"none": 1, "packbits": 32773, "lzw": 5}[compression]
    if predictor and compression != "lzw":
        raise ValueError("predictor is an LZW option")
    h, w, spp = a.shape
    lt = ">" if big_endian else "<"
    depth = 16 if deep else 8
    strips = []
    for y0 in range(0, h, rows_per_strip):
        block = a[y0 : y0 + rows_per_strip]
        if deep:
            b16 = block.astype(np.uint16) * 257
            if predictor:
                d = b16.astype(np.int32)
                d[:, 1:, :] = d[:, 1:, :] - d[:, :-1, :]
                b16 = (d & 0xFFFF).astype(np.uint16)
            raw = b16.astype(lt + "u2").tobytes()
        else:
            if predictor:
                d = block.astype(np.int16)
                d[:, 1:, :] = d[:, 1:, :] - d[:, :-1, :]
                block = (d & 0xFF).astype(np.uint8)
            raw = block.tobytes()
        if comp_id == 1:
            strips.append(raw)
        elif comp_id == 32773:
            rb = w * spp
            strips.append(
                b"".join(
                    _packbits_encode(raw[r : r + rb])
                    for r in range(0, len(raw), rb)
                )
            )
        else:
            strips.append(_lzw_encode(raw))

    def entry(tag, typ, vals):
        count = len(vals)
        size = _TYPE_SIZES[typ] * count
        fmt = {3: "H", 4: "I", 1: "B"}[typ]
        packed = struct.pack(lt + fmt * count, *vals)
        return tag, typ, count, packed, size

    entries = [
        entry(_T_WIDTH, 4, [w]),
        entry(_T_HEIGHT, 4, [h]),
        entry(_T_BITS, 3, [depth] * spp),
        entry(_T_COMPRESSION, 3, [comp_id]),
        entry(_T_PHOTOMETRIC, 3, [2 if spp == 3 else 1]),
        entry(_T_SAMPLES, 3, [spp]),
        entry(_T_ROWS_PER_STRIP, 3, [rows_per_strip]),
        entry(_T_PLANAR, 3, [1]),
    ]
    if predictor:
        entries.append(entry(_T_PREDICTOR, 3, [2]))
    # layout: header(8) | strip data | offsets/counts arrays | IFD
    pos = 8
    offsets = []
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    n_strips = len(strips)
    entries.append(entry(_T_STRIP_OFFSETS, 4, offsets))
    entries.append(entry(_T_STRIP_COUNTS, 4, [len(s) for s in strips]))
    entries.sort(key=lambda e: e[0])  # IFD must be tag-sorted
    # place >4-byte tag values after the strip data
    overflow = []
    for tag, typ, count, packed, size in entries:
        if size > 4:
            overflow.append((tag, pos))
            pos += size
    ifd_off = pos
    over_pos = dict(overflow)
    body = bytearray()
    body += (b"II*\x00" if not big_endian else b"MM\x00*")
    body += struct.pack(lt + "I", ifd_off)
    for s in strips:
        body += s
    for tag, typ, count, packed, size in entries:
        if size > 4:
            body += packed
    body += struct.pack(lt + "H", len(entries))
    for tag, typ, count, packed, size in entries:
        body += struct.pack(lt + "HHI", tag, typ, count)
        if size > 4:
            body += struct.pack(lt + "I", over_pos[tag])
        else:
            body += packed + b"\x00" * (4 - size)
    body += struct.pack(lt + "I", 0)  # no next IFD
    return bytes(body)
