"""WebP lossless (VP8L) codec — pure Python + numpy, no image library.

Round 11's image-format seam: WebP-lossless is prefix coding + LZ77 +
four reversible transforms, all implementable in-container from the
public bitstream spec (RFC 9649 / the Google "WebP Lossless Bitstream
Specification"). The decoder handles the full VP8L surface:

- canonical prefix codes in both storage forms (simple two-symbol codes
  and DEFLATE-style code-length-coded codes, including the 16/17/18
  repeat codes and the optional ``max_symbol`` cap),
- meta prefix codes (a subsampled entropy image selecting one of many
  prefix-code groups per tile) on the main ARGB image,
- the color cache (the 0x1e35a7bd multiplicative hash, 1..11 bits),
- LZ77 backward references with the 120-entry two-dimensional distance
  map for close-neighborhood references,
- all four transforms, inverted in reverse stream order with running
  width bookkeeping: PREDICTOR (14 modes, edge rules per spec),
  COLOR (per-block ColorTransformElement, ``(int8(t) * int8(c)) >> 5``
  deltas, blue corrected with the already-restored red), SUBTRACT_GREEN,
  and COLOR_INDEXING (delta-coded palette + sub-byte pixel bundling for
  palettes of at most 16 colors).

The encoder exists so the decoder is round-trip-testable without an
external library (same contract as the GIF/JPEG twins): it writes real
canonical prefix codes built from per-channel histograms (depth-limited
by frequency dampening, flat-code fallback), run-length LZ77 via
distance-1 backward references (expressed through the 2D distance map,
so round-trips exercise it), and opt-in SUBTRACT_GREEN / PREDICTOR /
COLOR_INDEXING transforms. Lossless means round-trips are BIT-EXACT:
``decode_webp(encode_webp(x)) == x`` for every uint8 RGB array, and the
tests also pin the decoder against hand-assembled bitstreams written
bit-by-bit in the test file, independent of this encoder.

Container chunks other than ``VP8L`` quarantine at the documented seam:
lossy ``VP8 `` needs the full VP8 intra predictor + boolean-coder stack
and stays ``NotImplementedError`` (as MP3 and inter-frame video do in
``sources/multimodal.py``); ``VP8X``-extended files are walked so a
contained ``VP8L`` chunk still decodes.

Scale note (same as the other codecs): the per-pixel Python loop is fine
for test-table media; a 100 TB pipeline decodes in a native library at
this seam — the surrounding ``mapInPandas`` plumbing is what scales.
"""

from __future__ import annotations

import heapq
import struct

import numpy as np

# ---------------------------------------------------------------------------
# container


def is_webp(payload: bytes) -> bool:
    return (
        len(payload) > 20
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WEBP"
    )


def _find_vp8l(payload: bytes) -> bytes:
    """The VP8L chunk body, walking the RIFF chunk list (VP8X-extended
    files keep their lossless payload in a nested position; metadata
    chunks like ICCP/EXIF/XMP are skipped)."""
    end = min(len(payload), 8 + struct.unpack_from("<I", payload, 4)[0])
    pos = 12
    while pos + 8 <= end:
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"VP8L":
            return body
        if tag == b"VP8 ":
            raise NotImplementedError(
                "lossy (VP8) WebP needs a native decoder; only VP8L "
                "lossless decodes in-container"
            )
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    raise NotImplementedError("WebP container has no VP8L chunk")


# ---------------------------------------------------------------------------
# bit I/O — VP8L packs bits LSB-first within bytes; prefix codes are
# read one bit at a time, each read bit descending the code tree (so a
# code is WRITTEN from its most significant bit down)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bits(self, n: int) -> int:
        while self.n < n:
            if self.pos >= len(self.data):
                raise NotImplementedError("truncated VP8L bitstream")
            self.acc |= self.data[self.pos] << self.n
            self.pos += 1
            self.n += 8
        v = self.acc & ((1 << n) - 1)
        self.acc >>= n
        self.n -= n
        return v


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, v: int, n: int) -> None:
        self.acc |= (v & ((1 << n) - 1)) << self.n
        self.n += n
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def code(self, c: int, n: int) -> None:
        # prefix codes go MSB-of-code first (tree-descent order)
        for i in range(n - 1, -1, -1):
            self.bits((c >> i) & 1, 1)

    def finish(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = self.n = 0
        return bytes(self.out)


# ---------------------------------------------------------------------------
# canonical prefix codes


class _PrefixCode:
    """Canonical prefix decoder: symbols sorted by (length, symbol) get
    consecutive codes per length, exactly as DEFLATE assigns them. A
    single-symbol code costs zero bits (the spec's simple one-symbol
    form and degenerate normal codes both land here)."""

    def __init__(self, lengths: dict[int, int], *, ordered=None) -> None:
        if ordered is not None:
            # simple codes map bit 0 / bit 1 to symbols AS WRITTEN, not
            # canonically re-sorted
            self.single = ordered[0] if len(ordered) == 1 else None
            self.table = {
                (1, i): s for i, s in enumerate(ordered)
            } if len(ordered) > 1 else {}
            self._build_lut()
            return
        used = sorted(
            (l, s) for s, l in lengths.items() if l > 0
        )
        if not used:
            raise NotImplementedError("empty prefix code")
        if len(used) == 1:
            self.single = used[0][1]
            self.table = {}
            self._build_lut()
            return
        self.single = None
        kraft = sum(1 << (15 - l) for l, _ in used)
        if kraft != 1 << 15:
            raise NotImplementedError("invalid (non-complete) prefix code")
        self.table = {}
        code = 0
        prev_len = used[0][0]
        for l, s in used:
            code <<= l - prev_len
            prev_len = l
            self.table[(l, code)] = s
            code += 1
        self._build_lut()

    #: LUT width cap — a complete code fills exactly 2**_LUT_BITS entries
    #: (sum over codes of 2**(bits-len) telescopes to 2**bits), so build
    #: cost stays ~2k list writes per code; symbols longer than the cap
    #: (rare by construction: long code = rare symbol) take the bit-walk
    _LUT_BITS = 11

    def _build_lut(self) -> None:
        """One-level decode LUT over the next _LUT_BITS stream bits.

        The round-9/10 JPEG playbook applied to VP8L: the per-symbol
        tree-descent (≤15 dict probes + ≤15 single-bit refills) collapses
        to one accumulator mask + one list index for every code that fits
        the cap. The reader's accumulator is LSB-first while canonical
        codes descend MSB-first, so a code's LUT slots are all indices
        whose LOW len bits equal the bit-reversed code. Entries pack
        (symbol << 4) | len; len 0 marks over-cap codes (slow path)."""
        if self.single is not None or not self.table:
            self.lut = None
            self.lut_bits = 0
            self.lut_mask = 0
            return
        bits = min(max(l for l, _ in self.table), self._LUT_BITS)
        size = 1 << bits
        lut = [0] * size
        for (l, code), s in self.table.items():
            if l > bits:
                continue
            rev = 0
            c = code
            for _ in range(l):
                rev = (rev << 1) | (c & 1)
                c >>= 1
            packed = (s << 4) | l
            for idx in range(rev, size, 1 << l):
                lut[idx] = packed
        self.lut = lut
        self.lut_bits = bits
        self.lut_mask = size - 1

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        # fast path: refill once, one masked LUT probe
        while br.n < self.lut_bits and br.pos < len(br.data):
            br.acc |= br.data[br.pos] << br.n
            br.pos += 1
            br.n += 8
        entry = self.lut[br.acc & self.lut_mask]
        l = entry & 15
        if l and l <= br.n:
            br.acc >>= l
            br.n -= l
            return entry >> 4
        # slow path: over-cap code, or a truncated tail (br.bits raises)
        code = 0
        length = 0
        while True:
            code = (code << 1) | br.bits(1)
            length += 1
            if (length, code) in self.table:
                return self.table[(length, code)]
            if length > 15:
                raise NotImplementedError("corrupt prefix code stream")


#: order in which the 19 code-length-code lengths are stored
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.bits(1):  # simple code: one or two symbols, stored literally
        n_sym = br.bits(1) + 1
        first = br.bits(8) if br.bits(1) else br.bits(1)
        syms = [first]
        if n_sym == 2:
            syms.append(br.bits(8))
        return _PrefixCode({}, ordered=syms)
    n_cl = 4 + br.bits(4)
    cl_lengths = {}
    for i in range(n_cl):
        cl_lengths[_CL_ORDER[i]] = br.bits(3)
    cl_code = _PrefixCode(cl_lengths)
    if br.bits(1):  # optional cap on the number of length codes read
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths: dict[int, int] = {}
    symbol = 0
    prev_len = 8
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = cl_code.read(br)
        if cl < 16:
            if cl:
                lengths[symbol] = cl
                prev_len = cl
            symbol += 1
        elif cl == 16:
            for _ in range(3 + br.bits(2)):
                lengths[symbol] = prev_len
                symbol += 1
        elif cl == 17:
            symbol += 3 + br.bits(3)
        else:  # 18
            symbol += 11 + br.bits(7)
    if symbol > alphabet_size:
        raise NotImplementedError("prefix code lengths overrun alphabet")
    return _PrefixCode(lengths)


def _huffman_lengths(freqs: dict[int, int], max_len: int) -> dict[int, int]:
    """Code lengths for a complete canonical code over ``freqs``,
    depth-limited by the classic frequency-dampening retry; flat-ish
    k-split fallback if dampening ever fails to converge."""
    syms = sorted(freqs)
    if len(syms) == 1:
        return {syms[0]: 0}
    f = {s: freqs[s] for s in syms}
    for _ in range(32):
        nodes = [(f[s], i, [s]) for i, s in enumerate(syms)]
        heapq.heapify(nodes)
        depths = {s: 0 for s in syms}
        tick = len(syms)
        while len(nodes) > 1:
            fa, _, a = heapq.heappop(nodes)
            fb, _, b = heapq.heappop(nodes)
            for s in a + b:
                depths[s] += 1
            heapq.heappush(nodes, (fa + fb, tick, a + b))
            tick += 1
        if max(depths.values()) <= max_len:
            return depths
        f = {s: (v + 1) // 2 or 1 for s, v in f.items()}
    # flat-ish complete code: k symbols at max-1 bits, rest at ``bits``
    bits = max(1, (len(syms) - 1).bit_length())
    k = (1 << bits) - len(syms)
    return {
        s: (bits - 1 if i < k else bits) for i, s in enumerate(syms)
    }


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    prev = None
    for l, s in sorted((l, s) for s, l in lengths.items() if l > 0):
        code = code << (l - prev) if prev is not None else 0
        prev = l
        codes[s] = (code, l)
        code += 1
    return codes


def _write_prefix_code(
    bw: _BitWriter, lengths: dict[int, int], alphabet_size: int
) -> None:
    """Emit a prefix code in the storage the decoder above reads: simple
    form when possible, else the code-length-coded normal form covering
    the whole alphabet (17/18 repeats over zero runs)."""
    used = sorted(s for s, l in lengths.items() if l >= 0)
    nonzero = [s for s in used if lengths[s] > 0 or len(used) == 1]
    if 1 <= len(nonzero) <= 2 and all(s < 256 for s in nonzero):
        bw.bits(1, 1)  # simple
        bw.bits(len(nonzero) - 1, 1)
        first = nonzero[0]
        if first > 1:
            bw.bits(1, 1)
            bw.bits(first, 8)
        else:
            bw.bits(0, 1)
            bw.bits(first, 1)
        if len(nonzero) == 2:
            bw.bits(nonzero[1], 8)
        return
    bw.bits(0, 1)  # normal form
    if len(nonzero) == 1:
        # a lone symbol >= 256 (length/cache codes) can't ride the
        # simple form; store it as the one nonzero length — canonical
        # single-symbol codes read with zero bits on both sides
        lengths = {nonzero[0]: 1}
    # token stream over the full alphabet: zero runs via 17/18
    tokens: list[tuple[int, int, int]] = []  # (cl_symbol, extra, extra_n)
    sym = 0
    while sym < alphabet_size:
        l = lengths.get(sym, 0)
        if l == 0:
            run = 0
            while sym + run < alphabet_size and lengths.get(sym + run, 0) == 0:
                run += 1
            left = run
            while left >= 11:
                take = min(left, 138)
                tokens.append((18, take - 11, 7))
                left -= take
            while left >= 3:
                take = min(left, 10)
                tokens.append((17, take - 3, 3))
                left -= take
            tokens.extend((0, 0, 0) for _ in range(left))
            sym += run
        else:
            tokens.append((l, 0, 0))
            sym += 1
    cl_freq: dict[int, int] = {}
    for t, _, _ in tokens:
        cl_freq[t] = cl_freq.get(t, 0) + 1
    cl_lengths = _huffman_lengths(cl_freq, 7)
    if len(cl_lengths) == 1:
        # a one-symbol code-length code would be zero-bit; keep the
        # stored code complete by pairing it with a dummy symbol
        only = next(iter(cl_lengths))
        cl_lengths = {only: 1, (0 if only else 1): 1}
    bw.bits(15, 4)  # num_code_lengths = 4 + 15 = 19: emit every slot
    for s in _CL_ORDER:
        bw.bits(cl_lengths.get(s, 0), 3)
    bw.bits(0, 1)  # no max_symbol cap: tokens cover the whole alphabet
    cl_codes = _canonical_codes(cl_lengths)
    for t, extra, extra_n in tokens:
        c, n = cl_codes[t]
        bw.code(c, n)
        if extra_n:
            bw.bits(extra, extra_n)


# ---------------------------------------------------------------------------
# LZ77 prefix values and the 2D distance map


def _prefix_decode(sym: int, br: _BitReader) -> int:
    """LZ77 length/distance prefix value: symbols 0..3 are the values
    1..4, larger symbols carry (sym-2)>>1 extra bits."""
    if sym < 4:
        return sym + 1
    extra = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra
    return offset + br.bits(extra) + 1


def _prefix_encode(value: int) -> tuple[int, int, int]:
    """(symbol, extra_value, extra_bits) such that _prefix_decode
    inverts it."""
    if value <= 4:
        return value - 1, 0, 0
    x = value - 1
    extra = x.bit_length() - 2
    offset = (2 + ((x >> extra) & 1)) << extra
    return 2 * extra + 2 + ((x >> extra) & 1), value - offset - 1, extra


def _gen_distance_map() -> list[tuple[int, int]]:
    """The spec's 120-entry close-neighborhood map for distance codes
    1..120: every (dx, dy) with dy in 0..7 and dx in -7..8 (dx > 0 on
    the dy = 0 row), ordered by squared euclidean distance, nearer rows
    (larger dy) first within a tie, positive dx before negative. The
    first 40 generated entries are pinned against the spec's literal
    table in tests/test_webp_codec.py."""
    cand = [
        (dx, dy)
        for dy in range(8)
        for dx in range(-7, 9)
        if dy > 0 or dx > 0
    ]
    cand.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], p[0] < 0))
    return cand


_DISTANCE_MAP = _gen_distance_map()


def _plane_to_distance(code: int, width: int) -> int:
    """Distance-code value -> scan-order pixel distance."""
    if code > 120:
        return code - 120
    dx, dy = _DISTANCE_MAP[code - 1]
    return max(1, dy * width + dx)


# ---------------------------------------------------------------------------
# entropy-coded image decode

_HASH_MUL = 0x1E35A7BD


def _sub_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _read_entropy_coded(
    br: _BitReader, w: int, h: int, is_main: bool
) -> list[int]:
    """One entropy-coded ARGB image as a row-major list of uint32."""
    cache_bits = br.bits(4) if br.bits(1) else 0
    if cache_bits > 11:
        raise NotImplementedError("color cache over 11 bits")
    cache_size = (1 << cache_bits) if cache_bits else 0
    meta = None
    meta_bits = meta_w = 0
    n_groups = 1
    if is_main and br.bits(1):  # meta prefix codes
        meta_bits = br.bits(3) + 2
        meta_w, mh = _sub_size(w, meta_bits), _sub_size(h, meta_bits)
        meta_img = _read_entropy_coded(br, meta_w, mh, False)
        meta = [((p >> 8) & 0xFFFF) for p in meta_img]  # (red<<8)|green
        n_groups = max(meta) + 1
    groups = []
    green_alpha = 256 + 24 + cache_size
    for _ in range(n_groups):
        groups.append(
            (
                _read_prefix_code(br, green_alpha),
                _read_prefix_code(br, 256),  # red
                _read_prefix_code(br, 256),  # blue
                _read_prefix_code(br, 256),  # alpha
                _read_prefix_code(br, 40),  # distance
            )
        )
    cache = [0] * cache_size
    shift = 32 - cache_bits if cache_bits else 0
    out: list[int] = []
    n = w * h
    x = 0
    # Hot loop (the jpeg.py round-9/10 playbook): the reader's accumulator
    # state lives in LOCAL ints and every prefix read is an inline LUT
    # probe — one refill check, one mask, one list index. Slow paths
    # (single-symbol codes, codes longer than the LUT cap, truncated
    # tails) sync the locals back into the _BitReader and take the
    # object-level read()/bits(), which raises the same quarantine errors
    # as before. Each group is pre-flattened to its five codes'
    # (single, lut, lut_bits, lut_mask, code_obj) tuples.
    fast = [
        tuple((c.single, c.lut, c.lut_bits, c.lut_mask, c) for c in g)
        for g in groups
    ]
    data, end = br.data, len(br.data)
    acc, nbits, pos = br.acc, br.n, br.pos

    def _slow(code_obj):
        # over-cap / simple / truncated: run the object path, resync
        nonlocal acc, nbits, pos
        br.acc, br.n, br.pos = acc, nbits, pos
        s = code_obj.read(br)
        acc, nbits, pos = br.acc, br.n, br.pos
        return s

    def _take(k):
        # inline br.bits(k) against the local state
        nonlocal acc, nbits, pos
        while nbits < k:
            if pos >= end:
                raise NotImplementedError("truncated VP8L bitstream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        v = acc & ((1 << k) - 1)
        acc >>= k
        nbits -= k
        return v

    g = fast[0]
    out_len = 0
    while out_len < n:
        if meta is not None:
            # a backward reference can land mid-tile, so the group is
            # looked up per position, not only at tile boundaries
            y = out_len // w
            g = fast[meta[(y >> meta_bits) * meta_w + (x >> meta_bits)]]
        single, lut, lbits, mask, obj = g[0]
        if single is not None:
            s = single
        else:
            while nbits < lbits and pos < end:
                acc |= data[pos] << nbits
                pos += 1
                nbits += 8
            e = lut[acc & mask]
            l = e & 15
            if l and l <= nbits:
                acc >>= l
                nbits -= l
                s = e >> 4
            else:
                s = _slow(obj)
        if s < 256:  # literal: green came first, then red, blue, alpha
            px = s << 8
            for ch_shift, ch in ((16, g[1]), (0, g[2]), (24, g[3])):
                single, lut, lbits, mask, obj = ch
                if single is not None:
                    px |= single << ch_shift
                    continue
                while nbits < lbits and pos < end:
                    acc |= data[pos] << nbits
                    pos += 1
                    nbits += 8
                e = lut[acc & mask]
                l = e & 15
                if l and l <= nbits:
                    acc >>= l
                    nbits -= l
                    px |= (e >> 4) << ch_shift
                else:
                    px |= _slow(obj) << ch_shift
            out.append(px)
            out_len += 1
            if cache_bits:
                cache[(_HASH_MUL * px & 0xFFFFFFFF) >> shift] = px
            x = x + 1 if x + 1 < w else 0
        elif s < 280:  # backward reference
            s -= 256
            if s < 4:
                length = s + 1
            else:
                extra = (s - 2) >> 1
                length = ((2 + (s & 1)) << extra) + _take(extra) + 1
            single, lut, lbits, mask, obj = g[4]
            if single is not None:
                d = single
            else:
                while nbits < lbits and pos < end:
                    acc |= data[pos] << nbits
                    pos += 1
                    nbits += 8
                e = lut[acc & mask]
                l = e & 15
                if l and l <= nbits:
                    acc >>= l
                    nbits -= l
                    d = e >> 4
                else:
                    d = _slow(obj)
            if d < 4:
                d += 1
            else:
                extra = (d - 2) >> 1
                d = ((2 + (d & 1)) << extra) + _take(extra) + 1
            dist = _plane_to_distance(d, w)
            if dist > out_len:
                raise NotImplementedError("backward reference before start")
            if out_len + length > n:
                raise NotImplementedError("backward reference overruns image")
            if cache_bits:
                for _ in range(length):
                    px = out[-dist]
                    out.append(px)
                    cache[(_HASH_MUL * px & 0xFFFFFFFF) >> shift] = px
            else:
                # chunked self-copy: correct for overlapping references
                # (dist < length repeats the window, chunk ≤ dist)
                remaining = length
                while remaining:
                    chunk = dist if dist < remaining else remaining
                    out.extend(out[-dist : len(out) - dist + chunk])
                    remaining -= chunk
            out_len += length
            x = out_len % w
        else:  # color cache hit
            if s - 280 >= cache_size:
                raise NotImplementedError("color cache index out of range")
            px = cache[s - 280]
            out.append(px)
            out_len += 1
            x = x + 1 if x + 1 < w else 0
    br.acc, br.n, br.pos = acc, nbits, pos
    return out


# ---------------------------------------------------------------------------
# transforms (inverse = decode side)


def _avg2(a: tuple, b: tuple) -> tuple:
    return tuple((x + y) >> 1 for x, y in zip(a, b))


def _clamp_add_sub_full(a: tuple, b: tuple, c: tuple) -> tuple:
    return tuple(
        min(255, max(0, x + y - z)) for x, y, z in zip(a, b, c)
    )


def _clamp_add_sub_half(ave: tuple, c: tuple) -> tuple:
    out = []
    for a, b in zip(ave, c):
        d = a - b
        # C integer division truncates toward zero
        half = d // 2 if d >= 0 else -((-d) // 2)
        out.append(min(255, max(0, a + half)))
    return tuple(out)


def _select(l: tuple, t: tuple, tl: tuple) -> tuple:
    p = [a + b - c for a, b, c in zip(l, t, tl)]
    p_l = sum(abs(x - y) for x, y in zip(p, l))
    p_t = sum(abs(x - y) for x, y in zip(p, t))
    return l if p_l < p_t else t


def _predict(mode: int, l: tuple, t: tuple, tl: tuple, tr: tuple) -> tuple:
    if mode == 0:
        return (255, 0, 0, 0)  # opaque black (ARGB)
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l, tr), t)
    if mode == 6:
        return _avg2(l, tl)
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l, tl), _avg2(t, tr))
    if mode == 11:
        return _select(l, t, tl)
    if mode == 12:
        return _clamp_add_sub_full(l, t, tl)
    if mode == 13:
        return _clamp_add_sub_half(_avg2(l, t), tl)
    raise NotImplementedError(f"predictor mode {mode} out of range")


def _unpack(px: int) -> tuple:
    return (px >> 24) & 0xFF, (px >> 16) & 0xFF, (px >> 8) & 0xFF, px & 0xFF


def _pack(t: tuple) -> int:
    return (t[0] << 24) | (t[1] << 16) | (t[2] << 8) | t[3]


def _inv_predictor(
    pixels: list[int], w: int, h: int, bits: int, modes: list[int]
) -> list[int]:
    bw = _sub_size(w, bits)
    out: list[tuple] = []
    for i, px in enumerate(pixels):
        x, y = i % w, i // w
        res = _unpack(px)
        if x == 0 and y == 0:
            pred = (255, 0, 0, 0)
        elif y == 0:
            pred = out[i - 1]  # top row: L regardless of block mode
        elif x == 0:
            pred = out[i - w]  # left column: T regardless of block mode
        else:
            mode = (modes[(y >> bits) * bw + (x >> bits)] >> 8) & 0xFF
            l, t, tl = out[i - 1], out[i - w], out[i - w - 1]
            # the linear-array quirk the spec pins: the top-right of a
            # rightmost-column pixel is the CURRENT row's first pixel
            tr = out[i - w + 1]
            pred = _predict(mode, l, t, tl, tr)
        out.append(tuple((r + p) & 0xFF for r, p in zip(res, pred)))
    return [_pack(t) for t in out]


def _ct_delta(t: np.ndarray, c: np.ndarray) -> np.ndarray:
    # (int8(t) * int8(c)) >> 5 with arithmetic shift
    return (t.astype(np.int8).astype(np.int32)
            * c.astype(np.int8).astype(np.int32)) >> 5


def _inv_color_transform(
    pixels: list[int], w: int, h: int, bits: int, elements: list[int]
) -> list[int]:
    arr = np.asarray(pixels, dtype=np.uint32)
    bw = _sub_size(w, bits)
    xs = np.arange(w * h) % w
    ys = np.arange(w * h) // w
    cte = np.asarray(elements, dtype=np.uint32)[
        (ys >> bits) * bw + (xs >> bits)
    ]
    g2r = cte & 0xFF  # stored in the blue channel
    g2b = (cte >> 8) & 0xFF  # green channel
    r2b = (cte >> 16) & 0xFF  # red channel
    green = (arr >> 8) & 0xFF
    red = ((arr >> 16) & 0xFF).astype(np.int32)
    blue = (arr & 0xFF).astype(np.int32)
    red = (red + _ct_delta(g2r, green)) & 0xFF
    blue = (blue + _ct_delta(g2b, green) + _ct_delta(r2b, red)) & 0xFF
    return list(
        (arr & 0xFF00FF00)
        | (red.astype(np.uint32) << 16)
        | blue.astype(np.uint32)
    )


def _inv_subtract_green(pixels: list[int]) -> list[int]:
    arr = np.asarray(pixels, dtype=np.uint32)
    g = (arr >> 8) & 0xFF
    r = (((arr >> 16) & 0xFF) + g) & 0xFF
    b = ((arr & 0xFF) + g) & 0xFF
    return list((arr & 0xFF00FF00) | (r << 16) | b)


def _palette_width_bits(n_colors: int) -> int:
    if n_colors <= 2:
        return 3
    if n_colors <= 4:
        return 2
    if n_colors <= 16:
        return 1
    return 0


def _inv_color_indexing(
    pixels: list[int], packed_w: int, w: int, h: int, palette: list[int]
) -> list[int]:
    wbits = _palette_width_bits(len(palette))
    per = 1 << wbits
    bpp = 8 >> wbits
    mask = (1 << bpp) - 1
    out = []
    for y in range(h):
        row = pixels[y * packed_w : (y + 1) * packed_w]
        cols = 0
        for px in row:
            green = (px >> 8) & 0xFF
            for k in range(per):
                if cols >= w:
                    break
                idx = (green >> (k * bpp)) & mask
                # out-of-range palette indices decode to 0x00000000
                out.append(palette[idx] if idx < len(palette) else 0)
                cols += 1
    return out


# ---------------------------------------------------------------------------
# VP8L decode


def decode_vp8l(data: bytes) -> "np.ndarray":
    """uint8 (h, w, 4) ARGB-order-decoded RGBA from a VP8L payload."""
    if not data or data[0] != 0x2F:
        raise NotImplementedError("bad VP8L signature byte")
    br = _BitReader(data[1:])
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bits(1)  # alpha-is-used hint
    if br.bits(3) != 0:
        raise NotImplementedError("unknown VP8L version")
    if w * h > 1 << 26:
        raise NotImplementedError(f"VP8L geometry {w}x{h} out of range")
    transforms: list[tuple] = []
    seen: set[int] = set()
    cur_w = w
    while br.bits(1):
        ttype = br.bits(2)
        if ttype in seen or len(transforms) == 4:
            raise NotImplementedError("repeated VP8L transform")
        seen.add(ttype)
        if ttype == 2:  # SUBTRACT_GREEN
            transforms.append((2, cur_w, None))
        elif ttype in (0, 1):  # PREDICTOR / COLOR
            bits = br.bits(3) + 2
            sub = _read_entropy_coded(
                br, _sub_size(cur_w, bits), _sub_size(h, bits), False
            )
            transforms.append((ttype, cur_w, (bits, sub)))
        else:  # 3: COLOR_INDEXING
            n_colors = br.bits(8) + 1
            deltas = _read_entropy_coded(br, n_colors, 1, False)
            palette = []
            prev = 0
            for d in deltas:  # entries are per-channel deltas
                prev = (
                    ((prev & 0xFF000000) + (d & 0xFF000000)) & 0xFF000000
                ) | (
                    ((prev & 0x00FF0000) + (d & 0x00FF0000)) & 0x00FF0000
                ) | (
                    ((prev & 0x0000FF00) + (d & 0x0000FF00)) & 0x0000FF00
                ) | (
                    ((prev & 0x000000FF) + (d & 0x000000FF)) & 0x000000FF
                )
                palette.append(prev)
            packed = _sub_size(cur_w, _palette_width_bits(n_colors))
            transforms.append((3, cur_w, palette))
            cur_w = packed
    pixels = _read_entropy_coded(br, cur_w, h, True)
    for ttype, t_w, params in reversed(transforms):
        if ttype == 3:
            pixels = _inv_color_indexing(pixels, cur_w, t_w, h, params)
        elif ttype == 2:
            pixels = _inv_subtract_green(pixels)
        elif ttype == 1:
            pixels = _inv_color_transform(pixels, t_w, h, *params)
        else:
            pixels = _inv_predictor(pixels, t_w, h, *params)
        cur_w = t_w
    arr = np.asarray(pixels, dtype=np.uint32).reshape(h, w)
    rgba = np.empty((h, w, 4), dtype=np.uint8)
    rgba[..., 0] = (arr >> 16) & 0xFF
    rgba[..., 1] = (arr >> 8) & 0xFF
    rgba[..., 2] = arr & 0xFF
    rgba[..., 3] = (arr >> 24) & 0xFF
    return rgba


def decode_webp(payload: bytes) -> "np.ndarray":
    """uint8 (h, w, 3) RGB from a lossless WebP (alpha dropped, same
    return contract as decode_bmp/decode_png/decode_jpeg)."""
    if not is_webp(payload):
        raise NotImplementedError("not a WebP payload")
    return decode_vp8l(_find_vp8l(payload))[..., :3]


# ---------------------------------------------------------------------------
# encoder


def _fwd_subtract_green(arr: "np.ndarray") -> "np.ndarray":
    out = arr.astype(np.int16)
    out[..., 0] = (out[..., 0] - out[..., 1]) % 256  # red -= green
    out[..., 2] = (out[..., 2] - out[..., 1]) % 256  # blue -= green
    return out.astype(np.uint8)


def _fwd_predictor_left(arr: "np.ndarray") -> "np.ndarray":
    """Residuals for a uniform mode-1 (L) predictor image, honoring the
    spec's fixed edge rules (pixel 0 from opaque black, top row from L,
    left column from T — mode 1 leaves rows otherwise unchanged)."""
    a = arr.astype(np.int16)
    res = a.copy()
    res[:, 1:] = a[:, 1:] - a[:, :-1]  # L for every non-first column
    res[1:, 0] = a[1:, 0] - a[:-1, 0]  # left column: T
    res[0, 0] = a[0, 0] - np.asarray([0, 0, 0, 255], np.int16)  # black
    return (res % 256).astype(np.uint8)


def _tokenize(argb: list[int], w: int) -> list[tuple]:
    """Literal / run tokens: ('lit', px) and ('ref', length, dist)."""
    tokens: list[tuple] = []
    n = len(argb)
    i = 0
    while i < n:
        px = argb[i]
        run = 1
        while i + run < n and argb[i + run] == px and run < 4097:
            run += 1
        if i > 0 and argb[i - 1] == px:
            # extend as a distance-1 reference without a fresh literal
            length = min(run, 4096)
            tokens.append(("ref", length, 1))
            i += length
        elif run >= 4:
            tokens.append(("lit", px))
            length = min(run - 1, 4096)
            tokens.append(("ref", length, 1))
            i += 1 + length
        else:
            tokens.append(("lit", px))
            i += 1
    return tokens


def _encode_entropy_coded(
    bw: _BitWriter, argb: list[int], w: int, is_main: bool
) -> None:
    """One entropy-coded image: no color cache, no meta codes, canonical
    per-channel prefix codes over the token histogram."""
    bw.bits(0, 1)  # no color cache
    if is_main:
        bw.bits(0, 1)  # no meta prefix codes
    tokens = _tokenize(argb, w)
    freq: list[dict[int, int]] = [{} for _ in range(5)]

    def bump(i, s):
        freq[i][s] = freq[i].get(s, 0) + 1

    for tok in tokens:
        if tok[0] == "lit":
            a, r, g, b = _unpack(tok[1])
            bump(0, g)
            bump(1, r)
            bump(2, b)
            bump(3, a)
        else:
            lsym, _, _ = _prefix_encode(tok[1])
            bump(0, 256 + lsym)
            # distance 1 rides the 2D map: plane value 2 == (1, 0)
            dval = 2 if tok[2] == 1 else tok[2] + 120
            dsym, _, _ = _prefix_encode(dval)
            bump(4, dsym)
    codebooks: list[dict[int, tuple[int, int]]] = []
    for i, alphabet in enumerate((256 + 24, 256, 256, 256, 40)):
        if not freq[i]:
            freq[i] = {0: 1}  # unused channel: cheapest valid code
        lengths = _huffman_lengths(freq[i], 15)
        _write_prefix_code(bw, lengths, alphabet)
        codes = _canonical_codes(lengths)
        if not codes:  # single zero-length symbol costs zero bits
            codes = {next(iter(lengths)): (0, 0)}
        codebooks.append(codes)
    g_c, r_c, b_c, a_c, d_c = codebooks
    for tok in tokens:
        if tok[0] == "lit":
            a, r, g, b = _unpack(tok[1])
            bw.code(*g_c[g])
            bw.code(*r_c[r])
            bw.code(*b_c[b])
            bw.code(*a_c[a])
        else:
            lsym, lextra, lbits = _prefix_encode(tok[1])
            bw.code(*g_c[256 + lsym])
            if lbits:
                bw.bits(lextra, lbits)
            dval = 2 if tok[2] == 1 else tok[2] + 120
            dsym, dextra, dbits = _prefix_encode(dval)
            bw.code(*d_c[dsym])
            if dbits:
                bw.bits(dextra, dbits)


def _rgba_to_argb_list(arr: "np.ndarray") -> list[int]:
    a = arr.astype(np.uint32)
    packed = (
        (a[..., 3] << 24) | (a[..., 0] << 16) | (a[..., 1] << 8) | a[..., 2]
    )
    return [int(v) for v in packed.ravel()]


def encode_webp(
    arr: "np.ndarray",
    *,
    subtract_green: bool = True,
    predictor: bool = False,
    palette: bool = False,
) -> bytes:
    """Lossless WebP bytes for a uint8 (h, w, 3) RGB (or (h, w, 4) RGBA)
    array. Transforms are opt-in and exact, so every combination
    round-trips bit-identically; ``palette`` requires <= 256 distinct
    colors (mirrors encode_gif_rgb's refusal — quantization is never
    silent) and is exclusive with the pixel transforms."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] not in (3, 4):
        raise NotImplementedError("encode_webp wants (h, w, 3|4) uint8")
    h, w = arr.shape[:2]
    if not (0 < w <= 1 << 14 and 0 < h <= 1 << 14):
        raise NotImplementedError("WebP dimensions exceed 14 bits")
    if arr.shape[2] == 3:
        rgba = np.concatenate(
            [arr, np.full((h, w, 1), 255, np.uint8)], axis=2
        )
    else:
        rgba = arr
    bw = _BitWriter()
    bw.bits(w - 1, 14)
    bw.bits(h - 1, 14)
    bw.bits(1 if arr.shape[2] == 4 else 0, 1)
    bw.bits(0, 3)  # version
    if palette:
        if subtract_green or predictor:
            raise NotImplementedError(
                "palette is exclusive with pixel transforms"
            )
        argb = _rgba_to_argb_list(rgba)
        colors = sorted(set(argb))
        if len(colors) > 256:
            raise NotImplementedError(
                f"{len(colors)} distinct colors exceed the palette; "
                "encode without palette=True"
            )
        index = {c: i for i, c in enumerate(colors)}
        bw.bits(1, 1)
        bw.bits(3, 2)  # COLOR_INDEXING
        bw.bits(len(colors) - 1, 8)
        deltas = []
        prev = 0
        for c in colors:  # stored as per-channel deltas
            d = 0
            for sh in (24, 16, 8, 0):
                d |= (((c >> sh) - (prev >> sh)) & 0xFF) << sh
            deltas.append(d)
            prev = c
        _encode_entropy_coded(bw, deltas, len(colors), False)
        wbits = _palette_width_bits(len(colors))
        per = 1 << wbits
        bpp = 8 >> wbits
        packed_w = _sub_size(w, wbits)
        packed: list[int] = []
        idx = np.asarray([index[p] for p in argb], dtype=np.uint32).reshape(
            h, w
        )
        for y in range(h):
            for bx in range(packed_w):
                green = 0
                for k in range(per):
                    x = bx * per + k
                    if x < w:
                        green |= int(idx[y, x]) << (k * bpp)
                packed.append((0xFF << 24) | (green << 8))
        bw.bits(0, 1)  # end of transforms
        _encode_entropy_coded(bw, packed, packed_w, True)
    else:
        work = rgba
        if subtract_green:
            bw.bits(1, 1)
            bw.bits(2, 2)  # SUBTRACT_GREEN
            work = np.concatenate(
                [_fwd_subtract_green(work[..., :3]), work[..., 3:]], axis=2
            )
        if predictor:
            # uniform mode-1 (L) predictor: one block covering the image
            bits = 9  # 512-pixel blocks; block image is all mode 1
            bw.bits(1, 1)
            bw.bits(0, 2)  # PREDICTOR
            bw.bits(bits - 2, 3)
            bw_img = [
                (0xFF << 24) | (1 << 8)
            ] * (_sub_size(w, bits) * _sub_size(h, bits))
            _encode_entropy_coded(bw, bw_img, _sub_size(w, bits), False)
            work = _fwd_predictor_left(work)
        bw.bits(0, 1)  # end of transforms
        _encode_entropy_coded(bw, _rgba_to_argb_list(work), w, True)
    vp8l = b"\x2f" + bw.finish()
    chunk = b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    if len(vp8l) % 2:
        chunk += b"\x00"
    body = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(body)) + body
