"""WebP lossless (VP8L) codec tests.

Two independent pinning strategies, same as the JPEG/GIF suites:

1. encoder round-trips — lossless means ``decode(encode(x)) == x``
   BIT-EXACTLY for every transform combination, so any drift in either
   direction fails loudly;
2. hand-assembled bitstreams — a minimal LSB-first writer lives in THIS
   file and builds tiny VP8L payloads bit by bit from the spec text, so
   the decoder is checked against the public spec independently of the
   encoder under test.
"""

import struct

import numpy as np
import pytest

from mapreduce_machine_learning_spark.sources.webp import (
    _DISTANCE_MAP,
    _prefix_decode,
    _prefix_encode,
    _BitReader,
    decode_vp8l,
    decode_webp,
    encode_webp,
    is_webp,
)


def _rng_rgb(h, w, seed=0, colors=None):
    rng = np.random.RandomState(seed)
    if colors is None:
        return rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    palette = rng.randint(0, 256, (colors, 3)).astype(np.uint8)
    return palette[rng.randint(0, colors, (h, w))]


# ---------------------------------------------------------------------------
# round trips


@pytest.mark.parametrize("h,w", [(1, 1), (3, 7), (16, 16), (17, 33)])
def test_roundtrip_default_bit_exact(h, w):
    arr = _rng_rgb(h, w, seed=h * 100 + w)
    back = decode_webp(encode_webp(arr))
    assert back.dtype == np.uint8 and back.shape == (h, w, 3)
    assert np.array_equal(back, arr)


def test_roundtrip_every_transform_combination():
    arr = _rng_rgb(9, 13, seed=42, colors=150)
    for kw in (
        dict(subtract_green=False),
        dict(subtract_green=True),
        dict(subtract_green=False, predictor=True),
        dict(subtract_green=True, predictor=True),
        dict(subtract_green=False, palette=True),
    ):
        assert np.array_equal(decode_webp(encode_webp(arr, **kw)), arr), kw


def test_roundtrip_flat_and_gradient_images():
    flat = np.full((8, 8, 3), 77, np.uint8)  # pure distance-1 run
    grad = np.tile(
        np.arange(64, dtype=np.uint8)[None, :, None] * 3, (4, 1, 3)
    )
    for arr in (flat, grad):
        assert np.array_equal(decode_webp(encode_webp(arr)), arr)


@pytest.mark.parametrize("n_colors", [2, 3, 4, 9, 16, 17, 200])
def test_roundtrip_palette_all_bundling_widths(n_colors):
    # <=2 colors bundle 8 pixels/byte, <=4 four, <=16 two, else none —
    # odd widths force partial final bundles in every regime
    arr = _rng_rgb(5, 11, seed=n_colors, colors=n_colors)
    p = encode_webp(arr, subtract_green=False, palette=True)
    assert np.array_equal(decode_webp(p), arr)


def test_roundtrip_rgba_alpha_channel():
    rng = np.random.RandomState(7)
    arr = rng.randint(0, 256, (6, 5, 4)).astype(np.uint8)
    p = encode_webp(arr)
    body = p[12:]
    (size,) = struct.unpack_from("<I", body, 4)
    rgba = decode_vp8l(body[8 : 8 + size])
    assert np.array_equal(rgba, arr)


def test_palette_refuses_wide_images_like_gif():
    arr = _rng_rgb(20, 20, seed=1)  # ~400 distinct colors
    with pytest.raises(NotImplementedError):
        encode_webp(arr, subtract_green=False, palette=True)


# ---------------------------------------------------------------------------
# the 120-entry 2D distance map (generated; pinned against the spec's
# literal table)

_SPEC_MAP_PREFIX = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
]


def test_distance_map_matches_spec_table():
    assert len(_DISTANCE_MAP) == 120
    assert _DISTANCE_MAP[:40] == _SPEC_MAP_PREFIX
    # spot values deeper in and the extremes of the table
    assert _DISTANCE_MAP[48] == (4, 4)
    assert _DISTANCE_MAP[54] == (0, 6)
    assert _DISTANCE_MAP[72] == (0, 7)
    assert _DISTANCE_MAP[-1] == (8, 7)
    assert len(set(_DISTANCE_MAP)) == 120  # no duplicates


def test_prefix_value_coding_is_inverse():
    class _OneShot:
        def __init__(self, v, n):
            self.v, self.n = v, n

        def bits(self, n):
            assert n == self.n
            return self.v

    for v in list(range(1, 70)) + [511, 512, 513, 4095, 4096]:
        sym, extra, nbits = _prefix_encode(v)
        assert sym < 40 or v > 786432
        br = _OneShot(extra, nbits)
        got = (
            sym + 1 if sym < 4 else _prefix_decode(sym, br)
        )
        assert got == v, v


# ---------------------------------------------------------------------------
# hand-assembled bitstreams (decoder pinned against the spec, not the
# encoder)


class _W:
    """LSB-first bit writer, written from the spec text for this test
    file only — intentionally NOT imported from the module under test."""

    def __init__(self):
        self.bits_list = []

    def b(self, v, n):
        for i in range(n):
            self.bits_list.append((v >> i) & 1)
        return self

    def code(self, c, n):  # prefix codes descend from the code's MSB
        for i in range(n - 1, -1, -1):
            self.bits_list.append((c >> i) & 1)
        return self

    def payload(self):
        out = bytearray()
        for i in range(0, len(self.bits_list), 8):
            byte = 0
            for j, bit in enumerate(self.bits_list[i : i + 8]):
                byte |= bit << j
            out.append(byte)
        return b"\x2f" + bytes(out)


def _simple_single(w, sym):
    """Simple prefix code holding exactly one symbol (zero-bit reads)."""
    w.b(1, 1).b(0, 1)  # simple, one symbol
    if sym > 1:
        w.b(1, 1).b(sym, 8)
    else:
        w.b(0, 1).b(sym, 1)


def _header(w, width, height):
    w.b(width - 1, 14).b(height - 1, 14).b(0, 1).b(0, 3)


def test_hand_assembled_1x1_red_pixel():
    w = _W()
    _header(w, 1, 1)
    w.b(0, 1)  # no transforms
    w.b(0, 1)  # no color cache
    w.b(0, 1)  # no meta prefix codes
    _simple_single(w, 0)  # green = 0
    _simple_single(w, 255)  # red = 255
    _simple_single(w, 0)  # blue = 0
    _simple_single(w, 255)  # alpha = 255
    _simple_single(w, 0)  # distance (unused)
    # the pixel itself costs zero bits: every code is single-symbol
    rgba = decode_vp8l(w.payload())
    assert rgba.shape == (1, 1, 4)
    assert tuple(rgba[0, 0]) == (255, 0, 0, 255)


def test_hand_assembled_two_symbol_simple_code_orders_as_written():
    # 2x1 image, green alternates 7 then 9: a two-symbol simple code
    # maps bit 0 to the FIRST-written symbol, bit 1 to the second
    w = _W()
    _header(w, 2, 1)
    w.b(0, 1).b(0, 1).b(0, 1)
    w.b(1, 1).b(1, 1)  # simple, two symbols
    w.b(1, 1).b(7, 8)  # first symbol, 8-bit form
    w.b(9, 8)  # second symbol
    _simple_single(w, 1)  # red
    _simple_single(w, 2)  # blue
    _simple_single(w, 255)  # alpha
    _simple_single(w, 0)  # distance
    w.b(0, 1)  # green: code 0 -> 7
    w.b(1, 1)  # green: code 1 -> 9
    rgba = decode_vp8l(w.payload())
    assert [int(p) for p in rgba[0, 0]] == [1, 7, 2, 255]
    assert [int(p) for p in rgba[0, 1]] == [1, 9, 2, 255]


_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
             14, 15)


def _normal_green_code(w, lengths, alphabet, cl_lengths, cl_codes):
    """Emit a normal (code-length-coded) prefix code covering the whole
    alphabet: explicit zeros below 3, 17 for runs of 3..10, 18 above."""
    w.b(0, 1)  # normal form
    w.b(15, 4)  # emit all 19 code-length slots
    for s in _CL_ORDER:
        w.b(cl_lengths.get(s, 0), 3)
    w.b(0, 1)  # no max_symbol cap

    def cl(sym):
        w.code(*cl_codes[sym])

    def zeros(n):
        while n >= 11:
            take = min(n, 138)
            cl(18)
            w.b(take - 11, 7)
            n -= take
        while n >= 3:
            take = min(n, 10)
            cl(17)
            w.b(take - 3, 3)
            n -= take
        for _ in range(n):
            cl(0)

    pos = 0
    for s in sorted(lengths):
        zeros(s - pos)
        cl(lengths[s])
        pos = s + 1
    zeros(alphabet - pos)


def test_hand_assembled_backward_reference_via_2d_map():
    # 2x2 image: two literals then one length-2 reference at distance
    # VALUE 1, which the 2D map's first entry resolves to (0, 1) = one
    # row up -> the second row must repeat the first
    w = _W()
    _header(w, 2, 2)
    w.b(0, 1).b(0, 1).b(0, 1)  # no transforms / cache / meta
    # green code over {5: len 1, 6: len 2, 257: len 2} (257 = length
    # symbol 1 -> LZ77 length 2); 257 > 255 rules out the simple form.
    # CL code {0:2, 1:2, 2:2, 17:3, 18:3} is complete; canonical codes
    # follow (length, symbol) order
    cl_codes = {0: (0b00, 2), 1: (0b01, 2), 2: (0b10, 2),
                17: (0b110, 3), 18: (0b111, 3)}
    _normal_green_code(
        w, {5: 1, 6: 2, 257: 2}, 256 + 24,
        {0: 2, 1: 2, 2: 2, 17: 3, 18: 3}, cl_codes,
    )
    _simple_single(w, 20)  # red
    _simple_single(w, 30)  # blue
    _simple_single(w, 255)  # alpha
    _simple_single(w, 0)  # distance: symbol 0 -> value 1 -> (0, 1)
    # canonical green codes: 5 -> 0 (1 bit); 6 -> 10; 257 -> 11
    w.code(0b0, 1)  # literal green 5
    w.code(0b10, 2)  # literal green 6
    w.code(0b11, 2)  # 257: backref, length sym 1 -> length 2, dist 0 bits
    rgba = decode_vp8l(w.payload())
    assert [int(p) for p in rgba[0, 0]] == [20, 5, 30, 255]
    assert [int(p) for p in rgba[0, 1]] == [20, 6, 30, 255]
    assert np.array_equal(rgba[1], rgba[0])


def test_hand_assembled_color_cache():
    # 3x1 image: literal A, literal B, then a cache hit replaying A.
    # cache_bits = 2, so the green alphabet is 256 + 24 + 4 and cache
    # symbols start at 280
    px_a = 0xFF000000 | (10 << 16) | (77 << 8) | 30
    px_b = 0xFF000000 | (99 << 16) | (88 << 8) | 30
    idx_a = ((0x1E35A7BD * px_a) & 0xFFFFFFFF) >> 30
    idx_b = ((0x1E35A7BD * px_b) & 0xFFFFFFFF) >> 30
    assert idx_a != idx_b  # B must not evict A for this pin to hold
    w = _W()
    _header(w, 3, 1)
    w.b(0, 1)  # no transforms
    w.b(1, 1).b(2, 4)  # color cache, 2 bits
    w.b(0, 1)  # no meta prefix codes
    cl_codes = {0: (0b00, 2), 1: (0b01, 2), 2: (0b10, 2),
                17: (0b110, 3), 18: (0b111, 3)}
    lengths = {77: 1, 88: 2, 280 + idx_a: 2}
    _normal_green_code(
        w, lengths, 256 + 24 + 4,
        {0: 2, 1: 2, 2: 2, 17: 3, 18: 3}, cl_codes,
    )
    # canonical green codes: 77 -> 0 (1 bit); 88 -> 10; cache sym -> 11
    w.b(1, 1).b(1, 1).b(1, 1).b(10, 8).b(99, 8)  # red: {10->bit0, 99->bit1}
    _simple_single(w, 30)  # blue
    _simple_single(w, 255)  # alpha
    _simple_single(w, 0)  # distance (unused)
    w.code(0b0, 1)  # green 77 (literal A)
    w.b(0, 1)  # red bit -> 10
    w.code(0b10, 2)  # green 88 (literal B)
    w.b(1, 1)  # red bit -> 99
    w.code(0b11, 2)  # cache symbol -> replay A, zero further bits
    rgba = decode_vp8l(w.payload())
    assert [int(p) for p in rgba[0, 0]] == [10, 77, 30, 255]
    assert [int(p) for p in rgba[0, 1]] == [99, 88, 30, 255]
    assert [int(p) for p in rgba[0, 2]] == [10, 77, 30, 255]


def test_hand_assembled_subtract_green():
    # 1x1, SUBTRACT_GREEN transform: stored (r=250, g=10, b=251) must
    # decode to r=(250+10)%256=4, b=(251+10)%256=5
    w = _W()
    _header(w, 1, 1)
    w.b(1, 1).b(2, 2)  # one transform: SUBTRACT_GREEN
    w.b(0, 1)  # end of transforms
    w.b(0, 1).b(0, 1)
    _simple_single(w, 10)  # green
    _simple_single(w, 250)  # red
    _simple_single(w, 251)  # blue
    _simple_single(w, 255)  # alpha
    _simple_single(w, 0)  # distance
    rgba = decode_vp8l(w.payload())
    assert tuple(int(p) for p in rgba[0, 0]) == (4, 10, 5, 255)


def test_hand_assembled_out_of_range_palette_index_decodes_black():
    # 3-color palette on a 2x1 image: width_bits = 2, so FOUR 2-bit
    # indices bundle into one packed green byte. The second pixel's
    # index is 3 >= palette size -> the spec pins 0x00000000
    w = _W()
    _header(w, 2, 1)
    w.b(1, 1).b(3, 2)  # COLOR_INDEXING
    w.b(3 - 1, 8)  # three colors
    # palette image (3x1, delta-coded): entries 0xFF101010, delta to
    # 0xFF202020 is 0x00101010, delta again 0x00101010
    w.b(0, 1)  # palette image: no color cache
    _simple_single(w, 16)  # green: all three deltas have green 0x10
    # red channel: first delta has alpha... channels: a=0xFF then 0, so
    # alpha needs two symbols; red/blue are 0x10 throughout
    _simple_single(w, 16)  # red
    _simple_single(w, 16)  # blue
    w.b(1, 1).b(1, 1).b(1, 1).b(255, 8).b(0, 8)  # alpha: {255, 0}
    _simple_single(w, 0)  # distance
    w.b(0, 1)  # alpha bit: 255 (first entry absolute)
    w.b(1, 1)  # alpha bit: 0 (delta)
    w.b(1, 1)  # alpha bit: 0 (delta)
    w.b(0, 1)  # end of transforms
    # packed width = ceil(2/4) = 1; green = idx0 | idx1<<2 = 1 | 3<<2
    w.b(0, 1).b(0, 1)  # main image: no cache, no meta
    _simple_single(w, 0b1101)  # green
    _simple_single(w, 0)  # red
    _simple_single(w, 0)  # blue
    _simple_single(w, 255)  # alpha
    _simple_single(w, 0)  # distance
    rgba = decode_vp8l(w.payload())
    assert tuple(int(p) for p in rgba[0, 0]) == (0x20, 0x20, 0x20, 255)
    assert tuple(int(p) for p in rgba[0, 1]) == (0, 0, 0, 0)  # index 3


def test_truncated_stream_quarantines():
    arr = _rng_rgb(4, 4, seed=3)
    p = encode_webp(arr)
    with pytest.raises(NotImplementedError):
        decode_webp(p[:20] + p[24:])  # sliced mid-payload


# ---------------------------------------------------------------------------
# container handling


def test_is_webp_and_lossy_seam():
    arr = _rng_rgb(3, 3)
    p = encode_webp(arr)
    assert is_webp(p)
    assert not is_webp(p[:11])
    assert not is_webp(b"RIFF" + p[4:8] + b"WAVE" + p[12:])
    lossy_body = b"WEBP" + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
    lossy = b"RIFF" + struct.pack("<I", len(lossy_body)) + lossy_body
    with pytest.raises(NotImplementedError):
        decode_webp(lossy)
    empty_body = b"WEBP" + b"EXIF" + struct.pack("<I", 2) + b"hi"
    empty = b"RIFF" + struct.pack("<I", len(empty_body)) + empty_body
    with pytest.raises(NotImplementedError):
        decode_webp(empty)


def test_vp8x_extended_container_still_finds_vp8l():
    arr = _rng_rgb(4, 6, seed=9)
    p = encode_webp(arr)
    vp8l_chunk = p[12:]
    vp8x = b"VP8X" + struct.pack("<I", 10) + b"\x00" * 10
    body = b"WEBP" + vp8x + vp8l_chunk
    ext = b"RIFF" + struct.pack("<I", len(body)) + body
    assert np.array_equal(decode_webp(ext), arr)


# ---------------------------------------------------------------------------
# seeded fuzz (the loops that caught the literal-channel-order and the
# single-symbol>=256 code bugs during development, pinned)


def test_fuzz_roundtrip_many_seeds_and_shapes():
    rng = np.random.RandomState(1234)
    for _ in range(30):
        h = int(rng.randint(1, 24))
        w = int(rng.randint(1, 24))
        arr = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        assert np.array_equal(decode_webp(encode_webp(arr)), arr), (h, w)


def test_fuzz_entropy_layer_full_random_argb():
    # full-random 32-bit pixels hit every channel code with wide
    # histograms (the literal read-order bug only showed here)
    from mapreduce_machine_learning_spark.sources.webp import (
        _BitWriter,
        _encode_entropy_coded,
        _read_entropy_coded,
    )
    import random

    random.seed(99)
    for trial in range(60):
        w = random.randint(1, 100)
        h = random.randint(1, 4)
        vals = [random.getrandbits(32) for _ in range(w * h)]
        bw = _BitWriter()
        _encode_entropy_coded(bw, vals, w, trial % 2 == 0)
        br = _BitReader(bw.finish())
        got = _read_entropy_coded(br, w, h, trial % 2 == 0)
        assert got == vals, (trial, w, h)


def test_hand_assembled_meta_prefix_codes():
    # 8x1 image with huffman_bits=2 (4-pixel tiles -> 2 tiles). The
    # entropy image holds meta indices 0 and 1 ((red<<8)|green), so the
    # two halves decode through DIFFERENT prefix-code groups
    w = _W()
    _header(w, 8, 1)
    w.b(0, 1)  # no transforms
    w.b(0, 1)  # no color cache
    w.b(1, 1)  # meta prefix codes present
    w.b(0, 3)  # huffman_bits = 2
    # entropy image: 2x1, no cache; green carries the meta index
    w.b(0, 1)  # entropy image: no color cache
    w.b(1, 1).b(1, 1)  # green: simple, two symbols
    w.b(0, 1).b(0, 1)  # first symbol 0 (1-bit form)
    w.b(1, 8)  # second symbol 1
    _simple_single(w, 0)  # red (high byte of the meta index)
    _simple_single(w, 0)  # blue
    _simple_single(w, 255)  # alpha
    _simple_single(w, 0)  # distance
    w.b(0, 1)  # tile 0 -> meta 0
    w.b(1, 1)  # tile 1 -> meta 1
    # group 0: green 111; group 1: green 222 (all single-symbol codes)
    for green in (111, 222):
        _simple_single(w, green)
        _simple_single(w, 1)  # red
        _simple_single(w, 2)  # blue
        _simple_single(w, 255)  # alpha
        _simple_single(w, 0)  # distance
    rgba = decode_vp8l(w.payload())  # pixels cost zero bits
    assert [int(p[1]) for p in rgba[0]] == [111] * 4 + [222] * 4


def test_inverse_predictor_modes_against_independent_formulas():
    # an independent mini-implementation of the spec's predictor
    # formulas lives HERE; residuals forward-computed with it must
    # invert through _inv_predictor for every mode 0..13
    from mapreduce_machine_learning_spark.sources.webp import (
        _inv_predictor,
        _pack,
        _sub_size,
        _unpack,
    )

    def avg2(a, b):
        return tuple((x + y) >> 1 for x, y in zip(a, b))

    def predict(mode, l, t, tl, tr):
        if mode == 0:
            return (255, 0, 0, 0)
        if mode == 1:
            return l
        if mode == 2:
            return t
        if mode == 3:
            return tr
        if mode == 4:
            return tl
        if mode == 5:
            return avg2(avg2(l, tr), t)
        if mode == 6:
            return avg2(l, tl)
        if mode == 7:
            return avg2(l, t)
        if mode == 8:
            return avg2(tl, t)
        if mode == 9:
            return avg2(t, tr)
        if mode == 10:
            return avg2(avg2(l, tl), avg2(t, tr))
        if mode == 11:
            p = [a + b - c for a, b, c in zip(l, t, tl)]
            pl = sum(abs(x - y) for x, y in zip(p, l))
            pt = sum(abs(x - y) for x, y in zip(p, t))
            return l if pl < pt else t
        if mode == 12:
            return tuple(
                min(255, max(0, a + b - c)) for a, b, c in zip(l, t, tl)
            )
        ave = avg2(l, t)
        out = []
        for a, b in zip(ave, tl):
            d = a - b
            half = d // 2 if d >= 0 else -((-d) // 2)
            out.append(min(255, max(0, a + half)))
        return tuple(out)

    rng = np.random.RandomState(5)
    h, wid, bits = 6, 9, 2  # 4-pixel blocks: 3x2 block grid
    for mode in range(14):
        px = [
            tuple(int(v) for v in rng.randint(0, 256, 4))
            for _ in range(h * wid)
        ]
        res = []
        for i, p in enumerate(px):
            x, y = i % wid, i // wid
            if x == 0 and y == 0:
                pred = (255, 0, 0, 0)
            elif y == 0:
                pred = px[i - 1]
            elif x == 0:
                pred = px[i - wid]
            else:
                pred = predict(
                    mode, px[i - 1], px[i - wid], px[i - wid - 1],
                    px[i - wid + 1],
                )
            res.append(_pack(tuple((a - b) % 256 for a, b in zip(p, pred))))
        modes = [0xFF000000 | (mode << 8)] * (
            _sub_size(wid, bits) * _sub_size(h, bits)
        )
        got = _inv_predictor(res, wid, h, bits, modes)
        assert [_unpack(g) for g in got] == px, mode


def test_inverse_color_transform_against_independent_forward():
    from mapreduce_machine_learning_spark.sources.webp import (
        _inv_color_transform,
    )

    def s8(v):
        return v - 256 if v > 127 else v

    def delta(t, c):
        return (s8(t) * s8(c)) >> 5

    rng = np.random.RandomState(6)
    h, wid, bits = 4, 5, 2  # one 4x4 block + a partial column
    cte_img = [
        int(0xFF000000 | (rng.randint(0, 256) << 16)
            | (rng.randint(0, 256) << 8) | rng.randint(0, 256))
        for _ in range(2 * 1)
    ]
    px = [tuple(int(v) for v in rng.randint(0, 256, 4))
          for _ in range(h * wid)]
    stored = []
    for i, (a, r, g, b) in enumerate(px):
        x, y = i % wid, i // wid
        cte = cte_img[(y >> bits) * 2 + (x >> bits)]
        g2r, g2b, r2b = cte & 0xFF, (cte >> 8) & 0xFF, (cte >> 16) & 0xFF
        sr = (r - delta(g2r, g)) % 256
        sb = (b - delta(g2b, g) - delta(r2b, r)) % 256  # r = ORIGINAL red
        stored.append((a << 24) | (sr << 16) | (g << 8) | sb)
    got = _inv_color_transform(stored, wid, h, bits, cte_img)
    want = [(a << 24) | (r << 16) | (g << 8) | b for a, r, g, b in px]
    assert got == want


# ---------------------------------------------------------------------------
# round 12: LUT decode paths — codes deeper than the LUT cap, and the
# chunked overlapping backward-reference copy


def test_hand_assembled_codes_deeper_than_lut_cap():
    # green code with lengths 1..11 plus two 12-bit codes: the 12-bit
    # symbols exceed _PrefixCode._LUT_BITS (11) and must decode through
    # the slow bit-walk, interleaved with LUT-decoded shallow symbols
    from mapreduce_machine_learning_spark.sources.webp import _PrefixCode

    assert _PrefixCode._LUT_BITS == 11  # the pin below assumes this cap
    lengths = {i: i + 1 for i in range(11)}  # greens 0..10, len 1..11
    lengths[11] = 12
    lengths[12] = 12
    # canonical codes: sym i (len i+1) = i ones then a zero; the two
    # 12-bit codes are 111111111110 and 111111111111
    green_codes = {i: ((1 << (i + 1)) - 2, i + 1) for i in range(11)}
    green_codes[11] = ((1 << 12) - 2, 12)
    green_codes[12] = ((1 << 12) - 1, 12)
    # complete CL code over the 13 needed symbols: lengths 1..3 at 3
    # bits, 4..12 and 18 at 4 bits (3/8 + 10/16 = 1)
    cl_lengths = {1: 3, 2: 3, 3: 3}
    cl_lengths.update({s: 4 for s in range(4, 13)})
    cl_lengths[18] = 4
    cl_codes = {1: (0b000, 3), 2: (0b001, 3), 3: (0b010, 3)}
    for i, s in enumerate(list(range(4, 13)) + [18]):
        cl_codes[s] = (0b0110 + i, 4)
    w = _W()
    _header(w, 13, 1)
    w.b(0, 1).b(0, 1).b(0, 1)  # no transforms / cache / meta
    _normal_green_code(w, lengths, 256 + 24, cl_lengths, cl_codes)
    _simple_single(w, 20)  # red
    _simple_single(w, 30)  # blue
    _simple_single(w, 255)  # alpha
    _simple_single(w, 0)  # distance (unused)
    for i in range(13):  # one literal per green symbol, deep ones last
        w.code(*green_codes[i])
    rgba = decode_vp8l(w.payload())
    assert [int(rgba[0, i][1]) for i in range(13)] == list(range(13))
    assert [int(p) for p in rgba[0, 12]] == [20, 12, 30, 255]


def test_hand_assembled_overlapping_backward_reference():
    # literal then a length-4 reference at distance 1 (2D map value 2 ->
    # (dx, dy) = (1, 0)): the copy window overlaps itself, so the
    # chunked self-copy must repeat the single pixel four times
    w = _W()
    _header(w, 5, 1)
    w.b(0, 1).b(0, 1).b(0, 1)  # no transforms / cache / meta
    cl_codes = {1: (0b0, 1), 17: (0b10, 2), 18: (0b11, 2)}
    _normal_green_code(
        w, {7: 1, 259: 1}, 256 + 24, {1: 1, 17: 2, 18: 2}, cl_codes
    )
    _simple_single(w, 40)  # red
    _simple_single(w, 50)  # blue
    _simple_single(w, 255)  # alpha
    _simple_single(w, 1)  # distance: symbol 1 -> value 2 -> (1, 0)
    w.code(0b0, 1)  # literal green 7
    w.code(0b1, 1)  # 259: length symbol 3 -> length 4, no extra bits
    rgba = decode_vp8l(w.payload())
    assert rgba.shape == (1, 5, 4)
    for i in range(5):
        assert [int(p) for p in rgba[0, i]] == [40, 7, 50, 255]
