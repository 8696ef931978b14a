"""Baseline JPEG codec in stdlib + numpy — no libjpeg, no PIL.

Round 9 closes the last *image* seam in ``sources/multimodal.py``: the
container has no DCT/entropy library, so this module implements the
baseline sequential JFIF process (ITU-T T.81) directly — Huffman entropy
coding bit by bit, 8×8 type-II DCT as a numpy matrix product, Annex-K
quantization/Huffman tables for the encoder, and full DHT/DQT parsing for
the decoder (so streams with non-standard tables decode too).

Supported on DECODE (all round 10 unless noted): baseline DCT (SOF0,
rounds 8-9), extended sequential (SOF1) at 8 OR 12 bits, progressive DCT
(SOF2 — spectral selection, successive approximation with DC/AC
refinement scans, EOB runs, DHT/DQT/DRI between scans) at 8 or 12 bits,
16-bit DQT entries on 12-bit frames (2048 level shift; the uint8 output
contract downscales by >>4), grayscale or 3-component YCbCr, any
sampling factors in {1, 2} (4:4:4, 4:2:2, 4:2:0, and the transposed
variants), restart markers (DRI/RSTn), multi-table DQT/DHT segments,
APPn/COM skip. Lossless/hierarchical/arithmetic SOFs, 12-bit baseline
(illegal per T.81), and 16-bit DQT in an 8-bit frame raise
``NotImplementedError`` at the documented seam — same contract as the
PNG/BMP codecs (callers quarantine to the deterministic stand-ins).

Supported on ENCODE: 8-bit RGB → YCbCr JFIF at a given IJG-style
quality, 4:4:4 or 4:2:0 chroma subsampling — baseline (``encode_jpeg``,
standard Annex-K tables), progressive (``encode_jpeg_progressive``,
ten-scan script; carries the identical quantized coefficients, so the
two encodings DECODE bit-identically), or 12-bit extended sequential
(``encode_jpeg_12bit``, x16-scaled samples AND tables — also decodes
bit-identically to the baseline twin).

Scale note (mirrors the PNG codec's): the per-bit Python loops are fine
for the metadata-sized media of the test tables; a 100 TB image pipeline
would decode in a native library at exactly this seam — the surrounding
``mapInPandas`` plumbing in ``multimodal.py`` is the part that scales.
Decode(encode(x)) is NOT bit-exact (JPEG is lossy by construction); tests
bound the error instead of pinning bytes.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Constant tables (public: ITU-T T.81 Annex K)
# ---------------------------------------------------------------------------

#: zigzag scan: ZIGZAG[i] = natural (row-major) index of zigzag position i
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.1 quantization tables, natural (row-major) order
_QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 "typical" Huffman tables: (BITS counts for lengths 1..16, values)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# Orthonormal 8-point DCT-II basis: forward F = D @ b @ D.T, inverse
# b = D.T @ F @ D — exactly the JPEG 2-D DCT normalization.
_D = np.array(
    [
        [
            (np.sqrt(0.125) if u == 0 else 0.5)
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def is_jpeg(payload: bytes) -> bool:
    return len(payload) > 4 and payload[:3] == b"\xff\xd8\xff"


# ---------------------------------------------------------------------------
# Huffman code construction (T.81 Annex C)
# ---------------------------------------------------------------------------


def _build_decode_table(bits: list[int], vals: list[int]) -> dict:
    """{(code_length, code): value} — canonical code assignment."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], vals: list[int]) -> dict:
    """{value: (code, code_length)} — inverse of the decode table."""
    return {v: (c, ln) for (ln, c), v in _build_decode_table(bits, vals).items()}


_LUT_CACHE: dict = {}


def _build_decode_lut(bits: list[int], vals: list[int]) -> tuple:
    """(value_list, length_list), each 2^16 entries indexed by the next 16
    bits of the stream: canonical-code decode as ONE table lookup instead
    of a bit-by-bit dict walk (the round-9 probe's JPEG bottleneck). Every
    16-bit word whose prefix is a valid code maps to that code's value and
    length; words starting with no valid code keep length 0 → the decoder
    raises. Cached per (bits, vals) — the standard tables build once per
    process, not once per image."""
    key = (bytes(bits), bytes(vals))
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    if sum(bits) > len(vals):
        # a corrupt DHT can declare more codes than it carries values
        raise NotImplementedError("JPEG Huffman table truncated")
    val = np.zeros(65536, np.int16)
    ln = np.zeros(65536, np.uint8)
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= (1 << length):
                # over-full (non-canonical) code counts would wrap
                raise NotImplementedError("JPEG Huffman table over-full")
            base = code << (16 - length)
            span = 1 << (16 - length)
            val[base : base + span] = vals[k]
            ln[base : base + span] = length
            k += 1
            code += 1
        code <<= 1
    lut = (val.tolist(), ln.tolist())  # list indexing beats numpy scalars
    _LUT_CACHE[key] = lut
    return lut


# ---------------------------------------------------------------------------
# Bit-level IO over the entropy-coded segment
# ---------------------------------------------------------------------------


class _BitWriter:
    """MSB-first bit packer with 0xFF byte stuffing (B.1.1.5)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            b = (self._acc >> self._n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec

    def marker(self, byte: int) -> None:
        """Byte-align and emit a raw marker (no stuffing on marker bytes)."""
        self.flush()
        self.buf += bytes([0xFF, byte])


class _BitReader:
    """MSB-first reader over pre-unstuffed entropy segments.

    Round-9 probe finding (`tools/media_probe.py`): a bit-at-a-time reader
    with inline 0xFF00 handling decoded ~137 images/s 1-core — ~30× slower
    than the other codecs — because every Huffman symbol paid ~10 Python
    calls. This reader splits the scan ONCE into unstuffed byte segments
    (one per restart interval; `bytes.replace` does the 0xFF00→0xFF in C),
    then serves multi-bit reads from an int accumulator, so the decode
    loop costs one `receive`/`peek16` call per symbol instead of one call
    per bit. Reads past a segment's end pad with 1-bits (the encoder's own
    byte padding), so a final partial byte decodes without a bounds branch
    per bit; a symbol that CONSUMES padding past the last real bit is a
    truncated stream and raises at the existing seam."""

    def __init__(self, data: bytes, pos: int) -> None:
        # split entropy data at RST markers; find the terminating marker
        segs, start, k = [], pos, pos
        while True:
            j = data.find(b"\xff", k)
            if j < 0 or j + 1 >= len(data):
                segs.append(data[start:])  # truncated: no EOI — pad reads
                break
            m = j + 1  # fill 0xFF bytes may precede the marker byte
            while m < len(data) and data[m] == 0xFF:
                m += 1  # (B.1.1.2) — classify the byte AFTER the run
            if m >= len(data):
                segs.append(data[start:j])  # truncated inside a fill run
                break
            nxt = data[m]
            if nxt == 0x00:
                k = m + 1  # stuffed data byte, not a marker
            elif 0xD0 <= nxt <= 0xD7:
                segs.append(data[start:j])
                start = k = m + 1  # consume fill run + RSTn marker
            else:
                segs.append(data[start:j])  # EOI / next real marker
                break
        self.segs = [s.replace(b"\xff\x00", b"\xff") for s in segs]
        self._seg_i = 0
        self._load(0)

    def _load(self, i: int) -> None:
        if i >= len(self.segs):
            raise NotImplementedError("missing RST marker at restart interval")
        self._cur = self.segs[i]
        self._pos = 0
        self._acc = 0
        self._n = 0
        self._padded = 0

    def _fill(self, need: int) -> None:
        while self._n < need:
            if self._pos < len(self._cur):
                self._acc = (self._acc << 8) | self._cur[self._pos]
                self._pos += 1
            else:
                self._acc = (self._acc << 8) | 0xFF  # 1-pad past the end
                self._padded += 8
            self._n += 8

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        self._n -= n
        if self._n < self._padded:  # consumed bits that never existed
            raise NotImplementedError("truncated JPEG entropy data")
        v = (self._acc >> self._n) & ((1 << n) - 1)
        self._acc &= (1 << self._n) - 1
        return v

    def peek16(self) -> int:
        self._fill(16)
        return (self._acc >> (self._n - 16)) & 0xFFFF

    def skip(self, n: int) -> None:
        self._n -= n
        if self._n < self._padded:
            raise NotImplementedError("truncated JPEG entropy data")
        self._acc &= (1 << self._n) - 1

    def sync_restart(self) -> None:
        """Advance to the next restart segment (the split consumed the
        RSTn markers up front)."""
        self._seg_i += 1
        self._load(self._seg_i)


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a t-bit magnitude to its signed value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _huff_decode(reader: _BitReader, lut: tuple) -> int:
    w = reader.peek16()
    length = lut[1][w]
    if length == 0:
        raise NotImplementedError("invalid JPEG Huffman code")
    reader.skip(length)
    return lut[0][w]


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


_ZZ_LIST = ZIGZAG.tolist()


def _decode_block(
    reader: _BitReader, dc_tab: tuple, ac_tab: tuple, qt: "np.ndarray"
) -> "np.ndarray":
    """One 8×8 block: Huffman → dequantized natural-order coefficients.

    The reader's accumulator state is hoisted into LOCAL ints for the
    whole block — the probe showed per-symbol method dispatch
    (peek/skip/receive as separate calls) costing as much as the decode
    itself, and a noise block carries ~55 symbols. Same bit semantics as
    the _BitReader methods (16-bit LUT lookahead, 1-bit padding past the
    segment end, truncation check against consumed padding)."""
    dcv, dcl = dc_tab
    acv, acl = ac_tab
    cur = reader._cur
    L = len(cur)
    pos, acc, n, padded = reader._pos, reader._acc, reader._n, reader._padded
    coef = [0] * 64
    zz = _ZZ_LIST
    k = 0  # 0 while decoding DC, then the AC zigzag index
    while True:
        while n < 16:
            if pos < L:
                acc = (acc << 8) | cur[pos]
                pos += 1
            else:
                acc = (acc << 8) | 0xFF
                padded += 8
            n += 8
        w = (acc >> (n - 16)) & 0xFFFF
        if k == 0:  # DC: LUT value is the magnitude category
            ln = dcl[w]
            if ln == 0:
                raise NotImplementedError("invalid JPEG Huffman code")
            s = dcv[w]
            n -= ln
            run = 0
        else:  # AC: LUT value is (run << 4) | size
            ln = acl[w]
            if ln == 0:
                raise NotImplementedError("invalid JPEG Huffman code")
            rs = acv[w]
            n -= ln
            s = rs & 0x0F
            run = rs >> 4
            if s == 0:
                if run == 15:  # ZRL: sixteen zeros
                    acc &= (1 << n) - 1
                    k += 16
                    continue
                break  # EOB
            k += run
            if k > 63:
                raise NotImplementedError("JPEG AC run past block end")
        if s:
            while n < s:
                if pos < L:
                    acc = (acc << 8) | cur[pos]
                    pos += 1
                else:
                    acc = (acc << 8) | 0xFF
                    padded += 8
                n += 8
            n -= s
            v = (acc >> n) & ((1 << s) - 1)
            if v < (1 << (s - 1)):
                v += 1 - (1 << s)
            coef[zz[k]] = v
        acc &= (1 << n) - 1
        k += 1
        if k > 63:
            break
    acc &= (1 << n) - 1
    if n < padded:
        raise NotImplementedError("truncated JPEG entropy data")
    reader._pos, reader._acc, reader._n, reader._padded = pos, acc, n, padded
    return np.array(coef, np.float64) * qt  # DC still a diff — caller fixes


def _scan_end(data: bytes, pos: int) -> int:
    """Offset of the marker terminating the entropy-coded scan at ``pos``
    (the 0xFF byte), skipping stuffed bytes, RSTn markers, and fill runs —
    the same classification the _BitReader splitter uses, so a progressive
    decoder can resume the header walk exactly where the scan data ends."""
    k = pos
    while True:
        j = data.find(b"\xff", k)
        if j < 0 or j + 1 >= len(data):
            return len(data)
        m = j + 1
        while m < len(data) and data[m] == 0xFF:
            m += 1
        if m >= len(data):
            return len(data)
        nxt = data[m]
        if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
            k = m + 1
            continue
        return m - 1  # the 0xFF that opens the terminating marker


def decode_jpeg(payload: bytes) -> "np.ndarray":
    """uint8 (h, w, 3) RGB from a baseline (SOF0), extended-sequential
    (SOF1), or progressive (SOF2) JPEG at 8- or 12-bit precision
    (12-bit on SOF1/SOF2 only, as the spec allows; 16-bit DQT tables
    accepted wherever 12-bit frames are).

    Grayscale streams replicate luma across RGB (same contract as
    decode_png color type 0). Progressive streams decode all scans —
    spectral selection, successive approximation (DC and AC refinement,
    EOB runs), DHT/DQT/DRI between scans, restart markers inside any
    scan — then reconstruct once. Still-unsupported cases raise at the
    documented seam: lossless/hierarchical/arithmetic SOFs, 12-bit
    baseline (SOF0, illegal per spec anyway), and 16-bit DQT tables
    referenced by an 8-bit frame.
    """
    if not is_jpeg(payload):
        raise NotImplementedError("not a JPEG payload")
    data = payload
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    comps: list[dict] = []
    h_img = w_img = 0
    dri = 0
    progressive = False
    prec_img = 8
    qt16: set = set()  # table ids declared with 16-bit entries
    coefstore: dict[int, np.ndarray] = {}  # cid -> (by, bx, 64) zigzag ints
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise NotImplementedError("desynchronized JPEG marker stream")
        while data[pos + 1] == 0xFF:  # optional fill bytes (B.1.1.2)
            pos += 1
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI before any SOS
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # TEM and RSTn are standalone markers (B.1.1.3): no length
            # segment follows, so reading one would desynchronize the
            # walk on legal-but-unusual streams (ADVICE r9)
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker in (0xC0, 0xC1, 0xC2):
            # SOF0 baseline / SOF1 extended sequential / SOF2 progressive.
            # At 8-bit precision SOF1 is syntactically identical to SOF0
            # (the extensions are 12-bit samples and more table slots), so
            # it decodes on the baseline path. 12-bit precision is legal
            # for SOF1/SOF2 only (round 10): the decode math is the same
            # with a 2048 level shift, and the uint8 output contract
            # downscales by >>4 at reconstruction.
            progressive = marker == 0xC2
            if len(body) < 6:
                raise NotImplementedError("truncated JPEG SOF segment")
            prec, h_img, w_img, ncomp = struct.unpack_from(">BHHB", body, 0)
            if not (prec == 8 or (prec == 12 and marker != 0xC0)):
                raise NotImplementedError(f"{prec}-bit JPEG precision")
            prec_img = prec
            if h_img * w_img == 0 or h_img * w_img > 1 << 26:
                # corrupt SOF dims can demand a 34 GB plane allocation
                # before any entropy data validates — refuse (quarantine)
                raise NotImplementedError(
                    f"JPEG dimensions {w_img}x{h_img} out of range"
                )
            if ncomp not in (1, 3):
                raise NotImplementedError(f"{ncomp}-component JPEG")
            if len(body) < 6 + 3 * ncomp:
                raise NotImplementedError("truncated JPEG SOF segment")
            for i in range(ncomp):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * i)
                hs, vs = hv >> 4, hv & 0x0F
                if hs not in (1, 2) or vs not in (1, 2):
                    raise NotImplementedError(
                        f"JPEG sampling factors {hs}x{vs}"
                    )
                comps.append({"cid": cid, "h": hs, "v": vs, "tq": tq})
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only sequential SOF0/SOF1 and progressive SOF2 decode "
                f"in-container (got SOF 0xFF{marker:02X})"
            )
        elif marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq == 0:
                    if i + 65 > len(body):
                        raise NotImplementedError("JPEG quant table truncated")
                    vals = np.frombuffer(body, np.uint8, 64, i + 1)
                elif pq == 1:  # 16-bit entries — legal for 12-bit frames
                    if i + 129 > len(body):
                        raise NotImplementedError(
                            "16-bit JPEG quant table truncated"
                        )
                    vals = np.frombuffer(body, ">u2", 64, i + 1)
                    qt16.add(tq)
                else:
                    raise NotImplementedError(
                        f"JPEG quant table precision Pq={pq}"
                    )
                nat = np.empty(64, np.float64)
                nat[ZIGZAG] = vals  # stream order is zigzag
                qtables[tq] = nat
                i += 65 + 64 * pq
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                if len(bits) < 16:
                    raise NotImplementedError("JPEG Huffman table truncated")
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                huff[(tc, th)] = _build_decode_lut(bits, vals)
                i += 17 + n
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise NotImplementedError("truncated JPEG DRI segment")
            (dri,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if not body or len(body) < 4 + 2 * body[0]:
                # header is 1 + 2*Ns component bytes + Ss/Se/AhAl
                raise NotImplementedError("truncated JPEG SOS segment")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
                comp = next((c for c in comps if c["cid"] == cs), None)
                if comp is None:
                    raise NotImplementedError(
                        "JPEG scan references an undeclared component"
                    )
                comp["td"], comp["ta"] = tdta >> 4, tdta & 0x0F
                scan.append(comp)
            if prec_img == 8 and any(c["tq"] in qt16 for c in scan):
                raise NotImplementedError(
                    "16-bit JPEG quant table in an 8-bit frame"
                )
            if not progressive:
                return _decode_scan(
                    data, pos, scan, qtables, huff, h_img, w_img, dri,
                    prec_img,
                )
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            if se > 63 or ss > se:
                raise NotImplementedError(
                    "JPEG spectral selection outside 0..63"
                )
            if not coefstore:
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcus_x = -(-w_img // (8 * hmax))
                mcus_y = -(-h_img // (8 * vmax))
                for c in comps:
                    # int32: |coef| <= 1023 << Al fits with room, and it
                    # halves the footprint at the 2^26-px dimension cap
                    coefstore[c["cid"]] = np.zeros(
                        (mcus_y * c["v"], mcus_x * c["h"], 64), np.int32
                    )
            _decode_scan_progressive(
                data, pos, scan, comps, huff, dri, coefstore,
                h_img, w_img, ss, se, ahal >> 4, ahal & 0x0F,
            )
            pos = _scan_end(data, pos)
        # APPn / COM / anything else: skip
    if progressive and coefstore:
        return _reconstruct_progressive(
            comps, coefstore, qtables, h_img, w_img, prec_img
        )
    raise NotImplementedError("JPEG stream has no SOS scan")


def _decode_scan(data, pos, scan, qtables, huff, h_img, w_img, dri,
                 prec=8):
    if not scan or h_img == 0 or w_img == 0:
        raise NotImplementedError("JPEG SOS before SOF0")
    for c in scan:  # validate once, outside the per-MCU loop
        if c["tq"] not in qtables or (0, c["td"]) not in huff or (
            1,
            c["ta"],
        ) not in huff:
            raise NotImplementedError(
                "JPEG scan references an undeclared quant/Huffman table"
            )
    level = float(1 << (prec - 1))
    down = float(1 << (prec - 8))  # 12-bit planes -> 8-bit output domain
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcus_x = -(-w_img // (8 * hmax))
    mcus_y = -(-h_img // (8 * vmax))
    planes = {
        c["cid"]: np.empty(
            (mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), np.float64
        )
        for c in scan
    }
    preds = {c["cid"]: 0.0 for c in scan}
    reader = _BitReader(data, pos)
    n_mcu = 0
    # entropy-decode every block first, then ONE broadcast matmul does all
    # the IDCTs (the per-block 8×8 matmul pair was ~20% of decode time)
    slots: list = []  # (plane, y0, x0) per block, in decode order
    coefs: list = []
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and n_mcu and n_mcu % dri == 0:
                reader.sync_restart()
                preds = {c["cid"]: 0.0 for c in scan}
            for c in scan:
                qt = qtables[c["tq"]]
                dc_tab = huff[(0, c["td"])]
                ac_tab = huff[(1, c["ta"])]
                plane = planes[c["cid"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = _decode_block(reader, dc_tab, ac_tab, qt)
                        coef[0] += preds[c["cid"]]
                        preds[c["cid"]] = coef[0]
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        slots.append((plane, y0, x0))
                        coefs.append(coef)
            n_mcu += 1
    px_all = _D.T @ np.stack(coefs).reshape(-1, 8, 8) @ _D + level
    for (plane, y0, x0), px in zip(slots, px_all):
        plane[y0 : y0 + 8, x0 : x0 + 8] = px
    up = {}
    for c in scan:
        p = planes[c["cid"]]
        if down != 1.0:
            p = p / down
        p = np.repeat(p, vmax // c["v"], axis=0)
        p = np.repeat(p, hmax // c["h"], axis=1)
        up[c["cid"]] = p[:h_img, :w_img]
    if len(scan) == 1:
        g = np.clip(up[scan[0]["cid"]] + 0.5, 0, 255).astype(np.uint8)
        return np.repeat(g[..., None], 3, axis=2)
    y, cb, cr = (up[c["cid"]] for c in scan)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.stack([r, g, b], axis=2) + 0.5, 0, 255
    ).astype(np.uint8)


# ---------------------------------------------------------------------------
# Progressive decoder (T.81 Annex G.2)
# ---------------------------------------------------------------------------
#
# A progressive stream carries the SAME quantized coefficients as a baseline
# one, split across scans two ways: spectral selection (each AC scan covers
# a zigzag band Ss..Se of ONE component; DC scans may interleave components)
# and successive approximation (a first pass delivers coefficients shifted
# right by Al, refinement passes deliver one lower-order bit each). Scans
# accumulate into per-component integer coefficient arrays (zigzag order);
# reconstruction — dequantize, IDCT, upsample, color-convert — happens once,
# after the last scan, and is bit-identical to the baseline path given the
# same coefficients (pinned by tests/test_jpeg_codec.py).


def _comp_blocks(c: dict, comps: list, h_img: int, w_img: int) -> tuple:
    """(block rows, block cols) of a component's OWN grid — the raster a
    non-interleaved scan covers (T.81 A.2.2: ceil of the scaled dims)."""
    hmax = max(x["h"] for x in comps)
    vmax = max(x["v"] for x in comps)
    cw = -(-w_img * c["h"] // hmax)
    ch = -(-h_img * c["v"] // vmax)
    return -(-ch // 8), -(-cw // 8)


def _decode_scan_progressive(
    data, pos, scan, comps, huff, dri, coefstore, h_img, w_img,
    ss, se, ah, al,
):
    if not comps or h_img == 0:
        raise NotImplementedError("JPEG SOS before SOF")
    reader = _BitReader(data, pos)
    if ss == 0:  # DC scan (Se must be 0; interleaving allowed)
        if se != 0:
            raise NotImplementedError(
                "progressive scan mixes DC and AC bands"
            )
        if ah == 0 and any((0, c["td"]) not in huff for c in scan):
            raise NotImplementedError("progressive DC scan without DHT")
        if ah == 0:
            _prog_dc_first(reader, scan, comps, coefstore, huff,
                           h_img, w_img, dri, al)
        else:
            _prog_dc_refine(reader, scan, comps, coefstore,
                            h_img, w_img, dri, al)
        return
    if len(scan) != 1:
        raise NotImplementedError("interleaved progressive AC scan")
    c = scan[0]
    bh, bw = _comp_blocks(c, comps, h_img, w_img)
    arr = coefstore[c["cid"]]
    ac_tab = huff.get((1, c["ta"]))
    if ac_tab is None:
        raise NotImplementedError("progressive AC scan without DHT")
    if ah == 0:
        _prog_ac_first(reader, arr, bh, bw, ss, se, al, ac_tab, dri)
    else:
        _prog_ac_refine(reader, arr, bh, bw, ss, se, al, ac_tab, dri)


def _prog_dc_first(reader, scan, comps, coefstore, huff, h_img, w_img,
                   dri, al):
    preds = {c["cid"]: 0 for c in scan}
    if len(scan) == 1:  # non-interleaved: the component's own raster
        c = scan[0]
        bh, bw = _comp_blocks(c, comps, h_img, w_img)
        dc_tab = huff[(0, c["td"])]
        arr = coefstore[c["cid"]]
        n = 0
        for by in range(bh):
            for bx in range(bw):
                if dri and n and n % dri == 0:
                    reader.sync_restart()
                    preds[c["cid"]] = 0
                n += 1
                t = _huff_decode(reader, dc_tab)
                if t > 15:
                    raise NotImplementedError("invalid JPEG DC category")
                preds[c["cid"]] += _extend(reader.receive(t), t)
                # the STORED value is preds << al, so the bound must
                # shrink with al or the shift overflows the int32
                # coefstore (wraps on numpy 1.x, raises on numpy 2.x)
                if not -((1 << 30) >> al) <= preds[c["cid"]] <= (1 << 30) >> al:
                    raise NotImplementedError("JPEG DC value out of range")
                arr[by, bx, 0] = preds[c["cid"]] << al
        return
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w_img // (8 * hmax))
    mcus_y = -(-h_img // (8 * vmax))
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and n_mcu and n_mcu % dri == 0:
                reader.sync_restart()
                preds = {c["cid"]: 0 for c in scan}
            n_mcu += 1
            for c in scan:
                dc_tab = huff[(0, c["td"])]
                arr = coefstore[c["cid"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        t = _huff_decode(reader, dc_tab)
                        if t > 15:
                            raise NotImplementedError(
                                "invalid JPEG DC category"
                            )
                        preds[c["cid"]] += _extend(reader.receive(t), t)
                        # bound the post-shift value (see the
                        # non-interleaved branch above)
                        if (
                            not -((1 << 30) >> al)
                            <= preds[c["cid"]]
                            <= (1 << 30) >> al
                        ):
                            raise NotImplementedError(
                                "JPEG DC value out of range"
                            )
                        arr[
                            my * c["v"] + by, mx * c["h"] + bx, 0
                        ] = preds[c["cid"]] << al
    # (successive DC bits arrive via _prog_dc_refine)


def _prog_dc_refine(reader, scan, comps, coefstore, h_img, w_img, dri, al):
    """One raw bit per block: OR bit ``al`` into the DC coefficient
    (two's-complement semantics — works for negative values too)."""
    bit = 1 << al
    if len(scan) == 1:
        c = scan[0]
        bh, bw = _comp_blocks(c, comps, h_img, w_img)
        arr = coefstore[c["cid"]]
        n = 0
        for by in range(bh):
            for bx in range(bw):
                if dri and n and n % dri == 0:
                    reader.sync_restart()
                n += 1
                if reader.receive(1):
                    arr[by, bx, 0] |= bit
        return
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w_img // (8 * hmax))
    mcus_y = -(-h_img // (8 * vmax))
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and n_mcu and n_mcu % dri == 0:
                reader.sync_restart()
            n_mcu += 1
            for c in scan:
                arr = coefstore[c["cid"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        if reader.receive(1):
                            arr[my * c["v"] + by, mx * c["h"] + bx, 0] |= bit


def _prog_ac_first(reader, arr, bh, bw, ss, se, al, ac_tab, dri):
    """First AC pass of a band: baseline-style (run, size) symbols plus
    EOBn codes — (r<<4) with r>0 reads r extension bits and skips
    2^r - 1 + ext FOLLOWING blocks whose band is entirely zero.

    The reader's accumulator state is hoisted into LOCAL ints for the
    whole scan, the same ~2.5x pattern _decode_block uses (round-9
    probe): one Python call per symbol is still too many when a scan
    visits every block of a plane. Bit semantics are identical to the
    _BitReader methods; exactness is pinned by the progressive==baseline
    parity suite."""
    acv, acl = ac_tab
    eobrun = 0
    nblk = 0
    cur = reader._cur
    L = len(cur)
    pos, acc, n, padded = (
        reader._pos, reader._acc, reader._n, reader._padded
    )
    for by in range(bh):
        for bx in range(bw):
            if dri and nblk and nblk % dri == 0:
                reader._pos, reader._acc = pos, acc
                reader._n, reader._padded = n, padded
                reader.sync_restart()
                cur = reader._cur
                L = len(cur)
                pos, acc, n, padded = (
                    reader._pos, reader._acc, reader._n, reader._padded
                )
                eobrun = 0
            nblk += 1
            if eobrun:
                eobrun -= 1
                continue
            blk = arr[by, bx]
            k = ss
            while k <= se:
                while n < 16:
                    if pos < L:
                        acc = (acc << 8) | cur[pos]
                        pos += 1
                    else:
                        acc = (acc << 8) | 0xFF
                        padded += 8
                    n += 8
                w = (acc >> (n - 16)) & 0xFFFF
                ln = acl[w]
                if ln == 0:
                    raise NotImplementedError("invalid JPEG Huffman code")
                rs = acv[w]
                n -= ln
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r == 15:  # ZRL: sixteen zeros
                        acc &= (1 << n) - 1
                        k += 16
                        continue
                    eobrun = (1 << r) - 1
                    if r:
                        while n < r:
                            if pos < L:
                                acc = (acc << 8) | cur[pos]
                                pos += 1
                            else:
                                acc = (acc << 8) | 0xFF
                                padded += 8
                            n += 8
                        n -= r
                        eobrun += (acc >> n) & ((1 << r) - 1)
                    acc &= (1 << n) - 1
                    break
                k += r
                if k > se:
                    raise NotImplementedError("JPEG AC run past band end")
                while n < s:
                    if pos < L:
                        acc = (acc << 8) | cur[pos]
                        pos += 1
                    else:
                        acc = (acc << 8) | 0xFF
                        padded += 8
                    n += 8
                n -= s
                v = (acc >> n) & ((1 << s) - 1)
                if v < (1 << (s - 1)):
                    v += 1 - (1 << s)
                blk[k] = v << al
                acc &= (1 << n) - 1
                k += 1
            acc &= (1 << n) - 1
            if n < padded:
                raise NotImplementedError("truncated JPEG entropy data")
    reader._pos, reader._acc, reader._n, reader._padded = (
        pos, acc, n, padded
    )


def _prog_ac_refine(reader, arr, bh, bw, ss, se, al, ac_tab, dri):
    """AC refinement (G.2, correction-bit flow): every already-nonzero
    coefficient traversed reads one correction bit; symbols with s=1
    plant a newly-nonzero ±2^al after a run of zero-HISTORY positions;
    EOB runs still read correction bits for nonzero coefficients in the
    remaining band of every block they cover."""
    p1, m1 = 1 << al, -(1 << al)
    acv, acl = ac_tab
    eobrun = 0
    nblk = 0
    cur = reader._cur
    L = len(cur)
    pos, acc, n, padded = (
        reader._pos, reader._acc, reader._n, reader._padded
    )
    # state hoisted into locals for the whole scan, as in _prog_ac_first:
    # refinement reads ONE BIT per traversed nonzero coefficient, the
    # worst per-call-overhead shape of all the scan kinds
    for by in range(bh):
        for bx in range(bw):
            if dri and nblk and nblk % dri == 0:
                reader._pos, reader._acc = pos, acc
                reader._n, reader._padded = n, padded
                reader.sync_restart()
                cur = reader._cur
                L = len(cur)
                pos, acc, n, padded = (
                    reader._pos, reader._acc, reader._n, reader._padded
                )
                eobrun = 0
            nblk += 1
            # numpy scalar reads cost ~10x a list index and refinement
            # touches EVERY band position of EVERY block: one tolist()
            # per block (C-speed) + one write-back beats 63 scalar reads
            blk = arr[by, bx].tolist()
            k = ss
            if eobrun == 0:
                while k <= se:
                    while n < 16:
                        if pos < L:
                            acc = (acc << 8) | cur[pos]
                            pos += 1
                        else:
                            acc = (acc << 8) | 0xFF
                            padded += 8
                        n += 8
                    w = (acc >> (n - 16)) & 0xFFFF
                    ln = acl[w]
                    if ln == 0:
                        raise NotImplementedError(
                            "invalid JPEG Huffman code"
                        )
                    rs = acv[w]
                    n -= ln
                    r, s = rs >> 4, rs & 0x0F
                    val = 0
                    if s == 0:
                        if r != 15:
                            eobrun = 1 << r
                            if r:
                                while n < r:
                                    if pos < L:
                                        acc = (acc << 8) | cur[pos]
                                        pos += 1
                                    else:
                                        acc = (acc << 8) | 0xFF
                                        padded += 8
                                    n += 8
                                n -= r
                                eobrun += (acc >> n) & ((1 << r) - 1)
                            acc &= (1 << n) - 1
                            break
                        # r == 15: a run of 16 zero-history positions
                    else:
                        if s != 1:
                            raise NotImplementedError(
                                "invalid JPEG AC refinement code"
                            )
                        if n < 1:
                            if pos < L:
                                acc = (acc << 8) | cur[pos]
                                pos += 1
                            else:
                                acc = (acc << 8) | 0xFF
                                padded += 8
                            n += 8
                        n -= 1
                        val = p1 if (acc >> n) & 1 else m1
                    while k <= se:
                        v = blk[k]
                        if v != 0:
                            if n < 1:
                                if pos < L:
                                    acc = (acc << 8) | cur[pos]
                                    pos += 1
                                else:
                                    acc = (acc << 8) | 0xFF
                                    padded += 8
                                n += 8
                            n -= 1
                            if (acc >> n) & 1 and (v & p1) == 0:
                                blk[k] = v + (p1 if v >= 0 else m1)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if val and k <= se:
                        blk[k] = val
                    k += 1
            if eobrun > 0:
                while k <= se:
                    v = blk[k]
                    if v != 0:
                        if n < 1:
                            if pos < L:
                                acc = (acc << 8) | cur[pos]
                                pos += 1
                            else:
                                acc = (acc << 8) | 0xFF
                                padded += 8
                            n += 8
                        n -= 1
                        if (acc >> n) & 1 and (v & p1) == 0:
                            blk[k] = v + (p1 if v >= 0 else m1)
                    k += 1
                eobrun -= 1
            arr[by, bx] = blk
            acc &= (1 << n) - 1
            if n < padded:
                raise NotImplementedError("truncated JPEG entropy data")
    reader._pos, reader._acc, reader._n, reader._padded = (
        pos, acc, n, padded
    )


def _reconstruct_progressive(comps, coefstore, qtables, h_img, w_img,
                             prec=8):
    """Coefficients → pixels, once, after the last scan — the same
    dequant + batched-IDCT + upsample + color-convert math as the
    baseline path, so a full progressive stream decodes bit-identically
    to its baseline twin."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    level = float(1 << (prec - 1))
    down = float(1 << (prec - 8))
    up = {}
    for c in comps:
        if c["tq"] not in qtables:
            raise NotImplementedError("JPEG component without quant table")
        arr = coefstore[c["cid"]]
        by, bx = arr.shape[:2]
        zz = arr.reshape(-1, 64).astype(np.float64)
        nat = np.empty_like(zz)
        nat[:, ZIGZAG] = zz  # zigzag storage -> natural order
        nat *= qtables[c["tq"]]
        px = _D.T @ nat.reshape(-1, 8, 8) @ _D + level
        plane = (
            px.reshape(by, bx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(by * 8, bx * 8)
        )
        if down != 1.0:
            plane = plane / down
        plane = np.repeat(plane, vmax // c["v"], axis=0)
        plane = np.repeat(plane, hmax // c["h"], axis=1)
        up[c["cid"]] = plane[:h_img, :w_img]
    if len(comps) == 1:
        g = np.clip(up[comps[0]["cid"]] + 0.5, 0, 255).astype(np.uint8)
        return np.repeat(g[..., None], 3, axis=2)
    y, cb, cr = (up[c["cid"]] for c in comps)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.stack([r, g, b], axis=2) + 0.5, 0, 255
    ).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _quality_scale(base: "np.ndarray", quality: int) -> "np.ndarray":
    """IJG quality scaling: 1..100 → per-entry divisors in [1, 255]."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * scale + 50) // 100, 1, 255)


def _encode_block(
    writer: _BitWriter,
    block: "np.ndarray",
    qt: "np.ndarray",
    pred: float,
    dc_tab: dict,
    ac_tab: dict,
    level: float = 128.0,
    cmax: int = 1023,
) -> int:
    """FDCT + quantize + Huffman one 8×8 block; returns the new DC value.

    AC coefficients clamp to ±1023, the largest baseline Huffman category
    (10 bits). Unreachable for uint8 input — the worst case is the
    (4,4)-basis-matched sign pattern at quality 100 (divisors 1), which
    lands at 127·4 + 128·4 = ±1020 — but the ceiling is a format
    invariant, not an input property, so it is enforced rather than
    assumed (a float-pixel caller or a future rounding tweak must degrade
    by 1 LSB, not KeyError on an unencodable category)."""
    f = _D @ (block - level) @ _D.T
    q = np.clip(np.round(f.reshape(64) / qt), -cmax, cmax).astype(np.int64)
    dc = int(q[0])
    diff = dc - int(pred)
    t = int(diff != 0 and abs(diff).bit_length())
    code, ln = dc_tab[t]
    writer.write(code, ln)
    if t:
        writer.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    zz = q[ZIGZAG][1:]  # AC in zigzag order
    nz = np.nonzero(zz)[0]
    last = nz[-1] + 1 if len(nz) else 0
    run = 0
    for i in range(last):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            writer.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        code, ln = ac_tab[(run << 4) | s]
        writer.write(code, ln)
        writer.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = ac_tab[0x00]  # EOB
        writer.write(code, ln)
    return dc


def _pad_to(plane: "np.ndarray", mult_y: int, mult_x: int) -> "np.ndarray":
    h, w = plane.shape
    ph = (-h) % mult_y
    pw = (-w) % mult_x
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _dqt_seg(tq: int, nat: "np.ndarray") -> bytes:
    return _seg(0xDB, bytes([tq]) + nat[ZIGZAG].astype(np.uint8).tobytes())


def _dht_seg(tc: int, th: int, bits: list, vals: list) -> bytes:
    return _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))


def _prepare_planes(arr: "np.ndarray", quality: int, subsample):
    """Shared encoder prologue: RGB→YCbCr, padding, chroma downsample,
    quality-scaled quant tables. Returns (y, cb, cr, sh, sv, qt_l, qt_c);
    planes are float64, padded to full MCUs, chroma already subsampled."""
    h, w, c = arr.shape
    if c != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8 (h, w, 3) RGB")
    rgb = arr.astype(np.float64)
    y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    cb = (
        -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1]
        + 0.5 * rgb[..., 2] + 128.0
    )
    cr = (
        0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1]
        - 0.081312 * rgb[..., 2] + 128.0
    )
    if subsample is True:
        sh = sv = 2  # 4:2:0
    elif subsample:
        sh, sv = subsample  # explicit (h, v) pair, e.g. (2, 1) = 4:2:2
    else:
        sh = sv = 1  # 4:4:4
    if sh not in (1, 2) or sv not in (1, 2):
        raise ValueError("subsample factors must be 1 or 2")
    qt_l = _quality_scale(_QT_LUMA, quality).astype(np.float64)
    qt_c = _quality_scale(_QT_CHROMA, quality).astype(np.float64)
    y = _pad_to(y, 8 * sv, 8 * sh)
    cb = _pad_to(cb, 8 * sv, 8 * sh)
    cr = _pad_to(cr, 8 * sv, 8 * sh)
    if sh > 1 or sv > 1:  # block-mean chroma downsample
        cb = cb.reshape(
            cb.shape[0] // sv, sv, cb.shape[1] // sh, sh
        ).mean((1, 3))
        cr = cr.reshape(
            cr.shape[0] // sv, sv, cr.shape[1] // sh, sh
        ).mean((1, 3))
    return y, cb, cr, sh, sv, qt_l, qt_c


def encode_jpeg(
    arr: "np.ndarray",
    quality: int = 90,
    subsample=False,
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF bytes from a uint8 (h, w, 3) RGB array.

    ``subsample=False`` → 4:4:4; ``True`` → 4:2:0 (chroma block-mean
    2×2 downsample, the common camera layout — exercises the decoder's
    multi-block MCU path); an explicit ``(h, v)`` pair gives the other
    layouts — ``(2, 1)`` is 4:2:2, ``(1, 2)`` its transpose — so every
    sampling geometry the decoder claims is encoder-reachable and
    round-trip-tested. ``restart_interval=N`` writes a DRI segment
    and an RSTn marker every N MCUs (resetting the DC predictors), the
    layout real encoders use for error resilience — and the only way to
    exercise the decoder's restart path without an external encoder.
    Standard Annex-K quant (scaled by ``quality``) and Huffman tables,
    written explicitly as DQT/DHT so any baseline decoder can read the
    stream.
    """
    h, w, _c = arr.shape
    y, cb, cr, sh, sv, qt_l, qt_c = _prepare_planes(arr, quality, subsample)

    enc_dc_l = _build_encode_table(_DC_LUMA_BITS, _DC_LUMA_VALS)
    enc_ac_l = _build_encode_table(_AC_LUMA_BITS, _AC_LUMA_VALS)
    enc_dc_c = _build_encode_table(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    enc_ac_c = _build_encode_table(_AC_CHROMA_BITS, _AC_CHROMA_VALS)

    writer = _BitWriter()
    mcus_y = y.shape[0] // (8 * sv)
    mcus_x = y.shape[1] // (8 * sh)
    pred = {"y": 0, "cb": 0, "cr": 0}
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                writer.marker(0xD0 + (n_mcu // restart_interval - 1) % 8)
                pred = {"y": 0, "cb": 0, "cr": 0}
            n_mcu += 1
            for by in range(sv):
                for bx in range(sh):
                    y0, x0 = (my * sv + by) * 8, (mx * sh + bx) * 8
                    pred["y"] = _encode_block(
                        writer, y[y0 : y0 + 8, x0 : x0 + 8], qt_l,
                        pred["y"], enc_dc_l, enc_ac_l,
                    )
            for name, plane in (("cb", cb), ("cr", cr)):
                y0, x0 = my * 8, mx * 8
                pred[name] = _encode_block(
                    writer, plane[y0 : y0 + 8, x0 : x0 + 8], qt_c,
                    pred[name], enc_dc_c, enc_ac_c,
                )
    writer.flush()

    app0 = _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    sof = _seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, (sh << 4) | sv, 0])  # Y
        + bytes([2, 0x11, 1])  # Cb
        + bytes([3, 0x11, 1]),  # Cr
    )
    sos = _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    dri = (
        _seg(0xDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    return (
        b"\xff\xd8"
        + app0
        + _dqt_seg(0, qt_l)
        + _dqt_seg(1, qt_c)
        + dri
        + sof
        + _dht_seg(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
        + _dht_seg(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
        + _dht_seg(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
        + _dht_seg(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)
        + sos
        + bytes(writer.buf)
        + b"\xff\xd9"
    )


# ---------------------------------------------------------------------------
# Progressive encoder (T.81 Annex G.1)
# ---------------------------------------------------------------------------
#
# Carries EXACTLY the quantized coefficients the baseline encoder would —
# split across a ten-scan script that exercises every progressive decoder
# path: an interleaved DC-first scan with a point transform, per-component
# spectral-selection AC bands (luma split 1-5 / 6-63), successive
# approximation with real refinement scans (DC raw bits, AC correction-bit
# flow), genuine EOB runs, ZRL inside refinement, DHT between scans, and
# optional restart markers in every scan kind. AC scans use one uniform
# 256-symbol Huffman table (255 codes at 8 bits + one at 9; canonical, no
# all-ones code) — compression is not the point here, but EOBn symbols
# (r<<4, r>0) are NOT in the Annex-K baseline tables, and without them an
# encoder can never produce the EOB-run and correction-bit-tail paths a
# real progressive decoder must handle. tests/test_jpeg_codec.py pins
# decode(progressive) == decode(baseline) bit-for-bit at equal quality.

_AC_PROG_BITS = [0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0, 0]
_AC_PROG_VALS = list(range(256))


def _quantize_plane(plane: "np.ndarray", qt: "np.ndarray") -> "np.ndarray":
    """(by, bx, 64) int64 quantized coefficients in ZIGZAG order — the
    same FDCT/quantize/clip math as _encode_block, batched."""
    by, bx = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = (
        plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    f = _D @ (blocks - 128.0) @ _D.T
    q = np.clip(np.round(f.reshape(-1, 64) / qt), -1023, 1023).astype(
        np.int64
    )
    return q[:, ZIGZAG].reshape(by, bx, 64)


def _emit_mag(writer: _BitWriter, v: int, s: int) -> None:
    writer.write(v if v > 0 else v + (1 << s) - 1, s)


def _emit_dc_first_scan(writer, comps, qz, mcus_y, mcus_x, al, enc_dc, dri):
    preds = {c["cid"]: 0 for c in comps}
    n = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and n and n % dri == 0:
                writer.marker(0xD0 + (n // dri - 1) % 8)
                preds = {c["cid"]: 0 for c in comps}
            n += 1
            for c in comps:
                tab = enc_dc[c["td"]]
                arr = qz[c["cid"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        dc = (
                            int(arr[my * c["v"] + by, mx * c["h"] + bx, 0])
                            >> al  # arithmetic shift: the DC point transform
                        )
                        diff = dc - preds[c["cid"]]
                        preds[c["cid"]] = dc
                        t = abs(diff).bit_length() if diff else 0
                        code, ln = tab[t]
                        writer.write(code, ln)
                        if t:
                            _emit_mag(writer, diff, t)


def _emit_dc_refine_scan(writer, comps, qz, mcus_y, mcus_x, al, dri):
    n = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and n and n % dri == 0:
                writer.marker(0xD0 + (n // dri - 1) % 8)
            n += 1
            for c in comps:
                arr = qz[c["cid"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        dc = int(arr[my * c["v"] + by, mx * c["h"] + bx, 0])
                        writer.write((dc >> al) & 1, 1)


def _emit_ac_first_scan(writer, arr, bh, bw, ss, se, al, enc_ac, dri):
    eobrun = 0

    def flush() -> None:
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            code, ln = enc_ac[r << 4]
            writer.write(code, ln)
            if r:
                writer.write(eobrun & ((1 << r) - 1), r)
            eobrun = 0

    n = 0
    for by in range(bh):
        for bx in range(bw):
            if dri and n and n % dri == 0:
                flush()
                writer.marker(0xD0 + (n // dri - 1) % 8)
            n += 1
            blk = arr[by, bx]
            vals = []
            for k in range(ss, se + 1):
                v = int(blk[k])
                # AC point transform shifts the MAGNITUDE (G.1.1.2.2)
                vals.append(-((-v) >> al) if v < 0 else v >> al)
            nz = [i for i, v in enumerate(vals) if v]
            if not nz:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush()
                continue
            flush()
            run = 0
            for i in range(nz[-1] + 1):
                v = vals[i]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = enc_ac[0xF0]
                    writer.write(code, ln)
                    run -= 16
                s = abs(v).bit_length()
                code, ln = enc_ac[(run << 4) | s]
                writer.write(code, ln)
                _emit_mag(writer, v, s)
                run = 0
            if nz[-1] + 1 < len(vals):
                eobrun += 1  # trailing zeros open (or extend) an EOB run
                if eobrun == 0x7FFF:
                    flush()
    flush()


def _emit_ac_refine_scan(writer, arr, bh, bw, ss, se, al, enc_ac, dri):
    eobrun = 0
    pending: list[int] = []  # correction bits owed after the next EOBn

    def flush() -> None:
        nonlocal eobrun, pending
        if eobrun:
            r = eobrun.bit_length() - 1
            code, ln = enc_ac[r << 4]
            writer.write(code, ln)
            if r:
                writer.write(eobrun & ((1 << r) - 1), r)
            eobrun = 0
        for b in pending:
            writer.write(b, 1)
        pending = []

    n = 0
    for by in range(bh):
        for bx in range(bw):
            if dri and n and n % dri == 0:
                flush()
                writer.marker(0xD0 + (n // dri - 1) % 8)
            n += 1
            blk = arr[by, bx]
            ab = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
            eob_rel = 0  # 1 + last NEWLY-nonzero position, 0 if none
            for i, a in enumerate(ab):
                if a == 1:
                    eob_rel = i + 1
            run = 0
            corr: list[int] = []  # this block's buffered correction bits
            for i, a in enumerate(ab):
                if a == 0:
                    run += 1
                    continue
                while run > 15 and i < eob_rel:
                    flush()
                    code, ln = enc_ac[0xF0]
                    writer.write(code, ln)
                    run -= 16
                    for b in corr:
                        writer.write(b, 1)
                    corr = []
                if a > 1:  # history coefficient: buffer its next bit
                    corr.append(a & 1)
                    continue
                # a == 1: newly nonzero (always before eob_rel)
                flush()
                code, ln = enc_ac[(run << 4) | 1]
                writer.write(code, ln)
                run = 0
                writer.write(0 if int(blk[ss + i]) < 0 else 1, 1)
                for b in corr:
                    writer.write(b, 1)
                corr = []
            if run > 0 or corr:
                eobrun += 1
                pending.extend(corr)
                if eobrun == 0x7FFF:
                    flush()
    flush()


def encode_jpeg_progressive(
    arr: "np.ndarray",
    quality: int = 90,
    subsample=False,
    restart_interval: int = 0,
) -> bytes:
    """Progressive (SOF2) JFIF bytes from a uint8 (h, w, 3) RGB array.

    Same colorimetry, quantization, and subsampling options as
    ``encode_jpeg`` — the stream carries identical coefficients, split
    across the ten-scan script documented above, so ``decode_jpeg`` of
    the two encodings is bit-identical. ``restart_interval=N`` writes a
    DRI segment and RSTn markers every N MCUs in EVERY scan (where an
    MCU of a non-interleaved scan is one block), resetting DC
    predictors and EOB runs as the spec requires.
    """
    h, w, _c = arr.shape
    y, cb, cr, sh, sv, qt_l, qt_c = _prepare_planes(arr, quality, subsample)
    qz = {
        1: _quantize_plane(y, qt_l),
        2: _quantize_plane(cb, qt_c),
        3: _quantize_plane(cr, qt_c),
    }
    comps = [
        {"cid": 1, "h": sh, "v": sv, "td": 0},
        {"cid": 2, "h": 1, "v": 1, "td": 1},
        {"cid": 3, "h": 1, "v": 1, "td": 1},
    ]
    enc_dc = {
        0: _build_encode_table(_DC_LUMA_BITS, _DC_LUMA_VALS),
        1: _build_encode_table(_DC_CHROMA_BITS, _DC_CHROMA_VALS),
    }
    enc_ac = _build_encode_table(_AC_PROG_BITS, _AC_PROG_VALS)
    mcus_y = y.shape[0] // (8 * sv)
    mcus_x = y.shape[1] // (8 * sh)
    grids = {c["cid"]: _comp_blocks(c, comps, h, w) for c in comps}
    dri = restart_interval

    def sos_seg(scan_comps, ss, se, ah, al) -> bytes:
        body = bytes([len(scan_comps)])
        for c in scan_comps:
            body += bytes([c["cid"], (c["td"] << 4) | 0])
        return _seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    def scan(scan_comps, ss, se, ah, al) -> bytes:
        wr = _BitWriter()
        if ss == 0:
            if ah == 0:
                _emit_dc_first_scan(
                    wr, scan_comps, qz, mcus_y, mcus_x, al, enc_dc, dri
                )
            else:
                _emit_dc_refine_scan(
                    wr, scan_comps, qz, mcus_y, mcus_x, al, dri
                )
        else:
            c = scan_comps[0]
            bh, bw = grids[c["cid"]]
            if ah == 0:
                _emit_ac_first_scan(
                    wr, qz[c["cid"]], bh, bw, ss, se, al, enc_ac, dri
                )
            else:
                _emit_ac_refine_scan(
                    wr, qz[c["cid"]], bh, bw, ss, se, al, enc_ac, dri
                )
        wr.flush()
        return sos_seg(scan_comps, ss, se, ah, al) + bytes(wr.buf)

    yc, cbc, crc = comps
    sof = _seg(
        0xC2,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, (sh << 4) | sv, 0])
        + bytes([2, 0x11, 1])
        + bytes([3, 0x11, 1]),
    )
    return (
        b"\xff\xd8"
        + _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + _dqt_seg(0, qt_l)
        + _dqt_seg(1, qt_c)
        + (_seg(0xDD, struct.pack(">H", dri)) if dri else b"")
        + sof
        + _dht_seg(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
        + _dht_seg(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
        + scan(comps, 0, 0, 0, 1)  # DC first, Al=1, interleaved
        # the AC table arrives BETWEEN scans — decoders must accept
        # DHT/DQT/DRI segments mid-stream (B.2.4)
        + _dht_seg(1, 0, _AC_PROG_BITS, _AC_PROG_VALS)
        + scan([yc], 1, 5, 0, 2)  # Y low band first, Al=2
        + scan([cbc], 1, 63, 0, 1)  # Cb full band first, Al=1
        + scan([crc], 1, 63, 0, 1)  # Cr full band first, Al=1
        + scan([yc], 6, 63, 0, 2)  # Y high band first, Al=2
        + scan([yc], 1, 63, 2, 1)  # Y AC refine 2 -> 1
        + scan(comps, 0, 0, 1, 0)  # DC refine, interleaved
        + scan([cbc], 1, 63, 1, 0)  # Cb AC refine -> full precision
        + scan([crc], 1, 63, 1, 0)  # Cr AC refine -> full precision
        + scan([yc], 1, 63, 1, 0)  # Y AC refine -> full precision
        + b"\xff\xd9"
    )


# ---------------------------------------------------------------------------
# 12-bit extended sequential encoder (T.81 SOF1, 16-bit DQT)
# ---------------------------------------------------------------------------
#
# Exists so the decoder's 12-bit and 16-bit-quant-table paths are
# encoder-reachable without an external library (the same reason every
# other codec here carries its writer). Input stays uint8 RGB: samples
# scale to the 12-bit domain (<<4) and the Annex-K quant tables scale
# with them (x16, which genuinely needs 16-bit DQT entries) — so the
# quantized coefficients EQUAL the 8-bit baseline pipeline's, and the
# decoded output must match the baseline decode to within 1 count (the
# >>4 output rescale rounding). Huffman: 12-bit DC differences span
# categories 0..15 and AC sizes 0..14, beyond the Annex-K tables, so the
# scan uses the uniform tables (_DC_EXT for DC, _AC_PROG for AC).

_DC_EXT_BITS = [0, 0, 0, 15, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_EXT_VALS = list(range(16))


def encode_jpeg_12bit(
    arr: "np.ndarray", quality: int = 90, subsample=False
) -> bytes:
    """12-bit extended sequential (SOF1) JFIF bytes from uint8 RGB."""
    h, w, _c = arr.shape
    y, cb, cr, sh, sv, qt_l, qt_c = _prepare_planes(arr, quality, subsample)
    y, cb, cr = y * 16.0, cb * 16.0, cr * 16.0  # 8-bit -> 12-bit domain
    qt_l16, qt_c16 = qt_l * 16.0, qt_c * 16.0
    enc_dc = _build_encode_table(_DC_EXT_BITS, _DC_EXT_VALS)
    enc_ac = _build_encode_table(_AC_PROG_BITS, _AC_PROG_VALS)
    writer = _BitWriter()
    mcus_y = y.shape[0] // (8 * sv)
    mcus_x = y.shape[1] // (8 * sh)
    pred = {"y": 0, "cb": 0, "cr": 0}
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for by in range(sv):
                for bx in range(sh):
                    y0, x0 = (my * sv + by) * 8, (mx * sh + bx) * 8
                    pred["y"] = _encode_block(
                        writer, y[y0 : y0 + 8, x0 : x0 + 8], qt_l16,
                        pred["y"], enc_dc, enc_ac,
                        level=2048.0, cmax=16383,
                    )
            for name, plane in (("cb", cb), ("cr", cr)):
                y0, x0 = my * 8, mx * 8
                pred[name] = _encode_block(
                    writer, plane[y0 : y0 + 8, x0 : x0 + 8], qt_c16,
                    pred[name], enc_dc, enc_ac,
                    level=2048.0, cmax=16383,
                )
    writer.flush()

    def dqt16(tq: int, nat: "np.ndarray") -> bytes:
        zz = nat[ZIGZAG].astype(">u2").tobytes()
        return _seg(0xDB, bytes([0x10 | tq]) + zz)

    sof = _seg(
        0xC1,
        struct.pack(">BHHB", 12, h, w, 3)
        + bytes([1, (sh << 4) | sv, 0])
        + bytes([2, 0x11, 1])
        + bytes([3, 0x11, 1]),
    )
    sos = _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    return (
        b"\xff\xd8"
        + _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + dqt16(0, qt_l16)
        + dqt16(1, qt_c16)
        + sof
        + _dht_seg(0, 0, _DC_EXT_BITS, _DC_EXT_VALS)
        + _dht_seg(1, 0, _AC_PROG_BITS, _AC_PROG_VALS)
        + sos
        + bytes(writer.buf)
        + b"\xff\xd9"
    )
