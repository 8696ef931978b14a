"""FLAC codec — pure Python + numpy, no audio library.

Round 11's audio-format seam. FLAC was chosen over the VERDICT-suggested
MP3 deliberately: MPEG-1 audio decode requires large normative constant
tables from ISO/IEC 11172-3 (the 512-coefficient synthesis window, 34
Huffman code tables) that are not derivable from structure and are not
available in this container — an implementation with approximated tables
would decode our own frames and silently mis-decode every real file,
which is worse than the documented seam. FLAC has NO memorized tables:
predictor coefficients, Rice parameters, block sizes, and channel
decorrelation modes are all carried in-stream, so the whole format is
implementable from the public bitstream layout (RFC 9639 / the
flac-format spec) — and it is lossless, so round-trips are BIT-EXACT,
the same test contract as the GIF/PNG/WebP twins.

Decoder surface (``decode_flac_pcm`` — full fidelity):

- STREAMINFO + skipped metadata blocks (padding/comment/seektable/...),
- frame headers: all block-size codes (192 / 576·2^n / 256·2^n and the
  8/16-bit explicit forms), all sample-rate codes (tabled + 8-bit kHz /
  16-bit Hz / 16-bit daHz), UTF-8-coded frame numbers, CRC-8 verified,
- sample depths 8/12/16/20/24/32, wasted-bits-per-sample shifting,
- channel assignments: 1..8 independent channels plus the three
  decorrelated stereo modes (left-side / right-side / mid-side, the
  side channel at +1 bit depth, mid reconstructed with the carried LSB),
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4 (inverted as
  ``order`` numpy integrations, not a scalar loop), and LPC at any
  order 1-32 (in-stream quantized coefficients + signed shift),
- residuals: both Rice methods (4- and 5-bit parameters), sub-block
  partitioning at any order, and escaped raw-binary partitions,
- CRC-16 per frame and the STREAMINFO MD5 over the decoded PCM — both
  verified, so corrupt payloads quarantine instead of returning noise.

The encoder exists so the decoder is round-trip-testable without an
external library (same contract as the image twins): fixed predictors
with per-channel order search PLUS quantized-LPC candidates at orders
2/4/8 (Levinson-Durbin over the block autocorrelation, error-feedback
coefficient quantization — residuals computed in exact integer
arithmetic, so LPC frames stay lossless), exact per-partition Rice
parameter choice (with raw-escape fallback), per-frame stereo-mode
search across independent/left-side/right-side/mid-side (so round-trips
exercise every decorrelation AND every subframe path),
CONSTANT/VERBATIM fallbacks, and 8/16/24-bit
depths. ``decode_flac_pcm(encode_flac(x)) == x`` bit-exactly for every
int array that fits the declared depth; the tests also pin the decoder
against hand-assembled bitstreams written bit by bit from the spec
text, independent of this encoder.

``decode_flac`` (the ``features_for`` entry point) normalizes to the
pipeline's audio feature contract exactly like ``decode_wav``: int16
domain via the top 16 bits, multi-channel downmixed to channel 0.

Remaining audio seams (documented refusals, callers quarantine): MP3 /
Vorbis / Opus (normative-table codecs, see above) and float PCM.

Scale note (same as the other codecs): per-sample Rice decoding is a
Python loop over numpy bit arrays — fine for test-table media; a 100 TB
pipeline decodes in a native library at this seam. The surrounding
``mapInPandas`` plumbing (Arrow batches, partition invariance) is what
scales, and it is shared with the real codecs above.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

# ---------------------------------------------------------------------------
# CRCs (tables computed at import from the public generator polynomials —
# nothing memorized beyond the polynomial, which the frame layout names)


def _crc_table(poly: int, width: int) -> "np.ndarray":
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tab = np.zeros(256, dtype=np.uint32)
    for byte in range(256):
        reg = byte << (width - 8)
        for _ in range(8):
            reg = ((reg << 1) ^ poly) if reg & top else (reg << 1)
        tab[byte] = reg & mask
    return tab


_CRC8_TAB = _crc_table(0x07, 8)  # x^8 + x^2 + x + 1
_CRC16_TAB = _crc_table(0x8005, 16)  # x^16 + x^15 + x^2 + 1
# plain tuples for the per-byte loops: a numpy scalar fetch costs ~5x a
# tuple index, and these run once per frame byte (round 12)
_CRC8_LIST = tuple(int(v) for v in _CRC8_TAB)
_CRC16_LIST = tuple(int(v) for v in _CRC16_TAB)


def _crc8(data: bytes) -> int:
    reg = 0
    tab = _CRC8_LIST
    for b in data:
        reg = tab[reg ^ b]
    return reg


def _crc16(data: bytes) -> int:
    reg = 0
    tab = _CRC16_LIST
    for b in data:
        reg = ((reg << 8) & 0xFFFF) ^ tab[(reg >> 8) ^ b]
    return reg


# ---------------------------------------------------------------------------
# bit I/O

_POW2 = (1 << np.arange(63, -1, -1, dtype=np.int64)).astype(np.int64)


class _BitReader:
    """MSB-first reader over a numpy bit array with a precomputed index of
    set bits, so Rice unary prefixes are O(log n) lookups instead of
    bit-at-a-time scans."""

    def __init__(self, data: bytes):
        self.data = data
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.ones = np.flatnonzero(self.bits)
        self._ones_list = None  # lazy plain-int copy for the Rice hot loop
        self.pos = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        end = self.pos + n
        if end > self.bits.size:
            raise NotImplementedError("truncated FLAC stream")
        seg = self.bits[self.pos : end].astype(np.int64)
        self.pos = end
        return int(seg @ _POW2[-n:])

    def read_signed(self, n: int) -> int:
        u = self.read(n)
        return u - (1 << n) if u >= (1 << (n - 1)) else u

    def read_signed_array(self, n: int, count: int) -> "np.ndarray":
        """``count`` consecutive n-bit two's-complement values, vectorized."""
        if count == 0:
            return np.zeros(0, dtype=np.int64)
        if n == 0:
            return np.zeros(count, dtype=np.int64)
        end = self.pos + n * count
        if end > self.bits.size:
            raise NotImplementedError("truncated FLAC stream")
        seg = self.bits[self.pos : end].astype(np.int64).reshape(count, n)
        self.pos = end
        u = seg @ _POW2[-n:]
        return np.where(u >= np.int64(1) << (n - 1), u - (np.int64(1) << n), u)

    def unary(self) -> int:
        """Number of 0 bits before the next 1 bit (which is consumed)."""
        i = int(np.searchsorted(self.ones, self.pos))
        if i >= self.ones.size:
            raise NotImplementedError("truncated FLAC stream")
        nxt = int(self.ones[i])
        q = nxt - self.pos
        self.pos = nxt + 1
        return q

    def read_rice_array(self, k: int, count: int) -> "np.ndarray":
        """``count`` Rice(k) codes → signed values (zigzag undone).

        Fully vectorized (round 12): a Rice stream is a chain over the
        set-bit index — sample j's unary terminator is the first one-bit
        at/after its start, and the next start is terminator + 1 + k, so
        the successor map ``f[i] = searchsorted(ones, ones[i] + 1 + k)``
        sends each terminator to the next. The terminator sequence is the
        orbit of f from the partition start, enumerated with log2(count)
        vectorized gathers by pointer doubling (orbit[j + 2^m] =
        f^(2^m)[orbit[j]]). The map is built on a bounded slice of the
        ones index — a partition consumes at most count terminators plus
        count·k payload one-bits, so count·(k+1)+1 entries suffice — and
        a sentinel self-loop marks exhaustion (truncated stream). Payload
        bits gather as a (count, k) matrix @ powers-of-two. Measured
        ~0.06 µs/sample vs ~0.5 µs for the round-11 python-int loop (the
        previous form survives as _read_rice_scalar for quotients big
        enough to overflow int64)."""
        if count == 0:
            return np.zeros(0, dtype=np.int64)
        pos = self.pos
        nbits = self.bits.size
        i0 = int(np.searchsorted(self.ones, pos))
        sl = self.ones[i0 : i0 + count * (k + 1) + 1].astype(np.int64)
        n = sl.size
        if n == 0:
            raise NotImplementedError("truncated FLAC stream")
        # successor map with a sentinel self-loop at index n
        f = np.searchsorted(sl, sl + 1 + k).astype(np.int64)
        f = np.append(f, n)
        orbit = np.empty(count, dtype=np.int64)
        orbit[0] = 0
        filled = 1
        while filled < count:
            take = min(filled, count - filled)
            orbit[filled : filled + take] = f[orbit[:take]]
            filled += take
            if filled < count:
                f = f[f]
        if int(orbit[-1]) >= n or (count > 1 and int(orbit.max()) >= n):
            raise NotImplementedError("truncated FLAC stream")
        t = sl[orbit]
        starts = np.empty(count, dtype=np.int64)
        starts[0] = pos
        if count > 1:
            starts[1:] = t[:-1] + 1 + k
        q = t - starts
        end = int(t[-1]) + 1 + k
        if end > nbits:
            raise NotImplementedError("truncated FLAC stream")
        if k:
            if int(q.max()) >= 1 << (62 - k):
                return self._read_rice_scalar(k, count)  # int64 would wrap
            low = (
                self.bits[(t + 1)[:, None] + np.arange(k)].astype(np.int64)
                @ _POW2[-k:]
            )
            u = (q << k) | low
        else:
            u = q
        self.pos = end
        return (u >> 1) ^ -(u & 1)

    def _read_rice_scalar(self, k: int, count: int) -> "np.ndarray":
        """Python-int Rice loop (the round-11 form) — the fallback for
        quotients too large for the vectorized int64 path; also the
        differential oracle for the vectorized decoder in
        tests/test_flac_codec.py."""
        if self._ones_list is None:
            self._ones_list = self.ones.tolist()
        ones = self._ones_list
        data, pos = self.data, self.pos
        nbits = self.bits.size
        n_ones = len(ones)
        i = int(np.searchsorted(self.ones, pos))
        out = [0] * count
        mask = (1 << k) - 1
        for j in range(count):
            if i >= n_ones:
                raise NotImplementedError("truncated FLAC stream")
            nxt = ones[i]
            q = nxt - pos
            pos = nxt + 1
            i += 1
            if k:
                end = pos + k
                if end > nbits:
                    raise NotImplementedError("truncated FLAC stream")
                chunk = int.from_bytes(data[pos >> 3 : (end + 7) >> 3], "big")
                u = (q << k) | ((chunk >> (((end + 7) >> 3 << 3) - end)) & mask)
                pos = end
                while i < n_ones and ones[i] < pos:
                    i += 1
            else:
                u = q
            out[j] = (u >> 1) ^ -(u & 1)
        self.pos = pos
        return np.array(out, dtype=np.int64)

    def align(self) -> None:
        self.pos = (self.pos + 7) // 8 * 8

    def byte_pos(self) -> int:
        return self.pos // 8


class _BitWriter:
    """MSB-first writer; header fields land byte-aligned so the CRC-8 can
    be taken over ``buf`` directly."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nb = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nb += n
        while self.nb >= 8:
            self.nb -= 8
            self.buf.append((self.acc >> self.nb) & 0xFF)
        self.acc &= (1 << self.nb) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nb:
            self.write(0, 8 - self.nb)

    def bit_length(self) -> int:
        return 8 * len(self.buf) + self.nb

    def extend(self, other: "_BitWriter") -> None:
        for b in other.buf:
            self.write(b, 8)
        if other.nb:
            self.write(other.acc, other.nb)

    def bytes(self) -> bytes:
        assert self.nb == 0
        return bytes(self.buf)


# ---------------------------------------------------------------------------
# shared tables that ARE structural (enumerated by the header field codes,
# not numeric constants from an annex)

_BLOCKSIZE_CODES = {1: 192}
for _n in range(2, 6):
    _BLOCKSIZE_CODES[_n] = 576 << (_n - 2)
for _n in range(8, 16):
    _BLOCKSIZE_CODES[_n] = 256 << (_n - 8)

_RATE_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_RATE_TO_CODE = {v: k for k, v in _RATE_CODES.items()}

_DEPTH_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
_DEPTH_TO_CODE = {v: k for k, v in _DEPTH_CODES.items()}


def is_flac(payload: bytes) -> bool:
    return len(payload) > 42 and payload[:4] == b"fLaC"


# ---------------------------------------------------------------------------
# decoder


def _parse_streaminfo(body: bytes) -> dict:
    if len(body) < 34:
        raise NotImplementedError("FLAC STREAMINFO truncated")
    min_bs, max_bs = struct.unpack_from(">HH", body, 0)
    packed = int.from_bytes(body[10:18], "big")
    rate = packed >> 44
    channels = ((packed >> 41) & 0x7) + 1
    bps = ((packed >> 36) & 0x1F) + 1
    total = packed & ((1 << 36) - 1)
    return {
        "min_blocksize": min_bs,
        "max_blocksize": max_bs,
        "rate": rate,
        "channels": channels,
        "bps": bps,
        "total_samples": total,
        "md5": body[18:34],
    }


def _read_utf8_number(br: _BitReader) -> int:
    """FLAC's UTF-8-style variable-length number (extended to 36 bits /
    7 bytes for sample numbers)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 1 or n > 6:
        raise NotImplementedError("invalid FLAC UTF-8 number")
    val = b0 & (mask - 1)
    for _ in range(n):
        bx = br.read(8)
        if bx & 0xC0 != 0x80:
            raise NotImplementedError("invalid FLAC UTF-8 continuation")
        val = (val << 6) | (bx & 0x3F)
    return val


def _write_utf8_number(w: _BitWriter, val: int) -> None:
    if val < 0x80:
        w.write(val, 8)
        return
    chunks = []
    n = 0
    v = val
    while True:
        n += 1
        chunks.append(v & 0x3F)
        v >>= 6
        # leading byte holds (7 - n - 1) payload bits behind n+1 set bits
        if v < (1 << (6 - n)) and n < 6:
            break
        if n == 6:
            break
    lead = ((0xFF << (7 - n)) & 0xFF) | v
    w.write(lead, 8)
    for c in reversed(chunks):
        w.write(0x80 | c, 8)


def _unfixed(residual: "np.ndarray", warmup: "np.ndarray", order: int) -> "np.ndarray":
    """Invert an order-k fixed predictor: the residual is the k-th finite
    difference of the signal, so reconstruction is k numpy integrations
    seeded by the warmup's difference pyramid — no scalar loop."""
    if order == 0:
        return residual.astype(np.int64)
    seq = residual.astype(np.int64)
    w = warmup.astype(np.int64)
    for j in range(order, 0, -1):
        d = np.diff(w, n=j - 1) if j > 1 else w
        seq = d[-1] + np.cumsum(seq)
    return np.concatenate([w, seq])


def _unlpc(
    residual: "np.ndarray", warmup: "np.ndarray", coefs: "np.ndarray", shift: int
) -> "np.ndarray":
    """Invert quantized LPC: x[n] = res[n] + (sum c[j]·x[n-1-j]) >> shift.

    Inherently sequential (the arithmetic shift per step is nonlinear, so
    no exact vectorization exists); the recurrence is compiled per frame
    into an unrolled pure-int step function with the quantized
    coefficients and shift inlined as literals — ~5x the per-sample cost
    of a numpy dot over an order-sized slice (round 12; same
    per-sample-loop lesson as read_rice_array). Python ints cannot
    overflow, so the arithmetic matches the int64 dot exactly on any
    conformant stream."""
    order = len(coefs)
    terms = " + ".join(
        f"({int(c)}) * x[-{j + 1}]" for j, c in enumerate(coefs)
    )
    src = (
        "def _step(x, res, ap):\n"
        f"    for r in res:\n"
        f"        ap(r + (({terms}) >> {int(shift)}))\n"
    )
    ns: dict = {}
    exec(src, ns)  # noqa: S102 — literals above are ints from the stream
    x = warmup.astype(np.int64).tolist()
    ns["_step"](x, residual.tolist(), x.append)
    return np.array(x, dtype=np.int64)


def _read_residual(br: _BitReader, block_size: int, order: int) -> "np.ndarray":
    method = br.read(2)
    if method > 1:
        raise NotImplementedError(f"reserved FLAC residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if block_size % nparts or (block_size >> porder) <= order:
        raise NotImplementedError("invalid FLAC rice partition order")
    out = []
    for p in range(nparts):
        count = (block_size >> porder) - (order if p == 0 else 0)
        k = br.read(pbits)
        if k == escape:
            nbits = br.read(5)
            out.append(br.read_signed_array(nbits, count))
        else:
            out.append(br.read_rice_array(k, count))
    return np.concatenate(out) if out else np.zeros(0, dtype=np.int64)


def _read_subframe(br: _BitReader, block_size: int, bps: int) -> "np.ndarray":
    if br.read(1):
        raise NotImplementedError("FLAC subframe padding bit set")
    ftype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise NotImplementedError("FLAC wasted bits exceed sample depth")
    if ftype == 0:  # CONSTANT
        x = np.full(block_size, br.read_signed(eff), dtype=np.int64)
    elif ftype == 1:  # VERBATIM
        x = br.read_signed_array(eff, block_size)
    elif 8 <= ftype <= 12:  # FIXED order 0-4
        order = ftype - 8
        if order > block_size:
            raise NotImplementedError("FLAC fixed order exceeds block size")
        warmup = br.read_signed_array(eff, order)
        res = _read_residual(br, block_size, order)
        x = _unfixed(res, warmup, order)
    elif ftype >= 32:  # LPC order 1-32
        order = (ftype & 0x1F) + 1
        if order > block_size:
            raise NotImplementedError("FLAC LPC order exceeds block size")
        warmup = br.read_signed_array(eff, order)
        precision = br.read(4) + 1
        if precision == 16:
            raise NotImplementedError("invalid FLAC LPC precision code")
        shift = br.read_signed(5)
        if shift < 0:
            raise NotImplementedError("negative FLAC LPC shift")
        coefs = br.read_signed_array(precision, order)
        res = _read_residual(br, block_size, order)
        x = _unlpc(res, warmup, coefs, shift)
    else:
        raise NotImplementedError(f"reserved FLAC subframe type {ftype}")
    return x << wasted if wasted else x


def _read_frame(br: _BitReader, info: dict) -> tuple["np.ndarray", int]:
    """One frame → ((block_size, channels) int64, sample rate)."""
    start_byte = br.byte_pos()
    if br.read(14) != 0x3FFE:
        raise NotImplementedError("bad FLAC frame sync")
    if br.read(1):
        raise NotImplementedError("reserved FLAC frame bit set")
    br.read(1)  # blocking strategy (frame- vs sample-numbered)
    bs_code = br.read(4)
    rate_code = br.read(4)
    chan_code = br.read(4)
    depth_code = br.read(3)
    if br.read(1):
        raise NotImplementedError("reserved FLAC frame bit set")
    _read_utf8_number(br)

    if bs_code == 0:
        raise NotImplementedError("reserved FLAC block size code")
    elif bs_code == 6:
        block_size = br.read(8) + 1
    elif bs_code == 7:
        block_size = br.read(16) + 1
    else:
        block_size = _BLOCKSIZE_CODES[bs_code]

    if rate_code == 0:
        rate = info["rate"]
    elif rate_code == 12:
        rate = br.read(8) * 1000
    elif rate_code == 13:
        rate = br.read(16)
    elif rate_code == 14:
        rate = br.read(16) * 10
    elif rate_code == 15:
        raise NotImplementedError("invalid FLAC sample rate code")
    else:
        rate = _RATE_CODES[rate_code]

    if depth_code == 0:
        bps = info["bps"]
    elif depth_code in _DEPTH_CODES:
        bps = _DEPTH_CODES[depth_code]
    else:
        raise NotImplementedError(f"reserved FLAC sample size code {depth_code}")

    header_end = br.byte_pos()
    if br.read(8) != _crc8(br.data[start_byte:header_end]):
        raise NotImplementedError("FLAC frame header CRC-8 mismatch")

    if chan_code <= 7:
        channels = chan_code + 1
        subs = [_read_subframe(br, block_size, bps) for _ in range(channels)]
        out = np.stack(subs, axis=1)
    elif chan_code in (8, 9, 10):
        # the SIDE channel carries one extra bit: it is subframe 0 for
        # right-side (9), subframe 1 for left-side (8) and mid-side (10)
        a = _read_subframe(br, block_size, bps + (1 if chan_code == 9 else 0))
        b = _read_subframe(br, block_size, bps + (1 if chan_code != 9 else 0))
        if chan_code == 8:  # left, side
            left, side = a, b
            right = left - side
        elif chan_code == 9:  # side, right
            side, right = a, b
            left = right + side
        else:  # mid, side
            mid, side = a, b
            mid = (mid << 1) | (side & 1)
            left = (mid + side) >> 1
            right = (mid - side) >> 1
        out = np.stack([left, right], axis=1)
    else:
        raise NotImplementedError(f"reserved FLAC channel assignment {chan_code}")

    br.align()
    end_byte = br.byte_pos()
    crc = br.read(16)
    if crc != _crc16(br.data[start_byte:end_byte]):
        raise NotImplementedError("FLAC frame CRC-16 mismatch")
    return out, rate


def decode_flac_pcm(payload: bytes) -> tuple["np.ndarray", int, int]:
    """((n, channels) int64 samples, rate, bits-per-sample) — full
    fidelity, every frame CRC-verified, MD5-verified against STREAMINFO
    when present. Unsupported/reserved/corrupt constructs raise
    ``NotImplementedError`` at the seam (callers quarantine)."""
    if not is_flac(payload):
        raise NotImplementedError("not a FLAC payload")
    pos = 4
    info = None
    last = False
    while not last:
        if pos + 4 > len(payload):
            raise NotImplementedError("truncated FLAC metadata")
        head = payload[pos]
        last = bool(head & 0x80)
        btype = head & 0x7F
        length = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + length]
        if len(body) < length:
            raise NotImplementedError("truncated FLAC metadata block")
        if info is None:
            if btype != 0:
                raise NotImplementedError("FLAC stream missing STREAMINFO")
            info = _parse_streaminfo(body)
        elif btype == 127:
            raise NotImplementedError("invalid FLAC metadata block type")
        pos += 4 + length
    if info is None or info["rate"] == 0:
        raise NotImplementedError("invalid FLAC STREAMINFO")

    br = _BitReader(payload[pos:])
    chunks = []
    rate = info["rate"]
    total = 0
    while br.byte_pos() + 2 <= len(br.data):
        frame, rate = _read_frame(br, info)
        if frame.shape[1] != info["channels"]:
            raise NotImplementedError("FLAC frame channel count mismatch")
        chunks.append(frame)
        total += frame.shape[0]
        if info["total_samples"] and total >= info["total_samples"]:
            break
    if not chunks:
        raise NotImplementedError("FLAC stream has no frames")
    pcm = np.concatenate(chunks, axis=0)
    if info["total_samples"]:
        if pcm.shape[0] < info["total_samples"]:
            raise NotImplementedError("FLAC stream shorter than STREAMINFO")
        pcm = pcm[: info["total_samples"]]
    bps = info["bps"]
    if info["md5"] != b"\x00" * 16 and bps % 8 == 0:
        if hashlib.md5(_pcm_bytes(pcm, bps)).digest() != info["md5"]:
            raise NotImplementedError("FLAC MD5 signature mismatch")
    return pcm, rate, bps


def _pcm_bytes(pcm: "np.ndarray", bps: int) -> bytes:
    """Interleaved little-endian signed PCM bytes — the MD5 input."""
    width = bps // 8
    flat = pcm.astype(np.int64).reshape(-1)
    bs = np.empty((flat.size, width), dtype=np.uint8)
    for i in range(width):
        bs[:, i] = (flat >> (8 * i)) & 0xFF
    return bs.tobytes()


def decode_flac(payload: bytes) -> tuple["np.ndarray", int]:
    """(int16 samples, sample_rate) — the ``features_for`` contract,
    mirroring ``decode_wav``: every depth normalizes to the int16 domain
    by taking the top 16 bits, multi-channel downmixes to channel 0."""
    pcm, rate, bps = decode_flac_pcm(payload)
    mono = pcm[:, 0]
    if bps > 16:
        mono = mono >> (bps - 16)
    elif bps < 16:
        mono = mono << (16 - bps)
    return mono.astype(np.int16), rate


# ---------------------------------------------------------------------------
# encoder


def _zigzag(v: "np.ndarray") -> "np.ndarray":
    return np.where(v >= 0, v << 1, ((-v) << 1) - 1).astype(np.int64)


def _fixed_residual(x: "np.ndarray", order: int) -> "np.ndarray":
    return np.diff(x, n=order) if order else x.copy()


_LPC_ORDERS = (2, 4, 8)
_LPC_PRECISION = 12


def _lpc_candidates(x: "np.ndarray", max_order: int) -> list:
    """Levinson-Durbin over the block's autocorrelation; returns the
    float predictor (x[n] ≈ Σ c[j]·x[n-1-j]) at each order in
    ``_LPC_ORDERS`` (the recursion yields every intermediate order for
    free). All in-stream math — FLAC carries the quantized coefficients,
    so nothing here has to match any other encoder."""
    xf = x.astype(np.float64)
    n = xf.size
    autoc = [float(np.dot(xf, xf))]
    if autoc[0] == 0.0:
        return []
    for lag in range(1, max_order + 1):
        # unbiased estimate (divide by n-lag): the biased taper looks
        # tiny but on near-singular tonal autocorrelation matrices it
        # drags order-2 coefficients from the ideal [2cosw, -1] to
        # useless values; if the unbiased matrix loses positive
        # definiteness the err<=0 guard below stops the recursion
        autoc.append(float(np.dot(xf[:-lag], xf[lag:])) * (n / (n - lag)))
    err = autoc[0]
    lpc: list[float] = []
    out = []
    for i in range(max_order):
        acc = autoc[i + 1] - sum(lpc[j] * autoc[i - j] for j in range(i))
        if err <= 0:
            break
        k = acc / err
        lpc = [lpc[j] - k * lpc[i - 1 - j] for j in range(i)] + [k]
        err *= 1.0 - k * k
        if (i + 1) in _LPC_ORDERS:
            out.append(list(lpc))
    return out


def _quantize_lpc(lpc: list) -> tuple[list, int] | None:
    """(int coefficients, shift) at ``_LPC_PRECISION`` bits with error
    feedback; None when the filter cannot fit the coded ranges."""
    cmax = max(abs(c) for c in lpc)
    if cmax == 0.0 or not np.isfinite(cmax):
        return None
    shift = 15
    while shift > 0 and cmax * (1 << shift) >= (1 << (_LPC_PRECISION - 1)) - 1:
        shift -= 1
    if shift == 0:
        return None  # wildly unstable filter — fixed/verbatim will win
    lim = 1 << (_LPC_PRECISION - 1)
    q = []
    e = 0.0
    for c in lpc:
        v = c * (1 << shift) + e
        qi = min(max(int(round(v)), -lim), lim - 1)
        e = v - qi
        q.append(qi)
    return q, shift


def _lpc_residual(x: "np.ndarray", q: list, shift: int) -> "np.ndarray":
    """Exact integer residual for the quantized predictor — vectorized
    over the block (the prediction window is original samples, which the
    decoder has reconstructed exactly by the time it needs them)."""
    order = len(q)
    n = x.size
    acc = np.zeros(n - order, dtype=np.int64)
    for j, c in enumerate(q):
        acc += np.int64(c) * x[order - 1 - j : n - 1 - j]
    return x[order:] - (acc >> shift)


def _best_rice_plan(res: "np.ndarray", order: int, block_size: int):
    """Exact cheapest residual encoding: scan partition orders 0..4 and,
    per partition, every Rice parameter plus the raw-binary escape.
    Returns (total_bits, partition_order, [(k_or_None, nbits), ...])."""
    zz = _zigzag(res)
    best = None
    for porder in range(5):
        nparts = 1 << porder
        if block_size % nparts or (block_size >> porder) <= order:
            continue
        bounds = [
            ((block_size >> porder) * p - (order if p else 0),
             (block_size >> porder) * (p + 1) - order)
            for p in range(nparts)
        ]
        total = 6  # 2 method + 4 partition-order bits
        plan = []
        ok = True
        for lo, hi in bounds:
            part = zz[lo:hi]
            count = hi - lo
            # Rice cost for parameter k: sum(u >> k) quotient zeros
            # + count stop bits + count*k remainder bits
            kbest, kcost = None, None
            for k in range(15):
                c = int(np.sum(part >> k)) + count * (k + 1)
                if kcost is None or c < kcost:
                    kbest, kcost = k, c
                elif c > kcost * 2:
                    break
            # raw escape width: the zigzag magnitude's bit length IS the
            # two's-complement width (2v and 2|v|-1 both round up to it)
            maxu = int(part.max()) if count else 0
            nbits = maxu.bit_length()
            raw_cost = 5 + count * nbits if nbits <= 31 else None
            if raw_cost is not None and raw_cost < kcost:
                plan.append((None, nbits))
                total += 4 + raw_cost
            else:
                plan.append((kbest, 0))
                total += 4 + kcost
        if ok and (best is None or total < best[0]):
            best = (total, porder, plan)
    if best is None:
        raise ValueError("no encodable rice partition layout")
    return best


def _write_residual(w: _BitWriter, res: "np.ndarray", order: int,
                    block_size: int, plan) -> None:
    _, porder, parts = plan
    w.write(0, 2)  # method 0: 4-bit rice parameters
    w.write(porder, 4)
    zz = _zigzag(res)
    step = block_size >> porder
    off = 0
    for p, (k, nbits) in enumerate(parts):
        count = step - (order if p == 0 else 0)
        part = res[off : off + count]
        if k is None:
            w.write(15, 4)
            w.write(nbits, 5)
            for v in part:
                w.write(int(v), nbits)
        else:
            w.write(k, 4)
            for u in zz[off : off + count]:
                u = int(u)
                w.write_unary(u >> k)
                if k:
                    w.write(u, k)
        off += count


def _encode_subframe(x: "np.ndarray", sub_bps: int, block_size: int) -> _BitWriter:
    w = _BitWriter()
    if np.all(x == x[0]):
        w.write(0, 8)  # pad 0 | type CONSTANT | wasted 0
        w.write(int(x[0]), sub_bps)
        return w
    # predictor search: cheapest exact plan among FIXED orders 0..4 and
    # quantized-LPC orders 2/4/8 (Levinson-Durbin), with VERBATIM as the
    # guaranteed-encodable fallback — so round trips exercise every
    # decoder subframe path
    best = None
    for order in range(0, min(4, block_size - 1) + 1):
        res = _fixed_residual(x, order)
        if res.size and int(np.abs(res).max()) >= (1 << 62):
            continue
        try:
            plan = _best_rice_plan(res, order, block_size)
        except ValueError:
            continue
        cost = order * sub_bps + plan[0]
        if best is None or cost < best[0]:
            best = (cost, ("fixed", order, res, plan))
    for lpc in _lpc_candidates(x, min(8, block_size - 1)):
        quant = _quantize_lpc(lpc)
        if quant is None:
            continue
        q, shift = quant
        order = len(q)
        res = _lpc_residual(x, q, shift)
        if res.size and int(np.abs(res).max()) >= (1 << 62):
            continue
        try:
            plan = _best_rice_plan(res, order, block_size)
        except ValueError:
            continue
        cost = order * sub_bps + 9 + order * _LPC_PRECISION + plan[0]
        if best is None or cost < best[0]:
            best = (cost, ("lpc", order, res, plan, q, shift))
    verbatim_cost = block_size * sub_bps
    if best is None or best[0] >= verbatim_cost:
        w.write(0, 1)
        w.write(1, 6)  # VERBATIM
        w.write(0, 1)
        for v in x:
            w.write(int(v), sub_bps)
        return w
    kind = best[1]
    order = kind[1]
    res, plan = kind[2], kind[3]
    w.write(0, 1)
    if kind[0] == "fixed":
        w.write(8 + order, 6)
    else:
        w.write(32 + order - 1, 6)
    w.write(0, 1)
    for v in x[:order]:
        w.write(int(v), sub_bps)
    if kind[0] == "lpc":
        q, shift = kind[4], kind[5]
        w.write(_LPC_PRECISION - 1, 4)
        w.write(shift, 5)
        for c in q:
            w.write(c, _LPC_PRECISION)
    _write_residual(w, res, order, block_size, plan)
    return w


def _blocksize_header_code(n: int) -> tuple[int, int | None, int]:
    """(4-bit code, trailing value or None, trailing width)."""
    for code, size in _BLOCKSIZE_CODES.items():
        if size == n:
            return code, None, 0
    if n <= 256:
        return 6, n - 1, 8
    return 7, n - 1, 16


def encode_flac(
    samples: "np.ndarray",
    rate: int,
    bps: int = 16,
    block_size: int = 4096,
) -> bytes:
    """Real FLAC stream from an int array — (n,) mono or (n, 2) stereo,
    depth 8/16/24. Lossless: ``decode_flac_pcm`` returns the input
    bit-exactly. Each frame picks the cheapest of the four stereo modes
    and the cheapest constant/verbatim/fixed/LPC subframe, so round
    trips exercise the decoder's full subframe surface."""
    header, frames = encode_flac_parts(samples, rate, bps, block_size)
    return header + b"".join(frames)


def encode_flac_parts(
    samples: "np.ndarray",
    rate: int,
    bps: int = 16,
    block_size: int = 4096,
) -> tuple[bytes, list]:
    """(``fLaC``+STREAMINFO header bytes, [frame bytes, ...]) — the
    packet boundaries the Ogg-FLAC mapping needs (``sources/ogg.py``
    puts the header in the BOS packet and one frame per packet)."""
    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    if x.ndim != 2 or x.shape[1] not in (1, 2) or x.shape[0] == 0:
        raise ValueError("encode_flac expects (n,) or (n, 1|2) samples")
    if bps not in (8, 16, 24):
        raise ValueError(f"unsupported encode depth {bps}")
    lim = 1 << (bps - 1)
    if int(x.min()) < -lim or int(x.max()) >= lim:
        raise ValueError(f"samples exceed {bps}-bit signed range")
    if rate <= 0 or rate >= (1 << 20):
        raise ValueError(f"sample rate {rate} not encodable")
    if not 1 <= block_size <= 65536:
        # the frame header stores blocksize-minus-1 in 16 bits; anything
        # larger would silently truncate into a corrupt stream
        raise ValueError(f"block size {block_size} not encodable (1..65536)")
    n, channels = x.shape

    rate_code = _RATE_TO_CODE.get(rate)
    rate_tail: tuple[int, int] | None = None
    if rate_code is None:
        if rate % 10 == 0 and rate // 10 < (1 << 16):
            rate_code, rate_tail = 14, (rate // 10, 16)
        elif rate < (1 << 16):
            rate_code, rate_tail = 13, (rate, 16)
        else:
            raise ValueError(f"sample rate {rate} not encodable")

    frame_list = []
    for fi, lo in enumerate(range(0, n, block_size)):
        blk = x[lo : lo + block_size]
        bs = blk.shape[0]
        w = _BitWriter()
        bs_code, bs_tail, bs_tail_bits = _blocksize_header_code(bs)

        # pick the cheapest channel mode by actually encoding candidates
        if channels == 1:
            chan_code = 0
            subs = [_encode_subframe(blk[:, 0], bps, bs)]
        else:
            left, right = blk[:, 0], blk[:, 1]
            side = left - right
            mid = (left + right) >> 1
            sw = {
                "L": _encode_subframe(left, bps, bs),
                "R": _encode_subframe(right, bps, bs),
                "S": _encode_subframe(side, bps + 1, bs),
                "M": _encode_subframe(mid, bps, bs),
            }
            cost = {k: v.bit_length() for k, v in sw.items()}
            modes = [
                (cost["L"] + cost["R"], 1, [sw["L"], sw["R"]]),
                (cost["L"] + cost["S"], 8, [sw["L"], sw["S"]]),
                (cost["S"] + cost["R"], 9, [sw["S"], sw["R"]]),
                (cost["M"] + cost["S"], 10, [sw["M"], sw["S"]]),
            ]
            _, chan_code, subs = min(modes, key=lambda m: m[0])

        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocking strategy: UTF-8 number = frame index
        w.write(bs_code, 4)
        w.write(rate_code, 4)
        w.write(chan_code, 4)
        w.write(_DEPTH_TO_CODE[bps], 3)
        w.write(0, 1)
        _write_utf8_number(w, fi)
        if bs_tail is not None:
            w.write(bs_tail, bs_tail_bits)
        if rate_tail is not None:
            w.write(rate_tail[0], rate_tail[1])
        w.write(_crc8(bytes(w.buf)), 8)
        for sub in subs:
            w.extend(sub)
        w.align()
        w.write(_crc16(bytes(w.buf)), 16)
        fb = w.bytes()
        frame_list.append(fb)

    # STREAMINFO (34 bytes) as the single, last metadata block
    md5 = hashlib.md5(_pcm_bytes(x, bps)).digest()
    packed = (rate << 44) | ((channels - 1) << 41) | ((bps - 1) << 36) | n
    streaminfo = (
        struct.pack(">HH", min(block_size, n), min(block_size, n))
        + min(len(f) for f in frame_list).to_bytes(3, "big")
        + max(len(f) for f in frame_list).to_bytes(3, "big")
        + packed.to_bytes(8, "big")
        + md5
    )
    header = (
        b"fLaC"
        + bytes([0x80])  # last-metadata-block | STREAMINFO
        + len(streaminfo).to_bytes(3, "big")
        + streaminfo
    )
    return header, frame_list
