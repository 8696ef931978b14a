"""Speech-corpus audio containers — AIFF/AIFC, Sun AU, NIST SPHERE —
plus G.711 µ-law/A-law companding. Pure Python + numpy.

Round 11's second audio seam retire, after FLAC. These are the classic
speech-training-corpus containers (TIMIT/Switchboard ship SPHERE,
telephony data is µ-law AU, Apple-originated corpora are AIFF), and all
of them are STRUCTURAL: fixed big-endian headers or key-value text, PCM
or G.711 payload. G.711 expansion is implemented from the public
segment-companding formula (the sign/segment/mantissa arithmetic of the
well-known public-domain g711.c) — not a memorized table — and the
tests pin the published anchor points (µ-law 0xFF → 0, peak 32124;
A-law 0xD5 → +8, peak 32256) plus sign symmetry and monotonicity, so a
formula slip cannot pass.

Decoders return ``(int16 samples, rate)`` — the same ``features_for``
contract as ``decode_wav``/``decode_flac`` (every depth normalizes to
the int16 domain via the top 16 bits; multi-channel downmixes to
channel 0). Encoders exist for round-trip tests (bit-exact for 16-bit
PCM payloads; G.711 round-trips are value-exact over the companded
domain: decode(encode(x)) is idempotent, and every code byte except
µ-law's duplicated ±0 pair survives encode(decode(byte)) == byte).

Seams (documented refusals, callers quarantine): float samples in
AIFC/AU (float WAV decodes via ``multimodal._decode_wav_manual``), AIFC
compression types beyond PCM/G.711, SPHERE ``shorten``-compressed
payloads, and the MP3/Vorbis/Opus family (see ``sources/flac.py`` for
why approximating their normative tables would be worse than the seam).

Scale note (same as every codec here): per-payload decode is the
``mapInPandas`` inner function; a 100 TB pipeline swaps in a native
decoder at this seam without touching the plan.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# G.711 companding (formula-derived, vectorized over uint8 code arrays)

_BIAS = 0x84  # µ-law bias (132)


def _ulaw_expand_table() -> "np.ndarray":
    """All 256 µ-law codes → int16, from the segment formula:
    magnitude = (((mantissa << 3) + BIAS) << segment) - BIAS."""
    u = ~np.arange(256, dtype=np.uint8)
    seg = (u >> 4) & 0x7
    mant = (u & 0xF).astype(np.int32)
    t = (((mant << 3) + _BIAS) << seg) - _BIAS
    return np.where(u & 0x80, -t, t).astype(np.int16)


def _alaw_expand_table() -> "np.ndarray":
    """All 256 A-law codes → int16, from the segment formula (A-law has
    a half-step offset in segment 0/1 and no true zero)."""
    a = np.arange(256, dtype=np.uint8) ^ 0x55
    seg = ((a & 0x70) >> 4).astype(np.int32)
    mant = (a & 0xF).astype(np.int32)
    t = mant << 4
    t = np.where(seg == 0, t + 8, (t + 0x108) << np.maximum(seg - 1, 0))
    return np.where(a & 0x80, t, -t).astype(np.int16)


_ULAW2LIN = _ulaw_expand_table()
_ALAW2LIN = _alaw_expand_table()

# compression: nearest-code search is exact because expansion is monotone
# per sign — build once from the expansion tables themselves
_ULAW_POS = np.argsort(_ULAW2LIN.astype(np.int32), kind="stable")
_ALAW_POS = np.argsort(_ALAW2LIN.astype(np.int32), kind="stable")


def ulaw_decode(codes: "np.ndarray") -> "np.ndarray":
    return _ULAW2LIN[np.asarray(codes, dtype=np.uint8)]


def alaw_decode(codes: "np.ndarray") -> "np.ndarray":
    return _ALAW2LIN[np.asarray(codes, dtype=np.uint8)]


def _compand(x: "np.ndarray", table: "np.ndarray", order: "np.ndarray") -> "np.ndarray":
    """Nearest-code companding: binary search over the sorted expansion
    values, then pick the closer neighbor — exact inverse on decoded
    values, best-quantization on everything else."""
    vals = table.astype(np.int32)[order]
    x32 = np.asarray(x, dtype=np.int32)
    idx = np.searchsorted(vals, x32)
    idx = np.clip(idx, 1, 255)
    lo, hi = vals[idx - 1], vals[idx]
    pick = np.where((x32 - lo) <= (hi - x32), idx - 1, idx)
    return order[pick].astype(np.uint8)


def ulaw_encode(samples: "np.ndarray") -> "np.ndarray":
    return _compand(samples, _ULAW2LIN, _ULAW_POS)


def alaw_encode(samples: "np.ndarray") -> "np.ndarray":
    return _compand(samples, _ALAW2LIN, _ALAW_POS)


# ---------------------------------------------------------------------------
# shared PCM payload handling


def _pcm_to_int16(raw: bytes, width: int, big_endian: bool, signed: bool = True) -> "np.ndarray":
    """width-byte integer PCM → int16 via the top 16 bits (the
    decode_wav depth-normalization contract)."""
    order = ">" if big_endian else "<"
    if width == 1:
        b = np.frombuffer(raw, dtype=np.uint8)
        if signed:
            return (b.view(np.int8).astype(np.int16)) << 8
        return ((b.astype(np.int16) - 128) << 8).astype(np.int16)
    if width == 2:
        # drop a trailing partial sample (corrupt declared sizes) — the
        # same truncation the 3/4-byte branches already apply
        return np.frombuffer(
            raw[: len(raw) - len(raw) % 2], dtype=f"{order}i2"
        ).astype(np.int16)
    if width in (3, 4):
        b = np.frombuffer(raw, dtype=np.uint8)
        b = b[: len(b) - len(b) % width].reshape(-1, width)
        hi = b[:, :2] if big_endian else b[:, -2:][:, ::-1]
        return (
            (hi[:, 0].astype(np.uint16) << 8) | hi[:, 1].astype(np.uint16)
        ).view(np.int16)
    raise NotImplementedError(f"unsupported PCM width {width}")


def _downmix(samples: "np.ndarray", channels: int) -> "np.ndarray":
    return samples[::channels] if channels > 1 else samples


# ---------------------------------------------------------------------------
# AIFF / AIFC (IFF container, big-endian, 80-bit extended-float rate)


def is_aiff(payload: bytes) -> bool:
    return (
        len(payload) > 12
        and payload[:4] == b"FORM"
        and payload[8:12] in (b"AIFF", b"AIFC")
    )


def _f80_pack(rate: int) -> bytes:
    """IEEE 754 80-bit extended float (sign+15-bit exponent, 64-bit
    mantissa with explicit integer bit) — how AIFF stores sample rates."""
    if rate <= 0:
        raise ValueError("rate must be positive")
    e = rate.bit_length() - 1
    mant = rate << (63 - e)
    return struct.pack(">HQ", 16383 + e, mant)


def _f80_unpack(b: bytes) -> int:
    se, mant = struct.unpack(">HQ", b)
    if se & 0x8000 or mant == 0:
        raise NotImplementedError("non-positive AIFF sample rate")
    e = (se & 0x7FFF) - 16383
    shift = 63 - e
    if shift < 0:
        raise NotImplementedError("AIFF sample rate out of range")
    val = mant >> shift
    if val == 0:
        raise NotImplementedError("AIFF sample rate underflows")
    return int(val)


def decode_aiff(payload: bytes) -> tuple["np.ndarray", int]:
    """(int16 samples, rate) from AIFF (big-endian PCM) or AIFC with
    compression NONE / sowt (little-endian PCM) / ulaw / alaw."""
    if not is_aiff(payload):
        raise NotImplementedError("not an AIFF payload")
    is_aifc = payload[8:12] == b"AIFC"
    end = min(len(payload), 8 + struct.unpack_from(">I", payload, 4)[0])
    pos = 12
    comm = None
    ssnd = None
    while pos + 8 <= end:
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack_from(">I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise NotImplementedError("truncated AIFF chunk")
        if tag == b"COMM":
            comm = body
        elif tag == b"SSND":
            ssnd = body
        pos += 8 + size + (size & 1)  # IFF chunks are word-padded
    if comm is None or ssnd is None or len(comm) < 18 or len(ssnd) < 8:
        raise NotImplementedError("AIFF missing COMM/SSND")
    channels, nframes, bits = struct.unpack_from(">HIH", comm, 0)
    rate = _f80_unpack(comm[8:18])
    compression = b"NONE"
    if is_aifc:
        if len(comm) < 22:
            raise NotImplementedError("AIFC COMM missing compression type")
        compression = comm[18:22]
    offset, _blocksize = struct.unpack_from(">II", ssnd, 0)
    data = ssnd[8 + offset :]
    if compression in (b"NONE", b"sowt"):
        if bits not in (8, 16, 24, 32):
            raise NotImplementedError(f"AIFF sample size {bits} unsupported")
        width = bits // 8
        need = width * nframes * channels
        if len(data) < need:
            raise NotImplementedError("AIFF SSND shorter than COMM frames")
        samples = _pcm_to_int16(data[:need], width, big_endian=compression == b"NONE")
    elif compression in (b"ulaw", b"ULAW", b"alaw", b"ALAW"):
        need = nframes * channels
        if len(data) < need:
            raise NotImplementedError("AIFF SSND shorter than COMM frames")
        codes = np.frombuffer(data[:need], dtype=np.uint8)
        dec = ulaw_decode if compression in (b"ulaw", b"ULAW") else alaw_decode
        samples = dec(codes)
    else:
        raise NotImplementedError(
            f"AIFC compression {compression!r} needs an external codec"
        )
    return _downmix(samples, channels), rate


def encode_aiff(
    samples: "np.ndarray", rate: int, compression: bytes | None = None
) -> bytes:
    """AIFF (16-bit big-endian PCM) or AIFC (ulaw/alaw) from int16 mono."""
    x = np.asarray(samples, dtype=np.int16).reshape(-1)
    if x.size == 0:
        raise ValueError("encode_aiff needs at least one sample")
    if compression is None:
        data = x.astype(">i2").tobytes()
        bits, form = 16, b"AIFF"
        comm = struct.pack(">HIH", 1, x.size, bits) + _f80_pack(rate)
    else:
        if compression not in (b"ulaw", b"alaw"):
            raise ValueError(f"unsupported AIFC compression {compression!r}")
        enc = ulaw_encode if compression == b"ulaw" else alaw_encode
        data = enc(x).tobytes()
        bits, form = 16, b"AIFC"
        name = b"\x04" + compression.upper() + b"\x00"  # pstring, padded
        comm = (
            struct.pack(">HIH", 1, x.size, bits)
            + _f80_pack(rate)
            + compression
            + name
        )
    ssnd = struct.pack(">II", 0, 0) + data

    def chunk(tag: bytes, body: bytes) -> bytes:
        return tag + struct.pack(">I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    inner = form
    if form == b"AIFC":
        inner += chunk(b"FVER", struct.pack(">I", 0xA2805140))
    inner += chunk(b"COMM", comm) + chunk(b"SSND", ssnd)
    return b"FORM" + struct.pack(">I", len(inner)) + inner


# ---------------------------------------------------------------------------
# Sun AU (.snd)

_AU_PCM_WIDTHS = {2: 1, 3: 2, 4: 3, 5: 4}  # encoding code → bytes/sample


def is_au(payload: bytes) -> bool:
    return len(payload) > 24 and payload[:4] == b".snd"


def decode_au(payload: bytes) -> tuple["np.ndarray", int]:
    """(int16 samples, rate) from Sun AU: µ-law (1), signed linear PCM
    8/16/24/32 (2-5), A-law (27). Float encodings quarantine."""
    if not is_au(payload):
        raise NotImplementedError("not an AU payload")
    _, offset, size, enc, rate, channels = struct.unpack_from(">IIIIII", payload, 0)
    if offset < 24 or offset > len(payload) or channels < 1:
        raise NotImplementedError("invalid AU header")
    data = payload[offset:]
    if size != 0xFFFFFFFF:
        # the data-size field is authoritative when set (0xFFFFFFFF means
        # unknown); trailing annotation/padding bytes are not audio, and
        # a payload SHORTER than the declared size is a truncated file —
        # quarantine it (mirroring the SPHERE sample_count check)
        if len(data) < size:
            raise NotImplementedError(
                "AU payload shorter than declared data size"
            )
        data = data[:size]
    if enc == 1:
        samples = ulaw_decode(np.frombuffer(data, dtype=np.uint8))
    elif enc == 27:
        samples = alaw_decode(np.frombuffer(data, dtype=np.uint8))
    elif enc in _AU_PCM_WIDTHS:
        samples = _pcm_to_int16(data, _AU_PCM_WIDTHS[enc], big_endian=True)
    else:
        raise NotImplementedError(f"AU encoding {enc} needs an external codec")
    return _downmix(samples, channels), rate


def encode_au(samples: "np.ndarray", rate: int, encoding: int = 3) -> bytes:
    """AU from int16 mono: encoding 3 (16-bit PCM, bit-exact round trip),
    1 (µ-law), or 27 (A-law)."""
    x = np.asarray(samples, dtype=np.int16).reshape(-1)
    if encoding == 3:
        data = x.astype(">i2").tobytes()
    elif encoding == 1:
        data = ulaw_encode(x).tobytes()
    elif encoding == 27:
        data = alaw_encode(x).tobytes()
    else:
        raise ValueError(f"unsupported AU encoding {encoding}")
    return struct.pack(">IIIIII", 0x2E736E64, 24, len(data), encoding, rate, 1) + data


# ---------------------------------------------------------------------------
# NIST SPHERE


def is_sphere(payload: bytes) -> bool:
    return len(payload) > 16 and payload[:8] == b"NIST_1A\n"


def decode_sphere(payload: bytes) -> tuple["np.ndarray", int]:
    """(int16 samples, rate) from a NIST SPHERE file (the TIMIT /
    Switchboard container): text key-value header, then PCM (either byte
    order, via ``sample_byte_format``) or µ-law samples.
    ``shorten``-embedded payloads quarantine at the seam."""
    if not is_sphere(payload):
        raise NotImplementedError("not a SPHERE payload")
    try:
        header_size = int(payload[8:16].split(b"\n")[0].strip())
    except ValueError:
        raise NotImplementedError("invalid SPHERE header size") from None
    if header_size < 16 or header_size > len(payload):
        raise NotImplementedError("truncated SPHERE header")
    fields = {}
    for line in payload[:header_size].split(b"\n")[2:]:
        line = line.strip()
        if line == b"end_head":
            break
        parts = line.split(None, 2)
        if len(parts) == 3 and parts[1].startswith(b"-"):
            fields[parts[0].decode("ascii", "replace")] = parts[2]
    try:
        rate = int(fields.get("sample_rate", b"0"))
        channels = int(fields.get("channel_count", b"1"))
        width = int(fields.get("sample_n_bytes", b"2"))
    except ValueError:
        raise NotImplementedError("malformed SPHERE numeric field") from None
    if rate <= 0 or channels < 1:
        raise NotImplementedError("invalid SPHERE rate/channels")
    coding = fields.get("sample_coding", b"pcm").lower()
    byte_format = fields.get("sample_byte_format", b"10")
    data = payload[header_size:]
    if b"shorten" in coding or b"embedded" in coding:
        raise NotImplementedError(
            "shorten-compressed SPHERE needs an external codec"
        )
    count_field = fields.get("sample_count")
    if count_field is not None:
        # the declared sample_count bounds the audio region — bytes after
        # it (trailing annotation) are not samples, and a shortfall means
        # a truncated file (mirroring the AIFF COMM length check)
        try:
            count = int(count_field)
        except ValueError:
            raise NotImplementedError("malformed SPHERE numeric field") from None
        unit = 1 if coding.startswith((b"ulaw", b"mu-law", b"alaw")) else width
        need = count * channels * unit
        if need > len(data):
            raise NotImplementedError(
                "SPHERE payload shorter than declared sample_count"
            )
        data = data[:need]
    if coding.startswith(b"ulaw") or coding.startswith(b"mu-law"):
        samples = ulaw_decode(np.frombuffer(data, dtype=np.uint8))
    elif coding.startswith(b"alaw"):
        samples = alaw_decode(np.frombuffer(data, dtype=np.uint8))
    elif coding.startswith(b"pcm"):
        if width not in (1, 2, 3, 4):
            raise NotImplementedError(f"SPHERE sample width {width} unsupported")
        samples = _pcm_to_int16(data, width, big_endian=byte_format == b"10")
    else:
        raise NotImplementedError(f"SPHERE coding {coding!r} unsupported")
    return _downmix(samples, channels), rate


def encode_sphere(samples: "np.ndarray", rate: int, coding: str = "pcm") -> bytes:
    """SPHERE from int16 mono: ``pcm`` (16-bit little-endian, bit-exact
    round trip) or ``ulaw``."""
    x = np.asarray(samples, dtype=np.int16).reshape(-1)
    if coding == "pcm":
        data = x.astype("<i2").tobytes()
        width, fmt = 2, b"01"
    elif coding == "ulaw":
        data = ulaw_encode(x).tobytes()
        width, fmt = 1, b"1"
    else:
        raise ValueError(f"unsupported SPHERE coding {coding!r}")
    lines = [
        b"NIST_1A",
        b"   1024",
        b"sample_rate -i " + str(rate).encode(),
        b"channel_count -i 1",
        b"sample_count -i " + str(x.size).encode(),
        b"sample_n_bytes -i " + str(width).encode(),
        b"sample_coding -s%d " % len(coding) + coding.encode(),
        b"sample_byte_format -s%d " % len(fmt) + fmt,
        b"end_head",
    ]
    header = b"\n".join(lines) + b"\n"
    if len(header) > 1024:
        raise ValueError("SPHERE header overflow")
    return header + b" " * (1024 - len(header)) + data
