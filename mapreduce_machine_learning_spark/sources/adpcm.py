"""ADPCM-in-WAV codecs — IMA (DVI4, format tag 0x0011) and Microsoft
(format tag 0x0002), pure numpy.

These are the two 4-bit block codecs real speech corpora actually ship
(telephony archives, game assets, old capture rigs), and the last WAV
format tags the decode seam used to quarantine. Both are block codecs:
every block restarts the predictor from an in-block header, so blocks
decode INDEPENDENTLY — the property the decoders exploit by vectorizing
ACROSS blocks (the sequential predictor recursion runs once per
in-block sample position, as a numpy op over all blocks at once). A
1-hour telephony file is ~28k blocks wide: each of the ~505 recursion
steps is a 28k-element vector op, so throughput scales with block
count, not with the sequential chain length.

The encoder twins are deliberately scalar (they exist so the decoder's
entire surface is encoder-reachable in tests and in the synthetic media
rotation — compression quality is not the point), while each decoder's
scalar reference lives in the tests as a differential oracle for the
vectorized path, the same discipline as FLAC's Rice decoder.

Bit-level layouts follow the public IMA ADPCM reference algorithm and
the Microsoft WAVE format documentation (both reproduced in every
multimedia-formats reference):

IMA (tag 0x0011): per channel a 4-byte block header — predictor
  (int16 LE, which IS the block's first output sample), step-table
  index (uint8), reserved byte — then 4-bit codes, low nibble first;
  stereo interleaves the nibble stream in 4-byte per-channel groups.
MS (tag 0x0002): per channel a 7-byte header — coefficient-set index
  (uint8), initial delta (int16), sample1 (int16), sample2 (int16);
  the two header samples are the block's first two outputs (sample2
  then sample1); 4-bit codes follow, HIGH nibble first; stereo packs
  one nibble per channel per byte (high = channel 0).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "decode_ima_wav_body",
    "decode_ms_wav_body",
    "encode_wav_ima",
    "encode_wav_ms",
    "ima_decode_blocks",
    "ms_decode_blocks",
]

# IMA step table (89 entries) and index-adjust table — the reference
# algorithm's constants
_IMA_STEPS = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
        37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
        157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
        544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
        1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
        4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
        12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
        29794, 32767,
    ],
    dtype=np.int32,
)
_IMA_INDEX_ADJ = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32
)

# MS ADPCM preset predictor coefficient pairs and delta-adaptation table
_MS_COEFS = np.array(
    [[256, 0], [512, -256], [0, 0], [192, 64], [240, 0], [460, -208],
     [392, -232]],
    dtype=np.int32,
)
_MS_ADAPT = np.array(
    [230, 230, 230, 230, 307, 409, 512, 614, 768, 614, 512, 409, 307,
     230, 230, 230],
    dtype=np.int32,
)

#: MS delta upper clamp — bounds every decode intermediate in int32
_MS_DELTA_MAX = 1 << 20


def _ima_step(pred, idx, code):
    """One IMA recursion step over a block vector: returns updated
    (pred, idx). All int32 numpy arrays, one element per block."""
    step = _IMA_STEPS[idx]
    diff = step >> 3
    diff = diff + np.where(code & 1, step >> 2, 0)
    diff = diff + np.where(code & 2, step >> 1, 0)
    diff = diff + np.where(code & 4, step, 0)
    pred = np.clip(pred + np.where(code & 8, -diff, diff), -32768, 32767)
    idx = np.clip(idx + _IMA_INDEX_ADJ[code], 0, 88)
    return pred, idx


def ima_decode_blocks(
    preds: "np.ndarray", idxs: "np.ndarray", nibbles: "np.ndarray"
) -> "np.ndarray":
    """(n_blocks, n_codes+1) int16 from per-block headers + 4-bit codes.

    ``preds``/``idxs`` are (n_blocks,) header fields; ``nibbles`` is
    (n_blocks, n_codes) uint8 in 0..15. Column 0 of the output is the
    header predictor (the block's first sample, per the WAV layout).
    Vectorized across blocks: the loop runs n_codes times regardless of
    block count."""
    nblk, ncodes = nibbles.shape
    out = np.empty((nblk, ncodes + 1), np.int16)
    pred = preds.astype(np.int32)
    idx = np.clip(idxs.astype(np.int32), 0, 88)
    out[:, 0] = pred
    code = nibbles.astype(np.int32)
    for t in range(ncodes):
        pred, idx = _ima_step(pred, idx, code[:, t])
        out[:, t + 1] = pred
    return out


def ms_decode_blocks(
    coef_idx: "np.ndarray",
    deltas: "np.ndarray",
    sample1: "np.ndarray",
    sample2: "np.ndarray",
    nibbles: "np.ndarray",
) -> "np.ndarray":
    """(n_blocks, n_codes+2) int16 from MS ADPCM per-block headers +
    4-bit codes. Output columns 0..1 are the header samples in playback
    order (sample2, then sample1). Vectorized across blocks."""
    nblk, ncodes = nibbles.shape
    out = np.empty((nblk, ncodes + 2), np.int16)
    c1 = _MS_COEFS[coef_idx, 0]
    c2 = _MS_COEFS[coef_idx, 1]
    s1 = sample1.astype(np.int32)
    s2 = sample2.astype(np.int32)
    delta = deltas.astype(np.int32)
    out[:, 0] = np.clip(s2, -32768, 32767)
    out[:, 1] = np.clip(s1, -32768, 32767)
    codes = nibbles.astype(np.int32)
    signed = np.where(codes >= 8, codes - 16, codes)
    for t in range(ncodes):
        predicted = (s1 * c1 + s2 * c2) >> 8
        sample = np.clip(predicted + signed[:, t] * delta, -32768, 32767)
        out[:, t + 2] = sample
        s2, s1 = s1, sample
        # upper clamp keeps every intermediate in exact int32 range on
        # adversarial streams where the x3-per-step adaptation would
        # otherwise explode; real encoders never exceed ~1e4, so the
        # cap is semantically invisible on real content (differential
        # scalar oracle in tests/test_adpcm.py uses the same bound)
        delta = np.clip((_MS_ADAPT[codes[:, t]] * delta) >> 8, 16, _MS_DELTA_MAX)
    return out


def decode_ima_wav_body(
    data: bytes,
    block_align: int,
    channels: int,
    samples_per_block: int,
    total_samples: int = -1,
) -> "np.ndarray":
    """int16 channel-0 samples from an IMA-ADPCM WAV data chunk.

    Validates the fmt geometry against the block layout and quarantines
    (``NotImplementedError``) on mismatch — a lying ``block_align`` or
    ``samples_per_block`` never reaches the numpy kernels. A trailing
    partial block decodes for as many whole codes as it carries (files
    in the wild truncate mid-block); ``total_samples`` (the fact-chunk
    count) trims the final output when >= 0."""
    hdr = 4 * channels
    if channels < 1 or block_align <= hdr:
        raise NotImplementedError(
            f"IMA ADPCM geometry invalid (block_align={block_align}, "
            f"channels={channels})"
        )
    max_spb = (block_align - hdr) * 2 // channels + 1
    if not (1 <= samples_per_block <= max_spb):
        raise NotImplementedError(
            f"IMA ADPCM samples_per_block {samples_per_block} outside "
            f"1..{max_spb} for block_align {block_align}"
        )
    if len(data) < hdr:
        raise NotImplementedError("IMA ADPCM data shorter than one header")
    ncodes = samples_per_block - 1
    # channel-0 nibble bytes come in 4-byte groups every 4*channels bytes
    nbytes_per_blk = (ncodes + 1) // 2  # per channel, rounded up
    pieces = []
    nfull = len(data) // block_align
    full = np.frombuffer(data, np.uint8, nfull * block_align).reshape(
        nfull, block_align
    )
    tail = data[nfull * block_align :]
    if len(tail) >= hdr:  # trailing partial block: decode what it holds
        tail_arr = np.zeros(block_align, np.uint8)
        tail_arr[: len(tail)] = np.frombuffer(tail, np.uint8)
        full = np.vstack([full, tail_arr]) if nfull else tail_arr[None, :]
        tail_codes = min(ncodes, max(0, (len(tail) - hdr) // channels * 2))
    else:
        tail_codes = -1  # no partial block
    if full.shape[0] == 0:
        raise NotImplementedError("IMA ADPCM data holds no blocks")
    preds = (
        full[:, 0].astype(np.uint16) | (full[:, 1].astype(np.uint16) << 8)
    ).view(np.int16).astype(np.int32)
    idxs = full[:, 2].astype(np.int32)
    if np.any(idxs > 88):
        raise NotImplementedError("IMA ADPCM step index out of range")
    body = full[:, hdr:]
    if channels == 1:
        nib_bytes = body[:, :nbytes_per_blk]
    else:
        # groups of 4 bytes per channel, channel 0 first in each group
        ngroups = body.shape[1] // (4 * channels)
        grouped = body[:, : ngroups * 4 * channels].reshape(
            full.shape[0], ngroups, channels, 4
        )
        nib_bytes = grouped[:, :, 0, :].reshape(full.shape[0], ngroups * 4)
        nib_bytes = nib_bytes[:, :nbytes_per_blk]
    lo = nib_bytes & 0x0F
    hi = nib_bytes >> 4
    nibs = np.empty((full.shape[0], nib_bytes.shape[1] * 2), np.uint8)
    nibs[:, 0::2] = lo  # low nibble first, per the IMA WAV layout
    nibs[:, 1::2] = hi
    nibs = nibs[:, :ncodes]
    decoded = ima_decode_blocks(preds, idxs, nibs)
    if tail_codes >= 0:  # trim the partial block's undecodable tail
        pieces = [decoded[:-1].reshape(-1), decoded[-1, : tail_codes + 1]]
        out = np.concatenate(pieces)
    else:
        out = decoded.reshape(-1)
    if total_samples >= 0:
        out = out[:total_samples]
    return out.astype(np.int16)


def decode_ms_wav_body(
    data: bytes,
    block_align: int,
    channels: int,
    samples_per_block: int,
    total_samples: int = -1,
) -> "np.ndarray":
    """int16 channel-0 samples from an MS-ADPCM WAV data chunk. Same
    validation/quarantine contract as the IMA twin; only whole blocks
    decode (the MS header carries two samples, so a truncated header is
    unrecoverable and partial blocks are dropped)."""
    hdr = 7 * channels
    if channels < 1 or block_align <= hdr:
        raise NotImplementedError(
            f"MS ADPCM geometry invalid (block_align={block_align}, "
            f"channels={channels})"
        )
    max_spb = (block_align - hdr) * 2 // channels + 2
    if not (2 <= samples_per_block <= max_spb):
        raise NotImplementedError(
            f"MS ADPCM samples_per_block {samples_per_block} outside "
            f"2..{max_spb} for block_align {block_align}"
        )
    nfull = len(data) // block_align
    if nfull == 0:
        raise NotImplementedError("MS ADPCM data holds no whole block")
    ncodes = samples_per_block - 2
    full = np.frombuffer(data, np.uint8, nfull * block_align).reshape(
        nfull, block_align
    )
    coef_idx = full[:, :channels][:, 0].astype(np.int64)
    if np.any(coef_idx >= len(_MS_COEFS)):
        raise NotImplementedError("MS ADPCM coefficient index out of range")

    def _i16(col: int) -> "np.ndarray":
        off = channels + col * 2 * channels  # channel 0's int16 in group
        return (
            full[:, off].astype(np.uint16)
            | (full[:, off + 1].astype(np.uint16) << 8)
        ).view(np.int16)

    deltas, sample1, sample2 = _i16(0), _i16(1), _i16(2)
    if np.any(deltas.astype(np.int32) <= 0):
        raise NotImplementedError("MS ADPCM initial delta must be positive")
    body = full[:, hdr:]
    if channels == 1:
        nibs = np.empty((nfull, body.shape[1] * 2), np.uint8)
        nibs[:, 0::2] = body >> 4  # HIGH nibble first, per the MS layout
        nibs[:, 1::2] = body & 0x0F
    else:
        nibs = body >> 4  # one nibble per channel per byte; high = ch 0
    nibs = nibs[:, :ncodes]
    out = ms_decode_blocks(coef_idx, deltas, sample1, sample2, nibs)
    out = out.reshape(-1)
    if total_samples >= 0:
        out = out[:total_samples]
    return out.astype(np.int16)


def _wav_container(
    fmt_body: bytes, data: bytes, total_samples: int
) -> bytes:
    """RIFF/WAVE wrapper with fmt + fact + data chunks (compressed WAV
    formats are required to carry a fact chunk)."""
    def chunk(tag: bytes, body: bytes) -> bytes:
        return tag + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    inner = (
        b"WAVE"
        + chunk(b"fmt ", fmt_body)
        + chunk(b"fact", struct.pack("<I", total_samples))
        + chunk(b"data", data)
    )
    return b"RIFF" + struct.pack("<I", len(inner)) + inner


def encode_wav_ima(
    samples: "np.ndarray", rate: int, samples_per_block: int = 505
) -> bytes:
    """Mono IMA-ADPCM WAV from int16 samples — the decoder's encoder
    twin (scalar reference implementation; the step index carries
    across blocks like real encoders, which the per-block headers make
    invisible to the decoder)."""
    x = np.asarray(samples, dtype=np.int16).reshape(-1)
    if len(x) == 0:
        raise ValueError("cannot encode an empty IMA ADPCM stream")
    if samples_per_block < 2 or samples_per_block % 2 == 0:
        raise ValueError("samples_per_block must be odd and >= 3")
    ncodes = samples_per_block - 1
    block_align = 4 + ncodes // 2
    steps = _IMA_STEPS.tolist()
    blocks = []
    idx = 0
    pos = 0
    while pos < len(x):
        blk = x[pos : pos + samples_per_block]
        pos += samples_per_block
        pred = int(blk[0])
        blocks.append(struct.pack("<hBB", pred, idx, 0))
        codes = []
        for s in blk[1:]:
            step = steps[idx]
            diff = int(s) - pred
            code = 8 if diff < 0 else 0
            diff = abs(diff)
            if diff >= step:
                code |= 4
                diff -= step
            if diff >= step >> 1:
                code |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                code |= 1
            # reconstruct exactly as the decoder will
            step_arr = np.array([idx], np.int32)
            pred_arr, idx_arr = _ima_step(
                np.array([pred], np.int32), step_arr,
                np.array([code], np.int32),
            )
            pred, idx = int(pred_arr[0]), int(idx_arr[0])
            codes.append(code)
        codes += [0] * (ncodes - len(codes))  # zero-pad a short last block
        packed = bytes(
            (codes[i] | (codes[i + 1] << 4)) for i in range(0, ncodes, 2)
        )
        blocks.append(packed)
    fmt = struct.pack(
        "<HHIIHHHH", 0x0011, 1, rate,
        rate * block_align // samples_per_block, block_align, 4, 2,
        samples_per_block,
    )
    return _wav_container(fmt, b"".join(blocks), len(x))


def encode_wav_ms(
    samples: "np.ndarray", rate: int, samples_per_block: int = 500
) -> bytes:
    """Mono MS-ADPCM WAV from int16 samples — scalar encoder twin.
    Uses coefficient set 0 (pure first-order prediction) throughout;
    the delta adapts per the reference recursion."""
    x = np.asarray(samples, dtype=np.int16).reshape(-1)
    if len(x) < 2:
        raise ValueError("MS ADPCM needs at least 2 samples")
    if samples_per_block < 4 or samples_per_block % 2:
        raise ValueError("samples_per_block must be even and >= 4")
    ncodes = samples_per_block - 2
    block_align = 7 + ncodes // 2
    adapt = _MS_ADAPT.tolist()
    blocks = []
    pos = 0
    while pos + 2 <= len(x):
        blk = x[pos : pos + samples_per_block]
        pos += samples_per_block
        s2, s1 = int(blk[0]), int(blk[1])
        delta = max(16, int(np.mean(np.abs(np.diff(blk)))) >> 2 or 16)
        blocks.append(struct.pack("<Bhhh", 0, delta, s1, s2))
        codes = []
        for s in blk[2:]:
            predicted = (s1 * 256 + s2 * 0) >> 8
            err = int(s) - predicted
            code = max(-8, min(7, int(round(err / delta)))) & 0x0F
            signed = code - 16 if code >= 8 else code
            sample = max(-32768, min(32767, predicted + signed * delta))
            s2, s1 = s1, sample
            delta = min(_MS_DELTA_MAX, max(16, (adapt[code] * delta) >> 8))
            codes.append(code)
        codes += [0] * (ncodes - len(codes))
        packed = bytes(
            ((codes[i] << 4) | codes[i + 1]) for i in range(0, ncodes, 2)
        )
        blocks.append(packed)
    # fmt extension: samples_per_block, coefficient count, 7 preset pairs
    ext = struct.pack("<HH", samples_per_block, len(_MS_COEFS)) + b"".join(
        struct.pack("<hh", int(a), int(b)) for a, b in _MS_COEFS
    )
    fmt = struct.pack(
        "<HHIIHHH", 0x0002, 1, rate,
        rate * block_align // samples_per_block, block_align, 4, len(ext),
    ) + ext
    n_out = (len(x) // samples_per_block) * samples_per_block
    rem = len(x) - n_out
    if rem >= 2:
        n_out += rem  # the short last block still carries rem samples
    return _wav_container(fmt, b"".join(blocks), n_out)
