"""MP4 / QuickTime MOV container — pure Python box walk + sample
tables, MJPEG tracks decoded by the in-container JPEG codec.

MP4 is THE video container modern corpora arrive in; what needs an
external library is the CODEC inside it, not the container. This
module makes the split explicit: the ISO BMFF / QuickTime structure —
box walk (32/64-bit sizes), ``moov``/``trak``/``mdia``/``minf``/
``stbl``, and the four sample tables (``stsd`` codec entry, ``stts``
timing, ``stsc`` chunk mapping, ``stsz`` sizes, ``stco``/``co64``
offsets) — is parsed completely, and per-sample byte ranges are
resolved for any track. Tracks whose sample description is ``jpeg``
(Motion-JPEG, each sample a complete JFIF image) decode to real frames
through ``sources/jpeg.py``; ``avc1``/``hev1``/``hvc1``/``vp09``/
``av01``/``mp4v`` tracks quarantine with the codec NAMED, so a
pipeline report says "needs H.264" instead of "undecodable".

The encoder twin writes a spec-shaped QuickTime file (ftyp + mdat +
moov with full sample tables) in one-chunk or chunk-per-frame layout —
the latter exercises the ``stsc`` run expansion a one-chunk file never
touches. Frame rate is ``mdhd`` timescale over the first ``stts``
delta.

Box structure follows the public ISO/IEC 14496-12 layout (box = 32-bit
size + 4CC, size 1 -> 64-bit largesize, size 0 -> to end of enclosing
box). Corrupt structure quarantines with ``NotImplementedError`` —
the same decoder-level contract as every other codec here.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "is_mp4",
    "decode_mp4",
    "encode_mp4_mjpeg",
    "mp4_fps",
    "mp4_video_codec",
]

_TOP_TYPES = (b"ftyp", b"moov", b"mdat", b"free", b"skip", b"wide", b"pnot")

#: stsd formats that are compressed video needing an external codec
_NAMED_CODECS = {
    b"avc1": "H.264/AVC",
    b"avc3": "H.264/AVC",
    b"hvc1": "H.265/HEVC",
    b"hev1": "H.265/HEVC",
    b"vp09": "VP9",
    b"av01": "AV1",
    b"mp4v": "MPEG-4 Part 2",
    b"svq3": "Sorenson Video 3",
}


def is_mp4(payload: bytes) -> bool:
    return len(payload) >= 16 and payload[4:8] in _TOP_TYPES


def _be32(buf: bytes, pos: int) -> int:
    return struct.unpack_from(">I", buf, pos)[0]


def _boxes(buf: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for each box in [start, end)."""
    pos = start
    while pos + 8 <= end:
        size = _be32(buf, pos)
        typ = buf[pos + 4 : pos + 8]
        if size == 1:
            if pos + 16 > end:
                raise NotImplementedError("MP4 largesize box truncated")
            size = struct.unpack_from(">Q", buf, pos + 8)[0]
            hdr = 16
        elif size == 0:
            size = end - pos
            hdr = 8
        else:
            hdr = 8
        if size < hdr or pos + size > end:
            raise NotImplementedError("MP4 box overruns its container")
        yield typ, pos + hdr, pos + size
        pos += size
    if pos != end:
        raise NotImplementedError("MP4 trailing garbage inside a container")


def _find(buf: bytes, start: int, end: int, typ: bytes):
    for t, s, e in _boxes(buf, start, end):
        if t == typ:
            return s, e
    return None


def _full_box(buf: bytes, s: int, e: int) -> int:
    """Skip the version/flags word of a full box, returning the payload
    start."""
    if s + 4 > e:
        raise NotImplementedError("MP4 full box truncated")
    return s + 4


def _parse_video_track(buf: bytes, trak_s: int, trak_e: int):
    """(codec_4cc, timescale, sample_ranges, stts_first_delta) for a
    'vide' track, or None if this trak is not video."""
    mdia = _find(buf, trak_s, trak_e, b"mdia")
    if mdia is None:
        return None
    hdlr = _find(buf, mdia[0], mdia[1], b"hdlr")
    if hdlr is None:
        return None
    hs = _full_box(buf, *hdlr)
    if buf[hs + 4 : hs + 8] != b"vide":
        return None
    mdhd = _find(buf, mdia[0], mdia[1], b"mdhd")
    if mdhd is None:
        raise NotImplementedError("MP4 video track missing mdhd")
    ms = _full_box(buf, *mdhd)
    version = buf[mdhd[0]]
    ts_pos = ms + (16 if version == 1 else 8)
    if ts_pos + 4 > mdhd[1]:
        raise NotImplementedError("MP4 mdhd truncated")
    timescale = _be32(buf, ts_pos)
    if timescale < 1:
        raise NotImplementedError("MP4 mdhd timescale must be positive")
    minf = _find(buf, mdia[0], mdia[1], b"minf")
    if minf is None:
        raise NotImplementedError("MP4 video track missing minf")
    stbl = _find(buf, minf[0], minf[1], b"stbl")
    if stbl is None:
        raise NotImplementedError("MP4 video track missing stbl")

    def table(typ: bytes):
        t = _find(buf, stbl[0], stbl[1], typ)
        return None if t is None else (_full_box(buf, *t), t[1])

    def guarded_be32(pos: int, end: int, what: str) -> int:
        if pos + 4 > end:
            raise NotImplementedError(f"MP4 {what} truncated")
        return _be32(buf, pos)

    stsd = table(b"stsd")
    stsz = table(b"stsz")
    stsc = table(b"stsc")
    stts = table(b"stts")
    stco = table(b"stco")
    co64 = table(b"co64")
    if stsd is None or stsz is None or stsc is None or (
        stco is None and co64 is None
    ):
        raise NotImplementedError("MP4 sample tables incomplete")
    # stsd: entry count, then the first sample description's 4CC
    sd_s, sd_e = stsd
    if sd_s + 16 > sd_e or _be32(buf, sd_s) < 1:
        raise NotImplementedError("MP4 stsd holds no sample description")
    codec = buf[sd_s + 8 : sd_s + 12]
    # stsz: constant size or per-sample table
    sz_s, sz_e = stsz
    const_size = guarded_be32(sz_s, sz_e, "stsz")
    n_samples = guarded_be32(sz_s + 4, sz_e, "stsz")
    if n_samples < 1 or n_samples > 1 << 20:
        raise NotImplementedError("MP4 sample count out of range")
    if const_size:
        sizes = [const_size] * n_samples
    else:
        if sz_s + 8 + 4 * n_samples > sz_e:
            raise NotImplementedError("MP4 stsz table truncated")
        sizes = [
            _be32(buf, sz_s + 8 + 4 * k) for k in range(n_samples)
        ]
    # chunk offsets
    if stco is not None:
        co_s, co_e = stco
        n_chunks = guarded_be32(co_s, co_e, "stco")
        if co_s + 4 + 4 * n_chunks > co_e:
            raise NotImplementedError("MP4 stco table truncated")
        chunk_offs = [
            _be32(buf, co_s + 4 + 4 * k) for k in range(n_chunks)
        ]
    else:
        co_s, co_e = co64
        n_chunks = guarded_be32(co_s, co_e, "co64")
        if co_s + 4 + 8 * n_chunks > co_e:
            raise NotImplementedError("MP4 co64 table truncated")
        chunk_offs = [
            struct.unpack_from(">Q", buf, co_s + 4 + 8 * k)[0]
            for k in range(n_chunks)
        ]
    # stsc: (first_chunk, samples_per_chunk) runs -> per-chunk counts
    sc_s, sc_e = stsc
    n_runs = guarded_be32(sc_s, sc_e, "stsc")
    if sc_s + 4 + 12 * n_runs > sc_e:
        raise NotImplementedError("MP4 stsc table truncated")
    runs = [
        (
            _be32(buf, sc_s + 4 + 12 * k),
            _be32(buf, sc_s + 8 + 12 * k),
        )
        for k in range(n_runs)
    ]
    if not runs or runs[0][0] != 1:
        raise NotImplementedError("MP4 stsc runs must start at chunk 1")
    per_chunk = []
    for idx, (first, spc) in enumerate(runs):
        last = (
            runs[idx + 1][0] - 1 if idx + 1 < len(runs) else len(chunk_offs)
        )
        if first > last:
            raise NotImplementedError("MP4 stsc run order invalid")
        per_chunk.extend([spc] * (last - first + 1))
    # resolve absolute (start, end) per sample; samples are contiguous
    # within a chunk
    ranges = []
    si = 0
    for coff, spc in zip(chunk_offs, per_chunk):
        pos = coff
        for _ in range(spc):
            if si >= n_samples:
                break
            size = sizes[si]
            if coff < 0 or pos + size > len(buf):
                raise NotImplementedError("MP4 sample beyond payload")
            ranges.append((pos, pos + size))
            pos += size
            si += 1
    if si != n_samples:
        raise NotImplementedError(
            "MP4 chunk map covers fewer samples than stsz declares"
        )
    # stts: first entry's delta drives the nominal frame rate
    delta = 0
    if stts is not None:
        tt_s, tt_e = stts
        if tt_s + 12 <= tt_e and _be32(buf, tt_s) >= 1:
            delta = _be32(buf, tt_s + 8)
    return codec, timescale, ranges, delta


def _video_track(payload: bytes):
    moov = _find(payload, 0, len(payload), b"moov")
    if moov is None:
        raise NotImplementedError("MP4 has no moov box")
    for t, s, e in _boxes(payload, moov[0], moov[1]):
        if t == b"trak":
            parsed = _parse_video_track(payload, s, e)
            if parsed is not None:
                return parsed
    raise NotImplementedError("MP4 has no video track")


def mp4_video_codec(payload: bytes) -> str:
    """The first video track's sample-description 4CC, as ASCII."""
    codec, _ts, _ranges, _d = _video_track(payload)
    return codec.decode("latin-1")


def mp4_fps(payload: bytes) -> float:
    _codec, ts, _ranges, delta = _video_track(payload)
    if delta < 1:
        return 25.0  # no stts timing: the conventional fallback
    return ts / delta


def decode_mp4(payload: bytes) -> "np.ndarray":
    """uint8 (n_frames, h, w, 3) RGB from an MJPEG MP4/MOV — same
    presentation as ``decode_avi``/``decode_y4m``. Compressed-codec
    tracks quarantine with the codec named."""
    from mapreduce_machine_learning_spark.sources.jpeg import decode_jpeg

    if not is_mp4(payload):
        raise NotImplementedError("not an MP4/MOV payload")
    codec, _ts, ranges, _delta = _video_track(payload)
    if codec in _NAMED_CODECS:
        raise NotImplementedError(
            f"MP4 video codec {_NAMED_CODECS[codec]} needs an external "
            "decoder; only Motion-JPEG ('jpeg') tracks decode in-container"
        )
    if codec != b"jpeg":
        raise NotImplementedError(
            f"MP4 video sample format {codec!r} unsupported"
        )
    frames = [decode_jpeg(payload[s:e]) for s, e in ranges]
    if len({f.shape for f in frames}) != 1:
        raise NotImplementedError("MP4 MJPEG frame geometry varies")
    return np.stack(frames)


# ---------------------------------------------------------------------------
# encoder twin


def _box(typ: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + typ + body


def _full(typ: bytes, body: bytes, version: int = 0, flags: int = 0) -> bytes:
    return _box(typ, struct.pack(">I", (version << 24) | flags) + body)


def encode_mp4_mjpeg(
    frames: list, fps: int = 10, quality: int = 95, chunked: bool = False
) -> bytes:
    """QuickTime MOV with a Motion-JPEG video track from uint8
    (h, w, 3) RGB frames — the decoder's encoder twin. ``chunked=True``
    writes one chunk per frame (n stco entries, 1-sample stsc run);
    the default packs all samples into a single chunk. Both layouts
    resolve to identical sample ranges, which the tests pin."""
    from mapreduce_machine_learning_spark.sources.jpeg import encode_jpeg

    frames = list(frames)
    if not frames:
        raise ValueError("need at least one frame")
    if fps < 1:
        raise ValueError("fps must be positive")
    h, w = np.asarray(frames[0]).shape[:2]
    samples = [encode_jpeg(np.asarray(f), quality=quality) for f in frames]
    n = len(samples)
    sizes = [len(s) for s in samples]
    ftyp = _box(b"ftyp", b"qt  " + struct.pack(">I", 0) + b"qt  ")
    mdat = _box(b"mdat", b"".join(samples))
    data0 = len(ftyp) + 8  # first sample's absolute offset
    if chunked:
        offs = []
        pos = data0
        for sz in sizes:
            offs.append(pos)
            pos += sz
        stsc_runs = [(1, 1, 1)]
    else:
        offs = [data0]
        stsc_runs = [(1, n, 1)]
    duration = n  # timescale = fps, one unit per frame
    mvhd = _full(
        b"mvhd",
        struct.pack(">II", 0, 0)  # creation/modification time
        + struct.pack(">II", fps, duration)
        + struct.pack(">IH", 0x00010000, 0x0100)  # rate, volume
        + b"\x00" * 10
        + struct.pack(
            ">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
        )  # identity matrix
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = _full(
        b"tkhd",
        struct.pack(">II", 0, 0)
        + struct.pack(">II", 1, 0)  # track id, reserved
        + struct.pack(">I", duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)  # layer, group, volume, rsvd
        + struct.pack(
            ">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
        )
        + struct.pack(">II", w << 16, h << 16),
        flags=3,
    )
    mdhd = _full(
        b"mdhd",
        struct.pack(">II", 0, 0)
        + struct.pack(">II", fps, duration)
        + struct.pack(">HH", 0x55C4, 0),  # und language, quality
    )
    hdlr = _full(
        b"hdlr", b"mhlr" + b"vide" + b"\x00" * 12 + b"\x00"
    )
    # VisualSampleEntry for 'jpeg'
    entry = (
        struct.pack(">I", 86 + 8)
        + b"jpeg"
        + b"\x00" * 6
        + struct.pack(">H", 1)  # data reference index
        + struct.pack(">HH", 0, 0)  # version, revision
        + b"appl"
        + struct.pack(">II", 512, 512)  # temporal/spatial quality
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)  # data size
        + struct.pack(">H", 1)  # frame count per sample
        + b"\x0cMotion-JPEG" + b"\x00" * 20  # pascal compressor name
        + struct.pack(">Hh", 24, -1)  # depth, color table id
    )
    stsd = _full(b"stsd", struct.pack(">I", 1) + entry)
    stts = _full(b"stts", struct.pack(">III", 1, n, 1))
    stsc = _full(
        b"stsc",
        struct.pack(">I", len(stsc_runs))
        + b"".join(struct.pack(">III", *r) for r in stsc_runs),
    )
    stsz = _full(
        b"stsz",
        struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", s) for s in sizes),
    )
    stco = _full(
        b"stco",
        struct.pack(">I", len(offs))
        + b"".join(struct.pack(">I", o) for o in offs),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _full(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0), flags=1)
    dref = _full(b"dref", struct.pack(">I", 1) + _full(b"url ", b"", flags=1))
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
