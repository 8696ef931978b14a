"""Header-only media cataloging — format, codec, geometry, and timing
WITHOUT decoding samples.

The first pass a 100 TB media pipeline runs is a CATALOG: sniff every
payload, record container/codec/dimensions/duration, and only then
decide what to decode, transcode, or route around. Decoding for that
information would cost the full pipeline price; this module answers
from headers alone — a few hundred bytes of struct reads per payload —
and it answers for MORE formats than the decoders cover, because a
header parse does not need the codec: lossy-WebP VP8 dimensions come
from the frame tag, H.264-in-MP4 geometry from the sample description,
Vorbis/Opus sample rates from their Ogg identification headers, and
MP3 duration from a frame-header walk — all formats whose SAMPLES
quarantine in this container.

``media_info`` never raises: a corrupt or unknown payload degrades to
partial fields (container identified by magic where possible, zeros
elsewhere, ``decodable=False``). That is the catalog contract — a
report, not an exception; the quarantine seam belongs to the decoders.

``decodable`` means "this package's pure decoders can produce real
samples/pixels for this payload's codec" — the routing bit the next
pipeline stage branches on.
"""

from __future__ import annotations

import struct

from mapreduce_machine_learning_spark.sources.tga import is_tga as _is_tga

__all__ = ["media_info", "is_mp3"]

_EMPTY = {
    "container": "unknown",
    "codec": "",
    "width": 0,
    "height": 0,
    "n_frames": 0,
    "sample_rate": 0,
    "duration_ms": 0,
    "decodable": False,
}


# ---------------------------------------------------------------------------
# MP3 frame-header walk (MPEG-1 Layer III)

_MP3_BITRATES = (  # kbit/s, MPEG-1 Layer III, index 1..14
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
)
_MP3_RATES = (44100, 48000, 32000)  # sample-rate index 0..2


def is_mp3(payload: bytes) -> bool:
    if payload[:3] == b"ID3":
        return True
    return (
        len(payload) >= 4
        and payload[0] == 0xFF
        and (payload[1] & 0xE0) == 0xE0
    )


def _skip_id3(payload: bytes) -> int:
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    size = 0
    for b in payload[6:10]:  # syncsafe 28-bit size
        size = (size << 7) | (b & 0x7F)
    return 10 + size


def _mp3_info(payload: bytes) -> dict:
    info = dict(_EMPTY, container="mp3", codec="MPEG audio")
    pos = _skip_id3(payload)
    n_frames = 0
    total_samples = 0
    rate = 0
    while pos + 4 <= len(payload):
        b0, b1, b2 = payload[pos], payload[pos + 1], payload[pos + 2]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            break
        version = (b1 >> 3) & 0x3  # 3 = MPEG-1
        layer = (b1 >> 1) & 0x3  # 1 = Layer III
        if version != 3 or layer != 1:
            info["codec"] = "MPEG audio (non MPEG-1 Layer III)"
            break
        br_idx = (b2 >> 4) & 0xF
        sr_idx = (b2 >> 2) & 0x3
        padding = (b2 >> 1) & 0x1
        if br_idx in (0, 15) or sr_idx == 3:
            break  # free-format or reserved: stop the walk
        bitrate = _MP3_BITRATES[br_idx] * 1000
        rate = _MP3_RATES[sr_idx]
        frame_len = 144 * bitrate // rate + padding
        if frame_len < 4 or pos + frame_len > len(payload):
            break
        n_frames += 1
        total_samples += 1152
        pos += frame_len
    if n_frames:
        info["codec"] = "MPEG-1 Layer III"
        info["sample_rate"] = rate
        info["duration_ms"] = total_samples * 1000 // rate
        info["n_frames"] = n_frames
    return info


# ---------------------------------------------------------------------------
# per-container header readers (each wrapped by media_info's net)


def _jpeg_info(p: bytes) -> dict:
    info = dict(_EMPTY, container="jpeg", codec="JPEG", n_frames=1)
    pos = 2
    while pos + 4 <= len(p):
        if p[pos] != 0xFF:
            break
        marker = p[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seg_len,) = struct.unpack_from(">H", p, pos + 2)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            sof = marker - 0xC0
            info["codec"] = f"JPEG SOF{sof}"
            if pos + 9 <= len(p):
                info["height"], info["width"] = struct.unpack_from(
                    ">HH", p, pos + 5
                )
            info["decodable"] = sof in (0, 1, 2)
            return info
        pos += 2 + seg_len
    return info


def _png_info(p: bytes) -> dict:
    info = dict(_EMPTY, container="png", codec="deflate", n_frames=1)
    if len(p) >= 24 and p[12:16] == b"IHDR":
        info["width"], info["height"] = struct.unpack_from(">II", p, 16)
        info["decodable"] = True
    return info


def _bmp_info(p: bytes) -> dict:
    info = dict(_EMPTY, container="bmp", n_frames=1)
    w, h = struct.unpack_from("<ii", p, 18)
    bpp, comp = struct.unpack_from("<H", p, 28)[0], struct.unpack_from(
        "<I", p, 30
    )[0]
    info["width"], info["height"] = abs(w), abs(h)
    info["codec"] = f"rgb{bpp}" if comp == 0 else f"bmp-compression-{comp}"
    info["decodable"] = bpp == 24 and comp == 0
    return info


def _gif_info(p: bytes) -> dict:
    info = dict(_EMPTY, container="gif", codec="lzw", decodable=True)
    info["width"], info["height"] = struct.unpack_from("<HH", p, 6)
    # block walk counting image descriptors — no LZW decode
    pos = 13
    flags = p[10]
    if flags & 0x80:
        pos += 3 * (2 << (flags & 0x7))
    frames = 0
    while pos < len(p):
        b = p[pos]
        if b == 0x2C:  # image descriptor
            frames += 1
            pos += 10
            local = p[pos - 1]
            if local & 0x80:
                pos += 3 * (2 << (local & 0x7))
            pos += 1  # LZW minimum code size
            while pos < len(p) and p[pos]:
                pos += 1 + p[pos]
            pos += 1
        elif b == 0x21:  # extension
            pos += 2
            while pos < len(p) and p[pos]:
                pos += 1 + p[pos]
            pos += 1
        else:  # trailer or junk
            break
    info["n_frames"] = frames
    if frames > 1:
        info["duration_ms"] = 100 * frames  # default 10 cs per frame
    return info


def _webp_info(p: bytes) -> dict:
    info = dict(_EMPTY, container="webp", n_frames=1)
    pos = 12
    while pos + 8 <= len(p):
        tag = p[pos : pos + 4]
        (size,) = struct.unpack_from("<I", p, pos + 4)
        body = pos + 8
        if tag == b"VP8L" and body + 5 <= len(p) and p[body] == 0x2F:
            bits = int.from_bytes(p[body + 1 : body + 5], "little")
            info["width"] = (bits & 0x3FFF) + 1
            info["height"] = ((bits >> 14) & 0x3FFF) + 1
            info["codec"] = "VP8L (lossless)"
            info["decodable"] = True
            return info
        if tag == b"VP8 " and body + 10 <= len(p):
            if p[body + 3 : body + 6] == b"\x9d\x01\x2a":
                w, h = struct.unpack_from("<HH", p, body + 6)
                info["width"] = w & 0x3FFF
                info["height"] = h & 0x3FFF
            info["codec"] = "VP8 (lossy)"
            return info
        if tag == b"VP8X" and body + 10 <= len(p):
            info["width"] = int.from_bytes(p[body + 4 : body + 7], "little") + 1
            info["height"] = (
                int.from_bytes(p[body + 7 : body + 10], "little") + 1
            )
            info["codec"] = "VP8X (extended)"
        pos = body + size + (size & 1)
    return info


def _wav_info(p: bytes) -> dict:
    info = dict(_EMPTY, container="wav")
    end = min(len(p), 8 + struct.unpack_from("<I", p, 4)[0])
    pos = 12
    fmt = None
    data_size = 0
    fact = -1
    while pos + 8 <= end:
        tag = p[pos : pos + 4]
        (size,) = struct.unpack_from("<I", p, pos + 4)
        if tag == b"fmt " and size >= 16:
            fmt = p[pos + 8 : pos + 8 + size]
        elif tag == b"data":
            data_size = min(size, len(p) - pos - 8)
        elif tag == b"fact" and size >= 4:
            fact = struct.unpack_from("<I", p, pos + 8)[0]
        pos += 8 + size + (size & 1)
    if fmt is None:
        return info
    ftag, ch, rate, byterate, _ba, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if ftag == 0xFFFE and len(fmt) >= 26:
        ftag = struct.unpack_from("<H", fmt, 24)[0]
    names = {
        1: (f"pcm{bits}", True),
        3: (f"float{bits}", True),
        0x11: ("IMA ADPCM", True),
        0x02: ("MS ADPCM", True),
        6: ("G.711 A-law (WAV)", False),
        7: ("G.711 µ-law (WAV)", False),
        0x55: ("MP3-in-WAV", False),
    }
    codec, dec = names.get(ftag, (f"wav-format-{ftag}", False))
    info["codec"], info["decodable"] = codec, dec
    info["sample_rate"] = rate
    if fact >= 0 and rate:
        info["duration_ms"] = fact * 1000 // rate
    elif byterate:
        info["duration_ms"] = data_size * 1000 // byterate
    return info


def _flac_info(p: bytes) -> dict:
    from mapreduce_machine_learning_spark.sources.flac import (
        _parse_streaminfo,
    )

    si = _parse_streaminfo(p[8:42])
    info = dict(_EMPTY, container="flac", codec="flac", decodable=True)
    info["sample_rate"] = si["rate"]
    if si["rate"]:
        info["duration_ms"] = si["total_samples"] * 1000 // si["rate"]
    return info


def _aiff_info(p: bytes) -> dict:
    from mapreduce_machine_learning_spark.sources.pcm_codecs import (
        _f80_unpack,
    )

    info = dict(_EMPTY, container="aiff")
    aifc = p[8:12] == b"AIFC"
    pos = 12
    codec = "pcm"
    while pos + 8 <= len(p):
        tag = p[pos : pos + 4]
        (size,) = struct.unpack_from(">I", p, pos + 4)
        if tag == b"COMM" and size >= 18:
            ch, nframes, bits = struct.unpack_from(">HIH", p, pos + 8)
            rate = _f80_unpack(p[pos + 16 : pos + 26])
            if aifc and size >= 22:
                codec = p[pos + 26 : pos + 30].decode("latin-1").strip()
            info["sample_rate"] = rate
            if rate:
                info["duration_ms"] = nframes * 1000 // rate
            info["codec"] = f"{codec}{bits}" if codec == "pcm" else codec
            info["decodable"] = codec in ("pcm", "NONE", "sowt")
        pos += 8 + size + (size & 1)
    return info


def _au_info(p: bytes) -> dict:
    info = dict(_EMPTY, container="au")
    _magic, off, size, enc, rate, _ch = struct.unpack_from(">IIIIII", p, 0)
    names = {
        1: ("G.711 µ-law", True),
        2: ("pcm8", True),
        3: ("pcm16", True),
        4: ("pcm24", True),
        5: ("pcm32", True),
        27: ("G.711 A-law", True),
        23: ("G.721 ADPCM", False),
    }
    codec, dec = names.get(enc, (f"au-encoding-{enc}", False))
    info["codec"], info["decodable"] = codec, dec
    info["sample_rate"] = rate
    widths = {1: 1, 2: 1, 3: 2, 4: 3, 5: 4, 27: 1}
    if rate and enc in widths and size != 0xFFFFFFFF:
        info["duration_ms"] = size // widths[enc] * 1000 // rate
    return info


def _sphere_info(p: bytes) -> dict:
    info = dict(_EMPTY, container="sphere", codec="pcm", decodable=True)
    head = p[: min(len(p), 1024)].decode("latin-1", "replace")
    for line in head.splitlines():
        parts = line.split()
        if len(parts) == 3:
            if parts[0] == "sample_rate":
                info["sample_rate"] = int(parts[2]) if parts[2].isdigit() else 0
            elif parts[0] == "sample_count" and parts[2].isdigit():
                info["n_frames"] = 0
                if info["sample_rate"]:
                    info["duration_ms"] = (
                        int(parts[2]) * 1000 // info["sample_rate"]
                    )
            elif parts[0] == "sample_coding":
                coding = parts[2]
                info["codec"] = coding
                info["decodable"] = coding.startswith(("pcm", "ulaw", "alaw"))
    return info


def _ogg_info(p: bytes) -> dict:
    info = dict(_EMPTY, container="ogg")
    # first page: 27-byte header + segment table, then the first packet
    if len(p) < 28:
        return info
    nsegs = p[26]
    body = 27 + nsegs
    first = p[body : body + 16]
    if first[:5] == b"\x7fFLAC":
        info["codec"] = "FLAC-in-Ogg"
        info["decodable"] = True
        # mapping packet: 7fFLAC maj min nheaders(2) 'fLaC' STREAMINFO
        si = body + 9 + 4  # start of the STREAMINFO block header
        if si + 38 <= len(p):
            from mapreduce_machine_learning_spark.sources.flac import (
                _parse_streaminfo,
            )

            st = _parse_streaminfo(p[si + 4 : si + 38])
            info["sample_rate"] = st["rate"]
            if st["rate"]:
                info["duration_ms"] = (
                    st["total_samples"] * 1000 // st["rate"]
                )
    elif first[:7] == b"\x01vorbis":
        info["codec"] = "Vorbis"
        if body + 16 <= len(p):
            info["sample_rate"] = struct.unpack_from("<I", p, body + 12)[0]
    elif first[:8] == b"OpusHead":
        info["codec"] = "Opus"
        if body + 16 <= len(p):
            info["sample_rate"] = struct.unpack_from("<I", p, body + 12)[0]
    return info


def _avi_info(p: bytes) -> dict:
    from mapreduce_machine_learning_spark.sources.avi import (
        avi_codec,
        avi_fps,
    )

    info = dict(_EMPTY, container="avi")
    i = p.find(b"avih")
    if 0 <= i and i + 48 <= len(p):
        total = struct.unpack_from("<I", p, i + 24)[0]
        w, h = struct.unpack_from("<II", p, i + 40)
        info["n_frames"], info["width"], info["height"] = total, w, h
    codec = avi_codec(p)
    fps = avi_fps(p)
    info["codec"] = codec
    info["decodable"] = codec in ("dib", "mjpg")
    if fps and info["n_frames"]:
        info["duration_ms"] = info["n_frames"] * 1000 // fps
    return info


def _y4m_info(p: bytes) -> dict:
    from mapreduce_machine_learning_spark.sources.y4m import _parse_header

    pos, w, h, fn, fd, sub = _parse_header(p)
    csize = 0 if sub is None else (w // sub[0]) * (h // sub[1])
    frame_bytes = 6 + w * h + 2 * csize  # FRAME\n + planes
    n = max(0, (len(p) - pos)) // frame_bytes
    info = dict(
        _EMPTY, container="y4m", codec="rawvideo", decodable=True
    )
    info["width"], info["height"], info["n_frames"] = w, h, n
    if fn:
        info["duration_ms"] = n * 1000 * fd // fn
    return info


def _mp4_info(p: bytes) -> dict:
    from mapreduce_machine_learning_spark.sources.mp4 import (
        _NAMED_CODECS,
        _video_track,
    )

    info = dict(_EMPTY, container="mp4")
    codec, ts, ranges, delta = _video_track(p)
    info["codec"] = _NAMED_CODECS.get(codec, codec.decode("latin-1"))
    info["decodable"] = codec == b"jpeg"
    info["n_frames"] = len(ranges)
    if ts and delta:
        info["duration_ms"] = len(ranges) * delta * 1000 // ts
    # geometry from the first sample description (VisualSampleEntry)
    i = p.find(b"stsd")
    if i >= 0 and i + 48 <= len(p):
        entry = i + 12  # past box type + version/flags + entry count
        info["width"], info["height"] = struct.unpack_from(
            ">HH", p, entry + 32
        )
    return info


def _tiff_info(p: bytes) -> dict:
    from mapreduce_machine_learning_spark.sources import tiff as t

    info = dict(_EMPTY, container="tiff", n_frames=1)
    lt = "<" if p[:2] == b"II" else ">"
    tags = t._read_ifd(p, lt)
    info["width"] = tags.get(t._T_WIDTH, [0])[0]
    info["height"] = tags.get(t._T_HEIGHT, [0])[0]
    comp = tags.get(t._T_COMPRESSION, [1])[0]
    names = {1: "none", 5: "lzw", 32773: "packbits", 6: "jpeg-in-tiff",
             7: "jpeg-in-tiff", 2: "ccitt", 3: "ccitt", 4: "ccitt"}
    info["codec"] = names.get(comp, f"tiff-compression-{comp}")
    spp = tags.get(t._T_SAMPLES, [1])[0]
    bits = tags.get(t._T_BITS, [8])[0]
    info["decodable"] = (
        comp in (1, 5, 32773) and spp in (1, 3) and bits in (8, 16)
    )
    return info


def _netpbm_info(p: bytes) -> dict:
    from mapreduce_machine_learning_spark.sources.netpbm import _tokens

    kind = p[1] - ord("0")
    (w, h), _pos = _tokens(p, 2, 2)
    info = dict(
        _EMPTY,
        container="netpbm",
        codec=f"P{kind}",
        decodable=True,
        n_frames=1,
    )
    info["width"], info["height"] = w, h
    return info


def _tga_info(p: bytes) -> dict:
    from mapreduce_machine_learning_spark.sources.tga import _header

    id_len, _cm, img_type, w, h, bpp, _desc = _header(p)
    info = dict(_EMPTY, container="tga", decodable=True, n_frames=1)
    info["codec"] = ("rle" if img_type in (10, 11) else "raw") + str(bpp)
    info["width"], info["height"] = w, h
    return info


def media_info(payload: bytes) -> dict:
    """Catalog one payload from headers alone (see module docstring).
    Never raises; unknown or corrupt payloads degrade to partial
    fields with ``decodable=False``."""
    p = bytes(payload)
    sniffs = [
        (lambda: len(p) > 14 and p[:2] == b"BM", _bmp_info),
        (lambda: p[:8] == b"\x89PNG\r\n\x1a\n", _png_info),
        (lambda: p[:3] == b"\xff\xd8\xff", _jpeg_info),
        (lambda: p[:4] in (b"GIF8",) and len(p) > 13, _gif_info),
        (
            lambda: p[:4] == b"RIFF" and p[8:12] == b"WEBP",
            _webp_info,
        ),
        (
            lambda: p[:4] == b"RIFF" and p[8:12] == b"WAVE" and len(p) > 44,
            _wav_info,
        ),
        (
            lambda: p[:4] == b"RIFF" and p[8:12] == b"AVI " and len(p) > 44,
            _avi_info,
        ),
        (lambda: p[:4] == b"fLaC" and len(p) > 42, _flac_info),
        (
            lambda: p[:4] == b"FORM" and p[8:12] in (b"AIFF", b"AIFC"),
            _aiff_info,
        ),
        (lambda: p[:4] == b".snd" and len(p) >= 24, _au_info),
        (lambda: p[:7] == b"NIST_1A", _sphere_info),
        (lambda: p[:4] == b"OggS", _ogg_info),
        (lambda: p[:10] == b"YUV4MPEG2 ", _y4m_info),
        (
            lambda: len(p) >= 16
            and p[4:8] in (b"ftyp", b"moov", b"mdat", b"free", b"wide"),
            _mp4_info,
        ),
        (lambda: p[:4] in (b"II*\x00", b"MM\x00*"), _tiff_info),
        (
            lambda: len(p) > 2
            and p[0:1] == b"P"
            and p[1:2] in b"123456"
            and p[2] in b" \t\r\n\x0b\x0c#",
            _netpbm_info,
        ),
        (lambda: is_mp3(p), _mp3_info),
        # structural sniff, no magic: must stay LAST
        (lambda: _is_tga(p), _tga_info),
    ]
    for sniff, reader in sniffs:
        try:
            if sniff():
                return reader(p)
        except Exception:
            # a matched container with an unreadable header: report the
            # container, nothing else — the catalog contract
            return dict(_EMPTY, container=reader.__name__[1:-5])
    return dict(_EMPTY)
