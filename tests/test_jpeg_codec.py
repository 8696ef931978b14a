"""Baseline JPEG codec (sources/jpeg.py): Huffman + numpy DCT, no libjpeg.

JPEG is lossy by construction, so unlike the BMP/PNG/WAV tests these pin
ERROR BOUNDS rather than bit-exact round-trips — plus the structural
invariants that ARE exact: stream markers, dimensions, restart-marker
equivalence, quality-100 smooth-content reconstruction, progressive
(SOF2) streams decoding bit-identically to their baseline twins, and the
decoder's seams (extended SOF1, 12-bit precision, 16-bit quant tables).

There is no independent JPEG decoder in this container (no PIL/imageio —
that absence is why the codec exists), so cross-validation is structural:
the encoder writes standard Annex-K tables as explicit DQT/DHT segments,
and the decoder is driven ONLY by what it parses from the stream — a table
mismatch or marker-layout bug breaks the round-trip rather than cancelling
out.
"""

import struct

import numpy as np
import pytest

from mapreduce_machine_learning_spark.sources.jpeg import (
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
    is_jpeg,
)
from mapreduce_machine_learning_spark.sources.multimodal import (
    decode_image,
    fake_features,
    features_for,
    real_image_features,
    resize_image,
)


def _gradient(h, w, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            (xx * (3 + seed) + yy) % 256,
            (yy * (5 + seed)) % 256,
            (xx + yy * 2 + seed) % 256,
        ],
        axis=2,
    ).astype(np.uint8)


def test_zigzag_is_a_permutation_with_known_anchors():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # spec anchors: DC first, then (0,1), (1,0), (2,0), (1,1), (0,2)
    assert ZIGZAG[:6].tolist() == [0, 1, 8, 16, 9, 2]
    assert ZIGZAG[-1] == 63


def test_round_trip_error_bounded_444_and_420():
    arr = _gradient(19, 26, seed=4)
    for sub, bound in ((False, 12), (True, 16)):
        back = decode_jpeg(encode_jpeg(arr, quality=90, subsample=sub))
        assert back.shape == arr.shape
        err = np.abs(back.astype(int) - arr.astype(int))
        assert err.max() <= bound, (sub, err.max())
        assert err.mean() <= 3.0, (sub, err.mean())


def test_422_and_transpose_round_trip_error_bounded():
    # (2,1) = 4:2:2 and (1,2) = its transpose: asymmetric MCUs (2x1 /
    # 1x2 luma blocks per MCU) — the sampling geometries between 4:4:4
    # and 4:2:0, claimed by the decoder and reachable via the encoder's
    # explicit (h, v) pair
    arr = _gradient(21, 19, seed=6)
    for pair in ((2, 1), (1, 2)):
        back = decode_jpeg(encode_jpeg(arr, quality=90, subsample=pair))
        assert back.shape == arr.shape, pair
        err = np.abs(back.astype(int) - arr.astype(int))
        assert err.max() <= 16 and err.mean() <= 3.0, (pair, err.max())


def test_quality_monotonicity():
    arr = _gradient(16, 24, seed=1)
    errs = []
    for q in (50, 75, 95):
        back = decode_jpeg(encode_jpeg(arr, quality=q))
        errs.append(np.abs(back.astype(int) - arr.astype(int)).mean())
    assert errs[0] >= errs[1] >= errs[2]


def test_quality_100_is_near_exact_on_smooth_content():
    # all quant divisors are 1 at q=100: only DCT + color-transform
    # rounding remains, and a uniform image survives both exactly
    flat = np.full((10, 13, 3), 120, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(flat, 100)), flat)
    grad = np.repeat(
        np.tile(np.arange(24, dtype=np.uint8) * 10 % 250, (16, 1))[..., None],
        3,
        axis=2,
    )
    back = decode_jpeg(encode_jpeg(grad, 100))
    assert np.abs(back.astype(int) - grad.astype(int)).max() <= 1


def test_worst_case_ac_magnitude_stays_inside_huffman_categories():
    # quality 100 -> quant divisors all 1. The AC-maximizing uint8 input
    # is the sign pattern of the (4,4) DCT basis (NOT the plain
    # checkerboard, whose energy lands at (7,7) ~ +-837): it drives one
    # coefficient to 127*4 + 128*4 = +-1020, just under the 10-bit
    # baseline Huffman ceiling of +-1023. Encoding must take the s=10
    # category, not crash — and the round-trip must stay near-exact.
    s = np.sign(np.cos((2 * np.arange(8) + 1) * np.pi / 4)).astype(int)
    tile = np.where(np.outer(s, s) > 0, 255, 0).astype(np.uint8)
    arr = np.repeat(np.tile(tile, (2, 2))[..., None], 3, axis=2)
    back = decode_jpeg(encode_jpeg(arr, quality=100))
    assert np.abs(back.astype(int) - arr.astype(int)).max() <= 2


def test_odd_dimensions_pad_and_crop_correctly():
    # non-multiples of 8 (4:4:4) and of 16 (4:2:0) exercise edge padding
    for h, w in ((1, 1), (7, 9), (17, 33), (8, 16)):
        arr = _gradient(h, w, seed=h * w)
        for sub in (False, True):
            back = decode_jpeg(encode_jpeg(arr, 90, subsample=sub))
            assert back.shape == (h, w, 3), (h, w, sub)


def test_restart_markers_decode_identically():
    arr = _gradient(33, 41, seed=7)
    base = decode_jpeg(encode_jpeg(arr, 90, subsample=True))
    for ri in (1, 2, 5):
        with_rst = decode_jpeg(
            encode_jpeg(arr, 90, subsample=True, restart_interval=ri)
        )
        assert np.array_equal(base, with_rst), ri
    # and the stream genuinely contains RST markers + a DRI segment
    p = encode_jpeg(arr, 90, subsample=True, restart_interval=1)
    assert b"\xff\xdd" in p  # DRI
    assert any(bytes([0xFF, 0xD0 + i]) in p for i in range(8))


def test_grayscale_stream_decodes_to_replicated_rgb():
    # hand-build a 1-component stream by rewriting SOF/SOS of an encoded
    # gray image: encoder output for a gray RGB image has Cb=Cr=128, so
    # dropping the chroma components must reproduce the luma plane
    g = np.repeat(
        (np.arange(8, dtype=np.uint8) * 30 % 240).reshape(1, 8), 8, axis=0
    )
    arr = np.repeat(g[..., None], 3, axis=2)
    full = decode_jpeg(encode_jpeg(arr, 100))
    # gray in == R=G=B out (within DCT rounding)
    assert np.abs(full[..., 0].astype(int) - full[..., 1].astype(int)).max() <= 1
    assert np.abs(full.astype(int) - arr.astype(int)).max() <= 1


def test_seams_raise_not_implemented():
    arr = _gradient(8, 8)
    payload = bytearray(encode_jpeg(arr, 90))
    sof_at = bytes(payload).find(b"\xff\xc0")
    assert sof_at > 0
    # SOF2 itself decodes since round 10, but flipping a BASELINE stream's
    # marker makes the scan header illegal for a progressive frame (an
    # interleaved scan must be DC-only) — still a clean quarantine
    prog = bytearray(payload)
    prog[sof_at + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="DC and AC"):
        decode_jpeg(bytes(prog))
    # 8-bit extended sequential (SOF1) is syntactically baseline, so the
    # marker flip decodes IDENTICALLY (round 10); lossless SOF3 raises
    ext = bytearray(payload)
    ext[sof_at + 1] = 0xC1
    assert np.array_equal(decode_jpeg(bytes(ext)), decode_jpeg(bytes(payload)))
    lossless = bytearray(payload)
    lossless[sof_at + 1] = 0xC3
    with pytest.raises(NotImplementedError, match="SOF"):
        decode_jpeg(bytes(lossless))
    # 12-bit precision
    deep = bytearray(payload)
    deep[sof_at + 4] = 12
    with pytest.raises(NotImplementedError, match="12-bit"):
        decode_jpeg(bytes(deep))
    # 16-bit quant table: flip Pq nibble of the first DQT
    dqt_at = bytes(payload).find(b"\xff\xdb")
    wide = bytearray(payload)
    wide[dqt_at + 4] |= 0x10
    with pytest.raises(NotImplementedError, match="16-bit"):
        decode_jpeg(bytes(wide))
    # not a JPEG at all
    with pytest.raises(NotImplementedError, match="not a JPEG"):
        decode_jpeg(b"BM" + bytes(100))


def test_corrupt_jpeg_quarantines_in_features_for():
    # lying magic / truncated body must degrade to the md5 stand-in —
    # the quarantine contract shared by all codecs (one corrupt row
    # cannot kill a 100k-row task)
    corrupt = b"\xff\xd8\xff\xe0" + b"\x07" * 64
    assert list(features_for(corrupt)) == list(fake_features(corrupt))
    truncated = encode_jpeg(_gradient(16, 16), 90)[:40]
    if is_jpeg(truncated):
        assert list(features_for(truncated)) == list(fake_features(truncated))


def test_dispatch_and_real_features():
    p = encode_jpeg(_gradient(12, 17, seed=2), 92)
    assert is_jpeg(p)
    arr = decode_image(p)  # routed through the JPEG decoder
    assert arr.shape == (12, 17, 3)
    assert list(features_for(p)) == list(real_image_features(arr))


def test_resize_is_format_preserving_and_bounded():
    src_payload = encode_jpeg(_gradient(16, 20, seed=3), 95)
    out_payload = resize_image(src_payload, 8, 6)
    assert is_jpeg(out_payload)  # JPEG in -> JPEG out
    resized = decode_image(out_payload)
    assert resized.shape == (6, 8, 3)
    # vs exact nearest-neighbor of the DECODED source: only the
    # re-encode loss remains, and it is bounded
    src = decode_image(src_payload)
    yi = np.minimum((np.arange(6) * 16) // 6, 15)
    xi = np.minimum((np.arange(8) * 20) // 8, 19)
    want = src[yi][:, xi]
    assert np.abs(resized.astype(int) - want.astype(int)).max() <= 16


def test_stream_structure_is_canonical_jfif():
    p = encode_jpeg(_gradient(8, 8), 90)
    assert p[:2] == b"\xff\xd8" and p[-2:] == b"\xff\xd9"
    assert p[2:4] == b"\xff\xe0" and p[6:11] == b"JFIF\x00"
    # two DQTs, four DHTs, one SOF0, one SOS
    assert p.count(b"\xff\xdb") == 2
    assert p.count(b"\xff\xc4") == 4
    assert p.count(b"\xff\xc0") == 1
    assert p.count(b"\xff\xda") == 1
    # SOF0 carries the true dimensions
    at = p.find(b"\xff\xc0")
    _, h, w, n = struct.unpack_from(">BHHB", p, at + 4)
    assert (h, w, n) == (8, 8, 3)


# ---- ADVICE r9 regressions: standalone markers, fill bytes before RST ----


def _entropy_start(p):
    """Offset of the first entropy-coded byte (just past the SOS segment)."""
    pos = 2
    while p[pos : pos + 2] != b"\xff\xda":
        (seglen,) = struct.unpack_from(">H", p, pos + 2)
        pos += 2 + seglen
    (seglen,) = struct.unpack_from(">H", p, pos + 2)
    return pos + 2 + seglen


def test_standalone_markers_in_header_are_skipped():
    # TEM (0xFF01) and stray RSTn are standalone (B.1.1.3): no length
    # segment follows. A walker that reads one desynchronizes (ADVICE r9).
    arr = _gradient(17, 23, seed=4)
    clean = encode_jpeg(arr, 85)
    for standalone in (b"\xff\x01", b"\xff\xd3", b"\xff\x01\xff\xd0"):
        weird = clean[:2] + standalone + clean[2:]
        assert np.array_equal(decode_jpeg(weird), decode_jpeg(clean)), (
            standalone
        )


def test_fill_bytes_before_restart_markers_decode_identically():
    # B.1.1.2: any number of 0xFF fill bytes may precede a marker. The
    # segment splitter used to read a fill run before an RSTn as the scan
    # terminator and fail the tail of the image (ADVICE r9).
    arr = _gradient(33, 41, seed=11)
    clean = encode_jpeg(arr, 90, subsample=True, restart_interval=2)
    ent = _entropy_start(clean)
    head, scan = clean[:ent], clean[ent:]
    for n_fill in (1, 3):
        padded = scan
        for i in range(8):  # pad EVERY RSTn occurrence in the scan
            padded = padded.replace(
                bytes([0xFF, 0xD0 + i]),
                b"\xff" * n_fill + bytes([0xFF, 0xD0 + i]),
            )
        assert padded != scan  # the stream really contains RST markers
        assert np.array_equal(
            decode_jpeg(head + padded), decode_jpeg(clean)
        ), n_fill


# ---- round 10: progressive (SOF2) decode + encode ----

from mapreduce_machine_learning_spark.sources.jpeg import (  # noqa: E402
    encode_jpeg_progressive,
)


def test_progressive_decodes_bit_identically_to_baseline():
    # same quantized coefficients, different scan layout -> same pixels,
    # across every subsampling geometry and a quality sweep
    arr = _gradient(33, 41, seed=2)
    for sub in (False, True, (2, 1), (1, 2)):
        for q in (50, 90, 100):
            base = decode_jpeg(encode_jpeg(arr, q, subsample=sub))
            prog = decode_jpeg(
                encode_jpeg_progressive(arr, q, subsample=sub)
            )
            assert np.array_equal(base, prog), (sub, q)


def test_progressive_noise_and_odd_dims_exact():
    # noise maximizes symbol variety (ZRL, long refinement runs); odd
    # dims exercise partial-MCU grids in both scan orders
    rng = np.random.default_rng(5)
    for h, w in ((8, 8), (9, 57), (17, 23), (64, 48)):
        arr = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        for sub in (False, True):
            base = decode_jpeg(encode_jpeg(arr, 85, subsample=sub))
            prog = decode_jpeg(
                encode_jpeg_progressive(arr, 85, subsample=sub)
            )
            assert np.array_equal(base, prog), (h, w, sub)


def test_progressive_smooth_content_exercises_eob_runs():
    # a flat image quantizes to all-zero AC bands -> the encoder emits
    # real EOBn symbols (r > 0) and the decoder must skip whole blocks
    arr = np.full((64, 64, 3), 100, np.uint8)
    p = encode_jpeg_progressive(arr, 50)
    assert np.array_equal(decode_jpeg(p), decode_jpeg(encode_jpeg(arr, 50)))
    # and it genuinely used runs: far fewer bytes than one-EOB-per-block
    assert len(p) < 1500


def test_progressive_restart_markers_decode_identically():
    arr = _gradient(33, 41, seed=9)
    base = decode_jpeg(encode_jpeg(arr, 90, subsample=True))
    for ri in (1, 2, 5):
        p = encode_jpeg_progressive(
            arr, 90, subsample=True, restart_interval=ri
        )
        assert any(bytes([0xFF, 0xD0 + i]) in p for i in range(8)), ri
        assert np.array_equal(decode_jpeg(p), base), ri


def test_progressive_stream_structure():
    p = encode_jpeg_progressive(_gradient(16, 16), 90)
    assert p[:2] == b"\xff\xd8" and p[-2:] == b"\xff\xd9"
    assert b"\xff\xc2" in p and b"\xff\xc0" not in p  # SOF2, no SOF0
    # ten SOS scans, and a DHT that arrives AFTER the first scan
    n_sos = p.count(b"\xff\xda")
    assert n_sos == 10
    first_sos = p.find(b"\xff\xda")
    assert p.find(b"\xff\xc4", first_sos) > 0  # mid-stream DHT (B.2.4)


def test_progressive_truncated_stream_quarantines():
    p = encode_jpeg_progressive(_gradient(24, 24), 90)
    with pytest.raises(NotImplementedError):
        decode_jpeg(p[: len(p) // 3])
    # corrupt entropy data inside a scan quarantines too
    broken = bytearray(p)
    at = p.find(b"\xff\xda") + 200
    for i in range(at, min(at + 30, len(broken) - 2)):
        broken[i] ^= 0x5A
    try:
        decode_jpeg(bytes(broken))  # may decode to junk pixels...
    except NotImplementedError:
        pass  # ...or raise at the seam — either way, no crash


# ---- round 10: 12-bit precision + 16-bit quant tables (SOF1) ----

from mapreduce_machine_learning_spark.sources.jpeg import (  # noqa: E402
    encode_jpeg_12bit,
)


def test_12bit_stream_decodes_bit_identically_to_8bit_baseline():
    # the 12-bit pipeline scales samples AND quant tables by 16, so the
    # quantized coefficients equal the baseline's and the >>4 output
    # rescale divides exactly: decode must be BIT-IDENTICAL
    rng = np.random.default_rng(6)
    for h, w in ((16, 16), (17, 23), (33, 41)):
        arr = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        for sub in (False, True):
            for q in (50, 90):
                base = decode_jpeg(encode_jpeg(arr, q, subsample=sub))
                deep = decode_jpeg(encode_jpeg_12bit(arr, q, subsample=sub))
                assert np.array_equal(base, deep), (h, w, sub, q)


def test_12bit_stream_structure():
    p = encode_jpeg_12bit(_gradient(16, 16), 90)
    sof_at = p.find(b"\xff\xc1")
    assert sof_at > 0 and p[sof_at + 4] == 12  # SOF1, precision 12
    dqt_at = p.find(b"\xff\xdb")
    assert p[dqt_at + 4] >> 4 == 1  # Pq=1: 16-bit entries
    (seglen,) = struct.unpack_from(">H", p, dqt_at + 2)
    assert seglen == 2 + 1 + 128  # one 16-bit table per segment
    # and the tables genuinely need 16 bits (entries > 255 exist)
    vals = np.frombuffer(p, ">u2", 64, dqt_at + 5)
    assert vals.max() > 255


def test_12bit_is_sof1_only():
    # 12-bit under a BASELINE (SOF0) marker is illegal per T.81 and raises
    p = bytearray(encode_jpeg_12bit(_gradient(8, 8), 90))
    at = bytes(p).find(b"\xff\xc1")
    p[at + 1] = 0xC0
    with pytest.raises(NotImplementedError, match="12-bit"):
        decode_jpeg(bytes(p))


def test_progressive_dc_guard_bounds_the_shifted_store():
    """ADVICE r12: the DC predictor guard must bound preds << al (the
    value actually stored into the int32 coefstore), not preds alone —
    otherwise a corrupt stream with a high successive-approximation
    shift silently wraps on numpy 1.x and escapes as OverflowError on
    numpy 2.x. Crafted stream: one code of length 1 → DC category 15,
    each block's 15 magnitude bits all ones → +32767 per block; by
    block 3 the predictor (98301) is far below the old 2^30 bound but
    98301 << 15 exceeds int32. The guard must quarantine instead."""
    from mapreduce_machine_learning_spark.sources.jpeg import (
        _BitReader,
        _build_decode_lut,
        _prog_dc_first,
    )

    lut = _build_decode_lut([1] + [0] * 15, [15])
    # three blocks of (1-bit huff code "0") + (15 ones) = 0x7FFF each,
    # 0xFF bytes byte-stuffed as the spec requires, then EOI
    entropy = b"\x7f\xff\x00" * 3 + b"\xff\xd9"
    scan = [{"cid": 1, "h": 1, "v": 1, "td": 0, "tq": 0}]
    coefstore = {1: np.zeros((1, 3, 64), np.int32)}  # 8x24 image: 3 blocks
    al = 15
    with pytest.raises(NotImplementedError):
        _prog_dc_first(
            _BitReader(entropy, 0), scan, scan, coefstore,
            {(0, 0): lut}, 8, 24, 0, al,
        )
    # the blocks decoded BEFORE the guard fired stored in-range values
    stored = coefstore[1][0, :, 0]
    assert stored[0] == 32767 << al
    assert np.all(np.abs(stored.astype(np.int64)) <= np.iinfo(np.int32).max)
    # and a legitimate stream with the same al decodes: one block, +1
    one = b"\x40\x00\xff\xd9"  # code "0", magnitude bit 1, padding
    coefstore = {1: np.zeros((1, 1, 64), np.int32)}
    lut1 = _build_decode_lut([1] + [0] * 15, [1])  # category 1
    _prog_dc_first(
        _BitReader(one, 0), scan, scan, coefstore, {(0, 0): lut1}, 8, 8, 0, al,
    )
    assert coefstore[1][0, 0, 0] == 1 << al
