"""Sample-rate conversion for the media pipeline — pure numpy.

A training-data audio pipeline normalizes heterogeneous corpora (8 kHz
telephony, 44.1 kHz music, 48 kHz video soundtracks) to one model rate;
this module is that stage's kernel. Windowed-sinc interpolation at
fractional positions, fully vectorized:

- works for ANY rate pair (no rational-factor restriction — 44.1 kHz →
  16 kHz needs no 160/441 polyphase bookkeeping);
- anti-aliased on downsampling: the lowpass cutoff tracks
  ``min(rate_in, rate_out)/2`` and the filter support widens by the
  decimation factor, so out-of-band energy is attenuated, not folded;
- deterministic: same input bytes and rates → same output bytes on any
  host, partitioning, or chunk size — every output sample is an
  independent dot product over the same float64 weights (IEEE-exact),
  and chunking only batches rows, never changes them (pinned in
  tests/test_resample.py);
- memory-bounded: output computed in chunks whose (chunk x taps)
  weight matrix stays ~32 MB regardless of payload length or
  decimation factor — the property that lets one Arrow batch of long
  audio rows resample inside a fixed executor memory budget.

The Hann-windowed sinc with 16 taps per side (scaled by the decimation
factor) gives ~44 dB stopband rejection — adequate for feature
pipelines; a deployment needing mastering-grade SRC plugs a native
resampler in at the same seam the codecs use (``sources/native.py``
pattern).
"""

from __future__ import annotations

import numpy as np

__all__ = ["resample_audio"]

#: base one-sided tap count at unity ratio (total taps = 2x, scaled by
#: the decimation factor when downsampling)
_BASE_TAPS = 16

#: transition-band margin below Nyquist — keeps the passband flat while
#: the Hann-windowed sinc rolls off before the fold frequency
_ROLLOFF = 0.945

#: weight-matrix budget: chunk * 2H float64 elements (~32 MiB)
_CHUNK_ELEMS = 1 << 22


def resample_audio(
    samples: "np.ndarray",
    rate_in: int,
    rate_out: int,
    _chunk_elems: int = _CHUNK_ELEMS,
) -> "np.ndarray":
    """int16 mono at ``rate_out`` from int16 mono at ``rate_in``.

    Output length is ``round(n * rate_out / rate_in)`` (at least 1 for
    non-empty input). ``rate_in == rate_out`` short-circuits to a copy —
    the identity conversion is bit-exact, not merely close.
    ``_chunk_elems`` caps the weight-matrix size (test hook; the output
    is chunk-size-invariant by construction).
    """
    if rate_in <= 0 or rate_out <= 0:
        raise ValueError(f"rates must be positive, got {rate_in}->{rate_out}")
    x = np.asarray(samples, dtype=np.int16).reshape(-1)
    if rate_in == rate_out:
        return x.copy()
    n = len(x)
    if n == 0:
        return x.copy()
    ratio = rate_out / rate_in
    n_out = max(1, int(round(n * ratio)))
    # downsampling stretches the filter by the decimation factor so the
    # narrower cutoff keeps enough taps to actually attenuate
    stretch = max(1.0, 1.0 / ratio)
    half = int(np.ceil(_BASE_TAPS * stretch))
    fc = 0.5 * min(1.0, ratio) * _ROLLOFF  # cutoff, input-rate units
    xpad = np.zeros(n + 2 * half, np.float64)
    xpad[half : half + n] = x
    offs = np.arange(-half + 1, half + 1)  # 2*half taps; |u| < half below
    out = np.empty(n_out, np.float64)
    # floor of 1, not a fixed block: at extreme decimation (half grows
    # with rate_in/rate_out) even one output row's taps may approach the
    # budget, and a fixed 1024-row floor would multiply it past it
    step = max(1, _chunk_elems // (2 * half))
    for lo in range(0, n_out, step):
        hi = min(lo + step, n_out)
        # output-sample positions in input-sample units
        t = np.arange(lo, hi, dtype=np.float64) * rate_in / rate_out
        k0 = np.floor(t).astype(np.int64)
        idx = k0[:, None] + offs[None, :]
        u = t[:, None] - idx
        w = 2.0 * fc * np.sinc(2.0 * fc * u)
        w *= 0.5 * (1.0 + np.cos(np.pi * u / half))  # Hann taper, |u| < half
        w /= w.sum(axis=1, keepdims=True)  # unity DC gain per output sample
        out[lo:hi] = np.einsum("ij,ij->i", w, xpad[idx + half])
    return np.clip(np.rint(out), -32768, 32767).astype(np.int16)
