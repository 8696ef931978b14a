"""Optional native-codec seam for the media decode stage.

The pure-Python decoders in this package are correct and fully
quarantined, but their throughput is the one honest bottleneck of the
media pipeline at 100 TB scale (``MEDIA_pipeline_probe``: JPEG ~1 MB/s
per core, VP8L ~1.7 MB/s — 50-100x below libjpeg-class codecs). This
module is the escape hatch: a deployment that installs a native backend
(Pillow for images, soundfile for audio) gets it picked up automatically
by ``decode_image`` / ``decode_audio`` in ``multimodal.py``, with the
pure decoders as the always-present fallback — no pipeline, schema, or
plan changes.

Backend contract
----------------
image backend:  ``decode(payload: bytes) -> np.ndarray uint8 (h, w, 3)``
                (RGB, alpha dropped — same presentation as the pure
                decoders)
audio backend:  ``decode(payload: bytes) -> (np.ndarray int16 mono, rate)``
                (channel 0 of multi-channel audio, matching the pure
                decoders' deterministic downmix)
resample backend: ``fn(samples: np.ndarray int16 mono, rate_in, rate_out)
                -> np.ndarray int16 mono`` of EXACTLY
                ``max(1, round(n * rate_out / rate_in))`` samples — the
                length contract of the pure windowed-sinc kernel
                (``sources/resample.py``), so duration accounting is
                backend-independent. The built-in soxr/scipy wrappers
                trim or zero-pad their library's ceil-length output to
                this contract; a custom backend must conform itself
                (nonconforming length falls back, like any other
                nonconforming output).

A backend signals "can't decode this payload" by raising ANY exception;
the dispatcher then falls through to the pure decoders, whose
``NotImplementedError`` quarantine contract is the single escape seam.
A native backend therefore NEVER weakens quarantine — it can only add
formats or speed.

Parity
------
For the lossless formats (BMP, PNG, GIF stills, lossless WebP, and all
PCM audio containers) a conforming native backend is bit-identical to
the pure decoders. For JPEG, IDCT rounding differs across
implementations: the documented tolerance is <=2 levels per sample
(T.81 Annex A accuracy class). For resampling, any two good SRCs agree
only to their filters' stopband/transition error — the documented
tolerance is interior-sample agreement with the pure kernel within
~-40 dB of full scale on passband content (edges excluded by one
filter support). All are pinned in ``tests/test_native_seam.py`` — the
real-backend tests run wherever Pillow/soundfile/soxr/scipy are
installed and skip cleanly where they are not.

Determinism caveat (read before enabling on a cluster)
------------------------------------------------------
``features_for`` is deterministic per-payload GIVEN a fixed backend. A
fleet where some executors resolve a native backend and others do not
would make lossy-format features (and any format only the native side
can decode) partition-placement-dependent. Deployments must be
codec-homogeneous; ``set_backend("pure")`` (or
``SPARK_GRAFT_CODEC_BACKEND=pure``) forces the pure decoders fleet-wide
and restores environment-independent output.
"""

from __future__ import annotations

import io
import os
from typing import Callable, Optional

import numpy as np

__all__ = [
    "set_backend",
    "get_backend",
    "register_backend",
    "clear_backends",
    "active_image_backend",
    "active_audio_backend",
    "active_resample_backend",
    "native_decode_image",
    "native_decode_audio",
    "native_resample_audio",
    "backend_report",
]

_VALID_MODES = ("auto", "pure", "native")

# mode: "auto" = native when importable, pure otherwise (the default);
# "pure" = never consult native backends; "native" = require a backend
# (dispatch raises if none resolves — for smoke-testing an install).
_mode: str = os.environ.get("SPARK_GRAFT_CODEC_BACKEND", "auto").lower()
if _mode not in _VALID_MODES:
    _mode = "auto"

# explicit registrations (tests, custom deployments) take precedence
# over probed ones; value None means "explicitly probed, nothing found"
_registered: dict = {}
_probed: dict = {}


def set_backend(mode: str) -> None:
    """Set the dispatch mode: "auto" (default), "pure", or "native"."""
    global _mode
    if mode not in _VALID_MODES:
        raise ValueError(f"codec backend mode must be one of {_VALID_MODES}")
    _mode = mode


def get_backend() -> str:
    return _mode


def register_backend(kind: str, fn: Optional[Callable], name: str = "custom") -> None:
    """Install a decode callable for ``kind`` in {"image", "audio"} —
    deployments with an in-house codec library plug in here; tests use
    it to exercise the dispatch without Pillow/soundfile installed."""
    if kind not in ("image", "audio", "resample"):
        raise ValueError("kind must be 'image', 'audio', or 'resample'")
    _registered[kind] = (name, fn) if fn is not None else None


def clear_backends() -> None:
    """Drop explicit registrations and probe caches (test isolation)."""
    _registered.clear()
    _probed.clear()


def _pil_decode_image(payload: bytes) -> "np.ndarray":
    from PIL import Image  # noqa: import is the probe

    with Image.open(io.BytesIO(payload)) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def _soundfile_decode_audio(payload: bytes) -> tuple:
    import soundfile as sf  # noqa: import is the probe

    data, rate = sf.read(io.BytesIO(payload), dtype="int16", always_2d=True)
    # channel 0, matching the pure decoders' deterministic downmix
    return np.ascontiguousarray(data[:, 0]), int(rate)


def _conform_length(y: "np.ndarray", n_out: int) -> "np.ndarray":
    """Trim/zero-pad a resampler's output to the contract length
    (libraries compute ceil-based lengths that can differ by one sample
    from the pure kernel's round-based contract)."""
    if len(y) > n_out:
        return y[:n_out]
    if len(y) < n_out:
        return np.concatenate([y, np.zeros(n_out - len(y), y.dtype)])
    return y


def _soxr_resample(samples: "np.ndarray", rate_in: int, rate_out: int):
    import soxr  # noqa: import is the probe

    n_out = max(1, int(round(len(samples) * rate_out / rate_in)))
    # soxr preserves int16 I/O natively (internal float path, VHQ filter)
    y = soxr.resample(samples, rate_in, rate_out, quality="VHQ")
    return _conform_length(np.asarray(y, dtype=np.int16).reshape(-1), n_out)


def _scipy_resample(samples: "np.ndarray", rate_in: int, rate_out: int):
    import math

    from scipy import signal  # noqa: import is the probe

    n_out = max(1, int(round(len(samples) * rate_out / rate_in)))
    g = math.gcd(rate_in, rate_out)
    y = signal.resample_poly(
        samples.astype(np.float64), rate_out // g, rate_in // g
    )
    y = np.clip(np.rint(y), -32768, 32767).astype(np.int16)
    return _conform_length(y, n_out)


def _probe(kind: str):
    """Resolve (name, callable) for ``kind`` or None. Explicit
    registrations win; otherwise probe the known libraries once and
    cache (import cost is paid once per executor process)."""
    if kind in _registered:
        return _registered[kind]
    if kind not in _probed:
        found = None
        if kind == "image":
            try:
                import PIL.Image  # noqa: F401

                found = ("pillow", _pil_decode_image)
            except ImportError:
                found = None
        elif kind == "audio":
            try:
                import soundfile  # noqa: F401

                found = ("soundfile", _soundfile_decode_audio)
            except ImportError:
                found = None
        elif kind == "resample":
            try:
                import soxr  # noqa: F401

                found = ("soxr", _soxr_resample)
            except ImportError:
                try:
                    import scipy.signal  # noqa: F401

                    found = ("scipy", _scipy_resample)
                except ImportError:
                    found = None
        _probed[kind] = found
    return _probed[kind]


def active_image_backend() -> Optional[str]:
    """Backend name that image dispatch would use, or None (pure)."""
    if _mode == "pure":
        return None
    b = _probe("image")
    return b[0] if b else None


def active_audio_backend() -> Optional[str]:
    if _mode == "pure":
        return None
    b = _probe("audio")
    return b[0] if b else None


def active_resample_backend() -> Optional[str]:
    """Backend name resample dispatch would use, or None (pure sinc)."""
    if _mode == "pure":
        return None
    b = _probe("resample")
    return b[0] if b else None


def _dispatch(kind: str, *args):
    """None = use the pure kernels (no backend / mode=pure / backend
    declined this input). Never raises except in mode="native" with
    no backend installed — that is an install smoke-check, not a data
    path."""
    if _mode == "pure":
        return None
    backend = _probe(kind)
    if backend is None:
        if _mode == "native":
            raise NotImplementedError(
                f"codec backend mode 'native' but no {kind} backend "
                "is importable (install Pillow / soundfile / soxr)"
            )
        return None
    _name, fn = backend
    try:
        return fn(*args)
    except Exception:
        # the backend can't handle this input — the pure kernels
        # (and their quarantine contract) take over
        return None


def native_decode_image(payload: bytes) -> Optional["np.ndarray"]:
    """uint8 (h, w, 3) RGB via the native backend, or None → pure path."""
    out = _dispatch("image", payload)
    if out is None:
        return None
    arr = np.asarray(out)
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        return None  # nonconforming backend output: fall back, don't crash
    return arr


def native_decode_audio(payload: bytes) -> Optional[tuple]:
    """(int16 mono, rate) via the native backend, or None → pure path."""
    out = _dispatch("audio", payload)
    if out is None:
        return None
    try:
        samples, rate = out
        samples = np.asarray(samples)
    except (TypeError, ValueError):
        return None
    if samples.ndim != 1 or samples.dtype != np.int16 or int(rate) <= 0:
        return None
    return samples, int(rate)


def native_resample_audio(
    samples: "np.ndarray", rate_in: int, rate_out: int
) -> Optional["np.ndarray"]:
    """int16 mono at ``rate_out`` via the native SRC backend, or None →
    pure windowed-sinc path. The identity conversion never dispatches:
    the pure kernel's bit-exact copy is already optimal and
    backend-independent."""
    if rate_in == rate_out or len(samples) == 0:
        return None
    out = _dispatch("resample", samples, rate_in, rate_out)
    if out is None:
        return None
    y = np.asarray(out)
    n_out = max(1, int(round(len(samples) * rate_out / rate_in)))
    if y.ndim != 1 or y.dtype != np.int16 or len(y) != n_out:
        return None  # nonconforming backend output: fall back, don't crash
    return y


def backend_report() -> dict:
    """Probe summary for tooling (media probe, logs)."""
    return {
        "mode": _mode,
        "image_backend": active_image_backend() or "pure-python",
        "audio_backend": active_audio_backend() or "pure-python",
        "resample_backend": active_resample_backend() or "pure-python",
    }
