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
(T.81 Annex A accuracy class). Both are pinned in
``tests/test_native_seam.py`` — the real-backend tests run wherever
Pillow/soundfile are installed and skip cleanly where they are not.

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
    "native_decode_image",
    "native_decode_audio",
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
    if kind not in ("image", "audio"):
        raise ValueError("kind must be 'image' or 'audio'")
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


def _dispatch(kind: str, payload: bytes):
    """None = use the pure decoders (no backend / mode=pure / backend
    declined this payload). Never raises except in mode="native" with
    no backend installed — that is an install smoke-check, not a data
    path."""
    if _mode == "pure":
        return None
    backend = _probe(kind)
    if backend is None:
        if _mode == "native":
            raise NotImplementedError(
                f"codec backend mode 'native' but no {kind} backend "
                "is importable (install Pillow / soundfile)"
            )
        return None
    _name, fn = backend
    try:
        return fn(payload)
    except Exception:
        # the backend can't decode this payload — the pure decoders
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


def backend_report() -> dict:
    """Probe summary for tooling (media probe, logs)."""
    return {
        "mode": _mode,
        "image_backend": active_image_backend() or "pure-python",
        "audio_backend": active_audio_backend() or "pure-python",
    }
