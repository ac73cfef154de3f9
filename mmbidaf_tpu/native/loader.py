"""ctypes bindings for the C++ host-side decode runtime (native/).

Auto-builds ``libmmbidaf_native.so`` on first use if a compiler is present
(no pybind11 in this image — plain C ABI via ctypes, zero-copy through numpy
buffers). Every entry point has a pure-Python fallback so the framework
works without a toolchain; ``native_available()`` reports which path is live.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libmmbidaf_native.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False

# Bump when the C ABI grows; _load() rebuilds any .so older than this (a
# stale binary from an earlier checkout would otherwise crash the symbol
# bindings below instead of falling back).
_MIN_VERSION = 3


def _rebuild() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, "clean"],
            capture_output=True, check=True, timeout=60,
        )
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            capture_output=True, check=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _open_versioned(path: str) -> ctypes.CDLL | None:
    """dlopen ``path`` if it is present AND at least _MIN_VERSION."""
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.mmb_version.restype = ctypes.c_int
        if lib.mmb_version() >= _MIN_VERSION:
            return lib
    except (OSError, AttributeError):
        pass
    return None


def _open_fresh_copy() -> ctypes.CDLL | None:
    """dlopen the .so through a unique temp copy: glibc caches dlopen by
    PATHNAME, so after a stale library at _SO_PATH was probed, reopening
    the rebuilt file at the same path returns the old handle."""
    import shutil
    import tempfile

    fd, tmp = tempfile.mkstemp(suffix=".so")
    os.close(fd)
    try:
        shutil.copy(_SO_PATH, tmp)
        return _open_versioned(tmp)
    except OSError:
        return None
    finally:
        try:
            os.unlink(tmp)  # safe on Linux: mapping outlives the unlink
        except OSError:
            pass


def _load() -> ctypes.CDLL | None:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        lib = _open_versioned(_SO_PATH)
        if lib is None:
            # missing, unloadable, or stale: rebuild once from source
            if not _rebuild():
                _build_failed = True
                return None
            lib = _open_versioned(_SO_PATH) or _open_fresh_copy()
        if lib is None:
            _build_failed = True
            return None
        try:
            lib.mmb_wav_decode.restype = ctypes.c_long
            lib.mmb_wav_decode.argtypes = [
                ctypes.c_char_p, ctypes.c_long,
                ctypes.POINTER(ctypes.c_float), ctypes.c_long,
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.mmb_ppm_header.restype = ctypes.c_int
            lib.mmb_ppm_header.argtypes = [
                ctypes.c_char_p, ctypes.c_long,
                ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
            ]
            lib.mmb_ppm_decode.restype = ctypes.c_int
            lib.mmb_ppm_decode.argtypes = [
                ctypes.c_char_p, ctypes.c_long,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
            ]
            lib.mmb_image_header.restype = ctypes.c_int
            lib.mmb_image_header.argtypes = [
                ctypes.c_char_p, ctypes.c_long,
                ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
            ]
            lib.mmb_image_decode.restype = ctypes.c_long
            lib.mmb_image_decode.argtypes = [
                ctypes.c_char_p, ctypes.c_long,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
            ]
            lib.mmb_image_decode_batch.restype = None
            lib.mmb_image_decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_long),
                ctypes.c_long, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
                ctypes.c_int,
            ]
            lib.mmb_pad_waveforms.restype = None
            lib.mmb_pad_waveforms.argtypes = [
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.POINTER(ctypes.c_long), ctypes.c_long, ctypes.c_long,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ]
            lib.mmb_sample_keyframes.restype = None
            lib.mmb_sample_keyframes.argtypes = [
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.POINTER(ctypes.c_long), ctypes.c_long, ctypes.c_long,
                ctypes.c_long, ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ]
        except AttributeError:
            # symbols missing despite the version gate (corrupt build)
            _build_failed = True
            return None
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def wav_decode(data: bytes, max_samples: int = 1 << 26) -> tuple[np.ndarray, int]:
    """WAV bytes → (mono float32 waveform, sample_rate). C++ path w/ fallback."""
    lib = _load()
    if lib is not None:
        out = np.empty(min(max_samples, len(data)), np.float32)
        sr = ctypes.c_int(0)
        n = lib.mmb_wav_decode(
            data, len(data),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(out),
            ctypes.byref(sr),
        )
        if n >= 0:
            return out[:n].copy(), sr.value
    # Python fallback via stdlib wave
    import io
    import wave as wave_mod

    with wave_mod.open(io.BytesIO(data), "rb") as w:
        sr_v = w.getframerate()
        raw = w.readframes(w.getnframes())
        width, channels = w.getsampwidth(), w.getnchannels()
    if width == 2:
        arr = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        arr = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:
        arr = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        # 24-bit packed PCM etc: refusing beats silently reinterpreting the
        # packed bytes as u8 noise (same contract as data/video.py::load_wav)
        raise ValueError(f"unsupported WAV sample width {width}")
    if channels > 1:
        arr = arr.reshape(-1, channels).mean(axis=1)
    return arr[:max_samples], sr_v


def ppm_decode(data: bytes) -> np.ndarray:
    """P6 PPM bytes → [H, W, 3] uint8."""
    lib = _load()
    if lib is not None:
        w = ctypes.c_long(0)
        h = ctypes.c_long(0)
        if lib.mmb_ppm_header(data, len(data), ctypes.byref(w), ctypes.byref(h)) == 0:
            out = np.empty((h.value, w.value, 3), np.uint8)
            rc = lib.mmb_ppm_decode(
                data, len(data),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.size,
            )
            if rc == 0:
                return out
    from PIL import Image
    import io

    return np.asarray(Image.open(io.BytesIO(data)).convert("RGB")).astype(np.uint8)


def image_decode(data: bytes) -> np.ndarray:
    """PNG/JPEG bytes → [H, W, 3] uint8 (libpng/libjpeg off the GIL,
    format sniffed by magic bytes; PIL fallback)."""
    lib = _load()
    if lib is not None:
        w = ctypes.c_long(0)
        h = ctypes.c_long(0)
        if lib.mmb_image_header(data, len(data), ctypes.byref(w), ctypes.byref(h)) == 0:
            out = np.empty((h.value, w.value, 3), np.uint8)
            n = lib.mmb_image_decode(
                data, len(data),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.size,
            )
            if n == out.size:
                return out
    import io

    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(data)).convert("RGB")).astype(np.uint8)


def image_decode_batch(blobs: list[bytes], num_threads: int = 4) -> list[np.ndarray]:
    """Decode many PNG/JPEG blobs with the C++ thread pool (serving's
    host-decode hot path — one call per keyframe dir instead of one
    GIL-bound PIL decode per frame). Falls back to per-image decode when
    the native lib is absent."""
    lib = _load()
    if lib is None or not blobs:
        return [image_decode(b) for b in blobs]
    B = len(blobs)
    dims: list[tuple[int, int] | None] = []
    w = ctypes.c_long(0)
    h = ctypes.c_long(0)
    for b in blobs:
        ok = lib.mmb_image_header(b, len(b), ctypes.byref(w), ctypes.byref(h)) == 0
        dims.append((h.value, w.value) if ok else None)
    if any(d is None for d in dims):
        return [image_decode(b) for b in blobs]
    outs = [np.empty(d + (3,), np.uint8) for d in dims]
    datas = (ctypes.c_char_p * B)(*blobs)
    lens = (ctypes.c_long * B)(*[len(b) for b in blobs])
    ptrs = (ctypes.POINTER(ctypes.c_uint8) * B)(
        *[o.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for o in outs]
    )
    caps = (ctypes.c_long * B)(*[o.size for o in outs])
    written = (ctypes.c_long * B)()
    lib.mmb_image_decode_batch(datas, lens, B, ptrs, caps, written, num_threads)
    return [
        o if written[i] == o.size else image_decode(blobs[i])
        for i, o in enumerate(outs)
    ]


# back-compat names (PNG was the first format wired in)
png_decode = image_decode
png_decode_batch = image_decode_batch


def pad_waveforms(waves: list[np.ndarray], num_samples: int, num_threads: int = 4) -> np.ndarray:
    """Variable-length float32 waveforms → zero-padded [B, num_samples]."""
    B = len(waves)
    out = np.empty((B, num_samples), np.float32)
    lib = _load()
    if lib is not None:
        waves = [np.ascontiguousarray(w, np.float32) for w in waves]
        ptrs = (ctypes.POINTER(ctypes.c_float) * B)(
            *[w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for w in waves]
        )
        lengths = (ctypes.c_long * B)(*[len(w) for w in waves])
        lib.mmb_pad_waveforms(
            ptrs, lengths, B, num_samples,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), num_threads,
        )
        return out
    out[:] = 0.0
    for i, w in enumerate(waves):
        n = min(len(w), num_samples)
        out[i, :n] = w[:n]
    return out


def sample_keyframes_batch(
    videos: list[np.ndarray], max_k: int, num_threads: int = 4
) -> tuple[np.ndarray, np.ndarray]:
    """Batch every-N keyframe sampling: list of [T_i, H, W, 3] uint8 →
    ([B, max_k, H, W, 3], mask [B, max_k]). Same policy as data/video.py."""
    B = len(videos)
    shape = videos[0].shape[1:]
    frame_bytes = int(np.prod(shape))
    out = np.empty((B, max_k) + shape, np.uint8)
    mask = np.empty((B, max_k), np.float32)
    lib = _load()
    if lib is not None:
        videos = [np.ascontiguousarray(v, np.uint8) for v in videos]
        ptrs = (ctypes.POINTER(ctypes.c_uint8) * B)(
            *[v.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for v in videos]
        )
        counts = (ctypes.c_long * B)(*[v.shape[0] for v in videos])
        lib.mmb_sample_keyframes(
            ptrs, counts, frame_bytes, B, max_k,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), num_threads,
        )
        return out, mask
    from mmbidaf_tpu.data.video import sample_keyframes

    outs, masks = zip(*(sample_keyframes(v, max_k) for v in videos))
    return np.stack(outs), np.stack(masks)
