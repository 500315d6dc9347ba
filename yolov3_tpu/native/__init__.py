"""ctypes bindings for the C++ host data-loader (``native/preproc.cpp``).

Auto-builds ``libpreproc.so`` with g++ on first use (cached next to the
source); falls back gracefully — callers check :func:`available` and use the
cv2/device paths otherwise.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_SRC = Path(__file__).resolve().parent.parent.parent / "native" / "preproc.cpp"
_SO = _SRC.parent / "libpreproc.so"
_lib = None
_tried = False

# uint8 letterbox pad. One pad contract framework-wide (round-3): darknet's
# float convention 0.5 is NOT representable in uint8 (127.5), so EVERY path
# pads 128/255 — this loader pads 128 in uint8, and the device/cv2 float
# paths pad ops.preprocess.PAD_FLOAT = 128/255, making the normalized
# borders bit-identical across detect_batch/detect_mixed (pinned by
# tests/test_native_preproc.py::test_pad_contract_device_matches_native).
PAD_VALUE = 128


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-fopenmp", str(_SRC),
           "-o", str(_SO)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        try:  # retry without OpenMP (toolchains missing libgomp)
            subprocess.run([c for c in cmd if c != "-fopenmp"], check=True,
                           capture_output=True, timeout=120)
            return True
        except (OSError, subprocess.SubprocessError):
            return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    # a prebuilt .so without the source (packaged/deployed tree) is fine —
    # only compare mtimes when BOTH exist (round-2 review: stat() on a
    # missing source raised instead of falling back)
    stale = (_SO.exists() and _SRC.exists()
             and _SO.stat().st_mtime < _SRC.stat().st_mtime)
    if not _SO.exists() or stale:
        if not _SRC.exists() or not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.letterbox_batch.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                    ctypes.c_int, u8p, ctypes.c_int,
                                    ctypes.c_int, ctypes.c_int]
    lib.letterbox_mixed.argtypes = [ctypes.POINTER(u8p),
                                    ctypes.POINTER(ctypes.c_int),
                                    ctypes.POINTER(ctypes.c_int),
                                    ctypes.c_int, u8p, ctypes.c_int,
                                    ctypes.c_int, ctypes.c_int]
    lib.stretch_batch.argtypes = lib.letterbox_batch.argtypes
    for f in (lib.letterbox_batch, lib.letterbox_mixed, lib.stretch_batch,
              lib.preproc_version):
        f.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def letterbox_batch_native(frames: np.ndarray, net_hw, swap_rb: bool = True
                           ) -> np.ndarray:
    """(B, H, W, 3) uint8 → (B, nh, nw, 3) uint8 letterboxed (RGB if swap_rb)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native preproc library unavailable")
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    b, h, w, _ = frames.shape
    nh, nw = net_hw
    out = np.full((b, nh, nw, 3), PAD_VALUE, dtype=np.uint8)
    rc = lib.letterbox_batch(_u8ptr(frames), b, h, w, _u8ptr(out), nh, nw,
                             int(swap_rb))
    if rc != 0:
        raise RuntimeError(f"letterbox_batch failed rc={rc}")
    return out


def letterbox_mixed_native(frames: Sequence[np.ndarray], net_hw,
                           swap_rb: bool = True) -> np.ndarray:
    """List of HWC uint8 images (any sizes) → one (B, nh, nw, 3) uint8 batch."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native preproc library unavailable")
    frames = [np.ascontiguousarray(f, dtype=np.uint8) for f in frames]
    b = len(frames)
    nh, nw = net_hw
    out = np.full((b, nh, nw, 3), PAD_VALUE, dtype=np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    ptrs = (u8p * b)(*[_u8ptr(f) for f in frames])
    shs = (ctypes.c_int * b)(*[f.shape[0] for f in frames])
    sws = (ctypes.c_int * b)(*[f.shape[1] for f in frames])
    rc = lib.letterbox_mixed(ptrs, shs, sws, b, _u8ptr(out), nh, nw,
                             int(swap_rb))
    if rc != 0:
        raise RuntimeError(f"letterbox_mixed failed rc={rc}")
    return out


def stretch_batch_native(frames: np.ndarray, net_hw, swap_rb: bool = True
                         ) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native preproc library unavailable")
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    b, h, w, _ = frames.shape
    nh, nw = net_hw
    out = np.empty((b, nh, nw, 3), dtype=np.uint8)
    rc = lib.stretch_batch(_u8ptr(frames), b, h, w, _u8ptr(out), nh, nw,
                           int(swap_rb))
    if rc != 0:
        raise RuntimeError(f"stretch_batch failed rc={rc}")
    return out
