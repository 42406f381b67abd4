"""ctypes binding to the native batch-prep library (``_native/batch_prep.cpp``).

Builds the shared object on first use with g++ (cached next to the source);
every entry point degrades gracefully to the numpy path when the toolchain or
.so is unavailable, so the framework has no hard native dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_native")
_SO_PATH = os.path.join(_SRC_DIR, "libbatch_prep.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    src = os.path.join(_SRC_DIR, "batch_prep.cpp")
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", _SO_PATH, src, "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("CAT_DISABLE_NATIVE"):
            return None
        if not os.path.exists(_SO_PATH) and not _build():
            return None
        try:
            lib = _configure(ctypes.CDLL(_SO_PATH))
        except (OSError, AttributeError):
            # stale .so from an older source revision (missing symbol) or a
            # corrupt build: rebuild once and retry
            lib = None
            if _build():
                try:
                    lib = _configure(ctypes.CDLL(_SO_PATH))
                except (OSError, AttributeError):
                    lib = None
        _lib = lib
        return _lib


def _configure(lib: ctypes.CDLL) -> ctypes.CDLL:
    """Declare signatures; raises AttributeError on a stale .so missing a
    symbol (get_lib rebuilds and retries once)."""
    lib.cat_prep_batch.restype = ctypes.c_int
    lib.cat_prep_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
    ]
    lib.cat_prep_batch_aug.restype = ctypes.c_int
    lib.cat_prep_batch_aug.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
    ]
    return lib


def prep_batch(images: np.ndarray, indices: np.ndarray, target_hw,
               mean255: np.ndarray, std255: np.ndarray,
               num_threads: int = 0) -> Optional[np.ndarray]:
    """Gather + nearest-resize + normalize via the native library.

    ``images``: (N, H, W, C) uint8 pool; ``indices``: (n,) int64;
    ``mean255``/``std255``: per-channel stats on the 0..255 scale.
    Returns float32 (n, th, tw, C), or None if the native path is unusable.
    """
    lib = get_lib()
    if lib is None or images.dtype != np.uint8 or not images.flags.c_contiguous:
        return None
    n = len(indices)
    H, W, C = images.shape[1:]
    th, tw = target_hw
    indices = np.ascontiguousarray(indices, np.int64)
    mean255 = np.ascontiguousarray(mean255, np.float32)
    std255 = np.ascontiguousarray(std255, np.float32)
    out = np.empty((n, th, tw, C), np.float32)
    if num_threads <= 0:
        num_threads = min(8, os.cpu_count() or 1)
    rc = lib.cat_prep_batch(
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, H, W, C, th, tw,
        mean255.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std255.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        num_threads,
    )
    return out if rc == 0 else None


def prep_batch_aug(images: np.ndarray, indices: np.ndarray, target_hw,
                   mean255: np.ndarray, std255: np.ndarray, params,
                   num_threads: int = 0) -> Optional[np.ndarray]:
    """Fused gather + augmentation + nearest-resize + normalize.

    ``params`` is the ``(y0, x0, ch, cw, flip)`` tuple from
    ``loader.draw_aug_params`` — bit-identical to ``loader.apply_aug``
    followed by normalize.  Returns float32 (n, th, tw, C) or None when
    the native path is unusable.
    """
    lib = get_lib()
    if lib is None or images.dtype != np.uint8 or not images.flags.c_contiguous:
        return None
    y0, x0, ch, cw, flip = params
    n = len(indices)
    H, W, C = images.shape[1:]
    th, tw = target_hw
    indices = np.ascontiguousarray(indices, np.int64)
    mean255 = np.ascontiguousarray(mean255, np.float32)
    std255 = np.ascontiguousarray(std255, np.float32)
    y0 = np.ascontiguousarray(y0, np.int64)
    x0 = np.ascontiguousarray(x0, np.int64)
    ch = np.ascontiguousarray(ch, np.int64)
    cw = np.ascontiguousarray(cw, np.int64)
    flipu8 = np.ascontiguousarray(flip, np.uint8)
    out = np.empty((n, th, tw, C), np.float32)
    if num_threads <= 0:
        num_threads = min(8, os.cpu_count() or 1)
    rc = lib.cat_prep_batch_aug(
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, H, W, C, th, tw,
        mean255.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std255.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        y0.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        x0.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ch.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        cw.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        flipu8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        num_threads,
    )
    return out if rc == 0 else None
