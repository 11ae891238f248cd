"""ctypes bindings for the native JPEG decode pool (native/bscan_io.cc).

Replaces the reference's PIL/torchvision-worker decode path
(dataset.py:219-226) with a GIL-free C++ pthread pool writing straight into
one contiguous uint8 batch tensor; falls back to the cv2/PIL thread pool in
data/pipeline.py when the shared library isn't built.

Build: `make -C native` (g++ + libjpeg, both in the base image).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libbscan_io.so",
)
_lib = None


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.bscan_decode_batch.restype = ctypes.c_int
        lib.bscan_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        _lib = lib
    return _lib


def available() -> bool:
    try:
        _load()
        return True
    except OSError:
        return False


def build(out=print) -> bool:
    """Compile the shared library in-tree (g++ + libjpeg)."""
    import subprocess

    native_dir = os.path.dirname(_LIB_PATH)
    r = subprocess.run(
        ["make", "-C", native_dir], capture_output=True, text=True
    )
    out(r.stdout + r.stderr)
    return r.returncode == 0 and os.path.exists(_LIB_PATH)


def decode_batch(
    buffers: list,
    target_short: int = 256,
    out_h: Optional[int] = None,
    out_w: Optional[int] = None,
    threads: int = 0,
) -> np.ndarray:
    """Decode a list of JPEG byte strings -> (N, out_h, out_w, 3) uint8.

    Each image is shorter-side resized to `target_short` (libjpeg DCT
    scaling + bilinear) and center-cropped/edge-padded into the fixed output
    slot. Defaults produce (N, 256, 256, 3), the shape the device-side
    train/eval transforms consume (a width-256 center crop preserves every
    pixel a later 224 crop can touch).
    """
    lib = _load()
    n = len(buffers)
    out_h = out_h or target_short
    out_w = out_w or target_short
    out = np.empty((n, out_h, out_w, 3), dtype=np.uint8)

    buf_array = (ctypes.c_char_p * n)(*buffers)
    len_array = (ctypes.c_int64 * n)(*[len(b) for b in buffers])
    rc = lib.bscan_decode_batch(
        ctypes.cast(buf_array, ctypes.POINTER(ctypes.c_char_p)),
        ctypes.cast(len_array, ctypes.POINTER(ctypes.c_int64)),
        n,
        target_short,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_h,
        out_w,
        threads,
    )
    if rc != 0:
        raise ValueError(f"JPEG decode failed for image index {rc - 1}")
    return out
