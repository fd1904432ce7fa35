"""ctypes bindings for the native C++ image-loading runtime.

Builds ``native/yolodata.cc`` on first use (g++ -O3 -shared, cached under
``native/build/``) and exposes a threaded decode+letterbox prefetcher:
submit image paths, receive ready-to-device float32 NHWC letterboxed buffers
with original dims — the native replacement for the reference's
OpenCV-in-Python-workers input path (reference dataset.py:194-195,
evaluate.py:216).

Degrades gracefully: if the toolchain or libjpeg is unavailable, or a file
is not a decodable JPEG, callers fall back to the cv2 path.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_REPO_ROOT = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
_SRC = osp.join(_REPO_ROOT, "native", "yolodata.cc")
_BUILD_DIR = osp.join(_REPO_ROOT, "native", "build")
_SO = osp.join(_BUILD_DIR, "libyolodata.so")

_lib_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_error: Optional[str] = None


def _build_and_load() -> ctypes.CDLL:
    global _lib, _lib_error
    with _lib_lock:
        if _lib is not None:
            return _lib
        if _lib_error is not None:
            raise RuntimeError(_lib_error)
        try:
            if not osp.exists(_SO) or (
                osp.getmtime(_SO) < osp.getmtime(_SRC)
            ):
                os.makedirs(_BUILD_DIR, exist_ok=True)
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                     _SRC, "-o", _SO, "-ljpeg", "-lpthread"],
                    check=True, capture_output=True, text=True,
                )
            lib = ctypes.CDLL(_SO)
        except (subprocess.CalledProcessError, OSError) as e:
            msg = getattr(e, "stderr", str(e)) or str(e)
            _lib_error = f"native loader unavailable: {msg}"
            raise RuntimeError(_lib_error) from e

        lib.yolodata_create.restype = ctypes.c_void_p
        lib.yolodata_create.argtypes = [ctypes.c_int]
        lib.yolodata_destroy.argtypes = [ctypes.c_void_p]
        lib.yolodata_submit.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.yolodata_next.restype = ctypes.c_int
        lib.yolodata_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.yolodata_submit_fmt.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.yolodata_next_u8.restype = ctypes.c_int
        lib.yolodata_next_u8.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        # training-augmentation two-phase flow (native/yolodata.cc)
        lib.yolodata_submit_decode.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p,
        ]
        lib.yolodata_next_decoded.restype = ctypes.c_int
        lib.yolodata_next_decoded.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.yolodata_submit_aug.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.yolodata_drop_held.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.yolodata_augment_buffer.restype = ctypes.c_int
        lib.yolodata_augment_buffer.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
        return lib


def native_available() -> bool:
    try:
        _build_and_load()
        return True
    except RuntimeError:
        return False


class NativePrefetcher:
    """Threaded native decode+letterbox pipeline.

    Usage::

        with NativePrefetcher(n_threads=2) as pf:
            batch, orgs, ok = pf.load_letterboxed(paths, (416, 416))
    """

    def __init__(self, n_threads: int = 2, dtype: str = "float32"):
        """``dtype``: "float32" (normalized [0,1]) or "uint8" (cv2 pixel
        semantics — the int8 serving path's native feed, 4x less
        host->device transfer)."""
        assert dtype in ("float32", "uint8"), dtype
        self._lib = _build_and_load()
        self._handle = self._lib.yolodata_create(n_threads)
        self._fmt = 1 if dtype == "uint8" else 0

    def close(self):
        if self._handle:
            self._lib.yolodata_destroy(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def load_letterboxed(
        self, paths: Sequence[str], dim: Tuple[int, int]
    ) -> Tuple[np.ndarray, np.ndarray, List[bool]]:
        """Decode + letterbox a batch of JPEGs concurrently.

        Returns (imgs [B, out_h, out_w, 3] float32, org_dims [B, 2] (w, h),
        ok flags).  Failed entries (non-JPEG, IO error) have ok=False and
        zero buffers — the caller retries those via the cv2 path.
        """
        out_w, out_h = dim
        n = len(paths)
        for i, p in enumerate(paths):
            self._lib.yolodata_submit_fmt(
                self._handle, i, p.encode(), out_w, out_h, self._fmt
            )
        np_dtype = np.uint8 if self._fmt else np.float32
        imgs = np.zeros((n, out_h, out_w, 3), np_dtype)
        orgs = np.zeros((n, 2), np.float32)
        ok = [False] * n
        cap = out_w * out_h * 3
        buf = np.empty((cap,), np_dtype)
        tag = ctypes.c_int64()
        ow = ctypes.c_int()
        oh = ctypes.c_int()
        next_fn = (self._lib.yolodata_next_u8 if self._fmt
                   else self._lib.yolodata_next)
        c_ptr = ctypes.POINTER(ctypes.c_uint8 if self._fmt
                               else ctypes.c_float)
        for _ in range(n):
            status = next_fn(
                self._handle, ctypes.byref(tag),
                buf.ctypes.data_as(c_ptr), cap,
                ctypes.byref(ow), ctypes.byref(oh),
            )
            i = tag.value
            if status == 0:
                imgs[i] = buf.reshape(out_h, out_w, 3)
                orgs[i] = (ow.value, oh.value)
                ok[i] = True
        return imgs, orgs, ok
