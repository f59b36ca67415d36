"""ctypes binding for the native loader (native/loader.cpp).

Provides fast PNG/JPEG decode/encode and a threaded streaming prefetcher —
the native runtime layer around the JAX compute path. Falls back to building
on first use (g++ one-liner, scripts/build_native.sh); all functionality is
optional (tpuimg.utils.io covers plain IO via cv2/PIL).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "_native", "libtpuimg.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        # cross-process lock: two fresh checkouts building concurrently
        # would race the build (build_native.sh writes to a temp path and
        # renames atomically, so even an unlocked reader never sees a
        # half-written .so); flock additionally serializes the g++ runs
        import fcntl

        os.makedirs(os.path.dirname(_LIB_PATH), exist_ok=True)
        with open(_LIB_PATH + ".lock", "w") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            if not os.path.exists(_LIB_PATH):
                script = os.path.join(os.path.dirname(__file__), "..",
                                      "scripts", "build_native.sh")
                subprocess.run(["sh", script], check=True,
                               capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.tpuimg_image_dims.argtypes = [
        ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.tpuimg_read_image.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_int,
    ]
    lib.tpuimg_write_png.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
    ]
    lib.tpuimg_stream_open.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.tpuimg_stream_open.restype = ctypes.c_void_p
    lib.tpuimg_stream_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.tpuimg_stream_next.restype = ctypes.c_long
    lib.tpuimg_stream_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def read_image(path: str, gray: bool = True) -> np.ndarray:
    """Decode a PNG/JPEG to uint8 (H, W) or (H, W, 3)."""
    lib = _load()
    want = 1 if gray else 3
    w, h = ctypes.c_int(), ctypes.c_int()
    if lib.tpuimg_image_dims(path.encode(), want, ctypes.byref(w),
                             ctypes.byref(h)) != 0:
        raise IOError(f"failed to decode {path}")
    shape = (h.value, w.value) if gray else (h.value, w.value, 3)
    buf = np.empty(shape, np.uint8)
    if lib.tpuimg_read_image(path.encode(), want,
                             buf.ctypes.data_as(ctypes.c_void_p),
                             w.value, h.value) != 0:
        raise IOError(f"failed to decode {path}")
    return buf


def write_png(path: str, img: np.ndarray) -> None:
    lib = _load()
    if np.asarray(img).dtype != np.uint8:
        # an implicit cast would wrap/truncate (float [0,1] -> near-black)
        raise TypeError(
            f"write_png takes uint8 (use the library's rint+clip "
            f"convention first), got {np.asarray(img).dtype}")
    img = np.ascontiguousarray(img, np.uint8)
    c = 1 if img.ndim == 2 else img.shape[2]
    if c not in (1, 3):
        # loader.cpp writes IHDR as gray/RGB only; RGBA would silently
        # produce a channel-shifted file (row stride w*c vs 3*w consumed)
        raise ValueError(f"write_png supports 1 or 3 channels, got {c}")
    h, w = img.shape[:2]
    if lib.tpuimg_write_png(path.encode(),
                            img.ctypes.data_as(ctypes.c_void_p), w, h, c) != 0:
        raise IOError(f"failed to write {path}")


class FrameStream:
    """Threaded prefetching frame stream with a fixed slot shape.

    Decodes/resizes on native worker threads ahead of the consumer so the
    accelerator never waits on IO:

        with FrameStream(paths, (2160, 3840), gray=True) as fs:
            for idx, frame in fs:
                out = tpuimg.clahe(frame)
    """

    def __init__(self, paths, slot_hw, gray: bool = True, threads: int = 4,
                 capacity: int = 8):
        self._lib = _load()
        self._n = len(paths)
        self._gray = gray
        self._hw = slot_hw
        self._lock = threading.Lock()
        arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        self._handle = self._lib.tpuimg_stream_open(
            arr, len(paths), 1 if gray else 3, slot_hw[1], slot_hw[0],
            threads, capacity)
        if not self._handle:
            raise IOError("failed to open stream")

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __iter__(self):
        shape = self._hw if self._gray else (*self._hw, 3)
        for _ in range(self._n):
            # _lock serializes against close(): ctypes releases the GIL
            # during the blocking next(), so without it a concurrent
            # close() could free the native stream mid-call (and a
            # post-close next() would pass NULL and segfault)
            with self._lock:
                if self._handle is None:
                    return
                buf = np.empty(shape, np.uint8)
                idx = self._lib.tpuimg_stream_next(
                    self._handle, buf.ctypes.data_as(ctypes.c_void_p))
            if idx == -1:
                return
            if idx < -1:  # -(index + 2): that frame failed to decode
                raise IOError(f"failed to decode frame {-idx - 2}")
            yield idx, buf

    def close(self):
        with self._lock:
            if self._handle:
                self._lib.tpuimg_stream_close(self._handle)
                self._handle = None

    def __del__(self):
        # last-resort cleanup: a dropped stream (no `with`, exception
        # before close) would otherwise leak the native worker threads and
        # decoded-slot buffers for the life of the process
        try:
            if getattr(self, "_lock", None) is not None:
                self.close()
        except Exception:
            pass
