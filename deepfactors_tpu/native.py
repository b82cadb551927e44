"""ctypes bindings for the native C++ runtime (native/*.cpp).

Two components, mirroring what the reference implements natively:
  - NativeScheduler: the coarse-to-fine factor work scheduler
    (sources/core/mapping/{work,work_manager,df_work} equivalent)
  - NativeLoader: threaded-prefetch dataset decoder (sources/drivers/
    equivalent; libjpeg/libpng, float grayscale + resize in C++)

Falls back gracefully when the shared library isn't built
(``make -C native``); callers check ``available()``.
"""
from __future__ import annotations

import ctypes as C
import os
from typing import Optional

import numpy as np

_LIB = None
_TRIED = False


def _lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "native_lib",
                        "libdfnative.so")
    if not os.path.exists(path):
        return None
    try:
        lib = C.CDLL(path)
    except OSError:
        return None
    lib.df_sched_new.restype = C.c_void_p
    lib.df_sched_new.argtypes = [C.c_int, C.c_int, C.c_int]
    lib.df_sched_free.argtypes = [C.c_void_p]
    lib.df_sched_add_work.restype = C.c_int64
    lib.df_sched_add_work.argtypes = [
        C.c_void_p, C.c_int32, C.c_int32, C.c_int32, C.c_int32,
        C.POINTER(C.c_int32), C.c_int32, C.c_int32, C.c_int64,
    ]
    lib.df_sched_replace_pair.argtypes = [C.c_void_p, C.c_int32, C.c_int32,
                                          C.c_int32]
    lib.df_sched_bookkeeping.argtypes = [C.c_void_p]
    lib.df_sched_budget.restype = C.c_int32
    lib.df_sched_budget.argtypes = [C.c_void_p]
    lib.df_sched_update.restype = C.c_int32
    lib.df_sched_update.argtypes = [C.c_void_p, C.c_int32, C.c_int32]
    lib.df_sched_has_work.restype = C.c_int32
    lib.df_sched_has_work.argtypes = [C.c_void_p]
    lib.df_sched_error.restype = C.c_int32
    lib.df_sched_error.argtypes = [C.c_void_p]
    lib.df_sched_erase_frame.argtypes = [C.c_void_p, C.c_int32]
    lib.df_sched_erase_keyframe.argtypes = [C.c_void_p, C.c_int32]
    lib.df_sched_pool.argtypes = [
        C.c_void_p, C.c_int32, C.POINTER(C.c_int32), C.POINTER(C.c_int32),
        C.POINTER(C.c_int32), C.POINTER(C.c_uint8), C.POINTER(C.c_uint8),
    ]
    lib.df_sched_work_slot.restype = C.c_int32
    lib.df_sched_work_slot.argtypes = [C.c_void_p, C.c_int64]
    lib.df_sched_num_works.restype = C.c_int32
    lib.df_sched_num_works.argtypes = [C.c_void_p]
    lib.df_sched_fused_sig.restype = C.c_int32
    lib.df_sched_fused_sig.argtypes = [C.c_void_p, C.POINTER(C.c_int32)]
    lib.df_sched_descent_slots.argtypes = [C.c_void_p,
                                           C.POINTER(C.c_uint8)]

    lib.df_loader_new.restype = C.c_void_p
    lib.df_loader_new.argtypes = [C.c_char_p, C.POINTER(C.c_double),
                                  C.c_int, C.c_int, C.c_int]
    lib.df_loader_free.argtypes = [C.c_void_p]
    lib.df_loader_native_size.restype = C.c_int
    lib.df_loader_native_size.argtypes = [C.c_void_p, C.POINTER(C.c_int),
                                          C.POINTER(C.c_int)]
    lib.df_loader_start.argtypes = [C.c_void_p, C.c_int]
    lib.df_loader_next.restype = C.c_int
    lib.df_loader_next.argtypes = [C.c_void_p, C.POINTER(C.c_float),
                                   C.POINTER(C.c_double)]
    lib.df_load_depth_png.restype = C.c_int
    lib.df_load_depth_png.argtypes = [C.c_char_p, C.c_float,
                                      C.POINTER(C.c_float), C.c_int,
                                      C.POINTER(C.c_int), C.POINTER(C.c_int)]
    _LIB = lib
    return lib


def available() -> bool:
    return _lib() is not None


PHOTO, REP, GEO = 0, 1, 2


class NativeScheduler:
    """C++ work scheduler handle (see native/scheduler.cpp)."""

    def __init__(self, photo_cap: int, rep_cap: int, geo_cap: int):
        self._lib = _lib()
        if self._lib is None:
            raise RuntimeError("native library not built (make -C native)")
        self._h = self._lib.df_sched_new(photo_cap, rep_cap, geo_cap)
        self._caps = (photo_cap, rep_cap, geo_cap)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.df_sched_free(self._h)
            self._h = None

    def add_work(self, kind: int, src: int, dst: int, dst_is_frame: bool,
                 iters, remove_after: bool = False, parent: int = 0) -> int:
        arr = (C.c_int32 * len(iters))(*iters)
        return self._lib.df_sched_add_work(
            self._h, kind, src, dst, int(dst_is_frame), arr, len(iters),
            int(remove_after), parent,
        )

    def replace_pair(self, kind: int, src: int, dst: int):
        self._lib.df_sched_replace_pair(self._h, kind, src, dst)

    def bookkeeping(self):
        self._lib.df_sched_bookkeeping(self._h)
        if self._lib.df_sched_error(self._h):
            raise RuntimeError("native scheduler: factor pool exhausted")

    def budget(self) -> int:
        return int(self._lib.df_sched_budget(self._h))

    def update(self, iters_done: int, converged: bool) -> int:
        return int(self._lib.df_sched_update(self._h, iters_done,
                                             int(converged)))

    def has_work(self) -> bool:
        return bool(self._lib.df_sched_has_work(self._h))

    def num_works(self) -> int:
        return int(self._lib.df_sched_num_works(self._h))

    def erase_frame(self, slot: int):
        self._lib.df_sched_erase_frame(self._h, slot)

    def erase_keyframe(self, slot: int):
        self._lib.df_sched_erase_keyframe(self._h, slot)

    def work_slot(self, work_id: int) -> int:
        return int(self._lib.df_sched_work_slot(self._h, work_id))

    def fused_sig(self):
        """Shared-schedule signature for the single-dispatch C2F descent
        (see df_sched_fused_sig). Returns (active_level, iters, orig_iters)
        or None."""
        out = (C.c_int32 * 18)()
        if not self._lib.df_sched_fused_sig(self._h, out):
            return None
        n = out[1]
        return (int(out[0]), tuple(out[2:2 + n]),
                tuple(out[2 + 8:2 + 8 + n]))

    def descent_slots(self) -> np.ndarray:
        buf = np.zeros(self._caps[0], np.uint8)
        self._lib.df_sched_descent_slots(
            self._h, buf.ctypes.data_as(C.POINTER(C.c_uint8)))
        return buf.astype(bool)

    def pool(self, kind: int):
        cap = self._caps[kind]
        src = np.zeros(cap, np.int32)
        dst = np.zeros(cap, np.int32)
        level = np.zeros(cap, np.int32)
        isf = np.zeros(cap, np.uint8)
        act = np.zeros(cap, np.uint8)
        self._lib.df_sched_pool(
            self._h, kind,
            src.ctypes.data_as(C.POINTER(C.c_int32)),
            dst.ctypes.data_as(C.POINTER(C.c_int32)),
            level.ctypes.data_as(C.POINTER(C.c_int32)),
            isf.ctypes.data_as(C.POINTER(C.c_uint8)),
            act.ctypes.data_as(C.POINTER(C.c_uint8)),
        )
        return src, dst, level, isf.astype(bool), act.astype(bool)


class NativeLoader:
    """Threaded-prefetch frame decoder (see native/dataset_loader.cpp)."""

    def __init__(self, files, timestamps=None, out_w: int = 0,
                 out_h: int = 0, n_threads: int = 2):
        self._lib = _lib()
        if self._lib is None:
            raise RuntimeError("native library not built (make -C native)")
        blob = "\n".join(files).encode()
        ts = None
        if timestamps is not None:
            ts = (C.c_double * len(files))(*timestamps)
        self._h = self._lib.df_loader_new(blob, ts, len(files), out_w, out_h)
        w = C.c_int()
        h = C.c_int()
        self._lib.df_loader_native_size(self._h, C.byref(w), C.byref(h))
        self.native_size = (w.value, h.value)
        self.out_w = out_w if out_w else w.value
        self.out_h = out_h if out_h else h.value
        self._n = len(files)
        self._lib.df_loader_start(self._h, n_threads)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.df_loader_free(self._h)
            self._h = None

    def __iter__(self):
        return self

    def __next__(self):
        img = np.empty((self.out_h, self.out_w), np.float32)
        ts = C.c_double()
        rc = self._lib.df_loader_next(
            self._h, img.ctypes.data_as(C.POINTER(C.c_float)), C.byref(ts))
        if rc == 1:
            raise StopIteration
        if rc < 0:
            raise IOError("frame decode failed")
        return ts.value, img


def load_depth_png(path: str, scale: float, max_hw=(1024, 2048)):
    lib = _lib()
    if lib is None:
        raise RuntimeError("native library not built")
    buf = np.empty(max_hw[0] * max_hw[1], np.float32)
    w = C.c_int()
    h = C.c_int()
    rc = lib.df_load_depth_png(path.encode(), scale,
                               buf.ctypes.data_as(C.POINTER(C.c_float)),
                               buf.size, C.byref(w), C.byref(h))
    if rc != 0:
        raise IOError(f"depth png load failed ({rc}): {path}")
    return buf[: w.value * h.value].reshape(h.value, w.value).copy()
