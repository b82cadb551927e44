"""Work-scheduler backends for the Mapper.

One interface, two implementations:
  - PyScheduler: the Python WorkManager + factor pools (reference semantics,
    df_work.cpp/work_manager.cpp — see mapper.Work/WorkManager)
  - NativeScheduler: the C++ scheduler (native/scheduler.cpp via ctypes),
    verified trace-equivalent to the Python one (tests/test_native.py);
    per-factor payloads (reprojection matches, geometric sample points) are
    placed into the pool arrays Python-side using the slot assignments the
    native scheduler reports.

The Mapper selects the native backend when the shared library is built and
``MapperConfig.use_native_scheduler`` is set.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from .mapper_pools import (FactorPool, GeoPool, RepPool, _empty_geo_pool,
                           _empty_pool, _empty_rep_pool)


class PyScheduler:
    """Python backend wrapping Work/WorkManager (defined in mapper.py to
    keep the reference-semantics classes in one place)."""

    def __init__(self, cfg):
        from .mapper import WorkManager

        self.cfg = cfg
        self.wm = WorkManager()
        # bumped on every rep/geo pool mutation: the Mapper caches device
        # copies of the (host-mutated) pools keyed on this version
        self.repgeo_version = 0
        self.photo_pool = _empty_pool(cfg.max_factors)
        self.rep_pool = _empty_rep_pool(cfg.max_rep_factors, cfg.max_keypoints)
        self.geo_pool = _empty_geo_pool(cfg.max_geo_factors, cfg.geo_npoints)

    # -- enqueue --------------------------------------------------------

    def add_photo(self, src, dst, dst_is_frame, iters, remove_after=False,
                  replace=False):
        from .mapper import PhotoWork

        if replace and not dst_is_frame:
            for i in range(self.cfg.max_factors):
                if (self.photo_pool.active[i]
                        and not self.photo_pool.dst_is_frame[i]
                        and self.photo_pool.src[i] == src
                        and self.photo_pool.dst[i] == dst):
                    self.photo_pool.active[i] = False
            for w in list(self.wm.work):
                if (isinstance(w, PhotoWork) and not w.dst_is_frame
                        and w.src == src and w.dst == dst):
                    self.wm.work.remove(w)
        return self.wm.add(PhotoWork(src, dst, dst_is_frame, iters,
                                     remove_after=remove_after))

    def add_rep(self, src, dst, iters, kp0, kp1, mvalid):
        from .mapper import RepWork

        self.repgeo_version += 1
        # replace semantics: a re-linked pair (loop closure re-match)
        # refreshes the factor instead of leaking a second pool slot
        for i in range(self.cfg.max_rep_factors):
            if (self.rep_pool.active[i] and self.rep_pool.src[i] == src
                    and self.rep_pool.dst[i] == dst):
                self.rep_pool.active[i] = False
        for w in list(self.wm.work):
            if isinstance(w, RepWork) and w.src == src and w.dst == dst:
                self.wm.work.remove(w)
        return self.wm.add(RepWork(src, dst, kp0, kp1, mvalid, iters))

    def add_geo(self, src, dst, iters, points, parent=None):
        from .mapper import GeoWork

        self.repgeo_version += 1
        w = GeoWork(src, dst, points, iters)
        if parent is not None:
            parent.add_child(w)
        else:
            self.wm.add(w)
        return w

    def erase_frame(self, fslot: int):
        from .mapper import PhotoWork

        self.repgeo_version += 1
        for w in list(self.wm.work):
            if isinstance(w, PhotoWork) and w.dst_is_frame and w.dst == fslot:
                if w.pool_slot is not None:
                    self.photo_pool.active[w.pool_slot] = False
        self.wm.erase_involving(fslot, is_frame=True)
        for i in range(self.cfg.max_factors):
            if (self.photo_pool.active[i] and self.photo_pool.dst_is_frame[i]
                    and self.photo_pool.dst[i] == fslot):
                self.photo_pool.active[i] = False

    def erase_keyframe(self, slot: int):
        """Drop every work + pool factor touching an evicted keyframe slot
        (the WorkManager::Erase analog for keyframes — the reference never
        evicts, see mapper.marginalize_keyframe)."""
        from .mapper import GeoWork, PhotoWork, RepWork

        self.repgeo_version += 1

        def touches(w):
            if isinstance(w, PhotoWork):
                return w.src == slot or (not w.dst_is_frame and w.dst == slot)
            if isinstance(w, (RepWork, GeoWork)):
                return w.src == slot or w.dst == slot
            return False

        for w in list(self.wm.work):
            if touches(w):
                if w.pool_slot is not None:
                    pool = (self.photo_pool if isinstance(w, PhotoWork)
                            else self.rep_pool if isinstance(w, RepWork)
                            else self.geo_pool)
                    pool.active[w.pool_slot] = False
                self.wm.work.remove(w)
        for i in range(self.cfg.max_factors):
            p = self.photo_pool
            if p.active[i] and (p.src[i] == slot
                                or (not p.dst_is_frame[i]
                                    and p.dst[i] == slot)):
                p.active[i] = False
        for pool, cap in ((self.rep_pool, self.cfg.max_rep_factors),
                          (self.geo_pool, self.cfg.max_geo_factors)):
            for i in range(cap):
                if pool.active[i] and (pool.src[i] == slot
                                       or pool.dst[i] == slot):
                    pool.active[i] = False

    # -- scheduling -----------------------------------------------------

    def bookkeeping(self, stochastic_geo_resample=None):
        from .mapper import GeoWork, PhotoWork, RepWork

        def alloc(pool, cap, name):
            for i in range(cap):
                if not pool.active[i]:
                    return i
            raise RuntimeError(f"{name} factor pool exhausted")

        for w in self.wm.work:
            if isinstance(w, PhotoWork):
                if w.remove:
                    if w.pool_slot is not None:
                        self.photo_pool.active[w.pool_slot] = False
                        w.pool_slot = None
                    w.active_level = -2
                    continue
                if w.first or (w.active_level >= 0 and w.is_new_level_start()):
                    w.first = False
                    if w.pool_slot is None:
                        w.pool_slot = alloc(self.photo_pool,
                                            self.cfg.max_factors, "photo")
                    i = w.pool_slot
                    self.photo_pool.src[i] = w.src
                    self.photo_pool.dst[i] = w.dst
                    self.photo_pool.dst_is_frame[i] = w.dst_is_frame
                    self.photo_pool.level[i] = max(w.active_level, 0)
                    self.photo_pool.active[i] = True
            elif isinstance(w, RepWork):
                if w.remove:
                    if w.pool_slot is not None:
                        self.rep_pool.active[w.pool_slot] = False
                        w.pool_slot = None
                        self.repgeo_version += 1
                    w.active_level = -2
                    continue
                if w.first:
                    self.repgeo_version += 1
                    w.first = False
                    w.pool_slot = alloc(self.rep_pool,
                                        self.cfg.max_rep_factors, "rep")
                    i = w.pool_slot
                    self.rep_pool.src[i] = w.src
                    self.rep_pool.dst[i] = w.dst
                    M = w.kp0.shape[0]
                    self.rep_pool.kp0[i, :M] = w.kp0
                    self.rep_pool.kp1[i, :M] = w.kp1
                    self.rep_pool.mvalid[i] = False
                    self.rep_pool.mvalid[i, :M] = w.mvalid
                    self.rep_pool.active[i] = True
            elif isinstance(w, GeoWork):
                if w.remove:
                    if w.pool_slot is not None:
                        self.geo_pool.active[w.pool_slot] = False
                        w.pool_slot = None
                        self.repgeo_version += 1
                    w.active_level = -2
                    continue
                if w.first:
                    self.repgeo_version += 1
                    w.first = False
                    w.pool_slot = alloc(self.geo_pool,
                                        self.cfg.max_geo_factors, "geo")
                    i = w.pool_slot
                    self.geo_pool.src[i] = w.src
                    self.geo_pool.dst[i] = w.dst
                    self.geo_pool.points[i] = w.points
                    self.geo_pool.active[i] = True
                elif (stochastic_geo_resample is not None
                      and w.pool_slot is not None):
                    self.geo_pool.points[w.pool_slot] = \
                        stochastic_geo_resample()
                    self.repgeo_version += 1

    def budget(self) -> int:
        budgets = [w.iters[w.active_level] + 1 for w in self.wm.work
                   if w.active_level >= 0]
        return max(1, min(budgets)) if budgets else 1

    def update(self, iters_done: int, converged: bool):
        for _ in range(iters_done):
            self.wm.update()
        if converged:
            self.wm.signal_no_relinearize()
        self.wm.sweep_finished()

    def has_work(self) -> bool:
        return not self.wm.empty()

    def fused_sig(self):
        """Shared-schedule signature for the single-dispatch C2F descent:
        (active_level, iters, orig_iters) when every outstanding PHOTO work
        shares one schedule state, else None. Rep/geo works ride along:
        their pool factors are applied inside every fused GN iteration
        anyway (gn_iteration assembles the rep/geo pools unconditionally),
        so they only need their schedules ticked by the host replay —
        without this, a single reprojection work forced every keyframe
        event onto the slow multi-dispatch fallback path."""
        from .mapper import GeoWork, PhotoWork, RepWork

        works = self.wm.work
        if not works:
            return None
        sig = None
        for w in works:
            if w.child is not None or w.remove:
                return None
            if type(w) is not PhotoWork:
                if isinstance(w, (RepWork, GeoWork)):
                    continue
                return None
            s = (w.active_level, tuple(w.iters), tuple(w.orig_iters))
            if sig is None:
                sig = s
            elif s != sig:
                return None
        return sig

    def descent_slots(self) -> np.ndarray:
        """Photo-pool slots owned by live works (the descending factor set
        for run_segments' pool_descent mask)."""
        from .mapper import PhotoWork

        out = np.zeros(self.cfg.max_factors, bool)
        for w in self.wm.work:
            if isinstance(w, PhotoWork) and w.pool_slot is not None:
                out[w.pool_slot] = True
        return out

    def tick_empty(self):
        """One schedule tick when no factors are live (keeps parity with the
        empty-levels path)."""
        self.wm.update()
        self.wm.sweep_finished()


class NativeBackend:
    """C++ scheduler backend (native/scheduler.cpp)."""

    def __init__(self, cfg):
        from .. import native

        self.cfg = cfg
        self.native = native
        self.repgeo_version = 0
        self.ns = native.NativeScheduler(
            cfg.max_factors, cfg.max_rep_factors, cfg.max_geo_factors
        )
        self.photo_pool = _empty_pool(cfg.max_factors)
        self.rep_pool = _empty_rep_pool(cfg.max_rep_factors, cfg.max_keypoints)
        self.geo_pool = _empty_geo_pool(cfg.max_geo_factors, cfg.geo_npoints)
        # payloads waiting for slot placement: work_id -> payload
        self._rep_payloads: dict = {}
        self._geo_payloads: dict = {}

    def add_photo(self, src, dst, dst_is_frame, iters, remove_after=False,
                  replace=False):
        if replace and not dst_is_frame:
            self.ns.replace_pair(self.native.PHOTO, src, dst)
        return self.ns.add_work(self.native.PHOTO, src, dst, dst_is_frame,
                                list(iters), remove_after)

    def add_rep(self, src, dst, iters, kp0, kp1, mvalid):
        self.repgeo_version += 1
        self.ns.replace_pair(self.native.REP, src, dst)
        wid = self.ns.add_work(self.native.REP, src, dst, False, [iters])
        self._rep_payloads[wid] = (kp0, kp1, mvalid)
        return wid

    def add_geo(self, src, dst, iters, points, parent=None):
        pid = parent if isinstance(parent, int) else 0
        self.repgeo_version += 1
        wid = self.ns.add_work(self.native.GEO, src, dst, False, [iters],
                               parent=pid or 0)
        self._geo_payloads[wid] = points
        return wid

    def erase_frame(self, fslot: int):
        self.repgeo_version += 1
        self.ns.erase_frame(fslot)

    def erase_keyframe(self, slot: int):
        self.repgeo_version += 1
        self.ns.erase_keyframe(slot)

    def bookkeeping(self, stochastic_geo_resample=None):
        self.ns.bookkeeping()
        for kind, pool in ((self.native.PHOTO, self.photo_pool),
                           (self.native.REP, self.rep_pool),
                           (self.native.GEO, self.geo_pool)):
            src, dst, level, isf, act = self.ns.pool(kind)
            pool.src[:] = src
            pool.dst[:] = dst
            if hasattr(pool, "level"):
                pool.level[:] = level
            if hasattr(pool, "dst_is_frame"):
                pool.dst_is_frame[:] = isf
            pool.active[:] = act
        # place payloads whose works now own slots
        for wid in list(self._rep_payloads):
            slot = self.ns.work_slot(wid)
            if slot >= 0:
                self.repgeo_version += 1
                kp0, kp1, mvalid = self._rep_payloads.pop(wid)
                M = kp0.shape[0]
                self.rep_pool.kp0[slot, :M] = kp0
                self.rep_pool.kp1[slot, :M] = kp1
                self.rep_pool.mvalid[slot] = False
                self.rep_pool.mvalid[slot, :M] = mvalid
        for wid in list(self._geo_payloads):
            slot = self.ns.work_slot(wid)
            if slot >= 0:
                self.repgeo_version += 1
                self.geo_pool.points[slot] = self._geo_payloads.pop(wid)

    def budget(self) -> int:
        return self.ns.budget()

    def update(self, iters_done: int, converged: bool):
        self.ns.update(iters_done, converged)

    def has_work(self) -> bool:
        return self.ns.has_work()

    def fused_sig(self):
        return self.ns.fused_sig()

    def descent_slots(self) -> np.ndarray:
        return self.ns.descent_slots()

    def tick_empty(self):
        self.ns.update(1, False)


def make_scheduler(cfg):
    from .. import native

    if getattr(cfg, "use_native_scheduler", False) and native.available():
        return NativeBackend(cfg)
    return PyScheduler(cfg)
