"""Native C++ runtime tests: the scheduler must reproduce the Python
WorkManager's schedule exactly, and the prefetch loader must decode frames
identically to the Python path."""
import os

import numpy as np
import pytest

from deepfactors_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def drive_python(pho_iters, steps):
    """Run the Python scheduler, returning the (level, active) trace of the
    photometric pool after each bookkeeping."""
    from deepfactors_tpu.mapping.mapper import PhotoWork, WorkManager
    import numpy as np

    from deepfactors_tpu.mapping.mapper import _empty_pool

    wm = WorkManager()
    pool = _empty_pool(8)
    wm.add(PhotoWork(0, 1, False, pho_iters))
    wm.add(PhotoWork(1, 0, False, pho_iters, remove_after=True))

    def bookkeeping():
        for w in wm.work:
            if not isinstance(w, PhotoWork):
                continue
            if w.remove:
                if w.pool_slot is not None:
                    pool.active[w.pool_slot] = False
                    w.pool_slot = None
                w.active_level = -2
                continue
            if w.first or (w.active_level >= 0 and w.is_new_level_start()):
                w.first = False
                if w.pool_slot is None:
                    for i in range(8):
                        if not pool.active[i]:
                            w.pool_slot = i
                            break
                i = w.pool_slot
                pool.src[i] = w.src
                pool.dst[i] = w.dst
                pool.level[i] = max(w.active_level, 0)
                pool.active[i] = True

    trace = []
    for _ in range(steps):
        if wm.empty():
            break
        bookkeeping()
        budgets = [w.iters[w.active_level] + 1 for w in wm.work
                   if w.active_level >= 0]
        budget = max(1, min(budgets)) if budgets else 1
        trace.append((
            tuple(pool.level.tolist()), tuple(pool.active.tolist()), budget,
        ))
        for _ in range(budget):
            wm.update()
        wm.sweep_finished()
    return trace


def drive_native(pho_iters, steps):
    s = native.NativeScheduler(8, 4, 4)
    s.add_work(native.PHOTO, 0, 1, False, pho_iters)
    s.add_work(native.PHOTO, 1, 0, False, pho_iters, remove_after=True)
    trace = []
    for _ in range(steps):
        if not s.has_work():
            break
        s.bookkeeping()
        budget = s.budget()
        src, dst, level, isf, act = s.pool(native.PHOTO)
        trace.append((tuple(level.tolist()), tuple(act.tolist()), budget))
        s.update(budget, False)
    return trace


def test_scheduler_matches_python():
    for iters in [(2, 3), (4, 8, 15), (1, 1, 1)]:
        pt = drive_python(list(iters), 50)
        nt = drive_native(list(iters), 50)
        assert len(pt) == len(nt), (iters, len(pt), len(nt))
        for i, (p, n) in enumerate(zip(pt, nt)):
            assert p == n, f"iters={iters} step {i}: python {p} native {n}"


def test_scheduler_convergence_signal():
    s = native.NativeScheduler(8, 4, 4)
    s.add_work(native.PHOTO, 0, 1, False, [5, 5])
    s.bookkeeping()
    # converged immediately -> descend through both levels quickly
    n_phases = 0
    while s.has_work() and n_phases < 10:
        s.bookkeeping()
        s.update(1, True)  # converged every step
        n_phases += 1
    assert not s.has_work()
    assert n_phases <= 4


def test_fused_sig_rep_only_returns_none():
    """A non-empty work list with ONLY rep/geo works has no shared photo
    schedule: fused_sig must report 'no fast path' (None), matching the
    Python scheduler — the pre-fix native code dereferenced a null work
    pointer here (ADVICE r4 high)."""
    s = native.NativeScheduler(8, 4, 4)
    s.add_work(native.REP, 0, 1, False, [15])
    assert s.has_work()
    assert s.fused_sig() is None
    # a photo work joining the list restores the fast path
    s.add_work(native.PHOTO, 0, 1, False, [2, 3])
    assert s.fused_sig() is not None


def test_scheduler_child_promotion():
    s = native.NativeScheduler(8, 4, 4)
    parent = s.add_work(native.PHOTO, 0, 1, False, [1],
                        remove_after=True)
    s.add_work(native.GEO, 0, 1, False, [2], parent=parent)
    assert s.num_works() == 1
    for _ in range(10):
        if not s.has_work():
            break
        s.bookkeeping()
        s.update(s.budget(), False)
    # child should have been promoted and eventually consumed
    assert not s.has_work()


def test_loader_decodes_frames(tmp_path):
    import cv2

    rng = np.random.RandomState(0)
    files = []
    for i in range(4):
        img = (rng.rand(32, 48) * 255).astype(np.uint8)
        p = str(tmp_path / f"{i}.png")
        cv2.imwrite(p, img)
        files.append(p)
    loader = native.NativeLoader(files, timestamps=[0.5 * i for i in range(4)])
    frames = list(loader)
    assert len(frames) == 4
    ts, img = frames[2]
    assert ts == 1.0
    ref = cv2.imread(files[2], cv2.IMREAD_GRAYSCALE).astype(np.float32) / 255.0
    np.testing.assert_allclose(img, ref, atol=2e-2)


def test_loader_resize(tmp_path):
    import cv2

    img = np.zeros((64, 96), np.uint8)
    img[:32] = 200
    p = str(tmp_path / "a.png")
    cv2.imwrite(p, img)
    loader = native.NativeLoader([p], out_w=48, out_h=32)
    ts, out = next(iter(loader))
    assert out.shape == (32, 48)
    assert abs(float(out[:14].mean()) - 200 / 255) < 0.02
    assert float(out[18:].mean()) < 0.02


def test_depth_png(tmp_path):
    import cv2

    d = (np.arange(32 * 48).reshape(32, 48) % 5000).astype(np.uint16)
    p = str(tmp_path / "d.png")
    cv2.imwrite(p, d)
    out = native.load_depth_png(p, 0.001)
    np.testing.assert_allclose(out, d.astype(np.float32) * 0.001, atol=1e-6)
