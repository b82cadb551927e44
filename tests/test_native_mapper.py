"""End-to-end Mapper with the NATIVE C++ scheduler backend: must produce the
same optimization results as the Python backend (the schedulers are
trace-equivalent, so the mapping output should match to float tolerance)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepfactors_tpu import native
from deepfactors_tpu.geometry import se3 as se3m
from deepfactors_tpu.geometry.camera import PinholeCamera
from deepfactors_tpu.mapping.mapper import Mapper, MapperConfig
from deepfactors_tpu.mapping.scheduler import NativeBackend

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)

H, W, CS = 48, 64, 4


def scene():
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_mapper import make_scene

    d = np.array([0.02, -0.01, 0.03, 0.008, -0.006, 0.01], dtype=np.float32)
    return make_scene(d)


def cfg(native_sched):
    return MapperConfig(
        max_keyframes=4, max_frames=1, max_factors=8, code_size=CS,
        height=H, width=W, pyramid_levels=2, pho_iters=(10, 15),
        connection_mode="LASTN", max_back_connections=2,
        use_schur=False, use_native_scheduler=native_sched,
    )


def run_bootstrap(native_sched):
    img0, img1, cam, pose1_true = scene()
    m = Mapper(cfg(native_sched), cam, decoder=None)
    if native_sched:
        assert isinstance(m.sched, NativeBackend)
    s0, s1 = m.init_two_frames(img0, img1)
    m.update_map()
    return (np.asarray(jax.device_get(m.state.pose.t)),
            np.asarray(jax.device_get(m.state.code)), pose1_true, m, s1)


def test_native_backend_selected():
    _, _, _, m, _ = run_bootstrap(True)
    assert isinstance(m.sched, NativeBackend)


def test_native_matches_python_bootstrap():
    t_py, c_py, _, _, _ = run_bootstrap(False)
    t_nat, c_nat, _, _, _ = run_bootstrap(True)
    np.testing.assert_allclose(t_nat, t_py, atol=1e-6)
    np.testing.assert_allclose(c_nat, c_py, atol=1e-6)


def test_native_recovers_pose():
    t, c, pose1_true, m, s1 = run_bootstrap(True)
    pose1 = se3m.index(m.state.pose, s1)
    err = np.asarray(se3m.local(pose1_true, pose1))
    assert np.linalg.norm(err) < 8e-3, f"pose1 error {err}"


def test_native_enqueue_keyframe_and_frames():
    img0, img1, cam, pose1_true = scene()
    m = Mapper(cfg(True), cam, decoder=None)
    m.init_two_frames(img0, img1)
    m.enqueue_keyframe(img1, se3m.identity())
    steps = 0
    while m.has_work() and steps < 80:
        m.mapping_step()
        steps += 1
    assert steps < 80
    # one-way frame through the native scheduler
    m.enqueue_frame(img1, se3m.identity(), kf_slot=m.kf_slots[-1])
    steps = 0
    while m.has_work() and steps < 80:
        m.mapping_step()
        steps += 1
    assert steps < 80
    assert np.all(np.isfinite(np.asarray(jax.device_get(m.state.pose.t))))


def test_native_sparse_factors():
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_mapper_sparse import textured

    cam = PinholeCamera.create(fx=80.0, fy=80.0, u0=48.0, v0=32.0,
                               width=96, height=64)
    c = MapperConfig(
        max_keyframes=4, max_frames=1, max_factors=8, code_size=4,
        height=64, width=96, pyramid_levels=2, pho_iters=(4, 6),
        use_schur=False, use_reprojection=True, max_keypoints=64,
        rep_iters=5, rep_max_dist=80, rep_ransac_maxiters=64,
        use_geometric=True, geo_npoints=32, geo_iters=5,
        connection_mode="LAST", use_native_scheduler=True,
    )
    m = Mapper(c, cam, decoder=None)
    img = textured()
    m.init_two_frames(img, img)
    m.enqueue_keyframe(textured(0.1), se3m.identity())
    steps = 0
    while m.has_work() and steps < 80:
        m.mapping_step()
        steps += 1
    assert steps < 80
    assert np.all(np.isfinite(np.asarray(jax.device_get(m.state.code))))
