"""Keyframe capacity: marginalize-to-prior eviction.

The reference grows its map unboundedly (ISAM2 keeps stale keyframes at the
Bayes-tree periphery, mapper.cpp:478-510). With fixed-capacity TPU pools the
equivalent is Mapper.marginalize_keyframe: fold the victim's photometric
factors into marginal priors over its neighbors (the marginalizeLeaves
analog, mapper.cpp:395-436), archive the pose, free slot + factors + links.
These tests verify the window slides past max_keyframes without crashing and
that the folded prior actually anchors the surviving neighbor.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepfactors_tpu.geometry import se3 as se3m, warping as wp
from deepfactors_tpu.geometry.se3 import SE3
from deepfactors_tpu.geometry.camera import PinholeCamera
from deepfactors_tpu.ops import dense_sfm as ds, image as ip
from deepfactors_tpu.mapping.mapper import Mapper, MapperConfig

H, W, CS = 48, 64, 4


def make_cam():
    return PinholeCamera.create(fx=60.0, fy=60.0, u0=W / 2, v0=H / 2,
                                width=W, height=H)


def texture(k):
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    return (0.5 + 0.25 * np.sin(xs / 5.0 + k) + 0.2 * np.cos(ys / 4.0 - k)
            + 0.05 * np.sin((2 * xs + 3 * ys) / 7.0)).astype(np.float32)


def cfg(**kw):
    base = dict(
        max_keyframes=3, max_frames=1, max_factors=12, code_size=CS,
        height=H, width=W, pyramid_levels=2, pho_iters=(4, 6),
        huber_delta=0.3, connection_mode="LASTN", max_back_connections=2,
        lm_lambda=1e-4, use_schur=False,
    )
    base.update(kw)
    return MapperConfig(**base)


def test_eviction_slides_window_past_capacity():
    m = Mapper(cfg(), make_cam(), decoder=None)
    m.init_two_frames(texture(0), texture(1))
    evicted = []
    m.evict_callback = lambda slot, kid: evicted.append((slot, kid))
    for k in range(2, 7):
        m.enqueue_keyframe(texture(k), se3m.identity())
        while m.has_work():
            m.mapping_run()
    # window slid: capacity respected, oldest ids evicted in order
    assert len(m.kf_slots) == 3
    assert [kid for _, kid in evicted] == [0, 1, 2, 3]
    assert len(m.archived) == 4
    # live ids are the newest three
    ids = np.asarray(jax.device_get(m.state.ids))
    live = sorted(int(ids[s]) for s in m.kf_slots)
    assert live == [4, 5, 6]
    # active mask consistent
    act = np.asarray(jax.device_get(m.state.active))
    assert act.sum() == 3
    # no factor references an evicted slot
    pool = m.sched.photo_pool
    for i in range(m.cfg.max_factors):
        if pool.active[i] and not pool.dst_is_frame[i]:
            assert int(pool.src[i]) in m.kf_slots
            assert int(pool.dst[i]) in m.kf_slots


def test_eviction_respects_protected_slots():
    m = Mapper(cfg(), make_cam(), decoder=None)
    m.init_two_frames(texture(0), texture(1))
    first = m.kf_slots[0]
    m.protected_slots = {first}
    m.enqueue_keyframe(texture(2), se3m.identity())
    m.enqueue_keyframe(texture(3), se3m.identity())  # must evict slot #2
    assert first in m.kf_slots
    assert len(m.kf_slots) == 3


def test_marginal_prior_anchors_neighbor():
    """After evicting kf0, the folded prior keeps kf1 near its estimate even
    though kf1 loses its partner factor."""
    m = Mapper(cfg(), make_cam(), decoder=None)
    m.init_two_frames(texture(0), texture(1))
    s0, s1 = m.kf_slots
    pose1_before = jax.device_get(
        (m.state.pose.q[s1], m.state.pose.t[s1]))
    m.marginalize_keyframe(s0)
    assert bool(jax.device_get(m.marginals.active[s1]))
    H_prior = np.asarray(jax.device_get(m.marginals.H[s1]))
    # prior carries real information on the pose block
    assert np.trace(H_prior[:6, :6]) > 0
    # anchor equals the estimate at fold time
    aq = np.asarray(jax.device_get(m.marginals.anchor_q[s1]))
    np.testing.assert_allclose(aq, np.asarray(pose1_before[0]), atol=1e-6)
    # evicted slot's own marginal store is cleared
    assert not bool(jax.device_get(m.marginals.active[s0]))


def test_anchor_reanchors_after_evicting_first_keyframe():
    m = Mapper(cfg(), make_cam(), decoder=None)
    m.init_two_frames(texture(0), texture(1))
    s0, s1 = m.kf_slots
    m.enqueue_keyframe(texture(2), se3m.identity())
    m.marginalize_keyframe(s0)
    assert m.kf_slots[0] == s1
    # new gauge anchor is kf1's current pose
    aq = np.asarray(jax.device_get(m._anchor_pose.q))
    q1 = np.asarray(jax.device_get(m.state.pose.q[s1]))
    np.testing.assert_allclose(aq, q1, atol=1e-6)
    # mapping still runs after re-anchoring
    while m.has_work():
        m.mapping_run()


def test_native_scheduler_erase_keyframe():
    from deepfactors_tpu import native

    if not native.available():
        pytest.skip("native library not built")
    ns = native.NativeScheduler(8, 4, 4)
    ns.add_work(native.PHOTO, 0, 1, False, [2, 2])
    ns.add_work(native.PHOTO, 1, 0, False, [2, 2])
    ns.add_work(native.PHOTO, 2, 1, False, [2, 2])
    ns.bookkeeping()
    src, dst, _, _, act = ns.pool(native.PHOTO)
    assert act.sum() == 3
    ns.erase_keyframe(0)
    src, dst, _, _, act = ns.pool(native.PHOTO)
    assert act.sum() == 1
    assert src[np.nonzero(act)[0][0]] == 2
    assert ns.num_works() == 1


def test_native_pool_exhaustion_raises():
    from deepfactors_tpu import native

    if not native.available():
        pytest.skip("native library not built")
    ns = native.NativeScheduler(2, 2, 2)
    for i in range(3):
        ns.add_work(native.PHOTO, i, i + 1, False, [1])
    with pytest.raises(RuntimeError, match="exhausted"):
        ns.bookkeeping()
