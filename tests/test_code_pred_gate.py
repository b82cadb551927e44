"""Photometric-error gate on the predicted code (VERDICT r3 next #5):
a catastrophically wrong code prediction must never make the keyframe
worse than the unconditional zero-code decode."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepfactors_tpu.geometry import se3 as se3m
from deepfactors_tpu.geometry import warping as wpg
from deepfactors_tpu.geometry.camera import PinholeCamera
from deepfactors_tpu.io import synth
from deepfactors_tpu.mapping.mapper import Mapper, MapperConfig

H, W, CS, L = 96, 128, 8, 3


class _StubModule:
    """Decoder module stub: GT zero-code prox (selected in-jit by nearest
    image checksum), controllable prediction."""

    def __init__(self, sums, prx_stack, code_pred, jac_scale):
        self.sums = jnp.asarray(sums, jnp.float32)
        self.prx_stack = jnp.asarray(prx_stack, jnp.float32)
        self.code_pred = jnp.asarray(code_pred, jnp.float32)
        self.jac_scale = float(jac_scale)

    def apply(self, params, img):
        from deepfactors_tpu.ops import image as ip

        idx = jnp.argmin(jnp.abs(self.sums - jnp.sum(img)))
        prx = self.prx_stack[idx]
        prx0 = tuple(ip.build_pyramid(prx, L))
        jac = tuple(
            jnp.full(p.shape + (CS,), self.jac_scale, jnp.float32)
            for p in prx0
        )
        stdev = tuple(jnp.zeros_like(p) for p in prx0)
        return {"prx0": prx0, "jac": jac, "stdev": stdev,
                "code_pred": self.code_pred}


class _StubDecoder:
    def __init__(self, module):
        self.module = module
        self.params = {}


def _scene():
    cam = PinholeCamera.create(fx=110.0, fy=110.0, u0=W / 2, v0=H / 2,
                               width=W, height=H)
    scene = synth.random_room(3, n_boxes=2)
    poses = synth.orbit_trajectory(24)
    frames, depths = synth.render_sequence(scene, cam, poses[:6], H, W,
                                           with_depth=True)
    return cam, poses, frames, depths


@pytest.mark.parametrize("bad_pred", [True, False])
def test_prediction_gate(bad_pred):
    cam, poses, frames, depths = _scene()
    sums = [float(np.sum(f)) for f in frames]
    prx_stack = np.stack([
        np.asarray(wpg.depth_to_prox(jnp.asarray(d, jnp.float32), 2.0))
        for d in depths
    ])
    # bad: huge code prediction through a nonzero jac ruins the prox;
    # good: zero prediction (prediction == zero-code decode, gate is a tie
    # and must KEEP the prediction path)
    code_pred = np.full(CS, 2.0, np.float32) if bad_pred else \
        np.zeros(CS, np.float32)
    dec = _StubDecoder(_StubModule(sums, prx_stack, code_pred,
                                   jac_scale=0.05))
    cfg = MapperConfig(max_keyframes=4, max_frames=0, max_factors=8,
                       code_size=CS, height=H, width=W, pyramid_levels=L,
                       pho_iters=(2, 2, 2), use_schur=False)
    m = Mapper(cfg, cam, decoder=dec)
    m.init_two_frames(frames[0], frames[1], pose0=poses[0], pose1=poses[1])
    slot = m.add_keyframe_to_map(frames[2], poses[2])

    prx_kf = np.asarray(jax.device_get(m.state.levels[0].prx0[slot]))
    prx_gt = prx_stack[int(np.argmin(np.abs(np.asarray(sums)
                                            - np.sum(frames[2]))))]
    d_zero = float(np.abs(prx_kf - prx_gt).mean())
    if bad_pred:
        # the garbage prediction (prx + 0.05*8*2 = prx+0.8) must be gated
        # out: stored prx0 equals the zero-code decode
        assert d_zero < 1e-4, d_zero
    else:
        # a tie keeps the prediction path (here identical to zero code)
        assert d_zero < 1e-4, d_zero
