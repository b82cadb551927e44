"""Observability: mapper.dump_state / save_graphs / error mosaics
(reference PrintWork + SaveGraphs + debug error images,
mapper.cpp:569-632, 647-795)."""
import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp

from deepfactors_tpu.geometry import se3 as se3m
from deepfactors_tpu.geometry.camera import PinholeCamera
from deepfactors_tpu.mapping.mapper import Mapper, MapperConfig

H, W, CS = 48, 64, 4


def make_mapper():
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)

    def tex(k):
        return (0.5 + 0.25 * np.sin(xs / 5.0 + k)
                + 0.2 * np.cos(ys / 4.0 - k)).astype(np.float32)

    cam = PinholeCamera.create(fx=60.0, fy=60.0, u0=W / 2, v0=H / 2,
                               width=W, height=H)
    cfg = MapperConfig(max_keyframes=4, max_frames=1, max_factors=8,
                       code_size=CS, height=H, width=W, pyramid_levels=2,
                       pho_iters=(4, 6), use_schur=False)
    m = Mapper(cfg, cam, decoder=None)
    m.init_two_frames(tex(0), tex(1))
    m.enqueue_keyframe(tex(2), se3m.identity())
    return m, cam


def test_dump_state_and_graphs():
    m, cam = make_mapper()
    d = m.dump_state(verbose_errors=True)
    assert len(d["keyframes"]) == 3
    assert len(d["photo_factors"]) >= 2
    # outstanding works from the just-enqueued keyframe are visible
    assert len(d["works"]) >= 1
    kf_kf = [f for f in d["photo_factors"] if not f["dst_is_frame"]]
    assert all("residual" in f and "inliers" in f for f in kf_kf)
    assert all(f["inliers"] > 0 for f in kf_kf)
    # json-serializable
    import json

    json.dumps(d)

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "g.dot")
        m.save_graphs(p)
        dot = open(p).read()
        assert "graph factors" in dot and "pho L" in dot
        assert dot.count("k0") >= 1


def test_error_mosaic_export():
    cv2 = __import__("cv2")
    m, cam = make_mapper()
    from deepfactors_tpu import viz

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "err.png")
        labels = viz.export_error_mosaics(p, m, cam)
        assert labels and os.path.exists(p)
        img = cv2.imread(p)
        assert img is not None and img.size > 0
