"""Replay viewer (tools/replay_viewer.py): run-dir -> self-contained
interactive HTML with embedded surfel clouds (reference GUI replay
equivalent, visualizer.h:81-177 / shaders/drawkf.geom)."""
import base64
import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def _fake_run_dir(d):
    h, w = 24, 32
    img = (np.linspace(0, 255, h * w).reshape(h, w)).astype(np.uint8)
    dpt = (2.0 * 5000 * np.ones((h, w))).astype(np.uint16)
    dpt[0, 0] = 0  # a hole: must be dropped, not back-projected
    for kid in (0, 3):
        cv2.imwrite(os.path.join(d, f"kf_{kid}_img.png"), img)
        cv2.imwrite(os.path.join(d, f"kf_{kid}_dpt.png"), dpt)
    with open(os.path.join(d, "keyframes.txt"), "w") as f:
        f.write("0 0 0 0 0 0 0 1\n3 0.5 0 0 0 0 0 1\n")
    with open(os.path.join(d, "trajectory.txt"), "w") as f:
        for i in range(6):
            f.write(f"{i} {0.1 * i} 0 0 0 0 0 1\n")
    with open(os.path.join(d, "intrinsics.txt"), "w") as f:
        f.write("30.0 30.0 16.0 12.0\n")


def test_build_html_embeds_decodable_surfels(tmp_path):
    from tools.replay_viewer import build_html, load_run

    d = str(tmp_path)
    _fake_run_dir(d)
    run = load_run(d)
    assert len(run["kf_files"]) == 2
    assert run["intrinsics"][0] == 30.0
    html = build_html(run, stride=1, max_depth=8.0)
    assert "<canvas" in html and "requestAnimationFrame" in html
    data = json.loads(html.split("const DATA = ", 1)[1]
                      .split(";\nfunction", 1)[0])
    assert len(data["keyframes"]) == 2
    assert data["tmax"] == 5.0
    k0 = data["keyframes"][0]
    pos = np.frombuffer(base64.b64decode(k0["pos"]),
                        np.float32).reshape(-1, 3)
    # one hole pixel dropped
    assert pos.shape[0] == 24 * 32 - 1
    assert np.isfinite(pos).all()
    # all points at depth 2.0 in camera z (identity pose)
    assert np.allclose(pos[:, 2], 2.0, atol=1e-5)
    # second keyframe is translated by its pose
    k1 = data["keyframes"][1]
    pos1 = np.frombuffer(base64.b64decode(k1["pos"]),
                         np.float32).reshape(-1, 3)
    assert np.allclose(pos1[:, 0] - pos[:, 0], 0.5, atol=1e-5)


def test_main_writes_viewer(tmp_path, capsys):
    import sys

    from tools import replay_viewer as rv

    d = str(tmp_path)
    _fake_run_dir(d)
    argv = sys.argv
    sys.argv = ["replay_viewer.py", d, "--stride", "2"]
    try:
        rv.main()
    finally:
        sys.argv = argv
    out = os.path.join(d, "viewer.html")
    assert os.path.exists(out) and os.path.getsize(out) > 10_000


def test_live_viewer_streams_during_run(tmp_path):
    """LiveViewer (tools/live_viewer.py): attach to a facade, run a short
    CI-scale sequence, and check viewer.html exists mid-run with the
    auto-refresh tag and keyframe files, then finish() drops the tag."""
    import numpy as np

    from deepfactors_tpu.geometry.camera import PinholeCamera
    from deepfactors_tpu.io import synth
    from deepfactors_tpu.mapping.mapper import MapperConfig
    from deepfactors_tpu.system import DeepFactors, SystemConfig
    from deepfactors_tpu.loop.vocabulary import random_vocabulary
    from tools.live_viewer import LiveViewer

    H, W = 48, 64
    cam = PinholeCamera.create(fx=55.0, fy=55.0, u0=W / 2, v0=H / 2,
                               width=W, height=H)
    scene = synth.random_room(11, n_boxes=2, freq_scale=0.3)
    n = 14
    poses = synth.orbit_trajectory(n, radius=0.5, sweep=0.5 * np.pi)
    frames, depths = synth.render_sequence(scene, cam, poses, H, W,
                                           with_depth=True)
    oracle = synth.OracleDecoder(frames, depths, levels=2, code_size=4)
    cfg = SystemConfig(
        mapper=MapperConfig(max_keyframes=4, max_frames=1, max_factors=16,
                            code_size=4, height=H, width=W,
                            pyramid_levels=2, pho_iters=(2, 3),
                            connection_mode="LASTN", max_back_connections=2,
                            use_schur=False),
        dist_threshold=0.6, frame_dist_threshold=0.5,
        loop_closure=True, loop_active_window=3, loop_max_dist=0.3,
    )
    df = DeepFactors(cfg, cam, decoder=oracle,
                     vocabulary=random_vocabulary(64))
    d = str(tmp_path)
    lv = LiveViewer(d, df, every=3)
    df.bootstrap_two_frames(frames[0], frames[1])
    df.trajectory = [(0.0, df.pose_wc)]
    mid_html_seen = False
    for i in range(2, n):
        df.process_frame(float(i), frames[i])
        p = os.path.join(d, "viewer.html")
        if os.path.exists(p) and "http-equiv=\"refresh\"" in open(p).read():
            mid_html_seen = True
    assert mid_html_seen, "no auto-refreshing viewer.html written mid-run"
    assert any(f.startswith("kf_") for f in os.listdir(d))
    lv.finish()
    final = open(os.path.join(d, "viewer.html")).read()
    assert "http-equiv=\"refresh\"" not in final
    assert "const DATA" in final
