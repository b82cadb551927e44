"""On-TPU kernel numerics regression suite: every Pallas kernel vs its XLA
reference ON THE REAL CHIP, at test shapes AND at the bench problem size.

Interpret-mode/CPU tests do NOT validate Mosaic lowering (hardware-only
failure modes seen during development: pltpu.roll with traced negative
shifts silently returning garbage, bf16 MXU Gram quantization breaking
Cholesky) — this institutionalizes the hardware check as one command:

  PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_numerics_check.py

Exit code 0 = all kernels match their XLA references within hardware
tolerances. Runs:
  1. the kernel-vs-reference pytest files on the TPU backend
     (DF_TPU_TESTS=1 skips the CPU forcing in tests/conftest.py)
  2. a full-bench-shape (256x192, CS=32) fused-Gram vs XLA comparison
     (the shapes the Pallas kernels actually specialize to in production)
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TEST_FILES = [
    "tests/test_sfm_fused.py",
    "tests/test_pallas_kernel.py",
]


def run_pytest_on_tpu() -> bool:
    env = dict(os.environ)
    env["DF_TPU_TESTS"] = "1"
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    cmd = [sys.executable, "-m", "pytest", "-q", *TEST_FILES]
    print(f"[1/2] pytest on TPU backend: {' '.join(TEST_FILES)}", flush=True)
    r = subprocess.run(cmd, cwd=REPO, env=env)
    return r.returncode == 0


def bench_shape_check() -> bool:
    """Fused Gram at the production shape vs the XLA path."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from deepfactors_tpu.geometry import se3 as se3m
    from deepfactors_tpu.geometry.se3 import SE3
    from deepfactors_tpu.geometry.camera import PinholeCamera
    from deepfactors_tpu.io import synth
    from deepfactors_tpu.ops import dense_sfm as ds
    from deepfactors_tpu.ops.pallas import sfm_kernel as sk

    print("[2/2] bench-shape (256x192, CS=32) fused Gram vs XLA", flush=True)
    assert jax.devices()[0].platform != "cpu", (
        "no TPU visible — this check must run on hardware")

    H, W, CS, K, P = 192, 256, 32, 4, 8
    cam = PinholeCamera.create(fx=220.0, fy=220.0, u0=W / 2, v0=H / 2,
                               width=W, height=H)
    scene = synth.random_room(21, n_boxes=3)
    # 120-frame pacing: consecutive keyframes ~8 deg apart so factor pairs
    # genuinely overlap — at the old 24-frame pacing every pair was 40-120
    # deg apart with ZERO valid pixels and the comparison was vacuous
    poses_w = synth.orbit_trajectory(120)
    rng = np.random.RandomState(0)
    kf_f = [0, 2, 4, 6]
    imgs, dpts = [], []
    for i in kf_f:
        im, dp = synth.render_aa(scene, cam, poses_w[i], H, W)
        imgs.append(np.asarray(im))
        dpts.append(np.asarray(dp))
    imgs = np.stack(imgs)
    dpt = np.stack(dpts)
    grads = np.stack([np.stack(np.gradient(im)[::-1], axis=-1)
                      for im in imgs]).astype(np.float32)
    jac = (0.02 * rng.standard_normal((K, H, W, CS))).astype(np.float32)
    poses = se3m.stack([se3m.mul(se3m.inverse(poses_w[kf_f[0]]),
                                 poses_w[i]) for i in kf_f])
    src = jnp.asarray(rng.randint(0, K, P), jnp.int32)
    dst = jnp.asarray((np.asarray(src) + 1 + rng.randint(0, K - 1, P)) % K,
                      jnp.int32)
    codes = jnp.asarray(0.1 * rng.standard_normal((K, CS)), jnp.float32)

    params = ds.SfmParams(huber_delta=0.3, avg_dpt=2.0, min_dpt=0.0,
                          valid_border=2)
    poses0 = SE3(poses.q[src], poses.t[src])
    poses1 = SE3(poses.q[dst], poses.t[dst])

    prev = ds.use_pallas_warp()
    ds.use_pallas_warp(False)
    try:
        ref = ds.sfm_step_batch(
            poses0, poses1, codes[src], cam,
            jnp.asarray(imgs)[src], jnp.asarray(imgs)[dst],
            jnp.asarray(dpt)[src], jnp.zeros((P, H, W)),
            jnp.asarray(jac)[src], jnp.asarray(grads)[dst], params,
            grad_mode="interp")
    finally:
        ds.use_pallas_warp(prev)

    pose_10, j_pose1, j_pose0 = jax.vmap(se3m.relative_pose_jacobians)(
        poses1, poses0)
    kp = sk.make_sfm_params(pose_10, cam, params.valid_border,
                            params.min_dpt, params.huber_delta,
                            params.avg_dpt)
    jacT = jnp.asarray(np.transpose(jac, (0, 3, 1, 2)))
    G = sk.sfm_gram_batch(
        kp, src, dst, jnp.asarray(imgs), jnp.asarray(dpt), jacT,
        jnp.asarray(imgs), jnp.asarray(grads[..., 0]),
        jnp.asarray(grads[..., 1]), grad_mode="interp")
    JtJ, Jtr, res, inl = sk.system_from_gram(G, j_pose0, j_pose1, CS)

    ok = True
    # degeneracy guard: a zero-inlier comparison proves nothing
    min_inl = float(np.min(np.asarray(ref.inliers)))
    print(f"  ref inliers per factor: min {min_inl:.0f}", flush=True)
    if min_inl < 1000:
        print("  DEGENERATE: factor pairs have (almost) no overlap",
              flush=True)
        ok = False
    inl_err = np.max(np.abs(np.asarray(inl) - np.asarray(ref.inliers)))
    jtj_rel = (np.max(np.abs(np.asarray(JtJ) - np.asarray(ref.JtJ)))
               / np.max(np.abs(np.asarray(ref.JtJ))))
    jtr_rel = (np.max(np.abs(np.asarray(Jtr) - np.asarray(ref.Jtr)))
               / np.max(np.abs(np.asarray(ref.Jtr))))
    res_rel = np.max(np.abs(np.asarray(res) - np.asarray(ref.residual))
                     / np.maximum(np.asarray(ref.residual), 1e-9))
    sym = np.max(np.abs(np.asarray(JtJ)
                        - np.swapaxes(np.asarray(JtJ), -1, -2)))
    print(f"  inliers max err {inl_err}  JtJ rel {jtj_rel:.2e}  "
          f"Jtr rel {jtr_rel:.2e}  resid rel {res_rel:.2e}  sym {sym:.2e}",
          flush=True)
    # hardware MXU Gram is bf16-quantized; symmetrization exact by design
    if inl_err > 0 or jtj_rel > 1e-2 or jtr_rel > 1e-2 or res_rel > 3e-3 \
            or sym > 0:
        ok = False
    print("  bench-shape check:", "PASS" if ok else "FAIL", flush=True)
    return ok


def main():
    ok1 = run_pytest_on_tpu()
    ok2 = bench_shape_check()
    print("TPU NUMERICS:", "PASS" if (ok1 and ok2) else "FAIL", flush=True)
    sys.exit(0 if (ok1 and ok2) else 1)


if __name__ == "__main__":
    main()
