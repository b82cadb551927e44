"""Two-process CPU demo of the multi-host distributed-BA path.

Each process owns half the photometric factors (parallel.multihost
host_factor_slice), builds only its local rows, assembles the
globally-sharded factor arrays, and runs distributed BA steps whose psum
crosses the process boundary — the DCN story of SURVEY §7.1, smoke-testable
with zero TPUs.

Launcher mode (spawns both workers, checks they agree):
  PYTHONPATH=/root/repo python tools/multihost_demo.py

Worker mode (what the launcher runs, or run manually in two shells):
  PYTHONPATH=/root/repo python tools/multihost_demo.py \
      --worker --nproc 2 --proc-id {0,1} [--coord localhost:9981]
"""
import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(nproc: int, proc_id: int, coord: str, devices_per_proc: int = 2):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={devices_per_proc}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    # distributed bring-up MUST precede any jax call that initialises the
    # backend — including importing deepfactors_tpu modules (some hold
    # module-level jnp constants)
    from deepfactors_tpu.parallel import multihost

    multihost.initialize(coordinator_address=coord, num_processes=nproc,
                         process_id=proc_id)

    import jax.numpy as jnp
    import numpy as np

    from deepfactors_tpu.geometry.camera import PinholeCamera
    from deepfactors_tpu.ops import dense_sfm as ds
    from deepfactors_tpu.parallel import dist_ba
    assert jax.process_count() == nproc
    mesh = multihost.global_mesh("factors")

    # PRODUCTION problem size (256x192, CS=32, 2 factors/device) per
    # VERDICT r2 next #7 — the DCN psum crosses processes at the real
    # system dimension D = K*(6+CS)
    K, CS, H, W = 8, 32, 192, 256
    n_factors = 2 * nproc * devices_per_proc
    cam = PinholeCamera.create(fx=220.0, fy=220.0, u0=W / 2, v0=H / 2,
                               width=W, height=H)
    params = ds.SfmParams(huber_delta=0.3, avg_dpt=2.0, min_dpt=0.0,
                          valid_border=1)

    # deterministic global factor table; each process BUILDS only its slice
    rng = np.random.RandomState(0)
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    imgs = np.stack(
        [0.5 + 0.3 * np.sin(xs / 3 + k) * np.cos(ys / 4 + k)
         for k in range(K)]).astype(np.float32)
    src_all = np.arange(n_factors, dtype=np.int32) % K
    dst_all = (src_all + 1) % K
    jac_all = 0.01 * rng.standard_normal(
        (n_factors, H, W, CS)).astype(np.float32)
    grad_all = 0.1 * rng.standard_normal(
        (n_factors, H, W, 2)).astype(np.float32)

    sl = multihost.host_factor_slice(n_factors)
    local = dist_ba.ShardedFactorData(
        src=src_all[sl], dst=dst_all[sl],
        active=np.ones((sl.stop - sl.start,), bool),
        img0=imgs[src_all[sl]], img1=imgs[dst_all[sl]],
        prx0=np.full((sl.stop - sl.start, H, W), 0.5, np.float32),
        jac0=jac_all[sl],
        std0=np.zeros((sl.stop - sl.start, H, W), np.float32),
        grad1=grad_all[sl],
    )
    fd = multihost.host_local_to_global(mesh, "factors", local)

    step = dist_ba.make_ba_step(mesh, "factors", K, CS, cam, params)
    pose_q = jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (K, 1))
    pose_t = jnp.zeros((K, 3), jnp.float32)
    codes = jnp.zeros((K, CS), jnp.float32)
    active = jnp.ones((K,), bool)
    for _ in range(3):
        pose_q, pose_t, codes, stats = step(pose_q, pose_t, codes, fd,
                                            active)
    pose_t, stats = jax.device_get((pose_t, stats))
    print(f"proc {proc_id}: pose_t[1]={np.asarray(pose_t)[1].round(6)} "
          f"stats={np.asarray(stats).round(4)}", flush=True)
    # digest for the launcher's cross-process agreement check
    print(f"DIGEST {float(jnp.sum(jnp.abs(pose_t))):.8f} "
          f"{float(stats[1]):.1f}", flush=True)


def launcher():
    coord = "localhost:9981"
    procs = []
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             "--nproc", "2", "--proc-id", str(pid), "--coord", coord],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO))
    outs = [p.communicate(timeout=420)[0] for p in procs]
    digests = []
    for pid, out in enumerate(outs):
        print(f"--- proc {pid} ---")
        print(out)
        for line in out.splitlines():
            if line.startswith("DIGEST"):
                digests.append(line)
    ok = (len(digests) == 2 and digests[0] == digests[1]
          and all(p.returncode == 0 for p in procs))
    print("MULTIHOST DEMO:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--proc-id", type=int, default=0)
    ap.add_argument("--coord", default="localhost:9981")
    args = ap.parse_args()
    if args.worker:
        worker(args.nproc, args.proc_id, args.coord)
    else:
        launcher()
