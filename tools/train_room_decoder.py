"""Train the depth decoder on the procedural indoor-room distribution.

The reference ships ScanNet-trained weights (scripts/download_network.bash,
decoder_network.cpp:139-229) — its metric-scale anchor. No real depth data
exists in this environment, so this trains on io/synth.py's ray-cast rooms
(the same distribution the full-scale e2e ATE benchmark runs on) and reports
held-out depth RMSE for zero-code and predicted-code decodes.

Pipeline is TPU-resident: all training images/depths are pre-rendered into
one device array (vmapped renderer, one dispatch per room), batches are
gathered on device, and only the loss scalar syncs every ``log_every`` steps
(a host sync costs ~50-70 ms through the axon tunnel).

Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/train_room_decoder.py \
      [--steps 4000] [--out data/nets/room256_32]
"""
import argparse
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def build_dataset(rooms, poses_per_room, H, W, cam, seed=0, n_boxes=3,
                  randomize=False, scale_range=(0.75, 2.2)):
    """Pre-render [rooms*poses, H, W] images + depths on device.

    ``randomize=True`` is the domain-randomization tier (VERDICT r3 next
    #5): per-room box count 0-5, texture frequency-scale jitter 0.6-1.4,
    wider camera radius, and camera roll — the geometry/texture axes; the
    lighting/photometric axes are the train-time image augmentations
    (``make_augment``)."""
    from deepfactors_tpu.io import synth
    from deepfactors_tpu.geometry.se3 import SE3

    rng = np.random.RandomState(seed)

    def random_poses(n, r_max=1.2, roll_amp=0.0):
        qs, ts = [], []
        for _ in range(n):
            r = rng.uniform(0.0, r_max)
            th = rng.uniform(0, 2 * np.pi)
            ts.append([r * np.cos(th), rng.uniform(-0.25, 0.25),
                       r * np.sin(th)])
            q = synth._np_yaw_pitch_quat(
                rng.uniform(0, 2 * np.pi), rng.uniform(-0.25, 0.25))
            if roll_amp > 0.0:
                # compose a roll about the camera z axis: q * (cr, 0, 0, sr)
                half = 0.5 * rng.uniform(-roll_amp, roll_amp)
                cr, sr = np.cos(half), np.sin(half)
                w, x, y, z = q
                q = np.array([w * cr - z * sr, x * cr - y * sr,
                              y * cr + x * sr, z * cr + w * sr], q.dtype)
            qs.append(q)
        return SE3(jnp.asarray(np.stack(qs), jnp.float32),
                   jnp.asarray(np.asarray(ts, np.float32)))

    # Plain (1x) render: the room textures are band-limited by construction
    # (random_room caps frequencies well above pixel scale at this camera),
    # so training images don't need the supersampled AA path — which is
    # ~60x more HBM traffic per frame. Chunked dispatches bound peak memory.
    render_batch = jax.jit(jax.vmap(
        lambda sc, q, t: synth.render(sc, cam, SE3(q, t), H, W),
        in_axes=(None, 0, 0)))

    CHUNK = 8
    imgs, dpts = [], []
    for r in range(rooms):
        if randomize:
            nb = int(rng.randint(0, 6))
            fs = float(rng.uniform(0.7, 1.3))
            # depth-scale axis (VERDICT r4 next #4): sweep the room size so
            # views cover ~1.5-7 m median depth — the r4-randomized weights
            # under-covered the far field (rooms 2-3 m deep; real indoor
            # frames 4.5-6 m) and the predict head lost to a zero code on
            # exactly the far-field REALIMG images
            ss = float(rng.uniform(*scale_range))
            sc = synth.random_room(seed * 7919 + r, nb, freq_scale=fs,
                                   size_scale=ss)
            ps = random_poses(poses_per_room, r_max=1.5 * ss, roll_amp=0.25)
        else:
            sc = synth.random_room(seed * 7919 + r, n_boxes)
            ps = random_poses(poses_per_room)
        for c in range(0, poses_per_room, CHUNK):
            im, dp = render_batch(sc, ps.q[c:c + CHUNK], ps.t[c:c + CHUNK])
            imgs.append(im)
            dpts.append(dp)
    return jnp.concatenate(imgs), jnp.concatenate(dpts)


def make_augment(H, W, strength="mild"):
    """Photometric domain randomization, applied to the DECODER/pred-head
    input only (the encoder + NLL target stay clean): random gamma,
    contrast/brightness, a smooth illumination ramp, vignetting, sensor
    noise, and occasional blur. The pred head learns photometric
    invariance — off-distribution input (REALIMG r3: real frames broke it
    35x) then extrapolates far less. All ops are shape-static; no conv
    primitives (unrolled 3x3 binomial, see ops/image)."""
    from deepfactors_tpu.ops import image as ip

    ys, xs = np.mgrid[0:H, 0:W]
    ys = jnp.asarray((ys / (H - 1) - 0.5) * 2, jnp.float32)
    xs = jnp.asarray((xs / (W - 1) - 0.5) * 2, jnp.float32)
    r2 = xs ** 2 + ys ** 2
    k3 = jnp.asarray([[1, 2, 1], [2, 4, 2], [1, 2, 1]], jnp.float32) / 16.0
    # strong = the real-imagery tier (REALIMG): widest photometric
    # randomization, costs in-domain accuracy; mild = balanced tier
    A = (dict(gamma=(0.6, 1.7), gain=(0.7, 1.25), bias=0.12, ramp=0.25,
              vig=0.35, noise=0.03, blur_p=0.3) if strength == "strong"
         else dict(gamma=(0.75, 1.4), gain=(0.8, 1.2), bias=0.08,
                   ramp=0.15, vig=0.25, noise=0.02, blur_p=0.2))

    def augment(img, key):
        ks = jax.random.split(key, 8)
        u = lambda k, lo, hi: jax.random.uniform(k, (), minval=lo,
                                                 maxval=hi)
        img = jnp.clip(img, 1e-3, 1.0) ** u(ks[0], *A["gamma"])
        gain = u(ks[1], *A["gain"])
        bias = u(ks[2], -A["bias"], A["bias"])
        ramp = (u(ks[3], -A["ramp"], A["ramp"]) * xs
                + u(ks[4], -A["ramp"], A["ramp"]) * ys)        # illumination
        vig = 1.0 - u(ks[5], 0.0, A["vig"]) * r2               # vignette
        img = (img * gain + bias + ramp) * vig
        img = img + u(ks[6], 0.0, A["noise"]) * jax.random.normal(
            ks[6], img.shape)                                  # sensor noise
        blur = ip._conv2d_clamped(img, k3)
        img = jnp.where(jax.random.bernoulli(ks[7], A["blur_p"]), blur, img)
        return jnp.clip(img, 0.0, 1.0)

    return jax.jit(jax.vmap(augment))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--rooms", type=int, default=56)
    ap.add_argument("--val-rooms", type=int, default=8)
    ap.add_argument("--poses-per-room", type=int, default=48)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--beta", type=float, default=3e-4)
    ap.add_argument("--base-ch", type=int, default=32)
    ap.add_argument("--pred-head", default="gap", choices=("gap", "conv"))
    ap.add_argument("--distill-w", type=float, default=0.1)
    ap.add_argument("--out", default="data/nets/room256_32")
    ap.add_argument("--log-every", type=int, default=200)
    ap.add_argument("--aug-strength", default="mild",
                    choices=("mild", "strong"))
    ap.add_argument("--randomize", action="store_true",
                    help="domain randomization: varied geometry/texture "
                         "scale/camera roll + photometric augmentation of "
                         "the decoder input (VERDICT r3 next #5)")
    ap.add_argument("--scale-lo", type=float, default=0.75,
                    help="room size_scale randomization lower bound")
    ap.add_argument("--scale-hi", type=float, default=2.2,
                    help="room size_scale randomization upper bound")
    args = ap.parse_args()

    from deepfactors_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import optax
    from deepfactors_tpu.geometry import warping as wp
    from deepfactors_tpu.geometry.camera import PinholeCamera
    from deepfactors_tpu.models.decoder import (Decoder, NetworkConfig,
                                                save_params)
    from deepfactors_tpu.models.train_decoder import (TrainState, VAEModel,
                                                      extract_decoder_params,
                                                      make_train_step)

    H, W, CS, L = 192, 256, 32, 3
    AVG_DPT = 2.0
    cam = PinholeCamera.create(fx=220.0, fy=220.0, u0=W / 2, v0=H / 2,
                               width=W, height=H)
    cfg = NetworkConfig(code_size=CS, pyramid_levels=L, input_width=W,
                        input_height=H, avg_dpt=AVG_DPT,
                        fx=220.0, fy=220.0, u0=W / 2, v0=H / 2,
                        base_ch=args.base_ch, pred_head=args.pred_head)

    print("rendering training set...", flush=True)
    t0 = time.time()
    sr = (args.scale_lo, args.scale_hi)
    imgs, dpts = build_dataset(args.rooms, args.poses_per_room, H, W, cam,
                               seed=0, randomize=args.randomize,
                               scale_range=sr)
    val_imgs, val_dpts = build_dataset(args.val_rooms, 16, H, W, cam,
                                       seed=99991,
                                       randomize=args.randomize,
                                       scale_range=sr)
    gts = wp.depth_to_prox(dpts, AVG_DPT)
    n = imgs.shape[0]
    jax.block_until_ready(gts)
    print(f"dataset: {n} train / {val_imgs.shape[0]} val frames "
          f"({time.time() - t0:.1f}s)", flush=True)

    model = VAEModel(code_size=CS, levels=L, base_ch=args.base_ch,
                     pred_head=args.pred_head)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((H, W), jnp.float32)
    # jitted init: unjitted flax init dispatches op-by-op (~7 ms each
    # through the axon tunnel — minutes for a U-Net)
    params = jax.jit(model.init, static_argnums=(4,))(
        rng, dummy, jnp.full_like(dummy, 0.5), rng, args.beta)
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(optax.cosine_decay_schedule(
                         args.lr, args.steps, alpha=0.1)))
    state = TrainState(params, tx.init(params), jnp.asarray(0))
    step_fn = make_train_step(model, tx, args.beta,
                              distill_w=args.distill_w)

    # NOTE: the dataset MUST be an argument, not a closure — jit embeds
    # closed-over arrays as program constants and a 0.5 GB literal wedges
    # the compiler/tunnel
    @jax.jit
    def pick(imgs_, gts_, key):
        idx = jax.random.randint(key, (args.batch,), 0, n)
        return imgs_[idx], gts_[idx]

    aug_fn = (make_augment(H, W, args.aug_strength)
              if args.randomize else None)

    t0 = time.time()
    for i in range(args.steps):
        rng, k1, k2, k3 = jax.random.split(rng, 4)
        bi, bg = pick(imgs, gts, k1)
        if aug_fn is not None:
            bi = aug_fn(bi, jax.random.split(k3, bi.shape[0]))
        state, loss, aux = step_fn(state, bi, bg, k2)
        if i % args.log_every == 0 or i == args.steps - 1:
            print(f"step {i}: loss={float(loss):.4f} "
                  f"nll={float(aux['nll']):.4f} kl={float(aux['kl']):.2f} "
                  f"distill={float(aux['distill']):.3f} "
                  f"({(time.time() - t0):.0f}s)", flush=True)
        # crash-safe periodic checkpoint (a TPU-worker crash at step 13k
        # once cost the whole run — weights only saved at the end)
        if i > 0 and i % 4000 == 0:
            os.makedirs(os.path.dirname(args.out), exist_ok=True)
            save_params(args.out + ".ckpt.pkl",
                        extract_decoder_params(state.params))

    dec_params = extract_decoder_params(state.params)
    decoder = Decoder(cfg, params=dec_params)

    # held-out depth quality: zero-code, predicted-code, and OPTIMAL-code
    # (ridge least-squares fit of the code to GT prox — the expressiveness
    # ceiling photometric BA can reach with this decoder)
    @jax.jit
    def eval_one(img, dpt):
        out = decoder._apply(decoder.params, img)
        prx_gt = wp.depth_to_prox(dpt, AVG_DPT)
        code = out["code_pred"]
        J = out["jac"][0].reshape(-1, CS)
        r = (prx_gt - out["prx0"][0]).reshape(-1)
        A = J.T @ J + (1.0 / 1.0**2) * jnp.eye(CS)  # code_prior sigma 1
        code_opt = jnp.linalg.solve(A, J.T @ r)
        prx_p = out["prx0"][0] + jnp.einsum("hwc,c->hw", out["jac"][0], code)
        prx_o = out["prx0"][0] + (J @ code_opt).reshape(prx_gt.shape)
        d0 = wp.prox_to_depth(jnp.clip(out["prx0"][0], 1e-4, 1 - 1e-4),
                              AVG_DPT)
        dp = wp.prox_to_depth(jnp.clip(prx_p, 1e-4, 1 - 1e-4), AVG_DPT)
        do = wp.prox_to_depth(jnp.clip(prx_o, 1e-4, 1 - 1e-4), AVG_DPT)
        return jnp.stack([
            jnp.sqrt(jnp.mean((d0 - dpt) ** 2)),
            jnp.sqrt(jnp.mean((dp - dpt) ** 2)),
            jnp.sqrt(jnp.mean((out["prx0"][0] - prx_gt) ** 2)),
            jnp.sqrt(jnp.mean((prx_p - prx_gt) ** 2)),
            jnp.sqrt(jnp.mean(code ** 2)),
            jnp.sqrt(jnp.mean((do - dpt) ** 2)),
            jnp.sqrt(jnp.mean(code_opt ** 2)),
        ])

    stats = np.stack([np.asarray(jax.device_get(eval_one(val_imgs[i],
                                                         val_dpts[i])))
                      for i in range(val_imgs.shape[0])])
    mean = stats.mean(0)
    print(f"val depth RMSE: zero-code={mean[0]:.4f}m "
          f"pred-code={mean[1]:.4f}m opt-code={mean[5]:.4f}m | "
          f"prox RMSE: zero={mean[2]:.4f} pred={mean[3]:.4f} | "
          f"code rms pred={mean[4]:.3f} opt={mean[6]:.3f}", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    save_params(args.out + ".pkl", decoder.params)
    with open(args.out + ".json", "w") as f:
        json.dump({
            "code_size": CS, "pyramid_levels": L, "input_width": W,
            "input_height": H, "avg_dpt": AVG_DPT, "grayscale": True,
            "fx": 220.0, "fy": 220.0, "u0": W / 2, "v0": H / 2,
            "base_ch": args.base_ch, "pred_head": args.pred_head,
            "trained_on": (f"io.synth room_dataset ({args.rooms} rooms x "
                           f"{args.poses_per_room} views), {args.steps} "
                           f"steps adamw {args.lr}, beta {args.beta}"),
            "val_depth_rmse_zero_code": round(float(mean[0]), 4),
            "val_depth_rmse_pred_code": round(float(mean[1]), 4),
            "val_depth_rmse_opt_code": round(float(mean[5]), 4),
            "val_prox_rmse_zero_code": round(float(mean[2]), 4),
            "val_prox_rmse_pred_code": round(float(mean[3]), 4),
        }, f, indent=1)
    print(f"saved {args.out}.pkl", flush=True)


if __name__ == "__main__":
    main()
