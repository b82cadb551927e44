"""Decoder training: CodeSLAM-style conditional VAE over depth.

The reference ships pre-trained ScanNet weights as a TF frozen graph fetched
from Google Drive (scripts/download_network.bash) — not vendored, and this
framework replaces it with a trainable Flax decoder. Training recipe
(CodeSLAM, arXiv:1804.00874, which DeepFactors builds on):

  encoder(image, gt_depth) -> q(c | I, D) = N(mu, sigma)     [training only]
  decoder(image, c)        -> prox pyramid, linear in c
  loss = sum_levels  Laplace-NLL(prox(c), prox_gt; b=exp(logb))
       + beta * KL(q || N(0, I))
       + ||code_head(I) - stop_grad(mu)||^2                  [distillation]

The distillation term trains the image-only code predictor used by
PredictAndDecode at runtime (decoder_network.cpp:139-229) where no depth is
available. Data-parallel across devices via jit + sharding annotations.
"""
from __future__ import annotations

from functools import partial
from typing import Iterator, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..geometry import warping as wp
from .decoder import ConvBlock, DepthDecoder, NetworkConfig, _conv

Array = jax.Array


class DepthEncoder(nn.Module):
    """q(c | image, depth): small conv net over the (img, prox) stack."""

    code_size: int = 32
    base_ch: int = 32

    @nn.compact
    def __call__(self, img: Array, prox: Array):
        x = jnp.stack([img, prox], axis=-1)[None].astype(jnp.bfloat16)
        ch = self.base_ch
        for _ in range(4):
            x = ConvBlock(ch)(x)
            x = _conv(min(ch * 2, 4 * self.base_ch), k=3, s=2)(x)
            x = nn.gelu(x)
            ch = min(ch * 2, 4 * self.base_ch)
        gap = jnp.mean(x, axis=(1, 2))[0].astype(jnp.float32)
        mu = nn.Dense(self.code_size, param_dtype=jnp.float32)(gap)
        logvar = nn.Dense(self.code_size, param_dtype=jnp.float32)(gap)
        return mu, jnp.clip(logvar, -8.0, 4.0)


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: Array


class VAEModel(nn.Module):
    code_size: int = 32
    levels: int = 4
    base_ch: int = 32
    pred_head: str = "gap"

    def setup(self):
        self.decoder = DepthDecoder(code_size=self.code_size,
                                    levels=self.levels,
                                    base_ch=self.base_ch,
                                    pred_head=self.pred_head)
        self.encoder = DepthEncoder(code_size=self.code_size)

    def __call__(self, img, gt_prox, rng, beta, distill_w=0.1):
        out = self.decoder(img)
        mu, logvar = self.encoder(img, gt_prox)
        eps = jax.random.normal(rng, mu.shape)
        code = mu + jnp.exp(0.5 * logvar) * eps

        nll = 0.0
        for l in range(self.levels):
            gt_l = jax.image.resize(
                gt_prox, out["prx0"][l].shape, method="linear"
            )
            prx = out["prx0"][l] + jnp.einsum("hwc,c->hw", out["jac"][l], code)
            b = jnp.exp(jnp.clip(out["stdev"][l], -6.0, 2.0))
            # Laplace negative log-likelihood with learned scale b
            nll = nll + jnp.mean(jnp.abs(prx - gt_l) / b + jnp.log(2.0 * b))

        kl = 0.5 * jnp.sum(jnp.exp(logvar) + mu**2 - 1.0 - logvar)
        distill = jnp.sum(
            (out["code_pred"] - jax.lax.stop_gradient(mu)) ** 2
        )
        loss = nll + beta * kl + distill_w * distill
        return loss, {"nll": nll, "kl": kl, "distill": distill}


def make_train_step(model: VAEModel, tx: optax.GradientTransformation,
                    beta: float = 1e-4, distill_w: float = 0.1):
    """One jitted data-parallel training step over a batch [B, H, W] images +
    gt prox maps; the batch axis shards over devices ('dp')."""

    def loss_fn(params, imgs, gts, rng):
        keys = jax.random.split(rng, imgs.shape[0])

        def one(img, gt, k):
            return model.apply(params, img, gt, k, beta, distill_w)

        losses, auxs = jax.vmap(one)(imgs, gts, keys)
        return jnp.mean(losses), jax.tree.map(jnp.mean, auxs)

    @jax.jit
    def step(state: TrainState, imgs, gts, rng):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, imgs, gts, rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss, aux

    return step


def train(
    cfg: NetworkConfig,
    data_iter: Iterator,      # yields (imgs [B,H,W], depths [B,H,W]) np arrays
    num_steps: int = 1000,
    lr: float = 1e-3,
    beta: float = 1e-4,
    seed: int = 0,
    mesh=None,
    log_every: int = 100,
):
    """Train; returns decoder-only params usable by models.decoder.Decoder."""
    model = VAEModel(code_size=cfg.code_size, levels=cfg.pyramid_levels)
    rng = jax.random.PRNGKey(seed)
    dummy_img = jnp.zeros((cfg.input_height, cfg.input_width), jnp.float32)
    dummy_prox = jnp.full_like(dummy_img, 0.5)
    params = model.init(rng, dummy_img, dummy_prox, rng, beta)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))
    state = TrainState(params, tx.init(params), jnp.asarray(0))
    step_fn = make_train_step(model, tx, beta)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        data_sharding = NamedSharding(mesh, P("dp"))
    else:
        data_sharding = None

    history = []
    for i in range(num_steps):
        imgs, depths = next(data_iter)
        gts = np.asarray(
            wp.depth_to_prox(jnp.asarray(depths), cfg.avg_dpt)
        )
        imgs = jnp.asarray(imgs)
        gts = jnp.asarray(gts)
        if data_sharding is not None:
            imgs = jax.device_put(imgs, data_sharding)
            gts = jax.device_put(gts, data_sharding)
        rng, k = jax.random.split(rng)
        state, loss, aux = step_fn(state, imgs, gts, k)
        if i % log_every == 0:
            lf = float(loss)
            history.append(lf)
            print(f"step {i}: loss={lf:.4f} "
                  f"nll={float(aux['nll']):.4f} kl={float(aux['kl']):.2f}",
                  flush=True)
    return extract_decoder_params(state.params), history


def extract_decoder_params(params) -> dict:
    """Pull the decoder submodule params into the layout Decoder expects."""
    inner = params["params"]
    dec = {k.split("decoder/", 1)[1] if k.startswith("decoder/") else k: v
           for k, v in inner.items() if not k.startswith("encoder")}
    # flax nests by module name: params['params']['decoder'] when using setup
    if "decoder" in inner:
        return {"params": inner["decoder"]}
    return {"params": dec}


def synthetic_depth_dataset(cfg: NetworkConfig, batch: int = 4, seed: int = 0):
    """Procedural (image, depth) pairs: textured slanted planes + blobs —
    lets tests and smoke-training run with zero external data."""
    rng = np.random.RandomState(seed)
    H, W = cfg.input_height, cfg.input_width
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    while True:
        imgs, dpts = [], []
        for _ in range(batch):
            a, b = rng.uniform(-0.3, 0.3, 2)
            d0 = rng.uniform(1.0, 3.5)
            depth = d0 + a * (xs / W - 0.5) + b * (ys / H - 0.5)
            for _ in range(rng.randint(1, 4)):
                cy, cx = rng.randint(0, H), rng.randint(0, W)
                r = rng.uniform(8, 24)
                blob = np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / r**2)
                depth = depth - rng.uniform(0.1, 0.6) * blob
            depth = np.clip(depth, 0.3, 8.0)
            # image correlated with depth discontinuities + texture
            img = (0.4 + 0.2 * np.sin(xs / rng.uniform(4, 12))
                   * np.cos(ys / rng.uniform(4, 12))
                   + 0.3 * (depth - depth.min()) / (np.ptp(depth) + 1e-6))
            imgs.append(img.astype(np.float32))
            dpts.append(depth.astype(np.float32))
        yield np.stack(imgs), np.stack(dpts)
