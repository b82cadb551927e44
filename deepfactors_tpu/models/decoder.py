"""Latent-code depth decoder network (CodeSLAM-style), TPU-native.

Replaces the reference's TensorFlow-C-API frozen-graph decoder
(sources/core/network/decoder_network.{h,cpp}) with a Flax U-Net that is
**linear in the code by construction**: each pyramid level emits

    prx_l(I, c) = prx0_l(I) + B_l(I) @ c

where ``prx0_l`` (zero-code proximity, sigmoid-bounded), the code basis
``B_l`` ([H, W, CS], the exact per-pixel Jacobian d prx/d code) and the
log-uncertainty ``logb_l`` are network outputs — mirroring how the reference
fetches the Jacobian as network output tensors per level
(decoder_network.cpp:91-96, 127-136) and how decoder linearity is validated by
tests/ut_decoder.cpp:161-200.

A small convolutional head predicts a code from the image (the reference's
PredictAndDecode path, decoder_network.cpp:139-229). Compute runs in bfloat16
on the MXU with float32 outputs.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class NetworkConfig(NamedTuple):
    """Mirror of the reference JSON network config
    (decoder_network.cpp:231-325)."""

    code_size: int = 32
    pyramid_levels: int = 4
    input_width: int = 256
    input_height: int = 192
    avg_dpt: float = 2.0
    # trained camera intrinsics at input resolution
    fx: float = 0.0
    fy: float = 0.0
    u0: float = 0.0
    v0: float = 0.0
    grayscale: bool = True
    # architecture knobs (default = the round-2 room256_32 checkpoint
    # layout; v2 checkpoints record theirs in the json)
    base_ch: int = 32
    pred_head: str = "gap"   # "gap" | "conv" (spatial code predictor)


class DecodeResult(NamedTuple):
    """One entry per pyramid level, finest first (shapes [H_l, W_l, ...])."""

    prx: tuple        # proximity at the given code
    prx0: tuple       # zero-code proximity
    jac: tuple        # [H_l, W_l, CS] code Jacobian (basis)
    stdev: tuple      # log-b uncertainty
    code: Array       # the code used / predicted [CS]


class Conv(nn.Conv):
    """nn.Conv with the convolution expressed as shifted-patch extraction +
    one einsum (im2col -> MXU matmul) instead of lax.conv_general_dilated.

    Same parameter tree as nn.Conv (kernel [kh, kw, Cin, Cout], bias
    [Cout]) and same class name, so existing checkpoints load unchanged.
    Two reasons: (a) XLA lowers these small convs to the same patch-matmul
    form on TPU, so performance is equal; (b) the conv primitive's FIRST
    lowering through the axon tunnel costs minutes of one-time latency per
    process (measured; environment pathology) — the einsum form lowers
    instantly. Supports the subset this model uses: 2D, SAME padding,
    uniform strides, no dilation/groups/mask."""

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        sh, sw = (self.strides if isinstance(self.strides, (tuple, list))
                  else (self.strides, self.strides))
        N, H, W, C = x.shape
        kernel = self.param(
            "kernel", self.kernel_init, (kh, kw, C, self.features),
            self.param_dtype)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           self.param_dtype) if self.use_bias else None)
        Ho = -(-H // sh)
        Wo = -(-W // sw)
        pad_h = max((Ho - 1) * sh + kh - H, 0)
        pad_w = max((Wo - 1) * sw + kw - W, 0)
        xp = jnp.pad(x, ((0, 0), (pad_h // 2, pad_h - pad_h // 2),
                         (pad_w // 2, pad_w - pad_w // 2), (0, 0)))
        xp = xp.astype(self.dtype)
        patches = []
        for i in range(kh):
            for j in range(kw):
                patches.append(jax.lax.slice(
                    xp, (0, i, j, 0),
                    (N, i + (Ho - 1) * sh + 1, j + (Wo - 1) * sw + 1, C),
                    (1, sh, sw, 1)))
        p = jnp.concatenate(patches, axis=-1)          # [N, Ho, Wo, kh*kw*C]
        k2 = kernel.reshape(kh * kw * C, self.features).astype(self.dtype)
        y = jnp.einsum("nhwp,pf->nhwf", p, k2,
                       preferred_element_type=self.dtype)
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


def _conv(ch, k=3, s=1):
    return Conv(ch, (k, k), strides=(s, s), padding="SAME", dtype=jnp.bfloat16,
                param_dtype=jnp.float32)


class ConvBlock(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        x = _conv(self.ch)(x)
        x = nn.gelu(x)
        x = _conv(self.ch)(x)
        x = nn.gelu(x)
        return x


class DepthDecoder(nn.Module):
    """U-Net producing (prx0, code-basis, logb) pyramids + a predicted code.

    Levels are powers-of-two scales of the input; level 0 is full resolution.
    """

    code_size: int = 32
    levels: int = 4
    base_ch: int = 32
    pred_head: str = "gap"   # "gap" (round-2 ckpt) | "conv" (spatial)

    @nn.compact
    def __call__(self, img: Array):
        """img: [H, W] grayscale in [0, 1]. Returns dict of outputs."""
        CS = self.code_size
        x = img[None, :, :, None].astype(jnp.bfloat16)  # NHWC

        # encoder: levels + 1 scales
        skips = []
        ch = self.base_ch
        for lvl in range(self.levels):
            x = ConvBlock(ch)(x)
            skips.append(x)
            x = _conv(ch * 2, k=3, s=2)(x)
            x = nn.gelu(x)
            ch = min(ch * 2, 8 * self.base_ch)
        x = ConvBlock(ch)(x)  # bottleneck

        # code prediction head from bottleneck (PredictAndDecode path)
        if self.pred_head == "conv":
            # spatial predictor: strided convs down to a coarse grid, then
            # a dense readout — a global average pool throws away the
            # spatial layout the code must encode (near/far structure),
            # which capped predicted-code depth quality in round 2
            h = _conv(ch, k=3, s=2)(x)
            h = nn.gelu(h)
            h = _conv(64, k=3, s=2)(h)
            h = nn.gelu(h)
            h = h.reshape(1, -1)
            code_pred = nn.Dense(
                CS, dtype=jnp.bfloat16, param_dtype=jnp.float32,
                name="code_head_conv")(h)[0].astype(jnp.float32)
        else:
            gap = jnp.mean(x, axis=(1, 2))  # [1, ch]
            code_pred = nn.Dense(
                CS, dtype=jnp.bfloat16, param_dtype=jnp.float32,
                name="code_head")(gap)[0].astype(jnp.float32)

        # decoder with skip connections; emit heads at each pyramid level
        prx0s, jacs, stds = [], [], []
        for lvl in reversed(range(self.levels)):
            skip = skips[lvl]
            B, H, W, _ = skip.shape
            x = jax.image.resize(x, (B, H, W, x.shape[-1]), method="nearest")
            x = jnp.concatenate([x, skip], axis=-1)
            x = ConvBlock(skip.shape[-1])(x)

            head = _conv(CS + 2, k=3)(x).astype(jnp.float32)  # [1,H,W,CS+2]
            prx0 = jax.nn.sigmoid(head[0, :, :, 0])
            logb = head[0, :, :, 1]
            # basis scaled down so unit codes perturb prox gently
            jac = 0.01 * head[0, :, :, 2:]
            prx0s.append(prx0)
            stds.append(logb)
            jacs.append(jac)

        # finest-first ordering
        prx0s, stds, jacs = prx0s[::-1], stds[::-1], jacs[::-1]
        return {
            "prx0": tuple(prx0s),
            "jac": tuple(jacs),
            "stdev": tuple(stds),
            "code_pred": code_pred,
        }


class Decoder:
    """Stateful convenience wrapper: the DecoderNetwork facade
    (decoder_network.h:33-93 equivalent).

    Holds params + config; ``decode``/``predict_and_decode`` are jitted.
    """

    def __init__(self, cfg: NetworkConfig, params=None, rng=None):
        self.cfg = cfg
        self.module = DepthDecoder(code_size=cfg.code_size,
                                   levels=cfg.pyramid_levels,
                                   base_ch=getattr(cfg, "base_ch", 32),
                                   pred_head=getattr(cfg, "pred_head",
                                                     "gap"))
        if params is None:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            dummy = jnp.zeros((cfg.input_height, cfg.input_width), jnp.float32)
            params = self.module.init(rng, dummy)
        # params MUST live on device: pickle-loaded numpy params are
        # re-uploaded on EVERY jitted call that takes them, and after the
        # first real SLAM program executes, the axon tunnel's host->device
        # transfer path degrades to ~55 MB/s — a ~30 MB parameter tree then
        # costs ~550 ms PER KEYFRAME BUILD (measured round 5; this was the
        # entire r4 keyframe-event budget).
        self.params = jax.device_put(params)
        self._apply = jax.jit(self.module.apply)

    def raw_outputs(self, img: Array):
        return self._apply(self.params, img)

    def decode(self, img: Array, code: Array) -> DecodeResult:
        """Decode with a given code (DecoderNetwork::Decode,
        decoder_network.cpp:59-137)."""
        out = self.raw_outputs(img)
        prx = tuple(
            p + jnp.einsum("hwc,c->hw", j, code)
            for p, j in zip(out["prx0"], out["jac"])
        )
        return DecodeResult(prx, out["prx0"], out["jac"], out["stdev"], code)

    def predict_and_decode(self, img: Array) -> DecodeResult:
        """Predict the code then decode (decoder_network.cpp:139-229)."""
        out = self.raw_outputs(img)
        code = out["code_pred"]
        prx = tuple(
            p + jnp.einsum("hwc,c->hw", j, code)
            for p, j in zip(out["prx0"], out["jac"])
        )
        return DecodeResult(prx, out["prx0"], out["jac"], out["stdev"], code)

    def code_jacobian_jacfwd(self, img: Array, level: int = 0) -> Array:
        """The code Jacobian via jax.jacfwd — must equal the emitted basis
        exactly (linearity by construction); used as a consistency check and
        as the generic path for non-linear decoder variants."""
        out = self.raw_outputs(img)

        def prx_of_code(c):
            return out["prx0"][level] + jnp.einsum("hwc,c->hw", out["jac"][level], c)

        zero = jnp.zeros((self.cfg.code_size,), jnp.float32)
        return jax.jacfwd(prx_of_code)(zero)  # [H, W, CS]


def save_params(path: str, params) -> None:
    import pickle

    with open(path, "wb") as f:
        pickle.dump(jax.device_get(params), f)


def load_params(path: str):
    import pickle

    with open(path, "rb") as f:
        return pickle.load(f)
