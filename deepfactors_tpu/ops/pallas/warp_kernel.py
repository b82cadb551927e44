"""Pallas TPU kernel: fused multi-channel bilinear warp sampling.

This is the hot memory pattern of every dense aligner (SfmAligner /
SE3Aligner, sources/cuda/cu_sfmaligner.cpp:40-97): sample img1 (+ its
gradients) at warped, data-dependent coordinates. XLA lowers that gather at
~1 ms/image on TPU (measured; it dominates the dense pipeline). This kernel
exploits warp coherence instead:

  - Mosaic's ``tpu.dynamic_gather`` is a register shuffle WITHIN one hardware
    tile (axis=1 needs <=128 lanes, axis=0 <=8 sublanes — probed empirically),
    so arbitrary 2D gathers must be decomposed.
  - Dense SLAM warps are locally coherent: within an 8-row tile the source
    rows span a small band. Per output tile we take the band base
    b0 = min(floor(y1)) and unroll BAND source rows; each row contributes via
    a within-row gather per 128-column block, masked by row/block membership,
    accumulating the bilinear combination on the VPU.
  - Pixels whose source rows fall outside the band (violent local warp
    distortion, > BAND-2 rows across one tile) are reported in a coverage
    mask the caller folds into factor validity; at SLAM motion magnitudes the
    band covers everything (coarse pyramid levels absorb large motion).

Layout: channels as separate [H, W] planes; coordinates precomputed by XLA
(smooth VPU math that fuses fine there); outputs sampled planes + coverage.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

TILE_H = 8
TILE_W = 128


def _warp_kernel(nchan: int, band: int, H: int, W: int, tw: int, *refs):
    """refs: x_ref, y_ref, chan_refs[nchan], out_refs[nchan], cover_ref,
    acc_refs[nchan] (scratch)."""
    x_ref, y_ref = refs[0], refs[1]
    chan_refs = refs[2:2 + nchan]
    out_refs = refs[2 + nchan:2 + 2 * nchan]
    cover_ref = refs[2 + 2 * nchan]
    acc_refs = refs[2 + 2 * nchan + 1:]

    x = x_ref[:]
    y = y_ref[:]
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    # clamped-bilinear semantics matching ops.image.bilinear_sample: the
    # +1 neighbor collapses onto the edge pixel, i.e. its weight drops to 0
    wx = jnp.where(x0f >= W - 1, 0.0, x - x0f)
    wy = jnp.where(y0f >= H - 1, 0.0, y - y0f)
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, W - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, H - 1)

    # band base aligned down to a sublane-tile boundary so the dynamic
    # band loads are tile-aligned (Mosaic requires aligned vector.load)
    b0 = jnp.clip((jnp.min(y0) // TILE_H) * TILE_H, 0, H - band)
    b0 = pl.multiple_of(b0, TILE_H)
    rel = y0 - b0  # [8, 128]
    cover = (rel >= 0) & (rel <= band - 2)
    cover_ref[:] = cover.astype(jnp.float32)

    n_xb = W // tw
    rmin = jnp.min(rel)
    rmax = jnp.max(rel)
    xl = [x0 - xb * tw for xb in range(n_xb)]
    inb = [(v >= 0) & (v < tw) for v in xl]
    xlc = [jnp.clip(v, 0, tw - 1) for v in xl]

    for c in range(nchan):
        acc_refs[c][:] = jnp.zeros((TILE_H, tw), jnp.float32)

    # Load the band in 8-row chunks: a dynamic slice of a full (8, W) tile
    # has a clean Mosaic layout (single dynamic rows don't), and static row
    # slices of the loaded vector lower fine. Chunks and rows outside the
    # tile's actual [rmin, rmax+1] source-row range are predicated away —
    # coherent warps touch ~3 rows, so most of the unrolled band is skipped
    # at run time.
    n_chunks = band // TILE_H
    for k in range(n_chunks):
        lo, hi = k * TILE_H, k * TILE_H + TILE_H - 1

        @pl.when((lo <= rmax + 1) & (hi >= rmin))
        def _(k=k):
            for c in range(nchan):
                chunk = chan_refs[c][pl.ds(b0 + k * TILE_H, TILE_H), :]
                chunk_r = pltpu.roll(chunk, W - 1, 1)  # x+1 neighbor cols
                for r in range(TILE_H):
                    d = k * TILE_H + r

                    @pl.when((d >= rmin) & (d <= rmax + 1))
                    def _(r=r, d=d, chunk=chunk, chunk_r=chunk_r, c=c):
                        # row d: top row for rel==d, bottom row for rel==d-1
                        w_row = jnp.where(rel == d, 1.0 - wy, 0.0)
                        if d > 0:
                            w_row = w_row + jnp.where(rel == d - 1, wy, 0.0)
                        acc = acc_refs[c][:]
                        for xb in range(n_xb):
                            segA = jnp.broadcast_to(
                                chunk[r:r + 1,
                                      xb * tw:(xb + 1) * tw],
                                (TILE_H, tw),
                            )
                            segB = jnp.broadcast_to(
                                chunk_r[r:r + 1,
                                        xb * tw:(xb + 1) * tw],
                                (TILE_H, tw),
                            )
                            gA = jnp.take_along_axis(segA, xlc[xb], axis=1)
                            gB = jnp.take_along_axis(segB, xlc[xb], axis=1)
                            val = (1.0 - wx) * gA + wx * gB
                            acc = acc + jnp.where(inb[xb], w_row * val, 0.0)
                        acc_refs[c][:] = acc

    for c in range(nchan):
        out_refs[c][:] = acc_refs[c][:]


@functools.partial(jax.jit, static_argnames=("band", "interpret"))
def bilinear_warp_planes(
    chans: Array,   # [C, H, W] channel planes (e.g. img, gx, gy)
    x1: Array,      # [H, W] source x coordinate per output pixel
    y1: Array,      # [H, W] source y coordinate
    band: int = 24,
    interpret: bool = False,
) -> tuple:
    """Returns (sampled [C, H, W], coverage [H, W]). Coordinates are clamped
    like ops.image.bilinear_sample; callers mask validity separately and
    should AND in the coverage mask."""
    C, H, W = chans.shape
    tw = min(TILE_W, W)
    assert H % TILE_H == 0 and W % tw == 0, (H, W)

    grid = (H // TILE_H, W // tw)
    tile_spec = pl.BlockSpec((TILE_H, tw), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
    full_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    kernel = functools.partial(_warp_kernel, C, band, H, W, tw)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tile_spec, tile_spec] + [full_spec] * C,
        out_specs=tuple([tile_spec] * C + [tile_spec]),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((H, W), jnp.float32)] * C
            + [jax.ShapeDtypeStruct((H, W), jnp.float32)]
        ),
        scratch_shapes=[pltpu.VMEM((TILE_H, tw), jnp.float32)] * C,
        interpret=interpret,
    )(x1, y1, *[chans[c] for c in range(C)])
    sampled = jnp.stack(outs[:C])
    coverage = outs[C]
    return sampled, coverage


# ---------------------------------------------------------------------------
# Batched fused dense-warp kernel: correspondence + sampling in one pass
# ---------------------------------------------------------------------------

def _dense_warp_kernel(band: int, H: int, W: int, tw: int, *refs):
    """Grid (P, H/8, W/128). refs: params (SMEM [1, 24]), dpt tile, 3 chan
    planes [1, H, W], outputs: i1, gx, gy, tptx, tpty, tptz, valid tiles,
    scratch: 3 accumulators.

    Computes FindCorrespondence (warping.h:204-241) per pixel in-register
    from the pose/camera scalars, then band-samples img1/grad1 at the warped
    coords (see _warp_kernel) — one fused pass, nothing but tiles touching
    HBM.
    """
    p = refs[0]
    dpt_ref = refs[1]
    chan_refs = refs[2:5]
    out_refs = refs[5:11]
    valid_ref = refs[11]
    acc_refs = refs[12:15]

    pp = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    xs = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, tw), 1).astype(
        jnp.float32) + (j * tw).astype(jnp.float32)
    ys = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, tw), 0).astype(
        jnp.float32) + (i * TILE_H).astype(jnp.float32)

    R00, R01, R02 = p[pp, 0], p[pp, 1], p[pp, 2]
    R10, R11, R12 = p[pp, 3], p[pp, 4], p[pp, 5]
    R20, R21, R22 = p[pp, 6], p[pp, 7], p[pp, 8]
    tx, ty, tz = p[pp, 9], p[pp, 10], p[pp, 11]
    fx, fy, u0, v0 = p[pp, 12], p[pp, 13], p[pp, 14], p[pp, 15]
    border, min_dpt = p[pp, 16], p[pp, 17]

    dpt = dpt_ref[0]
    u = (xs - u0) / fx
    v = (ys - v0) / fy
    ptx = u * dpt
    pty = v * dpt
    tptx = R00 * ptx + R01 * pty + R02 * dpt + tx
    tpty = R10 * ptx + R11 * pty + R12 * dpt + ty
    tptz = R20 * ptx + R21 * pty + R22 * dpt + tz
    x1 = fx * tptx / tptz + u0
    y1 = fy * tpty / tptz + v0
    valid = (
        (tptz > min_dpt)
        & (x1 >= border) & (x1 < W - border)
        & (y1 >= border) & (y1 < H - border)
    )

    # bilinear band sampling (see _warp_kernel for the layout story)
    x0f = jnp.floor(x1)
    y0f = jnp.floor(y1)
    wx = jnp.where(x0f >= W - 1, 0.0, x1 - x0f)
    wy = jnp.where(y0f >= H - 1, 0.0, y1 - y0f)
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, W - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, H - 1)
    b0 = jnp.clip((jnp.min(y0) // TILE_H) * TILE_H, 0, H - band)
    b0 = pl.multiple_of(b0, TILE_H)
    rel = y0 - b0
    cover = (rel >= 0) & (rel <= band - 2)
    rmin = jnp.min(rel)
    rmax = jnp.max(rel)

    n_xb = W // tw
    xl = [x0 - xb * tw for xb in range(n_xb)]
    inb = [(q >= 0) & (q < tw) for q in xl]
    xlc = [jnp.clip(q, 0, tw - 1) for q in xl]

    for c in range(3):
        acc_refs[c][:] = jnp.zeros((TILE_H, tw), jnp.float32)

    n_chunks = band // TILE_H
    for k in range(n_chunks):
        lo, hi = k * TILE_H, k * TILE_H + TILE_H - 1

        @pl.when((lo <= rmax + 1) & (hi >= rmin))
        def _(k=k):
            for c in range(3):
                chunk = chan_refs[c][0, pl.ds(b0 + k * TILE_H, TILE_H), :]
                chunk_r = pltpu.roll(chunk, W - 1, 1)
                for r in range(TILE_H):
                    d = k * TILE_H + r

                    @pl.when((d >= rmin) & (d <= rmax + 1))
                    def _(r=r, d=d, chunk=chunk, chunk_r=chunk_r, c=c):
                        w_row = jnp.where(rel == d, 1.0 - wy, 0.0)
                        if d > 0:
                            w_row = w_row + jnp.where(rel == d - 1, wy, 0.0)
                        acc = acc_refs[c][:]
                        for xb in range(n_xb):
                            segA = jnp.broadcast_to(
                                chunk[r:r + 1,
                                      xb * tw:(xb + 1) * tw],
                                (TILE_H, tw),
                            )
                            segB = jnp.broadcast_to(
                                chunk_r[r:r + 1,
                                        xb * tw:(xb + 1) * tw],
                                (TILE_H, tw),
                            )
                            gA = jnp.take_along_axis(segA, xlc[xb], axis=1)
                            gB = jnp.take_along_axis(segB, xlc[xb], axis=1)
                            val = (1.0 - wx) * gA + wx * gB
                            acc = acc + jnp.where(inb[xb], w_row * val, 0.0)
                        acc_refs[c][:] = acc

    for c in range(3):
        out_refs[c][0] = acc_refs[c][:]
    out_refs[3][0] = tptx
    out_refs[4][0] = tpty
    out_refs[5][0] = tptz
    valid_ref[0] = (valid & cover).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("band", "interpret"))
def dense_warp_batch(
    params: Array,   # [P, 24] per-factor scalars: R(9) t(3) fx fy u0 v0
                     # border min_dpt (rest pad)
    dpt0: Array,     # [P, H, W] source depth
    img1: Array,     # [P, H, W]
    gx1: Array,      # [P, H, W]
    gy1: Array,      # [P, H, W]
    band: int = 24,
    interpret: bool = False,
):
    """Fused correspondence + bilinear warp for P factors in one kernel.

    Returns (i1, gx, gy, tptx, tpty, tptz, valid), each [P, H, W]. ``valid``
    already folds bounds/min-depth checks and band coverage.
    """
    P, H, W = dpt0.shape
    tw = min(TILE_W, W)
    grid = (P, H // TILE_H, W // tw)

    tile = pl.BlockSpec((1, TILE_H, tw), lambda p, i, j: (p, i, j),
                        memory_space=pltpu.VMEM)
    plane = pl.BlockSpec((1, H, W), lambda p, i, j: (p, 0, 0),
                         memory_space=pltpu.VMEM)
    sparam = pl.BlockSpec(memory_space=pltpu.SMEM)  # full [P, 24] in SMEM

    kernel = functools.partial(_dense_warp_kernel, band, H, W, tw)
    shp = jax.ShapeDtypeStruct((P, H, W), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[sparam, tile, plane, plane, plane],
        out_specs=tuple([tile] * 7),
        out_shape=tuple([shp] * 7),
        scratch_shapes=[pltpu.VMEM((TILE_H, tw), jnp.float32)] * 3,
        interpret=interpret,
    )(params, dpt0, img1, gx1, gy1)
    return outs


def make_warp_params(pose_10, cam, border, min_dpt):
    """Pack per-factor warp scalars for dense_warp_batch: [P, 24]."""
    from ...geometry import se3 as se3m

    R = se3m.quat_to_matrix(pose_10.q)  # [P, 3, 3]
    Pn = R.shape[0]
    flat = [R.reshape(Pn, 9), pose_10.t]
    const = jnp.broadcast_to(
        jnp.stack([cam.fx, cam.fy, cam.u0, cam.v0,
                   jnp.asarray(border, jnp.float32),
                   jnp.asarray(min_dpt, jnp.float32)]),
        (Pn, 6),
    )
    pad = jnp.zeros((Pn, 24 - 9 - 3 - 6), jnp.float32)
    return jnp.concatenate(flat + [const, pad], axis=-1)


def bilinear_warp_reference(chans: Array, x1: Array, y1: Array):
    """Plain-XLA reference for validation (same clamping semantics)."""
    from ..image import bilinear_sample

    pix = jnp.stack([x1, y1], axis=-1)
    out = jax.vmap(lambda im: bilinear_sample(im, pix))(chans)
    return out, jnp.ones_like(x1)
