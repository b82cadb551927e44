"""Fused Pallas TPU kernel: the full photometric-SfM linearization.

One kernel pass per factor computes everything the reference's SfmAligner
step kernel does (sources/cuda/cu_sfmaligner.cpp:40-70, per-pixel math
sources/common/algorithm/dense_sfm.h:124-201), PLUS the gather of per-factor
keyframe data that the XLA path had to materialize:

  - correspondence (FindCorrespondence, warping.h:204-241) in-register from
    per-factor pose/camera scalars,
  - band-gathered bilinear sampling of img1 / grad1 at the warped coords
    (see ops/pallas/warp_kernel.py for the band strategy),
  - the gradient-contracted warp Jacobian rows A [6] and the prox-chain
    scalar err_J_prx per pixel,
  - the Huber-weighted row matrix B = [A(6) | jac-code rows(CS) | r | valid]
    and its Gram matrix G = B·Bᵀ accumulated on the MXU per 8x128 tile.

Keyframe data is gathered at BLOCK granularity via scalar-prefetch index
maps (src[p] / dst[p] select pool rows), so nothing per-factor is ever
materialized in HBM: per factor the kernel reads its keyframe's jacobian
pyramid level once (the unavoidable traffic) plus three target planes.

The returned G [P, R, R] (R = 6+CS+2) contains the factor's GN system in
"B-space"; `system_from_gram` applies the relative-pose chain rule
(J_pose = -j_poseᵀ·A, se3.relative_pose_jacobians) to produce the reference
44-dim [pose0|pose1|code] JtJ/Jtr blocks (photometric_factor.cpp:135-161).

Weight convention matches ops.dense_sfm._masked_system_T: rows and residual
are both scaled by w·valid, so JtJ/Jtr/residual carry w².
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...geometry import se3 as se3m

Array = jax.Array

TILE_H = 8
TILE_W = 128

# params vector layout (per factor)
PARAM_DIM = 24
_R0, _T0, _FX, _FY, _U0, _V0 = 0, 9, 12, 13, 14, 15
_BORDER, _MINDPT, _HUBER, _AVGDPT = 16, 17, 18, 19


def make_sfm_params(pose_10, cam, border, min_dpt, huber_delta, avg_dpt):
    """Pack per-factor scalars: R(9) t(3) fx fy u0 v0 border min_dpt
    huber avg_dpt (pad to PARAM_DIM)."""
    R = se3m.quat_to_matrix(pose_10.q)  # [P, 3, 3]
    Pn = R.shape[0]
    const = jnp.broadcast_to(
        jnp.stack([
            cam.fx, cam.fy, cam.u0, cam.v0,
            jnp.asarray(border, jnp.float32),
            jnp.asarray(min_dpt, jnp.float32),
            jnp.asarray(huber_delta, jnp.float32),
            jnp.asarray(avg_dpt, jnp.float32),
        ]),
        (Pn, 8),
    )
    pad = jnp.zeros((Pn, PARAM_DIM - 9 - 3 - 8), jnp.float32)
    return jnp.concatenate([R.reshape(Pn, 9), pose_10.t, const, pad], axis=-1)


def _load_scalars(p_ref, pp):
    """Unpack one factor's make_sfm_params row from SMEM."""
    return tuple(p_ref[pp, k] for k in range(12)) + (
        p_ref[pp, _FX], p_ref[pp, _FY], p_ref[pp, _U0], p_ref[pp, _V0],
        p_ref[pp, _BORDER], p_ref[pp, _MINDPT],
        p_ref[pp, _HUBER], p_ref[pp, _AVGDPT],
    )


def _correspondence(sc, xs, ys, dpt, H, W):
    """FindCorrespondence (warping.h:204-241) per tile.

    Returns (x1, y1, valid, iz, u, v, tptx, tpty, tptz) with projective
    terms sanitized on invalid pixels so 0-weighted rows stay finite
    (0*inf would be NaN). Invalid pixels fall back to their own
    coordinates — NOT 0 — so they don't drag the gather band away from
    the tile (the band base is min(y0) over the whole tile)."""
    (R00, R01, R02, R10, R11, R12, R20, R21, R22, tx, ty, tz,
     fx, fy, u0, v0, border, min_dpt, _, _) = sc
    u = (xs - u0) / fx
    v = (ys - v0) / fy
    ptx = u * dpt
    pty = v * dpt
    tptx = R00 * ptx + R01 * pty + R02 * dpt + tx
    tpty = R10 * ptx + R11 * pty + R12 * dpt + ty
    tptz = R20 * ptx + R21 * pty + R22 * dpt + tz
    zsafe = jnp.where(jnp.abs(tptz) > 1e-12, tptz, 1e-12)
    x1 = fx * tptx / zsafe + u0
    y1 = fy * tpty / zsafe + v0
    valid = (
        (tptz > min_dpt)
        & (x1 >= border) & (x1 < W - border)
        & (y1 >= border) & (y1 < H - border)
    )
    x1 = jnp.where(valid, x1, xs)
    y1 = jnp.where(valid, y1, ys)
    iz = jnp.where(valid, 1.0 / zsafe, 0.0)
    return x1, y1, valid, iz, u, v, tptx, tpty, tptz


def _band_sample3(chan_refs, acc_refs, x1, y1, H, W, tw, band, bh=TILE_H):
    """Band-gathered bilinear sampling of 3 co-located [1, H, W] planes at
    the warped coords (band strategy: ops/pallas/warp_kernel.py). Fills
    acc_refs[c] with the samples; returns the band-coverage mask. bh is the
    block height (rows per grid step; x1/y1/acc are [bh, tw])."""
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

    # Predicate at CHUNK granularity only: per-row @pl.when predication costs
    # ~100 ns of scalar-branch overhead each (27 branches ≈ 3 µs/tile,
    # measured 2.8x slower end-to-end than an unconditional sweep); rows
    # within an active chunk run unconditionally on the VPU. Loop order is
    # rows-outer/channels-inner so the row/block masks (w_row, wv) are
    # computed once and shared by all channels.
    nchan = len(chan_refs)
    for c in range(nchan):
        acc_refs[c][:] = jnp.zeros((bh, tw), jnp.float32)

    for k in range(band // TILE_H):
        lo, hi = k * TILE_H, k * TILE_H + TILE_H - 1

        @pl.when((lo <= rmax + 1) & (hi >= rmin))
        def _(k=k):
            chunks = [chan_refs[c][0, pl.ds(b0 + k * TILE_H, TILE_H), :]
                      for c in range(nchan)]
            rolled = [pltpu.roll(ch, W - 1, 1) for ch in chunks]
            accs = [acc_refs[c][:] for c in range(nchan)]
            for r in range(TILE_H):
                d = k * TILE_H + r
                w_row = jnp.where(rel == d, 1.0 - wy, 0.0)
                if d > 0:
                    w_row = w_row + jnp.where(rel == d - 1, wy, 0.0)
                for xb in range(n_xb):
                    wv = jnp.where(inb[xb], w_row, 0.0)
                    wvx = wv * wx
                    wva = wv - wvx
                    for c in range(nchan):
                        segA = jnp.broadcast_to(
                            chunks[c][r:r + 1, xb * tw:(xb + 1) * tw],
                            (bh, tw),
                        )
                        segB = jnp.broadcast_to(
                            rolled[c][r:r + 1, xb * tw:(xb + 1) * tw],
                            (bh, tw),
                        )
                        gA = jnp.take_along_axis(segA, xlc[xb], axis=1)
                        gB = jnp.take_along_axis(segB, xlc[xb], axis=1)
                        accs[c] = accs[c] + (wva * gA + wvx * gB)
            for c in range(nchan):
                acc_refs[c][:] = accs[c]
    return cover


def _band_sample_interp(chan_ref, acc_refs, x1, y1, H, W, tw, band,
                        bh=TILE_H):
    """Band-gathered bilinear sampling of ONE [1, H, W] plane at the warped
    coords, returning the sample AND the exact gradient of the bilinear
    interpolant (∂I/∂x1, ∂I/∂y1) from the same gathered corner values:

        I    = Σ_d w_row(d)·(gA_d + wx·(gB_d − gA_d))
        ∂I/∂x = Σ_d w_row(d)·(gB_d − gA_d)
        ∂I/∂y = Σ_d v_row(d)·(gA_d + wx·(gB_d − gA_d))

    with w_row(d) = [rel==d]·(1−wy) + [rel==d−1]·wy and
    v_row(d) = [rel==d−1] − [rel==d]. One channel of gathers services all
    three outputs — 3x fewer lane-gathers/broadcasts than sampling
    precomputed Sobel planes (_band_sample3), and the resulting Jacobian is
    the TRUE derivative of the discrete residual (the Sobel-sampled J of the
    reference, dense_sfm.h:167/180, is an approximation of it).

    Fills acc_refs[0..2] with (I, dIdx, dIdy); returns the coverage mask."""
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
        acc_refs[c][:] = jnp.zeros((bh, tw), jnp.float32)

    for k in range(band // TILE_H):
        lo, hi = k * TILE_H, k * TILE_H + TILE_H - 1

        @pl.when((lo <= rmax + 1) & (hi >= rmin))
        def _(k=k):
            chunk = chan_ref[0, pl.ds(b0 + k * TILE_H, TILE_H), :]
            rolled = pltpu.roll(chunk, W - 1, 1)
            acc_i = acc_refs[0][:]
            acc_gx = acc_refs[1][:]
            acc_gy = acc_refs[2][:]
            for r in range(TILE_H):
                d = k * TILE_H + r
                sel0 = (rel == d)
                w_row = jnp.where(sel0, 1.0 - wy, 0.0)
                v_row = jnp.where(sel0, -1.0, 0.0)
                if d > 0:
                    sel1 = (rel == d - 1)
                    w_row = w_row + jnp.where(sel1, wy, 0.0)
                    v_row = v_row + jnp.where(sel1, 1.0, 0.0)
                for xb in range(n_xb):
                    wv = jnp.where(inb[xb], w_row, 0.0)
                    vv = jnp.where(inb[xb], v_row, 0.0)
                    segA = jnp.broadcast_to(
                        chunk[r:r + 1, xb * tw:(xb + 1) * tw], (bh, tw)
                    )
                    segB = jnp.broadcast_to(
                        rolled[r:r + 1, xb * tw:(xb + 1) * tw], (bh, tw)
                    )
                    gA = jnp.take_along_axis(segA, xlc[xb], axis=1)
                    gB = jnp.take_along_axis(segB, xlc[xb], axis=1)
                    t = gB - gA
                    xi = gA + wx * t
                    acc_i = acc_i + wv * xi
                    acc_gx = acc_gx + wv * t
                    acc_gy = acc_gy + vv * xi
            acc_refs[0][:] = acc_i
            acc_refs[1][:] = acc_gx
            acc_refs[2][:] = acc_gy
    return cover


_KGROUP = 2      # ks per predicated group (scalar branches cost ~100ns each;
                 # 2 measured faster than 4 at typical warp spreads)


def _band_sample_interp_fast(chan_ref, acc_refs, x1, y1, H, W, tw, band,
                             kmax, bh=TILE_H):
    """_band_sample_interp, restructured around the DIAGONAL form of the
    row gather.

    For destination row r the needed source row is y0 = e + r with
    e = y0 − r: e is the warp's y-offset plus a tile constant, so its
    in-tile spread is the warp's local y-variation — typically 0-3 rows,
    NOT the 16-24 band rows the chunk scan sweeps. Rolling the band by
    (b0 − emin) aligns source row (emin + k + r) with sublane r of the
    static slice RB[k:k+8], so each k ∈ [0, spread] costs ONE pair of
    lane-gathers per x-block instead of a scan over all band rows; k-groups
    of 4 are predicated on the measured spread. Cover excludes pixels whose
    offset exceeds the served range (same contract as the chunk scan's
    band-coverage mask)."""
    x0f = jnp.floor(x1)
    y0f = jnp.floor(y1)
    wx = jnp.where(x0f >= W - 1, 0.0, x1 - x0f)
    wy = jnp.where(y0f >= H - 1, 0.0, y1 - y0f)
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, W - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, H - 1)
    rr = jax.lax.broadcasted_iota(jnp.int32, (bh, tw), 0)
    e = y0 - rr
    emin = jnp.min(e)
    b0 = jnp.clip((emin // TILE_H) * TILE_H, 0, H - band)
    b0 = pl.multiple_of(b0, TILE_H)
    sh = emin - b0                   # may be negative at the top border
    d = e - emin                     # per-pixel row offset, ≥ 0
    # per-pixel window test: rows y0 = b0+sh+d+rr and y0+1 must sit inside
    # the loaded band [b0, b0+band-1] (worst-case r=7 for the whole tile
    # would wrongly drop bottom tiles where b0 clips at H-band)
    cover = ((sh + d + rr >= 0) & (sh + d + rr + 2 <= band)
             & (d <= kmax - 2))
    dcap = jnp.minimum(d, kmax - 2)
    dmax = jnp.max(jnp.where(cover, dcap, 0))

    n_xb = W // tw
    xl = [x0 - xb * tw for xb in range(n_xb)]
    inb = [(q >= 0) & (q < tw) for q in xl]
    xlc = [jnp.clip(q, 0, tw - 1) for q in xl]

    B = chan_ref[0, pl.ds(b0, band), :]
    # RB[p] = B[p + sh]. The roll amount b0 - emin is usually NEGATIVE;
    # Mosaic's dynamic sublane roll silently misbehaves on negatives (the
    # static path raises), so wrap it into [0, band) explicitly.
    RB = pltpu.roll(B, jax.lax.rem(b0 - emin + band, band), 0)
    RBx = pltpu.roll(RB, W - 1, 1)       # +1 lane neighbor

    for c in range(3):
        acc_refs[c][:] = jnp.zeros((bh, tw), jnp.float32)

    for g in range((kmax + _KGROUP - 1) // _KGROUP):

        @pl.when(g * _KGROUP <= dmax + 1)
        def _(g=g):
            acc_i = acc_refs[0][:]
            acc_gx = acc_refs[1][:]
            acc_gy = acc_refs[2][:]
            for kk in range(_KGROUP):
                k = g * _KGROUP + kk
                sel0 = (d == k)
                w_row = jnp.where(sel0, 1.0 - wy, 0.0)
                v_row = jnp.where(sel0, -1.0, 0.0)
                if k > 0:
                    sel1 = (d == k - 1)
                    w_row = w_row + jnp.where(sel1, wy, 0.0)
                    v_row = v_row + jnp.where(sel1, 1.0, 0.0)
                Sk = RB[k:k + bh]
                Skx = RBx[k:k + bh]
                for xb in range(n_xb):
                    wv = jnp.where(inb[xb], w_row, 0.0)
                    vv = jnp.where(inb[xb], v_row, 0.0)
                    gA = jnp.take_along_axis(
                        Sk[:, xb * tw:(xb + 1) * tw], xlc[xb], axis=1)
                    gB = jnp.take_along_axis(
                        Skx[:, xb * tw:(xb + 1) * tw], xlc[xb], axis=1)
                    t = gB - gA
                    xi = gA + wx * t
                    acc_i = acc_i + wv * xi
                    acc_gx = acc_gx + wv * t
                    acc_gy = acc_gy + vv * xi
            acc_refs[0][:] = acc_i
            acc_refs[1][:] = acc_gx
            acc_refs[2][:] = acc_gy
    return cover


def _sample_planes(grad_mode, img1_ref, gx1_ref, gy1_ref, acc_refs,
                   x1, y1, H, W, tw, band, bh=TILE_H):
    """Dispatch the band sampler: 'sampled' gathers precomputed Sobel planes
    (reference parity, dense_sfm.h:167/180), 'interp' derives the gradient
    from the bilinear corners (exact + 3x cheaper). `band` is the warp
    y-offset spread budget on top of the bh block rows. Returns
    (i1, gx, gy, cover)."""
    # bands must stay 8-aligned — Mosaic's dynamic_rotate / dynamic sublane
    # loads reject unaligned shapes
    if grad_mode == "interp":
        # widen the rolled band so the served offset range matches the scan
        # variant's coverage (the roll start loses up to 7 rows to alignment)
        band_i = min(H, ((band + bh + 8 + 7) // 8) * 8)
        kmax = min(24, band_i - bh - 2)
        cover = _band_sample_interp_fast(img1_ref, acc_refs, x1, y1, H, W,
                                         tw, band_i, kmax, bh=bh)
    elif grad_mode == "interp_scan":   # chunk-scan variant (debug/fallback)
        band_s = min(H, ((band + bh - TILE_H + 7) // 8) * 8)
        cover = _band_sample_interp(img1_ref, acc_refs, x1, y1, H, W, tw,
                                    band_s, bh=bh)
    else:
        band_s = min(H, ((band + bh - TILE_H + 7) // 8) * 8)
        cover = _band_sample3((img1_ref, gx1_ref, gy1_ref), acc_refs,
                              x1, y1, H, W, tw, band_s, bh=bh)
    return acc_refs[0][:], acc_refs[1][:], acc_refs[2][:], cover


def _pose_rows(sc, gx, gy, iz, tptx, tpty, tptz):
    """Gradient-contracted warp Jacobian rows A [6] w.r.t. pose_10
    (dense_sfm.h:124-201) + the projection-jacobian terms reused by the
    depth chain. A = grad · d pix1 / d pose10 with dXdT = [I | -hat(tpt-t)],
    projection rows from pinhole_camera_impl.h:91-97."""
    (_, _, _, _, _, _, _, _, _, tx, ty, tz,
     fx, fy, _, _, _, _, _, _) = sc
    d00 = fx * iz
    d02 = -fx * tptx * iz * iz
    d11 = fy * iz
    d12 = -fy * tpty * iz * iz
    gd0 = gx * d00
    gd1 = gy * d11
    gd2 = gx * d02 + gy * d12
    vx = tptx - tx
    vy = tpty - ty
    vz = tptz - tz
    A = (gd0, gd1, gd2,
         -gd1 * vz + gd2 * vy,
         gd0 * vz - gd2 * vx,
         -gd0 * vy + gd1 * vx)
    return A, (d00, d02, d11, d12)


def _huber_wv(r, valid, huber_delta, loss: str = "huber"):
    """Robust sqrt-IRLS weight, zeroed on invalid pixels. 'huber'
    (m_estimators.h:50-56) for the coarse descent; 'tukey' (redescending
    biweight, w = max(0, 1-(r/delta)²)) at the finest level so occlusion /
    image-formation outliers contribute exactly zero instead of Huber's
    linear tail (4x lower equilibrium bias, measured)."""
    if loss == "tukey":
        a = r / huber_delta
        w = jnp.maximum(0.0, 1.0 - a * a)
        return jnp.where(valid, w, 0.0)
    aa = jnp.abs(r)
    hub = jnp.sqrt(huber_delta * (2.0 * aa - huber_delta)) / jnp.maximum(
        aa, 1e-12)
    w = jnp.where(aa <= huber_delta, 1.0, hub)
    return jnp.where(valid, w, 0.0)


def _gram(B):
    """B·Bᵀ on the MXU. Mosaic quantizes f32 operands to bf16 (~0.35%
    relative on JtJ) but the result is the EXACT Gram matrix of the
    quantized rows — symmetric PSD by construction, which is what the
    downstream Cholesky needs; the congruence transform outside the
    kernel (system_from_gram) must then run at HIGHEST precision."""
    dims = (((1,), (1,)), ((), ()))
    return jax.lax.dot_general(B, B, dims,
                               preferred_element_type=jnp.float32)


def _accumulate_gram(g_ref, rows, tw, bh=TILE_H):
    R_ROWS = len(rows)
    Bs = jnp.stack(rows)  # [R, bh, tw]
    if tw == TILE_W:
        # full lane tile: merge (bh, 128) -> bh*128 lanes, one MXU dot
        g_ref[:] += _gram(Bs.reshape(R_ROWS, bh * tw))
    else:
        # partial lane tile (coarse pyramid levels): Mosaic cannot shape-cast
        # (bh, tw<128) into lanes — contract per sublane row instead
        acc = jnp.zeros((R_ROWS, R_ROWS), jnp.float32)
        for r in range(bh):
            acc += _gram(Bs[:, r, :])
        g_ref[:] += acc


def _sfm_system_kernel(CS: int, band: int, H: int, W: int, tw: int, bh: int,
                       grad_mode: str, from_prox: bool, loss: str, *args):
    """Grid (P, H/bh, W/tw). Accumulates G = B·Bᵀ into g_ref [R, R].
    Inactive pool slots (act_ref[p] == 0) produce a zero G and skip the
    whole VPU-bound body — pools are sized for worst case, so a mapping
    step typically runs with half the slots masked. grad_mode 'interp'
    derives gradients from the bilinear corners (no Sobel plane inputs).
    bh > 8 amortizes the ~0.4 µs/grid-step machinery cost (measured) over
    more rows.

    from_prox=True: dpt_ref holds the zero-code proximity prx0 and the depth
    at the CURRENT code is materialized in-kernel from the jac block that is
    already resident (dpt = avg/clip(prx0 + jacᵀ·c) − avg, the reference's
    UpdateDepth, cu_image_proc.cpp:248-278) — this removes the separate
    update_depth_all pass (one full jac-pyramid read per GN iteration) from
    the mapping hot loop."""
    if grad_mode == "interp":
        (src_ref, dst_ref, act_ref, p_ref, code_ref, img0_ref, dpt_ref,
         jac_ref, img1_ref, g_ref, acc_refs) = args
        gx1_ref = gy1_ref = None
    else:
        (src_ref, dst_ref, act_ref, p_ref, code_ref, img0_ref, dpt_ref,
         jac_ref, img1_ref, gx1_ref, gy1_ref, g_ref, acc_refs) = args
    pp = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when((i == 0) & (j == 0))
    def _():
        g_ref[:] = jnp.zeros_like(g_ref)

    @pl.when(act_ref[pp] != 0)
    def _():
        xs = jax.lax.broadcasted_iota(jnp.int32, (bh, tw), 1).astype(
            jnp.float32) + (j * tw).astype(jnp.float32)
        ys = jax.lax.broadcasted_iota(jnp.int32, (bh, tw), 0).astype(
            jnp.float32) + (i * bh).astype(jnp.float32)

        sc = _load_scalars(p_ref, pp)
        (R00, R01, R02, R10, R11, R12, R20, R21, R22, _, _, _,
         _, _, _, _, _, _, huber_delta, avg_dpt) = sc

        if from_prox:
            prx = dpt_ref[0]
            for c in range(CS):
                prx = prx + code_ref[pp, c] * jac_ref[0, c]
            prx = jnp.maximum(prx, 1e-4)  # map_state.update_depth_all clamp
            dpt = avg_dpt / prx - avg_dpt
        else:
            dpt = dpt_ref[0]
        x1, y1, valid, iz, u, v, tptx, tpty, tptz = _correspondence(
            sc, xs, ys, dpt, H, W)
        i1, gx, gy, cover = _sample_planes(
            grad_mode, img1_ref, gx1_ref, gy1_ref, acc_refs,
            x1, y1, H, W, tw, band, bh=bh)
        valid = valid & cover

        A, (d00, d02, d11, d12) = _pose_rows(sc, gx, gy, iz,
                                             tptx, tpty, tptz)

        # depth chain (warping.h:259-291):
        # err_J_prx = -(grad·dCam·R·ray)·dDpt/dPrx
        m0 = R00 * u + R01 * v + R02
        m1 = R10 * u + R11 * v + R12
        m2 = R20 * u + R21 * v + R22
        pjd0 = d00 * m0 + d02 * m2
        pjd1 = d11 * m1 + d12 * m2
        # dpt = avg/prx - avg, prx = avg/(avg+dpt)
        # => d dpt/d prx = -(avg+dpt)²/avg (warping.h:44-50)
        ad = avg_dpt + dpt
        dpt_J_prx = -(ad * ad) / avg_dpt
        err_J_prx = -(gx * pjd0 + gy * pjd1) * dpt_J_prx

        r = img0_ref[0] - i1
        wv = _huber_wv(r, valid, huber_delta, loss)

        rows = [wv * a for a in A]
        s = wv * err_J_prx
        for c in range(CS):
            rows.append(s * jac_ref[0, c])
        rows.append(wv * r)
        rows.append(valid.astype(jnp.float32))
        _accumulate_gram(g_ref, rows, tw, bh=bh)


def _pick_block_h(H: int, block_h) -> int:
    """Largest block height dividing H, leaving ≥10 band rows of warp
    y-offset spread budget above the block (kmax > 0 in the interp sampler).
    Grid-step machinery costs ≈0.4 µs each (measured); at 192x256 the fused
    SfM Gram runs 446/226/154 µs for bh=8/24/96."""
    if block_h is not None:
        return block_h
    for b in (96, 48, 32, 24, 16, 8):
        if H % b == 0 and H - b >= 10:
            return b
    return TILE_H


@functools.partial(jax.jit,
                   static_argnames=("band", "grad_mode", "block_h",
                                    "loss", "interpret"))
def sfm_gram_batch(
    params: Array,     # [P, PARAM_DIM] per-factor scalars (make_sfm_params)
    src: Array,        # [P] int32 source keyframe slot
    dst: Array,        # [P] int32 target slot (into the img1 pools)
    img0_pool: Array,  # [K, H, W]
    dpt_pool: Array,   # [K, H, W] materialized depth (or prx0 with codes)
    jacT_pool: Array,  # [K, CS, H, W] feature-major code jacobian
    img1_pool: Array,  # [K1, H, W]
    gx1_pool: Array = None,   # [K1, H, W] (unused in grad_mode='interp')
    gy1_pool: Array = None,   # [K1, H, W]
    active: Array = None,  # [P] int32/bool; 0 slots skip compute, G = 0
    codes: Array = None,   # [P, CS] per-factor code; when given, dpt_pool is
                           # interpreted as prx0 and depth is materialized
                           # in-kernel (saves the update_depth_all pass)
    band: int = 24,
    grad_mode: str = "sampled",
    block_h: int = None,
    loss: str = "huber",
    interpret: bool = False,
) -> Array:
    """Fused SfM linearization: returns the Gram stack G [P, R, R],
    R = 6 + CS + 2 (rows: A(6) | code(CS) | w·r | valid)."""
    P = src.shape[0]
    K, H, W = img0_pool.shape
    CS = jacT_pool.shape[1]
    R_ROWS = 6 + CS + 2
    tw = min(TILE_W, W)
    bh = _pick_block_h(H, block_h)
    grid = (P, H // bh, W // tw)
    if active is None:
        active = jnp.ones((P,), jnp.int32)
    active = active.astype(jnp.int32)
    from_prox = codes is not None
    if codes is None:
        codes = jnp.zeros((P, CS), jnp.float32)

    def tile_src(p, i, j, src_ref, dst_ref, act_ref):
        return (src_ref[p], i, j)

    def plane_dst(p, i, j, src_ref, dst_ref, act_ref):
        return (dst_ref[p], 0, 0)

    def smem_params(p, i, j, src_ref, dst_ref, act_ref):
        return (0, 0)

    kernel = functools.partial(_sfm_system_kernel, CS, band, H, W, tw, bh,
                               grad_mode, from_prox, loss)
    in_specs = [
        pl.BlockSpec((P, PARAM_DIM), smem_params,
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((P, CS), smem_params, memory_space=pltpu.SMEM),
        pl.BlockSpec((1, bh, tw), tile_src, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bh, tw), tile_src, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, CS, bh, tw),
                     lambda p, i, j, s, d, a: (s[p], 0, i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H, W), plane_dst, memory_space=pltpu.VMEM),
    ]
    inputs = [codes, img0_pool, dpt_pool, jacT_pool, img1_pool]
    if grad_mode != "interp":
        in_specs += [
            pl.BlockSpec((1, H, W), plane_dst, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W), plane_dst, memory_space=pltpu.VMEM),
        ]
        inputs += [gx1_pool, gy1_pool]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, R_ROWS, R_ROWS),
                               lambda p, i, j, s, d, a: (p, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[[pltpu.VMEM((bh, tw), jnp.float32)] * 3],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, R_ROWS, R_ROWS), jnp.float32),
        interpret=interpret,
    )(src, dst, active, params, *inputs)
    return out


def _se3_system_kernel(band: int, H: int, W: int, tw: int, bh: int,
                       grad_mode: str, *args):
    """Fused SE(3)-only tracking linearization (LucasKanadeSE3,
    lucas_kanade_se3.h:35-77 / cu_se3aligner.cpp:77-113): rows
    [-A(6) | w·r | valid], G = B·Bᵀ [8, 8]. The -A sign matches
    ops.dense_sfm.se3_step's JT = -A so G[:6, 6] IS Jtr directly."""
    if grad_mode == "interp":
        (src_ref, dst_ref, act_ref, p_ref, img0_ref, dpt_ref,
         img1_ref, g_ref, acc_refs) = args
        gx1_ref = gy1_ref = None
    else:
        (src_ref, dst_ref, act_ref, p_ref, img0_ref, dpt_ref,
         img1_ref, gx1_ref, gy1_ref, g_ref, acc_refs) = args
    pp = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when((i == 0) & (j == 0))
    def _():
        g_ref[:] = jnp.zeros_like(g_ref)

    @pl.when(act_ref[pp] != 0)
    def _():
        xs = jax.lax.broadcasted_iota(jnp.int32, (bh, tw), 1).astype(
            jnp.float32) + (j * tw).astype(jnp.float32)
        ys = jax.lax.broadcasted_iota(jnp.int32, (bh, tw), 0).astype(
            jnp.float32) + (i * bh).astype(jnp.float32)

        sc = _load_scalars(p_ref, pp)
        huber_delta = sc[18]

        dpt = dpt_ref[0]
        x1, y1, valid, iz, u, v, tptx, tpty, tptz = _correspondence(
            sc, xs, ys, dpt, H, W)
        i1, gx, gy, cover = _sample_planes(
            grad_mode, img1_ref, gx1_ref, gy1_ref, acc_refs,
            x1, y1, H, W, tw, band, bh=bh)
        valid = valid & cover

        A, _ = _pose_rows(sc, gx, gy, iz, tptx, tpty, tptz)
        r = img0_ref[0] - i1
        wv = _huber_wv(r, valid, huber_delta)

        rows = [-wv * a for a in A]
        rows.append(wv * r)
        rows.append(valid.astype(jnp.float32))
        _accumulate_gram(g_ref, rows, tw, bh=bh)


@functools.partial(jax.jit,
                   static_argnames=("band", "grad_mode", "block_h",
                                    "interpret"))
def se3_gram_batch(
    params: Array,     # [P, PARAM_DIM] per-factor scalars (make_sfm_params)
    src: Array,        # [P] int32 keyframe slot (img0/dpt pools)
    dst: Array,        # [P] int32 live-frame slot (img1/grad pools)
    img0_pool: Array,  # [K, H, W]
    dpt_pool: Array,   # [K, H, W]
    img1_pool: Array,  # [K1, H, W]
    gx1_pool: Array = None,   # [K1, H, W] (unused in grad_mode='interp')
    gy1_pool: Array = None,   # [K1, H, W]
    active: Array = None,  # [P] int32/bool; 0 slots skip compute, G = 0
    band: int = 24,
    grad_mode: str = "sampled",
    block_h: int = None,
    interpret: bool = False,
) -> Array:
    """Fused SE(3) tracking linearization: G [P, 8, 8] with
    JtJ = G[:, :6, :6], Jtr = G[:, :6, 6], residual = G[:, 6, 6],
    inliers = G[:, 7, 7]. Batched P > 1 serves loop-closure candidate
    verification (loop_detector.cpp:149-168) without vmap dispatch."""
    P = src.shape[0]
    K, H, W = img0_pool.shape
    tw = min(TILE_W, W)
    bh = _pick_block_h(H, block_h)
    grid = (P, H // bh, W // tw)
    if active is None:
        active = jnp.ones((P,), jnp.int32)
    active = active.astype(jnp.int32)

    def tile_src(p, i, j, src_ref, dst_ref, act_ref):
        return (src_ref[p], i, j)

    def plane_dst(p, i, j, src_ref, dst_ref, act_ref):
        return (dst_ref[p], 0, 0)

    kernel = functools.partial(_se3_system_kernel, band, H, W, tw, bh,
                               grad_mode)
    in_specs = [
        pl.BlockSpec((P, PARAM_DIM), lambda p, i, j, s, d, a: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, bh, tw), tile_src, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bh, tw), tile_src, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H, W), plane_dst, memory_space=pltpu.VMEM),
    ]
    inputs = [img0_pool, dpt_pool, img1_pool]
    if grad_mode != "interp":
        in_specs += [
            pl.BlockSpec((1, H, W), plane_dst, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W), plane_dst, memory_space=pltpu.VMEM),
        ]
        inputs += [gx1_pool, gy1_pool]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 8, 8), lambda p, i, j, s, d, a: (p, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[[pltpu.VMEM((bh, tw), jnp.float32)] * 3],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, 8, 8), jnp.float32),
        interpret=interpret,
    )(src, dst, active, params, *inputs)


def _sfm_error_kernel(band: int, H: int, W: int, tw: int,
                      src_ref, dst_ref, act_ref, p_ref,
                      img0_ref, dpt_ref,
                      img1_ref, g_ref, acc_refs):
    """Fused residual/inlier evaluation (SfmAligner::EvaluateError,
    cu_sfmaligner.cpp:72-97 / dense_sfm.h:72-119): Huber-weighted residual
    only, G = [[Σ(w·r)², ·], [·, Σvalid]]."""
    pp = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when((i == 0) & (j == 0))
    def _():
        g_ref[:] = jnp.zeros_like(g_ref)

    @pl.when(act_ref[pp] != 0)
    def _():
        xs = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, tw), 1).astype(
            jnp.float32) + (j * tw).astype(jnp.float32)
        ys = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, tw), 0).astype(
            jnp.float32) + (i * TILE_H).astype(jnp.float32)

        sc = _load_scalars(p_ref, pp)
        huber_delta = sc[18]
        dpt = dpt_ref[0]
        x1, y1, valid, iz, u, v, tptx, tpty, tptz = _correspondence(
            sc, xs, ys, dpt, H, W)
        cover = _band_sample3((img1_ref,), acc_refs, x1, y1, H, W, tw, band)
        i1 = acc_refs[0][:]
        valid = valid & cover

        r = img0_ref[0] - i1
        wv = _huber_wv(r, valid, huber_delta)
        _accumulate_gram(g_ref, [wv * r, valid.astype(jnp.float32)], tw)


@functools.partial(jax.jit, static_argnames=("band", "interpret"))
def sfm_error_batch(
    params: Array,     # [P, PARAM_DIM] (make_sfm_params)
    src: Array,        # [P] int32 slot into img0/dpt pools
    dst: Array,        # [P] int32 slot into the img1 pool
    img0_pool: Array,  # [K, H, W]
    dpt_pool: Array,   # [K, H, W]
    img1_pool: Array,  # [K1, H, W]
    active: Array = None,
    band: int = 24,
    interpret: bool = False,
):
    """Fused photometric error evaluation: returns (residual [P],
    inliers [P]) matching ops.dense_sfm.sfm_evaluate_error."""
    P = src.shape[0]
    K, H, W = img0_pool.shape
    tw = min(TILE_W, W)
    grid = (P, H // TILE_H, W // tw)
    if active is None:
        active = jnp.ones((P,), jnp.int32)
    active = active.astype(jnp.int32)

    def tile_src(p, i, j, src_ref, dst_ref, act_ref):
        return (src_ref[p], i, j)

    def plane_dst(p, i, j, src_ref, dst_ref, act_ref):
        return (dst_ref[p], 0, 0)

    kernel = functools.partial(_sfm_error_kernel, band, H, W, tw)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((P, PARAM_DIM), lambda p, i, j, s, d, a: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TILE_H, tw), tile_src, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_H, tw), tile_src, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W), plane_dst, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, 2), lambda p, i, j, s, d, a: (p, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[[pltpu.VMEM((TILE_H, tw), jnp.float32)]],
    )
    G = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, 2, 2), jnp.float32),
        interpret=interpret,
    )(src, dst, active, params, img0_pool, dpt_pool, img1_pool)
    return G[:, 0, 0], G[:, 1, 1]


def _se3_warp_kernel(band: int, H: int, W: int, tw: int,
                     src_ref, dst_ref, act_ref, p_ref,
                     img0_ref, dpt_ref, img1_ref,
                     warped_ref, g_ref, acc_refs):
    """Fused warp render (cu_se3aligner.cpp kernel_warp_calculate :37-75):
    writes img1 sampled at each img0 pixel's correspondence (0 where
    invalid) and accumulates the unweighted residual/inlier stats
    G = [[Σr², ·], [·, Σvalid]]."""
    pp = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when((i == 0) & (j == 0))
    def _():
        g_ref[:] = jnp.zeros_like(g_ref)

    warped_ref[:] = jnp.zeros_like(warped_ref)

    @pl.when(act_ref[pp] != 0)
    def _():
        xs = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, tw), 1).astype(
            jnp.float32) + (j * tw).astype(jnp.float32)
        ys = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, tw), 0).astype(
            jnp.float32) + (i * TILE_H).astype(jnp.float32)

        sc = _load_scalars(p_ref, pp)
        dpt = dpt_ref[0]
        x1, y1, valid, iz, u, v, tptx, tpty, tptz = _correspondence(
            sc, xs, ys, dpt, H, W)
        cover = _band_sample3((img1_ref,), acc_refs, x1, y1, H, W, tw, band)
        i1 = acc_refs[0][:]
        valid = valid & cover
        validf = valid.astype(jnp.float32)

        warped_ref[0] = jnp.where(valid, i1, 0.0)
        r = jnp.where(valid, img0_ref[0] - i1, 0.0)
        _accumulate_gram(g_ref, [r, validf], tw)


@functools.partial(jax.jit, static_argnames=("band", "interpret"))
def se3_warp_batch(
    params: Array,     # [P, PARAM_DIM] (make_sfm_params)
    src: Array,        # [P] int32 slot into img0/dpt pools
    dst: Array,        # [P] int32 slot into the img1 pool
    img0_pool: Array,  # [K, H, W]
    dpt_pool: Array,   # [K, H, W]
    img1_pool: Array,  # [K1, H, W]
    active: Array = None,
    band: int = 24,
    interpret: bool = False,
):
    """Fused warp render: returns (warped [P, H, W], residual [P],
    inliers [P]) matching ops.dense_sfm.se3_warp semantics."""
    P = src.shape[0]
    K, H, W = img0_pool.shape
    tw = min(TILE_W, W)
    grid = (P, H // TILE_H, W // tw)
    if active is None:
        active = jnp.ones((P,), jnp.int32)
    active = active.astype(jnp.int32)

    def tile_src(p, i, j, src_ref, dst_ref, act_ref):
        return (src_ref[p], i, j)

    def plane_dst(p, i, j, src_ref, dst_ref, act_ref):
        return (dst_ref[p], 0, 0)

    kernel = functools.partial(_se3_warp_kernel, band, H, W, tw)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((P, PARAM_DIM), lambda p, i, j, s, d, a: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TILE_H, tw), tile_src, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_H, tw), tile_src, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W), plane_dst, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_H, tw), lambda p, i, j, s, d, a: (p, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 2), lambda p, i, j, s, d, a: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[[pltpu.VMEM((TILE_H, tw), jnp.float32)]],
    )
    warped, G = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((P, H, W), jnp.float32),
            jax.ShapeDtypeStruct((P, 2, 2), jnp.float32),
        ],
        interpret=interpret,
    )(src, dst, active, params, img0_pool, dpt_pool, img1_pool)
    return warped, G[:, 0, 0], G[:, 1, 1]


def system_from_gram(G: Array, j_pose0: Array, j_pose1: Array, CS: int):
    """Expand Gram stacks into reference-layout GN systems.

    G [P, R, R] with R = 6+CS+2. Returns (JtJ [P, 12+CS, 12+CS],
    Jtr [P, 12+CS], residual [P], inliers [P]) in the reference row layout
    [dErr/dpose0 | dErr/dpose1 | dErr/dcode0] (photometric_factor.cpp:135-161)
    via J = M·B with M = [[-j_pose0ᵀ·sel_A], [-j_pose1ᵀ·sel_A], [sel_code]].
    """
    P = G.shape[0]
    DB = 6 + CS
    D = 12 + CS
    G38 = G[:, :DB, :DB]
    # exact symmetry guards the downstream Cholesky against MXU rounding
    G38 = 0.5 * (G38 + jnp.swapaxes(G38, -1, -2))
    g = G[:, :DB, DB]
    residual = G[:, DB, DB]
    inliers = G[:, DB + 1, DB + 1]

    # Exploit the block structure of M = [[-j_pose0ᵀ, 0], [-j_pose1ᵀ, 0],
    # [0, I]] instead of a dense congruence: only 6x6 / 6xCS batched matmuls
    # remain. HIGHEST precision + explicit symmetrization of the pose
    # blocks: the default bf16 matmul rounds the transform asymmetrically
    # (measured ~15 absolute on 1e5-scale entries), which makes the damped
    # GN system indefinite and the downstream Cholesky NaN.
    hp = jax.lax.Precision.HIGHEST
    T0 = jnp.swapaxes(j_pose0, -1, -2)  # [P, 6, 6]
    T1 = jnp.swapaxes(j_pose1, -1, -2)
    GA = G[:, :6, :6]
    GAc = G[:, :6, 6:DB]
    Gcc = G[:, 6:DB, 6:DB]
    gA = g[:, :6]
    gc = g[:, 6:]

    def mm(a, b):
        return jnp.einsum("pij,pjk->pik", a, b,
                          preferred_element_type=jnp.float32, precision=hp)

    GA = 0.5 * (GA + jnp.swapaxes(GA, -1, -2))
    T0GA = mm(T0, GA)
    T1GA = mm(T1, GA)
    B00 = mm(T0GA, jnp.swapaxes(T0, -1, -2))
    B01 = mm(T0GA, jnp.swapaxes(T1, -1, -2))
    B11 = mm(T1GA, jnp.swapaxes(T1, -1, -2))
    B00 = 0.5 * (B00 + jnp.swapaxes(B00, -1, -2))
    B11 = 0.5 * (B11 + jnp.swapaxes(B11, -1, -2))
    B0c = -mm(T0, GAc)
    B1c = -mm(T1, GAc)
    Gcc = 0.5 * (Gcc + jnp.swapaxes(Gcc, -1, -2))

    top = jnp.concatenate([B00, B01, B0c], axis=-1)
    mid = jnp.concatenate([jnp.swapaxes(B01, -1, -2), B11, B1c], axis=-1)
    bot = jnp.concatenate(
        [jnp.swapaxes(B0c, -1, -2), jnp.swapaxes(B1c, -1, -2), Gcc], axis=-1
    )
    JtJ = jnp.concatenate([top, mid, bot], axis=-2)

    j0 = -jnp.einsum("pij,pj->pi", T0, gA,
                     preferred_element_type=jnp.float32, precision=hp)
    j1 = -jnp.einsum("pij,pj->pi", T1, gA,
                     preferred_element_type=jnp.float32, precision=hp)
    Jtr = jnp.concatenate([j0, j1, gc], axis=-1)
    return JtJ, Jtr, residual, inliers
