"""Procedural indoor scenes: ray-cast textured rooms with ground truth.

The reference evaluates on ScanNet indoor sequences (README.md:156-160,
scannet_interface.cpp) — no real data exists in this environment, so this
module generates the stand-in distribution used BOTH for decoder training
(models/train_decoder.py) and for full-scale end-to-end ATE benchmarks
(tools/bench_e2e.py): boxy rooms with textured walls/floor/ceiling and
furniture-like boxes, rendered with exact depth at any camera pose.

Geometry is axis-aligned (one inward-facing room box + B inner boxes), so a
frame renders as a single fused XLA dispatch: per-pixel ray/slab
intersections, a one-hot gather of per-surface texture parameters, and a
procedural texture evaluation — no meshes, no host loops, static shapes.

Conventions match the framework (CLAUDE.md): pixel (x, y); camera x right,
y DOWN, z forward; pose is camera-to-world SE3(q wxyz, t); depth is z-depth
(geometry/camera.reproject). The floor is the +y room face.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import se3 as se3m
from ..geometry import camera as cm
from ..geometry.se3 import SE3
from ..geometry.camera import PinholeCamera
from ..ops import image as ipg

Array = jax.Array

_NTEX = 12  # texture params per surface


class RoomScene(NamedTuple):
    """Axis-aligned room + inner boxes, per-surface texture parameters.

    Surfaces are indexed: room faces 0..5 (axis*2 + is_max_side), then box b
    faces 6+6b .. 6+6b+5 (same face ordering)."""

    room_min: Array   # [3]
    room_max: Array   # [3]
    box_min: Array    # [B, 3]
    box_max: Array    # [B, 3]
    tex: Array        # [6 + 6B, _NTEX]


def _texture(u: Array, v: Array, p: Array) -> Array:
    """Procedural surface albedo at in-plane coords (u, v) in meters.

    Mixes low- (room-scale), mid-, and fine-scale components so dense
    photometric tracking sees gradients at every pyramid level."""
    val = (0.45
           + 0.20 * jnp.sin(p[0] * u + p[1]) * jnp.cos(p[2] * v + p[3])
           + 0.15 * jnp.sin(p[4] * u + p[5] * v + p[6])
           + 0.10 * jnp.cos(p[7] * u - p[8] * v + p[9])
           + 0.07 * jnp.sin(p[10] * (u + 0.7 * v) + p[11]))
    return jnp.clip(val, 0.03, 0.97)


def random_room(seed: int = 0, n_boxes: int = 3,
                freq_scale: float = 1.0,
                size_scale: float = 1.0) -> RoomScene:
    """Sample a room: 4-7 m footprint, 2.5-3 m height, ``n_boxes`` boxes
    standing on the floor, random texture parameters per surface.

    ``freq_scale`` scales every texture frequency: the defaults target the
    256-wide trained camera (finest component ≈ 7-12 px there); cameras with
    much smaller focal lengths must scale down or the fine texture aliases
    below ~3 px period and photometric alignment locks onto the wrong
    texture phase (periodic-texture ambiguity).

    ``size_scale`` scales the whole room geometry (footprint, height,
    boxes): the depth-scale randomization axis. Default rooms put the
    camera 2-3 m from most surfaces; real indoor frames reach 5-6 m
    median depth (REALIMG: the predict head trained at 2-3 m LOSES to a
    zero code exactly on ~4.5 m-median images — VERDICT r4 next #4), so
    training sweeps size_scale to cover the far field."""
    rng = np.random.RandomState(seed)
    lx = size_scale * rng.uniform(4.0, 7.0)
    ly = size_scale * rng.uniform(2.5, 3.0)
    lz = size_scale * rng.uniform(4.0, 7.0)
    room_min = np.array([-lx / 2, -ly / 2, -lz / 2], np.float32)
    room_max = np.array([lx / 2, ly / 2, lz / 2], np.float32)

    bmin, bmax = [], []
    for _ in range(n_boxes):
        sx = rng.uniform(0.4, 1.2)
        sy = rng.uniform(0.5, 1.6)
        sz = rng.uniform(0.4, 1.2)
        # keep a free inner disk for the camera path; the clearance relaxes
        # every 50 rejected draws — for small rooms + large boxes the
        # initial requirement can be geometrically infeasible and an
        # unbounded rejection loop would spin forever
        clearance = 1.6 + 0.5 * max(sx, sz)
        for attempt in range(400):
            cx = rng.uniform(room_min[0] + 0.3 + sx / 2,
                             room_max[0] - 0.3 - sx / 2)
            cz = rng.uniform(room_min[2] + 0.3 + sz / 2,
                             room_max[2] - 0.3 - sz / 2)
            if np.hypot(cx, cz) > clearance:
                break
            if attempt % 50 == 49:
                clearance *= 0.85
        ymax = room_max[1]              # floor (+y face, y down)
        ymin = ymax - sy
        bmin.append([cx - sx / 2, ymin, cz - sz / 2])
        bmax.append([cx + sx / 2, ymax, cz + sz / 2])

    n_surf = 6 + 6 * n_boxes
    tex = np.zeros((n_surf, _NTEX), np.float32)
    # Frequencies (rad/m) spanning coarse..fine; random phases. The finest
    # component is capped near 16 rad/m (~0.4 m period ≈ 40 px at the
    # 256-wide camera, ≥10 px even under strong foreshortening): texture
    # curvature at pixel scale is NOT view-consistent under resampling and
    # biases photometric BA by centimeters (measured) — band-limiting must
    # happen in TEXTURE space, image-space AA cannot fix oblique views.
    tex[:, 0] = freq_scale * rng.uniform(0.8, 2.0, n_surf)
    tex[:, 2] = freq_scale * rng.uniform(0.8, 2.0, n_surf)
    tex[:, 4] = freq_scale * rng.uniform(2.0, 5.0, n_surf)
    tex[:, 5] = freq_scale * rng.uniform(2.0, 5.0, n_surf)
    tex[:, 7] = freq_scale * rng.uniform(5.0, 9.0, n_surf)
    tex[:, 8] = freq_scale * rng.uniform(5.0, 9.0, n_surf)
    tex[:, 10] = freq_scale * rng.uniform(10.0, 16.0, n_surf)
    for c in (1, 3, 6, 9, 11):
        tex[:, c] = rng.uniform(0, 2 * np.pi, n_surf)

    return RoomScene(
        room_min=jnp.asarray(room_min), room_max=jnp.asarray(room_max),
        box_min=jnp.asarray(np.asarray(bmin, np.float32).reshape(n_boxes, 3)),
        box_max=jnp.asarray(np.asarray(bmax, np.float32).reshape(n_boxes, 3)),
        tex=jnp.asarray(tex),
    )


def _room_exit(o: Array, d: Array, rmin: Array, rmax: Array):
    """Exit of a ray starting INSIDE the room box: per-axis facing bound,
    take the nearest. Returns (t [N], face_id [N])."""
    pos = d >= 0
    safe = jnp.where(pos, jnp.maximum(d, 1e-9), jnp.minimum(d, -1e-9))
    bound = jnp.where(pos, rmax, rmin)               # [N, 3]
    t_ax = (bound - o) / safe                        # [N, 3] all positive
    axis = jnp.argmin(t_ax, axis=-1)                 # [N]
    t = jnp.min(t_ax, axis=-1)
    side = jnp.take_along_axis(pos, axis[:, None], -1)[:, 0]
    face = axis * 2 + side.astype(jnp.int32)
    return t, face


def _box_entry(o: Array, d: Array, bmin: Array, bmax: Array):
    """Slab-method entry of a ray into one box. Returns
    (t [N], face_id 0..5 [N], hit [N])."""
    safe = jnp.where(d >= 0, jnp.maximum(d, 1e-9), jnp.minimum(d, -1e-9))
    t1 = (bmin - o) / safe
    t2 = (bmax - o) / safe
    tn = jnp.minimum(t1, t2)
    tf = jnp.maximum(t1, t2)
    axis = jnp.argmax(tn, axis=-1)
    t_near = jnp.max(tn, axis=-1)
    t_far = jnp.min(tf, axis=-1)
    hit = (t_near < t_far) & (t_near > 1e-4)
    # entering face: on the min side when the ray moves +, else max side
    side = jnp.take_along_axis(d, axis[:, None], -1)[:, 0] < 0
    face = axis * 2 + side.astype(jnp.int32)
    return t_near, face, hit


_INPLANE = np.array([[1, 2], [1, 2], [0, 2], [0, 2], [0, 1], [0, 1]])


@functools.partial(jax.jit, static_argnames=("height", "width"))
def render(scene: RoomScene, cam: PinholeCamera, pose: SE3,
           height: int, width: int):
    """Render (image [H, W] in [0,1], depth [H, W] z-depth in meters) of the
    scene from a camera-to-world pose. One fused dispatch."""
    ys, xs = jnp.mgrid[0:height, 0:width]
    dirs_cam = jnp.stack(
        [(xs.astype(jnp.float32) - cam.u0) / cam.fx,
         (ys.astype(jnp.float32) - cam.v0) / cam.fy,
         jnp.ones((height, width), jnp.float32)], axis=-1,
    ).reshape(-1, 3)                                   # [N, 3], z=1
    R = se3m.quat_to_matrix(pose.q)
    d = dirs_cam @ R.T                                 # [N, 3] world
    o = jnp.broadcast_to(pose.t, d.shape)

    t_room, f_room = _room_exit(o, d, scene.room_min, scene.room_max)
    ts = [t_room]
    faces = [f_room]
    B = scene.box_min.shape[0]
    for b in range(B):
        tb, fb, hb = _box_entry(o, d, scene.box_min[b], scene.box_max[b])
        ts.append(jnp.where(hb, tb, jnp.inf))
        faces.append(6 + 6 * b + fb)
    ts = jnp.stack(ts)                                  # [C, N]
    faces = jnp.stack(faces)                            # [C, N]
    win = jnp.argmin(ts, axis=0)                        # [N]
    t = jnp.take_along_axis(ts, win[None], 0)[0]
    face = jnp.take_along_axis(faces, win[None], 0)[0]

    # hit point + per-face in-plane coordinates
    p = o + t[:, None] * d                              # [N, 3]
    axes = jnp.asarray(_INPLANE, jnp.int32)             # [6, 2]
    local = axes[face % 6]                              # [N, 2]
    u = jnp.take_along_axis(p, local[:, :1], -1)[:, 0]
    v = jnp.take_along_axis(p, local[:, 1:], -1)[:, 0]

    # one-hot gather of texture params (leading-axis gathers are slow on
    # TPU — S is tiny so the [N, S] @ [S, P] matmul wins)
    S = scene.tex.shape[0]
    onehot = jax.nn.one_hot(face, S, dtype=jnp.float32)
    params = onehot @ scene.tex                         # [N, P]
    img = _texture(u, v, params.T)

    # depth equals t because dirs_cam has unit z (z-depth parameterization)
    return img.reshape(height, width), t.reshape(height, width)


@functools.partial(jax.jit, static_argnames=("height", "width", "ss"))
def render_aa(scene: RoomScene, cam: PinholeCamera, pose: SE3,
              height: int, width: int, ss: int = 2):
    """Anti-aliased render: image supersampled ``ss``x then binomial
    blur-down; depth ray-cast at the target resolution.

    The plain ``render`` point-samples an analytic texture, so a warped view
    resampled bilinearly disagrees with the target image by the texture's
    curvature at pixel scale (~5e-3 at oblique incidence) — enough to bias
    photometric BA by centimeters. Real cameras are band-limited by optics;
    this is the equivalent. Use for any imagery feeding photometric
    alignment."""
    big = cm.resize(cam, width * ss, height * ss)
    img, _ = render(scene, big, pose, height * ss, width * ss)
    for _ in range(int(np.log2(ss))):
        img = ipg.gaussian_blur_down(img)
    _, dpt = render(scene, cam, pose, height, width)
    return img, dpt


def _np_yaw_pitch_quat(yaw: float, pitch: float) -> np.ndarray:
    """wxyz quaternion of R = R_y(yaw) · R_x(pitch), computed host-side
    (per-pose device dispatches through the axon tunnel cost ~7 ms each)."""
    cy, sy = np.cos(yaw / 2), np.sin(yaw / 2)
    cp, sp = np.cos(pitch / 2), np.sin(pitch / 2)
    # quat_mul([cy,0,sy,0], [cp,sp,0,0])
    return np.array([cy * cp, cy * sp, sy * cp, -sy * sp], np.float32)


def orbit_trajectory(n_frames: int, radius: float = 0.8,
                     sweep: float = 2.6 * np.pi, y_bob: float = 0.08,
                     pitch_amp: float = 0.06, look: str = "outward"):
    """Smooth in-room camera path: an orbit of ``sweep`` radians (>2π gives
    a revisit for loop closure) with gentle vertical bob and pitch wobble —
    rotation-heavy by construction (the camera yaws through the full sweep).
    Returns a list of camera-to-world SE3 poses."""
    poses = []
    for i in range(n_frames):
        s = i / max(1, n_frames - 1)
        th = sweep * s
        pos = np.array([radius * np.cos(th),
                        y_bob * np.sin(4.0 * np.pi * s),
                        radius * np.sin(th)], np.float32)
        if look == "outward":
            yaw = np.arctan2(pos[0], pos[2])  # +z forward toward the wall
        else:
            yaw = np.arctan2(-pos[0], -pos[2])
        pitch = pitch_amp * np.sin(3.0 * np.pi * s)
        q = _np_yaw_pitch_quat(yaw, pitch)
        poses.append(SE3(jnp.asarray(q), jnp.asarray(pos)))
    return poses


def render_sequence(scene: RoomScene, cam: PinholeCamera, poses,
                    height: int, width: int, with_depth: bool = False,
                    antialias: bool = True):
    """Render a whole trajectory to host numpy (one dispatch per frame)."""
    imgs, dpts = [], []
    for p in poses:
        if antialias:
            img, dpt = render_aa(scene, cam, p, height, width)
        else:
            img, dpt = render(scene, cam, p, height, width)
        imgs.append(img)
        if with_depth:
            dpts.append(dpt)
    imgs = [np.asarray(i) for i in jax.device_get(imgs)]
    if with_depth:
        return imgs, [np.asarray(d) for d in jax.device_get(dpts)]
    return imgs


class OracleDecoder:
    """Ground-truth 'decoder': returns each frame's exact proximity pyramid
    (zero code Jacobian) — the perfect-decoder upper bound.

    Frames are looked up by image content, so it drops into the Mapper's
    decoder slot unchanged (build_keyframe_data passes only the image,
    mirroring DecoderNetwork::Decode's signature). Used by CI-tier e2e tests
    and as the oracle row of the full-scale ATE bench: the gap between
    oracle-ATE and trained-decoder-ATE isolates decoder error from
    solver/tracker error."""

    def __init__(self, frames, depths, levels: int, code_size: int,
                 avg_dpt: float = 2.0):
        from ..geometry import warping as wpg

        self._ip = ipg
        self.levels = levels
        self.code_size = code_size
        self.avg_dpt = avg_dpt
        self._lut = {}
        for img, dpt in zip(frames, depths):
            key = np.asarray(img, np.float32).tobytes()
            prx = np.asarray(wpg.depth_to_prox(jnp.asarray(dpt, jnp.float32),
                                               avg_dpt))
            self._lut[key] = prx

    def _result(self, img, code):
        from ..models.decoder import DecodeResult

        key = np.asarray(img, np.float32).tobytes()
        prx = self._lut[key]
        prx_pyr = tuple(self._ip.build_pyramid(jnp.asarray(prx), self.levels))
        jac = tuple(jnp.zeros(p.shape + (self.code_size,), jnp.float32)
                    for p in prx_pyr)
        stdev = tuple(jnp.zeros_like(p) for p in prx_pyr)
        return DecodeResult(prx_pyr, prx_pyr, jac, stdev, code)

    def decode(self, img, code):
        return self._result(img, code)

    def predict_and_decode(self, img):
        return self._result(img, jnp.zeros((self.code_size,), jnp.float32))


def room_dataset(height: int, width: int, cam: PinholeCamera,
                 batch: int = 8, seed: int = 0, n_boxes: int = 3,
                 rooms: int = 64):
    """Infinite (images [B,H,W], depths [B,H,W]) iterator over random rooms
    and random in-room viewpoints — the decoder training distribution
    (stand-in for the reference's ScanNet training set)."""
    rng = np.random.RandomState(seed)
    scenes = [random_room(seed * 1000 + r, n_boxes) for r in range(rooms)]

    def random_pose():
        r = rng.uniform(0.0, 1.2)
        th = rng.uniform(0, 2 * np.pi)
        pos = np.array([r * np.cos(th), rng.uniform(-0.25, 0.25),
                        r * np.sin(th)], np.float32)
        q = _np_yaw_pitch_quat(rng.uniform(0, 2 * np.pi),
                               rng.uniform(-0.25, 0.25))
        return SE3(jnp.asarray(q), jnp.asarray(pos))

    while True:
        imgs, dpts = [], []
        for _ in range(batch):
            sc = scenes[rng.randint(len(scenes))]
            img, dpt = render_aa(sc, cam, random_pose(), height, width)
            imgs.append(img)
            dpts.append(dpt)
        imgs, dpts = jax.device_get((imgs, dpts))
        yield (np.stack([np.asarray(i) for i in imgs]),
               np.stack([np.asarray(d) for d in dpts]))
