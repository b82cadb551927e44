"""State checkpoint / resume.

The reference has NO optimizer-state checkpointing (SURVEY.md §5 — only
terminal SaveResults). Here the whole SLAM state is pytrees, so a checkpoint
is a faithful snapshot: map (keyframe tensors, codes, poses), frame store,
factor pools, work-schedule state, tracker pose, trajectory. Restoring
resumes mid-sequence bit-for-bit (mod recompilation).

Format: a directory with msgpack'd arrays (via numpy .npz) + a JSON
manifest for host-side scheduler state.
"""
from __future__ import annotations

import json
import os
import pickle
from typing import Any

import jax
import numpy as np


def _flatten_state(tree) -> dict:
    leaves, treedef = jax.tree.flatten(tree)
    return {
        "leaves": [np.asarray(jax.device_get(l)) for l in leaves],
        "treedef": treedef,
    }


def save_checkpoint(path: str, system) -> None:
    """Snapshot a DeepFactors system (deepfactors_tpu.system.DeepFactors)."""
    os.makedirs(path, exist_ok=True)
    m = system.mapper

    arrays = {}
    for name, tree in (
        ("map_state", m.state),
        ("frames", m.frames),
        ("marginals", m.marginals),
        ("dprior", m.dprior),
        ("tracker_pose", (system.tracker.pose_ck.q, system.tracker.pose_ck.t)),
        ("pose_wc", (system.pose_wc.q, system.pose_wc.t)),
    ):
        leaves = jax.tree.leaves(tree)
        for i, leaf in enumerate(leaves):
            arrays[f"{name}__{i}"] = np.asarray(jax.device_get(leaf))
    np.savez_compressed(os.path.join(path, "arrays.npz"), **arrays)

    host = {
        "kf_slots": m.kf_slots,
        "frame_slots": m.frame_slots,
        "kf_ids": {str(k): v for k, v in m.kf_ids.items()},
        "next_kid": m._next_kid,
        "n_links": m.n_links,
        "link_free": m._link_free,
        "links_host": [[li, list(pair)] for li, pair in m.links_host],
        "archived": [
            {"id": a["id"], "q": np.asarray(a["q"]).tolist(),
             "t": np.asarray(a["t"]).tolist()}
            for a in m.archived
        ],
        "curr_kf": system.curr_kf,
        "bootstrapped": system.bootstrapped,
        "tracking_lost": system.tracking_lost,
        "trajectory": [
            (ts, np.asarray(jax.device_get(p.q)).tolist(),
             np.asarray(jax.device_get(p.t)).tolist())
            for ts, p in system.trajectory
        ],
        "loop_links": system.loop_links,
    }
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(host, f)

    from ..mapping.scheduler import PyScheduler

    pools = {
        "pool": m.sched.photo_pool,
        "rep_pool": m.sched.rep_pool,
        "geo_pool": m.sched.geo_pool,
    }
    if isinstance(m.sched, PyScheduler):
        pools["work"] = m.sched.wm
    with open(os.path.join(path, "pools.pkl"), "wb") as f:
        pickle.dump(pools, f)


def load_checkpoint(path: str, system) -> None:
    """Restore into an already-constructed system with matching config."""
    import jax.numpy as jnp

    from ..geometry.se3 import SE3

    data = np.load(os.path.join(path, "arrays.npz"))
    m = system.mapper

    def restore(name, template):
        leaves, treedef = jax.tree.flatten(template)
        new_leaves = [jnp.asarray(data[f"{name}__{i}"])
                      for i in range(len(leaves))]
        return jax.tree.unflatten(treedef, new_leaves)

    m.state = restore("map_state", m.state)
    m.frames = restore("frames", m.frames)
    if "marginals__0" in data:
        m.marginals = restore("marginals", m.marginals)
    if "dprior__0" in data:
        m.dprior = restore("dprior", m.dprior)
    tq, tt = restore("tracker_pose",
                     (system.tracker.pose_ck.q, system.tracker.pose_ck.t))
    system.tracker.pose_ck = SE3(tq, tt)
    pq, pt = restore("pose_wc", (system.pose_wc.q, system.pose_wc.t))
    system.pose_wc = SE3(pq, pt)

    with open(os.path.join(path, "manifest.json")) as f:
        host = json.load(f)
    m.kf_slots = list(host["kf_slots"])
    m.frame_slots = list(host["frame_slots"])
    m.kf_ids = {int(k): v for k, v in host["kf_ids"].items()}
    m._next_kid = host.get("next_kid", len(m.kf_ids))
    m.n_links = host["n_links"]
    m._link_free = list(host.get("link_free", []))
    m.links_host = [(li, tuple(pair))
                    for li, pair in host.get("links_host", [])]
    m.archived = [
        {"id": a["id"], "q": np.asarray(a["q"], np.float32),
         "t": np.asarray(a["t"], np.float32)}
        for a in host.get("archived", [])
    ]
    system.curr_kf = host["curr_kf"]
    system.bootstrapped = host["bootstrapped"]
    system.tracking_lost = host["tracking_lost"]
    system.trajectory = [
        (ts, SE3(jnp.asarray(q, jnp.float32), jnp.asarray(t, jnp.float32)))
        for ts, q, t in host["trajectory"]
    ]
    system.loop_links = [tuple(x) for x in host["loop_links"]]

    from ..mapping.scheduler import PyScheduler

    with open(os.path.join(path, "pools.pkl"), "rb") as f:
        pools = pickle.load(f)

    def copy_pool(dst, src):
        for field in dst._fields:
            getattr(dst, field)[:] = getattr(src, field)

    copy_pool(m.sched.photo_pool, pools["pool"])
    copy_pool(m.sched.rep_pool, pools["rep_pool"])
    copy_pool(m.sched.geo_pool, pools["geo_pool"])
    if isinstance(m.sched, PyScheduler) and "work" in pools:
        m.sched.wm = pools["work"]
    # native scheduler: work-schedule state is not serialized; the restored
    # map is consistent and new factors re-enqueue on the next keyframe

    # rebind tracker's keyframe tensors to the restored map
    if system.curr_kf is not None:
        system._set_tracker_keyframe(system.curr_kf)
        system.tracker.pose_ck = SE3(tq, tt)
