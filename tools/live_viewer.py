#!/usr/bin/env python
"""live_viewer — watch a run WHILE it happens (VERDICT r4 next #9).

The reference GUI renders the map live at 60 Hz during the run
(sources/gui/visualizer.h:81-177). The TPU framework is headless; this is
the live equivalent built on the replay viewer: a ``LiveViewer`` attaches
to a ``DeepFactors`` facade via its keyframe/pose callbacks
(deepfactors.h:114-116) and, at every keyframe event (plus a trajectory
tick every N frames), appends the new keyframe's image/depth to a run
directory and regenerates a self-contained ``viewer.html`` with an
auto-refresh tag — open it in any browser and watch the map grow while
the bench runs.

Cost discipline: the only device->host reads are ONE packed (img|dpt)
read per keyframe event (rare); the HTML rebuild is pure host work.

Usage (in-process):
    from tools.live_viewer import LiveViewer
    lv = LiveViewer("/tmp/live_run", df)   # attaches callbacks
    ... df.process_frame(...) loop ...
    lv.finish()                            # final non-refreshing page

Or: tools/bench_e2e.py --viz-serve /tmp/live_run
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools import replay_viewer as rv


class LiveViewer:
    def __init__(self, run_dir: str, df, every: int = 5, stride: int = 3,
                 max_depth: float = 8.0):
        import jax.numpy as jnp

        self.run_dir = run_dir
        self.df = df
        self.every = max(1, every)
        self.stride = stride
        self.max_depth = max_depth
        os.makedirs(run_dir, exist_ok=True)
        self._n = 0
        self._written = set()
        self._jnp = jnp
        # chain (don't replace) any existing callbacks
        self._prev_map_cb = df.map_callback
        self._prev_pose_cb = df.pose_callback
        df.map_callback = self._on_map
        df.pose_callback = self._on_pose
        with open(os.path.join(run_dir, "intrinsics.txt"), "w") as f:
            f.write(f"{float(df.cam.fx)} {float(df.cam.fy)} "
                    f"{float(df.cam.u0)} {float(df.cam.v0)}\n")

    # -- callbacks ---------------------------------------------------------
    def _on_pose(self, pose):
        if self._prev_pose_cb:
            self._prev_pose_cb(pose)
        self._n += 1
        if self._n % self.every == 0:
            self._write_trajectory()
            self._rebuild(refresh=2.0)

    def _on_map(self, state):
        if self._prev_map_cb:
            self._prev_map_cb(state)
        self._dump_new_keyframes()
        self._write_trajectory()
        self._rebuild(refresh=2.0)

    # -- IO ----------------------------------------------------------------
    def _dump_new_keyframes(self):
        """ONE packed device read per new keyframe: [2, H, W] = img | dpt."""
        import cv2
        import jax

        m = self.df.mapper
        st = m.state
        ids = {kid: slot for kid, slot in m.kf_ids.items()}
        for kid, slot in sorted(ids.items()):
            if kid in self._written:
                continue
            packed = np.asarray(jax.device_get(self._jnp.stack(
                [st.levels[0].img[slot], st.levels[0].dpt[slot]])))
            img, dpt = packed[0], packed[1]
            cv2.imwrite(os.path.join(self.run_dir, f"kf_{kid}_img.png"),
                        (np.clip(img, 0, 1) * 255).astype(np.uint8))
            cv2.imwrite(os.path.join(self.run_dir, f"kf_{kid}_dpt.png"),
                        (np.clip(dpt, 0, 13) * 5000).astype(np.uint16))
            self._written.add(kid)

    def _write_trajectory(self):
        from deepfactors_tpu.utils import tum_io

        tum_io.save_trajectory(
            os.path.join(self.run_dir, "trajectory.txt"),
            self.df.trajectory)
        # keyframe poses: live ones (host-cheap: archived store device
        # arrays, np.asarray reads land async copies started at eviction)
        import jax

        kf_poses = []
        for a in self.df.mapper.archived:
            kf_poses.append((float(a["id"]),
                             _HostPose(np.asarray(a["q"]),
                                       np.asarray(a["t"]))))
        st = self.df.mapper.state
        if self.df.mapper.kf_slots:
            ids_np, q_np, t_np = (np.asarray(x) for x in jax.device_get(
                (st.ids, st.pose.q, st.pose.t)))
            for s in self.df.mapper.kf_slots:
                kf_poses.append((float(ids_np[s]),
                                 _HostPose(q_np[s], t_np[s])))
        kf_poses.sort(key=lambda x: x[0])
        tum_io.save_trajectory(
            os.path.join(self.run_dir, "keyframes.txt"), kf_poses)

    def _rebuild(self, refresh: float = 0.0):
        run = rv.load_run(self.run_dir)
        if not run["kf_files"]:
            return
        html = rv.build_html(run, self.stride, self.max_depth)
        if refresh > 0:
            html = html.replace(
                "<meta charset=\"utf-8\">",
                "<meta charset=\"utf-8\">"
                f"<meta http-equiv=\"refresh\" content=\"{refresh}\">")
        tmp = os.path.join(self.run_dir, ".viewer.tmp")
        with open(tmp, "w") as f:
            f.write(html)
        os.replace(tmp, os.path.join(self.run_dir, "viewer.html"))

    def finish(self):
        """Final rebuild without the auto-refresh tag; detach callbacks."""
        self._dump_new_keyframes()
        self._write_trajectory()
        self._rebuild(refresh=0.0)
        self.df.map_callback = self._prev_map_cb
        self.df.pose_callback = self._prev_pose_cb


class _HostPose:
    """Minimal pose duck (q, t) for tum_io.save_trajectory."""

    def __init__(self, q, t):
        self.q = q
        self.t = t


if __name__ == "__main__":
    print(__doc__)
