"""Batched full-image rendering for DVGO fields + orbit-video tooling.

Rebuilds frameworks/nerf/renderers/image_renderer.py (chunked per-view
rendering of any field) and frameworks/nerf/interface/render_views.py
(look-at/spherical pose builders, render_round_views orbit videos, snap_shot,
and the CLI video exporter).
"""

from __future__ import annotations

import argparse
import math
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def look_at_to_c2w(C: np.ndarray, p: np.ndarray,
                   up=(0.1, 0.1, 1.0)) -> np.ndarray:
    """cam2world looking from C to p with +z-ish up
    (render_views.py:57-69)."""
    up = np.asarray(up, np.float64)
    up = up / np.linalg.norm(up)
    L = np.asarray(p, np.float64) - np.asarray(C, np.float64)
    s = np.cross(L, up)
    u = np.cross(s, L)
    R = np.stack([s, u, -L])
    R = (R / np.linalg.norm(R, axis=1, keepdims=True)).T
    ret = np.zeros((4, 4), np.float32)
    ret[:3, :3] = R
    ret[:3, 3] = C
    ret[3, 3] = 1.0
    return ret


def cord_spherical(radius: float, theta_deg: float, phi_deg: float) -> np.ndarray:
    """Spherical coords with +z pole (render_views.py:72-77)."""
    t, p = math.radians(theta_deg), math.radians(phi_deg)
    return radius * np.array([math.sin(t) * math.cos(p),
                              math.sin(t) * math.sin(p), math.cos(t)],
                             np.float32)


class ImageRenderer:
    """Render full views of a DVGO field in fixed ray chunks
    (image_renderer.py:4-61). One jitted chunk function, python dispatch."""

    def __init__(self, field, params, *, near: float, far: float,
                 bg=(1.0, 1.0, 1.0), batch_size: int = 4096,
                 key: str = "rgb_marched", **ray_kwargs):
        self.field = field
        self.params = params
        self.bs = batch_size
        self.key = key
        self.ray_kwargs = ray_kwargs
        n_samples = field.n_render_samples(far)

        @jax.jit
        def chunk_fn(params, ro, rd, vd):
            out = field.apply(params, ro, rd, vd, near=near, far=far,
                              bg=jnp.asarray(bg, jnp.float32),
                              n_samples=n_samples, method=field.render)
            return out[key]

        self._chunk_fn = chunk_fn

    def renderView(self, H: int, W: int, K: np.ndarray,
                   render_pose: np.ndarray) -> np.ndarray:
        from dreamfusion_tpu.datasets.rays import get_rays_of_a_view

        ro, rd, vd = get_rays_of_a_view(H, W, np.asarray(K),
                                        np.asarray(render_pose),
                                        **self.ray_kwargs)
        flat = [a.reshape(-1, 3) for a in (ro, rd, vd)]
        n = flat[0].shape[0]
        pad = (-n) % self.bs
        if pad:
            flat = [np.concatenate([a, np.ones((pad, 3), np.float32)])
                    for a in flat]
        outs = []
        for s in range(0, flat[0].shape[0], self.bs):
            outs.append(np.asarray(self._chunk_fn(
                self.params, *(jnp.asarray(a[s:s + self.bs]) for a in flat))))
        img = np.concatenate(outs)[:n]
        return img.reshape(H, W, -1)

    def renderViews(self, HW_list, K_list, render_poses) -> List[np.ndarray]:
        return [self.renderView(H, W, K, pose)
                for (H, W), K, pose in zip(HW_list, K_list, render_poses)]


def render_round_views(renderer: ImageRenderer, H: int, W: int, focal: float,
                       num_imgs: int = 16, center=(0.0, 0.0, 0.0),
                       dis: float = 1.0, theta_deg: float = 60.0
                       ) -> List[np.ndarray]:
    """Orbit around `center` at distance `dis` (render_views.py:80-97)."""
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], np.float32)
    frames = []
    for i in range(num_imgs):
        C = np.asarray(center) + cord_spherical(dis, theta_deg,
                                                360.0 * i / num_imgs)
        pose = look_at_to_c2w(C, np.asarray(center))
        frames.append(renderer.renderView(H, W, K, pose))
    return frames


def snap_shot(renderer: ImageRenderer, H: int, W: int, focal: float,
              position, target=(0.0, 0.0, 0.0)) -> np.ndarray:
    """Single look-at frame (render_views.py:99-150)."""
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], np.float32)
    return renderer.renderView(H, W, K, look_at_to_c2w(np.asarray(position),
                                                       np.asarray(target)))


def main(argv=None):
    """CLI video export from a .dvgo checkpoint (render_views.py:158-178)."""
    ap = argparse.ArgumentParser("render_views")
    ap.add_argument("checkpoint", help=".dvgo checkpoint path")
    ap.add_argument("--out", default="round_views.gif")
    ap.add_argument("--num_imgs", type=int, default=16)
    ap.add_argument("--H", type=int, default=256)
    ap.add_argument("--W", type=int, default=256)
    ap.add_argument("--focal", type=float, default=300.0)
    ap.add_argument("--dis", type=float, default=2.0)
    ap.add_argument("--near", type=float, default=0.1)
    ap.add_argument("--far", type=float, default=6.0)
    args = ap.parse_args(argv)

    from dreamfusion_tpu.models.kailu import (load_dvgo_state_into_params,
                                              peek_dvgo_checkpoint)
    from dreamfusion_tpu.models.zoo import get_field

    meta = peek_dvgo_checkpoint(args.checkpoint)
    field = get_field("dvgo_fine", world_size=meta["world_size"],
                      k0_dim=meta["k0_dim"],
                      rgbnet_name=meta.get("rgbnet_name", "resmlp"),
                      rgbnet_width=meta.get("rgbnet_width", 128),
                      rgbnet_depth=meta.get("rgbnet_depth", 3),
                      posbase_pe=meta.get("posbase_pe", 5),
                      viewbase_pe=meta.get("viewbase_pe", 4),
                      xyz_min=meta["xyz_min"], xyz_max=meta["xyz_max"])
    o = jnp.zeros((4, 3))
    d = jnp.tile(jnp.array([[0.0, 0, 1.0]]), (4, 1))
    params = field.init(jax.random.PRNGKey(0), o, d, d, near=args.near,
                        far=args.far, bg=1.0,
                        n_samples=field.n_render_samples(args.far),
                        method=field.render)
    # grids + rgbnet live at the top level of a bare DVGOField tree
    params = load_dvgo_state_into_params({"params": {"main": params["params"]}},
                                         args.checkpoint, scope="main")
    params = {"params": params["params"]["main"]}

    r = ImageRenderer(field, params, near=args.near, far=args.far)
    frames = render_round_views(r, args.H, args.W, args.focal,
                                num_imgs=args.num_imgs, dis=args.dis)
    import imageio

    imageio.mimwrite(args.out, [(np.clip(f, 0, 1) * 255).astype(np.uint8)
                                for f in frames], fps=10, loop=0)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
