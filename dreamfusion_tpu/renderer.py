"""Volume renderer core (shared by all three pipelines).

Path A — `render_stratified`: uniform stratified sampling + importance
resampling, the reference's non-cuda `run` (nerf/renderer.py:301-443). Fully
jittable with static sample counts; stays forever as the oracle renderer.

Path B — `render_grid` (occupancy-grid accelerated marching) lives in
dreamfusion_tpu/ops/marching.py + this module's dispatcher; it is the TPU
re-think of `run_cuda` (nerf/renderer.py:446-559).

The field network is passed as three pure callables so the renderer is
model-agnostic (the reference used nn.Module methods):
  field(x, d, light_d, ratio, shading_code) -> (sigma [M], color [M,3], normal [M,3])
  density(x) -> {"sigma": [M], ...}
  background(d) -> [M, 3] (or None when bg_radius <= 0)
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from dreamfusion_tpu.cameras import safe_normalize
from dreamfusion_tpu.models.networks import SHADING_ALBEDO
from dreamfusion_tpu.ops.composite import (composite, near_far_from_aabb,
                                           sample_pdf)


class FieldFns(NamedTuple):
    field: Callable        # (x, d, light_d, ratio, shading_code) -> (sigma, color, normal)
    density: Callable      # x -> {"sigma": ...}
    background: Optional[Callable]  # d -> rgb
    normal: Optional[Callable] = None  # x -> n (for the smoothness loss)


def sample_light_d(key: jax.Array, rays_o: jax.Array) -> jax.Array:
    """Random light direction near the view direction (avoid dark faces):
    normalize(rays_o[0] + N(0,1)) (reference: nerf/renderer.py:461-464)."""
    return safe_normalize(rays_o[0] + jax.random.normal(key, (3,)))


def render_stratified(
    key: jax.Array,
    fns: FieldFns,
    rays_o: jax.Array,          # [N, 3]
    rays_d: jax.Array,          # [N, 3]
    *,
    bound: float = 1.0,
    min_near: float = 0.1,
    num_steps: int = 64,
    upsample_steps: int = 64,
    bg_radius: float = 1.4,
    light_d: Optional[jax.Array] = None,
    ambient_ratio: jax.Array | float = 1.0,
    shading_code: jax.Array | int = SHADING_ALBEDO,
    bg_color: Optional[jax.Array] = None,   # [N,3] or None (white)
    perturb: bool = False,
    compute_normal_losses: bool = False,
) -> Dict[str, jax.Array]:
    """Stratified + importance-sampled volume rendering of a ray batch.

    Numerics follow nerf/renderer.py:301-443: num_steps uniform samples in
    [near, far] (optionally jittered by +-0.5 bin), importance resampling of
    `upsample_steps` new z values from detached coarse weights, merge + sort,
    single full field evaluation, compositing with a sample_dist tail delta,
    normalized depth, background blending.
    """
    N = rays_o.shape[0]
    aabb = jnp.array([-bound] * 3 + [bound] * 3, jnp.float32)
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, min_near)
    nears = nears[:, None]
    fars = fars[:, None]

    k_light, k_perturb, k_pdf, k_smooth = jax.random.split(key, 4)
    if light_d is None:
        light_d = sample_light_d(k_light, rays_o)

    z = jnp.linspace(0.0, 1.0, num_steps)[None, :]
    z_vals = nears + (fars - nears) * z                      # [N, T]
    sample_dist = (fars - nears) / num_steps
    if perturb:
        z_vals = z_vals + (jax.random.uniform(k_perturb, z_vals.shape) - 0.5) * sample_dist

    def pts(zv):
        p = rays_o[:, None, :] + rays_d[:, None, :] * zv[..., None]
        return jnp.clip(p, -bound, bound)

    xyzs = pts(z_vals)                                        # [N, T, 3]
    sigmas = fns.density(xyzs.reshape(-1, 3))["sigma"].reshape(N, num_steps)

    if upsample_steps > 0:
        # importance sampling on detached coarse weights (renderer.py:354-387)
        sg = jax.lax.stop_gradient
        deltas = z_vals[:, 1:] - z_vals[:, :-1]
        deltas = jnp.concatenate([deltas, jnp.broadcast_to(sample_dist, (N, 1))], -1)
        coarse = composite(sg(sigmas), jnp.zeros((N, num_steps, 3)), sg(deltas))
        z_mid = z_vals[:, :-1] + 0.5 * deltas[:, :-1]         # [N, T-1]
        new_z = sample_pdf(k_pdf, sg(z_mid), coarse.weights[:, 1:-1],
                           upsample_steps, det=not perturb)
        new_z = sg(new_z)
        z_vals = jnp.sort(jnp.concatenate([z_vals, new_z], axis=1), axis=1)
        xyzs = pts(z_vals)

    T = z_vals.shape[1]
    dirs = jnp.broadcast_to(rays_d[:, None, :], (N, T, 3))
    sigma, color, normal = fns.field(xyzs.reshape(-1, 3), dirs.reshape(-1, 3),
                                     light_d, ambient_ratio, shading_code)
    sigma = sigma.reshape(N, T)
    color = color.reshape(N, T, 3)

    deltas = z_vals[:, 1:] - z_vals[:, :-1]
    deltas = jnp.concatenate([deltas, jnp.broadcast_to(sample_dist, (N, 1))], -1)
    # miss rays have near == far (both 1e9, near_far_from_aabb) — guard the
    # normalization so their depth is 0, not 0/0 (NaN survives the weighted
    # sum because NaN * 0 = NaN)
    ori_z = jnp.clip((z_vals - nears) / jnp.maximum(fars - nears, 1e-6),
                     0.0, 1.0)
    out = composite(sigma, color, deltas, ts=ori_z)

    results: Dict[str, jax.Array] = {}
    if compute_normal_losses:
        normal = normal.reshape(N, T, 3)
        # orientation loss (renderer.py:402-406)
        w_sg = jax.lax.stop_gradient(out.weights)
        loss_orient = w_sg * jnp.clip(jnp.sum(normal * dirs, -1), 0.0, None) ** 2
        results["loss_orient"] = jnp.mean(jnp.sum(loss_orient, -1))
        if fns.normal is not None:
            # normal smoothness under small perturbation (renderer.py:408-411)
            xp = xyzs + jax.random.normal(k_smooth, xyzs.shape) * 1e-2
            normal_p = fns.normal(xp.reshape(-1, 3)).reshape(N, T, 3)
            results["loss_smooth"] = jnp.mean(jnp.abs(normal - normal_p))

    # background blending (renderer.py:424-431)
    if bg_radius > 0 and fns.background is not None:
        bg = fns.background(rays_d)
    elif bg_color is not None:
        bg = bg_color
    else:
        bg = jnp.ones((N, 3), jnp.float32)
    image = out.rgb + (1.0 - out.weights_sum)[:, None] * bg

    results.update({
        "image": image,                       # [N, 3]
        "depth": out.depth,                   # [N]
        "weights_sum": out.weights_sum,       # [N]
        "mask": (nears < fars)[:, 0],
    })
    return results


def render_rays_chunked(render_fn: Callable, rays_o: jax.Array,
                        rays_d: jax.Array, chunk: int = 4096) -> Dict[str, jax.Array]:
    """Staged inference: process rays in fixed chunks with lax.map to bound
    memory (the reference's `staged` path, renderer.py:631-644). rays must be
    a multiple of `chunk` (callers pad; full images at 800x800 = 640000 are)."""
    N = rays_o.shape[0]
    pad = (-N) % chunk
    if pad:
        rays_o = jnp.concatenate([rays_o, jnp.zeros((pad, 3))], 0)
        rays_d = jnp.concatenate([rays_d, jnp.ones((pad, 3))], 0)
    ro = rays_o.reshape(-1, chunk, 3)
    rd = rays_d.reshape(-1, chunk, 3)
    out = jax.lax.map(lambda ab: render_fn(ab[0], ab[1]), (ro, rd))
    out = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:])[:N], out)
    return out
