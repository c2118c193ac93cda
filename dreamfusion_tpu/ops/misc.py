"""Small parity ops.

- sph_from_ray: ray -> background-sphere (u, v) in [-1, 1]
  (reference: raymarching/src/raymarching.cu:163-209; wired but commented at
  nerf/renderer.py:426, kept for the tiledgrid-background variant)
- linear_to_srgb / srgb_to_linear (reference: nerf/utils.py:141-148)
- get_rays_with_error_map: error-map-weighted ray subsampling
  (reference: nerf/utils.py:65-88) — used by image-supervised training.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def sph_from_ray(rays_o: jax.Array, rays_d: jax.Array, radius: float
                 ) -> jax.Array:
    """Intersect rays with sphere(radius) and return equirectangular (u, v)
    in [-1, 1]: u = phi/pi (atan2(x, z)/pi), v = theta scaled
    (raymarching.cu:163-209)."""
    b = jnp.sum(rays_o * rays_d, -1)
    c = jnp.sum(rays_o * rays_o, -1) - radius * radius
    disc = jnp.maximum(b * b - c, 0.0)
    t = -b + jnp.sqrt(disc)
    p = rays_o + t[..., None] * rays_d
    u = jnp.arctan2(p[..., 0], p[..., 2]) / jnp.pi
    v = jnp.arctan2(p[..., 1],
                    jnp.linalg.norm(p[..., [0, 2]], axis=-1)) / (jnp.pi / 2)
    return jnp.stack([u, v], -1)


def linear_to_srgb(x: jax.Array) -> jax.Array:
    return jnp.where(x < 0.0031308, 12.92 * x,
                     1.055 * jnp.maximum(x, 1e-8) ** 0.41666 - 0.055)


def srgb_to_linear(x: jax.Array) -> jax.Array:
    return jnp.where(x < 0.04045, x / 12.92,
                     (jnp.maximum(x + 0.055, 1e-8) / 1.055) ** 2.4)


def sample_rays_with_error_map(key: jax.Array, error_map: jax.Array, N: int,
                               H: int, W: int) -> Tuple[jax.Array, jax.Array]:
    """Importance-sample N pixel indices from a 128x128 error map
    (nerf/utils.py:73-83): coarse cells by error weight, then uniform jitter
    inside each cell. Returns (inds [N] into H*W, inds_coarse [N])."""
    k_cell, k_jx, k_jy = jax.random.split(key, 3)
    logits = jnp.log(jnp.clip(error_map.reshape(-1), 1e-12, None))
    inds_coarse = jax.random.categorical(k_cell, logits, shape=(N,))
    ix = inds_coarse // 128
    iy = inds_coarse % 128
    sx, sy = H / 128.0, W / 128.0
    x = jnp.clip((ix * sx + jax.random.uniform(k_jx, (N,)) * sx).astype(jnp.int32),
                 0, H - 1)
    y = jnp.clip((iy * sy + jax.random.uniform(k_jy, (N,)) * sy).astype(jnp.int32),
                 0, W - 1)
    return x * W + y, inds_coarse
