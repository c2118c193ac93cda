"""Volume-rendering compositing math, TPU-native.

Replaces both the reference's torch compositor (nerf/renderer.py:389-421) and
the CUDA `composite_rays_train` kernel with its hand-derived backward
(raymarching/src/raymarching.cu:501-693). On TPU the transmittance prefix
product is a parallel (log-depth) `cumprod` / log-space `cumsum`, and JAX
autodiff of that expression is exactly the analytic gradient the CUDA kernel
hardcodes — we golden-test that equivalence in tests/test_composite.py.

All functions are shape-static and mask-friendly: invalid samples carry
sigma=0, delta=0, so they contribute alpha=0 and leave transmittance
unchanged — the static-shape analog of the reference's compacted rays.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


def exclusive_cumprod(x: jax.Array, axis: int = -1) -> jax.Array:
    """cumprod shifted right by one with a leading 1 (T_i = prod_{j<i} x_j)."""
    c = jnp.cumprod(x, axis=axis)
    ones_shape = list(x.shape)
    ones_shape[axis] = 1
    return jnp.concatenate(
        [jnp.ones(ones_shape, x.dtype), jax.lax.slice_in_dim(c, 0, x.shape[axis] - 1, axis=axis)],
        axis=axis)


class CompositeOut(NamedTuple):
    weights: jax.Array       # [N, T]
    weights_sum: jax.Array   # [N]
    depth: jax.Array         # [N]
    rgb: jax.Array           # [N, 3]


def composite(sigmas: jax.Array, rgbs: jax.Array, deltas: jax.Array,
              ts: Optional[jax.Array] = None,
              T_thresh: float = 0.0) -> CompositeOut:
    """Alpha-composite samples along rays.

    sigmas: [N, T]; rgbs: [N, T, 3]; deltas: [N, T] (step sizes);
    ts: [N, T] optional depth coordinate per sample (defaults to cumsum of
    deltas). alpha_i = 1 - exp(-sigma_i * delta_i); weights = alpha * T with
    T the exclusive transmittance product (+1e-15 like renderer.py:392).
    T_thresh>0 zeroes contributions once transmittance falls below the
    threshold (the CUDA early-stop, raymarching.cu:557 — here a mask, so the
    result is identical but shape-static).
    """
    sigmas = sigmas.astype(jnp.float32)
    deltas = deltas.astype(jnp.float32)
    alphas = 1.0 - jnp.exp(-sigmas * deltas)                       # [N, T]
    trans = exclusive_cumprod(1.0 - alphas + 1e-15, axis=-1)       # [N, T]
    weights = alphas * trans
    if T_thresh > 0.0:
        weights = jnp.where(trans > T_thresh, weights, 0.0)
    weights_sum = jnp.sum(weights, axis=-1)
    if ts is None:
        ts = jnp.cumsum(deltas, axis=-1)
    depth = jnp.sum(weights * ts.astype(jnp.float32), axis=-1)
    rgb = jnp.sum(weights[..., None] * rgbs.astype(jnp.float32), axis=-2)
    return CompositeOut(weights, weights_sum, depth, rgb)


def sample_pdf(key: Optional[jax.Array], bins: jax.Array, weights: jax.Array,
               n_samples: int, det: bool = False) -> jax.Array:
    """Inverse-CDF importance sampling of new z values
    (reference: nerf/renderer.py:15-49, the classic NeRF implementation).

    bins: [N, T] bin centers; weights: [N, T-1]; returns [N, n_samples].
    """
    weights = weights.astype(jnp.float32) + 1e-5
    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)  # [N, T]

    if det:
        u = jnp.linspace(0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        assert key is not None
        u = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,))

    inds = jax.vmap(lambda c, q: jnp.searchsorted(c, q, side="right"))(cdf, u)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)

    cdf_g0 = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_g1 = jnp.take_along_axis(cdf, above, axis=-1)
    bins_g0 = jnp.take_along_axis(bins, jnp.minimum(below, bins.shape[-1] - 1), axis=-1)
    bins_g1 = jnp.take_along_axis(bins, jnp.minimum(above, bins.shape[-1] - 1), axis=-1)

    denom = cdf_g1 - cdf_g0
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_g0) / denom
    return bins_g0 + t * (bins_g1 - bins_g0)


def near_far_from_aabb(rays_o: jax.Array, rays_d: jax.Array, aabb: jax.Array,
                       min_near: float = 0.05) -> Tuple[jax.Array, jax.Array]:
    """Vectorized slab test (reference: raymarching.cu:92-156).

    rays_o/rays_d: [..., 3]; aabb: [6] = (xmin, ymin, zmin, xmax, ymax, zmax).
    Returns (near, far) per ray with near clamped to min_near; rays that miss
    get near > far (mask = near < far, renderer.py:552).
    """
    rdir = 1.0 / jnp.where(jnp.abs(rays_d) < 1e-15,
                           jnp.where(rays_d >= 0, 1e-15, -1e-15), rays_d)
    t0 = (aabb[:3] - rays_o) * rdir
    t1 = (aabb[3:] - rays_o) * rdir
    tmin = jnp.minimum(t0, t1)
    tmax = jnp.maximum(t0, t1)
    near = jnp.max(tmin, axis=-1)
    far = jnp.min(tmax, axis=-1)
    # CUDA kernel: if far < near, far = near = 1e9 (miss); then near clamped
    miss = far < near
    near = jnp.where(miss, 1e9, near)
    far = jnp.where(miss, 1e9, far)
    near = jnp.maximum(near, min_near)
    return near, far
