"""Differentiable trilinear 3-D grid sampling (align_corners=True).

Replaces torch F.grid_sample as used by DVGO's `grid_sampler`
(frameworks/nerf/modules/dvgo_coarse.py:67-73) and the pure-torch
`grid_sample_3d` the editing bridge monkey-patches in for gradient support
(frameworks/nerf/modules/osr_fine.py:559, nerf/network.py:232-233).
JAX autodiff gives both the input-coordinate gradient and the scatter-add
grid gradient for free (deterministic on TPU).

Convention: `grid_sample_3d(grid [C, X, Y, Z], xyz01 [..., 3]) -> [..., C]`
with xyz01[..., i] in [0, 1] indexing axis i at positions xyz01 * (S_i - 1)
(align_corners=True). This composes with DVGO's coordinate normalization
((xyz - xyz_min) / (xyz_max - xyz_min)); the torch code's `.flip(-1)` exists
only to match torch's (W, H, D) grid_sample axis order and is not needed.

Out-of-range coordinates clamp to the border (torch padding_mode='zeros'
differs outside, but DVGO always masks out-of-bbox points before sampling).

TPU layout: batch stays in the lane dimension ([8, B] corner arrays,
per-channel 1-D gathers) — see ops/grid_encoder.py for why.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def _trilerp(flatT: jax.Array, idx8: jax.Array, w8: jax.Array) -> jax.Array:
    """sum_k w8[k] * flatT[idx8[k]] -> [B, C]. flatT [XYZ, C]; idx8/w8 [8, B].

    Custom VJP for the same two TPU reasons as the hash encoder
    (ops/grid_encoder.py): row gathers beat 1-D takes, and autodiff would
    save lane-padded [8, B, C] residuals. Backward = one deterministic
    scatter-add; no gradient to positions (set differentiable=True on
    grid_sample_3d if d/dx is needed — OSR normals use it)."""
    vals = jnp.take(flatT, idx8, axis=0)                  # [8, B, C]
    return jnp.einsum("kb,kbc->bc", w8, vals.astype(jnp.float32))


def _trilerp_fwd(flatT, idx8, w8):
    return _trilerp(flatT, idx8, w8), (flatT, idx8, w8)


def _trilerp_bwd(res, cot):
    flatT, idx8, w8 = res
    upd = w8[..., None] * cot[None, :, :]
    d = jnp.zeros(flatT.shape, jnp.float32).at[idx8].add(upd)
    return (d.astype(flatT.dtype), jnp.zeros_like(idx8), jnp.zeros_like(w8))


_trilerp.defvjp(_trilerp_fwd, _trilerp_bwd)


def grid_sample_3d(grid: jax.Array, xyz01: jax.Array,
                   differentiable: bool = True) -> jax.Array:
    """grid: [C, X, Y, Z]; xyz01: [..., 3] in [0,1] -> [..., C].

    differentiable=True (default) keeps d(out)/d(xyz01) — required by the
    OSR density-gradient normals and the editing bridge's autograd normal.
    differentiable=False routes through the scatter-optimized custom VJP
    (grid grads only) for hot training loops.
    """
    C, X, Y, Z = grid.shape
    prefix = xyz01.shape[:-1]
    x = xyz01.reshape(-1, 3).astype(jnp.float32).T          # [3, B]
    sizes = (X, Y, Z)

    pos = x * (jnp.array(sizes, jnp.float32)[:, None] - 1.0)  # [3, B]
    pos = jnp.clip(pos, 0.0, jnp.array(sizes, jnp.float32)[:, None] - 1.0)
    p0 = jnp.floor(pos)
    frac = pos - p0                                           # [3, B]
    p0 = p0.astype(jnp.int32)

    strides = jnp.array([Y * Z, Z, 1], jnp.int32)[:, None]    # [3, 1]

    idx_corners = []
    w_corners = []
    for corner in range(8):
        w = jnp.ones_like(frac[0])
        cc = []
        for d in range(3):
            if (corner >> d) & 1:
                w = w * frac[d]
                cc.append(jnp.minimum(p0[d] + 1, sizes[d] - 1))
            else:
                w = w * (1.0 - frac[d])
                cc.append(p0[d])
        coords = jnp.stack(cc)                                 # [3, B]
        idx_corners.append(jnp.sum(coords * strides, axis=0))  # [B]
        w_corners.append(w)
    idx8 = jnp.stack(idx_corners)                              # [8, B]
    w8 = jnp.stack(w_corners)                                  # [8, B]

    flatT = grid.reshape(C, -1).T                              # [XYZ, C]
    if differentiable:
        vals = jnp.take(flatT, idx8, axis=0)                   # [8, B, C]
        out = jnp.einsum("kb,kbc->bc", w8, vals.astype(jnp.float32))
    else:
        out = _trilerp(flatT, idx8, w8)
    return out.reshape(*prefix, C)


def resize_grid_trilinear(grid: jax.Array, new_size) -> jax.Array:
    """Trilinear re-interpolation of a [C, X, Y, Z] grid to new (X', Y', Z'),
    align_corners=True — DVGO's progressive grid scaling
    (frameworks/nerf/modules/dvgo_fine.py:35-42)."""
    nx, ny, nz = new_size
    lx = jnp.linspace(0.0, 1.0, nx)
    ly = jnp.linspace(0.0, 1.0, ny)
    lz = jnp.linspace(0.0, 1.0, nz)
    gx, gy, gz = jnp.meshgrid(lx, ly, lz, indexing="ij")
    pts = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
    out = grid_sample_3d(grid, pts)                            # [nx*ny*nz, C]
    return out.T.reshape(grid.shape[0], nx, ny, nz)


def max_pool_3d(grid: jax.Array, ks: int = 3) -> jax.Array:
    """SAME-padded max-pool (stride 1) over the spatial dims of [C, X, Y, Z]
    (MaskCache's F.max_pool3d, frameworks/nerf/modules/utils.py:22)."""
    return jax.lax.reduce_window(
        grid, -jnp.inf, jax.lax.max,
        window_dimensions=(1, ks, ks, ks),
        window_strides=(1, 1, 1, 1),
        padding=[(0, 0)] + [(ks // 2, ks // 2)] * 3)
