"""DVGO model-zoo variants (reference: frameworks/nerf/modules/*_fine.py).

- DVGO_Plus   (dvp_fine.py):  sigmoid-activated k0 features
- NeRFWoNN    (nwnn_fine.py): Plenoxels-style SH color, no color MLP
- FFL         (ffl_fine.py):  LIIF-style per-corner MLP predictions blended
  by trilinear weights; predicts (rgb, local alpha multiplier)
- FastFFL     (fastffl_fine.py): stochastic single-corner LIIF via
  inverse-CDF choice over the trilinear weights
- DVGO360     (dvgo360_coarse.py): unbounded scenes via world<->contracted
  coordinate mapping x -> center + sgn * r (1 + bg_dis - bg_dis/|x_hat|)

All are DVGOField subclasses sharing its renderer/trainer/pipeline; the
registry mirrors modules/__init__.py:12-43.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dreamfusion_tpu.models.decoders import get_MLP, model_dict, register_model
from dreamfusion_tpu.models.dvgo import (DVGOField, cumprod_exclusive,
                                         position_encoding)
from dreamfusion_tpu.ops.encoders import sh_encode
from dreamfusion_tpu.ops.grid_sample import grid_sample_3d


class DVGO_Plus(DVGOField):
    """k0 passed through sigmoid before the rgbnet (dvp_fine.py:12-23)."""

    def query_rgb(self, pts, viewdirs):
        k0 = nn.sigmoid(grid_sample_3d(self.k0, self.normalize(pts)))
        feats = [k0]
        if self.posbase_pe:
            freqs = jnp.exp2(jnp.arange(self.posbase_pe, dtype=jnp.float32))
            feats.append(position_encoding(self.normalize(pts), freqs))
        if self.viewbase_pe:
            freqs = jnp.exp2(jnp.arange(self.viewbase_pe, dtype=jnp.float32))
            feats.append(position_encoding(viewdirs, freqs))
        return nn.sigmoid(self.rgbnet(jnp.concatenate(feats, -1)))


class NeRFWoNN(DVGOField):
    """Plenoxels-style SH colors: k0 holds 3*deg^2 SH coefficients; color =
    sigmoid(sum_l sh_l(view) * k0_l) (nwnn_fine.py:10-33). Our sh_encode
    matches the svox2 table (tested)."""

    def setup(self):
        assert self.k0_dim % 3 == 0 and int(math.isqrt(self.k0_dim // 3)) ** 2 \
            == self.k0_dim // 3, "k0_dim must be 3 * degree^2"
        super().setup()

    def query_rgb(self, pts, viewdirs):
        n_sh = self.k0_dim // 3
        degree = int(math.isqrt(n_sh))
        k0 = grid_sample_3d(self.k0, self.normalize(pts))  # [..., 3*n_sh]
        vd = viewdirs / jnp.linalg.norm(viewdirs, axis=-1, keepdims=True)
        sh = sh_encode(vd, degree=degree)                  # [..., n_sh]
        coeffs = k0.reshape(*k0.shape[:-1], 3, n_sh)
        return nn.sigmoid(jnp.sum(sh[..., None, :] * coeffs, -1))


# corner offsets, ordered so that flipping the trilinear weight order pairs
# corner i with weight of corner 7-i (ffl_fine.py:65-74)
_CELL_BASE = np.array([[0, 0, 1], [0, 0, 0], [0, 1, 1], [0, 1, 0],
                       [1, 0, 1], [1, 0, 0], [1, 1, 1], [1, 1, 0]], np.float32)


class FFL(DVGOField):
    """LIIF field: the rgbnet predicts (rgb, alpha multiplier) at each of the
    8 surrounding voxel corners from (corner k0, relative position PE, view
    PE); predictions blend by trilinear weights (ffl_fine.py:8-56)."""
    alpha_thres: float = 1e-4

    def setup(self):
        X, Y, Z = self.world_size
        self.density = self.param("density", nn.initializers.normal(1.0),
                                  (1, X, Y, Z))
        self.k0 = self.param("k0", nn.initializers.normal(1.0),
                             (self.k0_dim, X, Y, Z))
        dim0 = self.k0_dim
        if self.posbase_pe:
            dim0 += 3 + 3 * self.posbase_pe * 2
        if self.viewbase_pe:
            dim0 += 3 + 3 * self.viewbase_pe * 2
        self.rgbnet = get_MLP(self.rgbnet_name or "basicmlp", in_dim=dim0,
                              out_dim=4, width=self.rgbnet_width,
                              depth=self.rgbnet_depth, k0_dim=self.k0_dim)

    @property
    def voxel_size_each(self):
        return (self.maxs - self.mins) / (jnp.array(self.world_size) - 1.0)

    def _liif_features(self, rays_pts, viewdirs):
        """-> (pred [..., 8, 4], weights [..., 8]) at the 8 corners."""
        vse = self.voxel_size_each
        rel0 = rays_pts - self.mins
        cell = jnp.floor(rel0 / vse)
        cell = jnp.minimum(cell, jnp.array(self.world_size, jnp.float32) - 2.0)
        cell = jnp.maximum(cell, 0.0)
        cells = cell[..., None, :] + _CELL_BASE                     # [..., 8, 3]
        relatives = rel0[..., None, :] - cells * vse                # [..., 8, 3]
        w = jnp.abs(jnp.prod(relatives, -1))[..., ::-1] / jnp.prod(vse)

        idx = cells.astype(jnp.int32)
        X, Y, Z = self.world_size
        flat = self.k0.reshape(self.k0_dim, -1)
        lin = (idx[..., 0] * Y + idx[..., 1]) * Z + idx[..., 2]     # [..., 8]
        k0s = jnp.stack([jnp.take(flat[c], lin, axis=0)
                         for c in range(self.k0_dim)], axis=-1)     # [..., 8, C]

        feats = [k0s]
        if self.posbase_pe:
            freqs = jnp.exp2(jnp.arange(self.posbase_pe, dtype=jnp.float32))
            feats.append(position_encoding(relatives, freqs))
        if self.viewbase_pe:
            freqs = jnp.exp2(jnp.arange(self.viewbase_pe, dtype=jnp.float32))
            vd = jnp.broadcast_to(viewdirs[..., None, :], relatives.shape)
            feats.append(position_encoding(vd, freqs))
        pred = self.rgbnet(jnp.concatenate(feats, -1))              # [..., 8, 4]
        return pred, w

    def _blend(self, pred, w):
        rgb = jnp.sum(nn.sigmoid(pred[..., :3]) * w[..., None], -2)
        alpha_mul = jnp.sum(nn.sigmoid(pred[..., 3]) * w, -1)
        return rgb, alpha_mul

    def _render_core(self, rays_pts, mask_oob, viewdirs, noise_key):
        alpha_vox = jnp.where(mask_oob, 0.0,
                              self.query_alpha(rays_pts, noise_key=noise_key))
        vd = jnp.broadcast_to(viewdirs[:, None, :], rays_pts.shape)
        pred, w = self._liif_features(rays_pts, vd)
        rgb, alpha_mul = self._blend(pred, w)
        live = alpha_vox > self.alpha_thres
        alpha = jnp.where(live, alpha_vox * alpha_mul, 0.0)
        rgb = jnp.where(live[..., None], rgb, 0.0)
        return alpha, rgb


class FastFFL(FFL):
    """Stochastic single-corner LIIF: choose ONE corner per query point by
    inverse-CDF sampling of the trilinear weights (fastffl_fine.py:9-40).
    Needs the render noise key; falls back to expected blending when no key
    is given (eval)."""

    def _render_core(self, rays_pts, mask_oob, viewdirs, noise_key):
        if noise_key is None:
            return super()._render_core(rays_pts, mask_oob, viewdirs, None)
        alpha_vox = jnp.where(mask_oob, 0.0, self.query_alpha(rays_pts))
        vd = jnp.broadcast_to(viewdirs[:, None, :], rays_pts.shape)
        pred, w = self._liif_features(rays_pts, vd)                  # [...,8,*]
        cdf = jnp.cumsum(w, -1) + 1e-3
        u = jax.random.uniform(noise_key, w.shape[:-1] + (1,))
        choice = jnp.sum((cdf < u).astype(jnp.int32), -1)            # [...]
        choice = jnp.clip(choice, 0, 7)
        picked = jnp.take_along_axis(
            pred, choice[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
        rgb = nn.sigmoid(picked[..., :3])
        alpha_mul = nn.sigmoid(picked[..., 3])
        live = alpha_vox > self.alpha_thres
        return (jnp.where(live, alpha_vox * alpha_mul, 0.0),
                jnp.where(live[..., None], rgb, 0.0))


class DVGO360(DVGOField):
    """Unbounded scenes via contracted coordinates (dvgo360_coarse.py:35-63).
    The grid covers the contracted space scaled by (1 + bg_dis)."""
    bg_dis: float = 0.2

    def _center_r(self):
        return (self.mins + self.maxs) / 2.0, (self.maxs - self.mins) / 2.0

    def world_to_contract(self, xyz):
        # per-COORDINATE contraction (dvgo360_coarse.py:35-42: the inner mask
        # is elementwise)
        center, r = self._center_r()
        inner = (xyz >= self.mins) & (xyz <= self.maxs)
        rel = (xyz - center) / r
        a = jnp.maximum(jnp.abs(rel), 1e-9)
        contracted = center + r * (1.0 + self.bg_dis - self.bg_dis / a) \
            * jnp.sign(rel)
        return jnp.where(inner, xyz, contracted)

    def contract_to_world(self, xyz):
        center, r = self._center_r()
        inner = (xyz >= self.mins) & (xyz <= self.maxs)
        rel = (xyz - center) / r
        world = center + r * jnp.sign(rel) * (
            self.bg_dis / jnp.maximum(1.0 + self.bg_dis - jnp.abs(rel), 1e-9))
        return jnp.where(inner, xyz, world)

    def normalize(self, pts):
        """contracted coords -> [0,1] over the expanded grid extent
        (dvgo360_coarse.py grid_sampler maps by r*(1+bg_dis))."""
        c = self.world_to_contract(pts)
        center, r = self._center_r()
        return (c - center) / (2.0 * r * (1.0 + self.bg_dis)) + 0.5


# registry (modules/__init__.py:12-30); OSR variants register on import of
# models/osr.py
field_registry = {
    "dvgo_coarse": DVGOField,
    "dvgo_fine": DVGOField,
    "dvp_fine": DVGO_Plus,
    "nwnn_fine": NeRFWoNN,
    "ffl_fine": FFL,
    "fastffl_fine": FastFFL,
    "dvgo360_coarse": DVGO360,
    "dvgo360_fine": DVGO360,
}


def get_field(name: str, **kwargs) -> DVGOField:
    if name.startswith("osr"):
        from dreamfusion_tpu.models import osr  # registers OSR variants

    return field_registry[name](**kwargs)
