"""OSR (outdoor scene relighting) DVGO variants.

Rebuilds frameworks/nerf/modules/osr_fine.py: a learned SH environment
`env [9, 3]`, per-point shadow prediction, density-gradient normals, and
SH irradiance shading:

- OSR_Fine     — ray-marched albedo/normal/shadow, irradiance applied to the
                 MARCHED aggregates (osr_fine.py:57-117)
- OSR_Fine_V2  — irradiance applied POINT-wise before compositing (:120-186)
- OSR_Fine_V3  — shadow-only variant: rgb stays view-dependent, a shadow
                 multiplier modulates it; shadow_bar floor (:189-326)
- OSR_Fine_V4/V5/V6 — V3 with sigmoid / partial-sigmoid / zero-init k0
                 (:329-360)
- OSR_Fine_RGI — chromaticity (r, g) + illuminance I decomposition (:363-455)
- AnnealingPosEmbedder — coarse-to-fine frequency annealing (:469-524)
- illuminate_vec — SH irradiance from a normal (:533-554)

The pure-torch differentiable grid_sample_3d the reference carries
(osr_fine.py:559) is our ops.grid_sample_3d (differentiable natively).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dreamfusion_tpu.models.decoders import get_MLP, model_dict, register_model
from dreamfusion_tpu.models.dvgo import (DVGOField, cumprod_exclusive,
                                         position_encoding, sample_ray)
from dreamfusion_tpu.models.zoo import field_registry
from dreamfusion_tpu.ops.grid_sample import grid_sample_3d


def illuminate_vec(n: jax.Array, env: jax.Array) -> jax.Array:
    """SH irradiance for normals n [..., 3] under env [9, 3]
    (osr_fine.py:533-554)."""
    c1, c2, c3, c4, c5 = 0.282095, 0.488603, 1.092548, 0.315392, 0.546274
    x, y, z = n[..., 0:1], n[..., 1:2], n[..., 2:3]
    c = env[:, None, :] if n.ndim == 2 else env.reshape(
        (9,) + (1,) * (n.ndim - 1) + (3,))
    e = env
    return (e[0] * c1 + e[1] * c2 * y + e[2] * c2 * z + e[3] * c2 * x
            + e[4] * c3 * x * y + e[5] * c3 * y * z
            + e[6] * c4 * (3 * z * z - 1) + e[7] * c3 * x * z
            + e[8] * c5 * (x * x - y * y))


def _safe_normalize(v, eps=1e-12):
    return v / jnp.sqrt(jnp.clip(jnp.sum(v * v, -1, keepdims=True), eps, None))


def _srgb_pow(x):
    """relu(x) ** (1/2.2) with a finite gradient at 0 (the reference's
    irradiance**(1/2.2), osr_fine.py:82-83, has an inf-gradient hazard there)."""
    safe = jnp.maximum(x, 1e-8)
    return jnp.where(x > 0, safe ** (1.0 / 2.2), 0.0)


class AnnealingPosEmbedder(nn.Module):
    """Coarse-to-fine positional encoding: frequency band k is weighted by
    (1 - cos(pi * clip(alpha - k, 0, 1)))/2 with alpha ramping over N_anneal
    steps (osr_fine.py:469-524, the nerfies annealing)."""
    input_dim: int = 3
    n_freqs: int = 10
    max_freq_log2: Optional[int] = None
    include_input: bool = True
    N_anneal: int = 100000
    N_anneal_min_freq: int = 0
    use_annealing: bool = True

    def __call__(self, x: jax.Array, step: jax.Array | int) -> jax.Array:
        maxf = self.max_freq_log2 if self.max_freq_log2 is not None \
            else self.n_freqs - 1
        freqs = 2.0 ** jnp.linspace(0.0, maxf, self.n_freqs)
        if self.use_annealing:
            alpha = (self.n_freqs - self.N_anneal_min_freq) * \
                jnp.asarray(step, jnp.float32) / self.N_anneal
            ks = jnp.arange(self.n_freqs, dtype=jnp.float32)
            w = (1.0 - jnp.cos(
                jnp.pi * jnp.clip(alpha - jnp.maximum(
                    ks - self.N_anneal_min_freq, 0.0), 0.0, 1.0))) / 2.0
            w = jnp.where(ks < self.N_anneal_min_freq, 1.0, w)
        else:
            w = jnp.ones(self.n_freqs)
        emb = x[..., None] * freqs                      # [..., D, F]
        parts = [jnp.sin(emb) * w, jnp.cos(emb) * w]
        out = jnp.concatenate([p.reshape(*x.shape[:-1], -1) for p in parts], -1)
        if self.include_input:
            out = jnp.concatenate([x, out], -1)
        return out


@register_model
class ShadowMLP(nn.Module):
    """rgb from k0 + a shadow head over (k0, 9 SH-gray coeffs)
    (decoders/mlps.py:79-103)."""
    in_dim: int = 0
    out_dim: int = 4
    width: int = 128
    depth: int = 3
    k0_dim: int = 6
    shadow_dim: int = 0

    @nn.compact
    def __call__(self, x):
        base = x[..., : self.k0_dim]
        h = nn.relu(nn.Dense(self.width, name="rgb_0")(base))
        for i in range(self.depth - 2):
            h = nn.relu(nn.Dense(self.width, name=f"rgb_{i + 1}")(h))
        rgb = nn.Dense(3, bias_init=nn.initializers.zeros, name="rgb_out")(h)
        sph = x[..., -9:]
        s = nn.relu(nn.Dense(self.width // 2, name="shadow_0")(
            jnp.concatenate([base, sph], -1)))
        shadow = nn.Dense(1, name="shadow_out")(s)
        return jnp.concatenate([rgb, shadow], -1)


@register_model
class SeparateShadowMLP(nn.Module):
    """Feature split (decoders/mlps.py:233-253): rgb from the first
    k0_dim - shadow_dim features; shadow from the last shadow_dim + 9
    (features + SH-gray env)."""
    in_dim: int = 0
    out_dim: int = 4
    width: int = 128
    depth: int = 3
    k0_dim: int = 12
    shadow_dim: int = 2

    @nn.compact
    def __call__(self, x):
        rgb_dim = self.k0_dim - self.shadow_dim
        h = nn.relu(nn.Dense(self.width, name="rgb_0")(x[..., :rgb_dim]))
        for i in range(self.depth - 2):
            h = nn.relu(nn.Dense(self.width, name=f"rgb_{i + 1}")(h))
        rgb = nn.Dense(3, bias_init=nn.initializers.zeros, name="rgb_out")(h)
        s = nn.relu(nn.Dense(self.width // 2, name="shadow_0")(
            x[..., -9 - self.shadow_dim:]))
        shadow = nn.Dense(1, name="shadow_out")(s)
        return jnp.concatenate([rgb, shadow], -1)


class OSR_Fine(DVGOField):
    """SH-environment relighting; irradiance applied to marched aggregates."""
    use_shadow: bool = True
    use_shadow_jitter: bool = True
    shadow_bar: float = 0.0

    def setup(self):
        super().setup()
        self.env = self.param("env", nn.initializers.normal(1.0), (9, 3))

    # rgbnet input: k0 + 9 gray-env coeffs (osr_fine.py:19-20)
    def _rgbnet_dim0(self):
        return self.k0_dim + 9

    @property
    def _osr_rgbnet_kwargs(self):
        return dict(in_dim=self._rgbnet_dim0(), out_dim=4,
                    width=self.rgbnet_width, depth=self.rgbnet_depth,
                    k0_dim=self.k0_dim)

    def query_rgb_shadow_normal(self, pts, viewdirs, key=None):
        env_gray = (self.env[:, 0] * 0.2126 + self.env[:, 1] * 0.7152
                    + self.env[:, 2] * 0.0722)
        fg_sph = jnp.broadcast_to(env_gray, pts.shape[:-1] + (9,))
        if self.use_shadow_jitter and key is not None:
            fg_sph = fg_sph + jax.random.normal(key, fg_sph.shape) * 0.01

        # normal from d(alpha)/d(position) (osr_fine.py:41-50)
        out, vjp_fn = nn.vjp(lambda mdl, p: jnp.sum(mdl.query_alpha(p)),
                             self, pts)
        _, normal = vjp_fn(jnp.ones_like(out))

        k0 = grid_sample_3d(self.k0, self.normalize(pts))
        out = self.rgbnet(jnp.concatenate([k0, fg_sph], -1))
        rgb = nn.sigmoid(out[..., :3])
        shadow = nn.sigmoid(out[..., 3:4])
        return rgb, shadow, normal

    def render(self, rays_o, rays_d, viewdirs, *, near, far, bg, n_samples,
               key=None):
        k_ray, k_jit = (jax.random.split(key) if key is not None
                        else (None, None))
        rays_pts, mask_oob = sample_ray(
            rays_o, rays_d, near=near, far=far, xyz_min=self.mins,
            xyz_max=self.maxs, voxel_size=self.voxel_size,
            stepsize=self.stepsize, n_samples=n_samples, key=k_ray)
        alpha = jnp.where(mask_oob, 0.0, self.query_alpha(rays_pts))
        alphainv_cum = cumprod_exclusive(1.0 - alpha)
        weights = alpha * alphainv_cum[..., :-1]
        vd = jnp.broadcast_to(viewdirs[:, None, :], rays_pts.shape)
        rgb_q, shadow_q, normal_q = self.query_rgb_shadow_normal(
            rays_pts, vd, key=k_jit)
        live = (weights > self.fast_color_thres)[..., None]
        rgb = jnp.where(live, rgb_q, 0.5)
        shadow = jnp.where(live, shadow_q, 1.0)
        normal = _safe_normalize(jnp.where(live, normal_q, 1.0 / jnp.sqrt(3.0)))

        rgb_albedo = jnp.sum(weights[..., None] * rgb, -2)
        normal_m = _safe_normalize(jnp.sum(weights[..., None] * normal, -2))
        shadow_m = jnp.sum(weights[..., None] * shadow, -2)

        irr = _srgb_pow(illuminate_vec(normal_m, self.env))
        bg = jnp.asarray(bg, jnp.float32)
        if self.use_shadow:
            rgb_m = irr * rgb_albedo * shadow_m + alphainv_cum[..., -1:] * bg
        else:
            rgb_m = rgb_albedo + alphainv_cum[..., -1:] * bg
        dists = jnp.linalg.norm(rays_o[:, None, :] - rays_pts, axis=-1)
        depth = jnp.sum(weights * dists, -1) + alphainv_cum[..., -1] * far
        return {"alphainv_cum": alphainv_cum, "weights": weights,
                "rgb_marched": rgb_m, "irradiance": irr,
                "shadow_marched": shadow_m, "normal_marched": normal_m,
                "raw_rgb": rgb, "raw_alpha": alpha, "depths": depth,
                "disp": 1.0 / depth, "dists": dists}


class OSR_Fine_V2(OSR_Fine):
    """Point-wise irradiance (osr_fine.py:120-186)."""

    def render(self, rays_o, rays_d, viewdirs, *, near, far, bg, n_samples,
               key=None):
        k_ray, k_jit = (jax.random.split(key) if key is not None
                        else (None, None))
        rays_pts, mask_oob = sample_ray(
            rays_o, rays_d, near=near, far=far, xyz_min=self.mins,
            xyz_max=self.maxs, voxel_size=self.voxel_size,
            stepsize=self.stepsize, n_samples=n_samples, key=k_ray)
        alpha = jnp.where(mask_oob, 0.0, self.query_alpha(rays_pts))
        alphainv_cum = cumprod_exclusive(1.0 - alpha)
        weights = alpha * alphainv_cum[..., :-1]
        vd = jnp.broadcast_to(viewdirs[:, None, :], rays_pts.shape)
        rgb_q, shadow_q, normal_q = self.query_rgb_shadow_normal(
            rays_pts, vd, key=k_jit)
        normal_q = _safe_normalize(normal_q)
        if self.use_shadow:
            irr = _srgb_pow(illuminate_vec(normal_q, self.env))
            rgb_q = irr * rgb_q * shadow_q
        live = (weights > self.fast_color_thres)[..., None]
        rgb = jnp.where(live, rgb_q, 0.5)
        bg = jnp.asarray(bg, jnp.float32)
        rgb_m = jnp.sum(weights[..., None] * rgb, -2) + alphainv_cum[..., -1:] * bg
        dists = jnp.linalg.norm(rays_o[:, None, :] - rays_pts, axis=-1)
        depth = jnp.sum(weights * dists, -1) + alphainv_cum[..., -1] * far
        normal_m = _safe_normalize(jnp.sum(weights[..., None] * normal_q, -2))
        shadow_m = jnp.sum(weights[..., None] * jnp.where(live, shadow_q, 1.0), -2)
        return {"alphainv_cum": alphainv_cum, "weights": weights,
                "rgb_marched": rgb_m, "shadow_marched": shadow_m,
                "normal_marched": normal_m, "raw_rgb": rgb,
                "raw_alpha": alpha, "depths": depth, "disp": 1.0 / depth,
                "dists": dists}


class OSR_Fine_V3(DVGOField):
    """Shadow-only: view-dependent rgb times a floored shadow multiplier
    (osr_fine.py:189-326)."""
    use_shadow: bool = True
    shadow_bar: float = 0.2

    def query_k0(self, pts):
        return grid_sample_3d(self.k0, self.normalize(pts))

    def query_rgb_shadow(self, pts, viewdirs):
        feats = [self.query_k0(pts)]
        if self.posbase_pe:
            freqs = jnp.exp2(jnp.arange(self.posbase_pe, dtype=jnp.float32))
            feats.append(position_encoding(self.normalize(pts), freqs))
        if self.viewbase_pe:
            freqs = jnp.exp2(jnp.arange(self.viewbase_pe, dtype=jnp.float32))
            feats.append(position_encoding(viewdirs, freqs))
        out = self.rgbnet(jnp.concatenate(feats, -1))
        rgb = nn.sigmoid(out[..., :3])
        shadow = nn.sigmoid(out[..., 3:4])
        if self.use_shadow:
            shadow = self.shadow_bar + (1.0 - self.shadow_bar) * shadow
        else:
            shadow = jnp.ones_like(shadow)
        return rgb, shadow

    def setup(self):
        X, Y, Z = self.world_size
        self.density = self.param("density", nn.initializers.normal(1.0),
                                  (1, X, Y, Z))
        self.k0 = self.param("k0", self._k0_init(), (self.k0_dim, X, Y, Z))
        dim0 = self.k0_dim
        if self.posbase_pe:
            dim0 += 3 + 3 * self.posbase_pe * 2
        if self.viewbase_pe:
            dim0 += 3 + 3 * self.viewbase_pe * 2
        self.rgbnet = get_MLP(self.rgbnet_name or "basicmlp", in_dim=dim0,
                              out_dim=4, width=self.rgbnet_width,
                              depth=self.rgbnet_depth, k0_dim=self.k0_dim)

    def _k0_init(self):
        return nn.initializers.normal(1.0)

    def render(self, rays_o, rays_d, viewdirs, *, near, far, bg, n_samples,
               key=None):
        k_ray = key
        rays_pts, mask_oob = sample_ray(
            rays_o, rays_d, near=near, far=far, xyz_min=self.mins,
            xyz_max=self.maxs, voxel_size=self.voxel_size,
            stepsize=self.stepsize, n_samples=n_samples, key=k_ray)
        alpha = jnp.where(mask_oob, 0.0, self.query_alpha(rays_pts))
        alphainv_cum = cumprod_exclusive(1.0 - alpha)
        weights = alpha * alphainv_cum[..., :-1]
        vd = jnp.broadcast_to(viewdirs[:, None, :], rays_pts.shape)
        rgb_q, shadow_q = self.query_rgb_shadow(rays_pts, vd)
        live = (weights > self.fast_color_thres)[..., None]
        rgb = jnp.where(live, rgb_q, 0.5)
        shadow = jnp.where(live, shadow_q, 1.0)
        bg = jnp.clip(jnp.asarray(bg, jnp.float32), 0, 1)
        rgb_m = jnp.sum(weights[..., None] * rgb * shadow, -2) \
            + alphainv_cum[..., -1:] * bg
        dists = jnp.linalg.norm(rays_o[:, None, :] - rays_pts, axis=-1)
        depth = jnp.sum(weights * dists, -1) + alphainv_cum[..., -1] * far
        return {"alphainv_cum": alphainv_cum, "weights": weights,
                "rgb_marched": rgb_m, "raw_alpha": alpha, "raw_rgb": rgb,
                "raw_shadow": shadow, "depths": depth, "disp": 1.0 / depth,
                "dists": dists}


class OSR_Fine_V4(OSR_Fine_V3):
    """sigmoid k0 features (osr_fine.py:329-337)."""

    def query_k0(self, pts):
        return nn.sigmoid(grid_sample_3d(self.k0, self.normalize(pts)))


class OSR_Fine_V5(OSR_Fine_V4):
    """V4 with the metric loss restricted to color features (osr_fine.py:340-348);
    the field itself matches V4."""


class OSR_Fine_V6(OSR_Fine_V4):
    """zero-initialized k0 (osr_fine.py:352-359)."""

    def _k0_init(self):
        return nn.initializers.zeros


class OSR_Fine_RGI(OSR_Fine_V3):
    """Chromaticity decomposition: R = r*I*3, G = g*I*3, B = (1-r-g)*I*3
    (osr_fine.py:363-455)."""
    base_illuminance: float = 0.5

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
                              out_dim=3, width=self.rgbnet_width,
                              depth=self.rgbnet_depth, k0_dim=self.k0_dim)

    def query_k0(self, pts):
        return nn.sigmoid(grid_sample_3d(self.k0, self.normalize(pts)))

    def render(self, rays_o, rays_d, viewdirs, *, near, far, bg, n_samples,
               key=None):
        rays_pts, mask_oob = sample_ray(
            rays_o, rays_d, near=near, far=far, xyz_min=self.mins,
            xyz_max=self.maxs, voxel_size=self.voxel_size,
            stepsize=self.stepsize, n_samples=n_samples, key=key)
        alpha = jnp.where(mask_oob, 0.0, self.query_alpha(rays_pts))
        alphainv_cum = cumprod_exclusive(1.0 - alpha)
        weights = alpha * alphainv_cum[..., :-1]
        vd = jnp.broadcast_to(viewdirs[:, None, :], rays_pts.shape)

        feats = [self.query_k0(rays_pts)]
        if self.posbase_pe:
            freqs = jnp.exp2(jnp.arange(self.posbase_pe, dtype=jnp.float32))
            feats.append(position_encoding(self.normalize(rays_pts), freqs))
        if self.viewbase_pe:
            freqs = jnp.exp2(jnp.arange(self.viewbase_pe, dtype=jnp.float32))
            feats.append(position_encoding(vd, freqs))
        out = self.rgbnet(jnp.concatenate(feats, -1))
        rg = out[..., :2]
        illum = jnp.clip(out[..., 2:3], 0.0, 1.0) * (1.0 - self.shadow_bar) \
            + self.shadow_bar
        live = weights > self.fast_color_thres
        rg = jnp.where(live[..., None], rg, 0.0)
        illum = jnp.where(live[..., None], illum, 0.0)

        illum = jnp.clip(illum + 0.5, 0.0, None)
        rg = rg + jnp.clip(rg + 1.0 / 3.0, 0.0, None)
        rgb = jnp.concatenate([
            rg[..., 0:1] * illum * 3.0,
            rg[..., 1:2] * illum * 3.0,
            jnp.clip(1.0 - rg[..., 0:1] - rg[..., 1:2], 0.0, None) * illum * 3.0,
        ], -1)
        bg = jnp.clip(jnp.asarray(bg, jnp.float32), 0, 1)
        rgb_m = jnp.sum(weights[..., None] * rgb, -2) + alphainv_cum[..., -1:] * bg
        dists = jnp.linalg.norm(rays_o[:, None, :] - rays_pts, axis=-1)
        depth = jnp.sum(weights * dists, -1) + alphainv_cum[..., -1] * far
        return {"alphainv_cum": alphainv_cum, "weights": weights,
                "rgb_marched": rgb_m, "raw_alpha": alpha, "raw_rg": rg,
                "raw_shadow": illum, "depths": depth, "disp": 1.0 / depth,
                "dists": dists}


field_registry.update({
    "osr_fine": OSR_Fine,
    "osr_v2_fine": OSR_Fine_V2,
    "osr_v3_fine": OSR_Fine_V3,
    "osr_v4_fine": OSR_Fine_V4,
    "osr_v5_fine": OSR_Fine_V5,
    "osr_v6_fine": OSR_Fine_V6,
    "osr_rgi_fine": OSR_Fine_RGI,
})
