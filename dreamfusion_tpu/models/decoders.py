"""Registered MLP decoders for the DVGO family.

Rebuilds frameworks/nerf/decoders/mlps.py: a string registry of color/shadow
decoder MLPs. Core variants here (ResMLP, BasicMLP/MLP, DVP_MLP, LIIF_MLP);
the ShadowMLP family ships with the OSR relighting models (models/osr.py).
"""

from __future__ import annotations

from typing import Callable, Dict

import flax.linen as nn
import jax.numpy as jnp

model_dict: Dict[str, Callable] = {}


def register_model(cls):
    key = cls.__name__.lower()
    if key in model_dict and model_dict[key] is not cls:
        raise KeyError(f"duplicated decoder key {key}")
    model_dict[key] = cls
    return cls


def get_MLP(model_name: str, **kwargs):
    """(reference: decoders/mlps.py:19-20)"""
    return model_dict[model_name.lower()](**kwargs)


class Res1D(nn.Module):
    width: int

    @nn.compact
    def __call__(self, x):
        return nn.relu(nn.Dense(self.width, name="net")(x)) + x


@register_model
class ResMLP(nn.Module):
    """Linear-ReLU + (depth-2) residual blocks + Linear, zero-init final bias
    (reference: decoders/mlps.py:36-51)."""
    in_dim: int = 0
    out_dim: int = 3
    width: int = 128
    depth: int = 3
    k0_dim: int = 0

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Dense(self.width, name="dense_in")(x))
        for i in range(self.depth - 2):
            h = Res1D(self.width, name=f"res_{i}")(h)
        return nn.Dense(self.out_dim, bias_init=nn.initializers.zeros,
                        name="dense_out")(h)


@register_model
class BasicMLP(nn.Module):
    """Plain ReLU MLP, zero-init final bias (reference: mlps.py:59-73)."""
    in_dim: int = 0
    out_dim: int = 3
    width: int = 128
    depth: int = 3
    k0_dim: int = 0

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Dense(self.width, name="dense_0")(x))
        for i in range(self.depth - 2):
            h = nn.relu(nn.Dense(self.width, name=f"dense_{i + 1}")(h))
        return nn.Dense(self.out_dim, bias_init=nn.initializers.zeros,
                        name="dense_out")(h)


# 'mlp' aliases BasicMLP (reference: mlps.py:54-56)
model_dict["mlp"] = BasicMLP


def _mlp_stack(x, width, depth, out, name, zero_bias=True):
    """Helper: Linear-ReLU x (depth-1) + Linear(out)."""
    h = x
    for i in range(depth - 1):
        h = nn.relu(nn.Dense(width, name=f"{name}_{i}")(h))
    bias_init = nn.initializers.zeros if zero_bias else nn.initializers.zeros
    return nn.Dense(out, bias_init=bias_init, name=f"{name}_out")(h)


@register_model
class DirectShadowMLP(nn.Module):
    """rgb from the first k0_dim-1 features; shadow read DIRECTLY from the
    last feature channel (mlps.py:101-113)."""
    in_dim: int = 0
    out_dim: int = 4
    width: int = 128
    depth: int = 3
    k0_dim: int = 6

    @nn.compact
    def __call__(self, x):
        kd = self.k0_dim - 1
        rgb = _mlp_stack(x[..., :kd], self.width, self.depth, 3, "rgb")
        shadow = x[..., kd:kd + 1]
        return jnp.concatenate([rgb, shadow], -1)


@register_model
class ShadowV3MLP(nn.Module):
    """rgb from features after the shadow slice; shadow = Linear(first
    shadow_dim features) (mlps.py:116-128)."""
    in_dim: int = 0
    out_dim: int = 4
    width: int = 128
    depth: int = 3
    k0_dim: int = 6
    shadow_dim: int = 1

    @nn.compact
    def __call__(self, x):
        rgb = _mlp_stack(x[..., self.shadow_dim:], self.width, self.depth, 3, "rgb")
        shadow = nn.Dense(1, bias_init=nn.initializers.zeros,
                          name="shadowNet")(x[..., : self.shadow_dim])
        return jnp.concatenate([rgb, shadow], -1)


@register_model
class ShadowV4MLP(nn.Module):
    """V3 with a 2x64 MLP shadow head (mlps.py:131-143)."""
    in_dim: int = 0
    out_dim: int = 4
    width: int = 128
    depth: int = 3
    k0_dim: int = 6
    shadow_dim: int = 1

    @nn.compact
    def __call__(self, x):
        rgb = _mlp_stack(x[..., self.shadow_dim:], self.width, self.depth, 3, "rgb")
        s = nn.relu(nn.Dense(64, name="shadow_0")(x[..., : self.shadow_dim]))
        s = nn.relu(nn.Dense(64, name="shadow_1")(s))
        shadow = nn.Dense(1, bias_init=nn.initializers.zeros,
                          name="shadow_out")(s)
        return jnp.concatenate([rgb, shadow], -1)


@register_model
class ShadowV5MLP(nn.Module):
    """View-dependent shadow: rgb from features [shadow_dim:k0_dim]; shadow
    MLP over (shadow features, encodings beyond k0) (mlps.py:147-169)."""
    in_dim: int = 0
    out_dim: int = 4
    width: int = 128
    depth: int = 3
    k0_dim: int = 6
    shadow_dim: int = 1

    @nn.compact
    def __call__(self, x):
        rgb = _mlp_stack(x[..., self.shadow_dim: self.k0_dim], self.width,
                         self.depth, 3, "rgb")
        sfeat = jnp.concatenate([x[..., : self.shadow_dim],
                                 x[..., self.k0_dim:]], -1)
        shadow = _mlp_stack(sfeat, self.width, self.depth, 1, "shadow")
        return jnp.concatenate([rgb, shadow], -1)


@register_model
class RobustShadowMLP(nn.Module):
    """V5 with train-time noise-ensemble averaging on the rgb features
    (mlps.py:172-202). Pass noise_key to enable the ensemble."""
    in_dim: int = 0
    out_dim: int = 4
    width: int = 128
    depth: int = 3
    k0_dim: int = 6
    shadow_dim: int = 1
    ensemble: int = 2
    noise_beta: float = 0.1

    @nn.compact
    def __call__(self, x, noise_key=None):
        sfeat = jnp.concatenate([x[..., : self.shadow_dim],
                                 x[..., self.k0_dim:]], -1)
        shadow = _mlp_stack(sfeat, self.width, self.depth, 1, "shadow")
        rgb_inp = x[..., self.shadow_dim: self.k0_dim]

        layers = [nn.Dense(self.width, name=f"rgb_{i}")
                  for i in range(self.depth - 1)]
        out_layer = nn.Dense(3, bias_init=nn.initializers.zeros, name="rgb_out")

        def rgb_net(h):  # shared weights across ensemble calls
            for l in layers:
                h = nn.relu(l(h))
            return out_layer(h)

        if noise_key is not None:
            import jax

            keys = jax.random.split(noise_key, self.ensemble)
            outs = [rgb_net(rgb_inp + jax.random.normal(k, rgb_inp.shape)
                            * self.noise_beta) for k in keys]
            rgb = sum(outs) / self.ensemble
        else:
            rgb = rgb_net(rgb_inp)
        return jnp.concatenate([rgb, shadow], -1)


@register_model
class ShadowRGIMLP(nn.Module):
    """(r, g) chromaticity head + luminance head (mlps.py:205-230)."""
    in_dim: int = 0
    out_dim: int = 3
    width: int = 128
    depth: int = 3
    k0_dim: int = 6
    shadow_dim: int = 1

    @nn.compact
    def __call__(self, x):
        rg = _mlp_stack(x[..., self.shadow_dim: self.k0_dim], self.width,
                        self.depth, 2, "rg")
        sfeat = jnp.concatenate([x[..., : self.shadow_dim],
                                 x[..., self.k0_dim:]], -1)
        lum = _mlp_stack(sfeat, self.width, self.depth, 1, "lum")
        return jnp.concatenate([rg, lum], -1)


@register_model
class DVP_MLP(nn.Module):
    """BasicMLP with a 2-layer mapping network on the k0 features
    (mlps.py:256-269)."""
    in_dim: int = 0
    out_dim: int = 3
    width: int = 128
    depth: int = 3
    k0_dim: int = 0

    @nn.compact
    def __call__(self, x):
        k0 = x[..., : self.k0_dim]
        k0 = nn.relu(nn.Dense(self.k0_dim, name="map_0")(k0))
        k0 = nn.Dense(self.k0_dim, name="map_1")(k0)
        h = jnp.concatenate([k0, x[..., self.k0_dim:]], -1)
        return _mlp_stack(h, self.width, self.depth, self.out_dim, "net")


@register_model
class RobustMLP(nn.Module):
    """BasicMLP with clamped features + train-time noise-ensemble averaging
    (mlps.py:272-292). Pass noise_key to enable the ensemble."""
    in_dim: int = 0
    out_dim: int = 3
    width: int = 128
    depth: int = 3
    k0_dim: int = 0
    ensemble: int = 2
    noise_beta: float = 0.1

    @nn.compact
    def __call__(self, x, noise_key=None):
        x = jnp.concatenate([jnp.clip(x[..., : self.k0_dim], -1, 1),
                             x[..., self.k0_dim:]], -1)

        layers = [nn.Dense(self.width, name=f"net_{i}")
                  for i in range(self.depth - 1)]
        out_layer = nn.Dense(self.out_dim, bias_init=nn.initializers.zeros,
                             name="net_out")

        def net(h):  # shared weights across ensemble calls
            for l in layers:
                h = nn.relu(l(h))
            return out_layer(h)

        if noise_key is not None:
            import jax

            keys = jax.random.split(noise_key, self.ensemble)
            outs = []
            for k in keys:
                noise = jnp.concatenate(
                    [jax.random.normal(k, x[..., : self.k0_dim].shape)
                     * self.noise_beta,
                     jnp.zeros_like(x[..., self.k0_dim:])], -1)
                outs.append(net(x + noise))
            return sum(outs) / self.ensemble
        return net(x)


@register_model
class LIIF_MLP(nn.Module):
    """Joint (color, density) LIIF decoder: a view-independent trunk whose
    last hidden unit is the density, plus a view-conditioned color head
    (mlps.py:296-316)."""
    in_dim: int = 0
    out_dim: int = 4
    width: int = 128
    depth: int = 3
    viewdir_dim: int = 0
    k0_dim: int = 0

    @nn.compact
    def __call__(self, x):
        emb = x[..., : -self.viewdir_dim]
        view = x[..., -self.viewdir_dim:]
        h = nn.relu(nn.Dense(self.width, name="net1_0")(emb))
        for i in range(self.depth - 3):
            h = nn.relu(nn.Dense(self.width, name=f"net1_{i + 1}")(h))
        density = h[..., -1:]
        c = nn.relu(nn.Dense(self.width, name="net2_0")(
            jnp.concatenate([h, view], -1)))
        color = nn.Dense(self.out_dim - 1, bias_init=nn.initializers.zeros,
                         name="net2_out")(c)
        return jnp.concatenate([color, density], -1)
