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


class _MLPAlias(BasicMLP):
    pass


# 'mlp' aliases BasicMLP (reference: mlps.py:54-56)
model_dict["mlp"] = BasicMLP
