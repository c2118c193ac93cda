"""Density activation with truncated-gradient exponential.

`trunc_exp` is exp in the forward pass with the backward-pass input clamped
to [-15, 15] so large densities cannot produce inf gradients
(reference: activation.py:5-16). Forward is computed in float32 regardless of
the incoming dtype, matching the reference's custom_fwd(cast_inputs=float32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x: jax.Array) -> jax.Array:
    return jnp.exp(x.astype(jnp.float32))


def _trunc_exp_fwd(x):
    x32 = x.astype(jnp.float32)
    return jnp.exp(x32), x32


def _trunc_exp_bwd(x32, g):
    return (g.astype(jnp.float32) * jnp.exp(jnp.clip(x32, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


def softplus_density(raw: jax.Array, act_shift: float | jax.Array,
                     scale: float = 10.0) -> jax.Array:
    """DVGO-style density activation: softplus(raw + act_shift) * scale
    (reference: nerf/network.py:260 for the editing bridge; the DVGO trainer
    itself uses 1-exp(-softplus(d+shift)*interval), frameworks/.../dvgo_coarse.py:295).
    """
    return jax.nn.softplus(raw + act_shift) * scale
