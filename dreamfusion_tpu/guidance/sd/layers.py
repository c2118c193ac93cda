"""TPU-layout-friendly building blocks shared by the SD UNet and VAE.

GroupNorm is the one flax layer whose internal layout fights the TPU:
`nn.GroupNorm` reshapes activations to [..., groups, C // groups], and the
tiny trailing dim (4-40 for SD's 32-group norms) pads to the 128-lane tile
— the round-3 bench trace attributed ~7.5 ms/step of pure pad / data-
formatting kernels to flax's normalization.py at SD activation sizes.

`TPUGroupNorm` computes the identical statistics without ever materializing
a small-trailing-dim tensor at activation scale: per-CHANNEL sums reduce
over the full-lane [..., C] layout, and the group aggregation happens on
the tiny [B, C] moment vectors. Parameter-compatible with nn.GroupNorm
(scale/bias of shape [C] under the same module name), so the diffusers
state-dict converter and the layout-parity tests are unaffected.

Reference behavior being matched: torch GroupNorm in fp32 under AMP
(diffusers UNet/VAE norm layers, /root/reference/nerf/sd.py:39-46 loads
them; fp32 stats like flax's use_fast_variance one-pass E[x^2]-E[x]^2).
"""

from __future__ import annotations

import math
import os

import flax.linen as nn
import jax
import jax.numpy as jnp

# Output dtype of the normalized activations. Stats are ALWAYS f32; this
# only controls the dtype the [B,H,W,C] result is materialized in before
# the consumer (silu -> conv). "bf16" (default since r5b) halves the HBM
# bytes of every norm output at activation scale (134 MB per 512^2x128
# norm in the VAE encoder) and matches torch AMP's fp16 silu regime
# (reference trains the whole guidance under autocast, nerf/sd.py);
# measured 44.5 vs 57.5 ms for the VAE encode fwd+bwd at 512^2 (-23%,
# 69 TFLOP/s, autopilot s7b 2026-08-21). "f32" matches flax nn.GroupNorm
# bit-exactly (the oracle tests pin it).
# NOTE: read ONCE at import time — setting the env var after this module
# is imported (or mid-process) has no effect, and already-jitted programs
# never retrace on a flip. A/B runs must set it in a fresh subprocess
# (the autopilot per-stage env pattern).
GN_DTYPE = os.environ.get("DFTPU_GN_DTYPE", "bf16")


class TPUGroupNorm(nn.Module):
    num_groups: int = 32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        C = x.shape[-1]
        G = self.num_groups
        assert C % G == 0, (C, G)
        B = x.shape[0]
        red_axes = tuple(range(1, x.ndim - 1))
        n = (C // G) * math.prod(x.shape[a] for a in red_axes)

        xf = x.astype(jnp.float32)
        s1 = jnp.sum(xf, axis=red_axes)                     # [B, C]
        s2 = jnp.sum(xf * xf, axis=red_axes)                # [B, C]
        gs1 = s1.reshape(B, G, C // G).sum(-1)              # [B, G] (tiny)
        gs2 = s2.reshape(B, G, C // G).sum(-1)
        mean = gs1 / n
        var = jnp.maximum(gs2 / n - mean * mean, 0.0)
        inv = jax.lax.rsqrt(var + self.epsilon)             # [B, G]

        mean_c = jnp.repeat(mean, C // G, axis=-1)          # [B, C]
        inv_c = jnp.repeat(inv, C // G, axis=-1)
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        bshape = (B,) + (1,) * len(red_axes) + (C,)
        y = (xf - mean_c.reshape(bshape)) * inv_c.reshape(bshape)
        y = y * scale + bias            # f32, like nn.GroupNorm(dtype=f32)
        if GN_DTYPE == "bf16":
            y = y.astype(jnp.bfloat16)  # consumers cast here anyway; this
                                        # halves the materialized bytes
        return y


# ---------------------------------------------------------------------------
# attention core: einsum vs Pallas flash attention
# ---------------------------------------------------------------------------
# The einsum path materializes the [B, H, Nq, Nk] score tensor (f32 for the
# softmax): at SD's 64^2 latent that is 4096^2 x 8 heads x 4 B = 536 MB of
# HBM traffic PER self-attention layer. The stock Pallas TPU flash kernel
# (jax.experimental.pallas.ops.tpu.flash_attention) streams scores through
# VMEM blocks instead. Routed like the scatter kernels: "auto" uses flash
# on TPU for large self-attention, einsum elsewhere; DFTPU_ATTN_IMPL
# overrides for on-device A/B. bench.py's pallas_check pins compiled
# flash == einsum per TPU run (CI can only cross-lower it).
#
# Reference behavior matched: plain softmax(QK^T/sqrt(d))V (the reference
# runs diffusers' vanilla attention, nerf/sd.py:39-46); flash reorders the
# reduction only.

import os as _os

ATTN_IMPL = _os.environ.get("DFTPU_ATTN_IMPL", "auto")

# flash pays off once the score tensor dwarfs q/k/v themselves; the stock
# kernel also wants seq divisible by its 512-row q blocks
_FLASH_MIN_SEQ = 2048


def _use_flash(Nq: int, Nk: int, impl=None) -> bool:
    impl = impl or ATTN_IMPL
    if impl == "einsum":
        return False
    shape_ok = (Nq == Nk and Nq >= _FLASH_MIN_SEQ and Nq % 512 == 0)
    if impl == "flash":
        return shape_ok
    if impl != "auto":
        raise ValueError(f"unknown attention impl {impl!r}; expected "
                         "auto/einsum/flash")
    return shape_ok and jax.default_backend() == "tpu"


def attention_core(q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
                   dtype, impl=None) -> jax.Array:
    """softmax(q k^T * scale) v over [B, N, H, D] inputs -> [B, Nq, H, D].

    f32 softmax accumulation on both paths (flash accumulates f32 in VMEM;
    the einsum path casts scores to f32 explicitly)."""
    if _use_flash(q.shape[1], k.shape[1], impl):
        from jax.experimental.pallas.ops.tpu.flash_attention import \
            flash_attention

        qt, kt, vt = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
        out = flash_attention(qt, kt, vt, sm_scale=scale)
        return out.transpose(0, 2, 1, 3).astype(dtype)
    attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", attn, v)
