"""UNet2DCondition (Stable Diffusion v1.x geometry) in flax.linen, NHWC.

A from-scratch TPU-native implementation of the denoising UNet the reference
loads through diffusers (nerf/sd.py:46). Geometry for SD v1.5:
4-ch 64x64 latents; block_out_channels (320, 640, 1280, 1280);
3x CrossAttnDownBlock + DownBlock; mid with cross-attention; mirrored up
path; 8 attention heads with head_dim = C/8; cross_attention_dim 768;
GEGLU feed-forward; sinusoidal 320-dim timestep embedding -> 1280 MLP.

Layout is NHWC (TPU-native); the torch->flax converter (convert.py)
transposes OIHW conv kernels to HWIO. Module/parameter names mirror the
diffusers state_dict structure (down_blocks_0/resnets_1/conv1/...) so
conversion is a mechanical rename.

Everything computes in `dtype` (bf16 by default on TPU) with fp32 params
and fp32 GroupNorm/softmax accumulation.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dreamfusion_tpu.guidance.sd.layers import (TPUGroupNorm,
                                                attention_core)


def timestep_embedding(t: jax.Array, dim: int, max_period: float = 10000.0,
                       flip_sin_to_cos: bool = True,
                       downscale_freq_shift: float = 0.0) -> jax.Array:
    """Sinusoidal timestep embedding, diffusers convention (SD:
    flip_sin_to_cos=True, freq_shift=0)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], -1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    time_embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample):
        h = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_1")(sample)
        h = nn.silu(h)
        return nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_2")(h)


class ResnetBlock2D(nn.Module):
    out_channels: int
    use_temb: bool = True
    groups: int = 32
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None):
        in_ch = x.shape[-1]
        h = TPUGroupNorm(self.groups, epsilon=self.eps, name="norm1")(x)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        if self.use_temb and temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype,
                         name="time_emb_proj")(nn.silu(temb))
            h = h + t[:, None, None, :]
        h = TPUGroupNorm(self.groups, epsilon=self.eps, name="norm2")(h)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class Attention(nn.Module):
    heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        context = x if context is None else context
        inner = self.heads * self.head_dim
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)

        B, Nq, _ = q.shape
        Nk = k.shape[1]
        q = q.reshape(B, Nq, self.heads, self.head_dim)
        k = k.reshape(B, Nk, self.heads, self.head_dim)
        v = v.reshape(B, Nk, self.heads, self.head_dim)
        scale = 1.0 / math.sqrt(self.head_dim)
        out = attention_core(q, k, v, scale, self.dtype).reshape(B, Nq, inner)
        return nn.Dense(inner, dtype=self.dtype, name="to_out_0")(out)


class GEGLU(nn.Module):
    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * nn.gelu(gate)


class FeedForward(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        h = GEGLU(dim * 4, dtype=self.dtype, name="net_0")(x)
        return nn.Dense(dim, dtype=self.dtype, name="net_2")(h)


class BasicTransformerBlock(nn.Module):
    heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        h = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        x = x + Attention(self.heads, self.head_dim, self.dtype, name="attn1")(h)
        h = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        x = x + Attention(self.heads, self.head_dim, self.dtype,
                          name="attn2")(h, context)
        h = nn.LayerNorm(dtype=jnp.float32, name="norm3")(x).astype(self.dtype)
        return x + FeedForward(self.dtype, name="ff")(h)


class Transformer2D(nn.Module):
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        B, H, W, C = x.shape
        residual = x
        h = TPUGroupNorm(32, epsilon=1e-6, name="norm")(x)
        h = h.astype(self.dtype)
        # SD v1.x uses conv 1x1 projections (use_linear_projection=False)
        h = nn.Conv(C, (1, 1), dtype=self.dtype, name="proj_in")(h)
        h = h.reshape(B, H * W, C)
        h = BasicTransformerBlock(self.heads, C // self.heads, self.dtype,
                                  name="transformer_blocks_0")(h, context)
        h = h.reshape(B, H, W, C)
        h = nn.Conv(C, (1, 1), dtype=self.dtype, name="proj_out")(h)
        return h + residual


class Downsample2D(nn.Module):
    out_channels: int
    asymmetric_pad: bool = False   # VAE encoder uses pad (0,1,0,1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.asymmetric_pad:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            pad = "VALID"
        else:
            pad = 1
        return nn.Conv(self.out_channels, (3, 3), strides=2, padding=pad,
                       dtype=self.dtype, name="conv")(x)


class Upsample2D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), "nearest")
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv")(x)


class UNet2DCondition(nn.Module):
    """SD v1.x UNet. __call__(latents [B,H,W,4], t [B], context [B,77,D])."""
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    attention_heads: int = 8
    cross_attention_dim: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, timesteps, context):
        ch = list(self.block_out_channels)
        n_blocks = len(ch)
        time_embed_dim = ch[0] * 4

        temb = timestep_embedding(timesteps, ch[0])
        temb = TimestepEmbedding(time_embed_dim, self.dtype,
                                 name="time_embedding")(temb).astype(self.dtype)
        context = context.astype(self.dtype)

        h = nn.Conv(ch[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(sample.astype(self.dtype))
        skips = [h]

        # down path: CrossAttn blocks then a plain block last
        for i in range(n_blocks):
            is_last = i == n_blocks - 1
            out_ch = ch[i]
            for j in range(self.layers_per_block):
                h = ResnetBlock2D(out_ch, dtype=self.dtype,
                                  name=f"down_blocks_{i}_resnets_{j}")(h, temb)
                if not is_last:
                    h = Transformer2D(self.attention_heads, dtype=self.dtype,
                                      name=f"down_blocks_{i}_attentions_{j}")(h, context)
                skips.append(h)
            if not is_last:
                h = Downsample2D(out_ch, dtype=self.dtype,
                                 name=f"down_blocks_{i}_downsamplers_0")(h)
                skips.append(h)

        # mid
        h = ResnetBlock2D(ch[-1], dtype=self.dtype,
                          name="mid_block_resnets_0")(h, temb)
        h = Transformer2D(self.attention_heads, dtype=self.dtype,
                          name="mid_block_attentions_0")(h, context)
        h = ResnetBlock2D(ch[-1], dtype=self.dtype,
                          name="mid_block_resnets_1")(h, temb)

        # up path (reversed channels; layers_per_block+1 resnets each)
        for i in range(n_blocks):
            is_first = i == 0  # mirrors the plain DownBlock
            out_ch = ch[::-1][i]
            for j in range(self.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResnetBlock2D(out_ch, dtype=self.dtype,
                                  name=f"up_blocks_{i}_resnets_{j}")(h, temb)
                if not is_first:
                    h = Transformer2D(self.attention_heads, dtype=self.dtype,
                                      name=f"up_blocks_{i}_attentions_{j}")(h, context)
            if i != n_blocks - 1:
                h = Upsample2D(out_ch, dtype=self.dtype,
                               name=f"up_blocks_{i}_upsamplers_0")(h)

        h = TPUGroupNorm(32, epsilon=1e-5, name="conv_norm_out")(h)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_out")(h)
        return h.astype(jnp.float32)


def sd15_unet(dtype=jnp.bfloat16) -> UNet2DCondition:
    return UNet2DCondition(dtype=dtype)


def tiny_unet(dtype=jnp.float32) -> UNet2DCondition:
    """Small config for CPU tests (same topology, tiny widths)."""
    return UNet2DCondition(block_out_channels=(32, 64, 64, 64),
                           layers_per_block=1, attention_heads=2,
                           cross_attention_dim=32, dtype=dtype)


def nano_unet(dtype=jnp.float32) -> UNet2DCondition:
    """Smallest SD-shaped UNet (2 blocks, 1 head): for paths that compile
    the WHOLE train step on CPU (bench --tiny smoke, dryrun_multichip) —
    the 4-block tiny config costs ~6 min of XLA CPU compile inside the
    fused render+SDS+grad program."""
    return UNet2DCondition(block_out_channels=(32, 32),
                           layers_per_block=1, attention_heads=1,
                           cross_attention_dim=16, dtype=dtype)
