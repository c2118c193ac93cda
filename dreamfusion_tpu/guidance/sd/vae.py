"""AutoencoderKL (Stable Diffusion VAE) in flax.linen, NHWC.

From-scratch TPU implementation of the VAE the reference loads through
diffusers (nerf/sd.py:39). SD v1.5 geometry: encoder 3->128->(128,256,512,512)
with 2 resnets/block + mid self-attention, 8-ch moment output + 1x1
quant_conv; decoder mirrors with 3 resnets/block. Latent scale 0.18215
(nerf/sd.py:162) is applied by callers (sds.py), matching encode_imgs.

During SDS only the *encoder* runs with gradients (nerf/sd.py:87,156-164);
the decoder serves txt2img and previews.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dreamfusion_tpu.guidance.sd.layers import (TPUGroupNorm,
                                                attention_core)

from dreamfusion_tpu.guidance.sd.unet import (Downsample2D, ResnetBlock2D,
                                              Upsample2D)


class VAEAttention(nn.Module):
    """Single-head self-attention over spatial positions (VAE mid block)."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = TPUGroupNorm(32, epsilon=1e-6, name="group_norm")(x)
        h = h.astype(self.dtype).reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="to_v")(h)
        out = attention_core(q[:, :, None, :], k[:, :, None, :],
                             v[:, :, None, :],
                             1.0 / math.sqrt(C), self.dtype)[:, :, 0, :]
        out = nn.Dense(C, dtype=self.dtype, name="to_out_0")(out)
        return x + out.reshape(B, H, W, C)


class Encoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ch = list(self.block_out_channels)
        h = nn.Conv(ch[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(x.astype(self.dtype))
        for i, out_ch in enumerate(ch):
            for j in range(self.layers_per_block):
                h = ResnetBlock2D(out_ch, use_temb=False, eps=1e-6,
                                  dtype=self.dtype,
                                  name=f"down_blocks_{i}_resnets_{j}")(h)
            if i != len(ch) - 1:
                h = Downsample2D(out_ch, asymmetric_pad=True, dtype=self.dtype,
                                 name=f"down_blocks_{i}_downsamplers_0")(h)
        h = ResnetBlock2D(ch[-1], use_temb=False, eps=1e-6, dtype=self.dtype,
                          name="mid_block_resnets_0")(h)
        h = VAEAttention(dtype=self.dtype, name="mid_block_attentions_0")(h)
        h = ResnetBlock2D(ch[-1], use_temb=False, eps=1e-6, dtype=self.dtype,
                          name="mid_block_resnets_1")(h)
        h = TPUGroupNorm(32, epsilon=1e-6, name="conv_norm_out")(h)
        h = nn.silu(h).astype(self.dtype)
        return nn.Conv(2 * self.latent_channels, (3, 3), padding=1,
                       dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 3
    latent_channels: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        ch = list(self.block_out_channels)[::-1]  # (512, 512, 256, 128)
        h = nn.Conv(ch[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(z.astype(self.dtype))
        h = ResnetBlock2D(ch[0], use_temb=False, eps=1e-6, dtype=self.dtype,
                          name="mid_block_resnets_0")(h)
        h = VAEAttention(dtype=self.dtype, name="mid_block_attentions_0")(h)
        h = ResnetBlock2D(ch[0], use_temb=False, eps=1e-6, dtype=self.dtype,
                          name="mid_block_resnets_1")(h)
        for i, out_ch in enumerate(ch):
            for j in range(self.layers_per_block):
                h = ResnetBlock2D(out_ch, use_temb=False, eps=1e-6,
                                  dtype=self.dtype,
                                  name=f"up_blocks_{i}_resnets_{j}")(h)
            if i != len(ch) - 1:
                h = Upsample2D(out_ch, dtype=self.dtype,
                               name=f"up_blocks_{i}_upsamplers_0")(h)
        h = TPUGroupNorm(32, epsilon=1e-6, name="conv_norm_out")(h)
        h = nn.silu(h).astype(self.dtype)
        return nn.Conv(3, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h).astype(jnp.float32)


class AutoencoderKL(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.block_out_channels, self.layers_per_block,
                               self.latent_channels, self.dtype)
        self.decoder = Decoder(self.block_out_channels,
                               self.layers_per_block + 1,
                               self.latent_channels, self.dtype)
        self.quant_conv = nn.Conv(2 * self.latent_channels, (1, 1),
                                  dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.latent_channels, (1, 1),
                                       dtype=self.dtype, name="post_quant_conv")

    def moments(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """x [B,H,W,3] in [-1,1] -> (mean, logvar) of the latent posterior."""
        m = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(m, 2, axis=-1)
        return mean.astype(jnp.float32), jnp.clip(
            logvar.astype(jnp.float32), -30.0, 20.0)

    def encode(self, x: jax.Array, key: jax.Array) -> jax.Array:
        """Sample the posterior (reference: posterior.sample(),
        nerf/sd.py:162). Latent scaling is the caller's job."""
        mean, logvar = self.moments(x)
        std = jnp.exp(0.5 * logvar)
        return mean + std * jax.random.normal(key, mean.shape)

    def decode(self, z: jax.Array) -> jax.Array:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, key):
        return self.decode(self.encode(x, key))


def sd15_vae(dtype=jnp.bfloat16) -> AutoencoderKL:
    return AutoencoderKL(dtype=dtype)


def tiny_vae(dtype=jnp.float32) -> AutoencoderKL:
    return AutoencoderKL(block_out_channels=(32, 32, 64, 64),
                         layers_per_block=1, dtype=dtype)


def nano_vae(dtype=jnp.float32) -> AutoencoderKL:
    """2-block sibling of nano_unet (see unet.nano_unet)."""
    return AutoencoderKL(block_out_channels=(32, 32),
                         layers_per_block=1, dtype=dtype)
