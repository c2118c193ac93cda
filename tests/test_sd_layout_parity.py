"""Full-size SD v1.5 checkpoint-layout parity.

Real weights cannot be downloaded here (zero egress), so this validates the
next-strongest claim: the EXACT diffusers state_dict inventory of
runwayml/stable-diffusion-v1-5 (every key, every shape — generated below
independently from the published architecture, NOT from our code) maps 1:1
onto our flax UNet/VAE templates through guidance/sd/convert.py, with no
missing and no unmatched parameters, and the parameter totals equal the
published counts (UNet 859,520,964; VAE 83,653,863). With this green,
loading the real checkpoint is a pure file-read.

(reference behavior: nerf/sd.py:39-46 loads these modules via diffusers.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _res(d, prefix, cin, cout, temb=False):
    d[f"{prefix}.norm1.weight"] = (cin,)
    d[f"{prefix}.norm1.bias"] = (cin,)
    d[f"{prefix}.conv1.weight"] = (cout, cin, 3, 3)
    d[f"{prefix}.conv1.bias"] = (cout,)
    if temb:
        d[f"{prefix}.time_emb_proj.weight"] = (cout, 1280)
        d[f"{prefix}.time_emb_proj.bias"] = (cout,)
    d[f"{prefix}.norm2.weight"] = (cout,)
    d[f"{prefix}.norm2.bias"] = (cout,)
    d[f"{prefix}.conv2.weight"] = (cout, cout, 3, 3)
    d[f"{prefix}.conv2.bias"] = (cout,)
    if cin != cout:
        d[f"{prefix}.conv_shortcut.weight"] = (cout, cin, 1, 1)
        d[f"{prefix}.conv_shortcut.bias"] = (cout,)


def _attn_tf(d, prefix, C, ctx=768):
    """CrossAttn Transformer2D block (UNet)."""
    d[f"{prefix}.norm.weight"] = (C,)
    d[f"{prefix}.norm.bias"] = (C,)
    d[f"{prefix}.proj_in.weight"] = (C, C, 1, 1)
    d[f"{prefix}.proj_in.bias"] = (C,)
    t = f"{prefix}.transformer_blocks.0"
    for n in ("norm1", "norm2", "norm3"):
        d[f"{t}.{n}.weight"] = (C,)
        d[f"{t}.{n}.bias"] = (C,)
    d[f"{t}.attn1.to_q.weight"] = (C, C)
    d[f"{t}.attn1.to_k.weight"] = (C, C)
    d[f"{t}.attn1.to_v.weight"] = (C, C)
    d[f"{t}.attn1.to_out.0.weight"] = (C, C)
    d[f"{t}.attn1.to_out.0.bias"] = (C,)
    d[f"{t}.attn2.to_q.weight"] = (C, C)
    d[f"{t}.attn2.to_k.weight"] = (C, ctx)
    d[f"{t}.attn2.to_v.weight"] = (C, ctx)
    d[f"{t}.attn2.to_out.0.weight"] = (C, C)
    d[f"{t}.attn2.to_out.0.bias"] = (C,)
    d[f"{t}.ff.net.0.proj.weight"] = (8 * C, C)
    d[f"{t}.ff.net.0.proj.bias"] = (8 * C,)
    d[f"{t}.ff.net.2.weight"] = (C, 4 * C)
    d[f"{t}.ff.net.2.bias"] = (C,)
    d[f"{prefix}.proj_out.weight"] = (C, C, 1, 1)
    d[f"{prefix}.proj_out.bias"] = (C,)


def sd15_unet_state_dict_shapes():
    """runwayml/stable-diffusion-v1-5 unet: block_out_channels
    (320, 640, 1280, 1280), 2 layers/block, cross-attn dim 768,
    CrossAttnDown x3 + Down, Up + CrossAttnUp x3."""
    d = {}
    ch = [320, 640, 1280, 1280]
    d["conv_in.weight"] = (320, 4, 3, 3)
    d["conv_in.bias"] = (320,)
    d["time_embedding.linear_1.weight"] = (1280, 320)
    d["time_embedding.linear_1.bias"] = (1280,)
    d["time_embedding.linear_2.weight"] = (1280, 1280)
    d["time_embedding.linear_2.bias"] = (1280,)

    skips = [320]
    cin = 320
    for i, cout in enumerate(ch):
        for j in range(2):
            _res(d, f"down_blocks.{i}.resnets.{j}",
                 cin if j == 0 else cout, cout, temb=True)
            if i < 3:
                _attn_tf(d, f"down_blocks.{i}.attentions.{j}", cout)
            skips.append(cout)
        if i < 3:
            d[f"down_blocks.{i}.downsamplers.0.conv.weight"] = (cout, cout, 3, 3)
            d[f"down_blocks.{i}.downsamplers.0.conv.bias"] = (cout,)
            skips.append(cout)
        cin = cout

    _res(d, "mid_block.resnets.0", 1280, 1280, temb=True)
    _attn_tf(d, "mid_block.attentions.0", 1280)
    _res(d, "mid_block.resnets.1", 1280, 1280, temb=True)

    rev = [1280, 1280, 640, 320]
    prev = 1280
    for i, cout in enumerate(rev):
        for j in range(3):
            skip = skips.pop()
            _res(d, f"up_blocks.{i}.resnets.{j}",
                 (prev if j == 0 else cout) + skip, cout, temb=True)
            if i > 0:  # up_blocks.0 is UpBlock2D (no attention)
                _attn_tf(d, f"up_blocks.{i}.attentions.{j}", cout)
        if i < 3:
            d[f"up_blocks.{i}.upsamplers.0.conv.weight"] = (cout, cout, 3, 3)
            d[f"up_blocks.{i}.upsamplers.0.conv.bias"] = (cout,)
        prev = cout
    assert not skips

    d["conv_norm_out.weight"] = (320,)
    d["conv_norm_out.bias"] = (320,)
    d["conv_out.weight"] = (4, 320, 3, 3)
    d["conv_out.bias"] = (4,)
    return d


def _vae_attn(d, prefix, C=512):
    d[f"{prefix}.group_norm.weight"] = (C,)
    d[f"{prefix}.group_norm.bias"] = (C,)
    for n in ("to_q", "to_k", "to_v"):
        d[f"{prefix}.{n}.weight"] = (C, C)
        d[f"{prefix}.{n}.bias"] = (C,)
    d[f"{prefix}.to_out.0.weight"] = (C, C)
    d[f"{prefix}.to_out.0.bias"] = (C,)


def sd15_vae_state_dict_shapes():
    """stable-diffusion-v1-5 vae (AutoencoderKL): channels
    (128, 256, 512, 512), 2 enc / 3 dec layers per block."""
    d = {}
    ch = [128, 256, 512, 512]
    d["encoder.conv_in.weight"] = (128, 3, 3, 3)
    d["encoder.conv_in.bias"] = (128,)
    cin = 128
    for i, cout in enumerate(ch):
        for j in range(2):
            _res(d, f"encoder.down_blocks.{i}.resnets.{j}",
                 cin if j == 0 else cout, cout)
        if i < 3:
            d[f"encoder.down_blocks.{i}.downsamplers.0.conv.weight"] = \
                (cout, cout, 3, 3)
            d[f"encoder.down_blocks.{i}.downsamplers.0.conv.bias"] = (cout,)
        cin = cout
    _res(d, "encoder.mid_block.resnets.0", 512, 512)
    _vae_attn(d, "encoder.mid_block.attentions.0")
    _res(d, "encoder.mid_block.resnets.1", 512, 512)
    d["encoder.conv_norm_out.weight"] = (512,)
    d["encoder.conv_norm_out.bias"] = (512,)
    d["encoder.conv_out.weight"] = (8, 512, 3, 3)
    d["encoder.conv_out.bias"] = (8,)

    d["decoder.conv_in.weight"] = (512, 4, 3, 3)
    d["decoder.conv_in.bias"] = (512,)
    _res(d, "decoder.mid_block.resnets.0", 512, 512)
    _vae_attn(d, "decoder.mid_block.attentions.0")
    _res(d, "decoder.mid_block.resnets.1", 512, 512)
    rev = [512, 512, 256, 128]
    cin = 512
    for i, cout in enumerate(rev):
        for j in range(3):
            _res(d, f"decoder.up_blocks.{i}.resnets.{j}",
                 cin if j == 0 else cout, cout)
        if i < 3:
            d[f"decoder.up_blocks.{i}.upsamplers.0.conv.weight"] = \
                (cout, cout, 3, 3)
            d[f"decoder.up_blocks.{i}.upsamplers.0.conv.bias"] = (cout,)
        cin = cout
    d["decoder.conv_norm_out.weight"] = (128,)
    d["decoder.conv_norm_out.bias"] = (128,)
    d["decoder.conv_out.weight"] = (3, 128, 3, 3)
    d["decoder.conv_out.bias"] = (3,)

    d["quant_conv.weight"] = (8, 8, 1, 1)
    d["quant_conv.bias"] = (8,)
    d["post_quant_conv.weight"] = (4, 4, 1, 1)
    d["post_quant_conv.bias"] = (4,)
    return d


def _template(init_fn):
    tpl = jax.eval_shape(init_fn)
    return jax.tree.map(lambda s: np.zeros(s.shape, np.float32), tpl)


@pytest.mark.slow
def test_unet_layout_matches_sd15():
    from dreamfusion_tpu.guidance.sd.convert import convert_state_dict
    from dreamfusion_tpu.guidance.sd.unet import sd15_unet

    shapes = sd15_unet_state_dict_shapes()
    n_params = sum(int(np.prod(s)) for s in shapes.values())
    assert n_params == 859_520_964  # published SD v1.5 UNet size

    unet = sd15_unet()
    key = jax.random.PRNGKey(0)
    tpl = _template(lambda: unet.init(
        key, jnp.zeros((1, 64, 64, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, unet.cross_attention_dim))))
    flat_n = sum(int(np.prod(np.shape(x)))
                 for x in jax.tree_util.tree_leaves(tpl))
    assert flat_n == n_params, f"flax UNet has {flat_n} params"

    torch_sd = {k: np.zeros(v, np.float32) for k, v in shapes.items()}
    converted, skipped = convert_state_dict(torch_sd, tpl)
    assert skipped == [], f"unconsumed torch keys: {skipped[:5]}"


@pytest.mark.slow
def test_vae_layout_matches_sd15():
    from dreamfusion_tpu.guidance.sd.convert import convert_state_dict
    from dreamfusion_tpu.guidance.sd.vae import sd15_vae

    shapes = sd15_vae_state_dict_shapes()
    n_params = sum(int(np.prod(s)) for s in shapes.values())
    assert n_params == 83_653_863  # published SD VAE size

    vae = sd15_vae()
    key = jax.random.PRNGKey(0)
    tpl = _template(lambda: vae.init(
        key, jnp.zeros((1, 512, 512, 3)), key))
    flat_n = sum(int(np.prod(np.shape(x)))
                 for x in jax.tree_util.tree_leaves(tpl))
    assert flat_n == n_params, f"flax VAE has {flat_n} params"

    torch_sd = {k: np.zeros(v, np.float32) for k, v in shapes.items()}
    converted, skipped = convert_state_dict(torch_sd, tpl)
    assert skipped == [], f"unconsumed torch keys: {skipped[:5]}"
