"""Stable Diffusion guidance tests: scheduler constants, UNet/VAE shapes and
gradients on tiny configs, and the SDS single-loss == two-phase-backward
gradient equivalence (the reference's latents.backward trick, nerf/sd.py:115)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamfusion_tpu.guidance.sd.scheduler import (add_noise, ddim_step,
                                                   ddim_timesteps,
                                                   make_schedule)
from dreamfusion_tpu.guidance.sd.sds import LATENT_SCALE, build_sd_guidance
from dreamfusion_tpu.guidance.sd.unet import timestep_embedding, tiny_unet
from dreamfusion_tpu.guidance.sd.vae import tiny_vae


def test_schedule_constants():
    s = make_schedule()
    acp = np.asarray(s.alphas_cumprod)
    # first: 1 - 0.00085
    np.testing.assert_allclose(acp[0], 1 - 0.00085, rtol=1e-6)
    # last: the well-known SD value ~0.00466
    np.testing.assert_allclose(acp[-1], 0.004682, rtol=1e-2)
    assert np.all(np.diff(acp) < 0)
    assert s.betas.shape == (1000,)


def test_add_noise():
    s = make_schedule()
    x = jnp.ones((2, 4, 4, 4))
    n = jnp.zeros_like(x)
    t = jnp.array([0, 999])
    out = add_noise(s, x, n, t)
    np.testing.assert_allclose(float(out[0, 0, 0, 0]),
                               float(jnp.sqrt(s.alphas_cumprod[0])), rtol=1e-6)
    np.testing.assert_allclose(float(out[1, 0, 0, 0]),
                               float(jnp.sqrt(s.alphas_cumprod[999])), rtol=1e-5)


def test_timestep_embedding():
    emb = timestep_embedding(jnp.array([0.0, 10.0]), 320)
    assert emb.shape == (2, 320)
    # t=0: cos block = 1, sin block = 0 (flip_sin_to_cos => cos first)
    np.testing.assert_allclose(np.asarray(emb[0, :160]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 160:]), 0.0, atol=1e-6)


@pytest.mark.slow
def test_tiny_unet_shapes_and_grad():
    unet = tiny_unet()
    key = jax.random.PRNGKey(0)
    lat = jax.random.normal(key, (2, 8, 8, 4))
    t = jnp.array([10, 500])
    ctx = jax.random.normal(key, (2, 77, unet.cross_attention_dim))
    params = unet.init(key, lat, t, ctx)
    out = jax.jit(unet.apply)(params, lat, t, ctx)
    assert out.shape == lat.shape
    assert bool(jnp.all(jnp.isfinite(out)))
    g = jax.grad(lambda l: jnp.sum(unet.apply(params, l, t, ctx) ** 2))(lat)
    assert float(jnp.abs(g).max()) > 0


@pytest.mark.slow
def test_tiny_vae_roundtrip_shapes():
    vae = tiny_vae()
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (1, 32, 32, 3)) * 2 - 1
    params = vae.init(key, img, key)
    lat = vae.apply(params, img, key, method=vae.encode)
    assert lat.shape == (1, 4, 4, 4)  # 32/8
    dec = vae.apply(params, lat, method=vae.decode)
    assert dec.shape == img.shape
    # encoder gradient flows (the SDS-critical path)
    g = jax.grad(lambda im: jnp.sum(
        vae.apply(params, im, key, method=vae.encode)))(img)
    assert float(jnp.abs(g).max()) > 0


@pytest.mark.slow
def test_sds_gradient_matches_two_phase_backward():
    """d(sds_loss)/d(pred_rgb) must equal vjp of latents with cotangent
    w*(eps_hat - noise) — i.e. the reference's latents.backward(gradient=...)"""
    from dreamfusion_tpu.guidance.sd.scheduler import make_schedule
    from dreamfusion_tpu.guidance.sd import sds as sds_mod

    g = build_sd_guidance(None, guidance_scale=7.5)
    unet, vae = sds_mod.tiny_unet(), sds_mod.tiny_vae()
    sched = make_schedule()
    key = jax.random.PRNGKey(3)
    pred_rgb = jax.random.uniform(jax.random.PRNGKey(4), (1, 16, 16, 3))
    text_z = g.get_text_embeds(["a cat"], [""])  # [1, 2, 77, D]

    # (a) our single-loss gradient
    grad_a = jax.grad(lambda im: g.loss(g.params, text_z, im, key))(pred_rgb)

    # (b) manual two-phase: same keys/teacher pass, then VJP through the
    # encoder only
    k_enc, k_t, k_noise = jax.random.split(key, 3)
    B = 1
    size = 8 * 8

    def latents_of(im):
        img = jax.image.resize(im, (B, size, size, 3), "bilinear")
        return vae.apply(g.params["vae"], 2.0 * img - 1.0, k_enc,
                         method=vae.encode) * sds_mod.LATENT_SCALE

    latents = latents_of(pred_rgb)
    t = jax.random.randint(k_t, (B,), 20, 981)
    noise = jax.random.normal(k_noise, latents.shape)
    lat_noisy = add_noise(sched, latents, noise, t)
    lat_in = jnp.concatenate([lat_noisy, lat_noisy])
    t_in = jnp.concatenate([t, t])
    ctx = jnp.concatenate([text_z[:, 0], text_z[:, 1]])
    eps = unet.apply(g.params["unet"], lat_in, t_in, ctx)
    eps_hat = eps[:B] + 7.5 * (eps[B:] - eps[:B])
    w = (1.0 - sched.alphas_cumprod[t]).reshape(B, 1, 1, 1)
    cotangent = w * (eps_hat - noise)
    _, vjp = jax.vjp(latents_of, pred_rgb)
    (grad_b,) = vjp(cotangent)

    np.testing.assert_allclose(np.asarray(grad_a), np.asarray(grad_b),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_sds_trains_toward_lower_loss_shape():
    """Smoke: guidance loss is finite and differentiable wrt a [B,H,W,3]
    image through jit."""
    g = build_sd_guidance(None)
    text_z = g.get_text_embeds(["x"], [""])
    img = jax.random.uniform(jax.random.PRNGKey(0), (2, 24, 24, 3))
    tz = jnp.broadcast_to(text_z, (2,) + text_z.shape[1:])
    loss, grad = jax.jit(jax.value_and_grad(
        lambda im: g.loss(g.params, tz, im, jax.random.PRNGKey(1))))(img)
    assert jnp.isfinite(loss)
    assert float(jnp.abs(grad).max()) > 0


def test_ddim_step_reconstructs_x0():
    """Single DDIM step from t to -1 with the true eps recovers x0."""
    s = make_schedule()
    x0 = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 4))
    eps = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = 500
    xt = add_noise(s, x0, eps, jnp.array([t]))
    x0_hat = ddim_step(s, eps, t, -1, xt)
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), atol=1e-4)


@pytest.mark.slow
def test_convert_roundtrip_tiny():
    """convert_state_dict maps a synthetic torch-layout state dict onto the
    tiny UNet template exactly."""
    from dreamfusion_tpu.guidance.sd.convert import (_flatten,
                                                     convert_state_dict)

    unet = tiny_unet()
    key = jax.random.PRNGKey(0)
    lat = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, 77, unet.cross_attention_dim))
    params = unet.init(key, lat, jnp.zeros((1,), jnp.int32), ctx)

    # synthesize the torch state dict from the flax tree (inverse mapping)
    torch_sd = {}
    for path, val in _flatten(params).items():
        mods = list(path[1:])  # drop 'params'
        leaf = mods.pop()
        name_parts = []
        for m in mods:
            name_parts.extend(m.replace("_", ".").split("."))
        # re-merge alpha tokens split from names like conv.in / to.q
        name = ".".join(name_parts)
        for bad, good in [("down.blocks", "down_blocks"), ("up.blocks", "up_blocks"),
                          ("mid.block", "mid_block"), ("conv.in", "conv_in"),
                          ("conv.out", "conv_out"), ("conv.norm.out", "conv_norm_out"),
                          ("time.embedding", "time_embedding"),
                          ("linear.1", "linear_1"), ("linear.2", "linear_2"),
                          ("time.emb.proj", "time_emb_proj"),
                          ("transformer.blocks", "transformer_blocks"),
                          ("to.q", "to_q"), ("to.k", "to_k"), ("to.v", "to_v"),
                          ("to.out.0", "to_out_0"), ("net.0", "net.0"),
                          ("conv.shortcut", "conv_shortcut"),
                          ("proj.in", "proj_in"), ("proj.out", "proj_out")]:
            name = name.replace(bad, good)
        v = np.asarray(val)
        if leaf == "kernel":
            if v.ndim == 4:
                v = v.transpose(3, 2, 0, 1)
            else:
                v = v.T
            torch_sd[name + ".weight"] = v
        elif leaf == "scale":
            torch_sd[name + ".weight"] = v
        else:
            torch_sd[name + ".bias"] = v

    converted, skipped = convert_state_dict(torch_sd, params)
    assert not skipped
    for (pa, va), (pb, vb) in zip(sorted(_flatten(params).items()),
                                  sorted(_flatten(converted).items())):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=1e-6)


def test_pndm_prk_step_rk_accumulation():
    """The prk warmup must do exactly 4 eps evals with the 1/6-1/3-1/3-1/6
    combination at the half-interval midpoints, and seed ets with e1
    (Liu et al. 2022 alg. 1 / diffusers step_prk)."""
    from dreamfusion_tpu.guidance.sd.scheduler import (PNDMState,
                                                       make_schedule,
                                                       pndm_prk_step,
                                                       pndm_transfer)

    sched = make_schedule()
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 4, 4, 4))
    calls = []

    def eps_fn(sample, t):
        calls.append(int(t))
        # deterministic but call-dependent output
        return jnp.full_like(sample, float(len(calls)))

    state = PNDMState(ets=(), cur_sample=x, counter=0)
    prev, state2 = pndm_prk_step(sched, eps_fn, x, 901, 801, state)

    assert calls == [901, 851, 851, 801]
    e1, e2, e3, e4 = 1.0, 2.0, 3.0, 4.0
    eps_prime = (e1 + 2 * e2 + 2 * e3 + e4) / 6.0
    expect = pndm_transfer(sched, x, jnp.full_like(x, eps_prime), 901, 801)
    np.testing.assert_allclose(np.asarray(prev), np.asarray(expect),
                               rtol=1e-6)
    assert len(state2.ets) == 1
    np.testing.assert_allclose(np.asarray(state2.ets[0]), 1.0)


def test_pndm_full_sampler_recovers_x0_with_exact_eps():
    """With the exact eps oracle of a delta data distribution, the
    prk-warmup + plms sampler must walk x_T back to x0 (transfer is
    x0-preserving under exact eps), and the plms switchover must start at
    full multistep order (ets pre-seeded by the 3 prk steps)."""
    from dreamfusion_tpu.guidance.sd.scheduler import (PNDMState,
                                                       add_noise,
                                                       ddim_timesteps,
                                                       make_schedule,
                                                       pndm_plms_step,
                                                       pndm_prk_step)

    sched = make_schedule()
    x0 = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 4)) * 0.5

    def eps_exact(x, t):
        acp = sched.alphas_cumprod[t]
        return (x - jnp.sqrt(acp) * x0) / jnp.sqrt(1.0 - acp)

    ts = ddim_timesteps(1000, 25)
    noise = jax.random.normal(jax.random.PRNGKey(2), x0.shape)
    x = add_noise(sched, x0, noise, jnp.array([int(ts[0])]))

    state = PNDMState(ets=(), cur_sample=x, counter=0)
    for i, t in enumerate(ts):
        t_prev = int(ts[i + 1]) if i + 1 < len(ts) else -1
        if i < 3:
            x, state = pndm_prk_step(sched, eps_exact, x, int(t), t_prev,
                                     state)
        else:
            if i == 3:
                assert len(state.ets) == 3   # warmup seeded the history
            x, state = pndm_plms_step(sched, eps_exact(x, int(t)), int(t),
                                      t_prev, x, state)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=5e-3)


def test_tpu_group_norm_matches_flax(monkeypatch):
    """TPUGroupNorm: identical statistics to nn.GroupNorm without the
    [..., G, C//G] reshape whose tiny trailing dim pads to the 128-lane
    tile (bench trace r3: ~7.5 ms/step of pad kernels at SD sizes).
    Pins the f32 output mode — the production default is bf16 (measured
    -23% on the VAE encode, s7b r5b), covered by the bf16 test below."""
    import flax.core
    import flax.linen as nn

    from dreamfusion_tpu.guidance.sd import layers
    from dreamfusion_tpu.guidance.sd.layers import TPUGroupNorm

    monkeypatch.setattr(layers, "GN_DTYPE", "f32")
    k = jax.random.PRNGKey(0)
    for shape, g in (((2, 8, 8, 64), 32), ((2, 16, 128), 32),
                     ((1, 4, 4, 8), 4)):
        x = jax.random.normal(k, shape, jnp.float32) * 3 + 1
        c = shape[-1]
        variables = flax.core.freeze({"params": {
            "scale": jax.random.normal(jax.random.fold_in(k, 1), (c,)),
            "bias": jax.random.normal(jax.random.fold_in(k, 2), (c,))}})
        ref = nn.GroupNorm(g, epsilon=1e-6, dtype=jnp.float32).apply(
            variables, x)
        got = TPUGroupNorm(g, epsilon=1e-6).apply(variables, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)
        # param tree is nn.GroupNorm-compatible (converter parity)
        init = TPUGroupNorm(g, epsilon=1e-6).init(k, x)
        assert set(init["params"].keys()) == {"scale", "bias"}


def test_sd_init_cache_roundtrip(tmp_path, monkeypatch):
    """DFTPU_SD_INIT_CACHE persists the initialized random pytree; a second
    build loads IDENTICAL values (the bench warm-start path — full-size
    eager init is ~10 min of per-layer dispatches over the tunnel)."""
    import jax
    import jax.numpy as jnp

    from dreamfusion_tpu.guidance.sd.sds import build_sd_guidance

    monkeypatch.setenv("DFTPU_SD_INIT_CACHE", str(tmp_path))
    g1 = build_sd_guidance("random-nano")
    assert (tmp_path / "sd_init_random-nano.msgpack").exists()
    g2 = build_sd_guidance("random-nano")
    eq = jax.tree.map(lambda a, b: bool(jnp.all(a == b)), g1.params,
                      g2.params)
    assert all(jax.tree.leaves(eq))
    # loaded params drive the loss exactly like fresh ones
    tz = g2.get_text_embeds(["a cat"], [""])
    img = jnp.ones((1, 64, 64, 3)) * 0.5
    l1 = g1.loss(g1.params, tz, img, jax.random.PRNGKey(0))
    l2 = g2.loss(g2.params, tz, img, jax.random.PRNGKey(0))
    assert float(l1) == float(l2)


def test_tpu_group_norm_bf16_output_mode(monkeypatch):
    """DFTPU_GN_DTYPE=bf16: same f32 statistics, output cast to bf16 —
    the norm result must match the f32 path within bf16 rounding (the
    consumer in every production use casts to bf16 right after anyway)."""
    import flax.core

    from dreamfusion_tpu.guidance.sd import layers

    k = jax.random.PRNGKey(3)
    x = jax.random.normal(k, (2, 8, 8, 64), jnp.bfloat16) * 3 + 1
    variables = flax.core.freeze({"params": {
        "scale": jax.random.normal(jax.random.fold_in(k, 1), (64,)),
        "bias": jax.random.normal(jax.random.fold_in(k, 2), (64,))}})
    monkeypatch.setattr(layers, "GN_DTYPE", "f32")
    ref = layers.TPUGroupNorm(32, epsilon=1e-6).apply(variables, x)
    assert ref.dtype == jnp.float32
    monkeypatch.setattr(layers, "GN_DTYPE", "bf16")
    got = layers.TPUGroupNorm(32, epsilon=1e-6).apply(variables, x)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref), atol=0.05, rtol=0.02)
