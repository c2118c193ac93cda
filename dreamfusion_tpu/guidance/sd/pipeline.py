"""Standalone Stable Diffusion txt2img pipeline + CLI.

Rebuilds the reference's sampling path and smoke CLI (nerf/sd.py:120-214):
prompt -> text embeds -> iterative denoising (PLMS like the reference's PNDM
scheduler, or DDIM) -> VAE decode -> image.

    python -m dreamfusion_tpu.guidance.sd.pipeline "a photo of a corgi" \
        --sd_weights /path/to/sd15 --steps 50 -H 512 -W 512
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dreamfusion_tpu.guidance.sd.scheduler import (DiffusionSchedule,
                                                   PNDMState, ddim_step,
                                                   ddim_timesteps,
                                                   pndm_prk_step,
                                                   make_schedule,
                                                   pndm_plms_step)
from dreamfusion_tpu.guidance.sd.sds import LATENT_SCALE


def produce_latents(unet, params, sched: DiffusionSchedule, text_z: jax.Array,
                    *, height: int = 512, width: int = 512,
                    num_inference_steps: int = 50,
                    guidance_scale: float = 7.5,
                    latents: Optional[jax.Array] = None,
                    key: Optional[jax.Array] = None,
                    sampler: str = "plms") -> jax.Array:
    """text_z: [B, 2, 77, D] (uncond, cond) -> latents [B, h/8, w/8, 4]
    (reference: nerf/sd.py:120-143)."""
    B = text_z.shape[0]
    h, w = height // 8, width // 8
    if latents is None:
        key = key if key is not None else jax.random.PRNGKey(0)
        latents = jax.random.normal(key, (B, h, w, 4))

    ts = ddim_timesteps(sched.num_train_timesteps, num_inference_steps)
    ctx = jnp.concatenate([text_z[:, 0], text_z[:, 1]], axis=0)

    @jax.jit
    def eps_fn(latents, t):
        lat_in = jnp.concatenate([latents, latents], axis=0)
        t_in = jnp.full((2 * B,), t, jnp.int32)
        eps = unet.apply(params, lat_in, t_in, ctx)
        return eps[:B] + guidance_scale * (eps[B:] - eps[:B])

    state = PNDMState(ets=(), cur_sample=latents, counter=0)
    for i, t in enumerate(ts):
        t_prev = ts[i + 1] if i + 1 < len(ts) else -1
        if sampler == "pndm" and i < 3:
            # full PNDM: 3 pseudo-Runge-Kutta warmup transfers (4 UNet
            # evals each) seed the multistep history, then PLMS
            latents, state = pndm_prk_step(
                sched, lambda x, tt: eps_fn(x, int(tt)), latents,
                int(t), int(t_prev), state)
            continue
        eps = eps_fn(latents, int(t))
        if sampler in ("plms", "pndm"):
            latents, state = pndm_plms_step(sched, eps, int(t), int(t_prev),
                                            latents, state)
        else:
            latents = ddim_step(sched, eps, int(t), int(t_prev), latents)
    return latents


def decode_latents(vae, vae_params, latents: jax.Array) -> np.ndarray:
    """latents -> [B, H, W, 3] uint8-ready floats in [0,1]
    (nerf/sd.py:145-154)."""
    imgs = vae.apply(vae_params, latents / LATENT_SCALE, method=vae.decode)
    return np.asarray(jnp.clip(imgs / 2.0 + 0.5, 0.0, 1.0))


def prompt_to_img(prompts, negative_prompts="", *, sd_weights=None,
                  height: int = 512, width: int = 512,
                  num_inference_steps: int = 50, guidance_scale: float = 7.5,
                  seed: int = 0, sampler: str = "plms") -> np.ndarray:
    """(nerf/sd.py:166-187). With sd_weights=None runs random-init models
    (pipeline smoke only)."""
    from dreamfusion_tpu.guidance.sd.sds import build_sd_guidance

    if isinstance(prompts, str):
        prompts = [prompts]
    if isinstance(negative_prompts, str):
        negative_prompts = [negative_prompts] * len(prompts)

    g = build_sd_guidance(sd_weights, guidance_scale=guidance_scale)
    from dreamfusion_tpu.guidance.sd.sds import sd15_unet, sd15_vae, tiny_unet, tiny_vae

    tiny = sd_weights in (None, "random-tiny")
    unet = tiny_unet() if tiny else sd15_unet()
    vae = tiny_vae() if tiny else sd15_vae()
    if tiny:
        height = min(height, 64)
        width = min(width, 64)

    sched = make_schedule()
    text_z = g.get_text_embeds(prompts, negative_prompts)
    latents = produce_latents(unet, g.params["unet"], sched, text_z,
                              height=height, width=width,
                              num_inference_steps=num_inference_steps,
                              guidance_scale=guidance_scale,
                              key=jax.random.PRNGKey(seed), sampler=sampler)
    imgs = decode_latents(vae, g.params["vae"], latents)
    return (imgs * 255).round().astype(np.uint8)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser("sd txt2img")
    ap.add_argument("prompt", type=str)
    ap.add_argument("--negative", default="", type=str)
    ap.add_argument("-H", type=int, default=512)
    ap.add_argument("-W", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--sd_weights", type=str, default=None)
    ap.add_argument("--sampler", choices=("plms", "pndm", "ddim"),
                    default="plms")
    ap.add_argument("--out", type=str, default="txt2img.png")
    args = ap.parse_args()

    imgs = prompt_to_img(args.prompt, args.negative, sd_weights=args.sd_weights,
                         height=args.H, width=args.W,
                         num_inference_steps=args.steps, seed=args.seed,
                         sampler=args.sampler)
    from PIL import Image

    Image.fromarray(imgs[0]).save(args.out)
    print(f"wrote {args.out}")
