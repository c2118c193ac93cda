"""Diffusion schedule constants and sampling steps.

The reference builds a diffusers PNDMScheduler(beta_start=0.00085,
beta_end=0.012, beta_schedule='scaled_linear', T=1000) and uses only its
`alphas_cumprod` and `add_noise` during SDS (nerf/sd.py:49-50, 95), plus the
full PNDM stepper for standalone txt2img (nerf/sd.py:120-143). We re-derive
the constants in closed form and implement DDIM and PNDM steppers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class DiffusionSchedule(NamedTuple):
    betas: jax.Array            # [T]
    alphas_cumprod: jax.Array   # [T]
    num_train_timesteps: int


def make_schedule(num_train_timesteps: int = 1000, beta_start: float = 0.00085,
                  beta_end: float = 0.012) -> DiffusionSchedule:
    """scaled_linear: betas = linspace(sqrt(b0), sqrt(b1), T)**2."""
    betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                        num_train_timesteps, dtype=np.float64) ** 2
    alphas_cumprod = np.cumprod(1.0 - betas)
    return DiffusionSchedule(
        betas=jnp.asarray(betas, jnp.float32),
        alphas_cumprod=jnp.asarray(alphas_cumprod, jnp.float32),
        num_train_timesteps=num_train_timesteps)


def add_noise(sched: DiffusionSchedule, latents: jax.Array, noise: jax.Array,
              t: jax.Array) -> jax.Array:
    """x_t = sqrt(acp_t) x_0 + sqrt(1-acp_t) eps. t: [B] int."""
    acp = sched.alphas_cumprod[t]
    shape = (-1,) + (1,) * (latents.ndim - 1)
    return (jnp.sqrt(acp).reshape(shape) * latents
            + jnp.sqrt(1.0 - acp).reshape(shape) * noise)


def ddim_timesteps(num_train_timesteps: int, num_inference_steps: int) -> np.ndarray:
    step = num_train_timesteps // num_inference_steps
    return (np.arange(0, num_inference_steps) * step).round()[::-1].astype(np.int64)


def ddim_step(sched: DiffusionSchedule, eps: jax.Array, t: int, t_prev: int,
              sample: jax.Array, eta: float = 0.0) -> jax.Array:
    """Deterministic DDIM update x_t -> x_{t_prev}."""
    acp_t = sched.alphas_cumprod[t]
    acp_prev = jnp.where(t_prev >= 0, sched.alphas_cumprod[t_prev], 1.0)
    x0 = (sample - jnp.sqrt(1 - acp_t) * eps) / jnp.sqrt(acp_t)
    dir_xt = jnp.sqrt(1 - acp_prev) * eps
    return jnp.sqrt(acp_prev) * x0 + dir_xt


class PNDMState(NamedTuple):
    ets: tuple            # last 4 eps predictions (most recent last)
    cur_sample: jax.Array
    counter: int


def pndm_transfer(sched: DiffusionSchedule, sample: jax.Array,
                  eps: jax.Array, t: int, t_prev: int) -> jax.Array:
    """The PNDM transfer x_t -> x_{t_prev} given an eps estimate
    (Liu et al. 2022 eq. 11; diffusers PNDMScheduler._get_prev_sample)."""
    acp_t = sched.alphas_cumprod[t]
    acp_prev = jnp.where(t_prev >= 0, sched.alphas_cumprod[t_prev], 1.0)
    sample_coeff = jnp.sqrt(acp_prev / acp_t)
    denom = acp_t * jnp.sqrt(1 - acp_prev) + jnp.sqrt(acp_t * acp_prev * (1 - acp_t))
    eps_coeff = (acp_prev - acp_t) / denom
    return sample_coeff * sample - eps_coeff * eps


def pndm_plms_step(sched: DiffusionSchedule, eps: jax.Array, t: int,
                   t_prev: int, sample: jax.Array, state: PNDMState):
    """PLMS (the PNDM main loop after warmup; diffusers skips the Runge-Kutta
    prk warmup by default via `skip_prk_steps` for SD — use pndm_prk_step
    for the full scheduler). Linear multistep coefficients per
    Liu et al. 2022."""
    ets = state.ets + (eps,)
    if len(ets) > 4:
        ets = ets[-4:]
    n = len(ets)
    if n == 1:
        eps_avg = ets[-1]
    elif n == 2:
        eps_avg = (3 * ets[-1] - ets[-2]) / 2
    elif n == 3:
        eps_avg = (23 * ets[-1] - 16 * ets[-2] + 5 * ets[-3]) / 12
    else:
        eps_avg = (55 * ets[-1] - 59 * ets[-2] + 37 * ets[-3] - 9 * ets[-4]) / 24

    prev = pndm_transfer(sched, sample, eps_avg, t, t_prev)
    return prev, PNDMState(ets=ets, cur_sample=prev, counter=state.counter + 1)


def pndm_prk_step(sched: DiffusionSchedule, eps_fn, sample: jax.Array,
                  t: int, t_prev: int, state: PNDMState):
    """One pseudo Runge-Kutta warmup transfer x_t -> x_{t_prev}
    (Liu et al. 2022 alg. 1; diffusers step_prk with its 1/6-1/3-1/3-1/6
    accumulation and half-interval midpoints). The full PNDM runs 3 of
    these before switching to PLMS; each costs 4 eps_fn (UNet) evals:

        e1 = eps(x_t, t)         x'   = phi(x_t, e1, t, t_mid)
        e2 = eps(x', t_mid)      x''  = phi(x_t, e2, t, t_mid)
        e3 = eps(x'', t_mid)     x''' = phi(x_t, e3, t, t_prev)
        e4 = eps(x''', t_prev)   e'   = (e1 + 2 e2 + 2 e3 + e4) / 6
        x_{t_prev} = phi(x_t, e', t, t_prev)

    e1 is appended to ets so the PLMS switchover starts with the full
    multistep history (reference behavior: nerf/sd.py:49 constructs the
    diffusers PNDMScheduler whose non-SD configs run exactly this warmup).
    """
    t_mid = (t + t_prev) // 2 if t_prev >= 0 else t // 2
    e1 = eps_fn(sample, t)
    x1 = pndm_transfer(sched, sample, e1, t, t_mid)
    e2 = eps_fn(x1, t_mid)
    x2 = pndm_transfer(sched, sample, e2, t, t_mid)
    e3 = eps_fn(x2, t_mid)
    x3 = pndm_transfer(sched, sample, e3, t, t_prev)
    e4 = eps_fn(x3, t_prev)
    eps_prime = (e1 + 2.0 * e2 + 2.0 * e3 + e4) / 6.0
    prev = pndm_transfer(sched, sample, eps_prime, t, t_prev)
    ets = (state.ets + (e1,))[-4:]
    return prev, PNDMState(ets=ets, cur_sample=prev,
                           counter=state.counter + 1)
