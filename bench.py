"""Benchmark harness — prints ONE JSON line.

Metric of record (BASELINE.md / BASELINE.json): SDS training iterations per
second for the full `-O` pipeline — grid backbone + occupancy-grid renderer
at 64x64 + Stable-Diffusion guidance with an SD-v1.5-sized UNet/VAE (random
weights unless --sd_weights; identical FLOPs/memory to the real model).
Reference baseline: 10k steps in ~3 h on V100 (readme.md:20) = 0.926 it/s.

Timing notes (see NOTES.md): this TPU is reached through a tunnel where
block_until_ready does not reliably wait, so each step is synced by pulling
a scalar metric to host (~28 ms tunnel latency per pull, subtracted via the
measured floor).
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp

REFERENCE_ITERS_PER_SEC = 10000 / (3 * 3600)  # readme.md:20


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sd_weights", default="random-full")
    ap.add_argument("--steps", type=int, default=10)
    args, _ = ap.parse_known_args()

    from dreamfusion_tpu.config import Config
    from dreamfusion_tpu.guidance import build_guidance
    from dreamfusion_tpu.models import build_model
    from dreamfusion_tpu.ops.marching import (init_grid_state,
                                              make_update_extra_state)
    from dreamfusion_tpu.training.optimizers import build_optimizer
    from dreamfusion_tpu.training.trainer import TrainState, make_train_step

    cfg = Config(text="a DSLR photo of a hamburger",
                 guidance="stable-diffusion", sd_weights=args.sd_weights,
                 backbone="grid", grid_ray=True, h=64, w=64, iters=10000,
                 dir_text=True, fp16=True, max_steps=512, grid_K=128,
                 lambda_orient=0.0).finalize()
    model = build_model(cfg)
    guidance = build_guidance(cfg)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((8, 3)), jnp.ones((8, 3)) / 3 ** 0.5,
                        method=model.init_all)
    tx = build_optimizer(cfg, params)
    state = TrainState(step=jnp.int32(0), params=params,
                       opt_state=tx.init(params), key=key)
    gs = init_grid_state(cfg.cascade, cfg.grid_size, cfg.density_thresh)
    upd = make_update_extra_state(cfg, model)
    gs = upd(params, gs, key)
    step_fn = make_train_step(cfg, model, guidance, tx, renderer="grid")
    text_z = jnp.zeros((6,) + guidance.get_text_embeds(["x"], ["y"]).shape[1:])

    # warmup/compile
    state, metrics = step_fn(state, guidance.params, text_z, None, gs)
    _ = float(metrics["loss"])

    # measure the D2H sync floor (after warmup; lane-aligned array — tiny
    # 1-D transfers have tripped backend errors on this tunnel)
    trivial = jax.jit(lambda x: jnp.sum(x))
    _ = float(trivial(jnp.ones((8, 128))))
    t0 = time.perf_counter()
    for _ in range(5):
        _ = float(trivial(jnp.ones((8, 128))))
    d2h_floor = (time.perf_counter() - t0) / 5

    times = []
    for i in range(args.steps):
        if i % cfg.update_extra_interval == 0:
            gs = upd(state.params, gs, jax.random.fold_in(key, i))
        t0 = time.perf_counter()
        state, metrics = step_fn(state, guidance.params, text_z, None, gs)
        _ = float(metrics["loss"])  # forced sync
        times.append(time.perf_counter() - t0)

    times.sort()
    dt = max(times[len(times) // 2] - d2h_floor, 1e-6)  # median minus sync floor
    it_per_sec = 1.0 / dt

    print(json.dumps({
        "metric": "sds_iters_per_sec",
        "value": round(it_per_sec, 3),
        "unit": "it/s",
        "vs_baseline": round(it_per_sec / REFERENCE_ITERS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
