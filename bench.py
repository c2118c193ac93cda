"""Benchmark harness — prints ONE JSON line.

Metric of record (BASELINE.md): rays/sec at 512x512 through the
occupancy-grid renderer on the flagship grid backbone. Reference baseline:
~10 FPS at 800x800 on V100 (readme.md:21) = 6.4e6 rays/sec.

Once SD guidance carries real-size UNet weights the headline flips to SDS
iters/sec (reference: 10k steps ~3h on V100 = 0.93 it/s).

Implementation notes: ray chunks are dispatched from a python loop over ONE
jitted chunk function (lax.map chunking compiles ~15x slower on this TPU for
identical steady-state throughput), and the occupancy refresh runs unchunked.
"""

import json
import time

import jax
import jax.numpy as jnp

REFERENCE_RAYS_PER_SEC = 800 * 800 * 10  # readme.md:21


def main():
    from dreamfusion_tpu import cameras
    from dreamfusion_tpu.config import Config
    from dreamfusion_tpu.models import build_model
    from dreamfusion_tpu.models.networks import make_field_fns
    from dreamfusion_tpu.ops.marching import (init_grid_state, render_grid,
                                              update_grid)

    H = W = 512
    cfg = Config(backbone="grid", grid_ray=True, max_steps=512, grid_K=128,
                 bg_radius=1.4)
    model = build_model(cfg)
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((8, 3))
    d0 = jnp.ones((8, 3)) / jnp.sqrt(3.0)
    params = model.init(key, x0, d0, method=model.init_all)

    grid_state = init_grid_state(cfg.cascade, cfg.grid_size, cfg.density_thresh)
    fns_d = make_field_fns(model, params, bg=False)
    upd = jax.jit(lambda gs, k: update_grid(fns_d.density, gs, k,
                                            bound=cfg.bound,
                                            density_thresh=cfg.density_thresh,
                                            chunk=None))
    grid_state = upd(grid_state, key)
    jax.block_until_ready(grid_state)

    batch = cameras.sample_test_batch(jnp.array([0]), 100, cfg, H=H, W=W)
    rays_o = batch["rays_o"][0]
    rays_d = batch["rays_d"][0]

    # 8192 rays x K=128 = 1M field-query points per dispatch
    chunk = 8192

    @jax.jit
    def render_chunk(params, grid_state, ro, rd):
        fns = make_field_fns(model, params)._replace(normal=None)
        out = render_grid(jax.random.PRNGKey(0), fns, grid_state, ro, rd,
                          bound=cfg.bound, min_near=cfg.min_near,
                          max_steps=cfg.max_steps, K=cfg.grid_K,
                          bg_radius=cfg.bg_radius)
        return out["image"]

    ro = rays_o.reshape(-1, chunk, 3)
    rd = rays_d.reshape(-1, chunk, 3)

    def render_frame():
        return [render_chunk(params, grid_state, ro[i], rd[i])
                for i in range(ro.shape[0])]

    jax.block_until_ready(render_frame())  # compile warmup

    n_frames = 3
    t0 = time.perf_counter()
    for _ in range(n_frames):
        tiles = render_frame()
    jax.block_until_ready(tiles)
    dt = time.perf_counter() - t0
    rays_per_sec = n_frames * H * W / dt

    print(json.dumps({
        "metric": "rays_per_sec_512",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / REFERENCE_RAYS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
