"""Decompose ONE staged-eval compact shade at production shapes (r5b).

t1 stage walls put the shade stage at ~70% of the real 800^2 frame
(~100 ms per group-shade at Mb=48*8192), while its parts microbench at
~15 ms standalone. This runs the REAL shade program (shade_march via the
same closure the staged eval compiles) and its components separately at
identical shapes, so the gap is attributed by measurement:

  full          — the production compact shade (field + composite + paste)
  field_only    — encode(16 levels, bf16 view) + sigma/color MLP at M
  encode_only   — hash encode alone at M
  compact_map   — make_compact_map + the t/o/d compact takes
  composite     — composite_compact (log-cumsum + matmul_scatter reduce)

Wall timing over ITERS chained dispatches, one D2H sync (NOTES.md rules).
"""
import json
import os
import time

import jax
import jax.numpy as jnp

CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ITERS = int(os.environ.get("MB_ITERS", "20"))
GROUP = 8192
K = 128
MB = 48 * GROUP          # the t1 frame's dominant bucket
MEAN_COUNT = 40          # ~mean live in the ball frame


def timed(name, fn, *args):
    out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    _ = float(jnp.sum(leaf))
    t0 = time.perf_counter()
    for _i in range(ITERS):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    _ = float(jnp.sum(leaf))
    dt = (time.perf_counter() - t0) / ITERS
    print(json.dumps({"bench": name, "ms": round(dt * 1e3, 2)}), flush=True)
    return dt


def main():
    from dreamfusion_tpu.config import Config
    from dreamfusion_tpu.models import build_model
    from dreamfusion_tpu.models.networks import make_field_fns
    from dreamfusion_tpu.ops import marching as M

    cfg = Config(text="x", guidance="none", backbone="grid", grid_ray=True,
                 h=64, w=64, max_steps=512, grid_K=K, grid_size=128,
                 fp16=True, workspace="/tmp/mb_shade_ws").finalize()
    model = build_model(cfg)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((8, 3)),
                        jnp.ones((8, 3)) / 3 ** 0.5, method=model.init_all)
    model_bf16 = model.clone(table_bf16=True)

    # synthetic march output shaped like a ball-frame group: every ray
    # crosses the shell, count ~ MEAN_COUNT, prefix-valid
    kk = jax.random.split(key, 8)
    counts = jnp.clip(jax.random.poisson(kk[0], MEAN_COUNT, (GROUP,)), 1, K)
    slots = jnp.arange(K)[None, :]
    valid = slots < counts[:, None]
    nears = jnp.full((GROUP,), 0.6)
    ts = nears[:, None] + jnp.cumsum(
        jnp.full((GROUP, K), 0.007), axis=1) * valid
    dts = jnp.full((GROUP, K), 0.007) * valid
    m = M.MarchOut(ts=ts, dts=dts, valid=valid, counts=counts)
    o = jnp.zeros((GROUP, 3)) + jnp.array([0.0, 0.0, 1.3])
    d = jax.random.normal(kk[1], (GROUP, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    fars = jnp.full((GROUP,), 2.5)
    light_d = jnp.array([0.0, 0.0, 1.0])

    # -- full production shade (the staged eval's jitted body) -------------
    @jax.jit
    def full(params, ts, dts, valid, o, d, nears, fars):
        mm = M.MarchOut(ts=ts, dts=dts, valid=valid,
                        counts=valid.sum(axis=1))
        fns = make_field_fns(model_bf16, params)._replace(normal=None)
        return M.shade_march(
            fns, mm, o, d, nears, fars, K=K, bound=cfg.bound,
            light_d=light_d, ambient_ratio=1.0, shading_code=0,
            bg_radius=cfg.bg_radius, bg_color=None,
            pallas_composite=cfg.pallas_composite,
            compact_M=MB, compact_composite=True)["image"]

    timed("full_shade_M48", full, params, ts, dts, valid, o, d, nears, fars)

    # -- compact map + takes ----------------------------------------------
    @jax.jit
    def cmap_takes(ts, dts, valid, o, d):
        counts = valid.sum(axis=1)
        cmap = M.make_compact_map(counts, K, MB)
        t_c = jnp.take(ts.reshape(-1), cmap.fwd_flat)
        dt_c = jnp.take(dts.reshape(-1), cmap.fwd_flat)
        o_c = jnp.take(o, cmap.ray_of_m, axis=0)
        d_c = jnp.take(d, cmap.ray_of_m, axis=0)
        return t_c + dt_c + o_c.sum(-1) + d_c.sum(-1)

    timed("cmap_and_takes", cmap_takes, ts, dts, valid, o, d)

    # -- encode only at M --------------------------------------------------
    x_c = jax.random.uniform(kk[2], (MB, 3), minval=-0.45, maxval=0.45)

    @jax.jit
    def encode_only(params, x):
        return model_bf16.apply(params, x, method=model_bf16.encode)

    timed("encode_16lvl_M48", encode_only, params, x_c)

    # -- density path only (encode + sigma MLP) at M -----------------------
    @jax.jit
    def density_only(params, x):
        return model_bf16.apply(params, x, method=model_bf16.density)

    timed("density_M48", density_only, params, x_c)

    # -- composite only ----------------------------------------------------
    @jax.jit
    def composite_only(ts, dts, valid, sigma_c_seed):
        counts = valid.sum(axis=1)
        cmap = M.make_compact_map(counts, K, MB)
        t_c = jnp.take(ts.reshape(-1), cmap.fwd_flat)
        dt_c = jnp.take(dts.reshape(-1), cmap.fwd_flat)
        sigma_c = jnp.abs(sigma_c_seed)
        color_c = jnp.stack([sigma_c, sigma_c, sigma_c], axis=-1)
        rgb, ws, depth, live = M.composite_compact(
            sigma_c, color_c, t_c, dt_c, cmap, GROUP, T_thresh=1e-4)
        return rgb

    sigma_seed = jax.random.normal(kk[3], (MB,))
    timed("composite_compact_M48", composite_only, ts, dts, valid,
          sigma_seed)

    # -- in-frame shape: alternate programs + fresh operands ---------------
    # The frame issues march, shade, march, shade... with different buffers
    # each time; the chained single-program loop above may amortize a
    # per-dispatch or program-switch cost the frame pays in full. Cycle 4
    # distinct input sets through shade alternated with density calls.
    inputs = []
    for i in range(4):
        ki = jax.random.fold_in(key, 100 + i)
        ci = jnp.clip(jax.random.poisson(ki, MEAN_COUNT, (GROUP,)), 1, K)
        vi = slots < ci[:, None]
        tsi = nears[:, None] + jnp.cumsum(
            jnp.full((GROUP, K), 0.007), axis=1) * vi
        dtsi = jnp.full((GROUP, K), 0.007) * vi
        di = jax.random.normal(ki, (GROUP, 3))
        di = di / jnp.linalg.norm(di, axis=-1, keepdims=True)
        inputs.append((tsi, dtsi, vi, di))

    def alternating():
        outs = []
        for tsi, dtsi, vi, di in inputs:
            outs.append(full(params, tsi, dtsi, vi, o, di, nears, fars))
            outs.append(density_only(params, x_c))
        return outs[-2]           # the last shade image (density is a dict)

    out = alternating()
    _ = float(jnp.sum(out))
    t0 = time.perf_counter()
    reps = max(ITERS // 4, 1)
    for _i in range(reps):
        out = alternating()
    _ = float(jnp.sum(out))
    per_pair = (time.perf_counter() - t0) / (reps * 4)
    print(json.dumps({"bench": "alternate_shade_plus_density",
                      "ms_per_pair": round(per_pair * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
