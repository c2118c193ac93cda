"""In-process multi-config A/B harness for the staged eval (round 5b).

One profile_eval-style startup (trainer build + warm train + ball grid)
costs ~16 min over the tunnel even fully cache-warm; running one lever
per process made each A/B a 20-40 min affair. The staged-eval levers
(DFTPU_EVAL_SCATTER / DFTPU_EVAL_GROUP / DFTPU_EVAL_TIMING) are all read
at make_staged_grid_eval CALL time, so this script pays the startup once
and then builds a fresh staged renderer per named config, timing 2 warm +
2 measured frames each. Compiles land in the shared persistent cache.

Usage: python scripts/eval_ab.py --H 800 --configs base,scatter,timing
Named configs (comma list): base, scatter, g4096, g16384, timing,
timing_scatter, f32tab.
"""
import argparse
import json
import os
import time

import jax
import jax.numpy as jnp

CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

CONFIGS = {
    "base": {},
    "scatter": {"DFTPU_EVAL_SCATTER": "1"},
    "g2048": {"DFTPU_EVAL_GROUP": "2048"},
    "g4096": {"DFTPU_EVAL_GROUP": "4096"},
    "g16384": {"DFTPU_EVAL_GROUP": "16384"},
    "g4096_scatter": {"DFTPU_EVAL_GROUP": "4096", "DFTPU_EVAL_SCATTER": "1"},
    "timing": {"DFTPU_EVAL_TIMING": "1"},
    "timing_scatter": {"DFTPU_EVAL_TIMING": "1", "DFTPU_EVAL_SCATTER": "1"},
    "timing_g4096": {"DFTPU_EVAL_TIMING": "1", "DFTPU_EVAL_GROUP": "4096"},
    "f32tab": {"_f32tab": "1"},       # cfg flag, not env
    # live-margin ladder on top of the measured-best g4096+scatter combo
    "m20": {"DFTPU_EVAL_GROUP": "4096", "DFTPU_EVAL_SCATTER": "1",
            "DFTPU_EVAL_LIVE_MARGIN": "2.0"},
    "m15": {"DFTPU_EVAL_GROUP": "4096", "DFTPU_EVAL_SCATTER": "1",
            "DFTPU_EVAL_LIVE_MARGIN": "1.5"},
    "m12": {"DFTPU_EVAL_GROUP": "4096", "DFTPU_EVAL_SCATTER": "1",
            "DFTPU_EVAL_LIVE_MARGIN": "1.2"},
    "m10": {"DFTPU_EVAL_GROUP": "4096", "DFTPU_EVAL_SCATTER": "1",
            "DFTPU_EVAL_LIVE_MARGIN": "1.0"},
}

_LEVER_KEYS = ("DFTPU_EVAL_SCATTER", "DFTPU_EVAL_GROUP",
               "DFTPU_EVAL_TIMING", "DFTPU_EVAL_LIVE_MARGIN")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--H", type=int, default=800)
    ap.add_argument("--warm_steps", type=int, default=40)
    ap.add_argument("--configs", default="base,scatter")
    ap.add_argument("--frames", type=int, default=2)
    args = ap.parse_args()

    from dreamfusion_tpu.config import Config
    from dreamfusion_tpu.training.trainer import (Trainer,
                                                  make_staged_grid_eval)

    ws = f"/tmp/eval_ab_ws_{os.getpid()}"
    cfg = Config(text="a DSLR photo of a hamburger", guidance="none",
                 backbone="grid", grid_ray=True, h=64, w=64, iters=10000,
                 dir_text=True, fp16=True, max_steps=512, grid_K=128,
                 grid_size=128, lambda_orient=0.0,
                 workspace=ws).finalize()
    trainer = Trainer("evalab", cfg, use_checkpoint="scratch")
    trainer.train(max_steps=args.warm_steps, log_interval=10 ** 9,
                  checkpoint_at_end=False)

    from dreamfusion_tpu.ops.marching import GridState, update_grid

    def ball_density(x):
        r = jnp.linalg.norm(x, axis=-1)
        return {"sigma": jnp.where(r < 0.4, 150.0, 0.0)}

    gs = GridState(
        density_grid=jnp.zeros_like(trainer.grid_state.density_grid),
        occ=jnp.zeros_like(trainer.grid_state.occ),
        mean_density=jnp.float32(0.0))
    grid_state = update_grid(ball_density, gs, jax.random.PRNGKey(7),
                             bound=cfg.bound,
                             density_thresh=cfg.density_thresh)
    print(f"startup done at {time.strftime('%H:%M:%S')}", flush=True)

    H = W = args.H
    rays_fn = trainer._get_test_rays_fn(100, H, W)
    from dreamfusion_tpu import cameras

    ref_img = None        # first config's last frame: quality reference
    for name in args.configs.split(","):
        patch = dict(CONFIGS[name])
        use_f32tab = patch.pop("_f32tab", None)
        old = {k: os.environ.get(k) for k in _LEVER_KEYS}
        try:
            for k in _LEVER_KEYS:
                os.environ.pop(k, None)
            os.environ.update(patch)
            c = (cfg.replace(eval_table_bf16=False) if use_f32tab else cfg)
            staged = make_staged_grid_eval(c, trainer.model, H, W)
            walls = []
            for f in range(2 + args.frames):
                batch = rays_fn(jnp.array([f]))
                rays_o = batch["rays_o"][0]
                rays_d = batch["rays_d"][0]
                light_d = cameras.safe_normalize(rays_o[0])
                t0 = time.perf_counter()
                out = staged(trainer.state.params, rays_o, rays_d,
                             grid_state, light_d=light_d)
                _ = float(jnp.sum(out["image"]))
                walls.append(time.perf_counter() - t0)
                print(f"  {name} frame {f}: {walls[-1]:.3f} s", flush=True)
            dt = sum(walls[2:]) / args.frames
            rec = {"config": name, "H": H, "sec_per_frame": round(dt, 3),
                   "fps": round(1.0 / dt, 4)}
            img = out["image"]
            if ref_img is None:
                ref_img = img
            else:    # truncation-lever quality: delta vs first config
                d_ = jnp.abs(img - ref_img)
                rec["img_mean_abs_delta"] = round(float(jnp.mean(d_)), 7)
                rec["img_max_abs_delta"] = round(float(jnp.max(d_)), 5)
            print(json.dumps(rec), flush=True)
        finally:
            for k, v in old.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v


if __name__ == "__main__":
    main()
