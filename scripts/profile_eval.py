"""Profile one staged-eval frame on the real TPU (VERDICT r2 next #3:
'finish the investigation' of where the 8.4 s @ 512^2 frame goes).

Builds the bench-shaped trainer (guidance=none — the eval path never touches
guidance), warms the grid with a few train steps + refreshes, renders warm
frames, then captures a jax.profiler device trace of N measured frames and
prints (a) wall-clock per frame, (b) device-time per op name from the
perfetto trace — the tunnel-safe attribution method (NOTES.md: trust traces
over wall deltas here).

Usage: python scripts/profile_eval.py [--H 512] [--frames 2] [--out /tmp/tr]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--H", type=int, default=512)
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--warm_steps", type=int, default=40)
    ap.add_argument("--out", default="/tmp/trace_eval")
    ap.add_argument("--cache_dir", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    ap.add_argument("--no_trace", action="store_true",
                    help="wall-clock only (skip the profiler)")
    ap.add_argument("--opacify", action="store_true",
                    help="train with a NEGATIVE opacity penalty so the "
                         "field becomes opaque like a trained scene — the "
                         "regime the reference's ~10 FPS (readme.md:21) is "
                         "measured in, where transmittance-live buckets "
                         "and tight emit windows actually engage. NOTE: "
                         "with random guidance this opacifies EVERYWHERE "
                         "(occ -> 1.0, the worst case); --ball builds the "
                         "trained-scene work shape instead")
    ap.add_argument("--no_table_bf16", action="store_true",
                    help="A/B: shade with f32 hash tables (eval_table_bf16 "
                         "defaulted on in d792e96 without a device A/B; "
                         "bf16's (2,1) sublane packing may slow the row "
                         "gathers that dominate the shade stage)")
    ap.add_argument("--ball", action="store_true",
                    help="overwrite the grid state with an analytic "
                         "opaque ball (r=0.4, sigma=150): occupancy, emit "
                         "windows, and live estimates take the shape of a "
                         "TRAINED scene while shading still queries the "
                         "real field — the honest work-shape benchmark "
                         "for the reference's trained-scene ~10 FPS")
    args = ap.parse_args()

    os.makedirs(args.cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", args.cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dreamfusion_tpu.config import Config
    from dreamfusion_tpu.training.trainer import Trainer

    ws = f"/tmp/prof_eval_ws_{os.getpid()}"
    cfg = Config(text="a DSLR photo of a hamburger", guidance="none",
                 backbone="grid", grid_ray=True, h=64, w=64, iters=10000,
                 dir_text=True, fp16=True, max_steps=512, grid_K=128,
                 grid_size=128, lambda_orient=0.0,
                 lambda_opacity=(-1.0 if args.opacify else 0.0),
                 eval_table_bf16=not args.no_table_bf16,
                 workspace=ws).finalize()
    trainer = Trainer("prof", cfg, use_checkpoint="scratch")
    trainer.train(max_steps=args.warm_steps, log_interval=10 ** 9,
                  checkpoint_at_end=False)
    if args.ball:
        from dreamfusion_tpu.ops.marching import GridState, update_grid

        def ball_density(x):
            r = jnp.linalg.norm(x, axis=-1)
            return {"sigma": jnp.where(r < 0.4, 150.0, 0.0)}

        gs = GridState(
            density_grid=jnp.zeros_like(trainer.grid_state.density_grid),
            occ=jnp.zeros_like(trainer.grid_state.occ),
            mean_density=jnp.float32(0.0))
        trainer.grid_state = update_grid(
            ball_density, gs, jax.random.PRNGKey(7), bound=cfg.bound,
            density_thresh=cfg.density_thresh)
    occ_frac = float(jnp.mean(trainer.grid_state.occ.astype(jnp.float32)))
    print(f"occupancy fraction after warm: {occ_frac:.4f}", flush=True)

    H = args.H
    # warm every program the frame touches (2 poses)
    for w in (0, 1):
        out = trainer._render_orbit_frame(w, 100, H, H)
        _ = float(jnp.sum(out["image"]))
        print(f"warm frame {w} done", flush=True)

    # sec_per_frame from the per-frame walls only: start/stop_trace write
    # multi-MB perfetto files (~2.3 s measured) and must stay OUTSIDE the
    # reported number (earlier logs mixed them in: 1.08 s frames reported
    # as 3.56 s/frame)
    if not args.no_trace:
        jax.profiler.start_trace(args.out, create_perfetto_trace=True)
    frame_walls = []
    for f in range(args.frames):
        tf = time.perf_counter()
        out = trainer._render_orbit_frame(2 + f, 100, H, H)
        _ = float(jnp.sum(out["image"]))
        frame_walls.append(time.perf_counter() - tf)
        print(f"frame {f}: {frame_walls[-1]:.3f} s", flush=True)
    if not args.no_trace:
        jax.profiler.stop_trace()
    dt = sum(frame_walls) / len(frame_walls)
    print(json.dumps({"H": H, "sec_per_frame": round(dt, 3),
                      "fps": round(1.0 / dt, 4)}), flush=True)

    if not args.no_trace:
        summarize(args.out)


def summarize(trace_dir, top=30):
    hits = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True))
    if not hits:
        print("no perfetto trace found under", trace_dir)
        return
    with gzip.open(hits[-1], "rt") as f:
        tr = json.load(f)
    # device-time by op name: sum complete events on TPU device tracks
    pid_names = {e.get("pid"): e["args"].get("name", "")
                 for e in tr["traceEvents"]
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    dur_by_name = {}
    total = 0.0
    for e in tr["traceEvents"]:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "tpu" not in pname:
            continue
        name = e.get("name", "?")
        # leaf kernels only — jit_* / bare-digit / conditional rows are
        # CONTAINERS of the fusions below them; summing both double-counts
        # (an earlier log summed 2.1 s device "per 1.08 s frame")
        if (name.startswith("jit_") or name.isdigit()
                or name.startswith("conditional")
                or name.startswith("cond")):
            continue
        d = e.get("dur", 0) / 1e3  # us -> ms
        dur_by_name[name] = dur_by_name.get(name, 0.0) + d
        total += d
    print(f"\ndevice time total: {total:.1f} ms  (top {top} ops)")
    for name, d in sorted(dur_by_name.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {d:10.2f} ms  {100 * d / max(total, 1e-9):5.1f}%  {name}")


if __name__ == "__main__":
    main()
