"""Training loop: one jitted step containing render + guidance + losses +
optimizer update.

Rebuilds the reference Trainer (nerf/utils.py:151-968) TPU-first:
- The reference's hot loop (train_one_epoch -> train_step -> render ->
  guidance.train_step -> scaler backward, nerf/utils.py:673-725) becomes ONE
  jitted function; camera sampling, shading schedule, rendering, guidance,
  regularizers, grads and the optimizer update all trace into a single XLA
  program. No per-step host sync (the reference `.item()`s every step,
  nerf/utils.py:715).
- AMP GradScaler is unnecessary on TPU (bf16 has fp32 range); EMA is an
  optax-style tree map (vs torch_ema, nerf/utils.py:233).
- Checkpoints are a single orbax pytree {params, opt_state, ema, step}
  with rotation + best tracking (vs nerf/utils.py:847-968).

Shading schedule (nerf/utils.py:346-359): albedo-only until albedo_iters,
then 20% albedo / 40% textureless / 40% lambertian with ambient ratio 0.1.
"""

from __future__ import annotations

import json
import os
import time
from functools import partial
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from dreamfusion_tpu import cameras
from dreamfusion_tpu.config import Config
from dreamfusion_tpu.guidance import Guidance, build_guidance
from dreamfusion_tpu.models.networks import (SHADING_ALBEDO,
                                             SHADING_LAMBERTIAN,
                                             SHADING_TEXTURELESS, _BaseNeRF,
                                             build_model, make_field_fns)
from dreamfusion_tpu.renderer import render_rays_chunked, render_stratified
from dreamfusion_tpu.training.optimizers import build_optimizer, ema_update


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    key: Optional[jax.Array] = None     # PRNG state threads through the step
    ema_params: Optional[Any] = None


def _shading_schedule(key: jax.Array, step: jax.Array, albedo_iters: int):
    """(shading_code, ambient_ratio) for this step (nerf/utils.py:346-359)."""
    r = jax.random.uniform(key)
    code_late = jnp.where(r > 0.8, SHADING_ALBEDO,
                          jnp.where(r > 0.4, SHADING_TEXTURELESS,
                                    SHADING_LAMBERTIAN))
    code = jnp.where(step < albedo_iters, SHADING_ALBEDO, code_late)
    ratio = jnp.where(code == SHADING_ALBEDO, 1.0, 0.1)
    return code, ratio


def make_grads_fn(cfg: Config, model: _BaseNeRF, guidance: Guidance,
                  renderer: str = "stratified", grid_K: Optional[int] = None,
                  compact_M: Optional[int] = None):
    """Build grads_fn(params, step, gparams, text_z, key, grid_state) ->
    (loss, metrics, grads): camera sampling + shading schedule + render +
    guidance + regularizers + value_and_grad, with no optimizer coupling so
    it can be wrapped by parallel.data_parallel_grads.

    grid_K overrides cfg.grid_K (the adaptive sample-budget path: the
    reference scales per-step compute with occupancy via its mean_count
    budget, raymarching.py:200-231; here the Trainer picks a bucketed K
    from marching-count stats at each grid refresh).

    compact_M: global sample budget for the field query (sample compaction,
    ops/marching.py) — the Trainer buckets it from the measured mean count
    so the encoder fwd/bwd scale with mean occupancy, not the q95 K."""
    compute_orient = cfg.lambda_orient > 0
    compute_smooth = cfg.lambda_smooth > 0
    grid_K = grid_K or cfg.grid_K

    def grads_fn(params_in, step, gparams, text_z, key, grid_state):
        k_batch, k_shade, k_bg, k_render, k_guid = jax.random.split(key, 5)
        batch = cameras.sample_train_batch(k_batch, cfg)
        B = cfg.batch_size
        N = cfg.h * cfg.w
        rays_o = batch["rays_o"].reshape(B * N, 3)
        rays_d = batch["rays_d"].reshape(B * N, 3)

        code, ratio = _shading_schedule(k_shade, step, cfg.albedo_iters)
        bg_color = jax.random.uniform(k_bg, (B * N, 3))  # per-pixel random bg
                                                         # (nerf/utils.py:362)

        def loss_fn(params):
            fns = make_field_fns(model, params)
            if not compute_smooth:
                fns = fns._replace(normal=None)
            if renderer == "grid":
                from dreamfusion_tpu.ops.marching import render_grid

                out = render_grid(
                    k_render, fns, grid_state, rays_o, rays_d,
                    bound=cfg.bound, min_near=cfg.min_near,
                    max_steps=cfg.max_steps, K=grid_K,
                    dt_gamma=cfg.dt_gamma, bg_radius=cfg.bg_radius,
                    ambient_ratio=ratio, shading_code=code,
                    bg_color=bg_color, perturb=True,
                    pallas_composite=cfg.pallas_composite,
                    compute_normal_losses=compute_orient or compute_smooth,
                    compact_M=compact_M)
            else:
                out = render_stratified(
                    k_render, fns, rays_o, rays_d, bound=cfg.bound,
                    min_near=cfg.min_near, num_steps=cfg.num_steps,
                    upsample_steps=cfg.upsample_steps, bg_radius=cfg.bg_radius,
                    ambient_ratio=ratio, shading_code=code, bg_color=bg_color,
                    perturb=True,
                    compute_normal_losses=compute_orient or compute_smooth)

            pred_rgb = out["image"].reshape(B, cfg.h, cfg.w, 3)
            pred_ws = out["weights_sum"].reshape(B, N)

            if cfg.dir_text:
                tz = text_z[batch["dir"]]
            else:
                tz = jnp.broadcast_to(text_z[:1], (B,) + text_z.shape[1:])
            g_loss = guidance.loss(gparams, tz, pred_rgb, k_guid)

            loss = g_loss
            metrics = {"loss_guidance": g_loss}
            if cfg.lambda_opacity != 0:  # (nerf/utils.py:385-387); negative
                # = opacity REWARD (scripts/profile_eval.py --opacify uses
                # it to build a trained-like opaque benchmark state)
                l_op = jnp.mean(pred_ws ** 2)
                loss = loss + cfg.lambda_opacity * l_op
                metrics["loss_opacity"] = l_op
            if cfg.lambda_entropy > 0:  # binary entropy (nerf/utils.py:389-394)
                a = jnp.clip(pred_ws, 1e-5, 1 - 1e-5)
                l_ent = jnp.mean(-a * jnp.log2(a) - (1 - a) * jnp.log2(1 - a))
                loss = loss + cfg.lambda_entropy * l_ent
                metrics["loss_entropy"] = l_ent
            if compute_orient and "loss_orient" in out:
                loss = loss + cfg.lambda_orient * out["loss_orient"]
                metrics["loss_orient"] = out["loss_orient"]
            if compute_smooth and "loss_smooth" in out:
                loss = loss + cfg.lambda_smooth * out["loss_smooth"]
                metrics["loss_smooth"] = out["loss_smooth"]
            metrics["mean_opacity"] = jnp.mean(pred_ws)
            metrics["shading_code"] = code
            if "count_q95" in out:
                metrics["count_q95"] = out["count_q95"]
            if "live_q95" in out:
                metrics["live_q95"] = out["live_q95"]
            if "mean_count" in out:   # utilization diagnostics: how full the
                metrics["mean_count"] = out["mean_count"]  # [N, K] slots are
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params_in)
        return loss, metrics, grads

    return grads_fn


def make_train_step(cfg: Config, model: _BaseNeRF, guidance: Guidance,
                    tx, renderer: str = "stratified", mesh=None,
                    grid_K: Optional[int] = None,
                    compact_M: Optional[int] = None):
    """Build the jitted train step.

    step(state, guidance_params, text_z, key, grid_state=None)
      -> (new_state, metrics)

    With a mesh, grads are computed data-parallel over the 'data' axis
    (per-device camera batches, pmean'd grads) — the DDP analog (§2.4).
    grid_K / compact_M: see make_grads_fn (adaptive sample budgets).
    """
    grads_fn = make_grads_fn(cfg, model, guidance, renderer, grid_K=grid_K,
                             compact_M=compact_M)
    if mesh is not None:
        from dreamfusion_tpu.parallel.sharding import data_parallel_grads

        grads_fn = data_parallel_grads(grads_fn, mesh)

    def train_step(state: TrainState, gparams, text_z, key=None,
                   grid_state=None):
        # key=None: derive from the state's threaded PRNG (no host dispatch)
        if key is None:
            next_key, key = jax.random.split(state.key)
        else:
            next_key = state.key
        loss, metrics, grads = grads_fn(state.params, state.step, gparams,
                                        text_z, key, grid_state)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        ema = state.ema_params
        if ema is not None and cfg.ema_decay:
            ema = ema_update(ema, params, cfg.ema_decay)
        metrics["loss"] = loss
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state, key=next_key,
                               ema_params=ema)
        return new_state, metrics

    # NOT donated: the occupancy-grid refresh reads state.params between
    # steps, and donating those buffers on the next step races the pending
    # read on this backend (reproducible INVALID_ARGUMENT). The state copy
    # is ~20 MB/step — noise next to the step itself.
    return jax.jit(train_step)


def _pick_K_bucket(q95: float, cap: int) -> int:
    """Smallest static-K bucket covering the 95th-percentile marching count
    (shared by the Trainer's adaptive train budget and the staged eval)."""
    for b in (16, 32, 48, 64, 96, 128, 192, 256):
        if b >= min(q95, cap):
            return min(b, cap)
    return cap


def make_staged_grid_eval(cfg: Config, model: _BaseNeRF, H: int, W: int,
                          chunk: int = 65536, group: Optional[int] = None):
    """Sorted bucketed-K staged eval for the grid renderer — the TPU answer
    to the reference's alive-ray compaction loop (nerf/renderer.py:496-532).

    CUDA kills terminated rays in-place; with static shapes we instead:
    1. march every ray chunk once at the full K budget (occupancy gathers
       only, no field queries),
    2. SORT the frame's rays by marching count (device argsort; marched
       samples ride along through row gathers),
    3. shade fixed-size ray groups in sorted order, each at the smallest
       static-K bucket covering the group's max count — ONE D2H transfer
       fetches all group maxima. Groups with max count 0 (pure background,
       most of an orbit frame) skip the field entirely,
    4. scatter the shaded groups back through the inverse permutation.

    Per-chunk q95 bucketing (the first cut) barely helped: row-band chunks
    almost always cross the object, so every chunk paid K=128. Sorting
    makes the groups homogeneous, which is where the reference's per-ray
    early termination actually gets its win. One compilation per
    (K bucket, bg mode); python-loop dispatch (a traced lax.map compiles
    ~15x slower here for identical steady-state, NOTES.md)."""
    from dreamfusion_tpu.ops.composite import near_far_from_aabb
    from dreamfusion_tpu.ops.marching import MarchOut, march_rays, shade_march

    if group is None:
        # group-size ladder measured r5b at 800^2 (same tree, in-process):
        # 2048 -> 1.465, 4096 -> 1.587, 8192 -> 1.548, 16384 -> 1.410,
        # 32768 -> 1.341 FPS. Tighter span/live buckets beat per-dispatch
        # overhead down to 4096 (standalone alternation probe: program
        # switching costs ~0); 4096 is the measured optimum.
        group = int(os.environ.get("DFTPU_EVAL_GROUP", "4096"))

    # Scatter-assembled frame (default on, r5b): instead of permuting every
    # ray's payload through the sort, flagged groups gather o/d/t_lo by
    # SORTED RAY INDEX (group-sized gathers over the ~12% flagged rays),
    # shade, and scatter results back to UNSORTED frame buffers — which
    # also deletes the final unsort. The variadic sort carries (counts,
    # span) alongside the iota payload so group stats need no post-sort
    # gathers either. Measured (800^2 ball, in-process same-tree A/B):
    # 1.572 vs 1.548 FPS at group 8192; 1.643 vs 1.587 at group 4096.
    scatter_frame = os.environ.get("DFTPU_EVAL_SCATTER", "1") == "1"

    # DFTPU_EVAL_TIMING=1: sync (one scalar D2H) after every stage of the
    # frame and print per-stage walls. The device trace's per-op durations
    # carry a ~18 ms quantum even on constants (r5b: a [1,4,4] constant
    # fusion "took" 18.2 ms) while standalone microbenches run the same
    # gathers 25x faster — synced walls are the only trustworthy per-stage
    # attribution over this tunnel. Syncing serializes the pipeline, so
    # fps WITH timing on is not a result; use it only to rank stages.
    stage_timing = os.environ.get("DFTPU_EVAL_TIMING", "0") == "1"

    # eval-only bf16 hash-table view (cfg.eval_table_bf16): the shade
    # stage's level gathers are the frame's largest HBM block; the
    # reference evals under fp16 autocast, so this is its numeric regime
    if (getattr(cfg, "eval_table_bf16", False)
            and getattr(model, "table_bf16", None) is False):
        model = model.clone(table_bf16=True)

    # aabb_infer (gui sliders) narrows only the eval ray-box intersection,
    # never the train path (reference: nerf/gui.py:319-345 mutates
    # aabb_infer, not aabb_train)
    aabb = jnp.array(cfg.aabb_infer if cfg.aabb_infer is not None
                     else [-cfg.bound] * 3 + [cfg.bound] * 3, jnp.float32)

    @jax.jit
    def march_chunk(occ, o, d):
        nears, fars = near_far_from_aabb(o, d, aabb, cfg.min_near)
        m = march_rays(None, occ, o, d, nears, fars, bound=cfg.bound,
                       max_steps=cfg.max_steps, K=cfg.grid_K,
                       dt_gamma=cfg.dt_gamma, perturb=False)
        return m, nears, fars

    @jax.jit
    def sort_frame(counts, ts, dts, valid, o, d, nears, fars):
        perm = jnp.argsort(counts)                     # ascending: bg first
        take = lambda x: jnp.take(x, perm, axis=0)
        n_groups = counts.shape[0] // group
        gmax = jnp.take(counts, perm, axis=0).reshape(
            n_groups, group).max(axis=1)
        return (perm, gmax, take(ts), take(dts), take(valid), take(o),
                take(d), take(nears), take(fars))

    shade_cache: Dict[Any, Any] = {}

    def get_shade(Kb: int, with_bg: bool, shading_code: int = 0,
                  slice_paste: bool = False):
        """Shade one sorted ray group AND paste it into the frame buffers
        in the same program — over the axon tunnel each dispatch costs
        ~10-30 ms of issue latency, and the r3 eval trace showed ~half the
        800^2 frame wall was dispatch issue (3 dispatches per flagged
        group); folding the paste drops one.

        shading_code is STATIC (part of the program key): a traced code
        wraps the field query in a lax.cond — a fusion barrier whose
        operands round-trip HBM and whose unexecuted shaded branch still
        ships normals code (r3 eval trace: the cond was the largest single
        op container). Eval renders one shading mode per frame; GUI mode
        switches compile on demand and land in the persistent cache."""
        # the dt_gamma fallback (_render_full) pastes by slice into SORTED
        # buffers even when the scatter frame is the default — it passes
        # slice_paste=True; the key separates the two paste forms
        scatter = scatter_frame and not slice_paste
        key = (Kb, with_bg, shading_code, scatter)
        if key not in shade_cache:
            @jax.jit
            def shade(params, image, depth, ws, start, ts, dts, valid,
                      o, d, nears, fars, ambient_ratio, light_d, bg_color):
                m = MarchOut(ts=ts, dts=dts, valid=valid,
                             counts=valid.sum(axis=1))
                fns = make_field_fns(model, params)._replace(normal=None)
                bg = (jnp.broadcast_to(bg_color, (o.shape[0], 3))
                      if with_bg else None)
                out = shade_march(
                    fns, m, o, d, nears, fars, K=Kb, bound=cfg.bound,
                    light_d=light_d, ambient_ratio=ambient_ratio,
                    shading_code=shading_code, bg_radius=cfg.bg_radius,
                    bg_color=bg, pallas_composite=cfg.pallas_composite)
                if scatter:           # start is ridx [group]: unsorted paste
                    return (image.at[start].set(out["image"]),
                            depth.at[start].set(out["depth"]),
                            ws.at[start].set(out["weights_sum"]))
                up = lambda a, b: jax.lax.dynamic_update_slice_in_dim(
                    a, b, start, 0)
                return (up(image, out["image"]), up(depth, out["depth"]),
                        up(ws, out["weights_sum"]))

            shade_cache[key] = shade
        return shade_cache[key]

    def get_shade_compact(Mb: int, with_bg: bool, shading_code: int = 0):
        """Single-cascade shade at a GLOBAL compact sample budget: the
        field (encoder gathers + MLP) runs at Mb = bucket(mean live) *
        group samples instead of group * Kb dense slots — encoder row
        gathers, the dominant device cost of the r3 ball-trace shade,
        scale with the group's MEAN transmittance-live count rather than
        its max bucket. One program per (M bucket, bg, code); the column
        budget stays cfg.grid_K (dense compositing over [group, K] is
        gather-free and cheap)."""
        key = ("c", Mb, with_bg, shading_code)
        if key not in shade_cache:
            @jax.jit
            def shade(params, image, depth, ws, start, ts, dts, valid,
                      o, d, nears, fars, ambient_ratio, light_d, bg_color):
                m = MarchOut(ts=ts, dts=dts, valid=valid,
                             counts=valid.sum(axis=1))
                fns = make_field_fns(model, params)._replace(normal=None)
                bg = (jnp.broadcast_to(bg_color, (o.shape[0], 3))
                      if with_bg else None)
                out = shade_march(
                    fns, m, o, d, nears, fars, K=cfg.grid_K,
                    bound=cfg.bound, light_d=light_d,
                    ambient_ratio=ambient_ratio,
                    shading_code=shading_code, bg_radius=cfg.bg_radius,
                    bg_color=bg, pallas_composite=cfg.pallas_composite,
                    compact_M=Mb, compact_composite=True)
                if scatter_frame:     # start is ridx [group]: unsorted paste
                    return (image.at[start].set(out["image"]),
                            depth.at[start].set(out["depth"]),
                            ws.at[start].set(out["weights_sum"]))
                up = lambda a, b: jax.lax.dynamic_update_slice_in_dim(
                    a, b, start, 0)
                return (up(image, out["image"]), up(depth, out["depth"]),
                        up(ws, out["weights_sum"]))

            shade_cache[key] = shade
        return shade_cache[key]

    bg_cache: Dict[bool, Any] = {}
    _warmed: set = set()

    def get_bg_only(with_bg: bool):
        """count==0 groups: image = background directly, weights_sum = 0,
        depth = 0 — NO field query (renderer.py:535-544 semantics when no
        sample survives)."""
        if with_bg not in bg_cache:
            @jax.jit
            def bg_only(params, packed_s, bg_color):
                # scatter mode passes the raw (unsorted, padded) directions
                d = packed_s if scatter_frame else packed_s[:, 3:6]
                n = d.shape[0]
                if cfg.bg_radius > 0:
                    fns = make_field_fns(model, params)
                    bg = fns.background(d)
                elif with_bg:
                    bg = jnp.broadcast_to(bg_color, (n, 3))
                else:
                    bg = jnp.ones((n, 3), jnp.float32)
                return {"image": bg, "depth": jnp.zeros((n,)),
                        "weights_sum": jnp.zeros((n,))}

            bg_cache[with_bg] = bg_only
        return bg_cache[with_bg]

    # -- counting pass (v5) ----------------------------------------------------
    # v4.1 probed the FINE dilated lattice at stride 2 for every ray
    # (max_steps/2 probes x H*W rays = 164M gathers at 800^2 — 1.64 s of
    # the 5.3 s frame, r3 trace) and inflated shade buckets by the
    # conservative (stride+1) count factor (a 40-count ray shaded at
    # bucket 128). v5 splits the roles:
    #   classify: probe a POOLED (factor^3 max + 3^3 dilate, pool_occ)
    #     grid at a much larger sound stride — ~16x fewer probes; zero is
    #     still a PROOF of emptiness, and the coarse hit count still
    #     sorts rays well enough for group homogeneity;
    #   bucket: each flagged group's shade bucket comes from its EXACT
    #     march counts AND a transmittance-live estimate (probe_density
    #     on the grid's sigma EMA with a 3x log-space safety margin —
    #     samples past T_est have ~zero weight, the CUDA early break,
    #     raymarching.cu:557), fetched for ALL groups in ONE transfer
    #     after the marches are queued.
    # C>1 keeps exact stride-1 fine probes; dt_gamma>0 keeps the
    # march-everything fallback.
    from dreamfusion_tpu.ops.marching import (SQRT3, coarse_hit_counts,
                                              coarse_hit_window, dilate_occ,
                                              march_rays_window,
                                              max_coarse_stride,
                                              max_pooled_stride, pool_occ,
                                              probe_density)

    coarse_ok = cfg.dt_gamma == 0.0
    pool_factor = 4 if cfg.cascade == 1 else 1
    if pool_factor > 1:
        stride = min(max_pooled_stride(cfg.max_steps, cfg.grid_size,
                                       pool_factor), 16)
    else:
        stride = min(2, max_coarse_stride(cfg.max_steps, cfg.grid_size)) \
            if cfg.cascade == 1 else 1
    dt_lattice = 2.0 * SQRT3 / cfg.max_steps
    # windowed-march lattice-length ladder (march cost and the compaction
    # sort scale with S; the coarse window brackets all emits, so most
    # groups march far fewer than max_steps lattice points)
    S_ladder = sorted({max(cfg.max_steps // 8, 1), cfg.max_steps // 4,
                       (3 * cfg.max_steps) // 8, cfg.max_steps // 2,
                       (5 * cfg.max_steps) // 8, (3 * cfg.max_steps) // 4,
                       cfg.max_steps})

    @jax.jit
    def count_sort(occ, o, d):
        pad = (-o.shape[0]) % group                # pad INSIDE the jit: one
        if pad:                                    # dispatch, not two eager
            o = jnp.concatenate(                   # concats over the tunnel
                [o, jnp.zeros((pad, 3))], 0)
            d = jnp.concatenate([d, jnp.ones((pad, 3)) / 3 ** 0.5], 0)
        nears, fars = near_far_from_aabb(o, d, aabb, cfg.min_near)
        if pool_factor > 1:
            grid = pool_occ(occ, pool_factor)
        else:
            grid = dilate_occ(occ) if stride > 1 else occ
        counts, t_lo, t_hi = coarse_hit_window(
            grid, o, d, nears, fars, bound=cfg.bound,
            max_steps=cfg.max_steps, stride=stride)
        span_steps = jnp.ceil((t_hi - t_lo) / dt_lattice) + 2.0
        # sort key = (count, span): same-count rays cluster by emit-window
        # length so a group's max span (its march lattice bucket) is not
        # inflated by one grazing ray
        key = counts.astype(jnp.float32) * 4096.0 + jnp.minimum(
            span_steps, 4095.0)
        perm = jnp.argsort(key)                    # ascending: bg first
        # ONE row-gather moves all per-ray data through the permutation:
        # four separate takes ([N,3] twice + two 1-D) ran at element-gather
        # speed (~10 ms each at 800^2, r4 trace trainer.py:430); a single
        # packed [N,8] gather moves the same payload in row form
        packed = jnp.concatenate(
            [o, d, t_lo[:, None], t_hi[:, None]], axis=1)      # [Np, 8]
        packed_s = jnp.take(packed, perm, axis=0)
        counts_s = jnp.take(counts, perm, axis=0)
        gmax = counts_s.reshape(-1, group).max(axis=1)
        gspan = jnp.take(span_steps, perm).reshape(-1, group).max(axis=1)
        return (perm, packed_s,
                jnp.stack([gmax.astype(jnp.float32), gspan], axis=1))

    @jax.jit
    def count_perm(occ, o, d):
        """Scatter-mode classify: sort only the RAY INDEX by (count, span);
        per-ray payloads stay unsorted (flagged groups gather them by index
        later). The variadic sort carries counts/span so the group stats
        need no post-sort gathers."""
        pad = (-o.shape[0]) % group
        if pad:
            o = jnp.concatenate([o, jnp.zeros((pad, 3))], 0)
            d = jnp.concatenate([d, jnp.ones((pad, 3)) / 3 ** 0.5], 0)
        nears, fars = near_far_from_aabb(o, d, aabb, cfg.min_near)
        if pool_factor > 1:
            grid = pool_occ(occ, pool_factor)
        else:
            grid = dilate_occ(occ) if stride > 1 else occ
        counts, t_lo, t_hi = coarse_hit_window(
            grid, o, d, nears, fars, bound=cfg.bound,
            max_steps=cfg.max_steps, stride=stride)
        span_steps = jnp.ceil((t_hi - t_lo) / dt_lattice) + 2.0
        key = counts.astype(jnp.float32) * 4096.0 + jnp.minimum(
            span_steps, 4095.0)
        iota = jnp.arange(key.shape[0], dtype=jnp.int32)
        _, perm, counts_s, span_s = jax.lax.sort(
            (key, iota, counts.astype(jnp.float32), span_steps), num_keys=1)
        gmax = counts_s.reshape(-1, group).max(axis=1)
        gspan = span_s.reshape(-1, group).max(axis=1)
        return (perm, o, d, t_lo,
                jnp.stack([gmax, gspan], axis=1))

    # optical-depth budget for the live estimate: -ln(1e-4) with a
    # log-space safety margin (the sigma EMA is a decayed point sample,
    # not a cell max). The margin bounds how much the estimate may
    # UNDERSTATE true sigma before a true-T>1e-4 sample could be culled.
    # At EVAL the field is frozen and the grid freshly refreshed, so the
    # estimate is near exact and a large margin mostly inflates the shade
    # budget (the ball frame shades ~27 samples/ray where T dies at ~9 —
    # r5b t1 walls put the shade stage at ~70% of the frame). Margin
    # ladder measured at 800^2 (in-process same tree): 3.0 -> 1.647,
    # 2.0 -> 1.962, 1.5 -> 1.998, 1.2 -> 2.443, 1.0 -> 2.415 FPS; the
    # 1.2 image differs from the 3.0 image by max 5.2e-4 (mean < 1e-7) —
    # culled tails carry ~T_thresh-level weight by construction. Between
    # refreshes the EMA can go stale-HIGH only by the 0.95 decay per
    # 16-step refresh, which 1.2 covers for ~4 consecutive shrink cycles.
    _LIVE_LOGT = float(os.environ.get("DFTPU_EVAL_LIVE_MARGIN",
                                      "1.2")) * 9.2103

    # (The round-4 short-window march policy — march a short lattice window
    # first, re-march unsaturated groups — measured 0.664 FPS vs 1.02 at
    # 800^2: the fallback re-march dominated. Removed; groups march their
    # emit-window ladder bucket directly.)

    march_cache: Dict[int, Any] = {}

    def get_march(S: int):
        """Windowed march at lattice length S + bucket drivers (exact
        counts and the transmittance-live estimate), one compiled program
        per ladder length."""
        if S not in march_cache:
            @jax.jit
            def march_group(occ, density_grid, mean_density,
                            packed_s, start):
                # slice the group INSIDE the program: an eager
                # dynamic_slice costs a tunnel dispatch per operand per
                # group (~10-30 ms issue latency each)
                if scatter_frame:
                    # packed_s = (o_full, d_full, t_lo_full, perm); start
                    # slices the PERMUTATION, the group's rays are gathered
                    # by index (group-sized gathers ~12% of frame rays)
                    o_full, d_full, tlo_full, perm = packed_s
                    ridx = jax.lax.dynamic_slice_in_dim(perm, start,
                                                        group, 0)
                    o = jnp.take(o_full, ridx, axis=0)
                    d = jnp.take(d_full, ridx, axis=0)
                    t_lo = jnp.take(tlo_full, ridx)
                else:
                    p = jax.lax.dynamic_slice_in_dim(packed_s, start,
                                                     group, 0)
                    o, d = p[:, 0:3], p[:, 3:6]
                    t_lo, t_hi = p[:, 6], p[:, 7]   # t_hi dead (kept so the
                    # default-mode jaxpr — and its compile-cache key — is
                    # unchanged by the scatter-mode addition)
                nears, fars = near_far_from_aabb(o, d, aabb, cfg.min_near)
                thresh = jnp.minimum(mean_density, cfg.density_thresh)
                m, sig_est = march_rays_window(
                    occ, o, d, nears, fars, t_lo, bound=cfg.bound,
                    max_steps=cfg.max_steps, S=S, K=cfg.grid_K,
                    density_grid=density_grid, occ_thresh=thresh)
                gcount = jnp.max(jnp.minimum(m.counts, cfg.grid_K))
                if sig_est is None:      # multi-cascade: the mip-aware
                    glive = gcount       # sigma probe isn't built; shade
                    ltot = jnp.float32(-1.0)   # dense-bucket shade
                else:                    # at the exact count bucket
                    depth_ex = jnp.cumsum(
                        jnp.maximum(sig_est, 0.0) * m.dts * m.valid, axis=1)
                    depth_ex = jnp.concatenate(
                        [jnp.zeros((o.shape[0], 1)), depth_ex[:, :-1]],
                        axis=1)
                    # live is a PREFIX of valid (depth_ex is monotone), so
                    # masking keeps the compact/prefix slot invariant; the
                    # masked tail has estimated optical depth > 3x the
                    # T<1e-4 budget (the CUDA per-ray early break,
                    # raymarching.cu:557, at per-sample granularity)
                    live = m.valid & (depth_ex < _LIVE_LOGT)
                    live_counts = jnp.sum(live, axis=1)
                    m = MarchOut(ts=m.ts, dts=m.dts, valid=live,
                                 counts=live_counts)
                    glive = jnp.max(live_counts)
                    ltot = jnp.sum(live_counts).astype(jnp.float32)
                stats = jnp.stack(
                    [glive.astype(jnp.float32), gcount.astype(jnp.float32),
                     ltot])
                if scatter_frame:
                    return m, o, d, nears, fars, ridx, stats
                return m, o, d, nears, fars, stats

            march_cache[S] = march_group
        return march_cache[S]

    @jax.jit
    def reshape_frame(image, depth, ws):
        """Scatter-mode finish: buffers are already in ray order."""
        N = H * W
        return (image[:N].reshape(H, W, 3), depth[:N].reshape(H, W),
                ws[:N].reshape(H, W))

    @jax.jit
    def unsort(image, depth, ws, perm):
        inv = jnp.argsort(perm)
        N = H * W
        # one packed row-gather instead of three element-speed takes
        packed = jnp.concatenate(
            [image, depth[:, None], ws[:, None]], axis=1)      # [Np, 5]
        pu = jnp.take(packed, inv, axis=0)[:N]
        return (pu[:, 0:3].reshape(H, W, 3), pu[:, 3].reshape(H, W),
                pu[:, 4].reshape(H, W))

    @jax.jit
    def paste(full_img, full_depth, full_ws, img, depth, ws, start):
        up = lambda a, b: jax.lax.dynamic_update_slice_in_dim(a, b, start, 0)
        return up(full_img, img), up(full_depth, depth), up(full_ws, ws)

    def render_frame(params, rays_o, rays_d, grid_state=None,
                     shading_code=SHADING_ALBEDO, ambient_ratio=1.0,
                     bg_color=None, light_d=None):
        N = H * W
        if light_d is None:
            light_d = cameras.safe_normalize(rays_o[0])
        Np = N + ((-N) % group)
        with_bg = bg_color is not None
        bg = (jnp.asarray(bg_color, jnp.float32) if with_bg
              else jnp.zeros((3,), jnp.float32))

        if not coarse_ok:
            pad = Np - N
            if pad:
                rays_o = jnp.concatenate([rays_o, jnp.zeros((pad, 3))], 0)
                rays_d = jnp.concatenate(
                    [rays_d, jnp.ones((pad, 3)) / 3 ** 0.5], 0)
            return _render_full(params, rays_o, rays_d, grid_state,
                                shading_code, ambient_ratio, bg, with_bg,
                                light_d, N, Np)

        if with_bg not in _warmed:
            # compile every shade bucket up front (dummy group-shaped
            # inputs): a fresh pose mid-sequence must never hit a bucket
            # whose multi-minute remote compile poisons that frame
            _warmed.add(with_bg)
            zg = jnp.zeros((group, 3))
            zk = jnp.zeros((group, cfg.grid_K))
            zv = jnp.zeros((group, cfg.grid_K), bool)
            z1 = jnp.zeros((group,))
            zimg = jnp.zeros((Np, 3))
            zdep = jnp.zeros((Np,))
            zstart = (jnp.zeros((group,), jnp.int32) if scatter_frame
                      else 0)
            warm = (cfg.eval_warm_buckets if cfg.eval_warm_buckets
                    else (16, 32, 48, 64, 96, 128, 192, 256))
            Kb_ladder = {_pick_K_bucket(float(b), cfg.grid_K) for b in warm}
            for Kb in sorted(Kb_ladder):
                if cfg.cascade == 1:
                    # single-cascade frames shade through the compact
                    # budget; warm the same bucket values as M buckets
                    get_shade_compact(Kb * group, with_bg,
                                      int(shading_code))(
                        params, zimg, zdep, zdep, zstart, zk, zk, zv, zg,
                        zg, z1, z1, ambient_ratio, light_d, bg)
                else:
                    get_shade(Kb, with_bg, int(shading_code))(
                        params, zimg, zdep, zdep, zstart, zk, zk, zv, zg,
                        zg, z1, z1, ambient_ratio, light_d, bg)
            # march-ladder warm-up (one program per lattice-length bucket;
            # a mid-sequence pose must never hit an uncompiled length).
            # Trimmed warm mode (eval_warm_buckets set) compiles only the
            # full-length program; shorter ones compile on demand and land
            # in the persistent cache.
            warm_S = ([S_ladder[-1]] if cfg.eval_warm_buckets
                      else list(S_ladder))
            if scatter_frame:
                zpk = (jnp.zeros((Np, 3)), jnp.ones((Np, 3)) / 3 ** 0.5,
                       jnp.zeros((Np,)), jnp.zeros((Np,), jnp.int32))
            else:
                zpk = jnp.concatenate(
                    [jnp.zeros((Np, 3)), jnp.ones((Np, 3)) / 3 ** 0.5,
                     jnp.zeros((Np, 2))], axis=1)
            for S in warm_S:
                get_march(S)(grid_state.occ, grid_state.density_grid,
                             grid_state.mean_density, zpk, 0)

        if stage_timing:
            import time as _time
            _tw = [_time.perf_counter()]
            _tlog: Dict[str, float] = {}

            def _tick(name, arr):
                _ = float(jnp.sum(arr))          # drain the dispatch queue
                now = _time.perf_counter()
                _tlog[name] = _tlog.get(name, 0.0) + (now - _tw[0])
                _tw[0] = now
        else:
            _tick = None

        # 1. one-dispatch coarse classify + sort (bg rays first); ONE
        # transfer brings every group's pooled-probe max count + emit-
        # window span (in lattice steps)
        if scatter_frame:
            perm, o_pad, d_pad, tlo, gstats = count_perm(
                grid_state.occ, rays_o, rays_d)
            packed_s = (o_pad, d_pad, tlo, perm)   # march gathers by index
            bg_in = d_pad                          # frame buffers UNSORTED
        else:
            perm, packed_s, gstats = count_sort(grid_state.occ, rays_o,
                                                rays_d)
            bg_in = packed_s
        gstats_host = np.asarray(gstats)           # [n_groups, (max, span)]
        if _tick:
            _tick("classify", gstats)

        # 2. background for the whole frame in one dispatch (cheap: bg net
        # on directions only); shaded tail groups overwrite it
        out_bg = get_bg_only(with_bg)(params, bg_in, bg)
        image, depth, ws = (out_bg["image"], out_bg["depth"],
                            out_bg["weights_sum"])
        if _tick:
            _tick("bg", ws)

        # 3. queue the march for EVERY flagged group (at the lattice-length
        # bucket its emit window dictates), then fetch all shade-bucket
        # drivers (exact counts + transmittance-live estimates) in one
        # stacked transfer — no per-group sync.
        marched = []
        for seg, g in enumerate(reversed(range(gstats_host.shape[0]))):
            if gstats_host[g, 0] == 0.0:
                break                              # sorted: the rest is bg
            start = Np - (seg + 1) * group         # static size, traced start
            span = float(gstats_host[g, 1])
            S_full = next((s for s in S_ladder if s >= span), S_ladder[-1])
            got = get_march(S_full)(
                grid_state.occ, grid_state.density_grid,
                grid_state.mean_density, packed_s, start)
            if scatter_frame:
                m, o_g, d_g, nears_g, fars_g, ridx, stats = got
                marched.append([ridx, o_g, d_g, m, nears_g, fars_g, stats])
            else:
                m, o_g, d_g, nears_g, fars_g, stats = got
                marched.append([start, o_g, d_g, m, nears_g, fars_g, stats])

        if marched and _tick:
            _tick("march", marched[-1][3].ts)
        if marched:
            stats_host = np.asarray(jnp.stack([t[6] for t in marched]))
            if _tick:
                _tick("march_stats", gstats)
            # 4. shade each flagged group at its live bucket (exact march
            # counts capped by the transmittance-live estimate), pasting
            # into the frame buffers inside the same dispatch (scatter
            # mode pastes by ray index into the unsorted buffers)
            for (start, o_g, d_g, m, nears_g, fars_g, *_), \
                    (glive, gcount, ltot) in zip(marched, stats_host):
                if gcount == 0.0:
                    continue                       # coarse flag, truly empty
                if ltot >= 0.0:
                    # single-cascade: field query at the group's MEAN live
                    # count (global compact budget); the slack covers the
                    # proportional-truncation floor
                    mean_live = max(ltot / group, 1.0)
                    mb = _pick_K_bucket(mean_live * cfg.grid_compact_slack,
                                        cfg.grid_K)
                    image, depth, ws = get_shade_compact(
                        mb * group, with_bg, int(shading_code))(
                        params, image, depth, ws, start, m.ts, m.dts,
                        m.valid, o_g, d_g, nears_g, fars_g, ambient_ratio,
                        light_d, bg)
                    if _tick:
                        _tick(f"shade_M{mb}", ws)
                else:
                    Kb = _pick_K_bucket(float(max(glive, 1.0)), cfg.grid_K)
                    image, depth, ws = get_shade(Kb, with_bg,
                                                 int(shading_code))(
                        params, image, depth, ws, start, m.ts, m.dts,
                        m.valid, o_g, d_g, nears_g, fars_g, ambient_ratio,
                        light_d, bg)
                    if _tick:
                        _tick(f"shade_K{Kb}", ws)

        if scatter_frame:                  # buffers are already unsorted
            image, depth, ws = reshape_frame(image, depth, ws)
        else:
            image, depth, ws = unsort(image, depth, ws, perm)  # 5. one
        if _tick:
            _tick("finish", ws)
            print("# eval stage walls (ms): " + json.dumps(
                {k: round(v * 1e3, 1) for k, v in _tlog.items()}),
                flush=True)
        return {"image": image, "depth": depth, "weights_sum": ws}

    def _render_full(params, rays_o, rays_d, grid_state, shading_code,
                     ambient_ratio, bg, with_bg, light_d, N, Np):
        """Fallback (dt_gamma > 0): march everything, sort by exact count,
        shade bucketed groups."""
        parts = []
        for s in range(0, Np, chunk):
            m, nears, fars = march_chunk(grid_state.occ, rays_o[s:s + chunk],
                                         rays_d[s:s + chunk])
            parts.append((m, nears, fars))
        counts = jnp.concatenate([p[0].counts for p in parts])
        ts = jnp.concatenate([p[0].ts for p in parts])
        dts = jnp.concatenate([p[0].dts for p in parts])
        valid = jnp.concatenate([p[0].valid for p in parts])
        nears = jnp.concatenate([p[1] for p in parts])
        fars = jnp.concatenate([p[2] for p in parts])

        (perm, gmax, ts, dts, valid, o_s, d_s, nears_s, fars_s) = sort_frame(
            counts, ts, dts, valid, rays_o, rays_d, nears, fars)
        gmax_host = np.asarray(gmax)

        image = jnp.zeros((Np, 3))
        depth = jnp.zeros((Np,))
        ws = jnp.zeros((Np,))
        for g in range(Np // group):
            sl = slice(g * group, (g + 1) * group)
            start = g * group
            maxc = int(gmax_host[g])
            if maxc == 0:
                dpk = (d_s[sl] if scatter_frame else jnp.concatenate(
                    [jnp.zeros((group, 3)), d_s[sl],    # bg_only reads
                     jnp.zeros((group, 2))], axis=1))   # cols 3:6 (d)
                out = get_bg_only(with_bg)(params, dpk, bg)
                image, depth, ws = paste(image, depth, ws, out["image"],
                                         out["depth"], out["weights_sum"],
                                         start)
            else:
                Kb = _pick_K_bucket(float(maxc), cfg.grid_K)
                image, depth, ws = get_shade(Kb, with_bg,
                                             int(shading_code),
                                             slice_paste=True)(
                    params, image, depth, ws, start, ts[sl], dts[sl],
                    valid[sl], o_s[sl], d_s[sl], nears_s[sl], fars_s[sl],
                    ambient_ratio, light_d, bg)

        inv = jnp.argsort(perm)
        image = jnp.take(image, inv, axis=0)[:N]
        depth = jnp.take(depth, inv, axis=0)[:N]
        ws = jnp.take(ws, inv, axis=0)[:N]
        return {"image": image.reshape(H, W, 3),
                "depth": depth.reshape(H, W),
                "weights_sum": ws.reshape(H, W)}

    return render_frame


def make_eval_render(cfg: Config, model: _BaseNeRF, H: int, W: int,
                     chunk: int = 4096, renderer: str = "stratified",
                     mesh=None):
    """Jitted full-frame staged renderer (white bg, albedo shading,
    no perturb) — the reference's eval/test path (nerf/utils.py:406-456).

    With a mesh, the ray axis is sharded over devices (the TPU analog of
    the reference's eval all_gather, nerf/utils.py:787-797) and chunking
    bounds per-device memory. Single-device grid rendering uses the
    bucketed-K staged path (make_staged_grid_eval)."""
    if renderer == "grid" and mesh is None:
        return make_staged_grid_eval(cfg, model, H, W)

    def ray_fn(params, rays_o, rays_d, grid_state=None,
               shading_code=SHADING_ALBEDO, ambient_ratio=1.0, light_d=None,
               bg_color=None):
        fns = make_field_fns(model, params)._replace(normal=None)
        if light_d is None:
            light_d = cameras.safe_normalize(rays_o[0])
        key = jax.random.PRNGKey(0)

        def rf(o, d):
            bg = None
            if bg_color is not None:
                bg = jnp.broadcast_to(bg_color, (o.shape[0], 3))
            if renderer == "grid":
                from dreamfusion_tpu.ops.marching import render_grid

                aabb = (jnp.asarray(cfg.aabb_infer, jnp.float32)
                        if cfg.aabb_infer is not None else None)
                return render_grid(
                    key, fns, grid_state, o, d, bound=cfg.bound,
                    min_near=cfg.min_near, max_steps=cfg.max_steps,
                    K=cfg.grid_K, dt_gamma=cfg.dt_gamma,
                    bg_radius=cfg.bg_radius, light_d=light_d,
                    ambient_ratio=ambient_ratio, shading_code=shading_code,
                    bg_color=bg, perturb=False,
                    pallas_composite=cfg.pallas_composite, aabb=aabb)
            return render_stratified(
                key, fns, o, d, bound=cfg.bound, min_near=cfg.min_near,
                num_steps=cfg.num_steps, upsample_steps=cfg.upsample_steps,
                bg_radius=cfg.bg_radius, light_d=light_d,
                ambient_ratio=ambient_ratio, shading_code=shading_code,
                bg_color=bg, perturb=False)

        out = render_rays_chunked(rf, rays_o, rays_d, chunk=chunk)
        return {"image": out["image"], "depth": out["depth"],
                "weights_sum": out["weights_sum"]}

    fn = ray_fn
    if mesh is not None:
        from dreamfusion_tpu.parallel.sharding import shard_rays_render

        fn = shard_rays_render(ray_fn, mesh)

    def render_frame(params, rays_o, rays_d, grid_state=None,
                     shading_code=SHADING_ALBEDO, ambient_ratio=1.0,
                     bg_color=None, light_d=None):
        """shading_code / ambient_ratio / light_d / bg_color are traced
        operands (GUI sliders don't recompile). bg_color [3] is the GUI bg
        picker — like the reference it only takes effect when the model has
        no bg net (bg_radius <= 0, renderer.py:535-544)."""
        if mesh is not None:     # sharded path keeps default shading
            out = fn(params, rays_o, rays_d, grid_state)
        else:
            out = fn(params, rays_o, rays_d, grid_state,
                     shading_code=shading_code, ambient_ratio=ambient_ratio,
                     light_d=light_d, bg_color=bg_color)
        return {"image": out["image"].reshape(H, W, 3),
                "depth": out["depth"].reshape(H, W),
                "weights_sum": out["weights_sum"].reshape(H, W)}

    return jax.jit(render_frame)


class Trainer:
    """Experiment driver: workspace, checkpoints, eval dumps, 360 test.

    API parity with the reference Trainer: train / evaluate / test /
    save_checkpoint / load_checkpoint / save_mesh (nerf/utils.py:151-968).
    """

    def __init__(self, name: str, cfg: Config, model: Optional[_BaseNeRF] = None,
                 guidance: Optional[Guidance] = None, workspace: Optional[str] = None,
                 use_checkpoint: Optional[str] = None):
        self.name = name
        self.cfg = cfg
        self.model = model if model is not None else build_model(cfg)
        self.guidance = guidance if guidance is not None else build_guidance(cfg)
        self.workspace = workspace or cfg.workspace
        self.renderer = "grid" if cfg.grid_ray else "stratified"

        os.makedirs(self.workspace, exist_ok=True)
        self.ckpt_dir = os.path.join(os.path.abspath(self.workspace), "checkpoints")
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.log_path = os.path.join(self.workspace, f"log_{name}.jsonl")
        self._tb = None
        try:
            import tensorboardX

            self._tb = tensorboardX.SummaryWriter(
                os.path.join(self.workspace, "run", name))
        except Exception:
            pass

        key = jax.random.PRNGKey(cfg.seed)
        k_init, self._key = jax.random.split(key)
        x0 = jnp.zeros((8, 3))
        d0 = jnp.ones((8, 3)) / jnp.sqrt(3.0)
        params = self.model.init(k_init, x0, d0, method=self.model.init_all)
        if getattr(cfg, "pretrained_dvgo", None) and hasattr(self.model,
                                                             "load_pretrained"):
            params = self.model.load_pretrained(params, cfg.pretrained_dvgo)

        frozen = getattr(self.model, "frozen_prefixes", ())
        self.tx = build_optimizer(cfg, params, frozen_prefixes=frozen)
        ema = params if cfg.ema_decay else None
        self._key, k_state = jax.random.split(self._key)
        self.state = TrainState(step=jnp.int32(0), params=params,
                                opt_state=self.tx.init(params), key=k_state,
                                ema_params=ema)

        # occupancy grid state (renderer path B)
        self.grid_state = None
        if cfg.grid_ray:
            from dreamfusion_tpu.ops.marching import init_grid_state

            self.grid_state = init_grid_state(cfg.cascade, cfg.grid_size,
                                              cfg.density_thresh)

        # text embeddings (nerf/utils.py:290-319)
        self.text_z = self._prepare_text_embeddings()

        # data-parallel mesh (the DDP analog, SURVEY §2.4): n_devices > 1
        # shards the camera batch (training) and the ray axis (eval)
        self.mesh = None
        n_dev = cfg.n_devices if cfg.n_devices else len(jax.devices())
        if n_dev > 1:
            if len(jax.devices()) < n_dev:
                raise ValueError(
                    f"n_devices={n_dev} but only {len(jax.devices())} "
                    "devices visible")
            from dreamfusion_tpu.parallel.sharding import make_mesh

            self.mesh = make_mesh(n_dev)

        self._step_cache = {}
        self._train_step = self._get_train_step(None)
        # the jitted occupancy-grid refresh is built ONCE: rebuilding it per
        # train() call re-traces the 128^3 field query (~8 s on the TPU
        # tunnel) inside what should be steady-state steps
        self._update_grid = None
        if self.renderer == "grid":
            from dreamfusion_tpu.ops.marching import make_update_extra_state

            self._update_grid = make_update_extra_state(cfg, self.model)
        self._eval_render = None
        self.stats = {"valid_loss": [], "best_result": None}

        use_ckpt = use_checkpoint if use_checkpoint is not None else cfg.ckpt
        if use_ckpt not in ("scratch",):
            self.load_checkpoint(use_ckpt)

    def reset_weights(self):
        """GUI reset button (reference: nerf/gui.py:221-233 — re-init every
        module's parameters + reset_extra_state for the occupancy grid):
        fresh param init from a new fold of the trainer PRNG, fresh
        optimizer state, step 0, and a fresh occupancy grid. Shapes are
        unchanged, so every compiled step/render program stays valid."""
        self._key, k_init, k_state = jax.random.split(self._key, 3)
        x0 = jnp.zeros((8, 3))
        d0 = jnp.ones((8, 3)) / jnp.sqrt(3.0)
        params = self.model.init(k_init, x0, d0, method=self.model.init_all)
        if getattr(self.cfg, "pretrained_dvgo", None) and hasattr(
                self.model, "load_pretrained"):
            params = self.model.load_pretrained(params,
                                                self.cfg.pretrained_dvgo)
        ema = params if self.cfg.ema_decay else None
        self.state = TrainState(step=jnp.int32(0), params=params,
                                opt_state=self.tx.init(params), key=k_state,
                                ema_params=ema)
        if self.cfg.grid_ray:
            from dreamfusion_tpu.ops.marching import init_grid_state

            self.grid_state = init_grid_state(
                self.cfg.cascade, self.cfg.grid_size, self.cfg.density_thresh)
        self.stats = {"valid_loss": [], "best_result": None}

    # -- text -----------------------------------------------------------------

    def _prepare_text_embeddings(self):
        cfg = self.cfg
        if cfg.text is None or self.guidance.name == "none":
            dim = 1
            return jnp.zeros((6 if cfg.dir_text else 1, dim))
        if not cfg.dir_text:
            return self.guidance.get_text_embeds([cfg.text], [cfg.negative])
        texts, negs = [], []
        for d in cameras.DIR_TEXTS:
            texts.append(f"{cfg.text}, {d} view")
            neg = cfg.negative
            if cfg.suppress_face and d in ("back", "side", "overhead", "bottom"):
                neg = (neg + ", " if neg else "") + "face"
            negs.append(neg)
        zs = [self.guidance.get_text_embeds([t], [n]) for t, n in zip(texts, negs)]
        return jnp.concatenate(zs, axis=0)

    # -- logging ----------------------------------------------------------------

    def log(self, record: Dict[str, Any]):
        with open(self.log_path, "a") as f:
            f.write(json.dumps(record) + "\n")
        if self._tb is not None and "step" in record:
            for k, v in record.items():
                if isinstance(v, (int, float)) and k != "step":
                    self._tb.add_scalar(k, v, record["step"])

    # -- training ----------------------------------------------------------------

    def _pick_grid_K(self, q95: float) -> int:
        """Smallest bucket >= the 95th-percentile marching count — the
        TPU analog of the reference's mean_count sample budget
        (raymarching.py:200-231): compute scales with occupancy instead of
        always paying the max_steps cap. Bucketing keeps shapes static
        (one cached compilation per bucket)."""
        return _pick_K_bucket(q95, self.cfg.grid_K)

    def _pick_grid_K_live(self, live_q95: float, count_q95: float,
                          cur_K: int) -> int:
        """grid_K_policy='live': bucket from the 95th-percentile LIVE count
        (samples with transmittance above the early-stop, shade_march) —
        culled samples carry exactly zero weight and gradient, so shading
        at the live bucket reproduces the CUDA compositor's early break
        (raymarching.cu:557) with identical results for non-truncated rays.

        live is measured on the current bucket's truncated sample set, so
        it saturates at cur_K: when saturated, grow ONE ladder step toward
        the count bucket (re-measure there next window — damps bucket
        oscillation); otherwise shrink straight to the live bucket."""
        count_b = _pick_K_bucket(count_q95, self.cfg.grid_K)
        if live_q95 >= 0.95 * cur_K and cur_K < count_b:
            for b in (16, 32, 48, 64, 96, 128, 192, 256):
                if b > cur_K:
                    return min(b, count_b)
            return count_b
        return min(_pick_K_bucket(live_q95, self.cfg.grid_K), count_b)

    def _get_train_step(self, grid_K: Optional[int],
                        compact_M: Optional[int] = None):
        key = (grid_K or self.cfg.grid_K, compact_M)
        if key not in self._step_cache:
            self._step_cache[key] = make_train_step(
                self.cfg, self.model, self.guidance, self.tx,
                renderer=self.renderer, mesh=self.mesh, grid_K=grid_K,
                compact_M=compact_M)
        return self._step_cache[key]

    def _pick_compact_M(self, mean_count: float, K: int) -> Optional[int]:
        """Bucket the global sample budget from an EMA of the mean marching
        count (sample compaction, ops/marching.py). The EMA damps the
        per-step mean oscillation (shading/background randomness swings it
        ~3x) so the bucket — and with it the compiled program — switches
        rarely. Returns None when the bucket reaches K (no win)."""
        cfg = self.cfg
        ema = getattr(self, "_mean_count_ema", None)
        ema = mean_count if ema is None else 0.5 * ema + 0.5 * mean_count
        self._mean_count_ema = ema
        m_per_ray = _pick_K_bucket(ema * cfg.grid_compact_slack, K)
        if m_per_ray >= K:
            return None
        return m_per_ray * cfg.batch_size * cfg.h * cfg.w

    def train(self, max_steps: Optional[int] = None, log_interval: int = 50,
              checkpoint_at_end: bool = True,
              profile_dir: Optional[str] = None,
              profile_window: Tuple[int, int] = (0, 0),
              pin_programs: bool = False):
        """profile_dir + profile_window=(start, stop): capture a
        jax.profiler trace of steps [start, stop) into profile_dir
        (tensorboard-viewable; the SURVEY §5 tracing subsystem — the
        reference has only commented-out torch.cuda.synchronize probes,
        nerf/sd.py:78-116).

        pin_programs=True freezes the adaptive (K, M) bucket choice at its
        current value for this window: no program switch — and therefore no
        mid-window compile — can occur. Used by bench.py to guarantee a
        measured window lands even on a cold compilation cache; the grid
        refreshes themselves still run (they are part of the production
        step cost)."""
        cfg = self.cfg
        max_steps = max_steps or cfg.iters
        t0 = time.time()
        update_grid = self._update_grid

        step = int(self.state.step)   # the ONLY D2H sync outside log points
        metrics = None
        profiling = False
        while step < max_steps:
            if profile_dir is not None:
                if step == profile_window[0] and not profiling:
                    jax.block_until_ready(self.state.params)
                    jax.profiler.start_trace(profile_dir)
                    profiling = True
                elif step == profile_window[1] and profiling:
                    jax.block_until_ready(self.state.params)
                    jax.profiler.stop_trace()
                    profiling = False
                    self.log({"profile_trace": profile_dir, "step": step})
            if update_grid is not None and step % cfg.update_extra_interval == 0:
                self._key, kg = jax.random.split(self._key)
                self.grid_state = update_grid(
                    self.state.params, self.grid_state, kg,
                    step // cfg.update_extra_interval)
                if (cfg.grid_K_adaptive and not pin_programs
                        and metrics is not None
                        and "count_q95" in metrics):
                    if (cfg.grid_K_policy == "live"
                            and "live_q95" in metrics):
                        cur = getattr(self, "_cur_grid_K", cfg.grid_K)
                        new_K = self._pick_grid_K_live(
                            float(metrics["live_q95"]),
                            float(metrics["count_q95"]), cur)
                    else:
                        new_K = self._pick_grid_K(
                            float(metrics["count_q95"]))
                    new_M = None
                    if (cfg.grid_compact and self.renderer == "grid"
                            and "mean_count" in metrics):
                        new_M = self._pick_compact_M(
                            float(metrics["mean_count"]), new_K)
                    self._cur_grid_K = new_K
                    self._cur_compact_M = new_M
                    self._train_step = self._get_train_step(new_K, new_M)
            self.state, metrics = self._train_step(
                self.state, self.guidance.params, self.text_z, None,
                *((self.grid_state,) if self.renderer == "grid" else ()))
            step += 1
            if step % log_interval == 0 or step == max_steps:
                m = {k_: float(v) for k_, v in metrics.items()}
                m.update(step=step, time=time.time() - t0,
                         steps_per_sec=step / (time.time() - t0))
                self.log(m)
            if step % (cfg.eval_interval * cfg.dataset_size) == 0:
                self.evaluate(step=step)
                self.save_checkpoint()
        if profiling:
            jax.block_until_ready(self.state.params)
            jax.profiler.stop_trace()
        if checkpoint_at_end:
            self.save_checkpoint()
        return self.state

    # -- evaluation / test ----------------------------------------------------------

    def _get_eval_render(self, H, W):
        if self._eval_render is None or self._eval_render[0] != (H, W):
            n = self.mesh.devices.size if self.mesh is not None else 1
            chunk = min(max(H * W // n, 1), self.cfg.max_ray_batch)
            self._eval_render = ((H, W), make_eval_render(
                self.cfg, self.model, H, W, chunk=chunk,
                renderer=self.renderer, mesh=self.mesh))
        return self._eval_render[1]

    def _get_test_rays_fn(self, size: int, H: int, W: int):
        """Jitted orbit-ray generation — eager per-op dispatch costs
        seconds per frame over the remote tunnel."""
        key = ("test_rays", size, H, W)
        if key not in self._step_cache:
            cfg = self.cfg
            self._step_cache[key] = jax.jit(
                lambda idx: cameras.sample_test_batch(idx, size, cfg,
                                                      H=H, W=W))
        return self._step_cache[key]

    def _render_orbit_frame(self, i: int, size: int, H: int, W: int):
        batch = self._get_test_rays_fn(size, H, W)(jnp.array([i]))
        render = self._get_eval_render(H, W)
        args = (self.state.params, batch["rays_o"][0], batch["rays_d"][0])
        if self.renderer == "grid":
            args = args + (self.grid_state,)
        return render(*args)

    def _save_frame(self, out, path_rgb, path_depth=None):
        from PIL import Image

        rgb = np.asarray(jnp.clip(out["image"], 0, 1) * 255).astype(np.uint8)
        Image.fromarray(rgb).save(path_rgb)
        if path_depth:
            d = np.asarray(out["depth"])
            d = (255 * (d - d.min()) / max(d.max() - d.min(), 1e-6)).astype(np.uint8)
            Image.fromarray(d).save(path_depth)

    def evaluate(self, step: int = 0, size: Optional[int] = None):
        """Validation image dumps + eval loss + best tracking
        (nerf/utils.py:757-845). Eval loss is the reference's eval_step
        metric: lambda_entropy * binary entropy of weights_sum
        (nerf/utils.py:425-431)."""
        size = size or self.cfg.val_size
        vdir = os.path.join(self.workspace, "validation")
        os.makedirs(vdir, exist_ok=True)
        total = 0.0
        for i in range(size):
            out = self._render_orbit_frame(i, size, self.cfg.H, self.cfg.W)
            a = jnp.clip(out["weights_sum"], 1e-5, 1 - 1e-5)
            ent = jnp.mean(-a * jnp.log2(a) - (1 - a) * jnp.log2(1 - a))
            total += self.cfg.lambda_entropy * float(ent)
            self._save_frame(out,
                             os.path.join(vdir, f"{self.name}_{step:06d}_{i:04d}_rgb.png"),
                             os.path.join(vdir, f"{self.name}_{step:06d}_{i:04d}_depth.png"))
        avg = total / max(size, 1)
        self.stats["valid_loss"].append(avg)
        best = self.stats["best_result"]
        if best is None or avg < best:   # (nerf/utils.py:884-900)
            self.log({"step": step, "new_best": avg, "prev_best": best})
            self.stats["best_result"] = avg
            self.save_checkpoint(best=True)
        return avg

    def test(self, size: Optional[int] = None, write_video: bool = True):
        """360-degree orbit render (nerf/utils.py:507-555). Saves PNG frames
        and an animated GIF (no ffmpeg in this environment; mp4 if
        imageio-ffmpeg is present)."""
        size = size or self.cfg.test_size
        tdir = os.path.join(self.workspace, "results")
        os.makedirs(tdir, exist_ok=True)
        frames = []
        for i in range(size):
            out = self._render_orbit_frame(i, size, self.cfg.H, self.cfg.W)
            frames.append(np.asarray(jnp.clip(out["image"], 0, 1) * 255).astype(np.uint8))
            self._save_frame(out, os.path.join(tdir, f"{self.name}_{i:04d}_rgb.png"))
        if write_video and frames:
            import imageio

            try:
                imageio.mimwrite(os.path.join(tdir, f"{self.name}_rgb.mp4"),
                                 frames, fps=25)
            except Exception:
                imageio.mimwrite(os.path.join(tdir, f"{self.name}_rgb.gif"),
                                 frames, fps=25, loop=0)
        return frames

    def save_mesh(self, resolution: int = 256, chunk: int = 262144):
        from dreamfusion_tpu.export.mesh import export_textured_mesh

        mdir = os.path.join(self.workspace, "mesh")
        os.makedirs(mdir, exist_ok=True)
        density_jit = jax.jit(lambda p, x: self.model.apply(
            p, x, method=self.model.density))

        def density_fn(x):  # fixed-shape padded chunks -> one compilation
            n = x.shape[0]
            pad = (-n) % chunk
            if pad:
                x = jnp.concatenate([x, jnp.zeros((pad, 3), x.dtype)])
            outs = [density_jit(self.state.params, x[s:s + chunk])
                    for s in range(0, x.shape[0], chunk)]
            cat = {k: jnp.concatenate([o[k] for o in outs])[:n] for k in outs[0]}
            return cat

        export_textured_mesh(density_fn, mdir, resolution=resolution,
                             density_thresh=self.cfg.density_thresh,
                             mean_density=(float(self.grid_state.mean_density)
                                           if self.grid_state is not None else None),
                             bound=self.cfg.bound, chunk=chunk)

    # -- checkpointing (nerf/utils.py:847-968) -------------------------------------

    def save_checkpoint(self, best: bool = False):
        """Rotating step checkpoints; with best=True, a separate "best"
        snapshot whose params are the EMA weights when EMA is on — the
        reference's ema.store/copy_to best path (nerf/utils.py:884-900)."""
        import orbax.checkpoint as ocp

        step = int(self.state.step)
        path = os.path.join(self.ckpt_dir,
                            "best" if best else f"step_{step:08d}")
        ckptr = ocp.StandardCheckpointer()
        params = self.state.params
        if best and self.state.ema_params is not None:
            params = self.state.ema_params
        payload = {"params": params,
                   "opt_state": self.state.opt_state,
                   "step": np.array(step, np.int32)}
        if self.state.ema_params is not None:
            payload["ema_params"] = self.state.ema_params
        if self.grid_state is not None:
            payload["grid_state"] = self.grid_state._asdict()
        ckptr.save(path, payload, force=True)
        ckptr.wait_until_finished()
        with open(os.path.join(self.ckpt_dir, "stats.json"), "w") as f:
            json.dump(self.stats, f)
        if best:
            return path
        # rotation: keep max_keep_ckpt (the best snapshot is exempt)
        ckpts = sorted(d for d in os.listdir(self.ckpt_dir) if d.startswith("step_"))
        for old in ckpts[: -self.cfg.max_keep_ckpt]:
            import shutil

            shutil.rmtree(os.path.join(self.ckpt_dir, old), ignore_errors=True)
        return path

    def load_checkpoint(self, which: str = "latest"):
        import orbax.checkpoint as ocp

        best_path = os.path.join(self.ckpt_dir, "best")
        if which == "best" and os.path.exists(best_path):
            path = best_path
        elif which in ("latest", "best", "latest_model"):
            ckpts = sorted(d for d in os.listdir(self.ckpt_dir)
                           if d.startswith("step_"))
            if not ckpts:
                return False
            path = os.path.join(self.ckpt_dir, ckpts[-1])
        else:
            path = which
            if not os.path.exists(path):
                return False
        stats_path = os.path.join(self.ckpt_dir, "stats.json")
        if os.path.exists(stats_path):
            try:
                with open(stats_path) as f:
                    self.stats = json.load(f)
            except Exception:
                pass
        ckptr = ocp.StandardCheckpointer()
        payload = {"params": self.state.params,
                   "opt_state": self.state.opt_state,
                   "step": np.array(0, np.int32)}
        if self.state.ema_params is not None:
            payload["ema_params"] = self.state.ema_params
        if self.grid_state is not None:
            payload["grid_state"] = self.grid_state._asdict()
        restored = ckptr.restore(path, payload)
        ema = restored.get("ema_params", self.state.ema_params)
        # fresh PRNG stream after resume, folded with the restored step so
        # a resumed run doesn't replay the original key sequence
        self._key, k_state = jax.random.split(self._key)
        self.state = TrainState(step=jnp.int32(restored["step"]),
                                params=restored["params"],
                                opt_state=restored["opt_state"],
                                key=jax.random.fold_in(k_state,
                                                       int(restored["step"])),
                                ema_params=ema)
        if self.grid_state is not None and "grid_state" in restored:
            from dreamfusion_tpu.ops.marching import GridState

            self.grid_state = GridState(**restored["grid_state"])
        return True
