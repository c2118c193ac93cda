"""Occupancy-grid accelerated ray marching (renderer path B), TPU-native.

This is the re-think of the reference's raymarching CUDA extension
(raymarching/src/raymarching.cu) plus the occupancy-grid maintenance in
NeRFRenderer (nerf/renderer.py:62-98, 562-613). The CUDA design is built on
per-ray dynamic loops and atomicAdd compaction into variable-length buffers
(raymarching.cu:312-490) — the exact opposite of what XLA wants. Here:

- Marching is a vectorized `lax.scan` over a static number of DDA steps; all
  rays advance in lockstep, each step either emits a sample (occupied voxel:
  advance by dt) or skips to the next voxel boundary exactly like the CUDA
  kernel (raymarching.cu:388-399), emitting an invalid sample.
- Compaction to a fixed K samples/ray is a cumsum-slot scatter (deterministic,
  no atomics) — the static-shape analog of the kernel's atomicAdd slot
  reservation + the `mean_count` ray budget (raymarching.py:200-231). The
  expensive field query then runs on exactly N*K points.
- The density grid EMA + thresholding (update_extra_state,
  nerf/renderer.py:562-613) is one jitted function; `mean_density` stays
  on-device (the reference `.item()`s it every 16 steps).
- Occupancy is stored as a dense bool [CAS, H, H, H] — on TPU a gather from
  HBM doesn't benefit from the CUDA bitfield + morton locality tricks;
  morton3D / packbits are still provided below for API/test parity.

Marching detail notes vs the CUDA kernel:
- dt = clamp(t * dt_gamma, dt_min, dt_max), dt_min = 2*sqrt(3)/max_steps,
  dt_max = 2*sqrt(3)*2^(C-1)/H (raymarching.cu:345-346) — identical.
- empty-space skip advances t to the next voxel boundary in whole-dt
  multiples (closed form here; the CUDA does a do/while with a growing dt —
  identical when dt_gamma == 0, conservative otherwise).
- mip level = max(mip_from_pos, mip_from_dt) (raymarching.cu:42-54).
"""

from __future__ import annotations

import math
import os
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from dreamfusion_tpu.cameras import safe_normalize
from dreamfusion_tpu.ops.composite import (CompositeOut, composite,
                                            near_far_from_aabb)

SQRT3 = math.sqrt(3.0)


# ---------------------------------------------------------------------------
# morton / packbits parity ops (raymarching.cu:56-81, 214-300)
# ---------------------------------------------------------------------------

def _expand_bits(v: jax.Array) -> jax.Array:
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton3D(coords: jax.Array) -> jax.Array:
    """[N, 3] int grid coords -> [N] morton codes (raymarching.cu:66-73)."""
    c = coords.astype(jnp.uint32)
    return (_expand_bits(c[..., 0]) | (_expand_bits(c[..., 1]) << 1)
            | (_expand_bits(c[..., 2]) << 2)).astype(jnp.int32)


def morton3D_invert(codes: jax.Array) -> jax.Array:
    """[N] morton codes -> [N, 3] coords (raymarching.cu:75-81)."""
    def compact(x):
        x = x & jnp.uint32(0x49249249)
        x = (x | (x >> 2)) & jnp.uint32(0xC30C30C3)
        x = (x | (x >> 4)) & jnp.uint32(0x0F00F00F)
        x = (x | (x >> 8)) & jnp.uint32(0xFF0000FF)
        x = (x | (x >> 16)) & jnp.uint32(0x0000FFFF)
        return x
    c = codes.astype(jnp.uint32)
    return jnp.stack([compact(c), compact(c >> 1), compact(c >> 2)],
                     axis=-1).astype(jnp.int32)


def packbits(grid: jax.Array, thresh: jax.Array | float) -> jax.Array:
    """density grid [..., 8k] -> uint8 bitfield [..., k] at threshold
    (raymarching.cu:268-300; bit i of byte b = cell 8b+i)."""
    bits = (grid.reshape(*grid.shape[:-1], -1, 8) > thresh).astype(jnp.uint8)
    weights = (jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8))
    return jnp.sum(bits * weights, axis=-1, dtype=jnp.uint8)


# ---------------------------------------------------------------------------
# grid state + maintenance
# ---------------------------------------------------------------------------

class GridState(NamedTuple):
    density_grid: jax.Array   # [CAS, H, H, H] f32 EMA of sigma
    occ: jax.Array            # [CAS, H, H, H] bool occupancy
    mean_density: jax.Array   # scalar f32 (stays on device)


def init_grid_state(cascade: int, grid_size: int,
                    density_thresh: float = 10.0) -> GridState:
    H = grid_size
    return GridState(
        density_grid=jnp.zeros((cascade, H, H, H), jnp.float32),
        occ=jnp.zeros((cascade, H, H, H), bool),
        mean_density=jnp.float32(0.0))


def update_grid(density_fn, state: GridState, key: jax.Array, *,
                bound: float, density_thresh: float, decay: float = 0.95,
                chunk: Optional[int] = None,
                partial: Optional[Tuple[int, int]] = None) -> GridState:
    """One occupancy-grid refresh (reference: nerf/renderer.py:562-613).

    Queries sigma at a jittered center of every cell of every cascade,
    EMA-decays the stored grid, and re-thresholds occupancy at
    min(mean_density, density_thresh). Fully on-device; jit-safe.

    partial=(phase, parts): refresh only the cells whose flat index is
    congruent to phase mod parts; the rest just decay (mainline torch-ngp's
    warmed-up partial update, made deterministic/static-shaped — full
    coverage every `parts` refreshes). The field query is the expensive
    part (hash-encode at H^3 points), so parts=4 cuts refresh cost 4x.
    `phase` may be a TRACED scalar (parts must be static): all 4 phases
    share one compiled program — sel indices and the scatter both accept
    dynamic values. One compile over the slow remote-compile tunnel instead
    of four.
    """
    CAS, H = state.density_grid.shape[0], state.density_grid.shape[1]
    # cell coordinates: xyzs = 2*coords/(H-1) - 1 (renderer.py:584)
    lin = 2.0 * jnp.arange(H, dtype=jnp.float32) / (H - 1) - 1.0
    X, Y, Z = jnp.meshgrid(lin, lin, lin, indexing="ij")
    xyzs = jnp.stack([X, Y, Z], axis=-1).reshape(-1, 3)  # [H^3, 3] in [-1,1]

    sel = None
    if partial is not None:
        phase, parts = partial
        n_cells = H * H * H
        n_sel = n_cells // parts                          # static length
        sel = (jnp.asarray(phase) % parts) + parts * jnp.arange(n_sel)
        sel = jnp.minimum(sel, n_cells - 1)
        xyzs = jnp.take(xyzs, sel, axis=0)               # [H^3/parts, 3]

    new_levels = []
    for cas in range(CAS):
        cas_bound = min(2 ** cas, bound)
        half = cas_bound / H
        k = jax.random.fold_in(key, cas)
        pts = xyzs * (cas_bound - half)
        pts = pts + (jax.random.uniform(k, pts.shape) * 2.0 - 1.0) * half
        if chunk:
            sig = jax.lax.map(
                lambda p: density_fn(p)["sigma"],
                pts.reshape(-1, chunk, 3)).reshape(-1)
        else:
            sig = density_fn(pts)["sigma"]
        if sel is not None:
            full = jnp.full((H * H * H,), -1.0)          # -1 = not queried,
            sig = full.at[sel].set(sig)                  # decays like the ref
        new_levels.append(sig.reshape(H, H, H))
    new_sigmas = jnp.stack(new_levels)
    grid = jnp.maximum(state.density_grid * decay, new_sigmas)
    mean_density = jnp.mean(grid)
    occ = grid > jnp.minimum(mean_density, density_thresh)
    return GridState(density_grid=grid, occ=occ, mean_density=mean_density)


def make_update_extra_state(cfg, model):
    """Bind (cfg, model) -> jitted update fn(params, grid_state, key,
    refresh_idx=0).

    refresh_idx selects the update mode: the first 4 refreshes are full
    (the reference always refreshes fully, renderer.py:562-613, but its
    CUDA hash gathers are cheap); afterwards each refresh covers one of 4
    disjoint quarter-lattices (mainline torch-ngp's warmed-up partial
    update) — measured 1.7 s -> ~0.45 s per refresh on v5e, with full
    coverage every 4 refreshes under the same 0.95 EMA decay, so any
    cell's occupancy is at most 4 refreshes (64 steps) stale — the EMA
    max() keeps decayed-but-occupied cells occupied meanwhile.
    """
    import functools

    from dreamfusion_tpu.models.networks import make_field_fns

    @functools.partial(jax.jit, static_argnums=(4,))
    def _update(params, grid_state, key, phase, parts):
        fns = make_field_fns(model, params, bg=False)
        # NOTE: unchunked — a lax.map-chunked version compiles ~15x slower
        # on TPU (195s vs 14s measured) for identical steady-state speed;
        # the full 128^3 query peaks ~100MB of intermediates, well in HBM.
        partial = None if parts is None else (phase, parts)
        return update_grid(fns.density, grid_state, key, bound=cfg.bound,
                           density_thresh=cfg.density_thresh,
                           decay=cfg.grid_decay, chunk=None, partial=partial)

    def update(params, grid_state, key, refresh_idx: int = 0):
        # 2 cached compilations total: full + one phase-dynamic partial
        if refresh_idx < 4:
            return _update(params, grid_state, key, jnp.int32(0), None)
        return _update(params, grid_state, key,
                       jnp.int32(refresh_idx % 4), 4)

    return update


# ---------------------------------------------------------------------------
# marching
# ---------------------------------------------------------------------------

def _mip_level(x: jax.Array, dt: jax.Array, H: int, C: int) -> jax.Array:
    """max(mip_from_pos, mip_from_dt), each frexp-clamped to [0, C-1]
    (raymarching.cu:42-54). frexp exponent e: mx in [2^(e-1), 2^e)."""
    mx_pos = jnp.max(jnp.abs(x), axis=-1)
    def expo(m):
        return jnp.where(m > 0, jnp.floor(jnp.log2(jnp.maximum(m, 1e-30))) + 1.0,
                         -126.0).astype(jnp.int32)
    e_pos = jnp.clip(expo(mx_pos), 0, C - 1)
    e_dt = jnp.clip(expo(dt * H * 0.5), 0, C - 1)
    return jnp.maximum(e_pos, e_dt)


class MarchOut(NamedTuple):
    ts: jax.Array      # [N, K] sample midpoints along rays
    dts: jax.Array     # [N, K] step sizes
    valid: jax.Array   # [N, K] bool
    counts: jax.Array  # [N] number of emitted samples (pre-truncation)


def march_rays(key: Optional[jax.Array], occ: jax.Array, rays_o: jax.Array,
               rays_d: jax.Array, nears: jax.Array, fars: jax.Array, *,
               bound: float, max_steps: int, K: int, dt_gamma: float = 0.0,
               perturb: bool = False) -> MarchOut:
    """Fixed-K occupancy-grid marching (raymarching.cu:312-490 rethought).

    occ: [CAS, H, H, H] bool. Returns K compacted samples per ray with a
    validity mask. The marching itself carries no gradients (sampling
    positions are not differentiated in the reference either).

    Dispatches to the fully-parallel uniform-lattice path when
    dt_gamma == 0: constant dt means the CUDA DDA's skip loop advances t in
    whole-dt multiples (raymarching.cu:396-399), so every sample it can emit
    lies on the lattice t0 + k*dt — testing ALL lattice points in one
    vectorized occupancy gather yields the identical sample set without a
    sequential scan (a ~100x TPU win: one gather vs max_steps dependent
    steps). The scan-based DDA below remains for dt_gamma > 0 (cone
    stepping, where dt grows with t).
    """
    if dt_gamma == 0.0:
        return _march_rays_uniform(key, occ, rays_o, rays_d, nears, fars,
                                   bound=bound, max_steps=max_steps, K=K,
                                   perturb=perturb)
    N = rays_o.shape[0]
    C, H = occ.shape[0], occ.shape[1]
    dt_min = 2.0 * SQRT3 / max_steps
    dt_max = 2.0 * SQRT3 * (2 ** (C - 1)) / H

    occ_flat = occ.reshape(C, -1)

    t0 = nears
    if perturb:
        assert key is not None
        noise = jax.random.uniform(key, (N,))
        t0 = t0 + jnp.clip(t0 * dt_gamma, dt_min, dt_max) * noise

    rd = jnp.where(jnp.abs(rays_d) < 1e-15,
                   jnp.where(rays_d >= 0, 1e-15, -1e-15), rays_d)
    inv_d = 1.0 / rd

    def step_fn(t, _):
        x = jnp.clip(rays_o + t[:, None] * rays_d, -bound, bound)   # [N,3]
        dt = jnp.clip(t * dt_gamma, dt_min, dt_max)                 # [N]
        level = _mip_level(x, dt, H, C)                             # [N]
        mip_bound = jnp.minimum(jnp.exp2(level.astype(jnp.float32)), bound)
        n = jnp.clip(0.5 * (x / mip_bound[:, None] + 1.0) * H, 0.0, H - 1.0)
        n = n.astype(jnp.int32)                                     # [N,3]
        flat_idx = (n[:, 0] * H + n[:, 1]) * H + n[:, 2]
        is_occ = occ_flat[level, flat_idx]                          # [N]

        alive = t < fars
        emit = is_occ & alive

        # skip: distance to next voxel boundary along each axis
        nb = (n.astype(jnp.float32) + 0.5 + 0.5 * jnp.sign(rays_d)) \
            * (2.0 / H) - 1.0
        t_axis = (nb * mip_bound[:, None] - x) * inv_d
        tt = t + jnp.maximum(0.0, jnp.min(t_axis, axis=-1))
        # advance with the EXACT CUDA do/while semantics
        # (raymarching.cu:396-399): dt is re-clamped from the *current* t at
        # every sub-step, so it grows during a long skip. Emitting rays take
        # exactly one advance (their target is t itself, and do/while always
        # runs once, == `t += dt`). Masked batched while_loop: cheap [N]
        # vector math per sub-step, no gathers; marching carries no
        # gradients so while_loop's non-differentiability is moot.
        target = jnp.where(emit, t, tt)

        def adv(tv):
            return tv + jnp.clip(tv * dt_gamma, dt_min, dt_max)

        t1 = jnp.where(alive, adv(t), t)              # mandatory first step

        def cond(tv):
            return jnp.any((tv < target) & alive)

        def body(tv):
            return jnp.where((tv < target) & alive, adv(tv), tv)

        t_next = jax.lax.while_loop(cond, body, t1)
        return t_next, (t, dt, emit)

    _, (ts, dts, emits) = jax.lax.scan(step_fn, t0, None, length=max_steps)
    ts = ts.T        # [N, max_steps]
    dts = dts.T
    emits = emits.T
    return _compact(ts, dts, emits, K)[0]


# How the probes gather from the 2M-cell occupancy/density tables.
# "row" (default) reshapes the flat table to [T/128, 128] lane rows,
# gathers whole rows and selects the lane with a fused one-hot reduce —
# one gather moves full 128-lane tiles instead of single elements.
# Measured on v5e (scripts/mb_occ_probe.py, 2M probes): 6.6 ms vs 20.9 ms
# for the element take (3.2x), identical for coherent and random indices.
# "pred" gathers the bool table directly (the round-3 trace showed it at
# ~120M probes/s = 16.9 ms/step); "u8" gathers a uint8 view; "packed"
# packs 32 z-cells per int32 word. DFTPU_PROBE_IMPL overrides for A/B.
_PROBE_IMPLS = ("row", "pred", "u8", "packed")
PROBE_IMPL = os.environ.get("DFTPU_PROBE_IMPL", "row")
if PROBE_IMPL not in _PROBE_IMPLS:   # typo'd env must not silently re-measure
    raise ValueError(f"DFTPU_PROBE_IMPL={PROBE_IMPL!r}; valid {_PROBE_IMPLS}")

# Density-EMA probes (probe_density) stay f32: the bf16 variant
# (DFTPU_PROBE_DTYPE, round 4) measured 1.0115 vs 1.0204 FPS at 800^2 —
# no win (the probe fetch is not the frame's bottleneck) — and was removed
# (autopilot s9 vs s6, 2026-08-20).


def _row_take(tab: jax.Array, flat_idx: jax.Array) -> jax.Array:
    """Element gather tab[flat_idx] as a [T/128, 128] row gather + one-hot
    lane reduce (the measured-fastest probe layout on TPU; see above).
    Requires tab.size % 128 == 0; numeric dtypes only."""
    rows = tab.reshape(tab.shape[0] // 128, 128)
    r = jnp.take(rows, flat_idx >> 7, axis=0)            # [..., 128]
    onehot = (flat_idx & 127)[..., None] == jnp.arange(
        128, dtype=jnp.int32)
    return jnp.sum(r * onehot.astype(r.dtype), axis=-1)


def _probe_gather(occ_flat1: jax.Array, flat_idx: jax.Array) -> jax.Array:
    """Gather bool occupancy [T] at flat_idx [N, S] under PROBE_IMPL."""
    if PROBE_IMPL == "row" and occ_flat1.shape[0] % 128 == 0:
        T = occ_flat1.shape[0]
        if (T // 128 <= 512 and jax.default_backend() == "tpu"
                and os.environ.get("DFTPU_PROBE_KERNEL", "1") != "0"):
            # small (pooled) tables: fused VMEM-resident Pallas gather —
            # the XLA row+one-hot path materializes a [J, 128] u8 row
            # matrix in HBM (~63 ms/frame at 800^2, r4 eval trace)
            from dreamfusion_tpu.ops.pallas_probe import probe_select_small
            vals = probe_select_small(occ_flat1.astype(jnp.uint8),
                                      flat_idx.reshape(-1))
            return vals.reshape(flat_idx.shape) != 0
        return _row_take(occ_flat1.astype(jnp.uint8), flat_idx) != 0
    if PROBE_IMPL == "u8":
        return jnp.take(occ_flat1.astype(jnp.uint8), flat_idx, axis=0) != 0
    if PROBE_IMPL == "packed":
        t = occ_flat1.shape[0]
        words = jnp.sum(
            occ_flat1.reshape(t // 32, 32).astype(jnp.uint32)
            << jnp.arange(32, dtype=jnp.uint32)[None, :], axis=1)
        w = jnp.take(words, flat_idx >> 5, axis=0)
        return ((w >> (flat_idx & 31).astype(jnp.uint32)) & 1) != 0
    return jnp.take(occ_flat1, flat_idx, axis=0)


def _probe_occupancy(occ: jax.Array, rays_o: jax.Array, rays_d: jax.Array,
                     ts: jax.Array, bound: float) -> jax.Array:
    """Occupancy lookups at lattice points ts [N, S] -> bool [N, S].
    Multi-cascade mip from position only (dt-based mip is constant 0 at
    dt = 2sqrt(3)/max_steps for H >= max_steps/sqrt(3) — true for the
    128^3 grid with max_steps <= 1024). Per-axis [N, S] layout keeps the
    lanes full (no trailing-3 padding)."""
    C, H = occ.shape[0], occ.shape[1]
    occ_flat = occ.reshape(C, -1)
    if C == 1:
        idx_axes = []
        for d in range(3):
            x_d = jnp.clip(rays_o[:, d:d + 1] + ts * rays_d[:, d:d + 1],
                           -bound, bound)
            n_d = jnp.clip(0.5 * (x_d / bound + 1.0) * H, 0.0, H - 1.0)
            idx_axes.append(n_d.astype(jnp.int32))
        flat_idx = (idx_axes[0] * H + idx_axes[1]) * H + idx_axes[2]
        return _probe_gather(occ_flat[0], flat_idx)
    x_axes = [jnp.clip(rays_o[:, d:d + 1] + ts * rays_d[:, d:d + 1],
                       -bound, bound) for d in range(3)]
    mx = jnp.maximum(x_axes[0].__abs__(),
                     jnp.maximum(x_axes[1].__abs__(), x_axes[2].__abs__()))
    level = jnp.clip(
        (jnp.floor(jnp.log2(jnp.maximum(mx, 1e-30))) + 1.0).astype(jnp.int32),
        0, C - 1)
    mip_bound = jnp.minimum(jnp.exp2(level.astype(jnp.float32)), bound)
    idx_axes = []
    for d in range(3):
        n_d = jnp.clip(0.5 * (x_axes[d] / mip_bound + 1.0) * H, 0.0, H - 1.0)
        idx_axes.append(n_d.astype(jnp.int32))
    flat_idx = ((idx_axes[0] * H + idx_axes[1]) * H + idx_axes[2]
                + level * (H * H * H))
    return _probe_gather(occ.reshape(-1), flat_idx)


def probe_density(density_grid: jax.Array, rays_o: jax.Array,
                  rays_d: jax.Array, ts: jax.Array,
                  bound: float) -> jax.Array:
    """Nearest-cell density-EMA lookups at points ts [N, S] -> f32 [N, S].
    Single-cascade only (the staged-eval live-estimate path). Same cell
    indexing as _probe_occupancy so the estimate is consistent with the
    occupancy the march used."""
    H = density_grid.shape[1]
    grid_flat = density_grid[0].reshape(-1)
    idx_axes = []
    for d in range(3):
        x_d = jnp.clip(rays_o[:, d:d + 1] + ts * rays_d[:, d:d + 1],
                       -bound, bound)
        n_d = jnp.clip(0.5 * (x_d / bound + 1.0) * H, 0.0, H - 1.0)
        idx_axes.append(n_d.astype(jnp.int32))
    flat_idx = (idx_axes[0] * H + idx_axes[1]) * H + idx_axes[2]
    if PROBE_IMPL == "row" and grid_flat.shape[0] % 128 == 0:
        return _row_take(grid_flat, flat_idx).astype(jnp.float32)
    return jnp.take(grid_flat, flat_idx, axis=0).astype(jnp.float32)


def pool_occ(occ: jax.Array, factor: int) -> jax.Array:
    """factor^3 max-pool of the occupancy grid followed by a 3^3 dilation,
    all at the COARSE resolution: Pd[c]=1 iff any fine voxel within one
    coarse block of c is occupied. A stride-subsampled ray probe of Pd with
    probe spacing <= 2 * coarse block side is then a sound zero-classifier
    (same containment argument as max_coarse_stride, at block granularity):
    any emitting fine sample lies within probe-spacing/2 along the ray of
    some probe point, hence within one coarse block of it."""
    pooled = jax.lax.reduce_window(
        occ, False, jax.lax.bitwise_or,
        window_dimensions=(1, factor, factor, factor),
        window_strides=(1, factor, factor, factor), padding="VALID")
    return dilate_occ(pooled)


def max_pooled_stride(max_steps: int, grid_size: int, factor: int) -> int:
    """Largest sound probe stride against pool_occ(occ, factor): needs
    (stride/2) * dt_min <= block side = 2*bound/(H/factor) (mip 0, in
    units of bound=1)."""
    s = int((4.0 * max_steps * factor) / (2.0 * SQRT3 * grid_size))
    return max(1, min(s, max_steps // 4))


def dilate_occ(occ: jax.Array) -> jax.Array:
    """3x3x3 max-pool dilation of the occupancy grid, per cascade.
    Guarantees that a stride-subsampled ray probe of the dilated grid hits
    whenever any fine lattice point is occupied (see coarse_hit_counts)."""
    return jax.lax.reduce_window(
        occ, False, jax.lax.bitwise_or,
        window_dimensions=(1, 3, 3, 3), window_strides=(1, 1, 1, 1),
        padding="SAME")


def max_coarse_stride(max_steps: int, grid_size: int) -> int:
    """Largest sound probe stride: a fine point within an occupied voxel is
    at most (stride/2)*dt_min along the ray from a coarse probe point; the
    dilated grid extends occupancy by one voxel (2*bound_mip/H), so
    soundness needs (stride/2)*(2*sqrt(3)/max_steps) <= 2/H (mip 0 is the
    tightest). 512 steps / 128 grid -> stride 4."""
    s = int((4.0 * max_steps) / (2.0 * SQRT3 * grid_size))
    return max(1, min(s, 8))


def coarse_hit_counts(occ_dilated: jax.Array, rays_o: jax.Array,
                      rays_d: jax.Array, nears: jax.Array, fars: jax.Array,
                      *, bound: float, max_steps: int,
                      stride: int) -> jax.Array:
    """Conservative per-ray hit counts from stride-subsampled probes of the
    DILATED occupancy grid (dt_gamma == 0 lattice only). count == 0 is a
    PROOF the full march emits nothing for that ray; nonzero counts
    overestimate. Cost: max_steps/stride probes per ray instead of
    max_steps — the eval pre-pass that lets ~93% of orbit-frame rays skip
    fine marching and field queries entirely."""
    S = max_steps // stride
    dt = 2.0 * SQRT3 / max_steps
    ts = nears[:, None] + (dt * stride) * jnp.arange(
        S, dtype=jnp.float32)[None, :]
    alive = ts < (fars[:, None] + stride * dt)   # pad far so tail probes land
    is_occ = _probe_occupancy(occ_dilated, rays_o, rays_d, ts, bound)
    return jnp.sum(is_occ & alive, axis=1)


def coarse_hit_window(occ_coarse: jax.Array, rays_o: jax.Array,
                      rays_d: jax.Array, nears: jax.Array, fars: jax.Array,
                      *, bound: float, max_steps: int,
                      stride: int) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """coarse_hit_counts + per-ray [t_lo, t_hi] bracket of every possible
    fine emit. Soundness (pool_occ containment argument): any emitting fine
    sample lies within probe-spacing/2 along the ray of some HIT probe, so
    [first_hit - spacing, last_hit + spacing] brackets all of them. Rays
    with no hits return an empty bracket (t_lo = t_hi = near)."""
    S = max_steps // stride
    dt = 2.0 * SQRT3 / max_steps
    spacing = stride * dt
    ts = nears[:, None] + spacing * jnp.arange(S, dtype=jnp.float32)[None, :]
    alive = ts < (fars[:, None] + spacing)
    is_occ = _probe_occupancy(occ_coarse, rays_o, rays_d, ts, bound) & alive
    counts = jnp.sum(is_occ, axis=1)
    idx = jnp.arange(S, dtype=jnp.float32)[None, :]
    first = jnp.min(jnp.where(is_occ, idx, jnp.inf), axis=1)
    last = jnp.max(jnp.where(is_occ, idx, -jnp.inf), axis=1)
    has = counts > 0
    t_lo = jnp.where(has, nears + (first - 1.0) * spacing, nears)
    t_lo = jnp.maximum(t_lo, nears)
    t_hi = jnp.where(has, nears + (last + 1.0) * spacing, nears)
    t_hi = jnp.minimum(t_hi, fars + spacing)
    return counts, t_lo, t_hi


def march_rays_window(occ: jax.Array, rays_o: jax.Array, rays_d: jax.Array,
                      nears: jax.Array, fars: jax.Array, t_lo: jax.Array,
                      *, bound: float, max_steps: int, S: int, K: int,
                      density_grid: Optional[jax.Array] = None,
                      occ_thresh: Optional[jax.Array] = None,
                      ) -> Tuple[MarchOut, Optional[jax.Array]]:
    """Uniform-lattice march restricted to S lattice points starting at the
    first lattice index >= t_lo (eval only; perturb=False so the lattice is
    t0 = nears + k*dt — starting at an ALIGNED k0 keeps the sample set
    identical to the full march wherever the [t_lo, t_lo + S*dt] window
    brackets all emits, which coarse_hit_window guarantees when
    S*dt >= t_hi - t_lo).

    With density_grid + occ_thresh (the scalar occupancy threshold,
    min(mean_density, density_thresh)), the single-cascade probe gathers
    the sigma EMA instead of the bool grid — occupancy is EXACTLY
    sigma_ema > occ_thresh (how update_grid derives occ) — and the
    per-sample sigma estimate rides through compaction as a sort payload,
    so the caller's transmittance-live estimate needs no second gather
    pass. Returns (MarchOut, sigma_est [N, K] or None)."""
    C, H = occ.shape[0], occ.shape[1]
    dt = 2.0 * SQRT3 / max_steps
    k0 = jnp.floor((t_lo - nears) / dt)                          # aligned
    t0 = nears + k0 * dt
    ts = t0[:, None] + dt * jnp.arange(S, dtype=jnp.float32)[None, :]
    alive = ts < fars[:, None]
    dts = jnp.full_like(ts, dt)
    if density_grid is not None and C == 1:
        sig = probe_density(density_grid, rays_o, rays_d, ts, bound)
        emits = (sig > occ_thresh) & alive
        return _compact(ts, dts, emits, K, payload=sig)
    is_occ = _probe_occupancy(occ, rays_o, rays_d, ts, bound)
    emits = is_occ & alive
    m, _ = _compact(ts, dts, emits, K)
    return m, None


def _march_rays_uniform(key, occ, rays_o, rays_d, nears, fars, *,
                        bound: float, max_steps: int, K: int,
                        perturb: bool) -> MarchOut:
    """Parallel uniform-lattice marching (dt_gamma == 0). All per-sample
    arrays are laid out [N, S] (lanes = S = max_steps) and coordinates are
    kept as separate per-axis arrays to avoid trailing-3 lane padding."""
    N = rays_o.shape[0]
    C, H = occ.shape[0], occ.shape[1]
    dt = 2.0 * SQRT3 / max_steps

    t0 = nears
    if perturb:
        assert key is not None
        t0 = t0 + dt * jax.random.uniform(key, (N,))

    ts = t0[:, None] + dt * jnp.arange(max_steps, dtype=jnp.float32)[None, :]
    alive = ts < fars[:, None]                                  # [N, S]
    is_occ = _probe_occupancy(occ, rays_o, rays_d, ts, bound)

    emits = is_occ & alive
    dts = jnp.full_like(ts, dt)
    return _compact(ts, dts, emits, K)[0]


def _compact(ts, dts, emits, K: int, payload: Optional[jax.Array] = None
             ) -> Tuple[MarchOut, Optional[jax.Array]]:
    """Compact emitted samples to the first K slots per ray (replaces the
    CUDA atomicAdd slot reservation, raymarching.cu:405-406).

    Implemented as a lane-axis sort with key = (ts if emitted else +inf):
    t is strictly increasing along a ray, so sorting moves the emitted
    samples, in order, to the front. A sort pass over [N, S] is ~20x
    cheaper on TPU than the equivalent cumsum-slot scatter (XLA scatter
    serializes row updates at ~57M rows/s; this was 0.6 s per 65k-ray
    eval chunk). An optional per-sample payload (e.g. the probed sigma
    EMA) rides along through the same sort."""
    key = jnp.where(emits, ts, jnp.inf)
    ops = (key, dts) + ((payload,) if payload is not None else ())
    sorted_ops = jax.lax.sort(ops, dimension=1, num_keys=1)
    key_sorted, dt_sorted = sorted_ops[0], sorted_ops[1]
    pay_sorted = sorted_ops[2] if payload is not None else None
    S = ts.shape[1]
    if S < K:          # windowed march with a lattice shorter than the
        pad = K - S    # sample budget: pad the compacted columns
        key_sorted = jnp.pad(key_sorted, ((0, 0), (0, pad)),
                             constant_values=jnp.inf)
        dt_sorted = jnp.pad(dt_sorted, ((0, 0), (0, pad)))
        if pay_sorted is not None:
            pay_sorted = jnp.pad(pay_sorted, ((0, 0), (0, pad)))
    counts = jnp.sum(emits, axis=1)
    k_ar = jnp.arange(K)[None, :]
    valid = k_ar < jnp.minimum(counts, K)[:, None]
    ts_out = jnp.where(valid, key_sorted[:, :K], 0.0)
    dt_out = jnp.where(valid, dt_sorted[:, :K], 0.0)
    pay_out = (jnp.where(valid, pay_sorted[:, :K], 0.0)
               if pay_sorted is not None else None)
    return MarchOut(ts=ts_out, dts=dt_out, valid=valid,
                    counts=counts), pay_out


# ---------------------------------------------------------------------------
# sample compaction: query the field at a GLOBAL sample budget M instead of
# the dense [N, K] slot grid. The adaptive-K bucket covers the 95th-
# PERCENTILE per-ray count, but the MEAN count is typically ~1/3 of it
# (measured: q95~130 vs mean~40 on the bench scene), so ~2/3 of the field
# forward+backward (and the hash-table gradient scatters, the step's
# dominant cost) is spent on invalid slots. Compacting valid samples into a
# dense [M] buffer makes that work scale with the mean.
#
# The map needs NO global sort: marched samples are a per-ray PREFIX
# (valid <=> slot < count), so positions are offsets from one exclusive
# cumsum over [N] counts. When sum(count) > M each ray keeps
# floor(count * M/total) samples — proportional per-ray truncation, the
# same "drop the deepest tail" semantic as the K budget itself
# (raymarching.py:200-231's mean_count economy, made static-shaped).
# ---------------------------------------------------------------------------


class CompactMap(NamedTuple):
    pos: jax.Array        # [N, K] i32: slot -> compact index (M = dropped)
    fwd_flat: jax.Array   # [M] i32: compact index -> flat slot (n*K + k)
    valid_m: jax.Array    # [M] bool: compact index is a real sample
    ray_of_m: jax.Array   # [M] i32: compact index -> ray
    offs: jax.Array       # [N] i32: ray -> first compact index (exclusive
                          #   cumsum of kept counts; == M-capped positions)
    cnt: jax.Array        # [N] i32: ray -> kept (truncated) sample count


def make_compact_map(counts: jax.Array, K: int, M: int) -> CompactMap:
    """counts: [N] i32 per-ray marched sample counts (may exceed K; slots
    are truncated at K). Returns the bidirectional slot<->compact maps."""
    N = counts.shape[0]
    c = jnp.minimum(counts, K).astype(jnp.int32)
    total = jnp.sum(c)
    scale = jnp.minimum(1.0, M / jnp.maximum(total, 1).astype(jnp.float32))
    c2 = jnp.floor(c.astype(jnp.float32) * scale).astype(jnp.int32)
    cum = jnp.cumsum(c2)                                   # inclusive [N]
    offs = cum - c2                                        # exclusive
    total2 = cum[-1]

    k_ar = jnp.arange(K, dtype=jnp.int32)[None, :]
    pos = jnp.where(k_ar < c2[:, None], offs[:, None] + k_ar, M)

    m_ar = jnp.arange(M, dtype=jnp.int32)
    # ray of compact index m: the first ray whose INCLUSIVE cumsum exceeds m
    # == #{i : cum[i] <= m} (side='right' skips zero-count rays). Computed as
    # one N-point scatter + one [M] cumsum instead of jnp.searchsorted: on
    # TPU searchsorted lowers to an O(log N) while-loop of gathers that
    # measured 55% of the eval frame's device time (while.4 + its gather
    # fusions, trace_eval800 2026-08-20). cum entries >= M are dropped; any
    # such ray only holds compact indices >= M, which don't exist.
    hist = jnp.zeros((M,), jnp.int32).at[cum].add(1, mode="drop")
    r = jnp.cumsum(hist)
    r = jnp.minimum(r, N - 1)
    k_m = m_ar - jnp.take(offs, r)
    valid_m = m_ar < total2
    fwd_flat = jnp.where(valid_m, r * K + jnp.clip(k_m, 0, K - 1), 0)
    return CompactMap(pos=pos, fwd_flat=fwd_flat, valid_m=valid_m,
                      ray_of_m=jnp.where(valid_m, r, 0), offs=offs, cnt=c2)


@jax.custom_vjp
def compact_expand(vals_c: jax.Array, pos: jax.Array, fwd_flat: jax.Array,
                   valid_m: jax.Array) -> jax.Array:
    """Expand compacted per-sample values [M, ...] back to the dense slot
    grid [N, K, ...]; dropped slots read 0. The map is injective over valid
    entries, so the VJP is a GATHER along fwd_flat (no XLA scatter — that
    serialized row-by-row on TPU is exactly what this module avoids)."""
    zero = jnp.zeros((1,) + vals_c.shape[1:], vals_c.dtype)
    padded = jnp.concatenate([vals_c, zero], axis=0)       # [M+1, ...]
    return jnp.take(padded, pos.reshape(-1), axis=0).reshape(
        pos.shape + vals_c.shape[1:])


def _compact_expand_fwd(vals_c, pos, fwd_flat, valid_m):
    return compact_expand(vals_c, pos, fwd_flat, valid_m), (
        pos, fwd_flat, valid_m)


def _compact_expand_bwd(res, cot):
    pos, fwd_flat, valid_m = res
    N, K = pos.shape
    flat = cot.reshape((N * K,) + cot.shape[2:])
    d_vals = jnp.take(flat, fwd_flat, axis=0)
    mask = valid_m.reshape((-1,) + (1,) * (d_vals.ndim - 1))
    return (jnp.where(mask, d_vals, 0), None, None, None)


compact_expand.defvjp(_compact_expand_fwd, _compact_expand_bwd)


def _bcast_ray(vals_n: jax.Array, ray_of_m: jax.Array) -> jax.Array:
    """Broadcast per-ray values [N] to per-sample [M] (gather by ray id).
    Uses the row+one-hot take (the measured-fastest TPU small-table gather,
    see _row_take) when N is lane-aligned."""
    if vals_n.shape[0] % 128 == 0:
        return _row_take(vals_n, ray_of_m)
    return jnp.take(vals_n, ray_of_m, axis=0)


def composite_compact(sigma_c: jax.Array, color_c: jax.Array,
                      t_c: jax.Array, dt_c: jax.Array, cmap: CompactMap,
                      N: int, T_thresh: float = 0.0,
                      use_pallas: Optional[bool] = None):
    """Alpha-composite DIRECTLY on the ray-major compact sample buffer —
    no [N, K] expansion. The round-4 eval trace showed compact_expand's
    color gather (output [N*K, 3], whose trailing dim pads 3 -> 128 lanes)
    alone at ~28% of the 800^2 frame; samples dropped by compaction have
    sigma=0, dt=0 in the dense path (alpha 0, transmittance unchanged), so
    compositing only the compact buffer is EXACT, not an approximation.

    Transmittance: per-ray exclusive prefix of l = log(1-alpha+1e-15) in
    the flat [M] buffer. A single f32 cumsum over [M] would carry a running
    magnitude of sum|l| over every ray in the group (~1e5 on an opaque
    scene: eps-level relative error becomes O(1e-2) absolute in log space).
    Two passes fix it: pass 1 takes APPROXIMATE per-ray totals from a raw
    cumsum; pass 2 cumsums l with `-prev_ray_total` injected at each ray
    start, so the running value stays near zero (only the pass-1
    approximation error accumulates) and per-sample exclusive prefixes
    read off exactly (the injected resets cancel in the segment math).

    Per-ray reductions (weights_sum, depth, rgb, live count) ride ONE
    matmul-scatter kernel (ray ids are sorted; 6 of the 16 wide channels)
    on TPU, or an XLA scatter-add elsewhere.

    Returns (rgb [N,3], weights_sum [N], depth_sum [N], live_counts [N]).
    Forward-only (the eval path); the train path keeps compact_expand +
    dense composite for its custom VJPs.
    """
    M = sigma_c.shape[0]
    f32 = jnp.float32
    tau = sigma_c.astype(f32) * dt_c.astype(f32)               # >= 0
    alpha = 1.0 - jnp.exp(-tau)
    l = jnp.log(jnp.exp(-tau) + 1e-15)                         # <= ~0

    offs = cmap.offs
    ends = offs + cmap.cnt
    # pass 1: approximate per-ray l totals
    A1 = jnp.concatenate([jnp.zeros((1,), f32), jnp.cumsum(l)])
    S_approx = jnp.take(A1, ends) - jnp.take(A1, offs)         # [N]
    # pass 2: reset-injected cumsum. delta_n = -S_approx[n-1] telescopes
    # the ideal running value to zero at every ray start. Injected at the
    # PREVIOUS ray's last sample (offs_n - 1), never inside ray n's span,
    # so every in-ray segment sum A2_0[m] - A2_0[offs_n] reads pure l.
    # delta_n != 0 requires ray n-1 to have samples, hence offs_n >= 1.
    resets = -jnp.concatenate([jnp.zeros((1,), f32), S_approx[:-1]])
    z = l.at[jnp.maximum(offs - 1, 0)].add(
        jnp.where(offs > 0, resets, 0.0))
    A2_0 = jnp.concatenate([jnp.zeros((1,), f32), jnp.cumsum(z)])  # [M+1]
    base = jnp.take(A2_0, offs)                                # [N]
    excl = A2_0[:M] - _bcast_ray(base, cmap.ray_of_m)          # [M]
    trans = jnp.exp(jnp.minimum(excl, 0.0))
    w = alpha * trans
    if T_thresh > 0.0:
        w = jnp.where(trans > T_thresh, w, 0.0)
    w = jnp.where(cmap.valid_m, w, 0.0)
    live = (cmap.valid_m & (trans > T_thresh)).astype(f32)

    ch = [w, w * t_c.astype(f32), w * color_c[:, 0].astype(f32),
          w * color_c[:, 1].astype(f32), w * color_c[:, 2].astype(f32),
          live]
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from dreamfusion_tpu.ops.pallas_scatter import \
            matmul_scatter_add_wide
        upd = jnp.stack(ch + [jnp.zeros((M,), f32)] * (16 - len(ch)))
        acc = matmul_scatter_add_wide(
            cmap.ray_of_m.astype(jnp.int32), upd, N,
            interpret=jax.default_backend() != "tpu")          # [N, 16]
    else:
        acc = jnp.zeros((N, len(ch)), f32).at[cmap.ray_of_m].add(
            jnp.stack(ch, axis=-1))
    ws, depth_sum = acc[:, 0], acc[:, 1]
    rgb = acc[:, 2:5]
    live_counts = acc[:, 5]
    return rgb, ws, depth_sum, live_counts


# ---------------------------------------------------------------------------
# full grid-accelerated render (the run_cuda analog, renderer.py:446-559)
# ---------------------------------------------------------------------------

def render_grid(
    key: jax.Array,
    fns,                        # renderer.FieldFns
    grid_state: GridState,
    rays_o: jax.Array,          # [N, 3]
    rays_d: jax.Array,          # [N, 3]
    *,
    bound: float = 1.0,
    min_near: float = 0.1,
    max_steps: int = 512,
    K: int = 128,
    dt_gamma: float = 0.0,
    bg_radius: float = 1.4,
    light_d: Optional[jax.Array] = None,
    ambient_ratio: jax.Array | float = 1.0,
    shading_code: jax.Array | int = 0,
    bg_color: Optional[jax.Array] = None,
    perturb: bool = False,
    T_thresh: float = 1e-4,
    compute_normal_losses: bool = False,
    pallas_composite: Optional[bool] = None,
    aabb: Optional[jax.Array] = None,   # eval-only override (gui aabb_infer)
    compact_M: Optional[int] = None,    # global sample budget (shade_march)
) -> Dict[str, jax.Array]:
    N = rays_o.shape[0]
    if aabb is None:
        aabb = jnp.array([-bound] * 3 + [bound] * 3, jnp.float32)
    else:
        aabb = jnp.asarray(aabb, jnp.float32)
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, min_near)

    k_light, k_march, k_smooth = jax.random.split(key, 3)
    if light_d is None:
        light_d = safe_normalize(rays_o[0] + jax.random.normal(k_light, (3,)))

    march = march_rays(k_march, grid_state.occ,
                       jax.lax.stop_gradient(rays_o),
                       jax.lax.stop_gradient(rays_d),
                       nears, fars, bound=bound, max_steps=max_steps, K=K,
                       dt_gamma=dt_gamma, perturb=perturb)

    return shade_march(
        fns, march, rays_o, rays_d, nears, fars, K=K, bound=bound,
        light_d=light_d, ambient_ratio=ambient_ratio,
        shading_code=shading_code, bg_radius=bg_radius, bg_color=bg_color,
        T_thresh=T_thresh, compute_normal_losses=compute_normal_losses,
        pallas_composite=pallas_composite, k_smooth=k_smooth,
        compact_M=compact_M)


def shade_march(
    fns,
    march: MarchOut,
    rays_o: jax.Array,
    rays_d: jax.Array,
    nears: jax.Array,
    fars: jax.Array,
    *,
    K: int,
    bound: float,
    light_d: jax.Array,
    ambient_ratio: jax.Array | float = 1.0,
    shading_code: jax.Array | int = 0,
    bg_radius: float = 1.4,
    bg_color: Optional[jax.Array] = None,
    T_thresh: float = 1e-4,
    compute_normal_losses: bool = False,
    pallas_composite: Optional[bool] = None,
    k_smooth: Optional[jax.Array] = None,
    compact_M: Optional[int] = None,
    compact_composite: bool = False,
) -> Dict[str, jax.Array]:
    """Field query + compositing over pre-marched samples. Split out of
    render_grid so staged/bucketed eval can march once at the full budget
    and shade at a smaller static K (march is sliced to the first K
    columns — samples are t-ordered, so this is the same truncation the
    mean_count ray budget applies, raymarching.py:200-231).

    compact_M: query the field at a GLOBAL budget of M samples gathered
    from the valid (per-ray prefix) slots instead of all N*K slots — the
    field fwd/bwd then scale with the MEAN per-ray count, not the q95
    bucket (see the sample-compaction section above). When the valid total
    exceeds M, each ray keeps floor(count * M/total) samples. With
    compaction, loss_smooth averages over the real samples only (the dense
    path averages over every slot, including clipped invalid points).

    compact_composite: composite directly on the compact buffer
    (composite_compact) — no [N, K] expansion gathers and no dense
    composite at all. Forward-only (the staged eval path); train keeps
    the expand + dense-composite route for its custom VJPs."""
    N = rays_o.shape[0]
    if K < march.ts.shape[1]:
        march = MarchOut(ts=march.ts[:, :K], dts=march.dts[:, :K],
                         valid=march.valid[:, :K], counts=march.counts)

    xyzs = rays_o[:, None, :] + rays_d[:, None, :] * march.ts[..., None]
    xyzs = jnp.clip(xyzs, -bound, bound)                      # [N, K, 3]
    dirs = jnp.broadcast_to(rays_d[:, None, :], xyzs.shape)

    if pallas_composite is None:
        # auto: the fused kernel wins (narrowly) on TPU; off-TPU the
        # interpret-mode kernel would be ~10x slower than the jnp path
        pallas_composite = jax.default_backend() == "tpu"

    cmap = None
    compact_out = None
    if compact_M is not None and compact_M < N * K:
        cmap = make_compact_map(march.counts, K, compact_M)
        # plain element takes: the row+one-hot form was tried here (r5) and
        # measured WORSE for these small-table gathers (the [M, 128]
        # intermediate costs more than the element gather saves)
        t_c = jnp.take(march.ts.reshape(-1), cmap.fwd_flat)    # [M]
        o_c = jnp.take(rays_o, cmap.ray_of_m, axis=0)          # [M, 3]
        d_c = jnp.take(rays_d, cmap.ray_of_m, axis=0)
        xyz_c = jnp.clip(o_c + d_c * t_c[:, None], -bound, bound)
        sigma_c, color_c, normal_c = fns.field(
            xyz_c, d_c, light_d, ambient_ratio, shading_code)
        sigma_c = jnp.where(cmap.valid_m, sigma_c, 0.0)
        if compact_composite:
            assert not compute_normal_losses, \
                "compact_composite is the eval-only fast path"
            dt_c = jnp.take(march.dts.reshape(-1), cmap.fwd_flat)
            rgb_s, ws_s, depth_s, live_cc = composite_compact(
                sigma_c, color_c, t_c, dt_c, cmap, N, T_thresh,
                use_pallas=pallas_composite)
            out = CompositeOut(weights=None, weights_sum=ws_s,
                               depth=depth_s, rgb=rgb_s)
            compact_out = live_cc
        else:
            sigma = compact_expand(sigma_c, cmap.pos, cmap.fwd_flat,
                                   cmap.valid_m) * march.valid
            color = compact_expand(color_c, cmap.pos, cmap.fwd_flat,
                                   cmap.valid_m)
            # the per-ray proportional truncation may zero valid slots;
            # dts must match so truncated slots contribute neither alpha
            # nor depth
            kept = cmap.pos < compact_M
            dts = march.dts * (march.valid & kept)
    else:
        sigma, color, normal = fns.field(xyzs.reshape(-1, 3),
                                         dirs.reshape(-1, 3),
                                         light_d, ambient_ratio, shading_code)
        sigma = sigma.reshape(N, K) * march.valid
        color = color.reshape(N, K, 3)
        dts = march.dts * march.valid

    if compact_out is not None:
        pass                    # composited above, no dense [N, K] pass
    elif pallas_composite:
        # fused VMEM compositor with analytic VJP (ops/pallas_composite.py);
        # interpret mode keeps CPU tests running, compiled path on TPU.
        from dreamfusion_tpu.ops.pallas_composite import composite_fused

        interp = jax.default_backend() != "tpu"
        fused = composite_fused(sigma, color, dts, march.ts, interp, T_thresh)
        out = CompositeOut(weights=None, weights_sum=fused.weights_sum,
                           depth=fused.depth, rgb=fused.rgb)
    else:
        out = composite(sigma, color, dts, ts=march.ts, T_thresh=T_thresh)

    results: Dict[str, jax.Array] = {}
    if compute_normal_losses:
        if cmap is not None:
            normal = compact_expand(normal_c, cmap.pos, cmap.fwd_flat,
                                    cmap.valid_m)
        else:
            normal = normal.reshape(N, K, 3)
        # reference uses weights = 1-exp(-sigma) here (renderer.py:486-489,
        # "not very exact"); we use the true compositing weights.
        if out.weights is None:
            # the fused compositor doesn't emit per-sample weights; they are
            # only consumed under stop_gradient, so recompute them cheaply.
            alphas = 1.0 - jnp.exp(-jax.lax.stop_gradient(sigma) * dts)
            trans = jnp.cumprod(
                jnp.concatenate([jnp.ones((N, 1)), 1.0 - alphas + 1e-15], 1),
                axis=1)[:, :-1]
            out = out._replace(weights=alphas * trans)
        w_sg = jax.lax.stop_gradient(out.weights) * march.valid
        loss_orient = w_sg * jnp.clip(jnp.sum(normal * dirs, -1), 0.0, None) ** 2
        results["loss_orient"] = jnp.mean(jnp.sum(loss_orient, -1))
        if fns.normal is not None and k_smooth is not None:
            if cmap is not None:
                xp_c = xyz_c + jax.random.normal(k_smooth, xyz_c.shape) * 1e-2
                np_c = fns.normal(xp_c)
                diff = jnp.abs(jnp.where(cmap.valid_m[:, None],
                                         normal_c - np_c, 0.0))
                n_valid = jnp.maximum(jnp.sum(cmap.valid_m), 1)
                results["loss_smooth"] = jnp.sum(diff) / (3.0 * n_valid)
            else:
                xp = xyzs + jax.random.normal(k_smooth, xyzs.shape) * 1e-2
                normal_p = fns.normal(xp.reshape(-1, 3)).reshape(N, K, 3)
                results["loss_smooth"] = jnp.mean(jnp.abs(normal - normal_p))

    if bg_radius > 0 and fns.background is not None:
        bg = fns.background(rays_d)
    elif bg_color is not None:
        bg = bg_color
    else:
        bg = jnp.ones((N, 3), jnp.float32)
    image = out.rgb + (1.0 - out.weights_sum)[:, None] * bg

    depth = jnp.clip(out.depth - nears, 0.0, None) / jnp.maximum(fars - nears, 1e-6)

    # live count: samples still above the transmittance early-stop. Culled
    # samples (trans <= T_thresh) have weight exactly 0 AND gradient exactly
    # 0 (trans decreases monotonically, so a culled sample's sigma only
    # reaches culled weights) — the t-ordered live samples are a per-ray
    # PREFIX, so next steps can shade at the smaller live bucket by plain
    # K-slicing with identical outputs for every non-truncated ray (the
    # CUDA early-break economy, raymarching.cu:557, recovered statically).
    if compact_out is not None:
        live_counts = compact_out       # counted inside composite_compact
    else:
        sg = jax.lax.stop_gradient
        alphas_sg = 1.0 - jnp.exp(-sg(sigma) * dts)
        trans_sg = jnp.cumprod(
            jnp.concatenate([jnp.ones((N, 1)), 1.0 - alphas_sg + 1e-15], 1),
            axis=1)[:, :-1]
        live = march.valid & (trans_sg > T_thresh)
        live_counts = jnp.sum(live, axis=1).astype(jnp.float32)

    results.update({
        "image": image,
        "depth": depth,
        "weights_sum": out.weights_sum,
        "mask": nears < fars,
        "mean_count": jnp.mean(march.counts.astype(jnp.float32)),
        # 95th-percentile marching count: drives the Trainer's adaptive
        # sample budget (the mean_count budget analog, raymarching.py:200)
        "count_q95": jnp.percentile(march.counts.astype(jnp.float32), 95.0),
        "live_q95": jnp.percentile(live_counts, 95.0),
    })
    return results
