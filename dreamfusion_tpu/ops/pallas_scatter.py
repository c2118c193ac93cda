"""MXU-based scatter-add for hash-table gradients (the TPU scatter wall).

The hash-grid encoder backward must compute, per level,

    d_emb[idx_u, c] += upd[u, c]        for u in [0, J),  J = 8 * B samples

(reference behavior: gridencoder/src/gridencoder.cu:296-311, a CUDA
atomicAdd doing ~67M row-updates in ~10 ms). XLA's TPU scatter-add
serializes row updates (~23 M rows/s measured on v5e), which made this one
scatter ~2.9 s/step — the round-1 perf wall.

TPU-native fix: decompose the row index into radix parts

    idx = coarse * 64 + fine,   coarse in [0, T/64),  fine in [0, 64)

and express the scatter as ONE dense matmul per level:

    out[p, fine*C + c] = sum_u  A[p, u] * B[u, fine*C + c]
    A[p, u]            = (coarse_u == p)                  # one-hot, 0/1
    B[u, j]            = (fine_u == j // C) * upd[u, j % C]

`out` is exactly the [T/64, 64*C] reshaping of d_emb [T, C]. Both A and B
are generated on the fly in VMEM (never materialized in HBM), and the
contraction runs on the MXU: ~1.1e12 bf16 FLOPs per level at J=4.2M —
milliseconds instead of the serialized scatter's ~180 ms/level.

Accuracy: A is exact in bf16 (0/1); B rounds the update values to bf16 but
accumulation is f32 (preferred_element_type). The reference accumulates in
fp16 atomics (gridencoder.cu:22-26, __half2 path) — so this is at least as
accurate as the CUDA kernel it replaces. An f32-exact path would use the
bf16x2 split trick at 2x cost; tests show bf16 is well within SDS gradient
noise.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# fine radix bits; 64 fine slots * C=2 channels = 128 output lanes
_FINE_BITS = 6
_FINE = 1 << _FINE_BITS
_CHUNK = 2048  # updates per grid step


_SUB = _CHUNK // 8  # lane width of one sub-chunk (inputs are [n, 8, _SUB])


def _scatter_kernel(coarse_ref, fine_ref, u0_ref, u1_ref, out_ref):
    """One grid step: accumulate a CHUNK of updates into the full
    [R, 64*C] output block (out block is the whole table, revisited).

    Inputs arrive as [1, 8, _SUB] blocks (Mosaic needs the trailing two
    dims tile-aligned); the 8 sublane rows are processed as 8 unrolled
    [R, _SUB] @ [_SUB, 128] matmuls to avoid cross-lane reshapes."""
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    R = out_ref.shape[0]
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, _SUB), 0)
    jcol = jax.lax.broadcasted_iota(jnp.int32, (_SUB, 2 * _FINE), 1)
    for s in range(8):
        coarse = coarse_ref[0, s]   # [_SUB] i32 (padded entries = -1)
        fine = fine_ref[0, s]       # [_SUB] i32
        u0 = u0_ref[0, s]           # [_SUB] f32
        u1 = u1_ref[0, s]           # [_SUB] f32

        a = (rows == coarse[None, :]).astype(jnp.bfloat16)       # [R, _SUB]
        fmask = fine[:, None] == (jcol >> 1)                     # [_SUB, 128]
        uval = jnp.where((jcol & 1) == 0, u0[:, None], u1[:, None])
        b = jnp.where(fmask, uval, 0.0).astype(jnp.bfloat16)     # [_SUB, 128]
        acc += jnp.dot(a, b, preferred_element_type=jnp.float32)

    out_ref[:] += acc


@functools.partial(jax.jit, static_argnames=("table_size", "interpret"))
def matmul_scatter_add(local_idx: jax.Array, u0: jax.Array, u1: jax.Array,
                       table_size: int, interpret: bool = False) -> jax.Array:
    """d_emb = zeros([table_size, 2]).at[local_idx].add(stack([u0, u1], -1))
    computed as a dense MXU matmul (see module docstring).

    local_idx: [J] int32 in [0, table_size); u0/u1: [J] f32 per-channel
    update values. Returns [table_size, 2] f32.
    """
    J = local_idx.shape[0]
    n_chunks = -(-J // _CHUNK)
    pad = n_chunks * _CHUNK - J
    if pad:
        local_idx = jnp.pad(local_idx, (0, pad), constant_values=-1)
        u0 = jnp.pad(u0, (0, pad))
        u1 = jnp.pad(u1, (0, pad))

    coarse = jnp.where(local_idx < 0, -1, local_idx >> _FINE_BITS)
    fine = local_idx & (_FINE - 1)
    R = -(-table_size // _FINE)          # output rows (each covers 64 rows)
    R_pad = -(-R // 8) * 8               # sublane alignment

    out = pl.pallas_call(
        _scatter_kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 8, _SUB), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
        out_specs=pl.BlockSpec((R_pad, 2 * _FINE), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R_pad, 2 * _FINE), jnp.float32),
        interpret=interpret,
    )(coarse.reshape(n_chunks, 8, _SUB), fine.reshape(n_chunks, 8, _SUB),
      u0.reshape(n_chunks, 8, _SUB), u1.reshape(n_chunks, 8, _SUB))

    return out.reshape(R_pad * _FINE, 2)[:table_size]


# ---------------------------------------------------------------------------
# wide-row variant: scatter [J] row indices with [C_ROW]-wide updates
# (C_ROW=16 serves the oct-table encoder backward: 8 corners x 2 channels
# folded into one row per SAMPLE instead of one per (corner, sample) —
# 8x fewer row-updates than the per-corner scatter above)
# ---------------------------------------------------------------------------

_FINE_W = 8          # 8 fine slots * 16 row channels = 128 output lanes
_C_ROW = 16

# VMEM ceiling for the wide kernel's resident state: the [R_pad, 128] f32
# output block plus an equal-size accumulator live in VMEM for the whole
# grid. v5e VMEM is ~64 MiB usable; staying under 16 MiB for the pair
# leaves room for input blocks and double buffering. Tables above the
# ceiling (log2_hashmap_size > 19 with _FINE_W=8) fall back to the XLA
# scatter — correctness first; no production config exceeds it
# (networks.py uses log2_hashmap_size=16 -> 4 MiB).
_WIDE_VMEM_BYTES = 16 * 2 ** 20


def _scatter_kernel_wide(coarse_ref, fine_ref, u_ref, out_ref):
    """u_ref block [1, 8, C_ROW, _SUB]: per sub-chunk s, updates arrive as
    C_ROW lane-major vectors. One [R, _SUB] @ [_SUB, 128] matmul per
    sub-chunk accumulates into the [R, 8*C_ROW] output."""
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    R = out_ref.shape[0]
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, _SUB), 0)
    jcol = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _FINE_W * _C_ROW), 1)
    fine_of_j = jcol // _C_ROW
    c_of_j = jcol % _C_ROW
    for s in range(8):
        coarse = coarse_ref[0, s]       # [_SUB] i32 (padded entries = -1)
        fine = fine_ref[0, s]           # [_SUB] i32
        a = (rows == coarse[None, :]).astype(jnp.bfloat16)       # [R, _SUB]
        fmask = fine[:, None] == fine_of_j                       # [_SUB, 128]
        uval = jnp.zeros((_SUB, _FINE_W * _C_ROW), jnp.float32)
        for c in range(_C_ROW):
            uval = jnp.where(c_of_j == c, u_ref[0, s, c][:, None], uval)
        b = jnp.where(fmask, uval, 0.0).astype(jnp.bfloat16)     # [_SUB, 128]
        acc += jnp.dot(a, b, preferred_element_type=jnp.float32)

    out_ref[:] += acc


# -- factorized (v2) wide kernel --------------------------------------------
# The v1 kernel's VPU cost is dominated by generating the [R, _SUB] coarse
# one-hot (R up to 8192): R*_SUB compares per sub-chunk. Splitting the
# coarse index once more, coarse = hi*_LO + lo, moves lo into the LANE axis
# of the update matrix: the one-hot shrinks to [R/_LO, _SUB] and the update
# matrix widens to [_SUB, _LO*128] — generation cost drops ~3-4x (the
# balanced split minimizes (R/m + 128m)*_SUB at m = sqrt(R/128) = 8 for the
# production 2^16 table), and the matmul becomes [R/8, _SUB] @ [_SUB, 1024]
# — a much better MXU shape (N=1024 vs 128) for identical total FLOPs.
_LO = 8              # lo slots; out lanes = _LO * _FINE_W * _C_ROW = 1024


def _scatter_kernel_wide2(hi_ref, lo_ref, fine_ref, u_ref, out_ref):
    """Factorized: out[hi, lo*128 + fine*16 + c] += u[c, u] for each update
    u with coarse = hi*_LO + lo. The inner 128 lanes (fine x c) are built
    exactly as v1 at [_SUB, 128], then lane-tiled _LO times (native
    128-lane tile copies) and masked by the lo compare — the only new wide
    VPU work is one [_SUB, 1024] compare + multiply."""
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    RH = out_ref.shape[0]
    W = _LO * _FINE_W * _C_ROW                                   # 1024
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (RH, _SUB), 0)
    jcol = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _FINE_W * _C_ROW), 1)
    fine_of_j = jcol // _C_ROW
    c_of_j = jcol % _C_ROW
    wcol = jax.lax.broadcasted_iota(jnp.int32, (_SUB, W), 1)
    lo_of_w = wcol // (_FINE_W * _C_ROW)
    for s in range(8):
        hi = hi_ref[0, s]               # [_SUB] i32 (padded entries = -1)
        lo = lo_ref[0, s]               # [_SUB] i32 in [0, _LO)
        fine = fine_ref[0, s]           # [_SUB] i32 in [0, _FINE_W)
        a = (rows == hi[None, :]).astype(jnp.bfloat16)         # [RH, _SUB]
        fmask = fine[:, None] == fine_of_j                     # [_SUB, 128]
        uval = jnp.zeros((_SUB, _FINE_W * _C_ROW), jnp.float32)
        for c in range(_C_ROW):
            uval = jnp.where(c_of_j == c, u_ref[0, s, c][:, None], uval)
        b128 = jnp.where(fmask, uval, 0.0)                     # [_SUB, 128]
        bw = jnp.concatenate([b128] * _LO, axis=1)             # [_SUB, W]
        b = jnp.where(lo[:, None] == lo_of_w, bw, 0.0).astype(jnp.bfloat16)
        acc += jnp.dot(a, b, preferred_element_type=jnp.float32)

    out_ref[:] += acc


# wide-kernel selector: 2 = factorized (default), 1 = v1 (kept for A/B
# benchmarking and as a fallback switch)
WIDE_VERSION = 2


def _oct_b128(fine, w_row, c_row, fine_of_j, c_of_j):
    """Shared B-matrix construction for the oct kernels: the [_SUB, 128]
    update matrix b[u, fine*16 + c] = w_row[c>>1][u] * c_row[c&1][u] for
    fine_u == fine, 0 elsewhere — the factored outer product formed on
    VMEM vectors, cast to bf16 for the MXU. Traced inline by each kernel
    (plain python helper, not a pallas primitive)."""
    fmask = fine[:, None] == fine_of_j                           # [_SUB, 128]
    uval = jnp.zeros((_SUB, _FINE_W * _C_ROW), jnp.float32)
    for c in range(_C_ROW):
        v = w_row[c >> 1] * c_row[c & 1]                         # [_SUB]
        uval = jnp.where(c_of_j == c, v[:, None], uval)
    return jnp.where(fmask, uval, 0.0)                           # [_SUB, 128]


def _scatter_kernel_oct(coarse_ref, fine_ref, w_ref, c_ref, out_ref):
    """v1-structure wide kernel taking the oct update's FACTORS instead of
    the materialized [C_ROW, J] outer product: upd[c*2+j, u] = w_c[u] *
    cot_j[u] is formed on [SUB]-vectors in VMEM (w_ref [1, 8, 8, SUB],
    c_ref [1, 8, 2, SUB]). Saves the ~66 MB/level HBM write+read of the
    outer product and its lane transpose (bench r3: ~9 ms/step of 'data
    formatting' at grid_encoder.py:453)."""
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    R = out_ref.shape[0]
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, _SUB), 0)
    jcol = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _FINE_W * _C_ROW), 1)
    fine_of_j = jcol // _C_ROW
    c_of_j = jcol % _C_ROW
    for s in range(8):
        coarse = coarse_ref[0, s]       # [_SUB] i32 (padded entries = -1)
        a = (rows == coarse[None, :]).astype(jnp.bfloat16)       # [R, _SUB]
        b = _oct_b128(fine_ref[0, s], w_ref[0, s], c_ref[0, s],
                      fine_of_j, c_of_j).astype(jnp.bfloat16)    # [_SUB, 128]
        acc += jnp.dot(a, b, preferred_element_type=jnp.float32)

    out_ref[:] += acc


def _scatter_kernel_oct2(hi_ref, lo_ref, fine_ref, w_ref, c_ref, out_ref):
    """Factorized oct kernel: _scatter_kernel_wide2's hi/lo radix split
    (hi one-hot is _LO x smaller; lo rides the output lane axis) combined
    with _scatter_kernel_oct's in-VMEM outer product upd[c*2+j] = w_c *
    cot_j. The dominant VPU cost — generating the [R, _SUB] one-hot —
    drops _LO x; the matmul becomes [RH, _SUB] @ [_SUB, 1024]."""
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    RH = out_ref.shape[0]
    W = _LO * _FINE_W * _C_ROW                                   # 1024
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (RH, _SUB), 0)
    jcol = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _FINE_W * _C_ROW), 1)
    fine_of_j = jcol // _C_ROW
    c_of_j = jcol % _C_ROW
    wcol = jax.lax.broadcasted_iota(jnp.int32, (_SUB, W), 1)
    lo_of_w = wcol // (_FINE_W * _C_ROW)
    for s in range(8):
        hi = hi_ref[0, s]               # [_SUB] i32 (padded entries = -1)
        lo = lo_ref[0, s]               # [_SUB] i32 in [0, _LO)
        a = (rows == hi[None, :]).astype(jnp.bfloat16)         # [RH, _SUB]
        b128 = _oct_b128(fine_ref[0, s], w_ref[0, s], c_ref[0, s],
                         fine_of_j, c_of_j)                    # [_SUB, 128]
        bw = jnp.concatenate([b128] * _LO, axis=1)             # [_SUB, W]
        b = jnp.where(lo[:, None] == lo_of_w, bw, 0.0).astype(jnp.bfloat16)
        acc += jnp.dot(a, b, preferred_element_type=jnp.float32)

    out_ref[:] += acc


# oct-kernel selector: 2 = factorized (hi/lo split), 1 = single coarse
# one-hot. Kept as a module switch for on-device A/B benchmarking.
OCT_VERSION = 2


# ---------------------------------------------------------------------------
# binned (sorted-window) oct kernel: past the one-hot FLOP floor
# ---------------------------------------------------------------------------
# The v1/v2 kernels' MXU FLOP is J x R x 128 regardless of how the one-hot
# is factorized: every chunk multiplies against ALL R output rows. Sorting
# the J updates by table row first makes each 2048-update chunk span only a
# narrow row range (~R / n_chunks rows), so it can be contracted against a
# _BIN_WB-row WINDOW of the output instead of all R rows — a structural
# R / _BIN_WB FLOP cut (32x at the production 2^16 table).
#
# Mapping tiles to (window, chunk) uses pallas scalar prefetch: a tile list
# enumerates, per output window, every input chunk whose sorted row range
# touches it (boundary chunks appear in two tiles; in-kernel row-relative
# masking drops the out-of-window updates, so each update lands exactly
# once). Windows are visited in ascending, contiguous runs, so the kernel
# zero-initialises an output block on first visit and pallas flushes it to
# HBM when the window index changes. Never-visited windows hold garbage and
# are masked on the XLA side from the per-window element counts.
#
# The sort itself (jax.lax.sort, 1 key + 10 payload vectors) is the open
# cost question (NOTES round-4 sketch); scripts/mb_scatter_binned.py
# measures it against the kernel win on device.

_BIN_WB = 256        # output-window height in coarse rows (256*8 table rows)

# Sort-payload packing: the lax.sort of 1 key + 10 f32 payloads is over
# half the binned kernel's cost (stage-5 A/B on v5e: sort 2.31 ms of the
# 3.99 ms total at J=262k; the packed 1 key + 5 payload form sorts in
# 1.85 ms). Each f32 pair is rounded to bf16 (nearest-even) and packed
# into one i32 word before the sort, unpacked right after — a fused
# element pass on the XLA side, no kernel change. Accuracy is unchanged
# in spirit: the kernel casts the update factors to bf16 for the MXU
# anyway; packing just moves that rounding before the sort.
BIN_PACK = True


def _pack_bf16_pair(a: jax.Array, b: jax.Array) -> jax.Array:
    """Round f32 a, b to bf16 (nearest-even) and pack as one i32:
    a in the high 16 bits, b in the low 16."""
    def _rne(x):
        bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
        return bits + 0x7FFF + ((bits >> 16) & 1)        # round to nearest even
    hi = _rne(a) & jnp.uint32(0xFFFF0000)
    lo = _rne(b) >> 16
    return jax.lax.bitcast_convert_type(hi | lo, jnp.int32)


def _unpack_bf16_pair(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    u = jax.lax.bitcast_convert_type(w, jnp.uint32)
    a = jax.lax.bitcast_convert_type(u & jnp.uint32(0xFFFF0000), jnp.float32)
    b = jax.lax.bitcast_convert_type(u << 16, jnp.float32)
    return a, b


def _scatter_kernel_oct_binned_t(win_ref, chunk_ref, valid_ref,
                                 crow_ref, fine_ref, w_ref, c_ref, out_ref):
    """Transposed-output tile: contract chunk chunk_ref[t] against output
    window win_ref[t] as dot(bT, aT) -> [128, _BIN_WB] where the ROW axis
    is (fine' * 16 + corner-channel) and the LANE axis is the window's
    coarse' rows. Motivation (NOTES r3 trace): the flat kernel's [T, 16]
    output forces a table-sized {0,1} relayout copy (~5.7 ms/step) before
    the inverse-roll fold, because XLA lays [N, 16] tensors column-major;
    emitting the transpose directly keeps every downstream fold op in
    full-lane layouts. Same FLOPs, same one-hot structure, roles swapped."""
    t = pl.program_id(0)
    win = win_ref[t]
    prev = win_ref[jnp.maximum(t - 1, 0)]

    @pl.when((t == 0) | (win != prev))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    live = valid_ref[t] > 0
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _BIN_WB), 1)
    rows128 = jax.lax.broadcasted_iota(
        jnp.int32, (_FINE_W * _C_ROW, _SUB), 0)
    f_of_r = rows128 // _C_ROW
    c_of_r = rows128 % _C_ROW
    base = win * _BIN_WB
    for s in range(8):
        rel = crow_ref[0, s] - base     # [_SUB]; out-of-window -> no match
        aT = ((cols == rel[:, None]) & live).astype(jnp.bfloat16)
        fine = fine_ref[0, s]
        uvalT = jnp.zeros((_FINE_W * _C_ROW, _SUB), jnp.float32)
        for c in range(_C_ROW):
            v = w_ref[0, s, c >> 1] * c_ref[0, s, c & 1]         # [_SUB]
            uvalT = jnp.where(c_of_r == c, v[None, :], uvalT)
        bT = jnp.where(fine[None, :] == f_of_r, uvalT,
                       0.0).astype(jnp.bfloat16)                 # [128, _SUB]
        acc += jnp.dot(bT, aT, preferred_element_type=jnp.float32)

    out_ref[:] += acc


def _scatter_kernel_oct_binned(win_ref, chunk_ref, valid_ref,
                               crow_ref, fine_ref, w_ref, c_ref, out_ref):
    """One tile: contract chunk chunk_ref[t] against output window
    win_ref[t] ([_BIN_WB, 128] block). Row one-hot is built window-relative
    (crow - win*_BIN_WB); updates outside the window or from dummy tiles
    (valid_ref[t] == 0) match no row and are dropped."""
    t = pl.program_id(0)
    win = win_ref[t]
    prev = win_ref[jnp.maximum(t - 1, 0)]

    @pl.when((t == 0) | (win != prev))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    live = valid_ref[t] > 0
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (_BIN_WB, _SUB), 0)
    jcol = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _FINE_W * _C_ROW), 1)
    fine_of_j = jcol // _C_ROW
    c_of_j = jcol % _C_ROW
    base = win * _BIN_WB
    for s in range(8):
        rel = crow_ref[0, s] - base     # [_SUB]; out-of-window -> no match
        a = ((rows == rel[None, :]) & live).astype(jnp.bfloat16)
        b = _oct_b128(fine_ref[0, s], w_ref[0, s], c_ref[0, s],
                      fine_of_j, c_of_j).astype(jnp.bfloat16)    # [_SUB, 128]
        acc += jnp.dot(a, b, preferred_element_type=jnp.float32)

    out_ref[:] += acc


@functools.partial(jax.jit, static_argnames=("table_size", "interpret",
                                              "transposed"))
def matmul_scatter_add_oct_binned(local_idx: jax.Array, w8: jax.Array,
                                  cot2: jax.Array, table_size: int,
                                  interpret: bool = False,
                                  transposed: bool = False) -> jax.Array:
    """Same contract as matmul_scatter_add_oct (d = zeros([T, 16]).at[idx]
    .add(outer(w8, cot2))), computed by sorting updates by row and
    contracting each chunk against only the output window it touches.

    Unlike the unbinned kernels, VMEM residency is WINDOW-sized
    ([_BIN_WB, 128] f32 = 128 KiB) rather than table-sized, so there is no
    _WIDE_VMEM_BYTES ceiling: tables beyond 2^19 rows stay on the MXU path
    when this kernel is selected.

    transposed=True returns the CHANNEL-MAJOR gradient [16, T] instead of
    [T, 16] (same values: out_t[c, r] == out[r, c]). The row index is split
    with fine' in the HIGH bits (row = fine' * Rlow + coarse', Rlow =
    ceil(T/8)) and updates are sorted by the window-contiguous remap
    (coarse' * 8 + fine'), so the kernel's transposed [128, window] tiles
    flatten back to row order with plain reshapes — no cross-lane
    relayout anywhere. This kills the table-sized {0,1} layout copy XLA
    inserts between the flat kernel's [T, 16] output and the inverse-roll
    fold (NOTES r3: 5.7 ms/step at production shapes)."""
    J = local_idx.shape[0]
    n_chunks = -(-J // _CHUNK)
    Jp = n_chunks * _CHUNK

    if transposed:
        Rlow = -(-table_size // _FINE_W)     # coarse' rows (fine' in MSBs)
        NW = -(-Rlow // _BIN_WB)
        # sort by (coarse', fine') so output windows are visited in one
        # contiguous run each (row-order sorting would revisit every
        # window once per fine' value)
        fine_u = jnp.where(local_idx < 0, 0, local_idx // Rlow)
        coarse_u = jnp.where(local_idx < 0, 0, local_idx % Rlow)
        remap = coarse_u * _FINE_W + fine_u
        sentinel = jnp.int32(_FINE_W * Rlow)
        key = jnp.where(local_idx < 0, sentinel, remap)
        table_rows = _FINE_W * Rlow          # sentinel bound for validity
    else:
        R = -(-table_size // _FINE_W)        # coarse rows
        NW = -(-R // _BIN_WB)                # output windows
        sentinel = jnp.int32(table_size)     # sorts after every real row
        key = jnp.where(local_idx < 0, sentinel, local_idx)
        table_rows = table_size
    pad = Jp - J
    if pad:
        key = jnp.pad(key, (0, pad), constant_values=table_rows)
        w8 = jnp.pad(w8, ((0, 0), (0, pad)))
        cot2 = jnp.pad(cot2, ((0, pad), (0, 0)))

    # scatter-add is order-invariant: an unstable sort is enough (stable
    # sorts cost extra comparator passes on TPU)
    if BIN_PACK:
        packed = ([_pack_bf16_pair(w8[2 * i], w8[2 * i + 1])
                   for i in range(4)]
                  + [_pack_bf16_pair(cot2[:, 0], cot2[:, 1])])
        key_s, *pay = jax.lax.sort((key, *packed), num_keys=1,
                                   is_stable=False)
        halves = [_unpack_bf16_pair(p) for p in pay]
        w8s = jnp.stack([h for pair in halves[:4] for h in pair], axis=0)
        c2s = jnp.stack(list(halves[4]), axis=0)                 # [2, Jp]
    else:
        ops = (key, *(w8[i] for i in range(8)), cot2[:, 0], cot2[:, 1])
        key_s, *pay = jax.lax.sort(ops, num_keys=1, is_stable=False)
        w8s = jnp.stack(pay[:8], axis=0)                         # [8, Jp]
        c2s = jnp.stack(pay[8:], axis=0)                         # [2, Jp]

    valid = key_s < table_rows
    # transposed: sorted key is coarse' * _FINE_W + fine', so the same
    # div/mod yields (coarse', fine') — identical arithmetic on both paths
    crow = jnp.where(valid, key_s // _FINE_W, -1)
    fine = jnp.where(valid, key_s % _FINE_W, 0)

    # tile list: for each window, every chunk its sorted row-run touches
    w_u = jnp.where(valid, crow // _BIN_WB, NW)   # sentinel past all windows
    wids = jnp.arange(NW, dtype=w_u.dtype)
    w_start = jnp.searchsorted(w_u, wids, side="left")
    w_end = jnp.searchsorted(w_u, wids, side="right")
    nonempty = w_end > w_start
    fc = jnp.where(nonempty, w_start // _CHUNK, 0)
    lc = jnp.where(nonempty, (w_end - 1) // _CHUNK, -1)
    ntiles_w = jnp.where(nonempty, lc - fc + 1, 0)
    cum = jnp.concatenate([jnp.zeros(1, ntiles_w.dtype),
                           jnp.cumsum(ntiles_w)])                # [NW+1]
    total = cum[-1]
    NT = n_chunks + NW                       # static bound on total
    t = jnp.arange(NT)
    win_t = jnp.clip(jnp.searchsorted(cum, t, side="right") - 1, 0, NW - 1)
    chunk_t = jnp.clip(fc[win_t] + t - cum[win_t], 0, n_chunks - 1)
    valid_t = (t < total).astype(jnp.int32)
    win_t = win_t.astype(jnp.int32)
    chunk_t = chunk_t.astype(jnp.int32)

    w4 = w8s.reshape(8, n_chunks, 8, _SUB).transpose(1, 2, 0, 3)
    c4 = c2s.reshape(2, n_chunks, 8, _SUB).transpose(1, 2, 0, 3)

    in_specs = [
        pl.BlockSpec((1, 8, _SUB), lambda t, w, c, v: (c[t], 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, _SUB), lambda t, w, c, v: (c[t], 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, 8, _SUB), lambda t, w, c, v: (c[t], 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, 2, _SUB), lambda t, w, c, v: (c[t], 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = (win_t, chunk_t, valid_t,
            crow.reshape(n_chunks, 8, _SUB), fine.reshape(n_chunks, 8, _SUB),
            w4, c4)

    if transposed:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(NT,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((_FINE_W * _C_ROW, _BIN_WB),
                                   lambda t, w, c, v: (0, w[t]),
                                   memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            _scatter_kernel_oct_binned_t,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((_FINE_W * _C_ROW, NW * _BIN_WB),
                                           jnp.float32),
            interpret=interpret,
        )(*args)
        # never-visited windows hold uninitialised memory: mask from counts
        lanemask = jnp.repeat(nonempty, _BIN_WB)
        out = jnp.where(lanemask[None, :], out, 0.0)
        Rlow = -(-table_size // _FINE_W)
        # rows are fine'-major (row = fine' * 16 + cc): split, move cc out,
        # and flatten (fine', coarse') back to the row index — all reshapes
        # on the minor axes, no cross-lane relayout
        out = out[:, :Rlow].reshape(_FINE_W, _C_ROW, Rlow)
        return out.transpose(1, 0, 2).reshape(
            _C_ROW, _FINE_W * Rlow)[:, :table_size]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(NT,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((_BIN_WB, _FINE_W * _C_ROW),
                               lambda t, w, c, v: (w[t], 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _scatter_kernel_oct_binned,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NW * _BIN_WB, _FINE_W * _C_ROW),
                                       jnp.float32),
        interpret=interpret,
    )(*args)

    # never-visited windows hold uninitialised memory: mask from counts
    rowmask = jnp.repeat(nonempty, _BIN_WB)
    out = jnp.where(rowmask[:, None], out, 0.0)
    return out.reshape(NW * _BIN_WB * _FINE_W, _C_ROW)[:table_size]


@functools.partial(jax.jit,
                   static_argnames=("table_size", "interpret", "version"))
def matmul_scatter_add_oct(local_idx: jax.Array, w8: jax.Array,
                           cot2: jax.Array, table_size: int,
                           interpret: bool = False,
                           version: Optional[int] = None) -> jax.Array:
    """d = zeros([T, 16]).at[idx].add((w8[:, None, :] * cot2.T[None]).
    reshape(16, J).T) without materializing the outer product: the kernel
    forms upd[c*2+j] = w_c * cot_j from the factors in VMEM.

    local_idx: [J] i32 in [0, T); w8: [8, J] f32 corner weights; cot2:
    [J, 2] f32 channel cotangents. Returns [T, 16] f32."""
    if version is None:
        version = OCT_VERSION
    J = local_idx.shape[0]
    n_chunks = -(-J // _CHUNK)
    pad = n_chunks * _CHUNK - J
    if pad:
        local_idx = jnp.pad(local_idx, (0, pad), constant_values=-1)
        w8 = jnp.pad(w8, ((0, 0), (0, pad)))
        cot2 = jnp.pad(cot2, ((0, pad), (0, 0)))

    coarse = jnp.where(local_idx < 0, -1, local_idx // _FINE_W)
    fine = local_idx % _FINE_W
    R = -(-table_size // _FINE_W)
    R_pad = -(-R // 8) * 8

    if 2 * R_pad * _FINE_W * _C_ROW * 4 > _WIDE_VMEM_BYTES:
        idx_safe = jnp.maximum(local_idx, 0)
        upd = jnp.where(local_idx[:, None] < 0, 0.0,
                        (w8.T[:, :, None] * cot2[:, None, :]).reshape(-1, 16))
        return jnp.zeros((table_size, _C_ROW), jnp.float32).at[
            idx_safe].add(upd)

    # [8, J] -> [n, 8s, 8c, SUB] (leading-axis permute; trailing lane dim
    # intact, so no lane-crossing relayout); [J, 2] -> [n, 8s, 2, SUB]
    w4 = w8.reshape(8, n_chunks, 8, _SUB).transpose(1, 2, 0, 3)
    c4 = cot2.T.reshape(2, n_chunks, 8, _SUB).transpose(1, 2, 0, 3)

    if version == 2:
        RH = -(-R // _LO)
        RH_pad = -(-RH // 8) * 8
        hi = jnp.where(coarse < 0, -1, coarse // _LO)
        lo = coarse % _LO
        W = _LO * _FINE_W * _C_ROW
        out = pl.pallas_call(
            _scatter_kernel_oct2,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec((1, 8, _SUB), lambda j: (j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, _SUB), lambda j: (j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, _SUB), lambda j: (j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, 8, _SUB), lambda j: (j, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, 2, _SUB), lambda j: (j, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((RH_pad, W), lambda j: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((RH_pad, W), jnp.float32),
            interpret=interpret,
        )(hi.reshape(n_chunks, 8, _SUB), lo.reshape(n_chunks, 8, _SUB),
          fine.reshape(n_chunks, 8, _SUB), w4, c4)
        # rows return (hi, lo, fine)-major = coarse*_FINE_W + fine
        return out.reshape(RH_pad * _LO * _FINE_W, _C_ROW)[:table_size]

    out = pl.pallas_call(
        _scatter_kernel_oct,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 8, _SUB), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, _SUB), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 8, _SUB), lambda j: (j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 2, _SUB), lambda j: (j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R_pad, _FINE_W * _C_ROW), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R_pad, _FINE_W * _C_ROW),
                                       jnp.float32),
        interpret=interpret,
    )(coarse.reshape(n_chunks, 8, _SUB), fine.reshape(n_chunks, 8, _SUB),
      w4, c4)

    return out.reshape(R_pad * _FINE_W, _C_ROW)[:table_size]


@functools.partial(jax.jit,
                   static_argnames=("table_size", "interpret", "version"))
def matmul_scatter_add_wide(local_idx: jax.Array, upd_cm: jax.Array,
                            table_size: int, interpret: bool = False,
                            version: Optional[int] = None) -> jax.Array:
    """d = zeros([table_size, 16]).at[local_idx].add(upd_cm.T) as a dense
    MXU matmul. local_idx: [J] int32 in [0, table_size); upd_cm: [16, J]
    f32 (channel-major — lane-friendly, no trailing-16 padding on the
    host side). Returns [table_size, 16] f32."""
    if version is None:
        version = WIDE_VERSION
    J = local_idx.shape[0]
    n_chunks = -(-J // _CHUNK)
    pad = n_chunks * _CHUNK - J
    if pad:
        local_idx = jnp.pad(local_idx, (0, pad), constant_values=-1)
        upd_cm = jnp.pad(upd_cm, ((0, 0), (0, pad)))

    coarse = jnp.where(local_idx < 0, -1, local_idx // _FINE_W)
    fine = local_idx % _FINE_W
    R = -(-table_size // _FINE_W)
    R_pad = -(-R // 8) * 8

    if 2 * R_pad * _FINE_W * _C_ROW * 4 > _WIDE_VMEM_BYTES:
        # table too large for the VMEM-resident output block: XLA scatter.
        # Padded entries (idx -1 would wrap) are masked to zero updates.
        idx_safe = jnp.maximum(local_idx, 0)
        upd_safe = jnp.where(local_idx[None, :] < 0, 0.0, upd_cm)
        return jnp.zeros((table_size, _C_ROW), jnp.float32).at[
            idx_safe].add(upd_safe.T)

    # [16, J] -> [n, 8, 16, _SUB]
    u4 = upd_cm.reshape(_C_ROW, n_chunks, 8, _SUB).transpose(1, 2, 0, 3)

    if version == 2:
        # factorized kernel: hi one-hot is _LO x smaller; lo rides the
        # output lane axis (see _scatter_kernel_wide2)
        RH = -(-R // _LO)
        RH_pad = -(-RH // 8) * 8
        hi = jnp.where(coarse < 0, -1, coarse // _LO)
        lo = coarse % _LO
        W = _LO * _FINE_W * _C_ROW
        out = pl.pallas_call(
            _scatter_kernel_wide2,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec((1, 8, _SUB), lambda j: (j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, _SUB), lambda j: (j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, _SUB), lambda j: (j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, _C_ROW, _SUB), lambda j: (j, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((RH_pad, W), lambda j: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((RH_pad, W), jnp.float32),
            interpret=interpret,
        )(hi.reshape(n_chunks, 8, _SUB), lo.reshape(n_chunks, 8, _SUB),
          fine.reshape(n_chunks, 8, _SUB), u4)
        # rows come back as (hi, lo, fine)-major: hi*_LO*_FINE_W +
        # lo*_FINE_W + fine = coarse*_FINE_W + fine = table row
        return out.reshape(RH_pad * _LO * _FINE_W, _C_ROW)[:table_size]

    out = pl.pallas_call(
        _scatter_kernel_wide,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 8, _SUB), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, _SUB), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, _C_ROW, _SUB), lambda j: (j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R_pad, _FINE_W * _C_ROW), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R_pad, _FINE_W * _C_ROW),
                                       jnp.float32),
        interpret=interpret,
    )(coarse.reshape(n_chunks, 8, _SUB), fine.reshape(n_chunks, 8, _SUB),
      u4)

    return out.reshape(R_pad * _FINE_W, _C_ROW)[:table_size]
