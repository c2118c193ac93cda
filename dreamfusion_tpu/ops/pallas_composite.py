"""Fused volume-compositing Pallas TPU kernel with analytic custom VJP.

The TPU-kernel counterpart of the reference's composite_rays_train CUDA
kernel and its hand-derived backward (raymarching/src/raymarching.cu:501-693).
One pass over a [TILE_N, K] ray tile held in VMEM computes alpha,
transmittance, weights, and the weighted rgb/depth/weight sums without
materializing intermediates in HBM; the backward kernel implements the
closed-form gradients:

    dL/drgb_i   = g_rgb * w_i
    dL/dsigma_i = dt_i * [ sum_c g_rgb_c (T_{i+1} c_i - (C - Caccum_i))
                           + g_ws (1 - ws)            ... (T_{i+1} - tail_w)
                           + g_d  (T_{i+1} t_i - (D - Daccum_i)) ]

(equal to raymarching.cu:662-667 modulo the masked static-shape setting; the
suffix sums (C - Caccum) etc. are computed with reversed cumsums instead of
the CUDA kernel's running accumulators).

Correctness contract: matches ops.composite (the parallel jnp compositor)
and the sequential scan oracle in values AND gradients — tested in
interpret mode on CPU (tests/test_pallas_composite.py) and compiled on TPU.

Use `composite_fused(sigmas, rgbs, deltas, ts)`; shapes [N, K] with K a
multiple of 128 preferred (pads otherwise).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

TILE_N = 256


def _tri_matmul_cumsum(x, *, exclusive: bool):
    """Prefix sum along the last axis as a triangular matmul — Mosaic has
    no cumsum lowering for the TensorCore, and a [K, K] lower-triangular
    matmul IS the MXU-native prefix sum (K<=~512: trivial FLOPs)."""
    K = x.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    tri = (rows < cols if exclusive else rows <= cols).astype(jnp.float32)
    return jnp.dot(x, tri, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _suffix_excl_matmul(x):
    """sum_{k>i} x_k via an upper-triangular matmul (see _tri_matmul_cumsum)."""
    K = x.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    tri = (rows > cols).astype(jnp.float32)
    return jnp.dot(x, tri, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _fwd_kernel(sig_ref, rgb_r_ref, rgb_g_ref, rgb_b_ref, dt_ref, t_ref,
                ws_ref, depth_ref, r_ref, g_ref, b_ref, trans_ref,
                *, T_thresh: float):
    sig = sig_ref[:]
    dt = dt_ref[:]
    alpha = 1.0 - jnp.exp(-sig * dt)                       # [TILE_N, K]
    # exclusive prefix product of (1 - alpha + 1e-15) in log space
    logs = jnp.log(1.0 - alpha + 1e-15)
    trans = jnp.exp(_tri_matmul_cumsum(logs, exclusive=True))  # exclusive
    w = alpha * trans
    if T_thresh > 0.0:
        # transmittance early-stop as a mask (raymarching.cu:557; identical
        # to ops.composite's T_thresh handling)
        w = jnp.where(trans > T_thresh, w, 0.0)
    trans_ref[:] = trans
    ws_ref[:, 0] = jnp.sum(w, axis=-1)
    depth_ref[:, 0] = jnp.sum(w * t_ref[:], axis=-1)
    r_ref[:, 0] = jnp.sum(w * rgb_r_ref[:], axis=-1)
    g_ref[:, 0] = jnp.sum(w * rgb_g_ref[:], axis=-1)
    b_ref[:, 0] = jnp.sum(w * rgb_b_ref[:], axis=-1)


def _bwd_kernel(sig_ref, rgb_r_ref, rgb_g_ref, rgb_b_ref, dt_ref, t_ref,
                trans_ref, gws_ref, gd_ref, gr_ref, gg_ref, gb_ref,
                dsig_ref, dr_ref, dg_ref, db_ref, *, T_thresh: float):
    sig = sig_ref[:]
    dt = dt_ref[:]
    trans = trans_ref[:]
    alpha = 1.0 - jnp.exp(-sig * dt)
    w = alpha * trans
    t_next = trans * (1.0 - alpha)                         # T_{i+1}
    if T_thresh > 0.0:
        # w_i = m_i a_i T_i with the mask m_i = [T_i > thresh] constant wrt
        # sigma (a where-mask in the jnp compositor): the direct T_{i+1}
        # term picks up m_i and the suffix sums run over the masked w.
        m = (trans > T_thresh).astype(w.dtype)
        w = w * m
        t_next = t_next * m

    gws = gws_ref[:, 0:1]
    gd = gd_ref[:, 0:1]
    grads_c = (gr_ref[:, 0:1], gg_ref[:, 0:1], gb_ref[:, 0:1])
    rgbs = (rgb_r_ref[:], rgb_g_ref[:], rgb_b_ref[:])

    suffix_excl = _suffix_excl_matmul

    acc = gws * (t_next - suffix_excl(w))
    acc += gd * (t_next * t_ref[:] - suffix_excl(w * t_ref[:]))
    for gc, c in zip(grads_c, rgbs):
        acc += gc * (t_next * c - suffix_excl(w * c))
        # d rgb: g_c * w
    dsig_ref[:] = dt * acc
    dr_ref[:] = grads_c[0] * w
    dg_ref[:] = grads_c[1] * w
    db_ref[:] = grads_c[2] * w


def _pad(x, n_pad, k_pad):
    return jnp.pad(x, ((0, n_pad), (0, k_pad)))


class FusedOut(NamedTuple):
    weights_sum: jax.Array
    depth: jax.Array
    rgb: jax.Array


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def composite_fused(sigmas, rgbs, deltas, ts, interpret=False,
                    T_thresh=0.0):
    """sigmas [N,K], rgbs [N,K,3], deltas [N,K], ts [N,K] ->
    (weights_sum [N], depth [N], rgb [N,3]). T_thresh>0 applies the
    transmittance early-stop mask (identical to ops.composite)."""
    out, _ = _composite_fused_fwd(sigmas, rgbs, deltas, ts, interpret,
                                  T_thresh)
    return out


def _run_fwd(sigmas, rgbs, deltas, ts, interpret, T_thresh):
    N, K = sigmas.shape
    n_pad = (-N) % TILE_N
    k_pad = (-K) % 128
    Np, Kp = N + n_pad, K + k_pad
    args = [_pad(sigmas, n_pad, k_pad),
            _pad(rgbs[..., 0], n_pad, k_pad),
            _pad(rgbs[..., 1], n_pad, k_pad),
            _pad(rgbs[..., 2], n_pad, k_pad),
            _pad(deltas, n_pad, k_pad),
            _pad(ts, n_pad, k_pad)]
    grid = (Np // TILE_N,)
    row_spec = pl.BlockSpec((TILE_N, Kp), lambda i: (i, 0))
    col_spec = pl.BlockSpec((TILE_N, 1), lambda i: (i, 0))
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, T_thresh=T_thresh),
        grid=grid,
        in_specs=[row_spec] * 6,
        out_specs=[col_spec] * 5 + [row_spec],
        out_shape=[jax.ShapeDtypeStruct((Np, 1), jnp.float32)] * 5
        + [jax.ShapeDtypeStruct((Np, Kp), jnp.float32)],
        interpret=interpret,
    )(*args)
    ws, depth, r, g, b, trans = outs
    out = FusedOut(weights_sum=ws[:N, 0], depth=depth[:N, 0],
                   rgb=jnp.stack([r[:N, 0], g[:N, 0], b[:N, 0]], -1))
    return out, trans


def _composite_fused_fwd(sigmas, rgbs, deltas, ts, interpret,
                         T_thresh=0.0):
    sigmas = sigmas.astype(jnp.float32)
    rgbs = rgbs.astype(jnp.float32)
    deltas = deltas.astype(jnp.float32)
    ts = ts.astype(jnp.float32)
    out, trans = _run_fwd(sigmas, rgbs, deltas, ts, interpret, T_thresh)
    return out, (sigmas, rgbs, deltas, ts, trans)


def _composite_fused_bwd(interpret, T_thresh, res, g):
    sigmas, rgbs, deltas, ts, trans = res
    gws, gd, grgb = g
    N, K = sigmas.shape
    n_pad = (-N) % TILE_N
    k_pad = (-K) % 128
    Np, Kp = N + n_pad, K + k_pad

    def padc(x):  # [N] -> [Np, 1]
        return jnp.pad(x.astype(jnp.float32)[:, None], ((0, n_pad), (0, 0)))

    args = [_pad(sigmas, n_pad, k_pad),
            _pad(rgbs[..., 0], n_pad, k_pad),
            _pad(rgbs[..., 1], n_pad, k_pad),
            _pad(rgbs[..., 2], n_pad, k_pad),
            _pad(deltas, n_pad, k_pad),
            _pad(ts, n_pad, k_pad),
            _pad(trans, 0, 0),
            padc(gws), padc(gd),
            padc(grgb[..., 0]), padc(grgb[..., 1]), padc(grgb[..., 2])]
    grid = (Np // TILE_N,)
    row_spec = pl.BlockSpec((TILE_N, Kp), lambda i: (i, 0))
    col_spec = pl.BlockSpec((TILE_N, 1), lambda i: (i, 0))
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, T_thresh=T_thresh),
        grid=grid,
        in_specs=[row_spec] * 7 + [col_spec] * 5,
        out_specs=[row_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((Np, Kp), jnp.float32)] * 4,
        interpret=interpret,
    )(*args)
    dsig, dr, dg, db = outs
    return (dsig[:N, :K], jnp.stack([dr[:N, :K], dg[:N, :K], db[:N, :K]], -1),
            jnp.zeros_like(deltas), jnp.zeros_like(ts))


composite_fused.defvjp(_composite_fused_fwd, _composite_fused_bwd)
