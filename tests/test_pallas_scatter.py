"""Pallas MXU matmul-scatter vs the XLA scatter-add oracle.

The kernel replaces the reference's gridencoder backward atomicAdd
(gridencoder/src/gridencoder.cu:296-311); on CPU it runs in interpreter
mode. Tolerances reflect the bf16 operand rounding (the reference's own
accumulation is fp16 atomics, so this is not a parity regression).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamfusion_tpu.ops import grid_encoder
from dreamfusion_tpu.ops.grid_encoder import GridEncoderSpec
from dreamfusion_tpu.ops.pallas_scatter import matmul_scatter_add


def _rand(J, T, seed=0):
    k = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(k, 3)
    idx = jax.random.randint(k1, (J,), 0, T, dtype=jnp.int32)
    u0 = jax.random.normal(k2, (J,))
    u1 = jax.random.normal(k3, (J,))
    return idx, u0, u1


@pytest.mark.parametrize("J,T", [(1000, 520), (5000, 4920), (300, 65536)])
def test_matches_oracle(J, T):
    idx, u0, u1 = _rand(J, T)
    oracle = jnp.zeros((T, 2)).at[idx].add(jnp.stack([u0, u1], -1))
    got = matmul_scatter_add(idx, u0, u1, T, interpret=True)
    assert got.shape == (T, 2)
    scale = float(jnp.max(jnp.abs(oracle))) + 1e-9
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(oracle) / scale, atol=2e-2)


def test_collisions_accumulate():
    # all updates land on one row: worst case for the matmul accumulation
    J, T = 4096, 64
    idx = jnp.full((J,), 7, jnp.int32)
    u0 = jnp.ones((J,))
    u1 = -jnp.ones((J,))
    got = matmul_scatter_add(idx, u0, u1, T, interpret=True)
    np.testing.assert_allclose(float(got[7, 0]), J, rtol=1e-2)
    np.testing.assert_allclose(float(got[7, 1]), -J, rtol=1e-2)
    assert float(jnp.abs(got).sum()) == pytest.approx(2 * J, rel=1e-2)


def test_encoder_bwd_pallas_matches_xla():
    """The encoder's custom VJP, forced onto the Pallas path (interpret),
    must match the XLA scatter path."""
    spec = GridEncoderSpec(input_dim=3, num_levels=4, level_dim=2,
                           base_resolution=8, per_level_scale=1.5,
                           log2_hashmap_size=9, gridtype="hash")
    table = spec.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(1).uniform(-0.9, 0.9, (64, 3)),
                    jnp.float32)
    cot = jnp.asarray(np.random.RandomState(2).randn(64, spec.output_dim),
                      jnp.float32)

    def loss(tab):
        return jnp.sum(spec(tab, x) * cot)

    old = grid_encoder.SCATTER_IMPL
    try:
        grid_encoder.SCATTER_IMPL = "xla"
        g_xla = jax.grad(loss)(table)
        grid_encoder.SCATTER_IMPL = "interpret"
        g_pl = jax.grad(loss)(table)
    finally:
        grid_encoder.SCATTER_IMPL = old

    scale = float(jnp.max(jnp.abs(g_xla))) + 1e-9
    np.testing.assert_allclose(np.asarray(g_pl) / scale,
                               np.asarray(g_xla) / scale, atol=2e-2)
    # and the pallas path must actually produce nonzero gradients
    assert float(jnp.abs(g_pl).max()) > 0


def test_matmul_scatter_add_wide_matches_oracle():
    """Wide-row (16-channel) scatter vs a numpy .at[].add oracle, with
    duplicate indices and a padded tail."""
    from dreamfusion_tpu.ops.pallas_scatter import matmul_scatter_add_wide

    rng = np.random.RandomState(0)
    J, T = 5000, 1000
    idx = rng.randint(0, T, size=J).astype(np.int32)
    upd = rng.randn(16, J).astype(np.float32)

    got = matmul_scatter_add_wide(jnp.asarray(idx), jnp.asarray(upd), T,
                                  interpret=True)
    want = np.zeros((T, 16), np.float32)
    np.add.at(want, idx, upd.T)
    # updates round to bf16 before the MXU accumulate (same as the C=2
    # kernel and the reference's fp16 atomics): tolerance scaled to the
    # update magnitude
    scale = np.abs(upd).max()
    np.testing.assert_allclose(np.asarray(got) / scale, want / scale,
                               atol=2e-2)


@pytest.mark.parametrize("J,T", [(5000, 1000), (3000, 65536), (500, 4096)])
def test_wide_v2_factorized_matches_oracle_and_v1(J, T):
    """The factorized (hi/lo radix) wide kernel must agree with the XLA
    oracle and with v1 on identical inputs, including duplicate indices
    and a padded tail."""
    from dreamfusion_tpu.ops.pallas_scatter import matmul_scatter_add_wide

    rng = np.random.RandomState(1)
    idx = rng.randint(0, T, size=J).astype(np.int32)
    upd = rng.randn(16, J).astype(np.float32)

    v2 = matmul_scatter_add_wide(jnp.asarray(idx), jnp.asarray(upd), T,
                                 interpret=True, version=2)
    v1 = matmul_scatter_add_wide(jnp.asarray(idx), jnp.asarray(upd), T,
                                 interpret=True, version=1)
    want = np.zeros((T, 16), np.float32)
    np.add.at(want, idx, upd.T)
    scale = np.abs(upd).max()
    np.testing.assert_allclose(np.asarray(v2) / scale, want / scale,
                               atol=2e-2)
    # v1 and v2 do the same bf16 rounding; they should agree very tightly
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1),
                               rtol=1e-5, atol=1e-5)


def test_oct_factored_matches_wide_and_oracle():
    """matmul_scatter_add_oct (factors in VMEM) == matmul_scatter_add_wide
    on the materialized outer product == the XLA scatter oracle."""
    from dreamfusion_tpu.ops.pallas_scatter import (matmul_scatter_add_oct,
                                                    matmul_scatter_add_wide)

    key = jax.random.PRNGKey(9)
    k1, k2, k3 = jax.random.split(key, 3)
    J, T = 3000, 4096
    idx = jax.random.randint(k1, (J,), 0, T, dtype=jnp.int32)
    w8 = jax.random.normal(k2, (8, J))
    cot2 = jax.random.normal(k3, (J, 2))

    got = matmul_scatter_add_oct(idx, w8, cot2, T, interpret=True)
    upd_cm = (w8[:, None, :] * cot2.T[None, :, :]).reshape(16, J)
    wide = matmul_scatter_add_wide(idx, upd_cm, T, interpret=True)
    oracle = jnp.zeros((T, 16)).at[idx].add(upd_cm.T)

    scale = float(jnp.max(jnp.abs(oracle))) + 1e-9
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(oracle) / scale, atol=2e-2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(wide),
                               atol=1e-4 * scale)

    # VMEM-fallback path (huge table): XLA scatter with masked padding
    T_big = 1 << 21
    got_big = matmul_scatter_add_oct(idx, w8, cot2, T_big, interpret=True)
    oracle_big = jnp.zeros((T_big, 16)).at[idx].add(upd_cm.T)
    np.testing.assert_allclose(np.asarray(got_big[:T]),
                               np.asarray(oracle_big[:T]), atol=1e-5 * scale)


@pytest.mark.parametrize("J,T", [(5000, 1000), (3000, 65536), (500, 4096),
                                 (2048, 728)])
def test_oct_v2_factorized_matches_oracle_and_v1(J, T):
    """The factorized (hi/lo) oct kernel must agree with the XLA oracle and
    with oct v1, including duplicate indices, a padded tail, and table
    sizes whose row count is not a multiple of the lo radix."""
    from dreamfusion_tpu.ops.pallas_scatter import matmul_scatter_add_oct

    rng = np.random.RandomState(3)
    idx = jnp.asarray(rng.randint(0, T, size=J).astype(np.int32))
    w8 = jnp.asarray(rng.randn(8, J).astype(np.float32))
    cot2 = jnp.asarray(rng.randn(J, 2).astype(np.float32))

    v2 = matmul_scatter_add_oct(idx, w8, cot2, T, interpret=True, version=2)
    v1 = matmul_scatter_add_oct(idx, w8, cot2, T, interpret=True, version=1)
    upd = (np.asarray(w8).T[:, :, None] * np.asarray(cot2)[:, None, :]
           ).reshape(J, 16)
    want = np.zeros((T, 16), np.float32)
    np.add.at(want, np.asarray(idx), upd)
    scale = np.abs(upd).max()
    np.testing.assert_allclose(np.asarray(v2) / scale, want / scale,
                               atol=2e-2)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("transposed", [False, True])
@pytest.mark.parametrize("J,T", [
    (5000, 65536), (3000, 4096),
    pytest.param(2048, 728, marks=pytest.mark.slow),
    pytest.param(300, 65536, marks=pytest.mark.slow)])
def test_oct_binned_matches_oracle(J, T, transposed):
    """The binned (sorted-window) oct kernel must agree with the XLA
    oracle, including duplicate indices, padded tails (J not a multiple of
    the chunk size), tables smaller than one window, and tables whose row
    count is not a multiple of the window height. The transposed variant
    (channel-major [16, T] output, fine'-in-MSBs row split) must return
    exactly the flat variant's values transposed."""
    from dreamfusion_tpu.ops.pallas_scatter import (
        matmul_scatter_add_oct, matmul_scatter_add_oct_binned)

    rng = np.random.RandomState(7)
    idx = jnp.asarray(rng.randint(0, T, size=J).astype(np.int32))
    w8 = jnp.asarray(rng.randn(8, J).astype(np.float32))
    cot2 = jnp.asarray(rng.randn(J, 2).astype(np.float32))

    got = matmul_scatter_add_oct_binned(idx, w8, cot2, T, interpret=True,
                                        transposed=transposed)
    if transposed:
        assert got.shape == (16, T)
        got = got.T
    v2 = matmul_scatter_add_oct(idx, w8, cot2, T, interpret=True)
    upd = (np.asarray(w8).T[:, :, None] * np.asarray(cot2)[:, None, :]
           ).reshape(J, 16)
    want = np.zeros((T, 16), np.float32)
    np.add.at(want, np.asarray(idx), upd)
    scale = np.abs(upd).max()
    np.testing.assert_allclose(np.asarray(got) / scale, want / scale,
                               atol=2e-2)
    # binned rounds each FACTOR to bf16 before the product (the packed
    # sort payload), v2 rounds the f32 product once — one extra bf16
    # rounding (~2^-8 relative per factor) plus accumulation-order drift
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(v2) / scale, atol=1.2e-2)


@pytest.mark.parametrize("transposed", [False, True])
def test_oct_binned_skew_and_empty_windows(transposed):
    """All updates in ONE window (every other window untouched): unvisited
    output blocks must come back zero, not garbage; and a fully dense
    single-row pileup must accumulate exactly."""
    from dreamfusion_tpu.ops.pallas_scatter import matmul_scatter_add_oct_binned

    J, T = 4096, 65536
    # rows all inside window 3 (coarse rows [768, 1024) -> idx of 8 fine)
    rng = np.random.RandomState(11)
    idx = jnp.asarray((rng.randint(768 * 8, 1024 * 8, size=J)
                       ).astype(np.int32))
    w8 = jnp.ones((8, J), jnp.float32)
    cot2 = jnp.ones((J, 2), jnp.float32)
    got = matmul_scatter_add_oct_binned(idx, w8, cot2, T, interpret=True,
                                        transposed=transposed)
    if transposed:
        got = got.T
    want = np.zeros((T, 16), np.float32)
    np.add.at(want, np.asarray(idx), np.ones((J, 16), np.float32))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-2, atol=1e-3)
    # rows outside the hot window are exactly zero (mask of unvisited
    # windows + no stray updates). NOTE: under the transposed row split the
    # flat-row prefix is not one contiguous window, but every row outside
    # [768*8, 1024*8) is still un-scattered and must be zero.
    assert float(np.abs(np.asarray(got[: 768 * 8])).max()) == 0.0
    assert float(np.abs(np.asarray(got[1024 * 8:])).max()) == 0.0


@pytest.mark.slow
@pytest.mark.parametrize("impl", ["binned-interpret", "binned-t-interpret"])
def test_oct_binned_in_encoder_bwd(impl):
    """grid_encoder backward with the binned scatter impls (flat and
    transposed/channel-major) matches the XLA oracle path end-to-end."""
    # gridtype="tiled" (the production grid backbone, networks.py): every
    # level is affine so the OCT path runs; log2_hashmap_size=13 puts the
    # largest level (8192 rows) past the binned-routing threshold while
    # the small levels keep the unbinned kernel -- both paths in one
    # backward. (gridtype="hash" would make the top level non-affine and
    # silently skip the oct path entirely.)
    spec_x = GridEncoderSpec(input_dim=3, num_levels=4, level_dim=2,
                             base_resolution=8, per_level_scale=1.5,
                             log2_hashmap_size=13, gridtype="tiled",
                             scatter_impl="xla")
    spec_b = GridEncoderSpec(input_dim=3, num_levels=4, level_dim=2,
                             base_resolution=8, per_level_scale=1.5,
                             log2_hashmap_size=13, gridtype="tiled",
                             scatter_impl=impl)
    table = spec_x.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(1).uniform(-0.9, 0.9, (64, 3)),
                    jnp.float32)
    cot = jnp.asarray(np.random.RandomState(2).randn(64, spec_x.output_dim),
                      jnp.float32)
    gx = jax.vjp(lambda t: spec_x(t, x), table)[1](cot)[0]
    gb = jax.vjp(lambda t: spec_b(t, x), table)[1](cot)[0]
    scale = float(jnp.max(jnp.abs(gx))) + 1e-9
    np.testing.assert_allclose(np.asarray(gb) / scale,
                               np.asarray(gx) / scale, atol=2e-2)
