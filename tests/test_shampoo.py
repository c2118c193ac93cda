"""Shampoo optimizer tests: inverse-pth-root accuracy, quadratic convergence,
block partitioning."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import optax

from dreamfusion_tpu.training.shampoo import (matrix_inverse_pth_root,
                                              shampoo)


def test_matrix_inverse_pth_root():
    rng = np.random.RandomState(0)
    M = rng.randn(8, 8).astype(np.float32)
    A = M @ M.T + 0.1 * np.eye(8, dtype=np.float32)
    for p in (2, 4):
        X = np.asarray(matrix_inverse_pth_root(jnp.asarray(A), p,
                                               num_iters=40,
                                               ridge_epsilon=1e-8))
        # X approx A^(-1/p): X^p A approx I
        Xp = np.linalg.matrix_power(X, p)
        err = np.abs(Xp @ A - np.eye(8)).max()
        assert err < 0.05, (p, err)


@pytest.mark.slow
def test_shampoo_optimizes_quadratic():
    rng = np.random.RandomState(1)
    A = rng.randn(6, 6).astype(np.float32)
    target = jnp.asarray(rng.randn(4, 6).astype(np.float32))

    def loss(W):
        return jnp.sum((W @ jnp.asarray(A) - target) ** 2)

    W = jnp.zeros((4, 6))
    tx = shampoo(0.5, block_size=8, update_preconditioner_every=2)
    state = tx.init(W)
    step = jax.jit(lambda W, s: _step(W, s))

    def _step(W, s):
        g = jax.grad(loss)(W)
        u, s = tx.update(g, s, W)
        return optax.apply_updates(W, u), s

    l0 = float(loss(W))
    for _ in range(40):
        W, state = _step(W, state)
    l1 = float(loss(W))
    assert l1 < l0 * 0.05, (l0, l1)


def test_shampoo_block_partitioning_and_pytree():
    params = {"big": jnp.ones((20, 6)), "scalar": jnp.ones(())}
    tx = shampoo(0.1, block_size=8)
    state = tx.init(params)
    # 20 -> 3 blocks x 6 -> 1 block = 3 blocks for 'big'
    assert len(state.blocks["big"]) == 3
    g = jax.tree.map(jnp.ones_like, params)
    updates, state2 = tx.update(g, state, params)
    assert updates["big"].shape == (20, 6)
    assert jnp.isfinite(updates["scalar"])
    assert all(jnp.all(jnp.isfinite(u)) for u in jax.tree_util.tree_leaves(updates))
