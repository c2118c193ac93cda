"""Block-partitioned Shampoo with grafting, as an optax transformation.

Rebuilds the reference's optimizer.py (469 LoC torch Shampoo): parameters are
partitioned into blocks of at most `block_size` per dimension; each block
keeps Kronecker-factor statistics G_i = sum g g^T per axis, preconditioned by
G_i^(-1/2p) computed with a coupled-Newton iteration (optimizer.py:62-121);
the update magnitude is grafted from a diagonal Adagrad/Adam step
(optimizer.py:130-209); Nesterov momentum on top (optimizer.py:415-470).

TPU notes: statistics and inverse-root math are plain f32 matmuls (MXU);
preconditioners refresh every `update_preconditioner_every` steps under
`lax.cond` so the step stays a single jitted program.
"""

from __future__ import annotations

import math
from typing import Any, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


def matrix_inverse_pth_root(A: jax.Array, p: int, num_iters: int = 20,
                            ridge_epsilon: float = 1e-6) -> jax.Array:
    """A^(-1/p) for symmetric PSD A via the coupled Newton iteration
    (optimizer.py:62-121). Returns f32 [n, n]."""
    n = A.shape[0]
    A = A.astype(jnp.float32)
    identity = jnp.eye(n, dtype=jnp.float32)
    tr = jnp.trace(A) / n
    A = A / jnp.maximum(tr, 1e-30) + ridge_epsilon * identity

    # alpha = -1/p; coupled iteration: M <- (1-alpha) I + alpha M X ... use the
    # standard scheme: X_{k+1} = X_k ((p+1) I - M_k)/p, M_{k+1} = ((p+1) I - M_k)^p M_k / p^p
    alpha = -1.0 / p
    # normalize so the iteration converges: z = 1/ (||A||_F + eps)
    z = 1.0 / jnp.maximum(jnp.linalg.norm(A), 1e-30)
    X = jnp.power(z, -alpha) * identity
    M = z * A

    def body(_, carry):
        X, M = carry
        T = (1.0 - alpha) * identity + alpha * M
        X = X @ T
        M = jnp.linalg.matrix_power(T, p) @ M
        return (X, M)

    X, _ = jax.lax.fori_loop(0, num_iters, body, (X, M))
    # undo trace normalization: (A * c)^(-1/p) = c^(1/p) A^(-1/p)
    return X / jnp.power(jnp.maximum(tr, 1e-30), -alpha)


def _block_splits(dim: int, block: int) -> List[Tuple[int, int]]:
    return [(s, min(s + block, dim)) for s in range(0, dim, block)]


class _BlockState(NamedTuple):
    stats: Tuple[jax.Array, ...]      # per-axis [n_i, n_i]
    precond: Tuple[jax.Array, ...]    # per-axis [n_i, n_i]


class ShampooState(NamedTuple):
    count: jax.Array
    momentum: Any
    diag: Any                          # grafting accumulator
    blocks: Any                        # pytree of lists of _BlockState


def shampoo(learning_rate, block_size: int = 128, beta1: float = 0.9,
            beta2: float = 1.0, matrix_eps: float = 1e-6,
            update_preconditioner_every: int = 10,
            start_preconditioning_step: int = 1, graft: str = "adagrad",
            nesterov: bool = True) -> optax.GradientTransformation:
    """Shampoo over every >=1D parameter; scalars fall back to grafting only.

    beta2=1.0 reproduces the reference's unweighted statistic accumulation.
    """

    def _partition(shape):
        """List of blocks; each block is a tuple of (start, end) per dim."""
        if len(shape) == 0:
            return []
        import itertools

        per_dim = [_block_splits(d, block_size) for d in shape]
        return list(itertools.product(*per_dim))

    def init(params):
        def init_blocks(p):
            if p.ndim == 0:
                return []
            out = []
            for blk in _partition(p.shape):
                dims = [e - s for s, e in blk]
                stats = tuple(jnp.zeros((d, d), jnp.float32) for d in dims)
                prec = tuple(jnp.eye(d, dtype=jnp.float32) for d in dims)
                out.append(_BlockState(stats, prec))
            return out

        return ShampooState(
            count=jnp.zeros([], jnp.int32),
            momentum=jax.tree.map(jnp.zeros_like, params),
            diag=jax.tree.map(jnp.zeros_like, params),
            blocks=jax.tree.map(init_blocks, params,
                                is_leaf=lambda x: isinstance(x, jnp.ndarray)),
        )

    def _precondition_block(g_blk, bs: _BlockState, refresh):
        """Update stats; maybe refresh preconditioners; return Hg."""
        ndim = g_blk.ndim
        new_stats = []
        for axis in range(ndim):
            axes = tuple(a for a in range(ndim) if a != axis)
            gm = jnp.tensordot(g_blk, g_blk, axes=(axes, axes))
            new_stats.append(beta2 * bs.stats[axis] + gm
                             if beta2 < 1.0 else bs.stats[axis] + gm)
        p = 2 * ndim

        def do_refresh(_):
            return tuple(matrix_inverse_pth_root(s, p) for s in new_stats)

        def keep(_):
            return bs.precond

        prec = jax.lax.cond(refresh, do_refresh, keep, None)
        out = g_blk
        for axis in range(ndim):
            out = jnp.tensordot(out, prec[axis], axes=((0,), (0,)))
            # tensordot over axis 0 cycles dims; after ndim applications the
            # order is restored
        return out, _BlockState(tuple(new_stats), prec)

    def update(grads, state, params=None):
        count = state.count + 1
        refresh = jnp.logical_or(
            count <= start_preconditioning_step,
            (count % update_preconditioner_every) == 0)

        new_diag = jax.tree.map(lambda d, g: d + g * g, state.diag, grads)

        def leaf_update(g, blocks, diag):
            if g.ndim == 0 or not blocks:
                return g / (jnp.sqrt(diag) + 1e-12), blocks
            pre = jnp.zeros_like(g)
            new_blocks = []
            for blk_idx, blk in zip(_partition(g.shape), blocks):
                sl = tuple(slice(s, e) for s, e in blk_idx)
                hg, nb = _precondition_block(g[sl], blk, refresh)
                pre = pre.at[sl].set(hg.astype(g.dtype))
                new_blocks.append(nb)
            # grafting: match the Adagrad step's norm (optimizer.py:130-209)
            graft_dir = g / (jnp.sqrt(diag) + 1e-12)
            g_norm = jnp.linalg.norm(graft_dir)
            p_norm = jnp.maximum(jnp.linalg.norm(pre), 1e-16)
            return pre * (g_norm / p_norm), new_blocks

        leaves_g, treedef = jax.tree_util.tree_flatten(grads)
        leaves_b = treedef.flatten_up_to(state.blocks)
        leaves_d = jax.tree_util.tree_leaves(new_diag)
        outs = [leaf_update(g, b, d) for g, b, d in
                zip(leaves_g, leaves_b, leaves_d)]
        updates = jax.tree_util.tree_unflatten(treedef, [o[0] for o in outs])
        new_blocks = jax.tree_util.tree_unflatten(treedef, [o[1] for o in outs])

        mom = jax.tree.map(lambda m, u: beta1 * m + u, state.momentum, updates)
        if nesterov:
            updates = jax.tree.map(lambda m, u: beta1 * m + u, mom, updates)
        else:
            updates = mom

        lr = learning_rate(count) if callable(learning_rate) else learning_rate
        updates = jax.tree.map(lambda u: -lr * u, updates)
        return updates, ShampooState(count=count, momentum=mom,
                                     diag=new_diag, blocks=new_blocks)

    return optax.GradientTransformation(init, update)
