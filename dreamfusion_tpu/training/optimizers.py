"""Optimizers and LR schedules.

Rebuilds the reference's optimizer setup (main.py:128-131):
- Adam(betas=(0.9, 0.99), eps=1e-15) over per-group learning rates:
  the grid encoder's hash table trains at 10x the base LR
  (network_grid.py:170-181), and frozen groups (DVGO editing,
  network.py:271-283) receive no updates.
- LambdaLR schedule lr(step) = lr0 * 0.1 ** min(step / iters, 1), stepped
  every iteration (scheduler_update_every_step=True in main.py:143).

The reference also ships a block-partitioned Shampoo (optimizer.py); see
`shampoo()` here for the optax equivalent.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax


def lambda_decay_schedule(base_lr: float, iters: int) -> Callable:
    """0.1 ** min(step/iters, 1) decay (main.py:131)."""
    def sched(step):
        return base_lr * 0.1 ** jnp.minimum(step / iters, 1.0)
    return sched


def _label_params(params, frozen_prefixes=()) -> Any:
    """'encoder' for grid-encoder embedding tables (10x LR), 'frozen' for
    no-update groups, 'net' otherwise."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label_of(path):
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        joined = "/".join(str(k) for k in keys)
        for pre in frozen_prefixes:
            if pre in joined:
                return "frozen"
        if "embeddings" in joined:
            return "encoder"
        return "net"

    return jax.tree_util.tree_map_with_path(lambda p, _: label_of(p), params)


def build_optimizer(cfg, params, frozen_prefixes=()) -> optax.GradientTransformation:
    base = lambda_decay_schedule(cfg.lr, cfg.iters)
    enc = lambda_decay_schedule(cfg.lr * 10.0, cfg.iters)

    def adam(sched):
        return optax.adam(sched, b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps)

    if cfg.optimizer == "shampoo":
        def opt(sched):
            return shampoo(sched, b1=cfg.adam_b1, b2=cfg.adam_b2)
    else:
        opt = adam

    labels = _label_params(params, frozen_prefixes)
    return optax.multi_transform(
        {"net": opt(base), "encoder": opt(enc), "frozen": optax.set_to_zero()},
        labels)


def shampoo(learning_rate, b1: float = 0.9, b2: float = 0.99,
            block_size: int = 128, update_preconditioner_every: int = 10):
    """Block-partitioned Shampoo with Adagrad grafting — our own
    implementation (training/shampoo.py), rebuilding the reference's
    optimizer.py (coupled-Newton inverse-pth-root, optimizer.py:62-470)."""
    from dreamfusion_tpu.training.shampoo import shampoo as _shampoo

    return _shampoo(learning_rate, block_size=block_size, beta1=b1,
                    update_preconditioner_every=update_preconditioner_every)


def ema_update(ema_params, params, decay: float):
    """Exponential moving average of parameters (torch_ema equivalent,
    nerf/utils.py:233-236)."""
    return jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p,
                        ema_params, params)
