"""Optimizer/scheduler factory for the DVGO module training stack.

Rebuilds the lightning NeRFModule's choose_optimizer / choose_scheduler
(reference: frameworks/nerf/modules/lightning_base.py:36-76) as optax
transforms:

- optimizers: SGD (momentum 0.9, nesterov) and Adam, both with weight
  decay, at params['max_lr'].
- schedulers (all per-*step*, like the reference's {'interval': 'step'}):
    ExpLR_step      lr *= step_decay each step
    StepLR_step     lr *= step_decay every decay_steps steps
    StepAutoLR_step lr *= 0.1 every int(0.8 * steps_per_epoch) steps
    OneCycLR        torch OneCycleLR (cos anneal, pct_start 0.3,
                    div_factor 25, final_div_factor 1e4) over
                    (steps_per_epoch + 1) * num_epochs steps
  Unknown names fall back to constant lr (the reference prints
  "lr_scheduler not found!" and returns None).
"""

from __future__ import annotations

from typing import Callable, Dict

import optax

_DEFAULTS = dict(optimizer="Adam", lr_scheduler="ExpLR_step",
                 step_decay=0.9999, decay_steps=1000, steps_per_epoch=0,
                 num_epochs=1, max_lr=0.1, weight_decay=5e-4)


def make_lr_schedule(params: Dict) -> Callable[[int], float]:
    p = {**_DEFAULTS, **params}
    max_lr = p["max_lr"]
    name = p["lr_scheduler"]
    if name == "ExpLR_step":
        return lambda step: max_lr * p["step_decay"] ** step
    if name == "StepLR_step":
        return optax.exponential_decay(max_lr, p["decay_steps"],
                                       p["step_decay"], staircase=True)
    if name == "StepAutoLR_step":
        size = max(int(p["steps_per_epoch"] * 0.8), 1)
        return optax.exponential_decay(max_lr, size, 0.1, staircase=True)
    if name == "OneCycLR":
        total = (p["steps_per_epoch"] + 1) * p["num_epochs"]
        return optax.cosine_onecycle_schedule(
            transition_steps=max(total, 1), peak_value=max_lr,
            pct_start=0.3, div_factor=25.0, final_div_factor=1e4)
    return lambda step: max_lr  # reference: scheduler None -> constant lr


def make_module_optimizer(params: Dict) -> optax.GradientTransformation:
    """choose_optimizer + choose_scheduler composed into one transform."""
    p = {**_DEFAULTS, **params}
    sched = make_lr_schedule(p)
    if p["optimizer"] == "SGD":
        return optax.chain(
            optax.add_decayed_weights(p["weight_decay"]),
            optax.sgd(sched, momentum=0.9, nesterov=True))
    if p["optimizer"] == "Adam":
        return optax.chain(
            optax.add_decayed_weights(p["weight_decay"]),
            optax.adam(sched))
    raise AssertionError("optimizer not implemented")  # lightning_base.py:45
