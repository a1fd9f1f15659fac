"""Optimizers and LR schedules (optax), matching the reference trainers.

Reference: utils/pipelines/trainer_lighting.py:334-394 (duplicated in every
trainer): Adam or SGD(momentum, nesterov) with optional per-epoch-stepped
{CosineAnnealingLR(T_max=10), ExponentialLR(gamma=0.99),
CyclicLR(triangular2, base=lr/1e4, step_size_up=5)}.  Lightning steps the
scheduler once per epoch, so schedules here are functions of
`step // steps_per_epoch`.

Weight decay follows torch's coupled L2 (grad += wd * param before Adam/SGD
momentum), not AdamW.
"""

from __future__ import annotations


from typing import Optional

import optax


def make_schedule(name: Optional[str], lr: float, steps_per_epoch: int):
    import jax.numpy as jnp

    if name is None:
        return lambda step: jnp.asarray(lr, jnp.float32)

    def epoch_of(step):
        return jnp.asarray(step, jnp.float32) // max(steps_per_epoch, 1)

    if name == "ExponentialLR":
        return lambda step: lr * (0.99 ** epoch_of(step))
    if name == "CosineAnnealingLR":
        return lambda step: lr * 0.5 * (1 + jnp.cos(jnp.pi * epoch_of(step) / 10.0))
    if name == "CyclicLR":
        base = lr / 10000.0
        step_up = 5.0

        def sched(step):
            e = epoch_of(step)
            cycle = jnp.floor(e / (2 * step_up))
            x = jnp.abs(e / step_up - 2 * cycle - 1)
            scale = 1.0 / (2.0**cycle)
            return base + (lr - base) * jnp.maximum(1 - x, 0.0) * scale

        return sched
    raise NotImplementedError(f"unknown scheduler {name!r}")


def make_optimizer(
    name: str = "Adam",
    lr: float = 1e-3,
    scheduler: Optional[str] = None,
    steps_per_epoch: int = 1,
    weight_decay: float = 0.0,
    momentum: float = 0.9,
) -> optax.GradientTransformation:
    schedule = make_schedule(scheduler, lr, steps_per_epoch)
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    if name == "Adam":
        parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    elif name == "SGD":
        parts.append(optax.trace(decay=momentum, nesterov=True))
    else:
        raise NotImplementedError(f"unknown optimizer {name!r}")
    parts.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*parts)
