"""Train state + optimizer matching the reference's torch.optim.Adam setup."""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax
import jax
import jax.numpy as jnp
import optax

from alignsdf_tpu.config import Specs


@flax.struct.dataclass
class TrainState:
    """Replicated/sharded training state (a pytree)."""

    params: Any
    batch_stats: Any
    consts: Any       # non-trainable constants (e.g. MANO model tensors)
    opt_state: Any
    epoch: jax.Array  # int32 scalar — drives LR schedule + additional-loss gate


def make_optimizer(specs: Specs) -> optax.GradientTransformation:
    """Adam(lr from the step schedule) with torch defaults
    (reference train.py:396: betas (0.9, 0.999), eps 1e-8, no weight decay);
    optional global-norm clipping (reference train.py:585-586).

    The learning rate is injected per-step via ``optax.scale_by_learning_rate``
    driven from the epoch in TrainState, so one compiled step serves every
    epoch (reference adjusts param-group LR per epoch, train.py:310-312).
    """
    chain = []
    if specs.gradient_clip_norm is not None:
        chain.append(optax.clip_by_global_norm(specs.gradient_clip_norm))
    chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    chain.append(optax.scale(-1.0))  # LR applied separately (see apply_updates_with_lr)
    return optax.chain(*chain)


def learning_rate_for_epoch(specs: Specs, epoch: jax.Array) -> jax.Array:
    """Step schedule: initial * factor**(epoch // interval) (reference train.py:55-62)."""
    sched = specs.lr_schedules[0]
    return sched.initial * jnp.power(
        jnp.asarray(sched.factor, jnp.float32),
        (epoch // sched.interval).astype(jnp.float32),
    )


class LinearWeightSchedule:
    """Linear ramp from `initial` to `target` over `interval` epochs starting
    at `start_ep` (reference train.py:65-87; used by KL-weighted variants)."""

    def __init__(self, start_ep: int, interval: int, initial: float = 0.0,
                 target: float = 1.0):
        self.start_ep = start_ep
        self.interval = interval
        self.initial = initial
        self.target = target

    def get_weight(self, epoch: int) -> float:
        if epoch < self.start_ep:
            return self.initial
        return min(
            self.target,
            self.initial + (self.target - self.initial)
            * (epoch - self.start_ep) / self.interval,
        )
