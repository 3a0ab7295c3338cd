"""Optimizer + LR schedule factory (optax).

Mirrors the reference factory (/root/reference/src/utility.py:50-84):
SGD (momentum) / Adam / RMSprop with weight decay, a piecewise-constant
epoch-decay factor from the ``--decay``/``--gamma`` DSL, and the epoch-1
linear warm-up ramp (reference main.py:176-178,214-220). The schedule is a
per-STEP optax schedule built from (steps_per_epoch, epochs).
"""

from __future__ import annotations

from typing import Callable

import optax

from nlspn_eccv20_tpu.config import Config


def make_lr_schedule(cfg: Config, steps_per_epoch: int) -> Callable:
    """Returns step -> lr. Epochs are 1-indexed as in the reference."""
    decay, gamma = cfg.decay_schedule()
    warm_total = max(steps_per_epoch, 1)

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step)
        epoch = step // steps_per_epoch + 1  # 1-indexed
        factor = jnp.asarray(gamma[-1], jnp.float32)
        # first boundary with epoch < d wins -> scan from the right
        for d, g in zip(reversed(decay), reversed(gamma)):
            factor = jnp.where(epoch < d, g, factor)
        lr = cfg.lr * factor
        if cfg.warm_up:
            # linear ramp over epoch 1: lr * (i+1)/steps_per_epoch
            ramp = (step + 1.0) / warm_total
            lr = jnp.where(epoch <= 1, cfg.lr * ramp * factor, lr)
        return lr

    return schedule


def make_optimizer(cfg: Config, steps_per_epoch: int):
    """(optax.GradientTransformation, schedule_fn)."""
    schedule = make_lr_schedule(cfg, steps_per_epoch)
    if cfg.optimizer == "SGD":
        tx = optax.sgd(schedule, momentum=cfg.momentum)
    elif cfg.optimizer == "ADAM":
        tx = optax.adam(schedule, b1=cfg.betas[0], b2=cfg.betas[1],
                        eps=cfg.epsilon)
    elif cfg.optimizer == "RMSprop":
        # torch.optim.RMSprop semantics (reference utility.py:67-69):
        # alpha=0.99, eps added OUTSIDE the sqrt, no momentum.
        tx = optax.rmsprop(schedule, decay=0.99, eps=cfg.epsilon,
                           eps_in_sqrt=False)
    else:
        raise NotImplementedError(cfg.optimizer)
    if cfg.weight_decay > 0:
        tx = optax.chain(optax.add_decayed_weights(cfg.weight_decay), tx)
    return tx, schedule
