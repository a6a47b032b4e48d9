"""Optimizer and LR schedule matching the reference training recipe.

Reference (train.py:137, :272-275): ``torch.optim.Adam(lr=2e-4, wd=1e-5,
amsgrad=True)`` with a per-iteration poly(0.9) decay computed from the epoch
and rounded to 8 decimals.  torch's ``weight_decay`` adds wd*param to the
gradient *before* the Adam moments (L2, not decoupled), reproduced here with
``optax.add_decayed_weights`` ahead of ``scale_by_amsgrad``.

The AMP driver variant (train_amp.py:272-278) restarts the poly schedule for
epochs past 249; expose that as ``restart_epoch``.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import optax

from dctseg.config import TrainConfig


def poly_schedule(init_lr: float, end_epoch: int, steps_per_epoch: int,
                  power: float = 0.9,
                  restart_epoch: Optional[int] = None):
    """lr(step) = round(init * (1 - epoch/end_epoch)^power, 8) with the epoch
    derived from the step counter (the reference recomputes it every
    iteration from the epoch loop variable — identical values)."""

    def schedule(step):
        epoch = step // steps_per_epoch
        if restart_epoch is not None:
            epoch = jnp.where(epoch > restart_epoch, epoch - restart_epoch,
                              epoch)
        frac = 1.0 - epoch.astype(jnp.float32) / end_epoch
        lr = init_lr * jnp.power(jnp.maximum(frac, 0.0), power)
        return jnp.round(lr * 1e8) / 1e8

    return schedule


def scale_by_torch_adam(b1: float = 0.9, b2: float = 0.999,
                        eps: float = 1e-8, amsgrad: bool = True
                        ) -> optax.GradientTransformation:
    """torch.optim.Adam's exact update (incl. amsgrad).

    Differs from ``optax.scale_by_amsgrad`` in where bias correction meets
    the running max: torch maxes the *raw* second moment and divides the
    denominator by sqrt(1-b2^t) (``torch/optim/adam.py`` semantics); optax
    maxes the bias-corrected moment.  We match torch for training-dynamics
    parity (verified against torch in tests/test_train.py).
    """
    import jax

    def init(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        state = {"mu": zeros, "nu": jax.tree.map(jnp.zeros_like, params),
                 "count": jnp.zeros((), jnp.int32)}
        if amsgrad:
            state["nu_max"] = jax.tree.map(jnp.zeros_like, params)
        return state

    def update(grads, state, params=None):
        count = state["count"] + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                          state["mu"], grads)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                          state["nu"], grads)
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)
        new_state = {"mu": mu, "nu": nu, "count": count}
        if amsgrad:
            nu_max = jax.tree.map(jnp.maximum, state["nu_max"], nu)
            new_state["nu_max"] = nu_max
            denom_nu = nu_max
        else:
            denom_nu = nu
        updates = jax.tree.map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v) / jnp.sqrt(bc2) + eps),
            mu, denom_nu)
        return updates, new_state

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int
                   ) -> optax.GradientTransformation:
    sched = poly_schedule(cfg.lr, cfg.end_epoch, steps_per_epoch,
                          cfg.poly_power, cfg.amp_lr_restart_epoch)
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        scale_by_torch_adam(amsgrad=cfg.amsgrad),
        optax.scale_by_learning_rate(sched),
    )
