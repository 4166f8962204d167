"""LR schedule matching the reference's timm `create_scheduler` setup.

The reference builds a timm CosineLRScheduler from argparse defaults
(train_and_validate.py:150-151, args at :214-251: sched=cosine, warmup 5
epochs from warmup_lr 1e-6, min_lr 1e-5, cooldown 10) and steps it once per
epoch (train_and_validate.py:168), so the LR is piecewise-constant within an
epoch.  This reimplements that exact curve as a pure function of the global
step — jittable, checkpoint-free, and resumable by construction.
"""

from __future__ import annotations

import jax.numpy as jnp

from vision_transformer_cam_tpu.configs import OptimConfig


def scaled_base_lr(cfg: OptimConfig, global_batch_size: int) -> float:
    """Linear LR scaling lr * batch / 512 (train_and_validate.py:148-149)."""
    if cfg.linear_lr_scaling:
        return cfg.lr * global_batch_size / 512.0
    return cfg.lr


def timm_cosine_schedule(cfg: OptimConfig, base_lr: float,
                         steps_per_epoch: int):
    """timm CosineLRScheduler(t_in_epochs=True) EXACT semantics, as built by
    `create_scheduler` for the reference args (train_and_validate.py:150-151,
    :214-251): warmup_prefix=False (the timm default), cycle_mul=1,
    cycle_limit=1, decay_rate entering only for cycles >= 1 (never reached).

      epoch <  warmup:            warmup_lr + epoch/warmup * (lr - warmup_lr)
      warmup <= epoch < epochs:   min_lr + (lr-min_lr)/2 * (1+cos(pi*u)),
                                  u = epoch / epochs
                                  (warmup_prefix=False: the cosine phase runs
                                  over the FULL t_initial INCLUDING the warmup
                                  epochs — at epoch 5/100 the LR is already
                                  ~0.6% below base and the gap persists)
      epoch >= epochs (cooldown): min_lr   (cycle index >= cycle_limit)

    Pinned against a vendored timm-formula golden curve in
    tests/test_train.py::test_schedule_timm_curve.
    """
    warm, total = float(cfg.warmup_epochs), float(cfg.epochs)

    def schedule(step):
        epoch = jnp.floor(step / steps_per_epoch)
        warm_lr = cfg.warmup_lr + epoch / jnp.maximum(warm, 1.0) \
            * (base_lr - cfg.warmup_lr)
        u = jnp.clip(epoch / jnp.maximum(total, 1.0), 0.0, 1.0)
        cos_lr = cfg.min_lr + 0.5 * (base_lr - cfg.min_lr) \
            * (1.0 + jnp.cos(jnp.pi * u))
        return jnp.where(epoch < warm, warm_lr, cos_lr)

    return schedule
