"""Train state + optimizer, the optax analog of the reference's timm
`create_optimizer` (train_and_validate.py:150) and freeze logic (:130-137).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from vision_transformer_cam_tpu.configs import OptimConfig
from vision_transformer_cam_tpu.train.schedule import (scaled_base_lr,
                                                       timm_cosine_schedule)


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    opt_state: Any


_TRAINABLE_WHEN_FROZEN = ("head", "head1", "pre_logits")


def trainable_mask(params, freeze_backbone: bool):
    """Reference freeze (train_and_validate.py:130-137): every param whose
    name lacks 'head'/'pre_logits' stops training.  NB 'head1' contains
    'head', so the top-16 patch head stays trainable there too — preserved.
    """
    def mask(path, _):
        if not freeze_backbone:
            return True
        keys = [str(getattr(p, "key", getattr(p, "idx", ""))) for p in path]
        return any(k in _TRAINABLE_WHEN_FROZEN for k in keys)

    return jax.tree_util.tree_map_with_path(mask, params)


def make_optimizer(cfg: OptimConfig, global_batch_size: int,
                   steps_per_epoch: int, *,
                   freeze_mask=None) -> tuple[optax.GradientTransformation,
                                              Any]:
    """AdamW + the timm-parity cosine schedule.  Returns (tx, schedule)."""
    base_lr = scaled_base_lr(cfg, global_batch_size)
    schedule = timm_cosine_schedule(cfg, base_lr, steps_per_epoch)
    chain = []
    if cfg.clip_grad is not None:
        chain.append(optax.clip_by_global_norm(cfg.clip_grad))
    chain.append(optax.adamw(
        learning_rate=schedule, b1=cfg.betas[0], b2=cfg.betas[1],
        eps=cfg.opt_eps, weight_decay=cfg.weight_decay))
    tx = optax.chain(*chain)
    if freeze_mask is not None:
        # Mask must zero the FINAL updates (after adamw), or weight decay
        # would still shrink frozen params — torch requires_grad=False
        # semantics (train_and_validate.py:130-137) leave them untouched.
        tx = optax.chain(tx, optax.masked(
            optax.set_to_zero(), jax.tree.map(lambda t: not t, freeze_mask)))
    return tx, schedule


def create_train_state(params, tx) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params))
