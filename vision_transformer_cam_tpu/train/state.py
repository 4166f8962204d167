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


_TRAINABLE_WHEN_FROZEN = ("head", "pre_logits")


def _path_keys(path):
    return [str(getattr(p, "key", getattr(p, "idx", ""))) for p in path]


def trainable_mask(params, freeze_backbone: bool):
    """Reference freeze (train_and_validate.py:130-137): every param whose
    name lacks 'head'/'pre_logits' stops training.  The reference test is a
    SUBSTRING match, so 'head1' (the top-16 patch head) and 'head_dist'
    (the distilled head — whose loss term exists precisely so it trains)
    both stay trainable; exact-key matching froze head_dist (review
    finding)."""
    def mask(path, _):
        if not freeze_backbone:
            return True
        return any(t in k for k in _path_keys(path)
                   for t in _TRAINABLE_WHEN_FROZEN)

    return jax.tree_util.tree_map_with_path(mask, params)


def weight_decay_mask(params):
    """timm `create_optimizer` parity (train_and_validate.py:150):
    `filter_bias_and_bn=True` (the default) exempts every param with
    ndim <= 1 — all biases and LayerNorm scales — from weight decay.  (The
    reference model defines no `no_weight_decay()`, so pos_embed/cls_token
    DO decay there, and therefore here.)  Our block params are scan-stacked
    [L, ...], so the rule is applied by NAME, matching what ndim<=1 selects
    on the reference's unstacked tree."""
    def decays(path, _):
        keys = _path_keys(path)
        if keys[-1] == "bias":
            return False
        if keys[-1] == "scale" and any(
                k.startswith("ln") or k == "norm" for k in keys):
            return False
        return True

    return jax.tree_util.tree_map_with_path(decays, params)


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
        eps=cfg.opt_eps, weight_decay=cfg.weight_decay,
        mask=weight_decay_mask))
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
