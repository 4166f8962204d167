"""Losses.

The reference trains with the sum of two multilabel soft-margin losses over the
cls head and the top-16 patch head (utils.py:182-184).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def multilabel_soft_margin_loss(logits, targets):
    """Exact torch F.multilabel_soft_margin_loss (reduction='mean'):

        -mean_b mean_c [ y log sigmoid(x) + (1 - y) log sigmoid(-x) ]
    """
    # loss math in >= f32: bf16 log-sigmoid tails lose precision exactly
    # where the gradient signal lives (identity for the f32/f64 paths)
    logits = logits.astype(jnp.promote_types(logits.dtype, jnp.float32))
    ls = jax.nn.log_sigmoid(logits)
    lns = jax.nn.log_sigmoid(-logits)
    per_sample = -jnp.mean(targets * ls + (1.0 - targets) * lns, axis=-1)
    return jnp.mean(per_sample)


def dual_head_loss(logits, head1_logits, targets):
    """utils.py:182-184: loss = MLSM(cls head) + MLSM(top-16 head)."""
    l1 = multilabel_soft_margin_loss(logits, targets)
    l2 = multilabel_soft_margin_loss(head1_logits, targets)
    return l1 + l2, {"loss_cls": l1, "loss_head1": l2}
