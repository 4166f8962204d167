"""Jitted, mesh-sharded train/eval steps.

The reference's hot loop (utils.py:144-203) does: forward, top-k-by-GT-count
multi-hot F1, dual multilabel-soft-margin loss, backward with NCCL all-reduce
under DDP, step.  Here the whole thing is one jitted SPMD function: the batch
is sharded over the mesh's 'data' axis, params replicated (or tensor-parallel
over 'model'), and XLA inserts the gradient all-reduce over ICI — the explicit
`reduce_value` helper (distributed_utils.py:60-70) has no equivalent because
GSPMD derives it from the shardings.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from vision_transformer_cam_tpu.configs import ViTCAMConfig
from vision_transformer_cam_tpu.models import vit
from vision_transformer_cam_tpu.ops.losses import dual_head_loss
from vision_transformer_cam_tpu.train.state import TrainState


def topk_by_label_count(logits, labels):
    """utils.py:166-173 vectorized: predict exactly k_i = sum(labels_i)
    classes per sample (the k_i highest logits) as a multi-hot tensor.
    Variable k under jit is done by rank-thresholding the sorted order."""
    k = jnp.sum(labels, axis=-1, keepdims=True)              # [B,1]
    order = jnp.argsort(-logits, axis=-1)
    ranks = jnp.empty_like(order).at[
        jnp.arange(logits.shape[0])[:, None], order].set(
        jnp.arange(logits.shape[1])[None, :])
    return (ranks < k).astype(logits.dtype)


def f1_micro(pred_multihot, labels):
    """Micro-averaged multi-label F1 over the batch (sklearn
    f1_score(average='micro') — utils.py:174's intent; its running
    accumulator is buggy and reports only the last sample, which we fix)."""
    tp = jnp.sum(pred_multihot * labels)
    pred_pos = jnp.sum(pred_multihot)
    true_pos = jnp.sum(labels)
    return 2.0 * tp / jnp.maximum(pred_pos + true_pos, 1.0)


def loss_fn(params, images, labels, cfg: ViTCAMConfig, rng):
    out = vit.forward(params, images, cfg, train=True, rng=rng)
    loss, parts = dual_head_loss(out.logits, out.head1_logits, labels)
    if out.dist_logits is not None:
        # distilled: the dist head gets the same multilabel loss so it
        # actually trains (the reference returns (x, x_dist) in training —
        # vit_model.py:414-417; eval averages the two heads)
        from vision_transformer_cam_tpu.ops.losses import (
            multilabel_soft_margin_loss)
        loss = loss + multilabel_soft_margin_loss(out.dist_logits, labels)
    return loss, (parts, out.logits)


@functools.partial(jax.jit, static_argnames=("cfg", "tx"),
                   donate_argnames=("state",))
def train_step(state: TrainState, images, labels, rng, cfg: ViTCAMConfig,
               tx: optax.GradientTransformation):
    """One optimizer step.  Returns (new_state, metrics)."""
    step_rng = jax.random.fold_in(rng, state.step)
    (loss, (parts, logits)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params, images, labels, cfg, step_rng)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    new_state = TrainState(step=state.step + 1, params=params,
                           opt_state=opt_state)
    f1 = f1_micro(topk_by_label_count(logits, labels), labels)
    metrics = {"loss": loss, "f1": f1, **parts}
    return new_state, metrics


@functools.partial(jax.jit, static_argnames=("cfg",))
def eval_step(params, images, cfg: ViTCAMConfig):
    """Sigmoid probabilities of both heads (utils.py:221-233); AP/mAP runs on
    host over the gathered outputs (sklearn-parity average_precision)."""
    out = vit.forward(params, images, cfg)
    return {"probs_cls": jax.nn.sigmoid(out.logits),
            "probs_head1": jax.nn.sigmoid(out.head1_logits)}
