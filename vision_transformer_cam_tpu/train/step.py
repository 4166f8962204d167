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


@functools.partial(jax.jit,
                   static_argnames=("cfg", "tx", "accum_steps", "data_axis"),
                   donate_argnames=("state",))
def train_step_accum(state: TrainState, images, labels, rng,
                     cfg: ViTCAMConfig, tx: optax.GradientTransformation,
                     accum_steps: int, data_axis: Optional[str] = None):
    """train_step with gradient accumulation: the batch is split into
    `accum_steps` microbatches scanned sequentially, gradients averaged,
    ONE optimizer update.  Exact full-batch semantics WITH THE DEFAULT ZERO
    DROPOUT RATIOS: the dual MLSM loss is a mean over samples
    (ops/losses.py), so the average of equal-size microbatch gradients IS
    the full-batch gradient — pinned by test_train.py.  (With
    drop_ratio/attn_drop/drop_path > 0 the per-microbatch rng folds draw
    different masks than train_step's single draw: statistically
    equivalent, not bit-identical.)  Use when the reference's effective
    batch (lr = lr*bs/512 scaling, train_and_validate.py:148-149) exceeds
    one chip's HBM: activations scale with the microbatch, optimizer math
    with the full batch.

    data_axis: name of the mesh axis the incoming batch dim is sharded
    over (requires tracing under that mesh).  The reshape moves the batch
    dim to position 1 — without an explicit constraint GSPMD may reshard
    or replicate the microbatch stack, defeating the HBM saving; with it
    every microbatch stays batch-sharded on its devices."""
    b = images.shape[0]
    if b % accum_steps:
        raise ValueError(f"batch {b} not divisible by accum_steps "
                         f"{accum_steps}")
    mb = b // accum_steps
    imgs = images.reshape(accum_steps, mb, *images.shape[1:])
    lbls = labels.reshape(accum_steps, mb, *labels.shape[1:])
    if data_axis is not None:
        from jax.sharding import PartitionSpec as P
        imgs = jax.lax.with_sharding_constraint(
            imgs, P(None, data_axis, *([None] * (imgs.ndim - 2))))
        lbls = jax.lax.with_sharding_constraint(
            lbls, P(None, data_axis, *([None] * (lbls.ndim - 2))))
    step_rng = jax.random.fold_in(rng, state.step)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def micro(carry, xs):
        g_acc, loss_acc, parts_acc = carry
        im, lb, i = xs
        (loss, (parts, logits)), g = grad_fn(
            state.params, im, lb, cfg, jax.random.fold_in(step_rng, i))
        # accumulate in f32: under an all-bf16 train config, summing
        # microbatch grads in bf16 across accum steps loses low bits vs
        # train_step's single full-batch gradient (advisor finding)
        carry = (jax.tree.map(lambda a, x: a + x.astype(a.dtype), g_acc, g),
                 loss_acc + loss,
                 jax.tree.map(jnp.add, parts_acc, parts))
        return carry, logits

    zeros_g = jax.tree.map(
        lambda p: jnp.zeros(p.shape, jnp.promote_types(p.dtype, jnp.float32)),
        state.params)
    zeros_p = {"loss_cls": jnp.zeros(()), "loss_head1": jnp.zeros(())}
    (g_sum, loss_sum, parts_sum), logits = jax.lax.scan(
        micro, (zeros_g, jnp.zeros(()), zeros_p),
        (imgs, lbls, jnp.arange(accum_steps)))
    inv = 1.0 / accum_steps
    # cast the f32 accumulator back to the param dtype for the update (one
    # rounding, after the mean — not accum_steps roundings during the sum)
    grads = jax.tree.map(lambda g, p: (g * inv).astype(p.dtype),
                         g_sum, state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    new_state = TrainState(step=state.step + 1, params=params,
                           opt_state=opt_state)
    logits = logits.reshape(b, logits.shape[-1])
    f1 = f1_micro(topk_by_label_count(logits, labels), labels)
    metrics = {"loss": loss_sum * inv, "f1": f1,
               **jax.tree.map(lambda v: v * inv, parts_sum)}
    return new_state, metrics


@functools.partial(jax.jit, static_argnames=("cfg",))
def eval_step(params, images, cfg: ViTCAMConfig):
    """Sigmoid probabilities of both heads (utils.py:221-233); AP/mAP runs on
    host over the gathered outputs (sklearn-parity average_precision)."""
    out = vit.forward(params, images, cfg)
    return {"probs_cls": jax.nn.sigmoid(out.logits),
            "probs_head1": jax.nn.sigmoid(out.head1_logits)}
