"""Tracing / profiling utilities.

The reference's only profiling artifact is flops.py (an fvcore count of the
attention module).  This module provides the TPU-native equivalents promised
in SURVEY.md §5: a jax.profiler trace context, a per-step wall-clock meter
with device-sync, and an analytic FLOPs model for every config in the zoo.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import jax.numpy as jnp

from vision_transformer_cam_tpu.configs import ViTCAMConfig


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock per-step meter.  On tunneled platforms block_until_ready
    can be a no-op, so sync happens via a scalar device->host read."""

    def __init__(self):
        self.times = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if result is not None:
            leaf = jax.tree.leaves(result)[0]
            _ = jax.device_get(jnp.ravel(leaf)[0])  # execution barrier
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    @property
    def mean(self):
        return sum(self.times) / max(len(self.times), 1)

    @property
    def best(self):
        return min(self.times) if self.times else float("nan")

    def images_per_sec(self, batch_size: int) -> float:
        return batch_size / self.best


def model_flops(cfg: ViTCAMConfig, batch: int = 1,
                with_cam: bool = True) -> dict:
    """Analytic forward FLOPs (MACs*2) of the full CAM model.

    Extends the reference's attention-only count (flops.py:8-22) to the whole
    network: patch embed, per-block qkv/logits/PV/proj/MLP, heads, and the
    CAM machinery (rollout joint chain) when with_cam."""
    n, d, hid = cfg.seq_len, cfg.embed_dim, cfg.mlp_hidden
    h, dh, L = cfg.num_heads, cfg.head_dim, cfg.depth
    patch = 2 * batch * cfg.num_patches * (cfg.patch_size ** 2 *
                                           cfg.in_chans) * d
    qkv = 2 * batch * n * d * 3 * d
    logits = 2 * batch * h * n * n * dh
    pv = 2 * batch * h * n * n * dh
    proj = 2 * batch * n * d * d
    mlp = 2 * 2 * batch * n * d * hid
    block = qkv + logits + pv + proj + mlp
    heads = 2 * batch * d * cfg.num_classes * 2
    cam = 2 * batch * n * n * n * L if with_cam else 0  # rollout joint chain
    total = patch + L * block + heads + cam
    return {"patch_embed": patch, "per_block": block, "blocks": L * block,
            "heads": heads, "rollout": cam, "total": total,
            "gflops_per_image": total / batch / 1e9,
            # the commonly quoted "17.6G" for ViT-B/16 is MACs (= FLOPs/2)
            "gmacs_per_image": total / batch / 2e9}
