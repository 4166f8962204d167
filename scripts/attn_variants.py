"""Attention-kernel ablations: where do the 5.5 ms/layer go?

Each variant strips or swaps one stage of the v2 fused kernel so the cost of
exp / masking / the PV matmul / the rollout update can be read off
differences.  Results recorded in BENCHMARKS.md.

  python scripts/attn_variants.py <variant>

Variants: full (= v2+rollout), noexp (softmax -> copy), nomask, matmul-only,
int8qk (S = int8 QK^T with per-row scales), int8pv (P quantized to int8 for
PV), int8both, headbatch (S for all heads via one reshaped dot).
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, N, C, H, DH = 512, 197, 768, 12, 64
SCALE = 0.125


def _kernel(qkv_ref, bg_ref, joint_ref, o_ref, cls_ref, newj_ref, **kw):
    variant = kw["variant"]
    key_mask = bg_ref[0, 0] * -100.0
    fg_q = 1.0 - bg_ref[0, 0]
    hm_acc = jnp.zeros((N, N), jnp.float32)
    cls_acc = jnp.zeros((1, N), jnp.float32)
    for i in range(H):
        q = qkv_ref[0, :, i * DH:(i + 1) * DH]
        k = qkv_ref[0, :, C + i * DH:C + (i + 1) * DH]
        v = qkv_ref[0, :, 2 * C + i * DH:2 * C + (i + 1) * DH]
        if variant in ("int8qk", "int8both"):
            qa = jnp.max(jnp.abs(q.astype(jnp.float32)), axis=-1,
                         keepdims=True) / 127.0
            ka = jnp.max(jnp.abs(k.astype(jnp.float32)), axis=-1,
                         keepdims=True) / 127.0
            qi = jnp.round(q.astype(jnp.float32) / qa).astype(jnp.int8)
            ki = jnp.round(k.astype(jnp.float32) / ka).astype(jnp.int8)
            s32 = jax.lax.dot_general(qi, ki, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            s = s32.astype(jnp.float32) * (qa * SCALE) * ka[:, 0][None, :]
        else:
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * SCALE
        if variant != "nomask":
            s = s + fg_q[:, None] * key_mask[None, :]
        if variant == "matmul-only":
            p = s * 0.001
        elif variant == "noexp":
            p = s / jnp.sum(s, axis=-1, keepdims=True)
        else:
            e = jnp.exp(jnp.minimum(s, 80.0))
            p = e / jnp.sum(e, axis=-1, keepdims=True)
        cls_acc = cls_acc + p[0:1, :]
        hm_acc = hm_acc + p
        if variant in ("int8pv", "int8both"):
            pi = jnp.round(p * 127.0).astype(jnp.int8)
            va = jnp.max(jnp.abs(v.astype(jnp.float32)), axis=0,
                         keepdims=True) / 127.0
            vi = jnp.round(v.astype(jnp.float32) / va).astype(jnp.int8)
            acc = jnp.dot(pi, vi, preferred_element_type=jnp.int32)
            ov = acc.astype(jnp.float32) * (va / 127.0)
        else:
            ov = jnp.dot(p.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        o_ref[0, :, i * DH:(i + 1) * DH] = ov.astype(o_ref.dtype)
    cls_ref[0, 0] = (cls_acc[0] / H).astype(cls_ref.dtype)
    jold = joint_ref[0]
    prod = jnp.dot((hm_acc / H).astype(jold.dtype), jold,
                   preferred_element_type=jnp.float32)
    newj_ref[0] = (0.5 * (prod + jold.astype(jnp.float32))
                   ).astype(newj_ref.dtype)


def _headbatch_kernel(qkv_ref, bg_ref, joint_ref, o_ref, cls_ref, newj_ref,
                      **kw):
    """All-heads S in one batched dot_general [H, N, dh] x [H, N, dh]."""
    key_mask = bg_ref[0, 0] * -100.0
    fg_q = 1.0 - bg_ref[0, 0]
    qkv = qkv_ref[0]                                   # [N, 3C]
    q = qkv[:, :C].reshape(N, H, DH).transpose(1, 0, 2)
    k = qkv[:, C:2 * C].reshape(N, H, DH).transpose(1, 0, 2)
    v = qkv[:, 2 * C:].reshape(N, H, DH).transpose(1, 0, 2)
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * SCALE
    s = s + (fg_q[:, None] * key_mask[None, :])[None]
    e = jnp.exp(jnp.minimum(s, 80.0))
    p = e / jnp.sum(e, axis=-1, keepdims=True)          # [H, N, N]
    cls_ref[0, 0] = (jnp.mean(p[:, 0, :], axis=0)).astype(cls_ref.dtype)
    hm = jnp.mean(p, axis=0)
    ov = jax.lax.dot_general(p.astype(v.dtype), v,
                             (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)  # [H, N, dh]
    o_ref[0] = ov.transpose(1, 0, 2).reshape(N, C).astype(o_ref.dtype)
    jold = joint_ref[0]
    prod = jnp.dot(hm.astype(jold.dtype), jold,
                   preferred_element_type=jnp.float32)
    newj_ref[0] = (0.5 * (prod + jold.astype(jnp.float32))
                   ).astype(newj_ref.dtype)


@functools.partial(jax.jit, static_argnames=("variant",))
def run(qkv, bg, joint, variant):
    kern = _headbatch_kernel if variant == "headbatch" else \
        functools.partial(_kernel, variant=variant)
    qkv_spec = pl.BlockSpec((1, N, 3 * C), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, N, C), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, 1, N), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    nn_spec = pl.BlockSpec((1, N, N), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=(B,),
        in_specs=[qkv_spec, row_spec, nn_spec],
        out_specs=(o_spec, row_spec, nn_spec),
        out_shape=(jax.ShapeDtypeStruct((B, N, C), qkv.dtype),
                   jax.ShapeDtypeStruct((B, 1, N), qkv.dtype),
                   jax.ShapeDtypeStruct((B, N, N), joint.dtype)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * N * N * DH,
            bytes_accessed=2 * B * N * 4 * C * qkv.dtype.itemsize,
            transcendentals=B * H * N * N),
    )(qkv, bg, joint)


_VARIANTS = ("full", "noexp", "matmul-only", "nomask", "int8qk", "int8pv",
             "int8both", "headbatch")


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "full"
    if variant not in _VARIANTS:
        # an unknown name would silently fall through every if/elif to the
        # FULL kernel and print a plausible mislabeled number
        raise SystemExit(f"unknown variant {variant!r}; one of {_VARIANTS}")
    dt = jnp.bfloat16
    qkv = jax.random.normal(jax.random.key(0), (B, N, 3 * C), dt)
    bg = (jax.random.uniform(jax.random.key(1), (B, N)) < 0.3).astype(
        jnp.float32)[:, None, :]
    joint = jnp.broadcast_to(jnp.eye(N, dtype=jnp.float32), (B, N, N))

    def sync(r):
        return float(jnp.sum(r[1].astype(jnp.float32)))

    f = functools.partial(run, variant=variant)
    sync(f(qkv, bg, joint))
    sync(f(qkv, bg, joint))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(20):
            r = f(qkv, bg, joint)
        sync(r)
        best = min(best, (time.perf_counter() - t0) / 20)
    print(f"{variant}: {best * 1e3:.2f} ms/layer "
          f"({best * 12e3:.1f} ms per 12-layer model)")


if __name__ == "__main__":
    main()
