"""Sweep the attention kernel's q_block at a given shape (real TPU).

Mosaic fully unrolls the kernel's Python q-block loop, so scoped-VMEM
stack usage is NON-monotonic in q_block: small blocks mean more unrolled
iterations with live buffers and can OOM where a larger block fits.  This
probe compiles + times ONE layer per candidate and prints ms/layer or the
OOM excess — how the ViT-L@384 default (384) was chosen (BENCHMARKS.md).

  python scripts/qblock_sweep.py [--batch 128] [--seq 577] [--heads 16] \
      [--dh 64] [--bf16] [--f32] [--block-b 1] [--post] [qb ...]

--post probes the rollout_post-style call (no fused [N,N] joint; the kernel
emits the f32 head-mean matrix instead) — the long-N serving default.
--f32 probes the TRAINING forward (fused_attention_diff's call: f32 qkv,
no joint, no head-mean) — the shape that sized the train-path q_block cap
at long N (f32 buffers are 2x bf16; the single-N-row block that fits the
serving dtypes in the 32 MB partition needs 43.3 MB in f32).
--no-clamp matches training softmax math (max-subtract instead of the
serving clamp — extra live [QB,N] buffers, tighter VMEM).
--bwd probes masked_attention_bwd (whole-N per head, no q-blocking) at the
given dtype instead of the forward.
NOTE the in-model scoped-VMEM limit is ~200 KB tighter than this
standalone probe (qb=384 WITH the fused joint fits here but OOMs inside
the full model); confirm winners with bench.py before changing a default.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def arg(flag, default):
    return int(sys.argv[sys.argv.index(flag) + 1]) \
        if flag in sys.argv else default


def main():
    from vision_transformer_cam_tpu.kernels.attention import (
        masked_attention_fused)
    from vision_transformer_cam_tpu.utils import check_cli_flags
    check_cli_flags(sys.argv,
                    bool_flags=("--f32", "--bf16", "--post", "--no-clamp",
                                "--bwd"),
                    value_flags=("--batch", "--seq", "--heads", "--dh",
                                 "--block-b"),
                    prog="qblock_sweep.py")

    b = arg("--batch", 128)
    n = arg("--seq", 577)
    h = arg("--heads", 16)
    dh = arg("--dh", 64)
    bb = arg("--block-b", 1)
    f32 = "--f32" in sys.argv
    int8 = "--bf16" not in sys.argv and not f32
    c = h * dh
    # positional candidates only: a digit token directly after a
    # value-taking flag is that flag's value, not a q-block candidate
    value_flags = {"--batch", "--seq", "--heads", "--dh", "--block-b"}
    toks = sys.argv[1:]
    cands = [int(a) for i, a in enumerate(toks)
             if a.isdigit() and (i == 0 or toks[i - 1] not in value_flags)] \
        or [n, 512, 384, 289, 256, 224, 192, 128]

    rng = np.random.default_rng(0)
    if f32:
        qkv = jnp.asarray(rng.standard_normal((b, n, 3 * c)), jnp.float32)
        sc = None
    elif int8:
        qkv = jnp.asarray(rng.integers(-127, 128, (b, n, 3 * c)), jnp.int8)
        sc = jnp.asarray(np.concatenate([np.full(3 * h, 0.02), [1 / 0.05]]),
                         jnp.float32)
    else:
        qkv = jnp.asarray(rng.standard_normal((b, n, 3 * c)), jnp.bfloat16)
        sc = None
    bg = jnp.zeros((b, n), jnp.float32)
    post = "--post" in sys.argv
    clamp = "--no-clamp" not in sys.argv
    bwd = "--bwd" in sys.argv
    joint = None if post or f32 else \
        jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32), (b, n, n))

    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    if bwd:
        from vision_transformer_cam_tpu.kernels.attention import (
            masked_attention_bwd)
        do = jnp.zeros((b, n, c), qkv.dtype)
        try:
            r = masked_attention_bwd(qkv, bg, do, num_heads=h,
                                     scale=dh ** -0.5, clamp_softmax=clamp)
            sync(r)
            t0 = time.perf_counter()
            for _ in range(10):
                r = masked_attention_bwd(qkv, bg, do, num_heads=h,
                                         scale=dh ** -0.5,
                                         clamp_softmax=clamp)
            sync(r)
            ms = (time.perf_counter() - t0) / 10 * 1e3
            print(f"bwd dtype={qkv.dtype}  {ms:7.2f} ms/layer", flush=True)
        except Exception as e:
            msg = str(e)
            key = "exceeded scoped vmem limit by"
            short = msg[msg.find(key):msg.find(key) + 40] if key in msg \
                else type(e).__name__ + ": " + msg[:100].replace("\n", " ")
            print(f"bwd dtype={qkv.dtype}  FAIL {short}", flush=True)
        return

    for qb in cands:
        try:
            def f():
                return masked_attention_fused(
                    qkv, bg, joint, sc, num_heads=h, scale=dh ** -0.5,
                    clamp_softmax=clamp, float_dtype=jnp.bfloat16,
                    with_headmean=post, hm_dtype=jnp.float32 if post
                    else None, block_b=bb, q_block=qb)
            r = f()
            sync(r[-1])
            t0 = time.perf_counter()
            for _ in range(10):
                r = f()
            sync(r[-1])
            ms = (time.perf_counter() - t0) / 10 * 1e3
            print(f"qb={qb:4d}  {ms:7.2f} ms/layer", flush=True)
        except Exception as e:  # OOM reports the excess; keep sweeping
            msg = str(e)
            key = "exceeded scoped vmem limit by"
            short = msg[msg.find(key):msg.find(key) + 40] if key in msg \
                else type(e).__name__ + ": " + msg[:100].replace("\n", " ")
            print(f"qb={qb:4d}  FAIL {short}", flush=True)


if __name__ == "__main__":
    main()
