"""Fused masked multi-head attention Pallas kernel for TPU.

The hot op of the reference (vit_model.py:103-140) with its two CAM-specific
twists, fused into one VMEM-resident kernel:

  * the additive foreground/background pair mask is reconstructed in-kernel
    from the rank-1 bg indicator [B, N] — the reference materializes a full
    [B, 197, 197] mask per block (vit_model.py:348-361) and XLA would stream
    it from HBM every layer;
  * the head-mean cls attention row (the sufficient statistic for rollout,
    mask generation and the top-16 selection — vit_model.py:329,366) is
    accumulated across heads inside the kernel, so the [B, H, N, N]
    probability tensor never exists in HBM.

Numerics match the XLA path: logits in f32, additive mask value (default
-100) pre-softmax.  (The v1 split-tensor kernel pads N to 128 multiples and
kills padded keys with -1e9; the v2 fused kernel needs no padding — Mosaic
handles non-aligned N internally.)

Grid: block_b batch elements per program (amortizes per-program overhead);
the heads loop inside the program (statically unrolled), everything resident
in VMEM (block_b x N x 4C bf16 + S[N, N] f32 ~ 5 MB at ViT-B sizes, bb=4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, bg_ref, o_ref, cls_ref, *hm_ref, **kw):
    n_real, scale = kw["n_real"], kw["scale"]
    mask_value, num_heads = kw["mask_value"], kw["num_heads"]
    np_ = q_ref.shape[-2]
    bg = bg_ref[0, 0]                                     # [Np] f32
    col = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
    valid = col < n_real
    # pair mask from the rank-1 bg indicator: -100 * min(bg_i + bg_j, 1)
    pair = jnp.minimum(bg[:, None] + bg[None, :], 1.0) * mask_value
    pair = jnp.where(valid, pair, -1e9)                   # kill padded keys

    cls_acc = jnp.zeros((1, np_), jnp.float32)
    hm_acc = jnp.zeros((np_, np_), jnp.float32) if hm_ref else None
    for h in range(num_heads):
        q = q_ref[0, h]                                   # [Np, dh]
        k = k_ref[0, h]
        v = v_ref[0, h]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # [Np, Np]
        s = s + pair
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        cls_acc = cls_acc + p[0:1, :]
        if hm_ref:
            hm_acc = hm_acc + p
        # Mosaic requires 32-bit matmul accumulators; cast on store.
        o_ref[0, h] = jnp.dot(p.astype(v.dtype), v,
                              preferred_element_type=jnp.float32
                              ).astype(o_ref.dtype)
    cls_ref[0, 0] = (cls_acc[0] / num_heads).astype(cls_ref.dtype)
    if hm_ref:
        hm_ref[0][0] = (hm_acc / num_heads).astype(hm_ref[0].dtype)


@functools.partial(jax.jit, static_argnames=("scale", "mask_value",
                                             "with_headmean", "interpret"))
def masked_attention(q, k, v, bg, *, scale: float, mask_value: float = -100.0,
                     with_headmean: bool = False, interpret: bool = False):
    """q, k, v: [B, H, N, dh]; bg: [B, N] (1.0 = background token).

    Returns (out [B, H, N, dh], cls_row [B, N][, headmean [B, N, N]]) where
    cls_row is the head-mean softmax row of the cls token (pre-dropout, as
    the reference snapshots it — vit_model.py:128).  `with_headmean`
    additionally emits the full head-mean probability matrix (consumed
    immediately by the in-scan rollout update; never stacked across layers).
    """
    b, h, n, dh = q.shape
    np_ = _round_up(n, 128)
    pad = np_ - n
    if pad:
        cfgp = ((0, 0), (0, 0), (0, pad), (0, 0))
        q, k, v = (jnp.pad(t, cfgp) for t in (q, k, v))
        bg = jnp.pad(bg, ((0, 0), (0, pad)))
    bg = bg.astype(jnp.float32)[:, None, :]              # [B, 1, Np]

    kernel = functools.partial(_attn_kernel, n_real=n, scale=scale,
                               mask_value=mask_value, num_heads=h)
    qkv_spec = pl.BlockSpec((1, h, np_, dh), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, 1, np_), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out_specs = [qkv_spec, row_spec]
    out_shape = [jax.ShapeDtypeStruct((b, h, np_, dh), q.dtype),
                 jax.ShapeDtypeStruct((b, 1, np_), q.dtype)]
    if with_headmean:
        out_specs.append(pl.BlockSpec((1, np_, np_), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b, np_, np_), q.dtype))

    res = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, row_spec],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * np_ * np_ * dh,
            bytes_accessed=4 * b * h * np_ * dh * q.dtype.itemsize,
            transcendentals=b * h * np_ * np_,
        ),
        interpret=interpret,
    )(q, k, v, bg)
    out, cls_row = res[0], res[1][:, 0, :]
    hm = res[2] if with_headmean else None
    if pad:
        out = out[:, :, :n, :]
        cls_row = cls_row[:, :n]
        if hm is not None:
            hm = hm[:, :n, :n]
    return (out, cls_row, hm) if with_headmean else (out, cls_row)


def _attn_kernel_fused(qkv_ref, bg_ref, *rest, **kw):
    """v2 kernel: consumes the fused qkv GEMM output [BB, N, 3C] directly and
    writes [BB, N, C] — no host-side head transpose or seq padding; Mosaic
    handles the non-128-aligned N internally.  BB (block_b) batch elements
    per program amortize per-program overhead.

    Optional fusions (flags in kw):
      with_headmean — also emit the head-mean probability matrix;
      with_rollout  — consume the rollout joint J_{l-1} and emit
                      J_l = (hm @ J + J) / 2, the row-normalized (A+I)
                      product (rows of hm sum to 1, so the (A+I) row sum is
                      exactly 2) — the head-mean matrix never leaves VMEM;
      int8_io       — qkv is the int8 REQUANTIZED qkv-GEMM output: S = QK^T
                      runs on the int8 MXU path directly (the operands are
                      pre-quantized, so unlike the measured-slower in-kernel
                      dynamic quantization there is no quantize pass), V is
                      dequantized in-VMEM, and the output is written int8
                      for the downstream int8 proj GEMM.  Scales arrive in
                      SMEM: per-tensor [1, 4] (sq, sk, sv, 1/s_out) or
                      PER-HEAD [1, 3H+1] (sq_0..sq_{H-1}, sk_*, sv_*,
                      1/s_out) — per-head scales cost nothing at runtime
                      (scalar SMEM reads inside the statically-unrolled
                      head loop) and cut the quantization error of heads
                      whose q/k/v magnitudes sit far below the per-tensor
                      absmax (the round-2 CAM-fidelity lever).
    """
    scale, mask_value = kw["scale"], kw["mask_value"]
    h, dh = kw["num_heads"], kw["head_dim"]
    qb_size, clamp = kw["q_block"], kw["clamp_softmax"]
    int8_io = kw["int8_io"]
    # int8 OUTPUT only (int8_hifi serving): float q/k/v -> full-fidelity
    # probabilities, but the output store is requantized to the proj GEMM's
    # static act_scale (scales = [1/s_out], one SMEM scalar)
    int8_out = kw.get("int8_out", False)
    rest = list(rest)
    joint_ref = rest.pop(0) if kw["with_rollout"] else None
    sc_ref = rest.pop(0) if (int8_io or int8_out) else None
    if kw["with_rollout"]:
        o_ref, cls_ref, newj_ref = rest
        hm_ref = ()
    elif kw["with_headmean"]:
        newj_ref = None
        o_ref, cls_ref, hm = rest
        hm_ref = (hm,)
    else:
        newj_ref = None
        o_ref, cls_ref = rest
        hm_ref = ()
    per_head_sc = kw.get("per_head_scales", False)
    if int8_io:
        inv_out = sc_ref[0, 3 * h if per_head_sc else 3]
    elif int8_out:
        inv_out = sc_ref[0, 0]
    bb, n, _ = qkv_ref.shape
    c = h * dh
    # static query-block ranges (last block may be short) — keeps the live
    # S/P buffers at [QB, N] so VMEM stays flat as N grows (ViT-L@384 N=577
    # overflows the 16 MB scoped limit with full [N, N] accumulators)
    q_blocks = [(s0, min(qb_size, n - s0)) for s0 in range(0, n, qb_size)]
    for b in range(bb):
        # The reference's symmetric pair mask -100*min(bg_q + bg_k, 1)
        # (vit_model.py:348-361) is softmax-equivalent to the rank-1 form
        # (1 - bg_q) * (-100 * bg_k): a bg query's pair row is the constant
        # -100 (row-constant shifts cancel in softmax — bg queries attend
        # normally), while fg queries mask bg keys.  P is identical; the
        # min/add [QB, N] pair construction becomes one outer product.
        key_mask = bg_ref[b, 0] * mask_value              # [N] f32
        need_hm = bool(hm_ref) or joint_ref is not None
        for (q0, qn) in q_blocks:
            fg_q = 1.0 - bg_ref[b, 0, q0:q0 + qn]         # [QB] f32
            hm_acc = jnp.zeros((qn, n), jnp.float32) if need_hm else None
            cls_acc = jnp.zeros((1, n), jnp.float32) if q0 == 0 else None
            for i in range(h):
                q = qkv_ref[b, q0:q0 + qn, i * dh:(i + 1) * dh]
                k = qkv_ref[b, :, c + i * dh:c + (i + 1) * dh]
                v = qkv_ref[b, :, 2 * c + i * dh:2 * c + (i + 1) * dh]
                if int8_io:
                    sq = sc_ref[0, i if per_head_sc else 0]
                    sk = sc_ref[0, (h + i) if per_head_sc else 1]
                    sv = sc_ref[0, (2 * h + i) if per_head_sc else 2]
                    s32 = jax.lax.dot_general(
                        q, k, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32)    # int8 MXU path
                    s = s32.astype(jnp.float32) * (sq * sk * scale)
                    v = (v.astype(jnp.float32) * sv).astype(jnp.bfloat16)
                else:
                    s = jax.lax.dot_general(
                        q, k, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) * scale  # [QB, N]
                s = s + fg_q[:, None] * key_mask[None, :]
                if clamp:
                    # serving mode: upper-clamp instead of the row-max
                    # reduce+subtract (saves ~1.2 ms/layer); exact whenever
                    # logits < 80, which trained ViTs never exceed (masked
                    # keys underflowing exp to 0 is the desired behavior)
                    s = jnp.minimum(s, 80.0)
                else:
                    s = s - jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s)
                denom = jnp.sum(e, axis=-1, keepdims=True)
                if q0 == 0:
                    cls_acc = cls_acc + e[0:1, :] / denom[0:1]
                if need_hm:
                    p = e / denom
                    hm_acc = hm_acc + p
                    ov = jnp.dot(p.astype(v.dtype), v,
                                 preferred_element_type=jnp.float32)
                else:
                    # fold the softmax division into the [QB, dh] output
                    # instead of the [QB, N] probabilities
                    ov = jnp.dot(e.astype(v.dtype), v,
                                 preferred_element_type=jnp.float32) / denom
                if int8_io or int8_out:
                    ov = jnp.clip(jnp.round(ov * inv_out), -127.0, 127.0)
                o_ref[b, q0:q0 + qn, i * dh:(i + 1) * dh] = \
                    ov.astype(o_ref.dtype)
            if q0 == 0:
                cls_ref[b, 0] = (cls_acc[0] / h).astype(cls_ref.dtype)
            if hm_ref:
                hm_ref[0][b, q0:q0 + qn] = (hm_acc / h).astype(
                    hm_ref[0].dtype)
            if joint_ref is not None:
                # J_l rows for this query block: (hm @ J + J) / 2
                jold = joint_ref[b]                       # [N, N]
                jrows = joint_ref[b, q0:q0 + qn]
                # all-f32 product: bf16 multiply operands measured NO
                # faster (4.44 vs 4.38 ms/layer — the kernel is data-
                # movement bound) and 13x worse CAM fidelity; see the
                # dead-ends log in BENCHMARKS.md
                prod = jnp.dot((hm_acc / h).astype(jold.dtype), jold,
                               preferred_element_type=jnp.float32)
                newj_ref[b, q0:q0 + qn] = (
                    0.5 * (prod + jrows.astype(jnp.float32))
                ).astype(newj_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "scale",
                                             "mask_value", "with_headmean",
                                             "interpret", "block_b",
                                             "clamp_softmax", "hm_dtype",
                                             "float_dtype", "q_block"))
def masked_attention_fused(qkv, bg, joint=None, scales=None, *,
                           num_heads: int,
                           scale: float, mask_value: float = -100.0,
                           with_headmean: bool = False,
                           interpret: bool = False, block_b: int = 1,
                           clamp_softmax: bool = False, hm_dtype=None,
                           float_dtype=jnp.bfloat16, q_block: int = 0):
    # block_b > 1 measured slightly slower at ViT-B sizes (3279 vs 3365
    # img/s end-to-end); kept as a tuning knob for other shapes.
    """qkv: [B, N, 3C] (the fused qkv projection, layout [q|k|v] with heads
    contiguous inside each); bg: [B, N].  Returns (out [B, N, C],
    cls_row [B, N][, headmean or new_joint [B, N, N]]).  Passing `joint`
    (the rollout product J_{l-1}) fuses the rollout update in-kernel and
    returns J_l instead of the head-mean matrix.

    int8 serving I/O: when qkv is int8 (the requantized qkv-GEMM output),
    pass `scales` = [sq, sk, sv, 1/s_out] f32 (per-tensor) or the per-head
    form [sq_0..sq_{H-1}, sk_0.., sv_0.., 1/s_out] (3H+1 entries); S = QK^T
    then runs on the int8 MXU path, V dequantizes in-VMEM and `out` is int8
    (scale s_out) for the downstream int8 proj GEMM.  cls_row/headmean stay
    float (float_dtype)."""
    b, n, c3 = qkv.shape
    c = c3 // 3
    dh = c // num_heads
    int8_io = qkv.dtype == jnp.int8
    # float qkv + a scales vector = int8 OUTPUT only (int8_hifi):
    # scales = [1/s_out], full-fidelity float probabilities, int8 out store
    int8_out = (not int8_io) and scales is not None
    per_head_sc = False
    if int8_io:
        if scales is None:
            raise ValueError("int8 qkv requires the scales vector")
        scales = jnp.asarray(scales, jnp.float32).reshape(-1)
        if scales.shape[0] == 3 * num_heads + 1 and num_heads > 1:
            per_head_sc = True
        elif scales.shape[0] != 4:
            raise ValueError(
                f"scales must have 4 (per-tensor) or {3 * num_heads + 1} "
                f"(per-head) entries, got {scales.shape[0]}")
    elif int8_out:
        scales = jnp.asarray(scales, jnp.float32).reshape(-1)
        if scales.shape[0] != 1:
            raise ValueError("int8-out mode takes scales = [1/s_out], got "
                             f"{scales.shape[0]} entries")
    f_dtype = float_dtype if int8_io else qkv.dtype
    if block_b < 1:
        raise ValueError(f"block_b must be >= 1, got {block_b}")
    while b % block_b:
        block_b //= 2
    bb = max(block_b, 1)
    bgk = bg.astype(jnp.float32)[:, None, :]              # [B, 1, N]

    # long-seq int8: the int8 path keeps an extra [QB, N] int32 S buffer
    # alive, which pushes N=577 (ViT-L@384) over the 16 MB scoped VMEM
    # limit at QB=512 (bf16 fits at 512).  Stack usage is NON-monotonic in
    # QB — the q-block loop is Python-unrolled, so SMALLER blocks mean MORE
    # unrolled iterations with live buffers: at N=577 with per-head scales,
    # QB 128/192/512/577 all OOM while 224/256/384 fit standalone, and the
    # in-model limit is ~200 KB tighter still (QB=384 fits standalone but
    # not in-model WITH the fused [N,N] rollout).  The default long-N
    # serving path is therefore rollout_post (configs.ModelConfig) — no
    # [N,N] joint in the kernel at all — where QB=384 fits and is fastest
    # (7.81 ms/layer vs 8.20 at 256).  The fused-rollout long-N fallback
    # (explicit rollout_post=False) drops to QB=224, the only candidate
    # that also fits in-model with the joint resident.
    # Sweep tool: scripts/qblock_sweep.py; numbers in BENCHMARKS "ViT-L@384".
    # With the raised scoped-VMEM partition (utils.tune_tpu_for_long_sequence
    # sets LIBTPU_INIT_ARGS + the marker env before backend init) the whole
    # [N, N] buffer set fits and ONE query block per image is fastest:
    # 504.5 vs 467.7 img/s at ViT-L@384 int8.
    if q_block <= 0:
        import os
        from vision_transformer_cam_tpu.utils import (LONG_N_SCOPED_VMEM_KIB,
                                                      SCOPED_VMEM_MARKER)
        if n > 640:
            # >1k-token regime (ViT-L/16@512, N=1025 — BASELINE config #4):
            # the single-N-row block that wins at N=577 OOMs the 32 MB
            # partition here by 888 KB, and LOSES even at 36 MB where it
            # fits (16.57 vs 15.33 ms/layer at qb=384, int8 --post b128);
            # 384 wins the 32 MB sweep outright (9.36 ms/layer int8 --post
            # b64; 512 second).  At the 16 MB default EVERY q_block OOMs at
            # N=1025 — tune_tpu_for_long_sequence is required (auto in
            # bench/CLIs at N > 512); scripts/qblock_sweep.py to re-probe.
            q_block = 384
        elif n > 512 and int(os.environ.get(SCOPED_VMEM_MARKER, "0")
                             or 0) >= LONG_N_SCOPED_VMEM_KIB:
            # single-N-row block is the measured winner only for the
            # SERVING softmax (clamp: one fused min, no row-max buffers).
            # The training math (max-subtract) keeps extra [QB, N] live
            # buffers: qb=512 measured 4.13 vs 4.87 ms/layer at qb=577
            # (bf16, N=577, 32 MB partition — qblock_sweep --no-clamp).
            q_block = n if clamp_softmax else 512
        elif int8_io and n > 512:
            q_block = 384 if joint is None else 224
        else:
            q_block = 512
    q_block = min(q_block, n)
    kernel = functools.partial(_attn_kernel_fused, scale=scale,
                               mask_value=mask_value, num_heads=num_heads,
                               head_dim=dh, q_block=q_block,
                               clamp_softmax=clamp_softmax,
                               with_rollout=joint is not None,
                               with_headmean=with_headmean,
                               int8_io=int8_io, int8_out=int8_out,
                               per_head_scales=per_head_sc)
    qkv_spec = pl.BlockSpec((bb, n, c3), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((bb, n, c), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((bb, 1, n), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    nn_spec = pl.BlockSpec((bb, n, n), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    in_specs = [qkv_spec, row_spec]
    inputs = [qkv, bgk]
    out_specs = [o_spec, row_spec]
    out_shape = [jax.ShapeDtypeStruct((b, n, c),
                                      jnp.int8 if int8_out else qkv.dtype),
                 jax.ShapeDtypeStruct((b, 1, n), f_dtype)]
    if joint is not None:
        in_specs.append(nn_spec)
        inputs.append(joint)
        out_specs.append(nn_spec)
        out_shape.append(jax.ShapeDtypeStruct((b, n, n), joint.dtype))
    elif with_headmean:
        out_specs.append(nn_spec)
        out_shape.append(jax.ShapeDtypeStruct((b, n, n),
                                              hm_dtype or f_dtype))
    if int8_io or int8_out:
        n_sc = int(scales.shape[0])
        in_specs.append(pl.BlockSpec((1, n_sc), lambda i: (0, 0),
                                     memory_space=pltpu.SMEM))
        inputs.append(scales.reshape(1, n_sc))

    res = pl.pallas_call(
        kernel,
        grid=(b // bb,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),  # batch: megacore-splittable
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * num_heads * n * n * dh,
            # qkv in + out, PLUS the [B,N,N] joint (read+write) or headmean
            # (write) traffic — the dominant term for the rollout variants
            bytes_accessed=(2 * b * n * (c3 + c) * qkv.dtype.itemsize
                            + (2 * b * n * n * 4 if joint is not None else 0)
                            + (b * n * n * 4 if with_headmean else 0)),
            transcendentals=b * num_heads * n * n,
        ),
        interpret=interpret,
    )(*inputs)
    out, cls_row = res[0], res[1][:, 0, :]
    if joint is not None or with_headmean:
        return out, cls_row, res[2]
    return out, cls_row


def _attn_kernel_seq(q_ref, kv_ref, bgq_ref, bgk_ref, o_ref, cls_ref,
                     *hm_ref, **kw):
    """Sequence-parallel variant of the v2 kernel: this device holds a
    TOKEN-axis shard of the q rows ([BB, NQ, C]) and the all-gathered full
    K|V ([BB, N, 2C]); outputs cover only the local q rows.  Used inside
    the shard_map wrap of masked_attention_seq — a q-row shard is exactly
    a q-block range, so the kernel body is the v2 q-block loop with the
    query tensors addressed separately from K/V.

    cls_ref gets the attention row of the LOCAL row 0 (the global cls row
    only on seq-rank 0); the wrap masks ranks > 0 and psums.  hm_ref (when
    requested) is the local-rows slice of the head-mean matrix [BB, NQ, N].
    """
    scale, mask_value = kw["scale"], kw["mask_value"]
    h, dh = kw["num_heads"], kw["head_dim"]
    qb_size, clamp = kw["q_block"], kw["clamp_softmax"]
    n_real = kw["n_real"]
    bb, nq, c = q_ref.shape
    n = kv_ref.shape[-2]
    # real token counts (197, 577) are coprime with every mesh size, so the
    # wrap pads the token axis to a multiple of the seq shards; padded KEY
    # columns are killed outright (-1e9 — they must not shift the softmax
    # the way a -100 bg key legitimately does), padded Q rows produce
    # all-zero prob rows (denom guard) and are sliced off by the wrap
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    key_kill = jnp.where(col < n_real, 0.0, -1e9)          # [1, N]
    for b in range(bb):
        key_mask = bgk_ref[b, 0] * mask_value              # [N] f32
        q_blocks = [(s0, min(qb_size, nq - s0)) for s0 in range(0, nq,
                                                                qb_size)]
        for (q0, qn) in q_blocks:
            fg_q = 1.0 - bgq_ref[b, 0, q0:q0 + qn]         # [QB] f32
            hm_acc = jnp.zeros((qn, n), jnp.float32) if hm_ref else None
            cls_acc = jnp.zeros((1, n), jnp.float32) if q0 == 0 else None
            for i in range(h):
                q = q_ref[b, q0:q0 + qn, i * dh:(i + 1) * dh]
                k = kv_ref[b, :, i * dh:(i + 1) * dh]
                v = kv_ref[b, :, c + i * dh:c + (i + 1) * dh]
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                s = s + fg_q[:, None] * key_mask[None, :] + key_kill
                if clamp:
                    s = jnp.minimum(s, 80.0)
                else:
                    s = s - jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s)
                # defensive-only guard: key_kill only kills padded KEY
                # columns (padded q ROWS attend to the real keys normally
                # and are sliced off by the wrap), and on the non-clamp
                # path the row-max subtraction already guarantees
                # denom >= 1.  Kept as cheap NaN insurance on the clamp
                # path, where a row of strongly-negative masked logits
                # could underflow exp to all-zero.
                denom = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True),
                                    1e-30)
                if q0 == 0:
                    cls_acc = cls_acc + e[0:1, :] / denom[0:1]
                if hm_ref:
                    p = e / denom
                    hm_acc = hm_acc + p
                    ov = jnp.dot(p.astype(v.dtype), v,
                                 preferred_element_type=jnp.float32)
                else:
                    ov = jnp.dot(e.astype(v.dtype), v,
                                 preferred_element_type=jnp.float32) / denom
                o_ref[b, q0:q0 + qn, i * dh:(i + 1) * dh] = \
                    ov.astype(o_ref.dtype)
            if q0 == 0:
                cls_ref[b, 0] = (cls_acc[0] / h).astype(cls_ref.dtype)
            if hm_ref:
                hm_ref[0][b, q0:q0 + qn] = (hm_acc / h).astype(
                    hm_ref[0].dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "scale",
                                             "mask_value", "with_headmean",
                                             "interpret", "block_b",
                                             "clamp_softmax", "hm_dtype",
                                             "q_block", "n_real"))
def _masked_attention_seq_local(q, kv, bg_q, bg_k, *, num_heads: int,
                                scale: float, mask_value: float = -100.0,
                                with_headmean: bool = False,
                                interpret: bool = False, block_b: int = 1,
                                clamp_softmax: bool = False, hm_dtype=None,
                                q_block: int = 0, n_real: int = 0):
    """Per-device pallas_call of the seq kernel.  q: [B, NQ, C] local query
    rows; kv: [B, N, 2C] full keys|values; bg_q: [B, NQ]; bg_k: [B, N].
    n_real: real token count (key columns >= n_real are padding — killed).
    Returns (out [B, NQ, C], local_row0 [B, N][, headmean [B, NQ, N]])."""
    b, nq, c = q.shape
    n = kv.shape[-2]
    if block_b < 1:
        raise ValueError(f"block_b must be >= 1, got {block_b}")
    while b % block_b:
        block_b //= 2
    bb = max(block_b, 1)
    if q_block <= 0:
        q_block = min(nq, 512)
    q_block = min(q_block, nq)
    kernel = functools.partial(_attn_kernel_seq, scale=scale,
                               mask_value=mask_value, num_heads=num_heads,
                               head_dim=c // num_heads, q_block=q_block,
                               clamp_softmax=clamp_softmax,
                               n_real=n_real or n)
    q_spec = pl.BlockSpec((bb, nq, c), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((bb, n, 2 * c), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    rowq_spec = pl.BlockSpec((bb, 1, nq), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    rowk_spec = pl.BlockSpec((bb, 1, n), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    out_specs = [q_spec, rowk_spec]
    out_shape = [jax.ShapeDtypeStruct((b, nq, c), q.dtype),
                 jax.ShapeDtypeStruct((b, 1, n), q.dtype)]
    if with_headmean:
        out_specs.append(pl.BlockSpec((bb, nq, n), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b, nq, n),
                                              hm_dtype or q.dtype))
    res = pl.pallas_call(
        kernel,
        grid=(b // bb,),
        in_specs=[q_spec, kv_spec,
                  rowq_spec, rowk_spec],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * num_heads * nq * n * (c // num_heads),
            bytes_accessed=b * (nq * c + n * 2 * c + nq * c)
            * q.dtype.itemsize
            + (b * nq * n * 4 if with_headmean else 0),
            transcendentals=b * num_heads * nq * n),
        interpret=interpret,
    )(q, kv, bg_q.astype(jnp.float32)[:, None, :],
      bg_k.astype(jnp.float32)[:, None, :])
    out, row0 = res[0], res[1][:, 0, :]
    if with_headmean:
        return out, row0, res[2]
    return out, row0


def _ambient_axis_size(name: str) -> int:
    """Size of mesh axis `name` in the ambient trace context (jax.set_mesh
    or the legacy `with mesh:` resource env)."""
    m = jax.sharding.get_abstract_mesh()
    if m is not None and name in getattr(m, "axis_names", ()):
        return m.shape[name]
    from jax._src.mesh import thread_resources
    pm = thread_resources.env.physical_mesh
    if name in pm.axis_names:
        return pm.shape[name]
    raise ValueError(
        f"masked_attention_seq must be traced under a mesh that carries "
        f"axis {name!r} (use `with jax.set_mesh(mesh):` or `with mesh:`)")


def masked_attention_seq(qkv, bg, *, num_heads: int, scale: float,
                         mask_value: float = -100.0,
                         with_headmean: bool = False,
                         interpret: bool = False, block_b: int = 1,
                         clamp_softmax: bool = False, hm_dtype=None,
                         q_block: int = 0, seq_axis: str,
                         data_axis=None):
    """Sequence-parallel fused masked attention: the token axis of qkv/bg
    is sharded over mesh axis `seq_axis` (and batch over `data_axis` when
    set); each device all-gathers the K|V rows over ICI, runs the Pallas
    kernel on its LOCAL q rows (a shard IS a q-block range), and the cls
    attention row is psum-broadcast from the shard owning global row 0.

    This is what lets cfg.seq_axis compose with attn_impl="pallas"
    (round-3 verdict item 3): XLA's partitioner would otherwise replicate
    the pallas_call (all-gather everything, every device recomputing the
    full batch).  Must be traced under the mesh context.

    The real token counts (197, 577, 1025...) never divide the shard
    count, so the token axis is zero-padded to a multiple of it; padded
    key columns are killed in-kernel (-1e9) and padded rows sliced off
    here — outputs keep the caller's [.., N, ..] shapes.

    qkv: [B, N, 3C] global-view; bg: [B, N].  Returns
    (out [B, N, C] token-sharded, cls_row [B, N] seq-replicated
    [, headmean [B, N, N] row-sharded])."""
    c = qkv.shape[-1] // 3
    n = qkv.shape[1]
    sp = _ambient_axis_size(seq_axis)
    pad = (-n) % sp
    if pad:
        qkv = jnp.pad(qkv, ((0, 0), (0, pad), (0, 0)))
        bg = jnp.pad(bg, ((0, 0), (0, pad)))

    def local_fn(qkv_l, bg_l):
        # all-gather K|V and the key-mask rows across the token shards
        # (Megatron-SP style: q stays local, K/V replicate per device)
        kv = jax.lax.all_gather(qkv_l[:, :, c:], seq_axis, axis=1,
                                tiled=True)
        bg_k = jax.lax.all_gather(bg_l, seq_axis, axis=1, tiled=True)
        res = _masked_attention_seq_local(
            qkv_l[:, :, :c], kv, bg_l, bg_k, num_heads=num_heads,
            scale=scale, mask_value=mask_value,
            with_headmean=with_headmean, interpret=interpret,
            block_b=block_b, clamp_softmax=clamp_softmax,
            hm_dtype=hm_dtype, q_block=q_block, n_real=n)
        out, row0 = res[0], res[1]
        # local row 0 is the global cls row only on seq-rank 0
        is0 = (jax.lax.axis_index(seq_axis) == 0).astype(row0.dtype)
        cls_row = jax.lax.psum(row0 * is0, seq_axis)
        if with_headmean:
            return out, cls_row, res[2]
        return out, cls_row

    from jax.sharding import PartitionSpec as P
    tok = P(data_axis, seq_axis, None)
    in_specs = (tok, P(data_axis, seq_axis))
    out_specs = (tok, P(data_axis, None)) + ((tok,) if with_headmean
                                             else ())
    res = jax.shard_map(local_fn, in_specs=in_specs, out_specs=out_specs,
                        check_vma=False)(qkv, bg)
    if pad:
        out = res[0][:, :n, :]
        cls_row = res[1][:, :n]
        if with_headmean:
            return out, cls_row, res[2][:, :n, :n]
        return out, cls_row
    return res


def _attn_block_kernel(xn_ref, tok_ref, wqkv_ref, bqkv_ref, wproj_ref,
                       bproj_ref, bg_ref, *rest, **kw):
    """v3 kernel: the whole attention sub-block — qkv GEMM, masked softmax
    attention, proj GEMM, residual add — in one program.  The qkv/proj
    weights' block index is constant across the grid, so Mosaic keeps them
    VMEM-resident; the [N,3C] qkv tensor and the attention output never
    exist in HBM."""
    scale, mask_value = kw["scale"], kw["mask_value"]
    h, dh = kw["num_heads"], kw["head_dim"]
    qb_size, clamp = kw["q_block"], kw["clamp_softmax"]
    if kw["with_rollout"]:
        joint_ref, newtok_ref, cls_ref, newj_ref = rest
    else:
        joint_ref = newj_ref = None
        newtok_ref, cls_ref = rest
    n = xn_ref.shape[-2]
    c = h * dh

    qkv = jnp.dot(xn_ref[0], wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0]).astype(xn_ref.dtype)        # [N, 3C]

    key_mask = bg_ref[0, 0] * mask_value                  # [N] f32
    attn_out = jnp.zeros((n, c), jnp.float32)
    q_blocks = [(s0, min(qb_size, n - s0)) for s0 in range(0, n, qb_size)]
    cls_row_final = None
    for (q0, qn) in q_blocks:
        fg_q = 1.0 - bg_ref[0, 0, q0:q0 + qn]
        hm_acc = jnp.zeros((qn, n), jnp.float32) \
            if joint_ref is not None else None
        cls_acc = jnp.zeros((1, n), jnp.float32) if q0 == 0 else None
        heads_out = []
        for i in range(h):
            q = qkv[q0:q0 + qn, i * dh:(i + 1) * dh]
            k = qkv[:, c + i * dh:c + (i + 1) * dh]
            v = qkv[:, 2 * c + i * dh:2 * c + (i + 1) * dh]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = s + fg_q[:, None] * key_mask[None, :]
            if clamp:
                s = jnp.minimum(s, 80.0)
            else:
                s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            denom = jnp.sum(e, axis=-1, keepdims=True)
            if q0 == 0:
                cls_acc = cls_acc + e[0:1, :] / denom[0:1]
            if hm_acc is not None:
                p = e / denom
                hm_acc = hm_acc + p
                ov = jnp.dot(p.astype(v.dtype), v,
                             preferred_element_type=jnp.float32)
            else:
                ov = jnp.dot(e.astype(v.dtype), v,
                             preferred_element_type=jnp.float32) / denom
            heads_out.append(ov)
        blk = jnp.concatenate(heads_out, axis=1)          # [QB, C]
        if q0 == 0 and qn == n:
            attn_out = blk
        else:
            attn_out = attn_out + jnp.pad(blk, ((q0, n - q0 - qn), (0, 0)))
        if q0 == 0:
            cls_row_final = (cls_acc[0] / h)
        if joint_ref is not None:
            jold = joint_ref[0]
            prod = jnp.dot((hm_acc / h).astype(jold.dtype), jold,
                           preferred_element_type=jnp.float32)
            newj_ref[0, q0:q0 + qn] = (
                0.5 * (prod + joint_ref[0, q0:q0 + qn].astype(jnp.float32))
            ).astype(newj_ref.dtype)

    proj = jnp.dot(attn_out.astype(xn_ref.dtype), wproj_ref[:],
                   preferred_element_type=jnp.float32) + bproj_ref[0]
    newtok_ref[0] = (tok_ref[0].astype(jnp.float32) + proj
                     ).astype(newtok_ref.dtype)
    cls_ref[0, 0] = cls_row_final.astype(cls_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "scale",
                                             "mask_value", "clamp_softmax",
                                             "interpret"))
def attention_block_fused(xn, tokens, wqkv, bqkv, wproj, bproj, bg,
                          joint=None, *, num_heads: int, scale: float,
                          mask_value: float = -100.0,
                          clamp_softmax: bool = False,
                          interpret: bool = False):
    """Whole attention sub-block (vit_model.py:189-194): returns
    (tokens + proj(attention(qkv(xn))), cls_row[, new_joint])."""
    b, n, c = xn.shape
    dh = c // num_heads
    bgk = bg.astype(jnp.float32)[:, None, :]
    kernel = functools.partial(
        _attn_block_kernel, scale=scale, mask_value=mask_value,
        num_heads=num_heads, head_dim=dh, q_block=min(n, 512),
        clamp_softmax=clamp_softmax, with_rollout=joint is not None)

    bnc = pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    wq_spec = pl.BlockSpec((c, 3 * c), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    bq_spec = pl.BlockSpec((1, 3 * c), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    wp_spec = pl.BlockSpec((c, c), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    bp_spec = pl.BlockSpec((1, c), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    nn_spec = pl.BlockSpec((1, n, n), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)

    in_specs = [bnc, bnc, wq_spec, bq_spec, wp_spec, bp_spec, row]
    inputs = [xn, tokens, wqkv, bqkv.reshape(1, -1), wproj,
              bproj.reshape(1, -1), bgk]
    out_specs = [bnc, row]
    out_shape = [jax.ShapeDtypeStruct((b, n, c), xn.dtype),
                 jax.ShapeDtypeStruct((b, 1, n), xn.dtype)]
    if joint is not None:
        in_specs.append(nn_spec)
        inputs.append(joint)
        out_specs.append(nn_spec)
        out_shape.append(jax.ShapeDtypeStruct((b, n, n), joint.dtype))

    res = pl.pallas_call(
        kernel, grid=(b,), in_specs=in_specs, out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * c * (4 * c + 2 * num_heads * n * dh // c * c),
            bytes_accessed=4 * b * n * c * xn.dtype.itemsize,
            transcendentals=b * num_heads * n * n),
        interpret=interpret,
    )(*inputs)
    newtok, cls_row = res[0], res[1][:, 0, :]
    if joint is not None:
        return newtok, cls_row, res[2]
    return newtok, cls_row


def _attn_bwd_kernel(qkv_ref, bg_ref, do_ref, dqkv_ref, **kw):
    """Fused attention backward: recomputes P per head in VMEM and emits
    d_qkv directly — the XLA autodiff backward materializes P, dP and dS as
    [B,H,N,N] f32 HBM tensors (~1.4 GB/layer at ViT-B batch 256); here they
    never leave VMEM.

      dV = P^T dO;  dP = dO V^T;  dS = P*(dP - rowsum(dP*P))*scale;
      dQ = dS K;    dK = dS^T Q.
    """
    scale, mask_value = kw["scale"], kw["mask_value"]
    h, dh, clamp = kw["num_heads"], kw["head_dim"], kw["clamp_softmax"]
    n = qkv_ref.shape[-2]
    c = h * dh
    key_mask = bg_ref[0, 0] * mask_value
    fg_q = 1.0 - bg_ref[0, 0]
    for i in range(h):
        q = qkv_ref[0, :, i * dh:(i + 1) * dh]
        k = qkv_ref[0, :, c + i * dh:c + (i + 1) * dh]
        v = qkv_ref[0, :, 2 * c + i * dh:2 * c + (i + 1) * dh]
        do = do_ref[0, :, i * dh:(i + 1) * dh].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = s + fg_q[:, None] * key_mask[None, :]
        if clamp:
            s = jnp.minimum(s, 80.0)
        else:
            s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)            # [N, N] f32
        pb = p.astype(qkv_ref.dtype)
        dv = jax.lax.dot_general(pb, do.astype(qkv_ref.dtype),
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do.astype(qkv_ref.dtype), v,
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
        dsb = ds.astype(qkv_ref.dtype)
        dq = jnp.dot(dsb, k, preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(dsb, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dqkv_ref[0, :, i * dh:(i + 1) * dh] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, c + i * dh:c + (i + 1) * dh] = \
            dk.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, 2 * c + i * dh:2 * c + (i + 1) * dh] = \
            dv.astype(dqkv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "scale",
                                             "mask_value", "clamp_softmax",
                                             "interpret"))
def masked_attention_bwd(qkv, bg, d_out, *, num_heads: int, scale: float,
                         mask_value: float = -100.0,
                         clamp_softmax: bool = False,
                         interpret: bool = False):
    """d_qkv for the fused attention given (qkv, bg, dO)."""
    b, n, c3 = qkv.shape
    c = c3 // 3
    dh = c // num_heads
    bgk = bg.astype(jnp.float32)[:, None, :]
    kernel = functools.partial(_attn_bwd_kernel, scale=scale,
                               mask_value=mask_value, num_heads=num_heads,
                               head_dim=dh, clamp_softmax=clamp_softmax)
    qkv_spec = pl.BlockSpec((1, n, c3), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel, grid=(b,),
        in_specs=[qkv_spec, row_spec, o_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((b, n, c3), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * num_heads * n * n * dh,
            bytes_accessed=3 * b * n * c3 * qkv.dtype.itemsize,
            transcendentals=b * num_heads * n * n),
        interpret=interpret,
    )(qkv, bgk, d_out)


# ---------------------------------------------------------------------------
# differentiable wrapper: Pallas forward, XLA-autodiff backward
# ---------------------------------------------------------------------------

def _xla_attention_core(qkv, bg, num_heads, scale, mask_value):
    """Reference math of the fused kernel in plain jnp (for the VJP)."""
    b, n, c3 = qkv.shape
    c = c3 // 3
    dh = c // num_heads
    qkv_r = qkv.reshape(b, n, 3, num_heads, dh).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv_r[0], qkv_r[1], qkv_r[2]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    pair = jnp.minimum(bg[:, :, None] + bg[:, None, :], 1.0)
    s = s + (mask_value * pair.astype(jnp.float32))[:, None]
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(qkv.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
    cls_row = jnp.mean(p, axis=1)[:, 0, :].astype(qkv.dtype)
    return out, cls_row


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def fused_attention_diff(qkv, bg, num_heads, scale, mask_value,
                         clamp_softmax=False):
    """Differentiable fused attention: Pallas kernel forward, XLA-recompute
    backward.  The bg indicator and cls row carry no gradient by construction
    (both are consumed only through thresholds/top-k in the model — the same
    a.e.-zero-derivative semantics as the reference's in-graph mask)."""
    out, cls_row = masked_attention_fused(
        qkv, bg, num_heads=num_heads, scale=scale, mask_value=mask_value,
        clamp_softmax=clamp_softmax,
        interpret=jax.default_backend() != "tpu")
    return out, cls_row


def _fused_fwd(qkv, bg, num_heads, scale, mask_value, clamp_softmax=False):
    res = fused_attention_diff(qkv, bg, num_heads, scale, mask_value,
                               clamp_softmax)
    return res, (qkv, bg)


def _fused_bwd(num_heads, scale, mask_value, clamp_softmax, residuals,
               cotangents):
    qkv, bg = residuals
    # The cls-row cotangent is structurally zero for every consumer in this
    # model: mask-gen and top-k selection read cls_row only through
    # comparisons / argsort indices (zero gradient).  The TPU branch relies
    # on that and drops it; the XLA vjp below propagates it.  If a
    # DIFFERENTIABLE cls_row consumer is ever added (e.g. attention-
    # supervision loss), extend masked_attention_bwd accordingly or the two
    # platforms will silently disagree.
    d_out, _d_cls = cotangents
    # The bwd kernel holds a whole-N working set per head (no q-blocking):
    # at N=577 bf16 it needs ~19.3 MB — OOMs the default 16 MB scoped-VMEM
    # partition, fits the raised long-N one (5.22 ms/layer measured; f32
    # doesn't fit either partition and never reaches here — the dispatch
    # routes f32 long-N to XLA).  qblock_sweep.py --bwd.
    n = qkv.shape[-2]
    pallas_bwd_fits = n <= 512
    if not pallas_bwd_fits and n <= 640:
        # the whole-N working set scales ~n^2: 19.3 MB at N=577 fits the
        # raised 32 MB partition, but by N=1025 it is ~61 MB — no partition
        # this chip offers.  Past 640 rows the bwd always routes to XLA.
        import os
        from vision_transformer_cam_tpu.utils import (LONG_N_SCOPED_VMEM_KIB,
                                                      SCOPED_VMEM_MARKER)
        pallas_bwd_fits = int(os.environ.get(SCOPED_VMEM_MARKER, "0")
                              or 0) >= LONG_N_SCOPED_VMEM_KIB
    if jax.default_backend() == "tpu" and pallas_bwd_fits:
        d_qkv = masked_attention_bwd(
            qkv, bg, d_out, num_heads=num_heads, scale=scale,
            mask_value=mask_value, clamp_softmax=clamp_softmax)
    else:
        _, vjp = jax.vjp(
            lambda q: _xla_attention_core(q, bg, num_heads, scale,
                                          mask_value),
            qkv)
        (d_qkv,) = vjp(cotangents)
    return d_qkv, jnp.zeros_like(bg)


fused_attention_diff.defvjp(_fused_fwd, _fused_bwd)


def sharded_kernel_call(fn, data_axis: str, arg_specs, n_out: int):
    """Wrap a Pallas-kernel entry in jax.shard_map over the ambient mesh's
    `data_axis`, so each device runs the kernel on its own batch shard.

    XLA's auto-SPMD partitioner has no partitioning rule for pallas_call:
    under a plain jit over a sharded batch it REPLICATES the kernel — the
    operands are all-gathered and every device recomputes the full batch
    (verified on the 8-device CPU mesh; the output comes back with spec
    PartitionSpec()).  shard_map makes the batch partitioning explicit.
    The caller must trace under the mesh context (`with mesh:`), which is
    what supplies shard_map's mesh.

    arg_specs: per-positional-arg booleans — True = batch-sharded over
    data_axis, False = replicated (None args pass through either way).
    """
    from jax.sharding import PartitionSpec as P
    in_specs = tuple(P(data_axis) if s else P() for s in arg_specs)
    out_specs = (P(data_axis),) * n_out
    return jax.shard_map(fn, in_specs=in_specs, out_specs=out_specs,
                         check_vma=False)


def attention_pallas(ap, x, bg, cfg, rngs, need_probs, joint=None,
                     hm_dtype=None, train=False):
    """Drop-in for models.vit._attention_xla (same signature/returns) using
    the fused kernel.  Falls back to the XLA path when the caller needs the
    per-head probability tensors (predict/validate visualization) or
    attention/projection DROPOUT (the fused kernel and its Pallas backward
    — masked_attention_bwd — support training, but not in-kernel dropout
    masks).

    Only the PLAIN fused call has an autodiff rule (fused_attention_diff's
    custom_vjp); the rollout-fused, headmean-emitting, int8 and shard_mapped
    variants are raw pallas_calls.  A training graph that needs any of those
    (e.g. jax.grad over a need_rollout forward for attention supervision)
    therefore routes to the XLA path — gated on `train`, not on rngs, so
    deterministic training (all drop ratios 0) is covered too, matching the
    block/MLP kernel gating in models/vit.py.

    cfg.data_axis: multi-device serving — every masked_attention_fused call
    goes through shard_map over that mesh axis (see sharded_kernel_call)."""
    needs_dropout = rngs and (cfg.attn_drop_ratio > 0 or cfg.drop_ratio > 0)
    no_vjp_variant = (joint is not None or need_probs == "headmean"
                      or cfg.data_axis is not None)
    # f32 at long N cannot run the Pallas kernels on TPU at all: the f32
    # buffer set exceeds the scoped-VMEM partition at EVERY q_block, under
    # both the 16 MB default and the raised 32 MB long-N partition (fwd
    # no-clamp swept 577/512/384/256, bwd whole-N: all OOM — see BENCHMARKS
    # "ViT-L@384" / scripts/qblock_sweep.py --f32).  The f32 parity and
    # full-f32 training paths at N > 512 route to XLA, which handles the
    # same math without a VMEM-resident [N, N] working set.
    f32_long_n = (cfg.seq_len > 512 and jnp.dtype(cfg.dtype).itemsize >= 4
                  and jax.default_backend() == "tpu")
    # Mosaic has no lowering for the 3-pass bf16x3 dot precision ("high"):
    # _dot_general_lowering_rule raises NotImplementedError(HIGH) — measured
    # round 4.  Inference runs the kernels' IN-KERNEL dots at "highest"
    # (true f32 — strictly more precise than the requested rung) while the
    # XLA GEMMs around them keep the 3-pass level; training at "high"
    # routes to XLA (the backward kernel would hit the same lowering gap).
    high_prec = (cfg.matmul_precision == "high"
                 and jax.default_backend() == "tpu")
    # Training past 640 rows routes wholly to XLA, matching _fused_bwd
    # (which already does): the TRAINING softmax (max-subtract, no clamp)
    # keeps row-max/renorm buffers live across the Python-unrolled q-block
    # iterations, and at N=1025 the forward kernel's scoped-VMEM stack is
    # 85.3 MB at the auto q_block — beyond every partition this chip
    # offers (measured on the ViT-L/16@512 fine-tune, round 5).  The
    # SERVING softmax (clamp: one fused min) stays Pallas at every N.
    train_long_n = (train and cfg.seq_len > 640
                    and jax.default_backend() == "tpu")
    if need_probs == "perhead" or needs_dropout or f32_long_n \
            or train_long_n \
            or (train and (no_vjp_variant or cfg.seq_axis is not None
                           or high_prec)):
        from vision_transformer_cam_tpu.models.vit import _attention_xla
        return _attention_xla(ap, x, bg, cfg, rngs, need_probs,
                              joint=joint, hm_dtype=hm_dtype)
    from vision_transformer_cam_tpu.models.vit import _linear
    import contextlib

    def kernel_prec_ctx():
        return jax.default_matmul_precision("highest") if high_prec \
            else contextlib.nullcontext()
    b, n, c = x.shape

    if cfg.seq_axis is not None:
        # sequence parallelism + Pallas (round-3 verdict item 3): the qkv
        # GEMM runs under GSPMD (token-sharded by the _sp constraints; int8
        # weights go through the plain qlinear path — the int8 attention-I/O
        # requantize is a batch-axis kernel fusion and stays off under sp),
        # then the shard_map-wrapped seq kernel: local q rows, all-gathered
        # K/V, cls row psum from the rank-0 shard.  The rollout joint update
        # stays in XLA (it needs the FULL joint rows; GSPMD shards the
        # einsum over the hm row shards).
        qkv = _linear(x, ap["qkv"], cfg)
        kw = dict(num_heads=cfg.num_heads, scale=cfg.scale,
                  mask_value=cfg.mask_value,
                  clamp_softmax=cfg.softmax_clamp,
                  block_b=cfg.attn_block_b or 1,
                  q_block=cfg.attn_q_block,
                  interpret=jax.default_backend() != "tpu",
                  seq_axis=cfg.seq_axis, data_axis=cfg.data_axis)
        with kernel_prec_ctx():
            if need_probs == "headmean" or joint is not None:
                out, cls_row, hm = masked_attention_seq(
                    qkv, bg, with_headmean=True, hm_dtype=hm_dtype, **kw)
            else:
                out, cls_row = masked_attention_seq(qkv, bg, **kw)
                hm = None
        out = _linear(out, ap["proj"], cfg)
        return out, cls_row.astype(cfg.dtype), hm, None, None

    def call_fused(qkv_a, bg_a, joint_a, scales_a, **static):
        with kernel_prec_ctx():
            if cfg.data_axis is None:
                return masked_attention_fused(qkv_a, bg_a, joint_a,
                                              scales_a, **static)
            n_out = 3 if (joint_a is not None
                          or static.get("with_headmean")) else 2
            fn = functools.partial(masked_attention_fused, **static)
            # qkv/bg/joint are batch-sharded; the int8 scales vector is
            # replicated
            return sharded_kernel_call(fn, cfg.data_axis,
                                       (True, True, True, False), n_out)(
                qkv_a, bg_a, joint_a, scales_a)
    # int8 attention I/O (serving): the qkv GEMM requantizes its output to
    # int8 in the epilogue, S = QK^T runs on the int8 MXU path in-kernel,
    # and the kernel's int8 output feeds the int8 proj GEMM directly —
    # the bf16 qkv/attn-out tensors and the proj-input quantize pass never
    # exist in HBM.
    int8_io = (cfg.int8_attn_io and rngs is None and not train
               and "kernel_q" in ap["qkv"] and "out_scales" in ap["qkv"]
               and "act_scale" in ap["proj"])
    scales = None
    if int8_io:
        from vision_transformer_cam_tpu.ops.quant import qlinear_requant
        osc = ap["qkv"]["out_scales"]
        if osc.ndim == 2:
            # per-head [3, H] calibration (the default): requantize each
            # head's dh-wide column group with its own scale, and hand the
            # kernel the flat [3H+1] per-head scales vector
            flat = osc.reshape(-1)
            qkv = qlinear_requant(x, ap["qkv"], flat,
                                  groups=3 * cfg.num_heads)
            scales = jnp.concatenate(
                [flat, 1.0 / ap["proj"]["act_scale"].reshape(1)])
        else:
            # legacy per-tensor (q|k|v thirds) calibration
            qkv = qlinear_requant(x, ap["qkv"], osc)
            scales = jnp.stack([osc[0], osc[1], osc[2],
                                1.0 / ap["proj"]["act_scale"]])
    else:
        qkv = _linear(x, ap["qkv"], cfg)
        # int8 OUTPUT only (int8_hifi): q/k/v and the probabilities stay
        # float, but the kernel emits the output requantized to the proj
        # GEMM's static act_scale — the bf16 attn-out write and the proj
        # input-quantize pass disappear from HBM at zero fidelity cost
        # relative to quantizing that bf16 tensor outside the kernel.
        if (cfg.int8_attn_out and rngs is None and not train
                and "kernel_q" in ap["proj"] and "act_scale" in ap["proj"]):
            scales = 1.0 / ap["proj"]["act_scale"].reshape(1)
    newj = None
    # cfg.attn_block_b == 0 -> auto: 2 images/program under int8 I/O (half
    # the VMEM per image; measured 4.38 vs 4.58 ms/layer), 1 for bf16
    # (measured slower >1).  Long sequences stay at 1: at N=577 (ViT-L@384)
    # two images' qkv + joint blocks exceed the 16 MB scoped VMEM limit.
    bb = cfg.attn_block_b or (2 if int8_io and n <= 256 else 1)
    if joint is not None:
        # in-kernel rollout update: headmean never leaves VMEM
        out, cls_row, newj = call_fused(
            qkv, bg, joint, scales, num_heads=cfg.num_heads, scale=cfg.scale,
            mask_value=cfg.mask_value, clamp_softmax=cfg.softmax_clamp,
            float_dtype=cfg.dtype, block_b=bb, q_block=cfg.attn_q_block,
            interpret=jax.default_backend() != "tpu")
        hm = None
    elif need_probs == "headmean":
        # visualization / post-scan-rollout path: emit the head-mean matrix
        out, cls_row, hm = call_fused(
            qkv, bg, None, scales, num_heads=cfg.num_heads, scale=cfg.scale,
            mask_value=cfg.mask_value, with_headmean=True,
            clamp_softmax=cfg.softmax_clamp, hm_dtype=hm_dtype,
            float_dtype=cfg.dtype, block_b=bb, q_block=cfg.attn_q_block,
            interpret=jax.default_backend() != "tpu")
    elif int8_io or scales is not None:
        out, cls_row = call_fused(
            qkv, bg, None, scales, num_heads=cfg.num_heads, scale=cfg.scale,
            mask_value=cfg.mask_value, clamp_softmax=cfg.softmax_clamp,
            float_dtype=cfg.dtype, block_b=bb, q_block=cfg.attn_q_block,
            interpret=jax.default_backend() != "tpu")
        hm = None
    elif cfg.data_axis is not None and rngs is None:
        # sharded inference without int8/rollout: the shard_mapped kernel
        # (the custom_vjp wrapper is training-only and would replicate)
        out, cls_row = call_fused(
            qkv, bg, None, None, num_heads=cfg.num_heads, scale=cfg.scale,
            mask_value=cfg.mask_value, clamp_softmax=cfg.softmax_clamp,
            float_dtype=cfg.dtype, block_b=bb, q_block=cfg.attn_q_block,
            interpret=jax.default_backend() != "tpu")
        hm = None
    elif not train and (cfg.attn_q_block or cfg.attn_block_b):
        # bench/sweep knobs set on the plain bf16 path: the custom_vjp
        # wrapper below has no q_block/block_b surface, so honor them via a
        # raw call (inference needs no vjp); with both knobs 0 this branch
        # is never taken and behavior is identical
        out, cls_row = call_fused(
            qkv, bg, None, None, num_heads=cfg.num_heads, scale=cfg.scale,
            mask_value=cfg.mask_value, clamp_softmax=cfg.softmax_clamp,
            float_dtype=cfg.dtype, block_b=bb, q_block=cfg.attn_q_block,
            interpret=jax.default_backend() != "tpu")
        hm = None
    else:
        # training keeps the fixed auto q_block/block_b — the sweep knobs
        # are serving-only (fused_attention_diff's vjp has no such surface).
        # (high_prec never reaches here under train — routed to XLA above —
        # so the context only retraces the inference forward.)
        with kernel_prec_ctx():
            out, cls_row = fused_attention_diff(qkv, bg, cfg.num_heads,
                                                cfg.scale, cfg.mask_value,
                                                cfg.softmax_clamp)
        hm = None
    out = _linear(out, ap["proj"], cfg)
    return out, cls_row.astype(cfg.dtype), hm, None, newj
