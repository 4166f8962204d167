"""TPU-native Vision Transformer with CAM attention-mask feedback.

Re-designs the reference model (vit_model.py:214-424) as a pure function over a
parameter pytree:

* the 12-block Python loop with its iterative foreground/background attention
  mask (vit_model.py:319-361) becomes a single ``jax.lax.scan`` whose carry
  holds the background-token indicator vector — the additive -100 pair mask is
  reconstructed on the fly from that rank-1 structure instead of materializing
  a [B,197,197] mask per step;
* the per-sample Python loops of the reference (threshold at
  vit_model.py:338-341, top-16 gather at vit_model.py:375-388) are vectorized
  with ``top_k`` / ``take_along_axis``;
* attention emits the head-mean cls row (all any consumer ever needs for the
  mask and rollout math) so nothing forces a [B,H,N,N] materialization on the
  hot path; full matrices are opt-in for the predict/validate visualization
  paths.

Numerical parity notes (golden-tested against the reference):
  - GELU is the exact erf form (torch nn.GELU default), not tanh approx.
  - LayerNorm eps 1e-6 (vit_model.py:244).
  - The rollout row normalization divides by the *batch-global* max
    (vit_model.py:335,372) unless cfg.per_sample_mask_norm.
  - Mask applies additively pre-softmax with value -100 (vit_model.py:361),
    from block index 5 on; it is recomputed at the end of every block >= 4.
  - Attention weights are snapshot pre-dropout (vit_model.py:128).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec

from vision_transformer_cam_tpu.configs import ViTCAMConfig


class ViTCAMOutput(NamedTuple):
    """Everything the reference 6-tuple return (vit_model.py:406,424) carries,
    in structured form.

    Correspondence with the reference:
      logits            <-> x (cls-head logits)
      head1_logits      <-> allbs_hw_p_ts (top-16 patch-head logits)
      attn_headmean     <-> attn_weights, already head-meaned [depth,B,N,N]
      attn_perhead      <-> attn_weights verbatim [depth,B,H,N,N] (parity only)
      block_outputs     <-> attn_matrix [depth,B,N,C]
      top_patch_embeds  <-> ori_allbs_hw_p_ts [B,K,C]
      head1_kernel      <-> clsh1_weight, transposed: ours is [C,num_classes]
      attn_cls_rows     — head-mean attention row of the cls token per layer,
                          [depth,B,N]; sufficient statistic for mask-gen,
                          rollout bg masks and the top-16 selection.
    """

    logits: jax.Array
    head1_logits: jax.Array
    attn_cls_rows: jax.Array
    top_patch_embeds: jax.Array
    top_patch_idx: jax.Array
    head1_kernel: jax.Array
    attn_headmean: Optional[jax.Array] = None
    attn_perhead: Optional[jax.Array] = None
    block_outputs: Optional[jax.Array] = None
    rollout_row: Optional[jax.Array] = None
    # final block output BEFORE the last LayerNorm, [B, N, C] — what the
    # reference's attn_matrix[11] is (vit_model.py:324,402: norm comes after
    # collection); the pseudo-seg cosine maps read it (validate.py:163).
    tokens_prenorm: Optional[jax.Array] = None
    # distilled models only: the dist-head logits.  During training the
    # reference returns (x, x_dist) so BOTH heads receive loss
    # (vit_model.py:414-419); exposing them here lets the train loss do
    # the same (logits is already their average at eval).
    dist_logits: Optional[jax.Array] = None


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _layer_norm(x, scale, bias, eps):
    # scale/bias are cast to the activation dtype: under mixed precision
    # (param_dtype f32, dtype bf16) the f32 affine params would otherwise
    # promote the whole residual stream — and every GEMM after LN1 — to
    # f32 (measured: the f32 long-N training forward doesn't even fit the
    # 16 MB scoped-VMEM partition; see BENCHMARKS "Mixed-precision
    # training").  Identity for all non-mixed configs (f64 goldens, f32
    # parity, bf16/int8 serving).
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * scale.astype(x.dtype) + bias.astype(x.dtype)


def _gelu(x, approx=False):
    # torch nn.GELU default is the exact erf form.
    return jax.nn.gelu(x, approximate=approx)


def _dropout(rng, rate, x):
    if rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def _drop_path(rng, rate, x):
    """Per-sample stochastic depth (vit_model.py:20-36)."""
    if rng is None:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jnp.floor(keep + jax.random.uniform(rng, shape, dtype=x.dtype))
    return x / keep * mask


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _trunc_normal(key, shape, std, dtype):
    # torch nn.init.trunc_normal_ truncates at absolute [-2, 2].
    lo, hi = -2.0 / std, 2.0 / std
    return (jax.random.truncated_normal(key, lo, hi, shape) * std).astype(dtype)


def init(cfg: ViTCAMConfig, key: jax.Array):
    """Build the parameter pytree with the reference's init scheme
    (vit_model.py:285-289,427-442)."""
    d, hid, nc = cfg.embed_dim, cfg.mlp_hidden, cfg.num_classes
    pdt = cfg.param_dtype
    keys = iter(jax.random.split(key, 64))

    def linear(kin, kout, std=0.01):
        return {"kernel": _trunc_normal(next(keys), (kin, kout), std, pdt),
                "bias": jnp.zeros((kout,), pdt)}

    def torch_default_linear(kin, kout):
        # torch nn.Linear default init (kaiming_uniform a=sqrt(5) ->
        # U(-1/sqrt(fan_in), +), bias likewise).  head1 is created AFTER
        # the reference's self.apply(_init_vit_weights)
        # (vit_model.py:290-295), so it keeps exactly this init.
        bound = 1.0 / jnp.sqrt(kin)
        k1, k2 = jax.random.split(next(keys))
        return {"kernel": jax.random.uniform(
                    k1, (kin, kout), pdt, -bound, bound),
                "bias": jax.random.uniform(k2, (kout,), pdt, -bound, bound)}

    def ln(dim):
        return {"scale": jnp.ones((dim,), pdt), "bias": jnp.zeros((dim,), pdt)}

    # patch embed: torch Conv2d kaiming_normal_(mode=fan_out) —
    # fan_out = embed_dim * kh * kw, std = sqrt(2 / fan_out).
    fan_out = d * cfg.patch_size * cfg.patch_size
    pk = jax.random.normal(next(keys),
                           (cfg.patch_size * cfg.patch_size * cfg.in_chans, d)) \
        * jnp.sqrt(2.0 / fan_out)
    params = {
        "patch_embed": {"kernel": pk.astype(pdt), "bias": jnp.zeros((d,), pdt)},
        "cls_token": _trunc_normal(next(keys), (1, 1, d), 0.02, pdt),
        "pos_embed": _trunc_normal(next(keys), (1, cfg.seq_len, d), 0.02, pdt),
        "norm": ln(d),
        "head1": torch_default_linear(d, nc),
    }
    if cfg.distilled:
        params["dist_token"] = _trunc_normal(next(keys), (1, 1, d), 0.02, pdt)
        params["head_dist"] = linear(d, nc)
    if cfg.has_logits:
        params["pre_logits"] = linear(d, cfg.representation_size)
        params["head"] = linear(cfg.representation_size, nc)
    else:
        params["head"] = linear(d, nc)

    def one_block(k):
        k = iter(jax.random.split(k, 8))

        def blin(kin, kout, bias=True):
            p = {"kernel": _trunc_normal(next(k), (kin, kout), 0.01, pdt)}
            if bias:
                p["bias"] = jnp.zeros((kout,), pdt)
            return p

        return {
            "ln1": ln(d),
            # cfg.qkv_bias mirrors nn.Linear(dim, 3*dim, bias=qkv_bias)
            # (vit_model.py:98) — previously declared but never honored
            "attn": {"qkv": blin(d, 3 * d, bias=cfg.qkv_bias),
                     "proj": blin(d, d)},
            "ln2": ln(d),
            "mlp": {"fc1": blin(d, hid), "fc2": blin(hid, d)},
        }

    blocks = [one_block(jax.random.fold_in(next(keys), i))
              for i in range(cfg.depth)]
    # Stack per-layer trees along a leading depth axis for lax.scan.
    params["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _linear(x, p, cfg):
    """GEMM dispatch: bf16/f32 jnp.dot, or int8 MXU path when the param node
    was rewritten by ops.quant.quantize_params (has 'kernel_q').  With
    cfg.int8_fused_gemm and a static act_scale, the quantize runs inside a
    Pallas kernel (kernels/gemm.linear_int8_fused) instead of XLA."""
    if "kernel_q" in p:
        if cfg.int8_fused_gemm and "act_scale" in p \
                and x.dtype != jnp.int8:
            from vision_transformer_cam_tpu.kernels.gemm import (
                linear_int8_fused)
            from vision_transformer_cam_tpu.ops.quant import combined_scale
            cs = combined_scale(p)
            return linear_int8_fused(
                x, p["kernel_q"], cs, p["bias"], 1.0 / p["act_scale"],
                out_dtype=cfg.dtype,
                interpret=jax.default_backend() != "tpu")
        from vision_transformer_cam_tpu.ops.quant import qlinear
        return qlinear(x, p, p.get("bias"), out_dtype=cfg.dtype)
    # operands cast to cfg.dtype: under mixed precision the f32 master
    # kernels must not promote the GEMM to f32 (XLA fuses the convert into
    # the operand load; autodiff routes the bf16 dW back to the f32 master
    # through the cast).  Identity for all non-mixed configs.
    y = jnp.dot(x.astype(cfg.dtype), p["kernel"].astype(cfg.dtype),
                preferred_element_type=cfg.dtype)
    return y + p["bias"].astype(cfg.dtype) if "bias" in p else y


def patch_embed(params, x, cfg: ViTCAMConfig):
    """16x16/s16 conv (vit_model.py:64,76) as a reshape + one MXU matmul.

    x: [B, H, W, C] (NHWC — TPU-preferred layout).  Returns [B, P, D].
    """
    b, h, w, c = x.shape
    p, g = cfg.patch_size, cfg.grid_size
    if h != cfg.img_size or w != cfg.img_size:
        raise ValueError(
            f"Input image size ({h}*{w}) doesn't match model "
            f"({cfg.img_size}*{cfg.img_size}).")
    x = x.reshape(b, g, p, g, p, c).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, g * g, p * p * c)
    return _linear(x, params, cfg)


def _attention_xla(ap, x, bg, cfg: ViTCAMConfig, rngs, need_probs,
                   joint=None, hm_dtype=None, train=False):
    """Reference-shaped attention (vit_model.py:103-140), XLA path.

    bg: [B, N] float {0,1} background indicator (cls position always 0);
    the additive mask is mask_value * min(bg_i + bg_j, 1).
    Returns (out, cls_row [B,N], probs_headmean or None, probs_perhead or None).
    """
    b, n, c = x.shape
    h, dh = cfg.num_heads, cfg.head_dim
    qkv = _linear(x, ap["qkv"], cfg)
    qkv = qkv.reshape(b, n, 3, h, dh).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                      preferred_element_type=cfg.dtype) * cfg.scale
    pair = jnp.minimum(bg[:, :, None] + bg[:, None, :], 1.0)
    attn = attn + (cfg.mask_value * pair)[:, None, :, :]
    if cfg.softmax_clamp:
        # honor the serving knob on the XLA path too (it was a silent
        # no-op here).  Matches the kernel whenever raw logits stay below
        # 80 (trained ViTs never exceed it — kernels/attention.py:218-222);
        # above that the two differ on bg-query rows, because here the
        # clamp applies AFTER the symmetric -100 pair mask while the kernel
        # clamps its rank-1-masked logits (a row-constant -100 shift apart).
        attn = jnp.minimum(attn, 80.0)
    probs = jax.nn.softmax(attn, axis=-1)

    # cls_row directly from the cls query row — the full [B, N, N] headmean
    # reduction (N× the work) is only materialized when a consumer asked
    # for it (need_probs); XLA is not guaranteed to narrow the reduce
    # through the row-0 slice on its own
    cls_row = jnp.mean(probs[:, :, 0, :], axis=1)  # [B, N]
    headmean = jnp.mean(probs, axis=1) if need_probs else None

    probs_used = _dropout(rngs.get("attn"), cfg.attn_drop_ratio, probs) \
        if rngs else probs
    out = jnp.einsum("bhqk,bhkd->bhqd", probs_used, v,
                     preferred_element_type=cfg.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
    out = _linear(out, ap["proj"], cfg)
    if rngs:
        out = _dropout(rngs.get("proj"), cfg.drop_ratio, out)
    ph = probs if need_probs == "perhead" else None
    hm = headmean
    if hm is not None and hm_dtype is not None:
        hm = hm.astype(hm_dtype)
    return out, cls_row, hm, ph, None


def _mask_from_cls_row(cls_row, cfg: ViTCAMConfig):
    """One rollout step on the cls row -> normalized patch weights mask_14
    and the bg indicator (vit_model.py:329-349).  Prefix tokens (cls, and
    dist when distilled) are never background and are excluded from the
    patch-weight map."""
    from vision_transformer_cam_tpu.ops.rollout import aug_cls_row
    mask_i = aug_cls_row(cls_row)[:, cfg.num_tokens:]   # [B, num_patches]
    if cfg.per_sample_mask_norm:
        mask14 = mask_i / jnp.max(mask_i, axis=-1, keepdims=True)
    else:
        mask14 = mask_i / jnp.max(mask_i)          # batch-global, as reference
    bg_patches = (mask14 < cfg.mask_threshold).astype(cls_row.dtype)
    bg = jnp.concatenate(
        [jnp.zeros((cls_row.shape[0], cfg.num_tokens), cls_row.dtype),
         bg_patches], axis=1)
    return mask14, bg


def embed_tokens(params, x, cfg: ViTCAMConfig):
    """Embedding prologue (vit_model.py:303-317): patch embed, prefix-token
    broadcast (cls, + dist when distilled), positional embedding.  Shared by
    forward_features and the pipeline-parallel runner (parallel/pipeline.py).
    x: [B, H, W, C] -> tokens [B, N, D] (pre position-dropout)."""
    b = x.shape[0]
    tokens = patch_embed(params["patch_embed"], x.astype(cfg.dtype), cfg)
    cls = jnp.broadcast_to(params["cls_token"].astype(cfg.dtype),
                           (b, 1, cfg.embed_dim))
    if cfg.distilled:
        dist = jnp.broadcast_to(params["dist_token"].astype(cfg.dtype),
                                (b, 1, cfg.embed_dim))
        tokens = jnp.concatenate([cls, dist, tokens], axis=1)
    else:
        tokens = jnp.concatenate([cls, tokens], axis=1)
    return tokens + params["pos_embed"].astype(cfg.dtype)


def _sp(x, cfg: ViTCAMConfig):
    """Sequence-parallel sharding constraint: pin dim 1 (the token axis) of a
    [B, N, ...] array to cfg.seq_axis (and dim 0 to cfg.data_axis when set).
    GSPMD then propagates the layout through the scan — K/V all-gathers and
    the rollout-joint psum come out as XLA collectives over ICI.  No-op
    unless cfg.seq_axis is set; must be traced under a mesh context then."""
    if cfg.seq_axis is None or x is None or getattr(x, "ndim", 0) < 2:
        return x
    spec = PartitionSpec(cfg.data_axis, cfg.seq_axis,
                         *([None] * (x.ndim - 2)))
    return jax.lax.with_sharding_constraint(x, spec)


def forward_features(params, x, cfg: ViTCAMConfig, *, train=False, rng=None,
                     need_headmean=False, need_blocks=False,
                     need_perhead=False, need_rollout=False):
    """vit_model.py:303-408 as a scan.  x: [B, H, W, C]."""
    if cfg.seq_axis is not None:
        # attn_impl="pallas" COMPOSES with sequence parallelism since round
        # 4: kernels.attention.masked_attention_seq shard_maps the kernel
        # over the token axis (local q rows, all-gathered K/V).  The fusion
        # knobs below remain batch-axis kernels and still raise.
        bad = [name for name, on in
               (("attn_block_fusion", cfg.attn_block_fusion),
                ("mlp_fusion", cfg.mlp_fusion),
                ("ln_quant_fusion", cfg.ln_quant_fusion),
                ("int8_fused_gemm", cfg.int8_fused_gemm),
                # the int8 attention-I/O epilogues are batch-axis kernel
                # fusions too — the sp kernel path would silently drop them
                # (serving.apply_seq_parallel clears these with a note; a
                # hand-built config must get the same signal, not silence)
                ("int8_attn_io", cfg.int8_attn_io),
                ("int8_attn_out", cfg.int8_attn_out)) if on]
        if bad:
            raise ValueError(
                f"cfg.seq_axis={cfg.seq_axis!r} (sequence parallelism) "
                f"composes with attn_impl='pallas', but {', '.join(bad)} "
                "request batch-axis Pallas fusions whose shard_map wrap "
                "(cfg.data_axis) would see sequence-sharded operands. "
                "Drop those knobs (plain int8 qlinear GEMMs are fine) or "
                "drop seq_axis.")
    if train and cfg.softmax_clamp:
        # clamp-softmax is a SERVING-only knob: the backward kernels (and
        # the XLA fallback) differentiate un-clamped softmax, so training
        # through min(s, 80) would silently produce wrong gradients
        # whenever the clamp engages.  Neutralize it here — the training
        # forward then matches the math its backward differentiates.
        cfg = cfg.replace(softmax_clamp=False)
    b = x.shape[0]
    tokens = _sp(embed_tokens(params, x, cfg), cfg)

    use_rng = train and rng is not None
    if use_rng:
        tokens = _dropout(jax.random.fold_in(rng, 0xD0), cfg.drop_ratio, tokens)

    n = cfg.seq_len
    dpr = jnp.linspace(0.0, cfg.drop_path_ratio, cfg.depth).astype(cfg.dtype)
    layer_idx = jnp.arange(cfg.depth)
    bg0 = jnp.zeros((b, n), cfg.dtype)

    attn_impl = _attention_xla  # pallas path substituted in apply() wrapper
    if cfg.attn_impl == "pallas":
        from vision_transformer_cam_tpu.kernels.attention import (
            attention_pallas)
        attn_impl = attention_pallas

    # fused LN -> int8 (serving): eligibility is a static property of the
    # param tree — both consumers of each LN output must be int8 GEMMs with
    # static act_scales, so the bf16 LN result never needs to exist
    bp = params["blocks"]
    ln_q_attn = (cfg.ln_quant_fusion and not train
                 and cfg.attn_impl == "pallas" and cfg.int8_attn_io
                 and all(k in bp["attn"]["qkv"]
                         for k in ("kernel_q", "act_scale", "out_scales"))
                 and "act_scale" in bp["attn"]["proj"])
    ln_q_mlp = (cfg.ln_quant_fusion and not train and not cfg.mlp_fusion
                and all(k in bp["mlp"][f] for f in ("fc1", "fc2")
                        for k in ("kernel_q", "act_scale")))

    def _ln_quant_call(tok_a, ln_p, act_scale):
        from vision_transformer_cam_tpu.kernels.gemm import ln_quant
        base = functools.partial(ln_quant, eps=cfg.ln_eps,
                                 interpret=jax.default_backend() != "tpu")
        if cfg.data_axis is None:
            return base(tok_a, ln_p["scale"], ln_p["bias"],
                        inv_a=1.0 / act_scale)
        from vision_transformer_cam_tpu.kernels.attention import (
            sharded_kernel_call)
        fn = sharded_kernel_call(
            lambda t, s, b, ia: (base(t, s, b, inv_a=ia),),
            cfg.data_axis, (True, False, False, False), 1)
        return fn(tok_a, ln_p["scale"], ln_p["bias"], 1.0 / act_scale)[0]

    need_probs = "perhead" if need_perhead else (
        "headmean" if (need_headmean or need_rollout) else None)

    # Rollout product carried through the forward scan (the reference's
    # post-hoc recursive matmul chain, predict.py:222-226, fused here):
    # J_l = aug(A_l) @ J_{l-1}, J_0 = I; the CAM is row 0 of J_depth.
    # the joint product accumulates across all layers — carry it in f32 even
    # under bf16 serving (bf16 J roughly doubles the CAM's deviation from the
    # f32 path; the f32 carry costs ~1% throughput)
    rollout_dtype = jnp.float32 if cfg.dtype == jnp.bfloat16 else cfg.dtype
    # rollout_post: only the final ROW of J is needed, so each layer just
    # emits its head-mean matrix and a reversed [B, N] vector-matrix chain
    # runs after the scan — no [N, N] joint carry in the hot loop.
    # None = auto: on for long sequences (see configs.ModelConfig).
    want_post = (n > 512) if cfg.rollout_post is None else cfg.rollout_post
    rollout_post = (need_rollout and want_post and not train
                    and not (need_headmean or need_perhead))
    carry_rollout = need_rollout and not rollout_post
    joint0 = _sp(jnp.broadcast_to(jnp.eye(n, dtype=rollout_dtype),
                                  (b, n, n)), cfg) \
        if carry_rollout else jnp.zeros((), cfg.dtype)
    bg0 = _sp(bg0, cfg)

    def body(carry, xs):
        tok, bg, joint = carry
        lp, i, dp = xs
        if use_rng:
            lrng = jax.random.fold_in(rng, i + 1)
            rngs = {k: jax.random.fold_in(lrng, j) for j, k in
                    enumerate(["attn", "proj", "mlp1", "mlp2", "dp1", "dp2"])}
        else:
            rngs = None
        xn = _ln_quant_call(tok, lp["ln1"], lp["attn"]["qkv"]["act_scale"]) \
            if ln_q_attn else \
            _layer_norm(tok, lp["ln1"]["scale"], lp["ln1"]["bias"],
                        cfg.ln_eps)
        # kernel-fused rollout only when the head-mean matrices aren't also
        # being collected (the kernel emits one [N,N] output per call)
        fuse_rollout = carry_rollout and not (need_headmean or need_perhead)
        # v3 whole-sub-block kernel (qkv GEMM + attention + proj + residual
        # in one program): inference, float weights, no stacked probs needed.
        # Gated on `train`, not on rngs: deterministic training (all drop
        # ratios 0 -> rngs is None) must still avoid these no-VJP kernels.
        use_block_kernel = (cfg.attn_impl == "pallas" and not train
                            and cfg.attn_block_fusion and rngs is None
                            and need_probs in (None, "headmean")
                            and (need_probs is None or fuse_rollout)
                            and "kernel" in params["blocks"]["attn"]["qkv"])
        if use_block_kernel:
            from vision_transformer_cam_tpu.kernels.attention import (
                attention_block_fused, sharded_kernel_call)
            blk_fn = functools.partial(
                attention_block_fused,
                num_heads=cfg.num_heads, scale=cfg.scale,
                mask_value=cfg.mask_value, clamp_softmax=cfg.softmax_clamp,
                interpret=jax.default_backend() != "tpu")
            if cfg.data_axis is not None:
                # batch-sharded activations, replicated weights (see
                # kernels.attention.sharded_kernel_call)
                blk_fn = sharded_kernel_call(
                    blk_fn, cfg.data_axis,
                    (True, True, False, False, False, False, True, True),
                    3 if fuse_rollout else 2)
            res = blk_fn(
                xn, tok, lp["attn"]["qkv"]["kernel"],
                lp["attn"]["qkv"].get(
                    "bias", jnp.zeros((3 * cfg.embed_dim,), cfg.dtype)),
                lp["attn"]["proj"]["kernel"],
                lp["attn"]["proj"]["bias"], bg,
                joint if fuse_rollout else None)
            tok, cls_row = res[0], res[1].astype(cfg.dtype)
            newj = res[2] if fuse_rollout else None
            hm = ph = None
        else:
            o, cls_row, hm, ph, newj = attn_impl(
                lp["attn"], xn, bg, cfg, rngs, need_probs,
                joint=joint if fuse_rollout else None,
                hm_dtype=rollout_dtype if rollout_post else None,
                train=train)
            if use_rng and cfg.drop_path_ratio > 0:
                # static gate: dp is a traced scan input, so _drop_path
                # cannot skip rate==0 itself — at the default ratio 0.0
                # this removes two guaranteed-no-op RNG draws per layer
                # from the remat'd scan body
                o = _drop_path(rngs["dp1"], dp, o)
            tok = tok + o
        f1, f2 = lp["mlp"]["fc1"], lp["mlp"]["fc2"]
        yn = _ln_quant_call(tok, lp["ln2"], f1["act_scale"]) \
            if ln_q_mlp else \
            _layer_norm(tok, lp["ln2"]["scale"], lp["ln2"]["bias"],
                        cfg.ln_eps)
        # serving-only fused MLP kernel: the [B*N, 4C] hidden tensor stays in
        # VMEM instead of round-tripping HBM between fc1 and fc2.  `not
        # train`: these kernels have no VJP (same rationale as the block
        # kernel above).  The int8 branch requires BOTH fc1 and fc2 to be
        # fully quantized with static scales — a partially-quantized tree
        # falls through to the graceful unfused path instead of KeyError.
        use_mlp_kernel = cfg.mlp_fusion and not train and not use_rng
        if use_mlp_kernel and all(k in p for p in (f1, f2)
                                  for k in ("kernel_q", "act_scale")):
            from vision_transformer_cam_tpu.kernels.gemm import mlp_fused_int8
            from vision_transformer_cam_tpu.ops.quant import combined_scale
            cs1 = combined_scale(f1)
            cs2 = combined_scale(f2)
            ymlp = mlp_fused_int8(
                yn, f1["kernel_q"], cs1, f1["bias"], f2["kernel_q"], cs2,
                f2["bias"], 1.0 / f1["act_scale"], 1.0 / f2["act_scale"],
                gelu_approx=cfg.gelu_approx, out_dtype=cfg.dtype,
                interpret=jax.default_backend() != "tpu")
        elif use_mlp_kernel and "kernel" in f1:
            from vision_transformer_cam_tpu.kernels.gemm import mlp_fused
            ymlp = mlp_fused(yn, f1["kernel"], f1["bias"], f2["kernel"],
                             f2["bias"], gelu_approx=cfg.gelu_approx,
                             interpret=jax.default_backend() != "tpu")
        elif all(k in p for p in (f1, f2)
                 for k in ("kernel_q", "act_scale")) and not train:
            # int8 serving with static scales: fc1's epilogue emits the
            # GELU'd hidden tensor already requantized to int8 (fc2's
            # act_scale), so the [B, N, 4C] intermediate — the model's
            # largest HBM write — is half the bf16 traffic and fc2 skips
            # its quantize pass.  Same math as the unfused chain.
            from vision_transformer_cam_tpu.ops.quant import (
                qlinear_gelu_requant)
            hmid = qlinear_gelu_requant(yn, f1, f2["act_scale"],
                                        gelu_approx=cfg.gelu_approx)
            ymlp = _linear(hmid, f2, cfg)
        else:
            hmid = _gelu(_linear(yn, f1, cfg), cfg.gelu_approx)
            if use_rng:
                hmid = _dropout(rngs["mlp1"], cfg.drop_ratio, hmid)
            ymlp = _linear(hmid, f2, cfg)
        if use_rng:
            ymlp = _dropout(rngs["mlp2"], cfg.drop_ratio, ymlp)
            if cfg.drop_path_ratio > 0:   # static gate, see dp1 above
                ymlp = _drop_path(rngs["dp2"], dp, ymlp)
        tok = tok + ymlp

        # Recompute the bg mask from this block's attention when i >= mask_from
        # (vit_model.py:325-361); it feeds the *next* block.
        _, new_bg = _mask_from_cls_row(cls_row, cfg)
        bg = jnp.where(i >= cfg.mask_from, new_bg, bg)

        if carry_rollout:
            if newj is not None:      # kernel-fused rollout update
                joint = newj
            else:
                from vision_transformer_cam_tpu.ops.rollout import (
                    aug_normalize)
                aug = aug_normalize(hm)
                joint = jnp.einsum(
                    "bij,bjk->bik", aug, joint,
                    preferred_element_type=jnp.promote_types(
                        jnp.float32, joint.dtype)).astype(joint.dtype)

        # re-pin the carry's layout each layer under sequence parallelism —
        # without the explicit constraint GSPMD's scan fixpoint is free to
        # resolve the carry replicated and all-gather every layer
        tok, bg, joint = _sp(tok, cfg), _sp(bg, cfg), _sp(joint, cfg)
        outs = (cls_row,
                _sp(hm, cfg) if (need_headmean or need_perhead
                                 or rollout_post)
                else jnp.zeros((), cfg.dtype),
                ph if need_perhead else jnp.zeros((), cfg.dtype),
                tok if need_blocks else jnp.zeros((), cfg.dtype))
        return (tok, bg, joint), outs

    if train and cfg.remat:
        # backward-pass memory: save only the scan carry, recompute the
        # block internals (qkv, mlp hidden) — without this a ViT-B train
        # step at batch 256 wants ~26 GB of residuals on a 16 GB chip
        body = jax.checkpoint(body, prevent_cse=False)
    (tokens, _, joint), (cls_rows, hms, phs, blocks_out) = jax.lax.scan(
        body, (tokens, bg0, joint0), (params["blocks"], layer_idx, dpr))

    rollout_row = None
    if carry_rollout:
        rollout_row = joint[:, 0, :]
    elif rollout_post:
        # row = ((e_cls A_L) A_{L-1}) ... A_1 with A_l = (hm_l + I)/2 (rows
        # of hm sum to 1, so (A+I) row-normalizes to exactly /2); reversed
        # vector-matrix chain over the stacked head-mean matrices.  At
        # least f32, but follow rollout_dtype UP (f64 parity runs must not
        # be silently computed in f32).
        chain_dt = jnp.promote_types(jnp.float32, rollout_dtype)
        r0 = jnp.zeros((b, n), chain_dt).at[:, 0].set(1.0)

        def chain(r, hm_l):
            prod = jnp.einsum("bn,bnm->bm", r, hm_l.astype(chain_dt),
                              preferred_element_type=chain_dt)
            return 0.5 * (prod + r), None

        r, _ = jax.lax.scan(chain, r0, hms, reverse=True)
        rollout_row = r.astype(rollout_dtype)

    # --- top-K high-weight patch head (vit_model.py:363-394) ---
    mask14, _ = _mask_from_cls_row(cls_rows[-1], cfg)
    _, top_idx = jax.lax.top_k(mask14, cfg.top_k_patches)      # [B, K]
    # reference indexes x[j][index+1] on the full token tensor — i.e. skips
    # the prefix tokens (one cls; cls+dist when distilled)
    patch_tokens = tokens[:, cfg.num_tokens:, :]
    top_embeds = jnp.take_along_axis(
        patch_tokens, top_idx[:, :, None], axis=1)              # [B, K, C]
    head1_in = jnp.mean(top_embeds, axis=1)
    head1_logits = jnp.dot(head1_in, params["head1"]["kernel"].astype(
        cfg.dtype), preferred_element_type=cfg.dtype) \
        + params["head1"]["bias"].astype(cfg.dtype)

    xf = _layer_norm(tokens, params["norm"]["scale"], params["norm"]["bias"],
                     cfg.ln_eps)
    cls_feat = xf[:, 0]
    if cfg.has_logits:
        cls_feat = jnp.tanh(
            jnp.dot(cls_feat, params["pre_logits"]["kernel"].astype(
                cfg.dtype), preferred_element_type=cfg.dtype)
            + params["pre_logits"]["bias"].astype(cfg.dtype))

    aux = dict(
        rollout_row=rollout_row,
        tokens_prenorm=tokens,
        attn_cls_rows=cls_rows,
        attn_headmean=hms if (need_headmean or need_perhead) else None,
        attn_perhead=phs if need_perhead else None,
        block_outputs=blocks_out if need_blocks else None,
        top_patch_embeds=top_embeds,
        top_patch_idx=top_idx,
        head1_logits=head1_logits,
        head1_kernel=params["head1"]["kernel"],
        dist_feat=xf[:, 1] if cfg.distilled else None,
    )
    return cls_feat, aux


def forward(params, x, cfg: ViTCAMConfig, *, train=False, rng=None,
            need_headmean=False, need_blocks=False, need_perhead=False,
            need_rollout=False) -> ViTCAMOutput:
    """Full forward (vit_model.py:411-424): features -> cls head, returning the
    structured equivalent of the reference 6-tuple.  Unjitted — differentiable
    and composable inside a larger jitted train step; `apply` below is the
    jitted inference entry point.

    cfg.matmul_precision: traced under jax.default_matmul_precision so the
    setting reaches every dot in the graph — XLA einsums and the Pallas
    kernels' in-kernel matmuls alike (cfg is a jit-static arg, so distinct
    precisions compile distinct programs)."""
    if cfg.matmul_precision:
        with jax.default_matmul_precision(cfg.matmul_precision):
            return _forward(params, x, cfg, train=train, rng=rng,
                            need_headmean=need_headmean,
                            need_blocks=need_blocks,
                            need_perhead=need_perhead,
                            need_rollout=need_rollout)
    return _forward(params, x, cfg, train=train, rng=rng,
                    need_headmean=need_headmean, need_blocks=need_blocks,
                    need_perhead=need_perhead, need_rollout=need_rollout)


def _forward(params, x, cfg: ViTCAMConfig, *, train, rng, need_headmean,
             need_blocks, need_perhead, need_rollout) -> ViTCAMOutput:
    cls_feat, aux = forward_features(
        params, x, cfg, train=train, rng=rng, need_headmean=need_headmean,
        need_blocks=need_blocks, need_perhead=need_perhead,
        need_rollout=need_rollout)
    logits = jnp.dot(cls_feat, params["head"]["kernel"].astype(cfg.dtype),
                     preferred_element_type=cfg.dtype) \
        + params["head"]["bias"].astype(cfg.dtype)
    dist_logits = None
    if cfg.distilled:
        dist_logits = jnp.dot(
            aux["dist_feat"], params["head_dist"]["kernel"].astype(cfg.dtype),
            preferred_element_type=cfg.dtype) \
            + params["head_dist"]["bias"].astype(cfg.dtype)
        # train: keep the heads separate (the loss reads dist_logits so
        # head_dist actually trains — vit_model.py:414-417); eval: average
        logits = logits if train else (logits + dist_logits) / 2.0
    return ViTCAMOutput(
        logits=logits,
        dist_logits=dist_logits if train else None,
        head1_logits=aux["head1_logits"],
        attn_cls_rows=aux["attn_cls_rows"],
        top_patch_embeds=aux["top_patch_embeds"],
        top_patch_idx=aux["top_patch_idx"],
        head1_kernel=aux["head1_kernel"],
        attn_headmean=aux["attn_headmean"],
        attn_perhead=aux["attn_perhead"],
        block_outputs=aux["block_outputs"],
        rollout_row=aux["rollout_row"],
        tokens_prenorm=aux["tokens_prenorm"],
    )


apply = functools.partial(jax.jit, static_argnames=(
    "cfg", "train", "need_headmean", "need_blocks", "need_perhead",
    "need_rollout"))(forward)
