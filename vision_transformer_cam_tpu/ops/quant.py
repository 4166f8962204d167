"""Int8 weight/activation quantization for the GEMM-heavy serving path.

TPU v5e's MXU runs int8 at 2x the bf16 rate; the classic W8A8 recipe —
per-output-channel symmetric weight scales, dynamic per-tensor activation
absmax — moves the ViT's qkv/proj/mlp/patch-embed GEMMs onto it.  The
attention core (Pallas kernel) and LayerNorms stay in bf16/f32, so CAM
structure is preserved; this is a serving mode, not the parity path (goldens
pin the f32 graph — quality under quantization is measured by mAP, the same
way the reference reports it).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight(w):
    """Symmetric per-output-channel int8: w ~ w_q * scale.

    w: [..., in, out]; the reduction runs over the `in` axis only, so stacked
    per-layer kernels [L, in, out] get independent [L, 1, out] scales.
    """
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    wq = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127
                  ).astype(jnp.int8)
    return {"kernel_q": wq, "scale": scale}


def qlinear(x, qp, bias=None, out_dtype=jnp.bfloat16):
    """y = x @ w + b with int8 x int8 -> int32 on the MXU.

    x: [..., in] any float dtype; qp: quantize_weight output for ONE layer
    (kernel_q [in, out] — stacked [L, in, out] trees are sliced per layer
    by the lax.scan body before reaching here).
    Activation scale: static (qp['act_scale'], from calibrate_act_scales)
    when present — no reduction pass at serving time; dynamic per-tensor
    absmax otherwise.
    """
    if x.dtype == jnp.int8:
        # input already quantized upstream (e.g. the attention kernel's
        # int8 output); act_scale IS its scale by construction — the
        # upstream producer requantized to exactly this layer's static
        # scale.  A dynamically-quantized layer can never legally receive
        # an int8 input, so make the invariant self-documenting:
        if "act_scale" not in qp:
            raise ValueError(
                "int8 input to qlinear requires a static act_scale on the "
                "consuming layer (the producer must requantize to it); a "
                "dynamically-quantized layer cannot accept int8 inputs")
        xq, sx = x, qp["act_scale"]
    elif "act_scale" in qp:
        sx = qp["act_scale"]
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127
                      ).astype(jnp.int8)
    else:
        sx = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))),
                         1e-8) / 127.0
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127
                      ).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, qp["kernel_q"],
        (((x.ndim - 1,), (qp["kernel_q"].ndim - 2,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx * \
        qp["scale"].reshape((1,) * (acc.ndim - 1) + (-1,))
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def qlinear_requant(x, qp, out_scales, groups: int = 3):
    """int8 GEMM whose output is REQUANTIZED to int8 in the (XLA-fused)
    epilogue: y_i8 = round((acc*cs + b) / s_out) — no bf16 materialization
    between the qkv GEMM and the attention kernel.

    out_scales: [groups] f32, one scale per contiguous output group —
    groups=3 for q|k|v thirds (legacy per-tensor), groups=3*H for the
    per-head calibration (each head's dh-wide slice gets its own scale,
    order sq_0..sq_{H-1}, sk_*, sv_* matching the [q|k|v][head] qkv
    layout).  Bias is applied before requantization.
    """
    n_out = qp["kernel_q"].shape[-1]
    y = qlinear(x, qp, qp.get("bias"), out_dtype=jnp.float32)
    s_col = jnp.repeat(out_scales.astype(jnp.float32), n_out // groups)
    return jnp.clip(jnp.round(y / s_col), -127, 127).astype(jnp.int8)


def combined_scale(qp):
    """Column scale for a fused int8 epilogue: per-output-channel weight
    scale x static activation scale, as one [1, out] f32 row (the single
    definition the Pallas int8 GEMM callers share)."""
    return (qp["scale"].reshape(1, -1)
            * qp["act_scale"]).astype(jnp.float32)


def qlinear_gelu_requant(x, qp, out_scale, gelu_approx=True):
    """fc1 GEMM -> GELU -> int8 requantize as one (XLA-fused) epilogue
    chain: the [B, N, hidden] activation reaches HBM as int8 — half the
    bf16 write traffic on the model's largest intermediate — and the
    downstream fc2 qlinear sees an int8 input, so its quantize pass
    disappears.  Mathematically identical to quantizing gelu(fc1(x)) with
    the static `out_scale` (which IS fc2's act_scale), as the unfused
    serving path already did; only the materialization changes.
    """
    y = qlinear(x, qp, qp.get("bias"), out_dtype=jnp.float32)
    y = jax.nn.gelu(y, approximate=gelu_approx)
    return jnp.clip(jnp.round(y / out_scale), -127, 127).astype(jnp.int8)


def quantize_params(params, act_scales=None):
    """Return a copy of the model pytree with the per-block GEMM kernels and
    the patch-embed kernel replaced by int8 dicts (models/vit._linear
    dispatches on the 'kernel_q' key).  `act_scales` (from
    calibrate_act_scales) attaches static activation scales — the serving
    path then needs no runtime absmax reduction."""
    # container-only copy: tree.map rebuilds every dict/list fresh (those
    # are all we mutate below); the weight arrays themselves are immutable
    # and shared, so no transient 2x parameter memory
    out = jax.tree.map(lambda x: x, params)

    def q(node, scale=None):
        d = dict(quantize_weight(node["kernel"]), bias=node.get("bias"))
        if scale is not None:
            d["act_scale"] = jnp.asarray(scale, jnp.float32)
        return d

    a = act_scales or {}
    out["patch_embed"] = q(params["patch_embed"], a.get("patch_embed"))
    blocks = params["blocks"]
    ab = a.get("blocks", {})
    out["blocks"]["attn"]["qkv"] = q(blocks["attn"]["qkv"],
                                     ab.get("qkv"))
    if "qkv_out" in ab:
        # per-layer (q, k, v) output scales for the int8 attention I/O path
        out["blocks"]["attn"]["qkv"]["out_scales"] = ab["qkv_out"]
    out["blocks"]["attn"]["proj"] = q(blocks["attn"]["proj"],
                                      ab.get("proj"))
    out["blocks"]["mlp"]["fc1"] = q(blocks["mlp"]["fc1"], ab.get("fc1"))
    out["blocks"]["mlp"]["fc2"] = q(blocks["mlp"]["fc2"], ab.get("fc2"))
    return out


def calibrate_act_scales(params, cfg, images, margin: float = 1.0):
    """Run one float forward over a calibration batch recording the absmax of
    every quantized GEMM's input; returns the act_scales tree for
    quantize_params (scale = absmax * margin / 127)."""
    from vision_transformer_cam_tpu.models import vit as m

    x = images.astype(cfg.dtype)
    tokens = m.patch_embed(params["patch_embed"], x, cfg)
    s_patch = _absmax_of_patch_input(x, cfg)
    b = x.shape[0]
    cls = jnp.broadcast_to(params["cls_token"].astype(cfg.dtype),
                           (b, 1, cfg.embed_dim))
    prefix = [cls]
    if cfg.distilled:
        # the dist token is part of the sequence (cfg.seq_len counts it);
        # omitting it made pos_embed's add shape-mismatch for distilled
        # models (round-2 review finding)
        prefix.append(jnp.broadcast_to(
            params["dist_token"].astype(cfg.dtype), (b, 1, cfg.embed_dim)))
    tokens = jnp.concatenate(prefix + [tokens], axis=1) \
        + params["pos_embed"].astype(cfg.dtype)

    bg = jnp.zeros((b, cfg.seq_len), cfg.dtype)
    sc = {"qkv": [], "proj": [], "fc1": [], "fc2": []}
    qkv_out_amax = []   # per-layer (q, k, v) output absmax — int8 attn I/O
    c = cfg.embed_dim
    for i in range(cfg.depth):
        lp = jax.tree.map(lambda a: a[i], params["blocks"])
        xn = m._layer_norm(tokens, lp["ln1"]["scale"], lp["ln1"]["bias"],
                           cfg.ln_eps)
        sc["qkv"].append(_absmax(xn))
        qkv_out = jnp.dot(xn, lp["attn"]["qkv"]["kernel"],
                          preferred_element_type=cfg.dtype) \
            + lp["attn"]["qkv"].get("bias", 0.0)
        # PER-HEAD (q, k, v) output absmax [3, H]: heads whose magnitudes
        # sit far below the per-tensor absmax would otherwise waste int8
        # range — the dominant term of the int8-attn-I/O CAM deviation
        # (round-2 verdict next #1)
        qh = jnp.abs(qkv_out.reshape(
            qkv_out.shape[0], qkv_out.shape[1], 3, cfg.num_heads,
            cfg.head_dim).astype(jnp.float32))
        qkv_out_amax.append(jnp.max(qh, axis=(0, 1, 4)))
        pre, cls_row = _attn_calib(qkv_out, bg, cfg)
        sc["proj"].append(_absmax(pre))
        o = jnp.dot(pre, lp["attn"]["proj"]["kernel"],
                    preferred_element_type=cfg.dtype) \
            + lp["attn"]["proj"]["bias"]
        tokens = tokens + o
        yn = m._layer_norm(tokens, lp["ln2"]["scale"], lp["ln2"]["bias"],
                           cfg.ln_eps)
        sc["fc1"].append(_absmax(yn))
        hmid = m._gelu(jnp.dot(yn, lp["mlp"]["fc1"]["kernel"],
                               preferred_element_type=cfg.dtype)
                       + lp["mlp"]["fc1"]["bias"], cfg.gelu_approx)
        sc["fc2"].append(_absmax(hmid))
        tokens = tokens + jnp.dot(hmid, lp["mlp"]["fc2"]["kernel"],
                                  preferred_element_type=cfg.dtype) \
            + lp["mlp"]["fc2"]["bias"]
        if i >= cfg.mask_from:  # mask recompute schedule (vit_model.py:325)
            _, bg = m._mask_from_cls_row(cls_row, cfg)

    # ONE device->host gather for all ~4*depth+1 absmax scalars — float()
    # per value would block on a tunnel round-trip each (CLAUDE.md gotcha)
    host = jax.device_get({"patch": s_patch,
                           **{k: jnp.stack(v) for k, v in sc.items()}})
    f = margin / 127.0
    out = {"patch_embed": float(host["patch"]) * f,
           "blocks": {k: jnp.asarray(host[k] * f, jnp.float32)
                      for k in sc}}
    # [depth, 3, H] per-head (q, k, v) output scales
    out["blocks"]["qkv_out"] = (jnp.stack(qkv_out_amax)
                                * (margin / 127.0)).astype(jnp.float32)
    return out


def _absmax(x):
    return jnp.max(jnp.abs(x.astype(jnp.float32)))


def _absmax_of_patch_input(x, cfg):
    return _absmax(x)


def _attn_calib(qkv_out, bg, cfg):
    """(pre_proj [B,N,C], cls_row [B,N]) from the already-computed fused qkv
    output — ONE attention pass per layer with the serving graph's math
    (incl. the softmax clamp when cfg.softmax_clamp), so the proj act_scale
    is calibrated on exactly the probabilities serving produces."""
    b, n, _ = qkv_out.shape
    h, dh = cfg.num_heads, cfg.head_dim
    qkv = qkv_out.reshape(b, n, 3, h, dh).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=cfg.dtype) * cfg.scale
    pair = jnp.minimum(bg[:, :, None] + bg[:, None, :], 1.0)
    s = s + (cfg.mask_value * pair)[:, None, :, :]
    if cfg.softmax_clamp:
        s = jnp.minimum(s, 80.0)
    p = jax.nn.softmax(s, axis=-1)
    cls_row = jnp.mean(p, axis=1)[:, 0, :]
    o = jnp.einsum("bhqk,bhkd->bhqd", p, v, preferred_element_type=cfg.dtype)
    return o.transpose(0, 2, 1, 3).reshape(b, n, h * dh), cls_row
