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

    x: [..., in] any float dtype; qp: quantize_weight output (supports a
    leading stacked-layer axis on kernel_q/scale when x carries no such
    axis — the lax.scan per-layer slice case is handled by the caller).
    """
    sx = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-8) / 127.0
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


_QUANT_KEYS = ("qkv", "proj", "fc1", "fc2")


def quantize_params(params):
    """Return a copy of the model pytree with the per-block GEMM kernels and
    the patch-embed kernel replaced by int8 dicts (models/vit._linear
    dispatches on the 'kernel_q' key)."""
    import copy
    out = copy.deepcopy(jax.tree.map(lambda x: x, params))

    def q(node):
        return dict(quantize_weight(node["kernel"]), bias=node["bias"])

    out["patch_embed"] = q(params["patch_embed"])
    blocks = params["blocks"]
    out["blocks"]["attn"]["qkv"] = q(blocks["attn"]["qkv"])
    out["blocks"]["attn"]["proj"] = q(blocks["attn"]["proj"])
    out["blocks"]["mlp"]["fc1"] = q(blocks["mlp"]["fc1"])
    out["blocks"]["mlp"]["fc2"] = q(blocks["mlp"]["fc2"])
    return out
