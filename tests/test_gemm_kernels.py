"""Fused MLP / int8 GEMM Pallas kernels (kernels/gemm.py) vs the XLA
reference math, interpret mode on CPU."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from vision_transformer_cam_tpu import configs  # noqa: E402
from vision_transformer_cam_tpu.kernels.gemm import (  # noqa: E402
    linear_int8_fused, mlp_fused, mlp_fused_int8)
from vision_transformer_cam_tpu.models import vit  # noqa: E402
from vision_transformer_cam_tpu.ops.quant import (  # noqa: E402
    calibrate_act_scales, qlinear, quantize_params, quantize_weight)

C, HID = 64, 128


def _weights(key):
    ks = jax.random.split(key, 4)
    w1 = jax.random.normal(ks[0], (C, HID), jnp.float32) * 0.1
    b1 = jax.random.normal(ks[1], (HID,), jnp.float32) * 0.01
    w2 = jax.random.normal(ks[2], (HID, C), jnp.float32) * 0.1
    b2 = jax.random.normal(ks[3], (C,), jnp.float32) * 0.01
    return w1, b1, w2, b2


@pytest.mark.parametrize("gelu_approx", [False, True])
def test_mlp_fused_matches_xla(gelu_approx):
    x = jax.random.normal(jax.random.key(9), (3, 37, C), jnp.float32)
    w1, b1, w2, b2 = _weights(jax.random.key(0))
    ref = jnp.dot(jax.nn.gelu(jnp.dot(x, w1) + b1,
                              approximate=gelu_approx), w2) + b2
    got = mlp_fused(x, w1, b1, w2, b2, gelu_approx=gelu_approx,
                    block_m=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_mlp_fused_int8_matches_qlinear_chain():
    """The fused int8 MLP must be bit-equivalent to the XLA qlinear chain
    (same static scales, same round/clip semantics)."""
    x = jax.random.normal(jax.random.key(9), (2, 50, C), jnp.float32)
    w1, b1, w2, b2 = _weights(jax.random.key(1))
    q1, q2 = quantize_weight(w1), quantize_weight(w2)
    a1, a2 = 0.05, 0.03
    h = jax.nn.gelu(qlinear(x, dict(q1, act_scale=jnp.float32(a1)), b1,
                            out_dtype=jnp.float32), approximate=True)
    ref = qlinear(h, dict(q2, act_scale=jnp.float32(a2)), b2,
                  out_dtype=jnp.float32)
    cs1 = (q1["scale"].reshape(1, -1) * a1).astype(jnp.float32)
    cs2 = (q2["scale"].reshape(1, -1) * a2).astype(jnp.float32)
    got = mlp_fused_int8(x, q1["kernel_q"], cs1, b1, q2["kernel_q"], cs2, b2,
                         1.0 / a1, 1.0 / a2, gelu_approx=True, block_m=32,
                         out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_linear_int8_fused_matches_qlinear():
    x = jax.random.normal(jax.random.key(3), (5, 11, C), jnp.float32)
    w1, b1, _, _ = _weights(jax.random.key(2))
    q1 = quantize_weight(w1)
    a1 = 0.04
    ref = qlinear(x, dict(q1, act_scale=jnp.float32(a1)), b1,
                  out_dtype=jnp.float32)
    cs = (q1["scale"].reshape(1, -1) * a1).astype(jnp.float32)
    got = linear_int8_fused(x, q1["kernel_q"], cs, b1, 1.0 / a1, block_m=32,
                            out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_linear_int8_fused_none_bias():
    """qkv_bias=False trees store bias=None — the fused kernel must treat it
    as zeros instead of crashing on None.astype (review finding)."""
    x = jax.random.normal(jax.random.key(3), (4, 9, C), jnp.float32)
    w1, _, _, _ = _weights(jax.random.key(2))
    q1 = quantize_weight(w1)
    a1 = 0.04
    ref = qlinear(x, dict(q1, act_scale=jnp.float32(a1)), None,
                  out_dtype=jnp.float32)
    cs = (q1["scale"].reshape(1, -1) * a1).astype(jnp.float32)
    got = linear_int8_fused(x, q1["kernel_q"], cs, None, 1.0 / a1,
                            block_m=32, out_dtype=jnp.float32,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


TINY = configs.ViTCAMConfig(img_size=32, patch_size=8, embed_dim=64, depth=3,
                            num_heads=4, num_classes=5, mask_from=1,
                            top_k_patches=4)


def test_model_mlp_fusion_matches_default():
    """Full model with mlp_fusion on == default path (float weights)."""
    params = vit.init(TINY, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3), jnp.float32)
    base = vit.forward(params, x, TINY, need_rollout=True)
    fused = vit.forward(params, x, TINY.replace(mlp_fusion=True),
                        need_rollout=True)
    np.testing.assert_allclose(np.asarray(fused.logits),
                               np.asarray(base.logits), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fused.rollout_row),
                               np.asarray(base.rollout_row), atol=1e-6)


def test_model_int8_fused_matches_xla_int8():
    """int8_fused_gemm + mlp_fusion must reproduce the XLA qlinear int8
    serving path exactly (same static scales)."""
    params = vit.init(TINY, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3), jnp.float32)
    scales = calibrate_act_scales(params, TINY, x)
    qp = quantize_params(params, act_scales=scales)
    base = vit.forward(qp, x, TINY, need_rollout=True)
    cfgf = TINY.replace(int8_fused_gemm=True, mlp_fusion=True)
    fused = vit.forward(qp, x, cfgf, need_rollout=True)
    np.testing.assert_allclose(np.asarray(fused.logits),
                               np.asarray(base.logits), atol=1e-4)
    np.testing.assert_allclose(np.asarray(fused.rollout_row),
                               np.asarray(base.rollout_row), atol=1e-5)


def test_ln_quant_matches_layernorm_then_quantize():
    """kernels/gemm.ln_quant == _layer_norm (f32) followed by the static
    quantize, bit-exact in interpret mode."""
    from vision_transformer_cam_tpu.kernels.gemm import ln_quant
    from vision_transformer_cam_tpu.models.vit import _layer_norm
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((3, 41, C)) * 2.0, jnp.float32)
    g = jnp.asarray(1.0 + 0.1 * rng.standard_normal(C), jnp.float32)
    b = jnp.asarray(0.05 * rng.standard_normal(C), jnp.float32)
    a = 0.037
    got = ln_quant(x, g, b, eps=1e-6, inv_a=1.0 / a, block_m=32,
                   interpret=True)
    assert got.dtype == jnp.int8
    y = _layer_norm(x, g, b, 1e-6)
    ref = jnp.clip(jnp.round(y / a), -127, 127).astype(jnp.int8)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_model_ln_quant_fusion_matches_unfused_int8():
    """Full int8-attn-I/O serving model with ln_quant_fusion: same numbers
    as the unfused int8 path (both quantize LN output with the same static
    scale; only the materialization changes — the bf16 LN math runs in f32
    inside the kernel, so allow quantum-level drift)."""
    params = vit.init(TINY, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3), jnp.float32)
    scales = calibrate_act_scales(params, TINY, x)
    qp = quantize_params(params, act_scales=scales)
    cfg = TINY.replace(attn_impl="pallas", int8_attn_io=True)
    base = vit.forward(qp, x, cfg, need_rollout=True)
    fused = vit.forward(qp, x, cfg.replace(ln_quant_fusion=True),
                        need_rollout=True)
    a = np.asarray(base.logits).ravel()
    g = np.asarray(fused.logits).ravel()
    cos = (a @ g) / (np.linalg.norm(a) * np.linalg.norm(g))
    assert cos > 0.999
    np.testing.assert_allclose(np.asarray(fused.rollout_row),
                               np.asarray(base.rollout_row), atol=2e-2)
    # training / float params: the knob must be a no-op, not a crash
    plain = vit.forward(params, x, TINY.replace(ln_quant_fusion=True))
    np.testing.assert_allclose(np.asarray(plain.logits),
                               np.asarray(vit.forward(params, x,
                                                      TINY).logits),
                               atol=1e-6)
