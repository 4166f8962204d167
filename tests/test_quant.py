"""Int8 W8A8 serving path: quantization units + quantized forward sanity."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from vision_transformer_cam_tpu import configs  # noqa: E402
from vision_transformer_cam_tpu.models import vit  # noqa: E402
from vision_transformer_cam_tpu.ops import quant  # noqa: E402

TINY = configs.ViTCAMConfig(img_size=32, patch_size=8, embed_dim=64, depth=6,
                            num_heads=4, num_classes=20, mask_from=2,
                            top_k_patches=4)


def test_quantize_weight_roundtrip():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((32, 48)), jnp.float32)
    qp = quant.quantize_weight(w)
    assert qp["kernel_q"].dtype == jnp.int8
    assert qp["scale"].shape == (1, 48)
    deq = qp["kernel_q"].astype(jnp.float32) * qp["scale"]
    # per-channel 8-bit quantization error <= scale/2
    err = np.abs(np.asarray(deq - w))
    bound = np.asarray(qp["scale"])[0] / 2 + 1e-7
    assert (err <= bound[None, :]).all()


def test_quantize_weight_stacked_per_layer_scales():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((3, 16, 8)).astype(np.float32)
    w[1] *= 100.0  # one layer with much larger weights
    qp = quant.quantize_weight(jnp.asarray(w))
    assert qp["scale"].shape == (3, 1, 8)
    s = np.asarray(qp["scale"])
    assert (s[1] > 10 * s[0]).all()  # scales independent per layer


def test_qlinear_close_to_float():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 10, 32)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((32, 24)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((24,)), jnp.float32)
    want = np.asarray(x @ w + b)
    got = np.asarray(quant.qlinear(x, quant.quantize_weight(w), b,
                                   out_dtype=jnp.float32))
    # int8 x int8: relative error ~1%
    denom = np.abs(want).mean()
    assert np.abs(got - want).mean() / denom < 0.02


def test_quantized_model_forward_close():
    params = vit.init(TINY, jax.random.key(0))
    qparams = quant.quantize_params(params)
    assert qparams["blocks"]["attn"]["qkv"]["kernel_q"].dtype == jnp.int8
    assert "kernel" in qparams["head1"]  # heads stay float
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    ref = vit.apply(params, x, TINY)
    got = vit.apply(qparams, x, TINY)
    a = np.asarray(ref.logits).ravel()
    b = np.asarray(got.logits).ravel()
    cos = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.99
    assert np.isfinite(np.asarray(got.head1_logits)).all()
    # CAM machinery still runs under quantization
    out = vit.apply(qparams, x, TINY, need_rollout=True)
    assert np.isfinite(np.asarray(out.rollout_row)).all()


def test_static_calibrated_quantization():
    """Static activation scales: same accuracy class as dynamic, no runtime
    absmax reduction."""
    params = vit.init(TINY, jax.random.key(0))
    rng = np.random.default_rng(8)
    calib = jnp.asarray(rng.standard_normal((4, 32, 32, 3)), jnp.float32)
    scales = quant.calibrate_act_scales(params, TINY, calib)
    assert scales["blocks"]["qkv"].shape == (TINY.depth,)
    assert (np.asarray(scales["blocks"]["fc2"]) > 0).all()
    qparams = quant.quantize_params(params, act_scales=scales)
    assert "act_scale" in qparams["blocks"]["mlp"]["fc1"]
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    ref = vit.apply(params, x, TINY)
    got = vit.apply(qparams, x, TINY)
    a = np.asarray(ref.logits).ravel()
    b = np.asarray(got.logits).ravel()
    cos = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.99
