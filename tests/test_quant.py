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


def test_int8_attn_io_kernel_matches_dequant_reference():
    """masked_attention_fused with int8 qkv (+scales) == dequantize-then-
    float-attention followed by int8 output quantization, interpret mode."""
    from vision_transformer_cam_tpu.kernels.attention import (
        masked_attention_fused)
    rng = np.random.default_rng(11)
    b, h, n, dh = 2, 4, 37, 16
    c = h * dh
    qkv_i8 = jnp.asarray(rng.integers(-127, 128, (b, n, 3 * c)), jnp.int8)
    bg = jnp.asarray(rng.random((b, n)) < 0.3, jnp.float32)
    bg = bg.at[:, 0].set(0.0)
    sq, sk, sv, s_out = 0.011, 0.017, 0.023, 0.05
    scales = jnp.asarray([sq, sk, sv, 1.0 / s_out], jnp.float32)
    got, cls_got = masked_attention_fused(
        qkv_i8, bg, None, scales, num_heads=h, scale=0.25,
        float_dtype=jnp.float32, interpret=True)
    assert got.dtype == jnp.int8

    # float reference on the dequantized operands
    qkv_f = np.asarray(qkv_i8, np.float32)
    q = (qkv_f[:, :, :c] * sq).reshape(b, n, h, dh).transpose(0, 2, 1, 3)
    k = (qkv_f[:, :, c:2 * c] * sk).reshape(b, n, h, dh).transpose(0, 2, 1, 3)
    v = (qkv_f[:, :, 2 * c:] * sv).reshape(b, n, h, dh).transpose(0, 2, 1, 3)
    s = np.einsum("bhqd,bhkd->bhqk", q, k) * 0.25
    pair = np.minimum(np.asarray(bg)[:, :, None] + np.asarray(bg)[:, None, :],
                      1.0)
    s = s + (-100.0 * pair)[:, None]
    e = np.exp(s - s.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    out = np.einsum("bhqk,bhkd->bhqd", p, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
    ref_i8 = np.clip(np.round(out / s_out), -127, 127).astype(np.int8)
    # the kernel runs PV with bf16 probabilities (as the bf16 serving path
    # does), so a small fraction of outputs sits one quantum off the f32
    # reference; never more than one
    diff = np.abs(np.asarray(got, np.int32) - ref_i8.astype(np.int32))
    assert (diff <= 1).all()
    assert (diff == 0).mean() > 0.97
    cls_ref = p.mean(1)[:, 0, :]
    np.testing.assert_allclose(np.asarray(cls_got), cls_ref, atol=1e-5)


def test_int8_attn_io_long_sequence_qblock_auto():
    """At N > 512 the int8 kernel auto-resolves q_block 384 (no fused joint
    — the rollout_post serving default) or 224 (joint fused in-kernel, the
    --rollout-carry fallback).  Both branches must execute (ragged tail
    blocks: 577 = 384+193 and 224+224+129) and agree: query rows are
    independent across q-blocks, so outputs match to fp noise and the fused
    joint update equals (hm + I) / 2 when J_{l-1} = I."""
    from vision_transformer_cam_tpu.kernels.attention import (
        masked_attention_fused)
    rng = np.random.default_rng(21)
    b, h, n, dh = 1, 2, 577, 8
    c = h * dh
    qkv_i8 = jnp.asarray(rng.integers(-127, 128, (b, n, 3 * c)), jnp.int8)
    bg = jnp.asarray(rng.random((b, n)) < 0.3, jnp.float32)
    bg = bg.at[:, 0].set(0.0)
    scales = jnp.asarray([0.011, 0.017, 0.023, 1.0 / 0.05], jnp.float32)
    out_a, cls_a, hm = masked_attention_fused(
        qkv_i8, bg, None, scales, num_heads=h, scale=dh ** -0.5,
        with_headmean=True, hm_dtype=jnp.float32,
        float_dtype=jnp.float32, interpret=True)
    eye = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32), (b, n, n))
    out_b, cls_b, newj = masked_attention_fused(
        qkv_i8, bg, eye, scales, num_heads=h, scale=dh ** -0.5,
        float_dtype=jnp.float32, interpret=True)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
    np.testing.assert_allclose(np.asarray(cls_a), np.asarray(cls_b),
                               atol=1e-6)
    want_j = (np.asarray(hm) + np.eye(n, dtype=np.float32)) / 2.0
    np.testing.assert_allclose(np.asarray(newj), want_j, atol=1e-6)


def test_int8_attn_io_per_head_scales_kernel():
    """Per-head scales form [3H+1]: the kernel dequantizes each head's
    q/k/v slice with its own scale — numerically equal to the dequantized
    float reference, and strictly more accurate than per-tensor scales
    when head magnitudes differ (the round-2 CAM-fidelity lever)."""
    from vision_transformer_cam_tpu.kernels.attention import (
        masked_attention_fused)
    rng = np.random.default_rng(13)
    b, h, n, dh = 2, 4, 23, 16
    c = h * dh
    # heads with wildly different magnitudes: per-tensor absmax wastes the
    # int8 range of the small heads
    head_mag = np.array([0.05, 0.4, 1.0, 3.0])
    qkv_f = rng.standard_normal((b, n, 3, h, dh)).astype(np.float32) \
        * head_mag[None, None, None, :, None]
    amax = np.abs(qkv_f).max(axis=(0, 1, 4))            # [3, H]
    sc_head = amax / 127.0                              # per-head
    sc_tensor = amax.max(axis=1, keepdims=True) / 127.0  # per-tensor

    def quantize(f, sc):
        return np.clip(np.round(f / sc[None, None, :, :, None]),
                       -127, 127).astype(np.int8)

    bg = jnp.zeros((b, n), jnp.float32)
    s_out = 0.05

    def run(qkv_q, scales_vec):
        flat = jnp.asarray(
            qkv_q.transpose(0, 1, 2, 3, 4).reshape(b, n, 3 * c), jnp.int8)
        return masked_attention_fused(
            flat, bg, None, jnp.asarray(scales_vec, jnp.float32),
            num_heads=h, scale=0.25, float_dtype=jnp.float32,
            interpret=True)

    # float truth on the UNquantized values; the CAM-relevant quantity is
    # cls_row (the head-MEAN softmax row — every head contributes equally,
    # so small-magnitude heads crushed by a per-tensor scale dominate its
    # error; the int8 OUTPUT error is instead dominated by the s_out
    # quantum, identical under both scale forms)
    q, k, v = (qkv_f[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    s = np.einsum("bhqd,bhkd->bhqk", q, k) * 0.25
    e = np.exp(s - s.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    cls_truth = p.mean(1)[:, 0, :]

    errs = {}
    for name, sc in (("head", sc_head), ("tensor", sc_tensor)):
        qq = quantize(qkv_f, sc if name == "head"
                      else np.broadcast_to(sc_tensor, amax.shape))
        if name == "head":
            vec = np.concatenate([sc[0], sc[1], sc[2], [1.0 / s_out]])
        else:
            vec = np.array([sc_tensor[0, 0], sc_tensor[1, 0],
                            sc_tensor[2, 0], 1.0 / s_out])
        _, cls_got = run(qq, vec)
        errs[name] = np.abs(np.asarray(cls_got) - cls_truth).mean()

        # scale-indexing parity: the kernel on quantized operands must
        # equal float attention on the DEQUANTIZED operands (a mixed-up
        # sq/sk/sv slot would blow this up by orders of magnitude)
        scb = sc if name == "head" else np.broadcast_to(sc_tensor,
                                                        amax.shape)
        deq = qq.astype(np.float32) * scb[None, None, :, :, None]
        qd, kd, vd = (deq[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        sd = np.einsum("bhqd,bhkd->bhqk", qd, kd) * 0.25
        ed = np.exp(sd - sd.max(-1, keepdims=True))
        pd = ed / ed.sum(-1, keepdims=True)
        np.testing.assert_allclose(np.asarray(cls_got),
                                   pd.mean(1)[:, 0, :], atol=1e-5,
                                   err_msg=name)
    # per-head quantization reconstructs the rollout row measurably better
    # (the margin grows with head-magnitude spread; end-to-end CAM deltas
    # on trained weights are measured by scripts/quality_eval.py)
    assert errs["head"] < 0.8 * errs["tensor"], errs


def test_int8_attn_io_model_forward_close():
    """Full model with cfg.int8_attn_io: same accuracy class as plain int8
    quantization; CAM machinery runs; output plumbing intact."""
    params = vit.init(TINY, jax.random.key(0))
    rng = np.random.default_rng(12)
    calib = jnp.asarray(rng.standard_normal((4, 32, 32, 3)), jnp.float32)
    scales = quant.calibrate_act_scales(params, TINY, calib)
    # per-head (q, k, v) output scales [depth, 3, H]
    assert scales["blocks"]["qkv_out"].shape == (TINY.depth, 3,
                                                 TINY.num_heads)
    qparams = quant.quantize_params(params, act_scales=scales)
    assert qparams["blocks"]["attn"]["qkv"]["out_scales"].shape == \
        (TINY.depth, 3, TINY.num_heads)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    cfg = TINY.replace(attn_impl="pallas", int8_attn_io=True)
    ref = vit.apply(params, x, TINY, need_rollout=True)
    got = vit.apply(qparams, x, cfg, need_rollout=True)
    a = np.asarray(ref.logits).ravel()
    b = np.asarray(got.logits).ravel()
    cos = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.99
    assert np.isfinite(np.asarray(got.rollout_row)).all()
    assert np.isfinite(np.asarray(got.head1_logits)).all()


def test_int8_attn_out_kernel_matches_quantized_float():
    """Output-only int8 (the int8_hifi lever): float qkv + scales=[1/s_out]
    must equal running the float kernel and quantizing its output — the
    probabilities (and cls row) are untouched by construction."""
    from vision_transformer_cam_tpu.kernels.attention import (
        masked_attention_fused)
    rng = np.random.default_rng(13)
    b, h, n, dh = 2, 4, 37, 16
    qkv = jnp.asarray(rng.standard_normal((b, n, 3 * h * dh)), jnp.float32)
    bg = jnp.asarray(rng.random((b, n)) < 0.3, jnp.float32)
    bg = bg.at[:, 0].set(0.0)
    s_out = 0.04
    ref_f, cls_f = masked_attention_fused(qkv, bg, num_heads=h, scale=0.25,
                                          interpret=True)
    got, cls_got = masked_attention_fused(
        qkv, bg, None, jnp.asarray([1.0 / s_out], jnp.float32),
        num_heads=h, scale=0.25, interpret=True)
    assert got.dtype == jnp.int8
    # reference quantization in the kernel's own form — f32 multiply by the
    # reciprocal — so the bit-exact compare can't flip on a .5 boundary a
    # ~1-ulp-different `/ s_out` would straddle (review finding)
    ref_i8 = np.clip(np.round(np.asarray(ref_f, np.float32)
                              * np.float32(1.0 / s_out)),
                     -127, 127).astype(np.int8)
    np.testing.assert_array_equal(np.asarray(got), ref_i8)
    np.testing.assert_array_equal(np.asarray(cls_got), np.asarray(cls_f))


def test_int8_attn_out_model_forward_close():
    """Full model with cfg.int8_attn_out (int8_hifi serving): pallas path
    emits int8 straight into the int8 proj GEMM; accuracy class unchanged
    and the rollout/in-scan CAM machinery still runs."""
    params = vit.init(TINY, jax.random.key(0))
    rng = np.random.default_rng(14)
    calib = jnp.asarray(rng.standard_normal((4, 32, 32, 3)), jnp.float32)
    scales = quant.calibrate_act_scales(params, TINY, calib)
    qparams = quant.quantize_params(params, act_scales=scales)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    ref = vit.apply(params, x, TINY, need_rollout=True)
    cfg = TINY.replace(attn_impl="pallas", int8_attn_out=True)
    got = vit.apply(qparams, x, cfg, need_rollout=True)
    a = np.asarray(ref.logits).ravel()
    b = np.asarray(got.logits).ravel()
    cos = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.99
    assert np.isfinite(np.asarray(got.rollout_row)).all()
    # and it matches the same quantized tree on the XLA path (which rounds
    # the proj input from the float output — the same int8 grid) closely
    xla = vit.apply(qparams, x, TINY.replace(int8_attn_out=True),
                    need_rollout=True)
    np.testing.assert_allclose(np.asarray(got.logits),
                               np.asarray(xla.logits), atol=2e-2)


def test_int8_serving_distilled_model():
    """Distilled (cls+dist) config through the full int8 serving path:
    calibration walks the distilled graph (num_tokens=2 prefix), head_dist
    stays float, and the pallas int8 forward holds the float path's
    accuracy class — the serving tier x distillation cross-term."""
    cfg = TINY.replace(distilled=True)
    params = vit.init(cfg, jax.random.key(1))
    rng = np.random.default_rng(15)
    calib = jnp.asarray(rng.standard_normal((4, 32, 32, 3)), jnp.float32)
    scales = quant.calibrate_act_scales(params, cfg, calib)
    qparams = quant.quantize_params(params, act_scales=scales)
    assert "kernel_q" not in qparams["head_dist"]
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    ref = vit.apply(params, x, cfg, need_rollout=True)
    got = vit.apply(qparams, x,
                    cfg.replace(attn_impl="pallas", int8_attn_io=True),
                    need_rollout=True)
    a = np.asarray(ref.logits).ravel()
    b = np.asarray(got.logits).ravel()
    cos = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.99
    assert np.isfinite(np.asarray(got.rollout_row)).all()
    assert got.rollout_row.shape[-1] == 16 + 2  # 4x4 grid + cls + dist


def test_apply_serving_mode():
    """serving.apply_serving_mode: the one-call production config — 'off'
    is identity, 'bf16'/'int8' stay in the f32 path's accuracy class, and
    'int8' without calibration images raises instead of silently falling
    back to the slower dynamic quantization."""
    from vision_transformer_cam_tpu import serving
    params = vit.init(TINY, jax.random.key(0))
    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    calib = jnp.asarray(rng.standard_normal((4, 32, 32, 3)), jnp.float32)

    p0, c0 = serving.apply_serving_mode(params, TINY, "off")
    assert c0 is TINY and p0 is params
    ref = vit.apply(params, x, TINY)

    with pytest.raises(ValueError, match="calib_images"):
        serving.apply_serving_mode(params, TINY, "int8")
    with pytest.raises(ValueError, match="serving mode"):
        serving.apply_serving_mode(params, TINY, "fp8")

    for mode in ("bf16", "int8", "int8_hifi"):
        p, c = serving.apply_serving_mode(params, TINY, mode,
                                          calib_images=calib)
        assert c.dtype == jnp.bfloat16
        # attn_impl resolves by backend (pallas on TPU, xla elsewhere —
        # interpret-mode pallas would be a silent orders-of-magnitude trap)
        assert c.attn_impl == ("pallas" if jax.default_backend() == "tpu"
                               else "xla")
        # int8_hifi: W8A8 GEMMs but the attention core stays float; the
        # kernel still emits its OUTPUT pre-quantized for the proj GEMM
        assert c.int8_attn_io == (mode == "int8")
        assert c.int8_attn_out == (mode == "int8_hifi")
        if mode.startswith("int8"):
            assert "kernel_q" in p["blocks"]["mlp"]["fc1"]
            assert "act_scale" in p["blocks"]["mlp"]["fc1"]
        got = vit.apply(p, x, c)
        a = np.asarray(ref.logits).ravel()
        b = np.asarray(got.logits).ravel()
        cos = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos > 0.99, mode


def test_bench_default_matches_serving_api():
    """bench.py's default-flag config (the headline 5 516 img/s number)
    must equal the product serving config users get from
    serving.apply_serving_mode('int8') — bench assembles it from ablation
    flags, so this pins the two paths against drift.  attn_impl is
    excluded: bench always targets the TPU kernel, the API resolves by
    the live backend."""
    import sys
    sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
    import bench
    from vision_transformer_cam_tpu import serving

    base = configs.vit_base_patch16_224_in21k(num_classes=20).replace(
        representation_size=None)
    for flags, mode in ((["bench.py"], "int8"),
                        (["bench.py", "--int8-hifi"], "int8_hifi")):
        bench_cfg, use_int8 = bench.build_cfg(flags)
        assert use_int8
        api_cfg = serving.serving_config(base, mode)
        bench_d = dict(vars(bench_cfg))
        api_d = dict(vars(api_cfg))
        bench_d.pop("attn_impl"), api_d.pop("attn_impl")
        assert bench_d == api_d, mode

    # >640-token regime: the "int8" tier auto-routes attention through the
    # output-only int8 kernel (faster AND higher fidelity at N=1025 —
    # BENCHMARKS "ViT-L/16@512"); bench's default flags must agree.
    long_base = configs.vit_large_patch16_512(num_classes=20).replace(
        representation_size=None)
    bench_long, _ = bench.build_cfg(
        ["bench.py", "--model", "vit_large_patch16_512"])
    api_long = serving.serving_config(long_base, "int8")
    assert api_long.int8_attn_out and not api_long.int8_attn_io
    assert bench_long.int8_attn_out and not bench_long.int8_attn_io
    bd, ad = dict(vars(bench_long)), dict(vars(api_long))
    bd.pop("attn_impl"), ad.pop("attn_impl")
    assert bd == ad


def test_serving_mask_norm_is_per_sample_and_batch_invariant():
    """Serving semantics (round 4): the reference VALIDATES at batch_size=1
    (validate.py:98), where its global-max mask normalization
    (vit_model.py:335,372) is the per-sample max — so serving_config sets
    per_sample_mask_norm=True for every non-off mode, which (a) reproduces
    the reference's per-image validate on a batched server and (b) makes
    outputs independent of batch composition.  Batch-global coupling is
    real: an image whose cls-attention peak is below mask_threshold x the
    batch max has its whole patch set bg-masked by a co-batched image."""
    from vision_transformer_cam_tpu import serving

    for mode in ("bf16", "int8", "int8_hifi"):
        assert serving.serving_config(TINY, mode).per_sample_mask_norm, mode

    cfg = TINY.replace(per_sample_mask_norm=True)
    params = vit.init(cfg, jax.random.key(0))
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    # a dominant-peak partner image: batch-global normalization would
    # rescale image a's mask by b's (much larger) peak
    b = jnp.asarray(10.0 * rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    solo = vit.apply(params, a, cfg, need_rollout=True)
    both = vit.apply(params, jnp.concatenate([a, b]), cfg, need_rollout=True)
    np.testing.assert_allclose(np.asarray(both.logits[:1]),
                               np.asarray(solo.logits), rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(both.rollout_row[:1]),
                               np.asarray(solo.rollout_row),
                               rtol=0, atol=1e-5)
    # and the batch-global coupling is real at the mask level: a weak-peak
    # image co-batched with a strong-peak one is ENTIRELY bg-masked under
    # batch-global normalization, untouched under per-sample (random-weight
    # whole-model rows are too uniform to show this, so pin the unit)
    g = TINY.replace(per_sample_mask_norm=False)
    n = TINY.seq_len
    weak = np.full((n,), 0.01, np.float32)
    weak[5] = 0.1                       # its own peak: nothing < 0.25*peak*4
    strong = np.full((n,), 0.01, np.float32)
    strong[7] = 1.0
    rows = jnp.asarray(np.stack([weak, strong]))
    _, bg_global = vit._mask_from_cls_row(rows, g)
    _, bg_per = vit._mask_from_cls_row(rows, cfg)
    assert np.asarray(bg_global)[0, 1:].all()     # weak image fully wiped
    assert not np.asarray(bg_per)[0, 1:].all()    # per-sample keeps its fg
