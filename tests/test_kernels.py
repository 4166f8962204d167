"""Pallas kernel vs XLA-oracle parity (interpret mode on CPU)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from vision_transformer_cam_tpu import configs  # noqa: E402
from vision_transformer_cam_tpu.kernels import attention as ka  # noqa: E402
from vision_transformer_cam_tpu.models import vit  # noqa: E402

TINY = configs.ViTCAMConfig(img_size=32, patch_size=8, embed_dim=64, depth=6,
                            num_heads=4, num_classes=20, mask_from=2,
                            top_k_patches=4)


def _qkv(b=2, h=4, n=37, dh=16, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.standard_normal((b, h, n, dh)),
                             jnp.float32)
    q, k, v = mk(), mk(), mk()
    bg = jnp.asarray((rng.random((b, n)) < 0.3), jnp.float32)
    bg = bg.at[:, 0].set(0.0)  # cls token never background
    return q, k, v, bg


def _oracle(q, k, v, bg, scale, mask_value=-100.0):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    pair = jnp.minimum(bg[:, :, None] + bg[:, None, :], 1.0)
    s = s + (mask_value * pair)[:, None]
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, v)
    return out, jnp.mean(p, axis=1)[:, 0, :]


def test_masked_attention_kernel_matches_oracle():
    q, k, v, bg = _qkv()
    out, cls = ka.masked_attention(q, k, v, bg, scale=0.25, interpret=True)
    want_out, want_cls = _oracle(q, k, v, bg, 0.25)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want_out),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(cls), np.asarray(want_cls),
                               atol=1e-6)
    # cls rows are probability vectors
    np.testing.assert_allclose(np.asarray(jnp.sum(cls, -1)), 1.0, atol=1e-5)


def test_masked_attention_no_mask_case():
    q, k, v, _ = _qkv(seed=3)
    bg = jnp.zeros(q.shape[0::3][:1] + (q.shape[2],))  # [B, N] zeros
    bg = jnp.zeros((q.shape[0], q.shape[2]), jnp.float32)
    out, cls = ka.masked_attention(q, k, v, bg, scale=0.125, interpret=True)
    want_out, want_cls = _oracle(q, k, v, bg, 0.125)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want_out),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(cls), np.asarray(want_cls),
                               atol=1e-6)


def test_masked_attention_fused_matches_oracle():
    """v2 kernel (fused qkv in, [B,N,C] out) vs the split-tensor oracle."""
    q, k, v, bg = _qkv(b=2, h=4, n=37, dh=16, seed=21)
    b, h, n, dh = q.shape
    # pack as the qkv GEMM emits: [B, N, 3C], heads contiguous inside q|k|v
    pack = jnp.concatenate(
        [t.transpose(0, 2, 1, 3).reshape(b, n, h * dh) for t in (q, k, v)],
        axis=-1)
    out, cls = ka.masked_attention_fused(pack, bg, num_heads=h, scale=0.25,
                                         interpret=True)
    want_out, want_cls = _oracle(q, k, v, bg, 0.25)
    want_out = jnp.transpose(want_out, (0, 2, 1, 3)).reshape(b, n, h * dh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want_out),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(cls), np.asarray(want_cls),
                               atol=1e-6)
    out2, cls2, hm = ka.masked_attention_fused(
        pack, bg, num_heads=h, scale=0.25, with_headmean=True,
        interpret=True)
    np.testing.assert_allclose(np.asarray(hm[:, 0, :]), np.asarray(cls2),
                               atol=1e-6)


def test_masked_attention_fused_odd_batch_block_b():
    """block_b must auto-halve until it divides the batch (attention.py's
    `while b % block_b` guard): an odd batch with block_b=2 — reachable via
    a shard_map per-device shard or an undivisible val tail batch — must
    write EVERY image's rows, identically to block_b=1."""
    q, k, v, bg = _qkv(b=3, h=4, n=37, dh=16, seed=23)
    b, h, n, dh = q.shape
    pack = jnp.concatenate(
        [t.transpose(0, 2, 1, 3).reshape(b, n, h * dh) for t in (q, k, v)],
        axis=-1)
    out1, cls1 = ka.masked_attention_fused(pack, bg, num_heads=h, scale=0.25,
                                           block_b=1, interpret=True)
    out2, cls2 = ka.masked_attention_fused(pack, bg, num_heads=h, scale=0.25,
                                           block_b=2, interpret=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cls2), np.asarray(cls1), atol=1e-6)
    assert np.isfinite(np.asarray(out2)).all()


def test_full_model_pallas_path_matches_xla():
    """End-to-end: cfg.attn_impl='pallas' must reproduce the XLA forward
    (logits, head1, cls rows) on the tiny model."""
    params = vit.init(TINY, jax.random.key(0))
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    ref = vit.apply(params, x, TINY)
    got = vit.apply(params, x, TINY.replace(attn_impl="pallas"))
    np.testing.assert_allclose(np.asarray(got.logits),
                               np.asarray(ref.logits), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got.head1_logits),
                               np.asarray(ref.head1_logits), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got.attn_cls_rows),
                               np.asarray(ref.attn_cls_rows), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got.top_patch_idx),
                                  np.asarray(ref.top_patch_idx))


def test_masked_attention_with_headmean():
    q, k, v, bg = _qkv(seed=5)
    out, cls, hm = ka.masked_attention(q, k, v, bg, scale=0.25,
                                       with_headmean=True, interpret=True)
    want_out, want_cls = _oracle(q, k, v, bg, 0.25)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * 0.25
    pair = jnp.minimum(bg[:, :, None] + bg[:, None, :], 1.0)
    want_hm = jnp.mean(jax.nn.softmax(s + (-100.0 * pair)[:, None], -1), 1)
    np.testing.assert_allclose(np.asarray(hm), np.asarray(want_hm), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cls), np.asarray(hm[:, 0, :]),
                               atol=1e-6)


def test_full_model_pallas_rollout_matches_xla():
    """need_rollout through the pallas path (kernel-emitted headmean feeding
    the in-scan joint product) == the XLA path."""
    params = vit.init(TINY, jax.random.key(1))
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    ref = vit.apply(params, x, TINY, need_rollout=True)
    got = vit.apply(params, x, TINY.replace(attn_impl="pallas"),
                    need_rollout=True)
    np.testing.assert_allclose(np.asarray(got.rollout_row),
                               np.asarray(ref.rollout_row), atol=1e-5)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_rollout_post_matches_carry(impl):
    """cfg.rollout_post (post-scan reversed vector chain over stacked
    head-mean matrices) == the in-scan joint carry, both impls."""
    params = vit.init(TINY, jax.random.key(1))
    rng = np.random.default_rng(14)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    cfg = TINY if impl == "xla" else TINY.replace(attn_impl="pallas")
    ref = vit.apply(params, x, cfg, need_rollout=True)
    got = vit.apply(params, x, cfg.replace(rollout_post=True),
                    need_rollout=True)
    np.testing.assert_allclose(np.asarray(got.rollout_row),
                               np.asarray(ref.rollout_row), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.logits),
                               np.asarray(ref.logits), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got.top_patch_idx),
                                  np.asarray(ref.top_patch_idx))


def test_rollout_post_auto_long_sequence():
    """rollout_post=None (the default) auto-selects the post-scan chain at
    N > 512 — exercised on a 577-token config (img 384 / patch 16, ViT-L@384
    token count) — and both explicit settings match it exactly."""
    cfg = configs.ViTCAMConfig(img_size=384, patch_size=16, embed_dim=32,
                               depth=2, num_heads=2, num_classes=20,
                               mask_from=1, top_k_patches=4)
    assert cfg.rollout_post is None
    params = vit.init(cfg, jax.random.key(2))
    rng = np.random.default_rng(15)
    x = jnp.asarray(rng.standard_normal((1, 384, 384, 3)), jnp.float32)
    auto = vit.apply(params, x, cfg, need_rollout=True)
    post = vit.apply(params, x, cfg.replace(rollout_post=True),
                     need_rollout=True)
    carry = vit.apply(params, x, cfg.replace(rollout_post=False),
                      need_rollout=True)
    # auto must be bit-identical to the explicit post path (same program)
    np.testing.assert_array_equal(np.asarray(auto.rollout_row),
                                  np.asarray(post.rollout_row))
    np.testing.assert_allclose(np.asarray(auto.rollout_row),
                               np.asarray(carry.rollout_row), atol=1e-5)


def test_pallas_train_step_grads_match_xla():
    """Training through the Pallas path (custom VJP, XLA-recompute backward)
    must produce the same gradients as the pure-XLA path."""
    from vision_transformer_cam_tpu.ops.losses import dual_head_loss

    params = vit.init(TINY, jax.random.key(3))
    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    y = jnp.zeros((2, 20)).at[:, 3].set(1.0)

    def loss(p, cfg):
        out = vit.forward(p, x, cfg, train=True, rng=jax.random.key(0))
        return dual_head_loss(out.logits, out.head1_logits, y)[0]

    g_xla = jax.grad(loss)(params, TINY)
    g_pal = jax.grad(loss)(params, TINY.replace(attn_impl="pallas"))
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=2e-5), g_xla, g_pal)


def test_train_grad_through_rollout_pallas():
    """Differentiating a need_rollout training forward on the pallas path
    must route attention to the XLA fallback (the rollout-fused kernel has
    no VJP) and match the XLA path's gradients (review finding)."""
    params = vit.init(TINY, jax.random.key(4))
    rng = np.random.default_rng(19)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)

    def loss(p, cfg):
        out = vit.forward(p, x, cfg, train=True, rng=jax.random.key(2),
                          need_rollout=True)
        return jnp.sum(out.rollout_row.astype(jnp.float32) ** 2)

    g_xla = jax.grad(loss)(params, TINY)
    g_pal = jax.grad(loss)(params, TINY.replace(attn_impl="pallas"))
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=2e-5), g_xla, g_pal)


def test_pallas_path_falls_back_for_probs():
    """need_headmean forces the XLA path (full tensors requested)."""
    params = vit.init(TINY, jax.random.key(0))
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    got = vit.apply(params, x, TINY.replace(attn_impl="pallas"),
                    need_headmean=True)
    assert got.attn_headmean is not None
    np.testing.assert_allclose(
        np.asarray(got.attn_headmean[:, :, 0, :]),
        np.asarray(got.attn_cls_rows), atol=1e-6)


def test_masked_attention_fused_long_seq():
    """ViT-L@384 shape: N=577 (odd, non-128-aligned) through the v2 kernel."""
    q, k, v, bg = _qkv(b=1, h=2, n=577, dh=8, seed=31)
    b, h, n, dh = q.shape
    pack = jnp.concatenate(
        [t.transpose(0, 2, 1, 3).reshape(b, n, h * dh) for t in (q, k, v)],
        axis=-1)
    out, cls = ka.masked_attention_fused(pack, bg, num_heads=h, scale=0.25,
                                         interpret=True)
    want_out, want_cls = _oracle(q, k, v, bg, 0.25)
    want_out = jnp.transpose(want_out, (0, 2, 1, 3)).reshape(b, n, h * dh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want_out),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(cls), np.asarray(want_cls),
                               atol=1e-6)


def test_long_seq_single_qblock_under_scoped_vmem_marker(monkeypatch):
    """utils.tune_tpu_for_long_sequence: no-op at short N; at long N it sets
    LIBTPU_INIT_ARGS + the marker env, under which the kernel's auto
    q_block runs ONE block per image (504.5 vs 467.7 img/s at ViT-L@384,
    BENCHMARKS) — numerics must be unchanged."""
    from vision_transformer_cam_tpu import configs, utils
    # setenv-then-delenv (not bare delenv, which records nothing to undo
    # when the var is absent): tune_tpu_for_long_sequence sets these envs
    # directly, and they must NOT leak into later tests — a stale marker
    # would silently flip every subsequent n>512 kernel test onto the
    # single-q-block path
    for var in (utils.SCOPED_VMEM_MARKER, "LIBTPU_INIT_ARGS"):
        monkeypatch.setenv(var, "sentinel-restored-after-test")
        monkeypatch.delenv(var)
    short = configs.ViTCAMConfig(img_size=32, patch_size=8, embed_dim=64,
                                 depth=2, num_heads=2, num_classes=5)
    assert not utils.tune_tpu_for_long_sequence(short)
    assert "LIBTPU_INIT_ARGS" not in __import__("os").environ

    long_cfg = configs.vit_large_patch16_384()
    assert utils.tune_tpu_for_long_sequence(long_cfg)
    import os
    assert "scoped_vmem_limit" in os.environ["LIBTPU_INIT_ARGS"]
    assert not utils.tune_tpu_for_long_sequence(long_cfg)  # idempotent

    # the marker flips auto q_block to n at long N — same numbers
    q, k, v, bg = _qkv(b=1, h=2, n=577, dh=8, seed=33)
    b, h, n, dh = q.shape
    pack = jnp.concatenate(
        [t.transpose(0, 2, 1, 3).reshape(b, n, h * dh) for t in (q, k, v)],
        axis=-1)
    out, cls = ka.masked_attention_fused(pack, bg, num_heads=h, scale=0.25,
                                         interpret=True)
    want_out, want_cls = _oracle(q, k, v, bg, 0.25)
    want_out = jnp.transpose(want_out, (0, 2, 1, 3)).reshape(b, n, h * dh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want_out),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(cls), np.asarray(want_cls),
                               atol=1e-6)


def test_clamp_softmax_matches_when_in_range():
    """clamp_softmax is bit-comparable to the stable softmax whenever logits
    stay within +-80 (always true for trained ViTs at scale 1/8)."""
    q, k, v, bg = _qkv(b=2, h=4, n=37, dh=16, seed=41)
    b, h, n, dh = q.shape
    pack = jnp.concatenate(
        [t.transpose(0, 2, 1, 3).reshape(b, n, h * dh) for t in (q, k, v)],
        axis=-1)
    a = ka.masked_attention_fused(pack, bg, num_heads=h, scale=0.25,
                                  interpret=True)
    c = ka.masked_attention_fused(pack, bg, num_heads=h, scale=0.25,
                                  clamp_softmax=True, interpret=True)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(c[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(c[1]), atol=1e-6)


def test_block_fusion_v3_matches_v2():
    """The opt-in whole-sub-block kernel (attn_block_fusion) reproduces the
    default pallas path, with and without fused rollout."""
    cfg2 = TINY.replace(attn_impl="pallas")
    cfg3 = cfg2.replace(attn_block_fusion=True)
    params = vit.init(TINY, jax.random.key(5))
    rng = np.random.default_rng(23)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    a = vit.apply(params, x, cfg2, need_rollout=True)
    b = vit.apply(params, x, cfg3, need_rollout=True)
    np.testing.assert_allclose(np.asarray(b.logits), np.asarray(a.logits),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(b.rollout_row),
                               np.asarray(a.rollout_row), atol=1e-5)
    np.testing.assert_allclose(np.asarray(b.attn_cls_rows),
                               np.asarray(a.attn_cls_rows), atol=1e-5)


def test_attention_bwd_kernel_matches_vjp():
    """The fused backward kernel == jax.vjp of the XLA attention core."""
    rng = np.random.default_rng(51)
    b, h, n, dh = 2, 4, 37, 16
    qkv = jnp.asarray(rng.standard_normal((b, n, 3 * h * dh)), jnp.float32)
    bg = jnp.asarray((rng.random((b, n)) < 0.3), jnp.float32).at[:, 0].set(0)
    d_out = jnp.asarray(rng.standard_normal((b, n, h * dh)), jnp.float32)

    got = ka.masked_attention_bwd(qkv, bg, d_out, num_heads=h, scale=0.25,
                                  interpret=True)
    _, vjp = jax.vjp(
        lambda q: ka._xla_attention_core(q, bg, h, 0.25, -100.0), qkv)
    (want,) = vjp((d_out, jnp.zeros((b, n), jnp.float32)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_distilled_config_token_offsets():
    """Distilled configs (cls+dist prefix): the mask/top-K machinery must
    skip BOTH prefix tokens (review finding: a hard-coded 1-offset gathered
    the dist token as 'patch 0')."""
    cfg = TINY.replace(distilled=True)
    params = vit.init(cfg, jax.random.key(0))
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 32, 3)),
                    jnp.float32)
    out = vit.apply(params, x, cfg)
    assert out.logits.shape == (2, 20)
    # top-K indices address the 16-patch grid only
    assert int(jnp.max(out.top_patch_idx)) < cfg.num_patches
    # gathered embeddings equal the indexed patch tokens (prefix skipped)
    outb = vit.apply(params, x, cfg, need_blocks=True)
    toks = np.asarray(outb.tokens_prenorm)[:, cfg.num_tokens:, :]
    idx = np.asarray(out.top_patch_idx)
    want = np.take_along_axis(toks, idx[:, :, None], axis=1)
    np.testing.assert_allclose(np.asarray(out.top_patch_embeds), want,
                               atol=1e-6)



def test_softmax_clamp_neutralized_in_training():
    """cfg.softmax_clamp is a serving-only knob: the backward kernels
    differentiate un-clamped softmax, so the training forward must
    neutralize the clamp — loss AND gradients identical to the
    clamp-free config."""
    cfg0 = TINY.replace(attn_impl="pallas")
    cfg1 = cfg0.replace(softmax_clamp=True)
    params = vit.init(cfg0, jax.random.key(2))
    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)

    def loss(p, cfg):
        out = vit.forward(p, x, cfg, train=True, rng=jax.random.key(0))
        return jnp.sum(out.logits ** 2)

    l0, g0 = jax.value_and_grad(loss)(params, cfg0)
    l1, g1 = jax.value_and_grad(loss)(params, cfg1)
    assert float(l0) == float(l1)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_qkv_bias_false_is_honored():
    """cfg.qkv_bias=False must build a bias-free qkv projection (it mirrors
    nn.Linear(dim, 3*dim, bias=qkv_bias), vit_model.py:98) — previously the
    knob was declared but silently ignored."""
    cfg = TINY.replace(qkv_bias=False)
    params = vit.init(cfg, jax.random.key(0))
    assert "bias" not in params["blocks"]["attn"]["qkv"]
    x = jnp.asarray(np.random.default_rng(4).standard_normal((2, 32, 32, 3)),
                    jnp.float32)
    for impl in ("xla", "pallas"):
        out = vit.apply(params, x, cfg.replace(attn_impl=impl),
                        need_rollout=True)
        assert np.isfinite(np.asarray(out.logits)).all()
        assert np.isfinite(np.asarray(out.rollout_row)).all()


def test_distilled_head_dist_trains():
    """Distilled training must give head_dist a gradient (the reference
    returns (x, x_dist) in training so both heads get loss,
    vit_model.py:414-417) — previously dist_logits was computed and
    dropped, leaving head_dist untrained while eval averaged it in."""
    from vision_transformer_cam_tpu.train.step import loss_fn
    cfg = TINY.replace(distilled=True)
    params = vit.init(cfg, jax.random.key(0))
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    y = jnp.asarray((rng.random((2, 20)) < 0.2), jnp.float32)
    grads = jax.grad(lambda p: loss_fn(p, x, y, cfg, jax.random.key(1))[0])(
        params)
    g = np.asarray(grads["head_dist"]["kernel"])
    assert np.abs(g).max() > 0


def test_calibrate_act_scales_distilled():
    """int8 calibration must handle the dist token (cfg.seq_len counts it;
    the pos-embed add used to shape-mismatch for distilled models)."""
    from vision_transformer_cam_tpu.ops import quant
    cfg = TINY.replace(distilled=True)
    params = vit.init(cfg, jax.random.key(0))
    calib = jnp.asarray(
        np.random.default_rng(9).standard_normal((2, 32, 32, 3)), jnp.float32)
    scales = quant.calibrate_act_scales(params, cfg, calib)
    assert scales["blocks"]["qkv"].shape == (cfg.depth,)


def test_tune_tpu_honors_user_pinned_partition(monkeypatch):
    """A user-pinned --xla_tpu_scoped_vmem_limit_kib must be respected:
    smaller than the long-N requirement -> NO marker (the kernel stays
    q-blocked; advertising 32 MB under a 16 MB partition OOMs Mosaic),
    bigger -> marker reflects the ACTUAL partition."""
    import os

    from vision_transformer_cam_tpu import configs, utils
    monkeypatch.setenv(utils.SCOPED_VMEM_MARKER, "sentinel")
    monkeypatch.delenv(utils.SCOPED_VMEM_MARKER)
    long_cfg = configs.vit_large_patch16_384()

    monkeypatch.setenv("LIBTPU_INIT_ARGS",
                       "--xla_tpu_scoped_vmem_limit_kib=16384")
    assert not utils.tune_tpu_for_long_sequence(long_cfg)
    assert utils.SCOPED_VMEM_MARKER not in os.environ
    # the pinned value is untouched (no second flag appended)
    assert os.environ["LIBTPU_INIT_ARGS"].count("scoped_vmem_limit") == 1

    monkeypatch.setenv("LIBTPU_INIT_ARGS",
                       "--xla_tpu_scoped_vmem_limit_kib=49152")
    assert utils.tune_tpu_for_long_sequence(long_cfg)
    assert os.environ[utils.SCOPED_VMEM_MARKER] == "49152"


def test_tune_tpu_gt1k_partition(monkeypatch):
    """At N>640 (ViT-L/16@512 -> 1025 tokens) the tuner must request the
    36 MB partition: the bf16 forward's in-model scoped allocation is
    33.0-33.1 MB at every viable q_block — it OOMs 32 MB by ~1 MB (measured
    round 4), fits 36 MB; int8 fits either and is unaffected.  N=577 keeps
    the 32 MB request (ViT-B@224 showed raised partitions hurt short N, so
    each regime gets its measured minimum)."""
    import os

    from vision_transformer_cam_tpu import configs, utils
    for var in (utils.SCOPED_VMEM_MARKER, "LIBTPU_INIT_ARGS"):
        monkeypatch.setenv(var, "sentinel")
        monkeypatch.delenv(var)
    assert utils.tune_tpu_for_long_sequence(configs.vit_large_patch16_512())
    assert os.environ[utils.SCOPED_VMEM_MARKER] == str(
        utils.GT1K_SCOPED_VMEM_KIB)
    assert f"--xla_tpu_scoped_vmem_limit_kib={utils.GT1K_SCOPED_VMEM_KIB}" \
        in os.environ["LIBTPU_INIT_ARGS"]


def test_plain_bf16_path_honors_qblock_blockb_knobs(monkeypatch):
    """bench's --q-block/--block-b knobs must reach the kernel on the PLAIN
    bf16 no-rollout path too: fused_attention_diff (the custom_vjp wrapper)
    has no q_block/block_b surface, so that branch silently benchmarked the
    default config under any knob setting (review finding).  Spy on
    masked_attention_fused and assert the knobs arrive — and that the
    numbers match the knobless run."""
    cfg = TINY.replace(attn_impl="pallas", dtype=jnp.float32,
                       param_dtype=jnp.float32)
    params = vit.init(cfg, jax.random.key(0))
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    base = vit.apply(params, x, cfg, need_rollout=False)

    seen = []
    real = ka.masked_attention_fused

    def spy(*args, **kw):
        seen.append((kw.get("q_block", 0), kw.get("block_b", 1)))
        return real(*args, **kw)

    monkeypatch.setattr(ka, "masked_attention_fused", spy)
    n = cfg.seq_len
    knob = vit.apply(params, x, cfg.replace(attn_q_block=n, attn_block_b=2),
                     need_rollout=False)
    assert seen and all(qb == n and bb == 2 for qb, bb in seen)
    np.testing.assert_allclose(np.asarray(base.logits),
                               np.asarray(knob.logits), atol=1e-5)
    np.testing.assert_allclose(np.asarray(base.head1_logits),
                               np.asarray(knob.head1_logits), atol=1e-5)
