"""Golden parity of the JAX model vs the PyTorch reference, run in float64 so
agreement proves exact-math equivalence (BASELINE.md pins CAM parity at 1e-5;
we hold the forward to 1e-10 in f64)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from vision_transformer_cam_tpu import configs  # noqa: E402
from vision_transformer_cam_tpu.io import weights as wio  # noqa: E402
from vision_transformer_cam_tpu.models import vit  # noqa: E402

import oracle  # noqa: E402

ATOL = 1e-10


@pytest.fixture(scope="module")
def golden():
    model = oracle.make_reference_model(num_classes=20, has_logits=False,
                                        double=True, seed=0)
    sd = oracle.torch_state_dict_numpy(model)
    rng = np.random.default_rng(42)
    imgs = rng.standard_normal((2, 3, 224, 224)).astype(np.float64)
    ref = oracle.run_reference(model, imgs)

    cfg = configs.vit_base_patch16_224_in21k(num_classes=20, has_logits=False)
    cfg = cfg.replace(dtype=jnp.float64, param_dtype=jnp.float64)
    params = wio.pytree_from_state_dict(sd, cfg)
    out = vit.apply(params, jnp.asarray(imgs.transpose(0, 2, 3, 1)), cfg,
                    need_headmean=True, need_blocks=True, need_perhead=True)
    return ref, out, cfg


def test_cls_logits(golden):
    ref, out, _ = golden
    np.testing.assert_allclose(np.asarray(out.logits), ref["logits"],
                               atol=ATOL)


def test_head1_logits(golden):
    ref, out, _ = golden
    np.testing.assert_allclose(np.asarray(out.head1_logits),
                               ref["head1_logits"], atol=ATOL)


def test_attention_weights_per_head(golden):
    ref, out, _ = golden
    np.testing.assert_allclose(np.asarray(out.attn_perhead),
                               ref["attn_weights"], atol=ATOL)


def test_attention_headmean_and_cls_rows(golden):
    ref, out, _ = golden
    hm = ref["attn_weights"].mean(axis=2)  # [L,B,N,N]
    np.testing.assert_allclose(np.asarray(out.attn_headmean), hm, atol=ATOL)
    np.testing.assert_allclose(np.asarray(out.attn_cls_rows), hm[:, :, 0, :],
                               atol=ATOL)


def test_block_outputs(golden):
    ref, out, _ = golden
    np.testing.assert_allclose(np.asarray(out.block_outputs),
                               ref["attn_matrix"], atol=ATOL)


def test_top_patch_embeds(golden):
    ref, out, _ = golden
    np.testing.assert_allclose(np.asarray(out.top_patch_embeds),
                               ref["top_patch_embeds"], atol=ATOL)


def test_head1_kernel_transposed(golden):
    ref, out, _ = golden
    np.testing.assert_allclose(np.asarray(out.head1_kernel).T,
                               ref["head1_weight"], atol=0)


def test_f32_forward_close():
    """f32 smoke check.  With *random* weights the attention is near-uniform,
    so mask14 values cluster at the 0.25 threshold and single-ulp f32
    differences flip bg-mask bits, which then propagate through the remaining
    blocks — a property of the reference mechanism itself, not an
    implementation divergence (the f64 goldens above pin exact math parity).
    Hence the loose tolerance here."""
    model = oracle.make_reference_model(num_classes=20, has_logits=False,
                                        double=True, seed=0)
    sd = oracle.torch_state_dict_numpy(model)
    rng = np.random.default_rng(7)
    imgs = rng.standard_normal((2, 3, 224, 224)).astype(np.float32)
    ref = oracle.run_reference(model, imgs.astype(np.float64))

    cfg = configs.vit_base_patch16_224_in21k(num_classes=20, has_logits=False)
    params = wio.pytree_from_state_dict(
        {k: v.astype(np.float32) for k, v in sd.items()}, cfg)
    out = vit.apply(params, jnp.asarray(imgs.transpose(0, 2, 3, 1)), cfg)
    np.testing.assert_allclose(np.asarray(out.logits), ref["logits"],
                               atol=5e-2)


def test_rollout_cam_matches_torch_rollout(golden):
    """The headline artifact: the fused in-scan rollout CAM equals the
    reference's post-hoc recursive-matmul rollout (predict.py:214-232)
    computed in torch over the reference's own attention weights."""
    import torch

    ref, _, cfg = golden
    att = torch.from_numpy(ref["attn_weights"]).mean(dim=2)  # [L, B, N, N]
    n = att.shape[-1]
    aug = att + torch.eye(n, dtype=att.dtype)
    aug = aug / aug.sum(dim=-1, keepdim=True)
    joint = aug[0]
    for l in range(1, aug.shape[0]):
        joint = torch.matmul(aug[l], joint)
    want = joint[:, 0, 1:].reshape(-1, cfg.grid_size, cfg.grid_size)
    want = want / want.amax(dim=(1, 2), keepdim=True)

    # our fused path, from the same weights/images (reuse fixture params)
    model = oracle.make_reference_model(num_classes=20, has_logits=False,
                                        double=True, seed=0)
    sd = oracle.torch_state_dict_numpy(model)
    params = wio.pytree_from_state_dict(sd, cfg)
    rng = np.random.default_rng(42)
    imgs = rng.standard_normal((2, 3, 224, 224)).astype(np.float64)
    out = vit.apply(params, jnp.asarray(imgs.transpose(0, 2, 3, 1)), cfg,
                    need_rollout=True)
    from vision_transformer_cam_tpu.ops.rollout import cam_from_rollout_row
    cam = cam_from_rollout_row(out.rollout_row, cfg.grid_size)
    np.testing.assert_allclose(np.asarray(cam), want.numpy(), atol=ATOL)


def test_state_dict_roundtrip():
    cfg = configs.vit_base_patch16_224_in21k(num_classes=20, has_logits=False)
    params = vit.init(cfg, jax.random.key(0))
    sd = wio.state_dict_from_pytree(params, cfg)
    params2 = wio.pytree_from_state_dict(sd, cfg)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), params, params2)
