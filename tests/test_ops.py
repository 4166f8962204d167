"""Unit tests for losses / rollout / interpolation vs torch oracles."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from vision_transformer_cam_tpu.ops import interpolate, losses, rollout


def test_multilabel_soft_margin_matches_torch():
    import torch
    import torch.nn.functional as F
    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 20))
    y = (rng.random((8, 20)) < 0.3).astype(np.float64)
    ours = losses.multilabel_soft_margin_loss(jnp.asarray(x), jnp.asarray(y))
    ref = F.multilabel_soft_margin_loss(torch.tensor(x), torch.tensor(y))
    np.testing.assert_allclose(float(ours), float(ref), atol=1e-12)


def _random_attn_stack(rng, l=12, b=2, n=17):
    a = rng.random((l, b, n, n))
    return a / a.sum(-1, keepdims=True)  # row-stochastic like softmax output


def _naive_joint(stack):
    """Literal predict.py:214-226 in numpy."""
    l, b, n, _ = stack.shape
    eye = np.eye(n)
    aug = stack + eye
    aug = aug / aug.sum(-1, keepdims=True)
    joint = np.zeros_like(aug)
    joint[0] = aug[0]
    for i in range(1, l):
        for j in range(b):
            joint[i, j] = aug[i, j] @ joint[i - 1, j]
    return joint


def test_rollout_joint_matches_naive():
    rng = np.random.default_rng(1)
    stack = _random_attn_stack(rng)
    ours = np.asarray(rollout.rollout_joint(jnp.asarray(stack)))
    np.testing.assert_allclose(ours, _naive_joint(stack), atol=1e-12)


def test_rollout_cls_row_matches_chain():
    rng = np.random.default_rng(2)
    stack = _random_attn_stack(rng)
    joint = _naive_joint(stack)
    ours = np.asarray(rollout.rollout_cls_row(jnp.asarray(stack)))
    np.testing.assert_allclose(ours, joint[-1][:, 0, :], atol=1e-12)


def test_rollout_cam_normalized():
    rng = np.random.default_rng(3)
    stack = _random_attn_stack(rng)
    cam = np.asarray(rollout.rollout_cam(jnp.asarray(stack), 4))
    assert cam.shape == (2, 4, 4)
    np.testing.assert_allclose(cam.max(axis=(1, 2)), 1.0)


def test_bg_rollout_row_matches_validate_math():
    """Literal validate.py:224-235 vs the cls-row shortcut."""
    rng = np.random.default_rng(4)
    stack = _random_attn_stack(rng, l=12, b=1, n=17)
    att = stack[5:].mean(axis=0)                     # [1, N, N]
    aug = att + np.eye(17)
    aug = aug / aug.sum(-1, keepdims=True)
    mask_i = aug[:, 0, 1:]
    expect = mask_i / mask_i.max()

    cls_rows = jnp.asarray(stack[:, :, 0, :])         # [L, B, N]
    ours = np.asarray(rollout.bg_rollout_row(cls_rows, from_block=5))
    np.testing.assert_allclose(ours, expect, atol=1e-12)


def test_bilinear_matches_torch_interpolate():
    import torch
    import torch.nn.functional as F
    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 1, 14, 14))
    ref = F.interpolate(torch.tensor(x), size=(37, 53), mode="bilinear",
                        align_corners=False).numpy()
    ours = np.asarray(interpolate.bilinear_resize(jnp.asarray(x), (37, 53)))
    np.testing.assert_allclose(ours, ref, atol=1e-10)


def test_nearest_matches_pil():
    import PIL.Image
    rng = np.random.default_rng(6)
    seg = rng.integers(0, 21, size=(30, 41)).astype(np.uint8)
    ref = np.asarray(PIL.Image.fromarray(seg).resize((82, 60),
                                                     PIL.Image.NEAREST))
    ours = np.asarray(interpolate.nearest_resize(jnp.asarray(seg), (60, 82)))
    np.testing.assert_array_equal(ours, ref)


def test_pos_embed_interpolation_shapes():
    pe = jnp.asarray(np.random.default_rng(7).standard_normal((1, 197, 8)))
    out = interpolate.interpolate_pos_embed(pe, 14, 24, num_tokens=1)
    assert out.shape == (1, 1 + 24 * 24, 8)
    np.testing.assert_allclose(np.asarray(out[:, :1]), np.asarray(pe[:, :1]))


def test_bg_rollout_row_rejects_non_square_slice():
    """A distilled cls-row stack (N = g*g + 2) sliced with the default
    prefix_tokens=1 leaves a non-square patch row — must raise with the
    fix spelled out instead of silently shifting the grid by one (the
    sibling CAM helpers catch this via _prefix; bg_rollout_row has no
    grid_size arg, so it checks squareness — review finding)."""
    rng = np.random.default_rng(0)
    n_distilled = 14 * 14 + 2
    cls_rows = jnp.asarray(rng.random((12, 2, n_distilled)), jnp.float32)
    with pytest.raises(ValueError, match="prefix_tokens=cfg.num_tokens"):
        rollout.bg_rollout_row(cls_rows, from_block=5)
    ok = rollout.bg_rollout_row(cls_rows, from_block=5, prefix_tokens=2)
    assert ok.shape == (2, 14 * 14)
    assert np.isfinite(np.asarray(ok)).all()
