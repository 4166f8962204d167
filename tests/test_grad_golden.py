"""Gradient goldens: our jax.grad through the full CAM model + dual MLSM loss
vs torch autograd through the reference model (f64, atol 1e-10).

This pins the ENTIRE training math — forward, the loss (utils.py:182-184),
and backprop through the mask-feedback mechanism (whose threshold/top-k ops
have zero gradient a.e. in both frameworks)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from vision_transformer_cam_tpu import configs  # noqa: E402
from vision_transformer_cam_tpu.io import weights as wio  # noqa: E402
from vision_transformer_cam_tpu.models import vit  # noqa: E402
from vision_transformer_cam_tpu.ops.losses import dual_head_loss  # noqa: E402

import oracle  # noqa: E402


@pytest.fixture(scope="module")
def grad_pair():
    import torch
    model = oracle.make_reference_model(num_classes=20, has_logits=False,
                                        double=True, seed=0)
    model.train()  # grads flow; all dropout rates are 0 in this config
    rng = np.random.default_rng(3)
    imgs = rng.standard_normal((2, 3, 224, 224))
    labels = (rng.random((2, 20)) < 0.25).astype(np.float64)
    labels[:, 0] = 1.0

    x = torch.from_numpy(imgs).double().requires_grad_(False)
    y = torch.from_numpy(labels).double()
    out, _, _, allbs, _, _ = model(x)
    loss = torch.nn.functional.multilabel_soft_margin_loss(out, y) + \
        torch.nn.functional.multilabel_soft_margin_loss(allbs, y)
    loss.backward()
    ref_grads = {k: (v.grad.detach().numpy() if v.grad is not None else None)
                 for k, v in model.named_parameters()}

    cfg = configs.vit_base_patch16_224_in21k(num_classes=20, has_logits=False)
    cfg = cfg.replace(dtype=jnp.float64, param_dtype=jnp.float64)
    sd = oracle.torch_state_dict_numpy(model)
    params = wio.pytree_from_state_dict(sd, cfg)

    def loss_fn(p):
        o = vit.forward(p, jnp.asarray(imgs.transpose(0, 2, 3, 1)), cfg,
                        train=True, rng=None)
        return dual_head_loss(o.logits, o.head1_logits, jnp.asarray(labels))[0]

    ours_loss, ours_grads = jax.value_and_grad(loss_fn)(params)
    return float(loss.item()), ref_grads, float(ours_loss), ours_grads


def test_loss_value_matches(grad_pair):
    ref_loss, _, ours_loss, _ = grad_pair
    assert ours_loss == pytest.approx(ref_loss, abs=1e-12)


def test_head_grads_match(grad_pair):
    _, ref, _, ours = grad_pair
    np.testing.assert_allclose(np.asarray(ours["head"]["kernel"]).T,
                               ref["head.weight"], atol=1e-10)
    np.testing.assert_allclose(np.asarray(ours["head1"]["kernel"]).T,
                               ref["head1.weight"], atol=1e-10)
    np.testing.assert_allclose(np.asarray(ours["head1"]["bias"]),
                               ref["head1.bias"], atol=1e-10)


def test_backbone_grads_match(grad_pair):
    """Gradients THROUGH the mask-feedback blocks: qkv/proj/mlp/LN of the
    first and last blocks, pos_embed, cls_token, patch embed."""
    _, ref, _, ours = grad_pair
    for i in (0, 5, 11):
        np.testing.assert_allclose(
            np.asarray(ours["blocks"]["attn"]["qkv"]["kernel"][i]).T,
            ref[f"blocks.{i}.attn.qkv.weight"], atol=1e-10)
        np.testing.assert_allclose(
            np.asarray(ours["blocks"]["mlp"]["fc1"]["kernel"][i]).T,
            ref[f"blocks.{i}.mlp.fc1.weight"], atol=1e-10)
        np.testing.assert_allclose(
            np.asarray(ours["blocks"]["ln1"]["scale"][i]),
            ref[f"blocks.{i}.norm1.weight"], atol=1e-10)
    np.testing.assert_allclose(np.asarray(ours["pos_embed"]),
                               ref["pos_embed"], atol=1e-10)
    np.testing.assert_allclose(np.asarray(ours["cls_token"]),
                               ref["cls_token"], atol=1e-10)
    pk = np.asarray(ours["patch_embed"]["kernel"])
    p = 16
    want = ref["patch_embed.proj.weight"]  # [D, C, kh, kw]
    got = pk.reshape(p, p, 3, -1).transpose(3, 2, 0, 1)
    np.testing.assert_allclose(got, want, atol=1e-10)
