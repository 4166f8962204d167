"""Pipeline parallelism over depth (parallel/pipeline.py).

The block stack is stage-sharded over a mesh axis and microbatch carries
flow stage-to-stage via ppermute (GPipe fill-and-drain).  These pin, on the
8-virtual-device CPU mesh:

  * forward equality vs the single-device vit.forward (same XLA block math,
    different execution schedule) — logits, CAM rollout row, per-layer cls
    rows, top-16 selection;
  * dp x pp composition (batch over 'data', depth over 'stage');
  * gradient equality through the pipeline (ppermute/psum/gather VJPs) vs
    single-device jax.grad — the property a pp train step rests on;
  * the guard on batch-global mask normalization (reference semantics
    couple samples across microbatches, so the runner requires the
    per-sample form).

Reference equivalent being scaled: the DDP'd forward/backward
(train_and_validate.py:142-146) — replication-only; stage sharding is the
TPU-native extension for ViT-H/14-class depth.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from vision_transformer_cam_tpu import configs  # noqa: E402
from vision_transformer_cam_tpu.models import vit  # noqa: E402
from vision_transformer_cam_tpu.parallel import mesh as meshlib  # noqa: E402
from vision_transformer_cam_tpu.parallel import pipeline as pplib  # noqa: E402

CFG = configs.ViTCAMConfig(img_size=32, patch_size=8, embed_dim=64, depth=8,
                           num_heads=4, num_classes=20, mask_from=2,
                           top_k_patches=4, dtype=jnp.float32,
                           param_dtype=jnp.float32,
                           per_sample_mask_norm=True)


@pytest.fixture(scope="module")
def setup():
    params = vit.init(CFG, jax.random.key(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 32, 32, 3)), jnp.float32)
    ref = vit.apply(params, x, CFG, need_rollout=True)
    return params, x, ref


@pytest.mark.parametrize("microbatches", [2, 4],
                         ids=["2 microbatches", "4 microbatches"])
def test_pipeline_matches_single_device(setup, microbatches):
    params, x, ref = setup
    mesh = meshlib.make_mesh((4,), ("stage",), devices=jax.devices()[:4])
    out = pplib.pipeline_forward(params, x, CFG, mesh, need_rollout=True,
                                 microbatches=microbatches)
    for name in ("logits", "head1_logits", "rollout_row", "attn_cls_rows"):
        np.testing.assert_allclose(np.asarray(getattr(out, name)),
                                   np.asarray(getattr(ref, name)),
                                   atol=1e-6, err_msg=name)
    np.testing.assert_array_equal(np.asarray(out.top_patch_idx),
                                  np.asarray(ref.top_patch_idx))


def test_pipeline_composes_with_data_parallel(setup):
    params, x, ref = setup
    mesh = meshlib.make_mesh((2, 4), ("data", "stage"))
    out = pplib.pipeline_forward(params, x, CFG, mesh, data_axis="data",
                                 need_rollout=True, microbatches=2)
    np.testing.assert_allclose(np.asarray(out.logits),
                               np.asarray(ref.logits), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.rollout_row),
                               np.asarray(ref.rollout_row), atol=1e-6)


def test_pipeline_grads_match_single_device(setup):
    params, x, _ = setup
    mesh = meshlib.make_mesh((4,), ("stage",), devices=jax.devices()[:4])

    def loss_pp(p):
        o = pplib.pipeline_forward(p, x, CFG, mesh, microbatches=2)
        return jnp.sum(o.logits ** 2) + jnp.sum(o.head1_logits ** 2)

    def loss_ref(p):
        o = vit.forward(p, x, CFG)
        return jnp.sum(o.logits ** 2) + jnp.sum(o.head1_logits ** 2)

    g = jax.grad(loss_pp)(params)
    g_ref = jax.grad(loss_ref)(params)
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g)[0],
            jax.tree_util.tree_flatten_with_path(g_ref)[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   rtol=1e-4, err_msg=str(kp))


def test_pipeline_requires_per_sample_mask_norm(setup):
    params, x, _ = setup
    mesh = meshlib.make_mesh((4,), ("stage",), devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="per_sample_mask_norm"):
        pplib.pipeline_forward(params, x,
                               CFG.replace(per_sample_mask_norm=False), mesh)


def test_pipeline_shape_guards(setup):
    params, x, _ = setup
    mesh = meshlib.make_mesh((3,), ("stage",), devices=jax.devices()[:3])
    with pytest.raises(ValueError, match="not divisible"):
        pplib.pipeline_forward(params, x, CFG, mesh)  # depth 8 % 3 stages


def test_pipeline_train_step_matches_train_step(setup):
    """pipeline_train_step (grads through the GPipe schedule, stage-sharded
    params, optax update) produces the SAME updated parameters as the
    standard replicated train_step on the same batch — deterministic (all
    drop ratios 0), so the two paths differ only by collective summation
    order."""
    from vision_transformer_cam_tpu import configs as cfgs
    from vision_transformer_cam_tpu.train.state import (create_train_state,
                                                        make_optimizer)
    from vision_transformer_cam_tpu.train.step import train_step
    params, x, _ = setup
    labels = jnp.zeros((8, 20), jnp.float32).at[:, :3].set(1.0)
    mesh = meshlib.make_mesh((4,), ("stage",), devices=jax.devices()[:4])
    tx, _ = make_optimizer(cfgs.OptimConfig(epochs=10, warmup_epochs=1),
                           global_batch_size=8, steps_per_epoch=10)

    # fresh copies: train_step donates its state buffers and the fixture
    # params are shared module-wide
    p_ref = jax.tree.map(jnp.copy, params)
    st_ref, m_ref = train_step(create_train_state(p_ref, tx), x, labels,
                               jax.random.key(1), CFG, tx)

    p_pp = pplib.stage_shard_params(mesh, jax.tree.map(jnp.copy, params))
    st_pp, m_pp = pplib.pipeline_train_step(
        create_train_state(p_pp, tx), x, labels, CFG, tx, mesh,
        microbatches=2)

    np.testing.assert_allclose(float(m_pp["loss"]), float(m_ref["loss"]),
                               rtol=1e-6)
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(st_pp.params)[0],
            jax.tree_util.tree_flatten_with_path(st_ref.params)[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   err_msg=str(kp))
    # the updated blocks STAY stage-sharded (each stage holds depth/S
    # layers — the parameter-memory property pp exists for)
    k = st_pp.params["blocks"]["attn"]["qkv"]["kernel"]
    assert k.addressable_shards[0].data.shape[0] == CFG.depth // 4, \
        "block params were gathered/replicated by the update"
