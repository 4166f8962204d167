"""Train-stack tests: schedule curve, sharded train step on the 8-device CPU
mesh (dp and dp x tp), freeze mask, checkpoint roundtrip, fused rollout."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402
import optax  # noqa: E402

from vision_transformer_cam_tpu import configs  # noqa: E402
from vision_transformer_cam_tpu.models import vit  # noqa: E402
from vision_transformer_cam_tpu.ops import rollout  # noqa: E402
from vision_transformer_cam_tpu.parallel import mesh as meshlib  # noqa: E402
from vision_transformer_cam_tpu.train import (  # noqa: E402
    checkpoint as ckptlib, schedule as sched, state as statelib,
    step as steplib)

TINY = configs.ViTCAMConfig(img_size=32, patch_size=8, embed_dim=64, depth=6,
                            num_heads=4, num_classes=20, mask_from=2,
                            top_k_patches=4, dtype=jnp.float32,
                            param_dtype=jnp.float32)


def _tiny_batch(b=8, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((b, 32, 32, 3)).astype(np.float32)
    y = (rng.random((b, 20)) < 0.2).astype(np.float32)
    y[:, 0] = 1.0  # at least one positive per sample
    return jnp.asarray(x), jnp.asarray(y)


# Vendored golden LR-per-epoch curve, transcribed from timm's published
# CosineLRScheduler formula (warmup_prefix=False — what create_scheduler at
# train_and_validate.py:150-151 builds) for base_lr=5e-4, warmup_lr=1e-6,
# min_lr=1e-5, warmup=5, epochs=100:
#   t < 5:        1e-6 + t*(5e-4 - 1e-6)/5
#   5 <= t < 100: 1e-5 + 0.5*(5e-4 - 1e-5)*(1 + cos(pi * t/100))
#                 (t NOT shifted by the warmup — warmup epochs count toward
#                 the cosine phase)
#   t >= 100:     1e-5   (cycle_limit=1 -> min_lr during cooldown)
_TIMM_GOLDEN_LR = {
    0: 1e-06,                     # warmup start: warmup_lr exactly
    1: 1.008e-4,
    3: 3.004e-4,
    4: 4.002e-4,
    5: 4.969836434458088e-4,      # first cosine epoch: ALREADY below base
    6: 4.956603764285287e-4,
    20: 4.5320916362186214e-4,
    50: 2.55e-4,                  # u=0.5 exactly: (base+min)/2
    52: 2.3961632271531823e-4,
    75: 8.175883860929587e-5,
    99: 1.0120892710395758e-5,
    100: 1e-5,                    # cooldown floor
    110: 1e-5,
}


def test_schedule_timm_curve():
    cfg = configs.OptimConfig(lr=5e-4, warmup_epochs=5, warmup_lr=1e-6,
                              min_lr=1e-5, epochs=100,
                              linear_lr_scaling=False)
    base = sched.scaled_base_lr(
        configs.OptimConfig(lr=5e-4, linear_lr_scaling=True), 32)
    assert base == pytest.approx(5e-4 * 32 / 512)
    fn = sched.timm_cosine_schedule(cfg, cfg.lr, steps_per_epoch=10)
    for epoch, want in _TIMM_GOLDEN_LR.items():
        assert float(fn(epoch * 10)) == pytest.approx(want, rel=1e-9), \
            f"epoch {epoch}"
    # constant within an epoch (timm steps once per epoch)
    assert float(fn(3)) == float(fn(9))
    # warmup_prefix=False signature: the first post-warmup epoch is BELOW
    # base lr (the cosine already advanced 5/100 of its phase)
    assert float(fn(50)) < cfg.lr
    # monotone decrease after warmup
    vals = [float(fn(e * 10)) for e in range(5, 100, 7)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_train_step_reduces_loss_dp():
    mesh = meshlib.make_mesh((-1,), ("data",))
    x, y = _tiny_batch()
    params = vit.init(TINY, jax.random.key(0))
    tx, _ = statelib.make_optimizer(
        configs.OptimConfig(lr=1e-3, warmup_epochs=0, epochs=10,
                            linear_lr_scaling=False),
        global_batch_size=8, steps_per_epoch=1)
    params = meshlib.shard_params(mesh, params)
    st = statelib.create_train_state(params, tx)
    sh = meshlib.data_sharding(mesh)
    x, y = jax.device_put(x, sh), jax.device_put(y, sh)
    with mesh:
        st, m0 = steplib.train_step(st, x, y, jax.random.key(1), TINY, tx)
        for _ in range(10):
            st, m = steplib.train_step(st, x, y, jax.random.key(1), TINY, tx)
    assert float(m["loss"]) < float(m0["loss"])
    assert np.isfinite(float(m["f1"]))
    assert int(st.step) == 11


def test_train_step_tensor_parallel_matches_dp():
    """dp x tp sharding must produce the same numbers as replicated params."""
    x, y = _tiny_batch(b=4, seed=3)
    tx, _ = statelib.make_optimizer(
        configs.OptimConfig(lr=1e-3, warmup_epochs=0, epochs=10,
                            linear_lr_scaling=False),
        global_batch_size=4, steps_per_epoch=1)

    results = []
    for shape, axes, model_axis in [((4,), ("data",), None),
                                    ((4, 2), ("data", "model"), "model")]:
        n = int(np.prod(shape))
        mesh = meshlib.make_mesh(shape, axes, devices=jax.devices()[:n])
        # fresh (deterministic) init per mesh: train_step donates its input
        # state, so buffers from a previous iteration must not be reused
        params = vit.init(TINY, jax.random.key(2))
        p = meshlib.shard_params(mesh, params, model_axis=model_axis)
        st = statelib.create_train_state(p, tx)
        sh = meshlib.data_sharding(mesh)
        xb, yb = jax.device_put(x, sh), jax.device_put(y, sh)
        with mesh:
            st, m = steplib.train_step(st, xb, yb, jax.random.key(1), TINY,
                                       tx)
        results.append((float(m["loss"]),
                        np.asarray(jax.device_get(
                            st.params["head"]["kernel"]))))
    assert results[0][0] == pytest.approx(results[1][0], rel=1e-5)
    np.testing.assert_allclose(results[0][1], results[1][1], atol=1e-5)


def test_freeze_backbone_only_heads_move():
    x, y = _tiny_batch(b=4)
    params = vit.init(TINY, jax.random.key(0))
    mask = statelib.trainable_mask(params, freeze_backbone=True)
    assert mask["head"]["kernel"] is True
    assert mask["head1"]["kernel"] is True
    assert mask["blocks"]["attn"]["qkv"]["kernel"] is False
    tx, _ = statelib.make_optimizer(
        configs.OptimConfig(lr=1e-2, warmup_epochs=0, epochs=10,
                            linear_lr_scaling=False),
        global_batch_size=4, steps_per_epoch=1, freeze_mask=mask)
    st = statelib.create_train_state(params, tx)
    before = jax.tree.map(np.asarray, st.params)  # snapshot: step donates st
    st2, _ = steplib.train_step(st, x, y, jax.random.key(1), TINY, tx)
    np.testing.assert_array_equal(
        np.asarray(st2.params["blocks"]["attn"]["qkv"]["kernel"]),
        before["blocks"]["attn"]["qkv"]["kernel"])
    assert not np.array_equal(np.asarray(st2.params["head"]["kernel"]),
                              before["head"]["kernel"])
    # pos_embed / cls_token are frozen too (reference freeze loop semantics)
    np.testing.assert_array_equal(np.asarray(st2.params["pos_embed"]),
                                  before["pos_embed"])


def test_freeze_keeps_distilled_head_trainable():
    """The reference freeze is a SUBSTRING test ('head' not in name,
    train_and_validate.py:134), so head_dist — whose loss term exists so it
    trains — must stay trainable (review finding: exact-key matching froze
    it while its logits were still averaged into eval)."""
    cfg = TINY.replace(distilled=True)
    params = vit.init(cfg, jax.random.key(0))
    mask = statelib.trainable_mask(params, freeze_backbone=True)
    assert mask["head_dist"]["kernel"] is True
    assert mask["head"]["kernel"] is True
    assert mask["dist_token"] is False
    assert mask["blocks"]["mlp"]["fc1"]["kernel"] is False


def test_weight_decay_filtering_matches_timm():
    """timm create_optimizer (filter_bias_and_bn=True, the reference
    default) exempts every ndim<=1 param — biases and LN scales — from
    weight decay; the reference model defines no no_weight_decay(), so
    pos_embed/cls_token DO decay.  With zero gradients, one adamw step must
    leave exempt params exactly unchanged and shrink decayed ones."""
    params = vit.init(TINY, jax.random.key(0))
    wd = statelib.weight_decay_mask(params)
    assert wd["head"]["kernel"] is True
    assert wd["head"]["bias"] is False
    assert wd["blocks"]["ln1"]["scale"] is False
    assert wd["blocks"]["ln1"]["bias"] is False
    assert wd["norm"]["scale"] is False
    assert wd["blocks"]["attn"]["qkv"]["bias"] is False
    assert wd["pos_embed"] is True and wd["cls_token"] is True

    tx, _ = statelib.make_optimizer(
        configs.OptimConfig(lr=1e-2, weight_decay=0.1, warmup_epochs=0,
                            epochs=10, linear_lr_scaling=False),
        global_batch_size=4, steps_per_epoch=1)
    st = statelib.create_train_state(params, tx)
    zeros = jax.tree.map(jnp.zeros_like, params)
    updates, _ = tx.update(zeros, st.opt_state, params)
    new = optax.apply_updates(params, updates)
    # exempt: bit-identical under zero grads
    np.testing.assert_array_equal(np.asarray(new["head"]["bias"]),
                                  np.asarray(params["head"]["bias"]))
    np.testing.assert_array_equal(np.asarray(new["blocks"]["ln1"]["scale"]),
                                  np.asarray(params["blocks"]["ln1"]["scale"]))
    # decayed: strictly shrunk toward zero
    assert float(jnp.sum(jnp.abs(new["head"]["kernel"]))) \
        < float(jnp.sum(jnp.abs(params["head"]["kernel"])))
    assert float(jnp.sum(jnp.abs(new["pos_embed"]))) \
        < float(jnp.sum(jnp.abs(params["pos_embed"])))


def test_topk_by_label_count_matches_reference_semantics():
    logits = jnp.asarray([[0.9, 0.1, 0.8, 0.2], [0.1, 0.2, 0.3, 0.4]])
    labels = jnp.asarray([[1., 0., 1., 0.], [0., 0., 0., 1.]])
    pred = steplib.topk_by_label_count(logits, labels)
    np.testing.assert_array_equal(np.asarray(pred),
                                  [[1., 0., 1., 0.], [0., 0., 0., 1.]])
    f1 = float(steplib.f1_micro(pred, labels))
    assert f1 == pytest.approx(1.0)


def test_checkpoint_roundtrip(tmp_path):
    params = vit.init(TINY, jax.random.key(0))
    tx, _ = statelib.make_optimizer(configs.OptimConfig(),
                                    global_batch_size=8, steps_per_epoch=1)
    st = statelib.create_train_state(params, tx)
    x, y = _tiny_batch(b=4)
    st, _ = steplib.train_step(st, x, y, jax.random.key(1), TINY, tx)
    ckptlib.save(str(tmp_path), "ep0", st)
    restored = ckptlib.restore(str(tmp_path), "ep0", st)
    assert int(restored.step) == int(st.step)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), st.params, restored.params)
    assert ckptlib.latest_tag(str(tmp_path)) == "ep0"


def test_load_weights_from_orbax_dir(tmp_path):
    """validate/predict/export --weights accepts the orbax checkpoint DIR
    cli.train writes (no .npz conversion step in the user path): the params
    subtree comes back exactly, optimizer state dropped."""
    pytest.importorskip("orbax.checkpoint")  # save falls back to .npz w/o it
    from vision_transformer_cam_tpu.io import weights as wio
    params = vit.init(TINY, jax.random.key(2))
    tx, _ = statelib.make_optimizer(configs.OptimConfig(),
                                    global_batch_size=8, steps_per_epoch=1)
    st = statelib.create_train_state(params, tx)
    path = ckptlib.save(str(tmp_path), "final", st)
    loaded = wio.load_weights(path, TINY)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), st.params, loaded)


def test_fused_rollout_matches_posthoc_chain():
    """The in-scan rollout carry == the reference's post-hoc recursive matmul
    (predict.py:222-226) == the O(N^2) reverse-scan cls row."""
    cfg = TINY.replace(dtype=jnp.float64, param_dtype=jnp.float64)
    params = vit.init(cfg, jax.random.key(0))
    x, _ = _tiny_batch(b=3, seed=5)
    out = vit.apply(params, x.astype(jnp.float64), cfg, need_headmean=True,
                    need_rollout=True)
    joint = rollout.rollout_joint(out.attn_headmean)
    np.testing.assert_allclose(np.asarray(out.rollout_row),
                               np.asarray(joint[-1][:, 0, :]), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(rollout.rollout_cls_row(out.attn_headmean)),
        np.asarray(out.rollout_row), atol=1e-12)


def test_dryrun_multichip_entrypoints():
    import __graft_entry__ as g
    fn, args = g.entry()
    jax.eval_shape(fn, *args)  # traces without running the full model
    g.dryrun_multichip(8)


def test_evaluate_handles_partial_tail_batch():
    """Val-set sizes rarely divide the mesh: the tail batch must still run
    (unsharded) instead of failing the NamedSharding placement."""
    from vision_transformer_cam_tpu.train import loop as looplib

    class FakeDS:
        def __len__(self):
            return 11  # 8 + 3 over an 8-device mesh

        def __getitem__(self, i):
            rng = np.random.default_rng(i)
            return {"name": str(i),
                    "image": rng.standard_normal((32, 32, 3)).astype(
                        np.float32),
                    "label": np.eye(20, dtype=np.float32)[i % 20]}

    from vision_transformer_cam_tpu.data.loader import BatchLoader
    from vision_transformer_cam_tpu.parallel import mesh as meshlib
    mesh = meshlib.make_mesh((-1,), ("data",))
    params = vit.init(TINY, jax.random.key(0))
    loader = BatchLoader(FakeDS(), 8, shuffle=False, drop_last=False)
    res = looplib.evaluate(params, loader, TINY, mesh)
    assert np.isfinite(res["mAP_16patch"])


def test_checkpoint_roundtrip_sharded_params(tmp_path):
    """Checkpoint save/restore with mesh-sharded (dp x tp) parameters —
    orbax consumes the sharded jax arrays directly."""
    mesh = meshlib.make_mesh((4, 2), ("data", "model"))
    params = vit.init(TINY, jax.random.key(0))
    tx, _ = statelib.make_optimizer(configs.OptimConfig(),
                                    global_batch_size=8, steps_per_epoch=1)
    p = meshlib.shard_params(mesh, params, model_axis="model")
    st = statelib.create_train_state(p, tx)
    ckptlib.save(str(tmp_path), "sharded", st)
    restored = ckptlib.restore(str(tmp_path), "sharded", st)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), st.params, restored.params)


def test_mixed_precision_stream_stays_compute_dtype():
    """Mixed precision (param_dtype f32, dtype bf16) must run the residual
    stream and every GEMM in bf16: the f32 affine LN params used to promote
    everything after LN1 to f32 (models/vit.py _layer_norm/_linear), which
    at long N cannot even fit the attention kernels' scoped VMEM.  Grads
    must still land on the f32 masters."""
    cfg = TINY.replace(dtype=jnp.bfloat16, param_dtype=jnp.float32,
                       attn_impl="pallas")
    params = vit.init(cfg, jax.random.key(0))
    assert params["blocks"]["attn"]["qkv"]["kernel"].dtype == jnp.float32

    import vision_transformer_cam_tpu.kernels.attention as attn_mod
    seen = {}
    orig = attn_mod.fused_attention_diff

    def spy(qkv, bg, *a, **k):
        seen["qkv_dtype"] = qkv.dtype
        return orig(qkv, bg, *a, **k)

    x, y = _tiny_batch(b=2)
    try:
        attn_mod.fused_attention_diff = spy

        def loss(p):
            out = vit.forward(p, x, cfg, train=True, rng=None)
            return jnp.sum(out.logits.astype(jnp.float32))

        grads = jax.grad(loss)(params)
    finally:
        attn_mod.fused_attention_diff = orig
    assert seen["qkv_dtype"] == jnp.bfloat16
    leaf_dtypes = {a.dtype for a in jax.tree.leaves(grads)}
    assert leaf_dtypes == {jnp.dtype(jnp.float32)}
    # eval logits come out in the compute dtype too
    out = vit.forward(params, x, cfg)
    assert out.logits.dtype == jnp.bfloat16


def test_zero1_opt_state_sharded_and_matches_replicated():
    """ZeRO-1 (adamw moments sharded over 'data') must be a pure layout
    change: 3 steps with sharded opt state produce the same params as 3
    steps with replicated opt state, and the moments STAY sharded across
    steps (GSPMD keeps the placement; no silent all-gather back)."""
    mesh = meshlib.make_mesh((-1,), ("data",))
    x, y = _tiny_batch(b=8, seed=7)
    tx, _ = statelib.make_optimizer(
        configs.OptimConfig(lr=1e-3, warmup_epochs=0, epochs=10,
                            linear_lr_scaling=False),
        global_batch_size=8, steps_per_epoch=1)
    sh = meshlib.data_sharding(mesh)
    xb, yb = jax.device_put(x, sh), jax.device_put(y, sh)

    finals = []
    for zero1 in (False, True):
        params = vit.init(TINY, jax.random.key(2))
        p = meshlib.shard_params(mesh, params)
        st = statelib.create_train_state(p, tx)
        if zero1:
            st = st._replace(opt_state=meshlib.shard_opt_state(
                mesh, st.opt_state))
            specs = [a.sharding.spec for a in jax.tree.leaves(st.opt_state)
                     if hasattr(a, "sharding")]
            assert any("data" in s for s in specs), \
                "no moment leaf got a data-axis shard"
        with mesh:
            for _ in range(3):
                st, m = steplib.train_step(st, xb, yb, jax.random.key(1),
                                           TINY, tx)
        if zero1:
            specs = [a.sharding.spec for a in jax.tree.leaves(st.opt_state)
                     if hasattr(a, "sharding")]
            assert any("data" in s for s in specs), \
                "moments lost the ZeRO-1 sharding after an update"
        finals.append((float(m["loss"]),
                       jax.tree.map(np.asarray, st.params)))
    assert finals[0][0] == pytest.approx(finals[1][0], rel=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5),
                 finals[0][1], finals[1][1])


def test_grad_accum_matches_full_batch():
    """train_step_accum(accum=4) == train_step on the same batch: the dual
    MLSM loss is a sample mean, so averaging equal-microbatch gradients is
    the exact full-batch gradient (reassociation tolerance only)."""
    x, y = _tiny_batch(b=8, seed=11)
    tx, _ = statelib.make_optimizer(
        configs.OptimConfig(lr=1e-3, warmup_epochs=0, epochs=10,
                            linear_lr_scaling=False),
        global_batch_size=8, steps_per_epoch=1)

    def run(accum):
        st = statelib.create_train_state(vit.init(TINY, jax.random.key(2)),
                                         tx)
        if accum == 1:
            st, m = steplib.train_step(st, x, y, jax.random.key(1), TINY, tx)
        else:
            st, m = steplib.train_step_accum(st, x, y, jax.random.key(1),
                                             TINY, tx, accum)
        return st, m

    st1, m1 = run(1)
    st4, m4 = run(4)
    assert float(m1["loss"]) == pytest.approx(float(m4["loss"]), rel=1e-6)
    assert float(m1["f1"]) == pytest.approx(float(m4["f1"]))
    # adam normalizes by sqrt(nu): reassociation noise in near-zero grads
    # is amplified toward lr-scale, hence the loose-ish atol
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-5),
        st1.params, st4.params)
    with pytest.raises(ValueError, match="not divisible"):
        run(3)


def test_checkpoint_roundtrip_zero1_opt_state(tmp_path):
    """Checkpoint save/restore with ZeRO-1-sharded adamw moments: orbax
    consumes the data-sharded moment leaves directly, and restore onto the
    sharded template brings them back bit-identical (the fit --resume path
    then re-places by template sharding)."""
    pytest.importorskip("orbax.checkpoint")  # else the npz fallback runs,
    # which is not the behavior this docstring pins (advisor finding)
    mesh = meshlib.make_mesh((-1,), ("data",))
    params = vit.init(TINY, jax.random.key(0))
    tx, _ = statelib.make_optimizer(configs.OptimConfig(),
                                    global_batch_size=8, steps_per_epoch=1)
    p = meshlib.shard_params(mesh, params)
    st = statelib.create_train_state(p, tx)
    st = st._replace(opt_state=meshlib.shard_opt_state(mesh, st.opt_state))
    x, y = _tiny_batch(b=8, seed=13)
    sh = meshlib.data_sharding(mesh)
    with mesh:
        st, _ = steplib.train_step(st, jax.device_put(x, sh),
                                   jax.device_put(y, sh),
                                   jax.random.key(1), TINY, tx)
    ckptlib.save(str(tmp_path), "zero1", st)
    restored = ckptlib.restore(str(tmp_path), "zero1", st)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), st.opt_state, restored.opt_state)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), st.params, restored.params)


def test_checkpoint_cross_layout_resume_zero1_toggle(tmp_path):
    """Toggling --zero1 between runs must not corrupt resume: a checkpoint
    saved with replicated moments restores onto a ZeRO-1-sharded template
    (re-sharded on restore via the template's shardings) and vice versa,
    values identical either way."""
    pytest.importorskip("orbax.checkpoint")
    mesh = meshlib.make_mesh((-1,), ("data",))
    params = vit.init(TINY, jax.random.key(4))
    tx, _ = statelib.make_optimizer(configs.OptimConfig(),
                                    global_batch_size=8, steps_per_epoch=1)
    p = meshlib.shard_params(mesh, params)
    st_rep = statelib.create_train_state(p, tx)
    st_z = st_rep._replace(opt_state=meshlib.shard_opt_state(
        mesh, st_rep.opt_state))

    ckptlib.save(str(tmp_path), "rep", st_rep)
    restored_z = ckptlib.restore(str(tmp_path), "rep", st_z)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), st_rep.opt_state,
        restored_z.opt_state)
    # the restored moments carry the TEMPLATE's (zero1) layout
    specs = [a.sharding.spec for a in jax.tree.leaves(restored_z.opt_state)
             if hasattr(a, "sharding")]
    assert any("data" in s for s in specs)

    ckptlib.save(str(tmp_path), "zero", st_z)
    restored_rep = ckptlib.restore(str(tmp_path), "zero", st_rep)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), st_z.opt_state,
        restored_rep.opt_state)
