"""Auxiliary subsystems: profiling utilities, generic dataset, pos-embed
interpolation on checkpoint load."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from vision_transformer_cam_tpu import configs  # noqa: E402
from vision_transformer_cam_tpu.io import weights as wio  # noqa: E402
from vision_transformer_cam_tpu.models import vit  # noqa: E402
from vision_transformer_cam_tpu.utils import profiling  # noqa: E402


def test_model_flops_vitb():
    cfg = configs.vit_base_patch16_224_in21k(num_classes=20,
                                             has_logits=False)
    r = profiling.model_flops(cfg, batch=1, with_cam=False)
    # ViT-B/16 @224 is ~17.6 GMACs/image (SURVEY.md §6 quotes that figure)
    assert 16.0 < r["gmacs_per_image"] < 19.0
    assert r["gflops_per_image"] == pytest.approx(2 * r["gmacs_per_image"])
    r2 = profiling.model_flops(cfg, batch=4, with_cam=True)
    assert r2["rollout"] > 0
    assert r2["total"] > 4 * r["total"]


def test_step_timer():
    t = profiling.StepTimer()
    x = jnp.ones((128, 128))
    f = jax.jit(lambda a: a @ a)
    r = f(x)
    t.start()
    dt = t.stop(f(x))
    assert dt > 0 and t.best > 0
    assert t.images_per_sec(128) > 0


def test_generic_dataset(tmp_path):
    import PIL.Image
    from vision_transformer_cam_tpu.data.generic import (PathListDataset,
                                                         collate_fn)
    rng = np.random.default_rng(0)
    paths = []
    for i in range(3):
        p = tmp_path / f"img{i}.png"
        PIL.Image.fromarray(
            rng.integers(0, 255, (30, 40, 3), dtype=np.uint8)).save(p)
        paths.append(str(p))
    ds = PathListDataset(paths, [0, 1, 2], img_size=32)
    assert len(ds) == 3
    item = ds[1]
    assert item["image"].shape == (32, 32, 3)
    assert item["label"] == 1
    batch = collate_fn([ds[i] for i in range(3)])
    assert batch["image"].shape == (3, 32, 32, 3)
    np.testing.assert_array_equal(batch["label"], [0, 1, 2])


def test_pos_embed_interpolation_on_load():
    """A 224px checkpoint loads into a 384px config: pos_embed grid 14->24
    interpolated bicubically; forward runs at the new resolution."""
    cfg224 = configs.ViTCAMConfig(img_size=32, patch_size=8, embed_dim=64,
                                  depth=2, num_heads=4, num_classes=5,
                                  mask_from=0, top_k_patches=4)
    cfg64 = cfg224.replace(img_size=64)  # grid 4 -> 8
    params = vit.init(cfg224, jax.random.key(0))
    sd = wio.state_dict_from_pytree(params, cfg224)
    loaded = wio.pytree_from_state_dict(sd, cfg64)
    assert loaded["pos_embed"].shape == (1, cfg64.seq_len, 64)
    x = jnp.zeros((1, 64, 64, 3))
    out = vit.apply(loaded, x, cfg64)
    assert out.logits.shape == (1, 5)
    # upsampled grid stays in the value range and correlates with the
    # original (bicubic is half-pixel, so corners aren't exactly preserved)
    old_grid = np.asarray(params["pos_embed"])[0, 1:].reshape(4, 4, 64)
    new_grid = np.asarray(loaded["pos_embed"])[0, 1:].reshape(8, 8, 64)
    assert abs(new_grid.mean() - old_grid.mean()) < 1e-3
    # 2x2 block means of the 8x8 grid approximate the 4x4 originals
    block_means = new_grid.reshape(4, 2, 4, 2, 64).mean(axis=(1, 3))
    corr = np.corrcoef(block_means.ravel(), old_grid.ravel())[0, 1]
    assert corr > 0.95


def test_distributed_helpers():
    from vision_transformer_cam_tpu import parallel
    assert parallel.get_world_size() == 8  # the virtual CPU mesh
    assert parallel.get_rank() == 0 and parallel.is_main_process()
    # reduce_value inside a shard_map body
    from jax.sharding import PartitionSpec as P
    mesh = parallel.make_mesh((-1,), ("data",))
    x = jnp.arange(8.0)

    def body(v):
        return parallel.reduce_value(v, average=True)

    out = jax.shard_map(body, mesh=mesh, in_specs=P("data"),
                        out_specs=P())(x)
    assert float(out[0]) == pytest.approx(np.arange(8).mean())


def test_same_seeds():
    from vision_transformer_cam_tpu.utils import same_seeds
    k1 = same_seeds(0)
    a = np.random.rand(3)
    k2 = same_seeds(0)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(np.asarray(jax.random.key_data(k1)),
                                  np.asarray(jax.random.key_data(k2)))


def test_distilled_state_dict_roundtrip():
    """state_dict_from_pytree must export dist_token/head_dist so the
    distilled round-trip closes (review finding: loaded but never
    exported -> KeyError on reload with no init fallback)."""
    cfg = configs.ViTCAMConfig(img_size=32, patch_size=8, embed_dim=64,
                               depth=2, num_heads=4, num_classes=5,
                               distilled=True)
    params = vit.init(cfg, jax.random.key(0))
    sd = wio.state_dict_from_pytree(params, cfg)
    assert "dist_token" in sd and "head_dist.weight" in sd
    back = wio.pytree_from_state_dict(sd, cfg, params=None, del_keys=())
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-6), params, back)


def test_resolve_model_strict_with_alias():
    """'vit_base' (the reference's --model_name value) resolves; unknown
    names RAISE instead of silently running ViT-B (review finding)."""
    assert configs.resolve_model("vit_base") \
        is configs.MODEL_ZOO["vit_base_patch16_224_in21k"]
    assert configs.resolve_model("vit_large_patch16_384") \
        is configs.MODEL_ZOO["vit_large_patch16_384"]
    with pytest.raises(SystemExit, match="unknown model_name"):
        configs.resolve_model("vit_larg_patch16_384")


def test_check_cli_flags_strict():
    """utils.check_cli_flags (the scripts' shared strict parser guard):
    a typo'd flag must exit loudly instead of being silently ignored —
    e.g. quality_eval `--sed 1` reusing seed 0 poisons the replicate-vs-
    structural-noise comparison the flag exists for (review finding)."""
    from vision_transformer_cam_tpu.utils import check_cli_flags
    # valid: bool flag, value flag, and bare positional tokens (the
    # qblock_sweep candidate list) all pass
    check_cli_flags(["prog", "--seed", "1", "--f32", "256", "384"],
                    bool_flags=("--f32",), value_flags=("--seed",))
    with pytest.raises(SystemExit, match="unknown flag --sed"):
        check_cli_flags(["prog", "--sed", "1"],
                        bool_flags=(), value_flags=("--seed",))
    with pytest.raises(SystemExit, match="--seed needs a value"):
        check_cli_flags(["prog", "--seed", "--f32"],
                        bool_flags=("--f32",), value_flags=("--seed",))
    with pytest.raises(SystemExit, match="needs a value"):
        check_cli_flags(["prog", "--seed"],
                        bool_flags=(), value_flags=("--seed",))


def test_matmul_precision_knob_reaches_hlo():
    """cfg.matmul_precision='highest' must bake HIGHEST-precision dots into
    the lowered program (on TPU the backend default lowers f32 dots to bf16
    MXU passes — a ~5e-3-class CAM deviation vs f64, so the ≤1e-5 parity
    claim NEEDS this knob; BENCHMARKS 'f32 fidelity on TPU').  On CPU the
    numbers are identical either way — only the HLO annotation changes."""
    cfg = configs.ViTCAMConfig(img_size=32, patch_size=8, embed_dim=64,
                               depth=2, num_heads=2, num_classes=5,
                               matmul_precision="highest")
    params = vit.init(cfg, jax.random.key(0))
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    txt = jax.jit(
        lambda p, xx: vit.forward(p, xx, cfg).logits).lower(params, x) \
        .as_text()
    assert "HIGHEST" in txt
    base_txt = jax.jit(
        lambda p, xx: vit.forward(
            p, xx, cfg.replace(matmul_precision=None)).logits) \
        .lower(params, x).as_text()
    assert "HIGHEST" not in base_txt
    a = vit.forward(params, x, cfg).logits
    b = vit.forward(params, x, cfg.replace(matmul_precision=None)).logits
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
