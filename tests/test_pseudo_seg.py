"""Pseudo-segmentation pipeline golden tests vs a torch transliteration of
validate.py:132-257, plus unit checks of the parts."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from vision_transformer_cam_tpu import configs  # noqa: E402
from vision_transformer_cam_tpu.cam import pseudo_seg as ps  # noqa: E402
from vision_transformer_cam_tpu.io import weights as wio  # noqa: E402
from vision_transformer_cam_tpu.models import vit  # noqa: E402

import oracle  # noqa: E402


@pytest.fixture(scope="module")
def model_io():
    model = oracle.make_reference_model(num_classes=20, has_logits=False,
                                        double=True, seed=0)
    sd = oracle.torch_state_dict_numpy(model)
    rng = np.random.default_rng(11)
    imgs = rng.standard_normal((2, 3, 224, 224)).astype(np.float64)
    ref = oracle.run_reference(model, imgs)

    cfg = configs.vit_base_patch16_224_in21k(num_classes=20, has_logits=False)
    cfg = cfg.replace(dtype=jnp.float64, param_dtype=jnp.float64)
    params = wio.pytree_from_state_dict(sd, cfg)
    out = vit.apply(params, jnp.asarray(imgs.transpose(0, 2, 3, 1)), cfg)
    return ref, out, cfg


def test_pseudo_seg_matches_reference(model_io):
    ref, out, cfg = model_io
    pcfg = configs.PseudoSegConfig()
    sizes = [(37, 45), (64, 48)]  # odd original sizes, per image
    ours = ps.pseudo_seg_batch(out, cfg, pcfg, sizes)
    for i, size in enumerate(sizes):
        want = oracle.run_reference_pseudo_seg(
            ref["head1_logits"][i], ref["head1_weight"],
            ref["top_patch_embeds"][i], ref["attn_matrix"][11][i],
            ref["attn_weights"][:, i], size,
            cls_threshold=pcfg.cls_threshold, fg_cos=pcfg.fg_cos_threshold,
            bg_thr=pcfg.bg_rollout_threshold)
        assert ours[i].shape == size
        assert ours[i].dtype == np.uint8
        np.testing.assert_array_equal(ours[i], want)


def test_pseudo_seg_low_threshold_exercises_fg(model_io):
    """With random weights cos-sims rarely exceed 0.5; force fg/bg through
    with loose thresholds so the class-mapping path is actually exercised."""
    ref, out, cfg = model_io
    pcfg = configs.PseudoSegConfig(cls_threshold=0.4, fg_cos_threshold=-1.0,
                                   bg_rollout_threshold=0.0)
    sizes = [(30, 41), (28, 28)]
    ours = ps.pseudo_seg_batch(out, cfg, pcfg, sizes)
    for i, size in enumerate(sizes):
        want = oracle.run_reference_pseudo_seg(
            ref["head1_logits"][i], ref["head1_weight"],
            ref["top_patch_embeds"][i], ref["attn_matrix"][11][i],
            ref["attn_weights"][:, i], size,
            cls_threshold=pcfg.cls_threshold, fg_cos=pcfg.fg_cos_threshold,
            bg_thr=pcfg.bg_rollout_threshold)
        np.testing.assert_array_equal(ours[i], want)
        assert ours[i].max() >= 1  # some foreground got through


def test_np_bilinear_matches_torch():
    import torch
    rng = np.random.default_rng(0)
    x = rng.standard_normal((5, 14, 14))
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x)[None], size=(50, 37), mode="bilinear",
        align_corners=False)[0].numpy()
    got = ps.np_bilinear_resize(x, (50, 37))
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_patch_class_assignment_mode_semantics():
    """Hand case: tie-break = smallest class; empty patch = the filler
    num_classes+1+p (== the reference's literal 21+p for its 20 classes —
    basing it on num_classes keeps fillers collision-free for bigger
    heads)."""
    probs = jnp.asarray([[0.95, 0.95, 0.0, 0.0]])          # classes 0,1 on
    kernel_t = jnp.asarray([[  # [C=4, D=6]
        [3., 0., 3., 0., 0., 0.],
        [0., 3., 0., 3., 0., 0.],
        [9., 9., 9., 9., 9., 9.],   # gated off (prob 0) -> -10
        [9., 9., 9., 9., 9., 9.],
    ]])[0]
    # features 0,2 -> class 0; 1,3 -> class 1; 4,5 -> all -10 -> argmax=0
    top = jnp.asarray([[  # [K=3, D=6] contributions
        [9., 9., 0., 0., 9., 0.],   # features 0,1,4 -> patch 0
        [0., 0., 9., 9., 0., 0.],   # features 2,3 -> patch 1
        [0., 0., 0., 0., 0., 9.],   # feature 5 -> patch 2
    ]])
    got = np.asarray(ps._patch_class_assignment(probs, kernel_t, top, 0.9))
    # patch 0: classes {0:2, 1:1} -> 0 (features 0(cls0),1(cls1),4(cls0))
    # patch 1: classes {0:1, 1:1} tie -> smallest = 0... feature2=cls0,3=cls1
    # patch 2: feature 5 -> cls 0 (all gated -10, argmax first = 0)
    np.testing.assert_array_equal(got[0], [0, 0, 0])
    # empty patch: no features anywhere -> filler
    top_empty = top.at[:, :, 2].set(0.0)  # nothing "wins" patch 2... still
    # argmax assigns every feature somewhere; force all features to patch 0
    top_all0 = jnp.zeros_like(top).at[:, 0, :].set(1.0)
    got2 = np.asarray(ps._patch_class_assignment(probs, kernel_t, top_all0,
                                                 0.9))
    nc = probs.shape[-1]
    np.testing.assert_array_equal(got2[0], [0, nc + 1 + 1, nc + 1 + 2])


def test_native_compose_bit_identical():
    """The native fused compose (native/vitcam_io.cc vitcam_compose_*) must
    be BIT-identical to the numpy reference path — all-double math with the
    same lerp expression order.  Random maps at several odd VOC-like sizes,
    thresholds loose enough that fg/bg gates pass both ways."""
    from vision_transformer_cam_tpu.io import native_loader
    if not native_loader.compose_available():
        pytest.skip("native library unavailable (no toolchain)")
    r = np.random.RandomState(3)
    n, k, g = 6, 16, 14
    cos = r.uniform(-1.0, 1.0, (n, k, g, g))
    bg = r.uniform(0.0, 1.0, (n, g, g))
    p2c = r.randint(0, 40, (n, k)).astype(np.int64)
    sizes = [(375, 500), (500, 333), (1, 1), (17, 503), (281, 500), (33, 7)]
    pcfg = configs.PseudoSegConfig(fg_cos_threshold=0.1,
                                   bg_rollout_threshold=0.3)
    batch = native_loader.compose_batch(cos, bg, p2c, sizes,
                                        pcfg.fg_cos_threshold,
                                        pcfg.bg_rollout_threshold)
    for i in range(n):
        want = ps.compose_pseudo_seg(p2c[i], cos[i], bg[i], sizes[i], pcfg,
                                     allow_native=False)
        np.testing.assert_array_equal(ps._narrow_seg(batch[i]), want)
        # the single-image entry (native-routed) agrees too
        got = ps.compose_pseudo_seg(p2c[i], cos[i], bg[i], sizes[i], pcfg)
        assert got.dtype == want.dtype
        np.testing.assert_array_equal(got, want)


def test_sabotage_power_of_bg_gate():
    """Protocol-power regression check (round-4 verdict item 8): the
    pseudo-seg pipeline's mIoU must be SENSITIVE to the bg rollout gate, so
    a regression in the gate plumbing (threshold not applied, normalization
    moved, rollout row mis-sliced) fails CI instead of hiding behind a flat
    metric.

    The trained-model power proof lives in BENCHMARKS (quality_eval
    --sabotage on the TPU: a 600-step freeze-4 fine-tune).  Tiny models
    don't learn the protocol on CPU in test time, so this fabricates a
    localizing ViTCAMOutput whose statistics mirror the measured trained
    model (seg_diagnose, 600-step freeze-4 run): winner_v saturated >= 0.5
    on fg AND bg (cos maps collapse — ALL discrimination flows through the
    bg gate + class assignment), bg rollout values spread over [0.1, 1] on
    GT-fg patches (measured mean 0.57) and ~0.005 on bg.  Asserts:
      1. truth protocol mIoU is high (the gate works);
      2. the sabotaged gate (0.05 -> 0.5, quality_eval --sabotage) visibly
         degrades it;
      3. removing the gate entirely (threshold 0.0) craters it — the gate
         carries the discrimination, exactly as measured."""
    import importlib.util
    import pathlib

    from vision_transformer_cam_tpu.cam.pseudo_seg import pseudo_seg_batch
    from vision_transformer_cam_tpu.models.vit import ViTCAMOutput
    from vision_transformer_cam_tpu.utils.metrics import ConfusionMatrix
    spec = importlib.util.spec_from_file_location(
        "quality_eval", pathlib.Path(__file__).resolve().parents[1]
        / "scripts/quality_eval.py")
    qe = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(qe)

    NC, B, IMG = 20, 24, 64
    cfg = configs.ViTCAMConfig(img_size=IMG, patch_size=8, embed_dim=18,
                               num_classes=NC, depth=6, num_heads=1,
                               top_k_patches=8)
    cfg = cfg.replace(dtype=jnp.float32, param_dtype=jnp.float32)
    g, P, N = cfg.grid_size, cfg.grid_size ** 2, cfg.seq_len
    K, D = cfg.top_k_patches, cfg.embed_dim
    r = np.random.RandomState(0)
    _, labels, segs = qe.make_batch(1234, B, img=IMG, with_seg=True)
    labels = np.asarray(labels)
    px = IMG // g
    fg_patch = (segs.reshape(B, g, px, g, px) > 0).mean(
        axis=(2, 4)).reshape(B, P) > 0.5

    cls_rows = np.full((cfg.depth, B, N), 1.0 / N, np.float32)
    head1_logits = np.full((B, NC), -5.0, np.float32)
    tokens = np.zeros((B, N, D), np.float32)
    top_embeds = np.zeros((B, K, D), np.float32)
    top_idx = np.zeros((B, K), np.int32)
    kernel_t = np.zeros((NC, D), np.float32)
    for b in range(B):
        c = int(np.argmax(labels[b]))
        head1_logits[b, c] = 5.0       # sigmoid 0.993 >= cls_threshold 0.9
        kernel_t[c, :] = 1.0           # every feature -> the predicted class
        v = np.full(P, 0.005, np.float64)
        v[fg_patch[b]] = r.uniform(0.10, 1.0, int(fg_patch[b].sum()))
        cls_rows[5:, b, 1:] = v[None, :]   # bg_blocks_from=5 reads these
        # every patch shares the fg direction: winner_v ~0.92 everywhere,
        # mirroring the measured saturation
        tokens[b, 1:, D - 2] = 1.0
        top_idx[b] = np.argsort(-v)[:K]
        for k in range(K):
            top_embeds[b, k, 2 * k:2 * k + 2] = 0.3  # contrib identity
            top_embeds[b, k, D - 2] = 1.0
    out = ViTCAMOutput(
        logits=jnp.asarray(head1_logits), dist_logits=None,
        head1_logits=jnp.asarray(head1_logits),
        attn_cls_rows=jnp.asarray(cls_rows),
        top_patch_embeds=jnp.asarray(top_embeds),
        top_patch_idx=jnp.asarray(top_idx),
        head1_kernel=jnp.asarray(kernel_t.T),
        attn_headmean=None, attn_perhead=None, block_outputs=None,
        rollout_row=None, tokens_prenorm=jnp.asarray(tokens))

    def miou(pcfg):
        preds = pseudo_seg_batch(out, cfg, pcfg, [(IMG, IMG)] * B)
        preds = np.stack(preds).astype(np.int64)
        preds[preds > NC] = 0
        cm = ConfusionMatrix(NC)
        cm.update(segs.reshape(-1).astype(np.int64), preds.reshape(-1))
        _, _, iou = cm.compute()
        return float(np.nanmean(np.asarray(iou)) * 100)

    good = miou(configs.PseudoSegConfig())
    bad = miou(configs.PseudoSegConfig(bg_rollout_threshold=0.5))
    off = miou(configs.PseudoSegConfig(bg_rollout_threshold=0.0))
    assert good >= 50, f"truth mIoU {good} — the gate should localize"
    assert bad <= 0.8 * good, f"sabotage {bad} vs truth {good}: no power"
    assert off <= good / 5, f"gate-off {off} vs truth {good}: the bg gate " \
                            "no longer carries the discrimination"
