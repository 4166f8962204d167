"""Stage-level diagnosis of the pseudo-seg pipeline on synthetic data.

quality_eval's end-task column (pseudo-seg mIoU) has shown almost no
dynamic range (~13 for every mode, sabotaged or not) even after the
multi-scale object redesign, while mAP sits at 0.96 — so classification
is fine and the loss is somewhere in the localization chain
(validate.py:123-257).  This script fine-tunes the same way and then
prints per-stage statistics of the truth (f32) pipeline so the broken
link is measured, not guessed:

  1. fg gate:   what fraction of pixels pass winner_v >= fg_cos_threshold,
                and the IoU of that mask against the GT foreground;
  2. bg gate:   same for the rollout-row gate (bg_up >= bg_rollout_thr);
  3. classes:   accuracy of patch_to_cls at the top-16 patch centers vs the
                GT class there, plus the filler fraction (patches no
                feature maps to);
  4. end:       class-agnostic IoU of the final nonzero mask, and the
                final per-class mIoU (what quality_eval scores).

  python scripts/seg_diagnose.py [--steps N] [--batch B] [--eval N]
      [--model ZOO] [--fg F] [--bg F] [--cls F]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from quality_eval import NUM_CLASSES, finetune, make_batch
from vision_transformer_cam_tpu import configs
from vision_transformer_cam_tpu.cam import pseudo_seg as ps
from vision_transformer_cam_tpu.models import vit
from vision_transformer_cam_tpu.utils.metrics import ConfusionMatrix


def main():
    from vision_transformer_cam_tpu.utils import (check_cli_flags,
                                                  honor_jax_platforms_env)
    honor_jax_platforms_env()
    check_cli_flags(sys.argv, bool_flags=("--pairs",),
                    value_flags=("--steps", "--batch", "--eval", "--model",
                                 "--fg", "--bg", "--cls", "--seed",
                                 "--objects", "--size_lo", "--size_hi",
                                 "--save_state", "--load_state", "--freeze"),
                    prog="seg_diagnose.py")

    def arg(flag, default, cast=int):
        return cast(sys.argv[sys.argv.index(flag) + 1]) \
            if flag in sys.argv else default

    steps = arg("--steps", 300)
    batch = arg("--batch", 64)
    n_eval = arg("--eval", 64)
    seed = arg("--seed", 0)
    model = sys.argv[sys.argv.index("--model") + 1] \
        if "--model" in sys.argv else "vit_base_patch16_224_in21k"
    pcfg = configs.PseudoSegConfig(
        cls_threshold=arg("--cls", 0.9, float),
        fg_cos_threshold=arg("--fg", 0.5, float),
        bg_rollout_threshold=arg("--bg", 0.05, float))

    data_kw = dict(max_objects=arg("--objects", 1),
                   size_lo=arg("--size_lo", 5), size_hi=arg("--size_hi", 3),
                   pairs="--pairs" in sys.argv)
    base = configs.resolve_model(model)(num_classes=NUM_CLASSES)
    base = base.replace(representation_size=None)
    load = sys.argv[sys.argv.index("--load_state") + 1] \
        if "--load_state" in sys.argv else ""
    if load:
        import pickle
        with open(load, "rb") as f:
            params = pickle.load(f)
    else:
        params = finetune(steps, batch, model, seed=seed,
                          data_kw=data_kw,
                          freeze_below=arg("--freeze", 0))
    if "--save_state" in sys.argv:
        import pickle
        with open(sys.argv[sys.argv.index("--save_state") + 1], "wb") as f:
            pickle.dump(jax.device_get(params), f)
    images, labels, segs = make_batch(9999, n_eval, img=base.img_size,
                                      with_seg=True, **data_kw)

    f32 = base.replace(dtype=jnp.float32, param_dtype=jnp.float32,
                       matmul_precision="highest", per_sample_mask_norm=True)
    p32 = jax.tree.map(lambda a: a.astype(jnp.float32), params)
    out = jax.jit(lambda p, x: vit.forward(p, x, f32, need_rollout=True))(
        p32, images)
    dev = jax.device_get(ps.pseudo_seg_device(out, f32, pcfg))
    size = segs.shape[1:]
    # always dump the raw eval tensors for offline (CPU) analysis — 3 MB
    np.savez("/tmp/segdiag_last.npz", patch_to_cls=dev.patch_to_cls,
             cos_maps=dev.cos_maps, bg_row=dev.bg_row,
             topi=jax.device_get(out.top_patch_idx), segs=segs,
             labels=np.asarray(labels),
             cls_rows=jax.device_get(out.attn_cls_rows))
    # per-block mask dynamics: fraction of patches the in-model feedback
    # marks bg after each block (the mask block l computes gates block l+1)
    from vision_transformer_cam_tpu.ops.rollout import aug_cls_row
    rows = jax.device_get(out.attn_cls_rows)          # [L, B, N]
    for lyr in range(rows.shape[0]):
        m = np.asarray(aug_cls_row(jnp.asarray(rows[lyr])))[:, 1:]
        m = m / m.max(axis=-1, keepdims=True)
        frac = (m < 0.25).mean(axis=-1)               # per image
        print(f"  block {lyr:2d}: masked-frac mean {frac.mean():.3f} "
              f"med {np.median(frac):.3f} max {frac.max():.3f}")

    stats = dict(fg_pass=[], bg_pass=[], gt_fg=[], fg_iou=[], bg_iou=[],
                 nonzero=[], end_fg_iou=[], filler=[], cls_acc=[],
                 winner_v_fg=[], winner_v_bg=[], bgup_fg=[], bgup_bg=[])
    cm = ConfusionMatrix(NUM_CLASSES)
    g = f32.grid_size
    patch_px = f32.img_size // g
    topi = jax.device_get(out.top_patch_idx)
    for i in range(n_eval):
        cos_up = ps.np_bilinear_resize(dev.cos_maps[i].astype(np.float64),
                                       size)
        winner = np.argmax(cos_up, axis=0)
        winner_v = np.max(cos_up, axis=0)
        bg_up = ps.np_bilinear_resize(dev.bg_row[i].astype(np.float64), size)
        fg = winner_v >= pcfg.fg_cos_threshold
        bg = bg_up >= pcfg.bg_rollout_threshold
        gt_fg = segs[i] > 0
        stats["gt_fg"].append(gt_fg.mean())
        stats["fg_pass"].append(fg.mean())
        stats["bg_pass"].append(bg.mean())
        stats["winner_v_fg"].append(winner_v[gt_fg].mean()
                                    if gt_fg.any() else np.nan)
        stats["winner_v_bg"].append(winner_v[~gt_fg].mean())
        stats["bgup_fg"].append(bg_up[gt_fg].mean() if gt_fg.any() else np.nan)
        stats["bgup_bg"].append(bg_up[~gt_fg].mean())

        def iou(a, b):
            inter = (a & b).sum()
            union = (a | b).sum()
            return inter / union if union else np.nan

        stats["fg_iou"].append(iou(fg, gt_fg))
        stats["bg_iou"].append(iou(bg, gt_fg))
        seg = ps.compose_pseudo_seg(dev.patch_to_cls[i], dev.cos_maps[i],
                                    dev.bg_row[i], size, pcfg)
        scored = seg.reshape(-1).astype(np.int64)
        scored[scored > NUM_CLASSES] = 0
        cm.update(segs[i].reshape(-1).astype(np.int64), scored)
        stats["nonzero"].append((seg > 0).mean())
        stats["end_fg_iou"].append(iou(seg.reshape(size) > 0, gt_fg))
        # top-16 patch class assignment vs the GT class at the patch center
        p2c = dev.patch_to_cls[i]
        stats["filler"].append((p2c > NUM_CLASSES).mean())
        acc = []
        for k in range(p2c.shape[0]):
            if p2c[k] > NUM_CLASSES:
                continue
            pi = int(topi[i, k])
            cy = (pi // g) * patch_px + patch_px // 2
            cx = (pi % g) * patch_px + patch_px // 2
            gt_c = int(segs[i][cy, cx])
            acc.append(float(gt_c == p2c[k] + 1))
        stats["cls_acc"].append(np.mean(acc) if acc else np.nan)

    def m(k):
        return float(np.nanmean(np.asarray(stats[k], np.float64)))

    _, _, iou_c = cm.compute()
    print(f"\nGT fg fraction                 {m('gt_fg'):.3f}")
    print(f"fg gate pass fraction          {m('fg_pass'):.3f}   "
          f"(winner_v mean on GT-fg {m('winner_v_fg'):.3f} / on GT-bg "
          f"{m('winner_v_bg'):.3f}; thr {pcfg.fg_cos_threshold})")
    print(f"bg gate pass fraction          {m('bg_pass'):.3f}   "
          f"(bg_up mean on GT-fg {m('bgup_fg'):.4f} / on GT-bg "
          f"{m('bgup_bg'):.4f}; thr {pcfg.bg_rollout_threshold})")
    print(f"fg-gate-vs-GT-fg IoU           {m('fg_iou'):.3f}")
    print(f"bg-gate-vs-GT-fg IoU           {m('bg_iou'):.3f}")
    print(f"final nonzero fraction         {m('nonzero'):.3f}")
    print(f"final fg-mask IoU              {m('end_fg_iou'):.3f}")
    print(f"top-16 filler fraction         {m('filler'):.3f}")
    print(f"top-16 class accuracy @center  {m('cls_acc'):.3f}")
    print(f"per-class IoU: {[f'{v:.2f}' for v in np.asarray(iou_c)]}")
    print(f"mIoU {float(np.nanmean(np.asarray(iou_c)) * 100):.2f}")


if __name__ == "__main__":
    main()
