"""Single-image CAM prediction/visualization entry (predict.py:63-339).

Produces the reference's 7x6 matplotlib grid — per-block token cosine-sim
matrices, per-block attention maps (raw 14x14 + overlay), the full-rollout
mask overlay, the original image — plus GT-label / top-k prediction text from
sigmoid(head1), and saves it under --out instead of requiring an X display.

Parity notes:
  * per-block maps are row 0 of the row-normalized (A_i + I) (predict.py:
    261-274) — computed from the model's per-layer cls rows, no full
    matrices needed;
  * the rollout mask is the model's fused in-scan joint product
    (predict.py:214-232);
  * the reference normalizes block embeddings with F.normalize over dim=1 of
    the [1, N, C] tensor — i.e. across TOKENS, not features
    (predict.py:193-195); reproduced verbatim so the similarity panels
    match pixel-for-pixel.
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from vision_transformer_cam_tpu import configs
from vision_transformer_cam_tpu.data.transforms import load_and_preprocess
from vision_transformer_cam_tpu.data.voc12 import (CAT_LIST,
                                                   load_image_label_from_xml)
from vision_transformer_cam_tpu.io import weights as wio
from vision_transformer_cam_tpu.models import vit
from vision_transformer_cam_tpu.ops import rollout


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--img_name", type=str, default="2007_003011",
                   help="VOC image id (predict.py:84) or full path to a jpg")
    p.add_argument("--dataset_path", type=str, required=True)
    p.add_argument("--weights", type=str, default="")
    p.add_argument("--num_classes", type=int, default=20)
    p.add_argument("--model_name", type=str, default="vit_base",
                   help="'vit_base' (reference alias) or a MODEL_ZOO name")
    p.add_argument("--out", type=str, default="./predict_cam")
    p.add_argument("--no_figure", action="store_true",
                   help="skip the matplotlib grid (arrays only)")
    p.add_argument("--attn_impl", type=str, default="auto",
                   choices=["auto", "xla", "pallas"],
                   help="auto = fused Pallas kernel on TPU, XLA elsewhere")
    return p


def predict_image(params, cfg, image_chw_hw3: np.ndarray,
                  ori_img_bgr: np.ndarray):
    """Runs the model on one preprocessed image and derives every
    visualization artifact.  Returns a dict of numpy arrays."""
    out = vit.apply(params, image_chw_hw3[None], cfg, need_blocks=True,
                    need_rollout=True)
    g = cfg.grid_size
    h, w = ori_img_bgr.shape[:2]

    per_block = np.asarray(rollout.per_block_cams(
        out.attn_cls_rows, g))[:, 0]                       # [L, g, g] in [0,1]
    cam = np.asarray(rollout.cam_from_rollout_row(
        out.rollout_row, g))[0]                            # [g, g] in [0,1]
    out = jax.device_get(out)

    # token cosine-sim panels with the reference's dim=1 normalize quirk
    blocks = np.asarray(out.block_outputs)[:, 0]           # [L, N, C]
    bn = blocks / np.linalg.norm(blocks, axis=1, keepdims=True).clip(1e-12)
    sim = np.einsum("lnc,lmc->lnm", bn, bn)                # [L, N, N]

    probs = 1.0 / (1.0 + np.exp(-np.asarray(out.head1_logits)[0]))
    return {"per_block_cams": per_block, "rollout_cam": cam,
            "token_sim": sim, "probs_head1": probs,
            "logits": np.asarray(out.logits)[0]}


def render_grid(arts: dict, ori_img_bgr: np.ndarray, str_label: str,
                str_pred: str, out_path: str) -> None:
    """The 7x6 grid layout of predict.py:205-322."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from vision_transformer_cam_tpu.cam.pseudo_seg import np_bilinear_resize

    img_rgb = ori_img_bgr[..., ::-1]
    h, w = img_rgb.shape[:2]
    n_blocks = arts["per_block_cams"].shape[0]
    # 2 blocks (3 panels each) per 6-wide row + a final summary row: the
    # reference's 7x6 at depth 12, scaled to any zoo depth (the hard-coded
    # grid crashed matplotlib for ViT-L/H — review finding)
    rows = -(-3 * n_blocks // 6) + 1
    plt.figure(figsize=(12, 14 * rows / 7.0))
    for i in range(n_blocks):
        plt.subplot(rows, 6, 3 * i + 1)
        plt.imshow(arts["token_sim"][i])
        plt.xticks([]); plt.yticks([])
        plt.subplot(rows, 6, 3 * i + 2)
        plt.imshow(arts["per_block_cams"][i])
        plt.xticks([]); plt.yticks([])
        plt.subplot(rows, 6, 3 * (i + 1))
        plt.imshow(img_rgb)
        up = np_bilinear_resize(arts["per_block_cams"][i], (h, w))
        plt.imshow((up * 255).astype(np.uint8), alpha=0.4, cmap="rainbow")
        plt.xticks([]); plt.yticks([])
    base = (rows - 1) * 6
    plt.subplot(rows, 6, base + 3)
    plt.imshow(img_rgb)
    plt.xticks([]); plt.yticks([])
    plt.subplot(rows, 6, base + 6)
    plt.imshow(img_rgb)
    up = np_bilinear_resize(arts["rollout_cam"], (h, w))
    plt.imshow(up * 255, alpha=0.4, cmap="rainbow")
    plt.xticks([]); plt.yticks([])
    plt.axis("off")
    plt.figtext(0.1, 0.97, str_label, fontsize=10, color="green")
    plt.figtext(0.1, 0.95, str_pred, fontsize=10, color="black")
    plt.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close()


def main(argv=None):
    from vision_transformer_cam_tpu.utils import honor_jax_platforms_env
    honor_jax_platforms_env()
    args = build_parser().parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    factory = configs.resolve_model(args.model_name)
    cfg = factory(num_classes=args.num_classes)
    cfg = cfg.replace(representation_size=None)  # has_logits=False
    from vision_transformer_cam_tpu.utils import tune_tpu_for_long_sequence
    tune_tpu_for_long_sequence(cfg)  # N>512: scoped-VMEM, pre-backend-init
    # single-image CLI: per-sample vs batch-global mask normalization are
    # IDENTICAL at batch 1 (the reference's predict/validate case); set
    # per-sample so the graph matches the batched serving surfaces
    cfg = cfg.replace(per_sample_mask_norm=True)
    impl = args.attn_impl
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    cfg = cfg.replace(attn_impl=impl)
    init_params = vit.init(cfg, jax.random.key(0))
    if args.weights:
        # head keys deleted, strict=False fallback to init (predict.py:117-123)
        params = wio.load_weights(args.weights, cfg, params=init_params,
                                  del_keys=("head.weight", "head.bias"))
    else:
        params = init_params

    if os.path.sep in args.img_name or args.img_name.endswith(".jpg"):
        img_path, name = args.img_name, os.path.splitext(
            os.path.basename(args.img_name))[0]
    else:
        name = args.img_name
        img_path = os.path.join(args.dataset_path, "JPEGImages",
                                name + ".jpg")
    import PIL.Image
    pil = PIL.Image.open(img_path).convert("RGB")
    ori_bgr = np.asarray(pil)[..., ::-1]
    x = load_and_preprocess(img_path, cfg.img_size,
                            np.asarray((0.485, 0.456, 0.406), np.float32),
                            np.asarray((0.229, 0.224, 0.225), np.float32))

    arts = predict_image(params, cfg, x, ori_bgr)

    # GT labels + top-k prediction strings (predict.py:291-309)
    try:
        gt = load_image_label_from_xml(name, args.dataset_path)
    except Exception:
        gt = None
    if gt is not None and gt.sum() > 0:
        gt_idx = np.flatnonzero(gt)
        str_label = "GT labels: " + " ".join(CAT_LIST[i] for i in gt_idx)
        k = len(gt_idx)
    else:
        str_label, k = "GT labels: (unknown)", 1
    order = np.argsort(-arts["probs_head1"])[:k]
    str_pred = " ".join(f"{CAT_LIST[i]}:{arts['probs_head1'][i]:.3}"
                        for i in order)
    print(str_label)
    print("pred: " + str_pred)

    if not args.no_figure:
        out_path = os.path.join(args.out, f"{name}_cam_grid.jpg")
        render_grid(arts, ori_bgr, str_label, str_pred, out_path)
        print(f"saved {out_path}")
    return arts


if __name__ == "__main__":
    main()
