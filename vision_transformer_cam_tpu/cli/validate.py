"""Validation + pseudo-segmentation entry (validate.py:57-326).

Same capability surface as the reference CLI, rebuilt batched: multi-label
mAP from the top-16 patch head, pseudo-seg PNG export with the VOC palette,
and 21-class mIoU against the SegmentationClass ground truth.  Improvements
over the reference, by design: batch size is honored (the reference forces
bs=1, validate.py:97-102), the palette needs no palette.json side file (the
built-in VOC colormap is bit-identical), and paths have no hard-coded
defaults.
"""

from __future__ import annotations

import argparse
import datetime
import os
import sys
import time

import jax
import numpy as np

from vision_transformer_cam_tpu import configs
from vision_transformer_cam_tpu.cam.pseudo_seg import pseudo_seg_batch
from vision_transformer_cam_tpu.data.loader import BatchLoader
from vision_transformer_cam_tpu.data.palette import (load_palette_json,
                                                     save_indexed_png_batch)
from vision_transformer_cam_tpu.data.voc12 import VOC12Dataset
from vision_transformer_cam_tpu.io import weights as wio
from vision_transformer_cam_tpu.models import vit
from vision_transformer_cam_tpu.utils.metrics import (ConfusionMatrix,
                                                      compute_mAP)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    # reference flag surface (validate.py:296-314)
    p.add_argument("--model_name", type=str, default="vit_base",
                   help="'vit_base' (reference alias) or a MODEL_ZOO name")
    p.add_argument("--num_classes", type=int, default=20)
    p.add_argument("--weights", type=str, default="",
                   help=".pth / .npz fine-tuned weights or an orbax "
                        "checkpoint dir from cli.train; empty = random")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--dataset_path", type=str, required=True,
                   help="VOC2012 root (contains JPEGImages/)")
    p.add_argument("--val_img_name_path", type=str, required=True)
    p.add_argument("--ori_cam_path", type=str, default="",
                   help="when set, export attention-rollout CAM overlays "
                        "(one jpg per image) into this directory")
    p.add_argument("--device", type=str, default="",
                   help="ignored (jax uses its default device)")
    p.add_argument("--cls_labels_path", type=str, default="")
    p.add_argument("--seg_pred_dir", type=str, default="./validate_seg_pred")
    p.add_argument("--palette_json", type=str, default="",
                   help="optional palette.json; default = built-in VOC map")
    p.add_argument("--limit", type=int, default=0,
                   help="stop after N images (smoke runs)")
    p.add_argument("--attn_impl", type=str, default="auto",
                   choices=["auto", "xla", "pallas"],
                   help="auto = fused Pallas kernel on TPU, XLA elsewhere")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard each batch over all devices (batch_size must "
                        "divide by the device count)")
    p.add_argument("--seq_parallel", type=int, default=0, metavar="N",
                   help="additionally shard the TOKEN axis over N devices "
                        "(sequence parallelism — cfg.seq_axis); batch over "
                        "the remaining devices/N.  For long-N models "
                        "(ViT-L@384); XLA attention path (a pallas "
                        "attn_impl is overridden)")
    p.add_argument("--batch_global_mask_norm", action="store_true",
                   help="couple the rollout mask normalization across the "
                        "eval batch (the reference's TRAINING semantics; "
                        "its validate runs batch 1 where the global max is "
                        "per-sample, which is our default)")
    p.add_argument("--native_decode", action="store_true",
                   help="use the C++ batched JPEG pipeline (threaded "
                        "decode+resize+normalize in one call; PIL "
                        "fallback when the .so is unavailable).  Pixels "
                        "match PIL within ~2 uint8 quanta — the default "
                        "PIL path is the exact reference-parity pipeline")
    from vision_transformer_cam_tpu import serving as _serving
    p.add_argument("--serving", type=str, default="off",
                   choices=list(_serving.SERVING_MODES),
                   help="fast serving config (int8 modes calibrate on the "
                        "first images of the split; quality deltas in "
                        "BENCHMARKS.md — <= 0.001 mAP): "
                        + _serving.serving_mode_help())
    return p


def val(args) -> dict:
    os.makedirs(args.seg_pred_dir, exist_ok=True)
    palette = load_palette_json(args.palette_json) if args.palette_json \
        else None

    factory = configs.resolve_model(args.model_name)
    cfg = factory(num_classes=args.num_classes)
    cfg = cfg.replace(representation_size=None)  # has_logits=False
    from vision_transformer_cam_tpu.utils import tune_tpu_for_long_sequence
    tune_tpu_for_long_sequence(cfg)  # N>512: scoped-VMEM, pre-backend-init
    impl = args.attn_impl
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    cfg = cfg.replace(attn_impl=impl)
    if not args.batch_global_mask_norm:
        # Reference-validate semantics: the reference's val DataLoader is
        # batch_size=1 (validate.py:98), so its global-max mask
        # normalization (vit_model.py:335,372) is the PER-SAMPLE max at
        # inference.  Running our batched loop with batch-global
        # normalization couples images (one image's weak attention peak +
        # another's strong one ⇒ the weak image's whole patch set drops
        # below mask_threshold and is bg-masked); per-sample reproduces
        # what the reference's per-image validate actually computes AND
        # makes results independent of batch composition.
        cfg = cfg.replace(per_sample_mask_norm=True)
    pcfg = configs.PseudoSegConfig()
    if args.weights:
        # full fine-tuned load, heads kept (validate.py:106-110)
        params = wio.load_weights(args.weights, cfg, del_keys=())
    else:
        params = vit.init(cfg, jax.random.key(0))

    ds = VOC12Dataset(args.val_img_name_path, args.dataset_path,
                      cls_labels_path=args.cls_labels_path or None,
                      seg_label_flag=True, img_size=cfg.img_size)
    # --native_decode is an explicit opt-in (CLAUDE.md: perf knobs opt in):
    # the default PIL path IS the reference-parity pixel pipeline the
    # uint8-identical pseudo-seg claim rests on; the C++ batched decode is
    # pinned to it only within ~2 uint8 quanta (test_native_loader_matches
    # _pil), which can flip argmax ties in the exported PNGs.
    loader = BatchLoader(ds, args.batch_size, shuffle=False, drop_last=False,
                         native_decode=args.native_decode)

    if args.serving != "off":
        from vision_transformer_cam_tpu import serving
        calib = None
        if args.serving.startswith("int8"):
            # calibrate through the SAME pixel pipeline that will serve
            # (native vs PIL differ by up to ~2 uint8 quanta)
            calib_loader = BatchLoader(ds, min(8, len(ds)), shuffle=False,
                                       drop_last=False,
                                       native_decode=args.native_decode)
            calib = next(iter(calib_loader))["image"]
        params, cfg = serving.apply_serving_mode(params, cfg, args.serving,
                                                 calib_images=calib)
        if args.attn_impl != "auto":
            # an explicit --attn_impl wins over the mode's pallas default
            cfg = cfg.replace(attn_impl=impl)

    mesh = sharding = None
    if args.seq_parallel:
        from vision_transformer_cam_tpu.parallel import (apply_seq_parallel,
                                                         data_sharding,
                                                         seq_parallel_mesh)
        mesh = seq_parallel_mesh(args.seq_parallel)
        sharding = data_sharding(mesh)
        cfg = apply_seq_parallel(cfg)
    elif args.data_parallel:
        from vision_transformer_cam_tpu.parallel import (data_sharding,
                                                         make_mesh)
        mesh = make_mesh((-1,), ("data",))
        sharding = data_sharding(mesh)
        if cfg.attn_impl == "pallas":
            # shard_map the Pallas kernels over the batch axis — XLA's
            # auto-SPMD otherwise replicates pallas_call (every device
            # would redo the full batch); see configs.ViTCAMConfig.data_axis
            cfg = cfg.replace(data_axis="data")

    confmat = ConfusionMatrix(args.num_classes)
    all_ap, n_done, t0 = [], 0, time.time()
    try:
        from tqdm import tqdm
        loader_iter = tqdm(loader, file=sys.stdout)
    except ImportError:
        loader_iter = loader
    if args.ori_cam_path:
        os.makedirs(args.ori_cam_path, exist_ok=True)
    import contextlib
    # jax.set_mesh (not the plain `with mesh:` resource-env manager) is what
    # supplies the context mesh shard_map reads inside nested jit traces
    mesh_ctx = jax.set_mesh(mesh) if mesh is not None \
        else contextlib.nullcontext()
    with mesh_ctx:
        results = _val_loop(args, loader_iter, params, cfg, pcfg, mesh,
                            sharding, palette, confmat, all_ap, ds, t0)
    return results


def _val_loop(args, loader_iter, params, cfg, pcfg, mesh, sharding, palette,
              confmat, all_ap, ds, t0):
    n_done = 0
    # warm end-to-end throughput (BASELINE config #3's pipeline number):
    # the first batch absorbs the jit compile (1-5 min through the TPU
    # tunnel), so the honest decode->device->PNG rate starts after it
    t_warm, n_warm = None, 0
    for batch in loader_iter:
        images = batch["image"]
        run_cfg = cfg
        if sharding is not None \
                and images.shape[0] % mesh.shape["data"] == 0:
            images = jax.device_put(images, sharding)
        elif cfg.data_axis is not None:
            # partial tail batch runs unsharded: drop the shard_map wrap
            # (its batch-divisibility requirement can't hold here)
            run_cfg = cfg.replace(data_axis=None)
        out = vit.apply(params, images, run_cfg,
                        need_rollout=bool(args.ori_cam_path))
        if args.ori_cam_path:
            # BASELINE config #3: rollout-CAM export with palette overlay
            # (batched native renderer when available — BENCHMARKS
            # "End-to-end"; per-image Python fallback inside)
            from vision_transformer_cam_tpu.cam.render import (
                render_rollout_overlays)
            from vision_transformer_cam_tpu.data.voc12 import get_img_path
            from vision_transformer_cam_tpu.ops.rollout import (
                cam_from_rollout_row)
            cams = np.asarray(jax.device_get(
                cam_from_rollout_row(out.rollout_row, cfg.grid_size)))
            render_rollout_overlays(
                cams,
                [get_img_path(n, args.dataset_path) for n in batch["name"]],
                [os.path.join(args.ori_cam_path, f"{n}_rollout_cam.jpg")
                 for n in batch["name"]])
        segs = batch["seg_label"] if isinstance(batch["seg_label"], list) \
            else list(batch["seg_label"])
        sizes = [s.shape for s in segs]
        preds = pseudo_seg_batch(out, cfg, pcfg, sizes)
        probs = np.asarray(jax.device_get(jax.nn.sigmoid(out.head1_logits)))
        save_indexed_png_batch(
            [os.path.join(args.seg_pred_dir, f"{n}.png")
             for n in batch["name"]], preds, palette)
        for i, name in enumerate(batch["name"]):
            # Documented divergence: top-16 patches no feature maps to carry
            # the reference's arange filler 21+p (validate.py:146), which
            # overflows a 21-class confusion matrix — the reference would
            # crash in bincount (utils.py:44) on such an image.  Fold those
            # no-evidence patches to background before scoring; the exported
            # PNG above keeps the reference-exact filler values.
            scored = preds[i].reshape(-1).astype(np.int64)
            scored[scored > args.num_classes] = 0
            confmat.update(segs[i].reshape(-1), scored)
        if "label" in batch:
            all_ap += compute_mAP(batch["label"], probs)
        n_done += len(batch["name"])
        if t_warm is None:
            t_warm, n_warm = time.time(), n_done
        desc = (f"[val] {n_done}/{len(ds)} "
                f"mAP {np.mean(all_ap) if all_ap else float('nan'):.4f} "
                f"({(time.time()-t0)/n_done:.3f}s/img)")
        if hasattr(loader_iter, "set_description"):
            loader_iter.set_description(desc)
        else:
            print(desc, flush=True)
        if args.limit and n_done >= args.limit:
            break

    acc_global, acc, iou = confmat.compute()
    results = {
        "mAP": float(np.mean(all_ap)) if all_ap else float("nan"),
        "global_acc": float(acc_global),
        # nanmean: classes absent from both GT and prediction yield NaN IoU
        "mIoU": float(np.nanmean(np.asarray(iou)) * 100),
        "n_images": n_done,
    }
    if t_warm is not None and n_done > n_warm:
        # JPEG decode -> normalize -> device forward -> pseudo-seg ->
        # palette-PNG (+ CAM overlay) writes, per wall-clock second,
        # excluding the compile-bearing first batch
        results["img_per_s_end_to_end"] = round(
            (n_done - n_warm) / (time.time() - t_warm), 2)
        print(f"end-to-end (warm) throughput: "
              f"{results['img_per_s_end_to_end']} img/s")
    print(confmat)
    stamp = datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
    with open(f"validating_log_{stamp}.txt", "a") as f:
        f.write(f"[images: {n_done}]\n"
                f"mAP_multiple_class_label: {results['mAP']:.5f}     \n\n")
    return results


def main(argv=None):
    from vision_transformer_cam_tpu.utils import honor_jax_platforms_env
    honor_jax_platforms_env()
    args = build_parser().parse_args(argv)
    return val(args)


if __name__ == "__main__":
    main()
