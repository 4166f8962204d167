"""Distributed fine-tune entry (train_and_validate.py:34-273).

Same hyperparameter surface as the reference argparse (timm-style names,
train_and_validate.py:198-269), driving the SPMD train loop in
train/loop.py.  `--freeze_layers` and lr scaling lr*bs/512 behave as the
reference's; `--syncBN` is accepted and ignored (the model has no BN —
SURVEY.md §2.3).
"""

from __future__ import annotations

import argparse
import os

import jax

from vision_transformer_cam_tpu import configs
from vision_transformer_cam_tpu.io import weights as wio
from vision_transformer_cam_tpu.models import vit
from vision_transformer_cam_tpu.train import loop as looplib


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_name", type=str,
                   default="vit_base_patch16_224_in21k",
                   choices=sorted(configs.MODEL_ZOO)
                   + sorted(configs.MODEL_ALIASES))
    p.add_argument("--num_classes", type=int, default=20)
    p.add_argument("--epochs", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--opt", type=str, default="adamw")
    p.add_argument("--opt_eps", type=float, default=1e-8)
    p.add_argument("--weight_decay", type=float, default=5e-2)
    p.add_argument("--sched", type=str, default="cosine")
    p.add_argument("--warmup_epochs", type=int, default=5)
    p.add_argument("--warmup_lr", type=float, default=1e-6)
    p.add_argument("--min_lr", type=float, default=1e-5)
    p.add_argument("--decay_epochs", type=float, default=30)
    p.add_argument("--decay_rate", type=float, default=0.1)
    p.add_argument("--cooldown_epochs", type=int, default=10)
    p.add_argument("--clip_grad", type=float, default=None)
    p.add_argument("--weights", type=str, default="",
                   help="pretrained .pth (head keys dropped on load, "
                        "train_and_validate.py:111-119) / native .npz / "
                        "orbax checkpoint dir (loaded verbatim)")
    p.add_argument("--freeze_layers", action="store_true")
    p.add_argument("--syncBN", action="store_true",
                   help="accepted for parity; no-op (model has no BN)")
    p.add_argument("--dataset_path", type=str, required=True)
    p.add_argument("--train_img_name_path", type=str, required=True)
    p.add_argument("--val_img_name_path", type=str, required=True)
    p.add_argument("--cls_labels_path", type=str, default="")
    p.add_argument("--ckpt_dir", type=str, default="./weights")
    p.add_argument("--log_dir", type=str, default=".")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mesh_shape", type=str, default="-1",
                   help="comma-separated mesh shape over jax.devices(), "
                        "e.g. '-1' (all-data-parallel) or '4,2' (dp,tp)")
    p.add_argument("--native_decode", action="store_true",
                   help="opt into the C++ batched JPEG pipeline (PIL "
                        "default = exact reference-parity pixels)")
    p.add_argument("--resume", action="store_true",
                   help="resume full train state from latest checkpoint "
                        "(capability the reference lacks)")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="microbatches per optimizer step (exact full-batch "
                        "semantics; use when the effective batch exceeds "
                        "one chip's HBM)")
    p.add_argument("--zero1", action="store_true",
                   help="shard the adamw moments over the data axis "
                        "(ZeRO-1; saves (dp-1)/dp of optimizer-state HBM)")
    p.add_argument("--seq_parallel", type=int, default=0,
                   help="token-axis sharding over N devices (dp x sp mesh; "
                        "the long-N layout — ViT-L@384-class shapes where "
                        "the per-device [B,N,N] attention footprint is the "
                        "limit).  Training attention runs the XLA path "
                        "under sp (the bwd kernel is batch-axis); overrides "
                        "--mesh_shape")
    p.add_argument("--pipeline", type=int, default=0,
                   help="pipeline parallelism: stage-shard the depth over "
                        "N devices (dp x pp mesh, GPipe fill-and-drain "
                        "schedule, parallel/pipeline.py).  Implies "
                        "per-sample mask normalization (the batch-global "
                        "reference form would couple samples across "
                        "microbatches); requires zero drop ratios; "
                        "overrides --mesh_shape")
    p.add_argument("--pp_microbatches", type=int, default=0,
                   help="microbatches per pipeline step (0 = stage count)")
    p.add_argument("--device", type=str, default="", help="ignored (SPMD)")
    p.add_argument("--local_rank", type=int, default=0,
                   help="accepted for parity; jax discovers processes itself")
    return p


def main(argv=None):
    from vision_transformer_cam_tpu.utils import honor_jax_platforms_env
    honor_jax_platforms_env()
    args = build_parser().parse_args(argv)
    model_cfg = configs.resolve_model(args.model_name)(
        num_classes=args.num_classes)
    if getattr(model_cfg, "has_logits", False):
        model_cfg = model_cfg.replace(representation_size=None)

    optim = configs.OptimConfig(
        opt=args.opt, lr=args.lr, opt_eps=args.opt_eps,
        weight_decay=args.weight_decay, sched=args.sched,
        epochs=args.epochs, warmup_epochs=args.warmup_epochs,
        warmup_lr=args.warmup_lr, min_lr=args.min_lr,
        decay_epochs=args.decay_epochs, decay_rate=args.decay_rate,
        cooldown_epochs=args.cooldown_epochs, clip_grad=args.clip_grad)
    if args.seq_parallel and args.pipeline:
        raise SystemExit("--seq_parallel and --pipeline are distinct mesh "
                         "layouts; pick one (dp composes with either)")
    if args.seq_parallel:
        # (dp, sp) mesh; the model config carries the GSPMD axis names the
        # token-sharding constraints read (models/vit._sp)
        mesh_shape, mesh_axes = (-1, args.seq_parallel), ("data", "seq")
        model_cfg = model_cfg.replace(data_axis="data", seq_axis="seq")
    elif args.pipeline:
        mesh_shape, mesh_axes = (-1, args.pipeline), ("data", "stage")
        # microbatched carry -> per-sample mask norm (parallel/pipeline.py
        # module docs; the reference's batch-global max would make results
        # depend on the microbatch count)
        model_cfg = model_cfg.replace(per_sample_mask_norm=True)
    else:
        mesh_shape = tuple(int(s) for s in args.mesh_shape.split(","))
        mesh_axes = ("data", "model")[:len(mesh_shape)] \
            if len(mesh_shape) <= 2 \
            else tuple(f"ax{i}" for i in range(len(mesh_shape)))
    train_cfg = configs.TrainConfig(
        optim=optim, batch_size=args.batch_size, seed=args.seed,
        freeze_backbone=args.freeze_layers, ckpt_dir=args.ckpt_dir,
        mesh_shape=mesh_shape, mesh_axes=mesh_axes,
        grad_accum=args.grad_accum, zero1=args.zero1,
        pipeline=args.pipeline, pp_microbatches=args.pp_microbatches)
    dc = dict(voc12_root=args.dataset_path,
              cls_labels_path=args.cls_labels_path,
              img_size=model_cfg.img_size,
              native_decode=args.native_decode)
    train_data = configs.DataConfig(
        img_name_list_path=args.train_img_name_path, **dc)
    val_data = configs.DataConfig(
        img_name_list_path=args.val_img_name_path, **dc)

    init_params = None
    if args.weights:
        # one dispatch for every container (.pth / .npz / orbax dir, like
        # validate/predict/export — review finding: the hand-rolled branch
        # here crashed on orbax dirs).  Head-key surgery
        # (train_and_validate.py:111-119) applies to reference-format .pth
        # pretrained checkpoints; native containers load verbatim.
        base = vit.init(model_cfg, jax.random.key(args.seed)) \
            if not args.weights.endswith(".npz") \
            and not os.path.isdir(args.weights) else None
        init_params = wio.load_weights(args.weights, model_cfg, params=base,
                                       del_keys=wio.PRETRAIN_DEL_KEYS)

    return looplib.fit(model_cfg, train_cfg, train_data, val_data,
                       init_params=init_params, epochs=args.epochs,
                       log_dir=args.log_dir, resume=args.resume)


if __name__ == "__main__":
    main()
