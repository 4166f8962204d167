"""Export the serving model as a portable StableHLO artifact (jax.export).

The reference has no deployment story — serving means running the PyTorch
training graph under torch.no_grad (validate.py:106-135).  Here the
CAM-extraction function (forward + in-scan rollout + CAM grid), with the
weights baked in and any serving mode applied (`--serving int8` = the
5 516 img/s bench config), is serialized ahead-of-time so a serving binary
can load and run it without Python, the model code, or the checkpoint:

  python -m vision_transformer_cam_tpu.cli.export \
      --weights ckpt.npz --serving int8 --batch 512 --out model.jaxex

`--check` deserializes the artifact in-process, runs it, and verifies the
outputs match the live function bit-for-bit.  A JSON sidecar records the
model/mode/shape contract.  Lowering is ahead-of-time for the CURRENT
platform — cross-platform export is rejected (the Pallas kernels pick
their lowering from the live backend at trace time), so export on the
platform you deploy to.  Note for tunneled remote-compile setups: the
artifact embeds the weights, so `--check` on a full-size model can exceed
the remote compiler's payload limit (CLAUDE.md's HTTP-413 gotcha) — run
the check where compiles are local, or on a small model.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from vision_transformer_cam_tpu import configs, serving
from vision_transformer_cam_tpu.io import weights as wio
from vision_transformer_cam_tpu.models import vit
from vision_transformer_cam_tpu.ops import rollout


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_name", type=str,
                   default="vit_base_patch16_224_in21k")
    p.add_argument("--num_classes", type=int, default=20)
    p.add_argument("--weights", type=str, default="",
                   help=".pth / .npz fine-tuned weights or an orbax "
                        "checkpoint dir from cli.train; empty = random "
                        "(shape/perf testing)")
    p.add_argument("--serving", type=str, default="int8",
                   choices=list(serving.SERVING_MODES))
    p.add_argument("--batch", type=int, default=512,
                   help="static batch size baked into the artifact")
    p.add_argument("--calib_npy", type=str, default="",
                   help="[N,H,W,3] float .npy calibration batch for int8; "
                        "default: unit-normal random (document your own!)")
    p.add_argument("--no-cam", action="store_true",
                   help="export the classification-only function")
    p.add_argument("--attn_impl", type=str, default="auto",
                   choices=["auto", "xla", "pallas"],
                   help="override the serving mode's attention impl "
                        "(auto = pallas on TPU, xla elsewhere)")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard the batch over ALL visible devices; the "
                        "artifact then requires the same device count at "
                        "load time (multi-chip serving)")
    p.add_argument("--seq_parallel", type=int, default=0, metavar="N",
                   help="additionally shard the TOKEN axis over N devices "
                        "(sequence parallelism — cfg.seq_axis): the batch "
                        "is sharded over the remaining devices/N.  For "
                        "long-N models (ViT-L@384) whose per-device [B,N,N] "
                        "footprint is the limit.  XLA attention path (a "
                        "pallas attn_impl is overridden)")
    p.add_argument("--out", type=str, required=True,
                   help="artifact path; a .json sidecar is written next "
                        "to it")
    p.add_argument("--platform", type=str, default="",
                   help="lowering platform (tpu/cpu); must equal the "
                        "current jax default backend (cross-platform "
                        "export is rejected — see module docstring)")
    p.add_argument("--check", action="store_true",
                   help="deserialize + run + compare against the live fn")
    return p


def build_fn(args):
    """(fn(images), cfg, calib_provenance) with params baked in and serving
    mode applied."""
    # strict resolution (no silent ViT-B fallback — the sidecar would
    # record the wrong model), with the reference's 'vit_base' alias
    factory = configs.resolve_model(args.model_name)
    cfg = factory(num_classes=args.num_classes)
    cfg = cfg.replace(representation_size=None)
    from vision_transformer_cam_tpu.utils import tune_tpu_for_long_sequence
    tune_tpu_for_long_sequence(cfg)  # N>512: scoped-VMEM, pre-backend-init
    if args.weights:
        params = wio.load_weights(args.weights, cfg, del_keys=())
    else:
        params = vit.init(cfg, jax.random.key(0))
    calib = None
    calib_provenance = None
    if args.serving.startswith("int8"):
        if args.calib_npy:
            calib = np.load(args.calib_npy)
            calib_provenance = args.calib_npy
        else:
            calib = np.random.default_rng(7).standard_normal(
                (8, cfg.img_size, cfg.img_size, 3)).astype(np.float32)
            calib_provenance = "random-unit-normal (NOT real images)"
            if args.weights:
                # a deployment artifact built from real weights but random
                # calibration embeds activation scales unrelated to real
                # ImageNet-normalized inputs — loudly detectable, not a
                # silent footgun (round-2 advisor finding)
                print("WARNING: --weights given but no --calib_npy: int8 "
                      "activation scales are calibrated on RANDOM NOISE. "
                      "Pass a representative [N,H,W,3] .npy batch for a "
                      "production artifact (sidecar records provenance).")
    params, cfg = serving.apply_serving_mode(params, cfg, args.serving,
                                             calib_images=calib)
    if args.attn_impl != "auto":
        cfg = cfg.replace(attn_impl=args.attn_impl)
    if args.seq_parallel:
        from vision_transformer_cam_tpu.parallel import apply_seq_parallel
        cfg = apply_seq_parallel(cfg)
    elif args.data_parallel and cfg.attn_impl == "pallas":
        # shard_map the Pallas kernels over the mesh's batch axis — XLA's
        # auto-SPMD otherwise replicates pallas_call across devices (see
        # configs.ViTCAMConfig.data_axis); main() traces under the mesh
        cfg = cfg.replace(data_axis="data")
    with_cam = not args.no_cam

    def fn(images):
        out = vit.forward(params, images, cfg, need_rollout=with_cam)
        if not with_cam:
            return out.logits, out.head1_logits
        cam = rollout.cam_from_rollout_row(out.rollout_row, cfg.grid_size)
        return out.logits, out.head1_logits, cam

    return fn, cfg, calib_provenance


def main(argv=None) -> str:
    from vision_transformer_cam_tpu.utils import honor_jax_platforms_env
    honor_jax_platforms_env()
    args = build_parser().parse_args(argv)
    # The scoped-VMEM raise must land before jax.default_backend() below
    # initializes the TPU backend (LIBTPU_INIT_ARGS is consumed exactly
    # once, at init) — otherwise a long-N export silently bakes the
    # q-blocked 16 MB-partition kernel instead of the shipped single-
    # q-block config and the sidecar records scoped_vmem_kib: null.
    from vision_transformer_cam_tpu.utils import tune_tpu_for_long_sequence
    tune_tpu_for_long_sequence(
        configs.resolve_model(args.model_name)(num_classes=args.num_classes))
    backend = jax.default_backend()
    if args.platform and args.platform != backend:
        # Cross-platform export is NOT supported: the Pallas kernels pick
        # interpret-vs-Mosaic lowering from the live backend at trace time,
        # so exporting "for tpu" from a CPU host would silently bake the
        # interpret lowering (and the reverse bakes a tpu custom-call that
        # cannot run on cpu).  Run under the target platform instead.
        raise SystemExit(
            f"--platform {args.platform} != current backend {backend}: "
            "cross-platform export would bake the wrong attention kernel "
            f"lowering; run with JAX_PLATFORMS={args.platform} (or on the "
            "target machine) instead")
    fn, cfg, calib_provenance = build_fn(args)
    sharding = None
    if args.seq_parallel or args.data_parallel:
        from vision_transformer_cam_tpu.parallel import (data_sharding,
                                                         make_mesh,
                                                         seq_parallel_mesh)
        if args.seq_parallel:
            mesh = seq_parallel_mesh(args.seq_parallel)
        else:
            mesh = make_mesh((-1,), ("data",))
        dp = mesh.shape["data"]
        if args.batch % dp:
            raise SystemExit(f"--batch {args.batch} must be a multiple of "
                             f"the mesh's {dp}-way batch axis")
        sharding = data_sharding(mesh)
    spec = jax.ShapeDtypeStruct((args.batch, cfg.img_size, cfg.img_size, 3),
                                jnp.float32, sharding=sharding)
    platforms = [args.platform] if args.platform else None
    jitted = jax.jit(fn, in_shardings=sharding) if sharding is not None \
        else jax.jit(fn)
    import contextlib

    def mesh_ctx():
        # set_mesh (not `with mesh:`) supplies shard_map's context mesh
        # inside nested jit traces (the Pallas data_axis wrap); fresh ctx
        # manager per use — set_mesh's is single-use
        return jax.set_mesh(mesh) if sharding is not None \
            else contextlib.nullcontext()

    with mesh_ctx():
        exported = jax.export.export(jitted, platforms=platforms)(spec)
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    # long-N artifacts bake the single-q-block kernel chosen under the
    # raised scoped-VMEM partition (utils.tune_tpu_for_long_sequence) into
    # the StableHLO — the serving host must raise the partition too, so the
    # sidecar records the requirement for consumers (serve_artifact.py
    # applies it before backend init)
    from vision_transformer_cam_tpu.utils import SCOPED_VMEM_MARKER
    scoped = os.environ.get(SCOPED_VMEM_MARKER)
    meta = {"model_name": args.model_name, "serving": args.serving,
            "scoped_vmem_kib": int(scoped) if scoped else None,
            "batch": args.batch, "img_size": cfg.img_size,
            "num_classes": args.num_classes, "with_cam": not args.no_cam,
            "nr_devices": exported.nr_devices,
            "seq_parallel": args.seq_parallel or None,
            "platforms": list(exported.platforms),
            "calibration": calib_provenance,
            "input": "float32 [batch, H, W, 3], ImageNet-normalized",
            # machine-readable preprocessing contract (consumers like
            # examples/serve_artifact.py read these instead of assuming)
            "mean": list(configs.DataConfig.mean),
            "std": list(configs.DataConfig.std),
            "outputs": "(logits, head1_logits" +
                       (", cam [batch, grid, grid])" if not args.no_cam
                        else ")")}
    with open(args.out + ".json", "w") as f:
        json.dump(meta, f, indent=1)
    print(f"exported {len(blob) / 1e6:.1f} MB -> {args.out} "
          f"(platforms {meta['platforms']})")

    if args.check:
        if len(blob) > 16e6 and backend != "cpu":
            print(f"warning: --check compiles the {len(blob) / 1e6:.0f} MB "
                  "artifact (weights embedded); on remote-compile/tunneled "
                  "platforms this can exceed the compiler payload limit")
        re = jax.export.deserialize(blob)
        x = jnp.asarray(np.random.default_rng(3).standard_normal(
            (args.batch, cfg.img_size, cfg.img_size, 3)), jnp.float32)
        if sharding is not None:
            x = jax.device_put(x, sharding)
        with mesh_ctx():
            got = re.call(x)
            want = jitted(x)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
        print(f"check OK: artifact == live fn on random input "
              f"({len(got)} outputs, bit-identical)")
    return args.out


if __name__ == "__main__":
    main()
