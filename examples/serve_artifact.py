"""Serve CAMs from an exported StableHLO artifact — NO model code needed.

The deployment-side counterpart of `cli.export`: everything this script
imports from the package is host-side glue (JPEG preprocessing and CAM
overlay rendering) — the model itself, its weights, the serving mode and
the int8 calibration are all baked into the artifact.  This is what a
production serving binary does, minus the RPC front-end:

  # build the artifact once (weights + int8 serving config baked in)
  python -m vision_transformer_cam_tpu.cli.export \
      --weights ckpt.npz --serving int8 --batch 512 --out model.jaxex

  # serve a directory of JPEGs from it
  python examples/serve_artifact.py --artifact model.jaxex \
      --images /path/to/jpegs --out ./served_cams

For every input image it writes `<name>_cam.jpg` (JET rollout-CAM overlay,
the reference's utils.py:111-114 blend) and prints the top classes from the
top-16-patch head.  Images are batched to the artifact's fixed batch size
(the tail is padded and the padding discarded) and preprocessed exactly as
training did (PIL bilinear resize + ImageNet normalization, recorded in the
artifact's JSON sidecar contract).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--artifact", required=True, help="path to the .jaxex "
                   "blob from cli.export (sidecar .json expected next to it)")
    p.add_argument("--images", required=True,
                   help="directory of JPEGs, or a glob pattern")
    p.add_argument("--out", default="./served_cams")
    p.add_argument("--threshold", type=float, default=0.9,
                   help="sigmoid threshold for printed class predictions "
                        "(validate.py:133 uses 0.9)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    with open(args.artifact + ".json") as f:
        meta = json.load(f)
    # the artifact is platform-specific (export bakes the kernel lowering);
    # pin jax to it BEFORE the first jax import
    os.environ["JAX_PLATFORMS"] = meta["platforms"][0]
    # long-N artifacts were traced with the raised scoped-VMEM partition
    # (single-q-block attention kernel baked into the StableHLO): replay
    # the same libtpu setting before backend init or the compile OOMs
    # under the 16 MB default (cli.export records the requirement)
    kib = meta.get("scoped_vmem_kib")
    if kib and "scoped_vmem_limit" not in os.environ.get(
            "LIBTPU_INIT_ARGS", ""):
        os.environ["LIBTPU_INIT_ARGS"] = (
            os.environ.get("LIBTPU_INIT_ARGS", "")
            + f" --xla_tpu_scoped_vmem_limit_kib={kib}").strip()

    # host-side glue only — no model / weights / config imports
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.append(repo)
    import jax

    import numpy as np

    from vision_transformer_cam_tpu import utils
    utils.honor_jax_platforms_env()
    from vision_transformer_cam_tpu.cam.render import _imwrite, overlay_cam
    from vision_transformer_cam_tpu.data.transforms import load_and_preprocess
    if not meta.get("with_cam", True):
        raise SystemExit("artifact was exported --no-cam; nothing to render")
    with open(args.artifact, "rb") as f:
        fn = jax.export.deserialize(f.read())
    batch, size = meta["batch"], meta["img_size"]
    print(f"artifact: {meta['model_name']} serving={meta['serving']} "
          f"batch={batch} img={size} platforms={meta['platforms']} "
          f"calibration={meta.get('calibration', '?')}")

    if os.path.isdir(args.images):
        paths = sorted(p for pat in ("*.jpg", "*.jpeg", "*.JPG", "*.JPEG")
                       for p in glob.glob(os.path.join(args.images, pat)))
    else:
        paths = sorted(glob.glob(args.images))
    if not paths:
        raise SystemExit(f"no images match {args.images}")
    os.makedirs(args.out, exist_ok=True)

    # a --data_parallel artifact bakes in a device mesh: check early and
    # shard the batch over it (fn.call on plain host arrays would fail
    # deep in the loop with an opaque device-count error)
    put = lambda a: a  # noqa: E731
    if meta.get("nr_devices", 1) > 1:
        n = meta["nr_devices"]
        if len(jax.devices()) < n:
            raise SystemExit(
                f"artifact was exported for {n} devices; this host has "
                f"{len(jax.devices())}")
        from jax.sharding import Mesh, NamedSharding, PartitionSpec
        # a --seq_parallel artifact was lowered for a (data x seq) mesh —
        # rebuild the SAME layout (batch over data only); a flat n-way
        # batch mesh would reject batches smaller than n and reshard every
        # call even when they fit
        sp = meta.get("seq_parallel") or 0
        if sp:
            mesh = Mesh(np.array(jax.devices()[:n]).reshape(n // sp, sp),
                        ("data", "seq"))
        else:
            mesh = Mesh(jax.devices()[:n], ("data",))
        sh = NamedSharding(mesh, PartitionSpec("data"))
        put = lambda a: jax.device_put(a, sh)  # noqa: E731

    # preprocessing contract from the sidecar (ImageNet stats fallback for
    # artifacts exported before mean/std were recorded)
    mean = tuple(meta.get("mean", (0.485, 0.456, 0.406)))
    std = tuple(meta.get("std", (0.229, 0.224, 0.225)))
    done = 0
    for lo in range(0, len(paths), batch):
        chunk = paths[lo:lo + batch]
        x = np.zeros((batch, size, size, 3), np.float32)  # tail zero-padded
        for i, p in enumerate(chunk):
            x[i] = load_and_preprocess(p, size, mean, std)
        logits, head1_logits, cam = fn.call(put(x))
        probs = 1.0 / (1.0 + np.exp(-np.asarray(head1_logits, np.float64)))
        cam = np.asarray(cam, np.float64)
        for i, p in enumerate(chunk):
            name = os.path.splitext(os.path.basename(p))[0]
            import PIL.Image
            bgr = np.asarray(PIL.Image.open(p).convert("RGB"))[..., ::-1]
            _imwrite(os.path.join(args.out, f"{name}_cam.jpg"),
                     overlay_cam(cam[i], bgr))
            pred = np.nonzero(probs[i] >= args.threshold)[0]
            top = ", ".join(f"{c}:{probs[i][c]:.2f}" for c in pred) \
                or f"(none >= {args.threshold}; max " \
                   f"{probs[i].argmax()}:{probs[i].max():.2f})"
            print(f"  {name}: {top}")
            done += 1
    print(f"wrote {done} CAM overlays to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
