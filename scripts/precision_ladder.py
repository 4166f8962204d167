"""Matmul-precision ladder: CAM fidelity vs float64 + throughput per rung.

TPU's backend-default matmul precision lowers f32 dots to bfloat16 MXU
passes, so an f32-DTYPE graph is NOT the <=1e-5 parity class of
BASELINE.json on this hardware (measured ~5e-3 CAM max dev — BENCHMARKS
"f32 fidelity on TPU").  jax.default_matmul_precision exposes three rungs:

  default  — one bf16 pass per dot (the ~5e-3 class)
  high     — 3-pass bf16x3 emulation of f32 (the round-3 verdict's
             unexplored middle rung)
  highest  — true f32 passes (~5e-7, the <=1e-5 parity class)

This script measures every rung for both attention implementations against
ONE CPU reference (identical params/images):

  python scripts/precision_ladder.py [--precisions default,high,highest]
      [--impls xla,pallas] [--dev-batch 16] [--batch 256] [--no-throughput]
      [--ref f64|f32]

--ref picks the question being answered.  f64 (default) measures ABSOLUTE
accuracy: even true-f32 math carries ~7.5e-4 max CAM dev vs f64 truth
(the f32 floor — it bounds the torch reference identically, so it is NOT
the parity metric).  f32 runs the CPU reference in plain f32 (true f32
passes on CPU — the same arithmetic class as the torch reference the
BASELINE ≤1e-5 parity bar is stated against) and measures PARITY: how far
each TPU rung sits from a faithful-f32 implementation of the same model.

The f64 reference runs in a SUBPROCESS (x64 + the CPU platform cannot be
enabled once the TPU backend has initialized) and is cached in /tmp keyed
by (model, dev batch).  Deviation is measured at --dev-batch (the f64 CPU
forward is minutes at batch 256 on this 1-core box); throughput at --batch
on the TPU chip with the bench.py chained-dispatch timing.  Config matches
the BENCHMARKS ladder table: f32 storage dtype, exact-erf GELU, no
softmax clamp, fused in-scan rollout CAM.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build(model: str, impl: str, precision: str, mask_from=None):
    from vision_transformer_cam_tpu import configs
    cfg = configs.resolve_model(model)(num_classes=20)
    cfg = cfg.replace(representation_size=None)
    import jax.numpy as jnp
    cfg = cfg.replace(dtype=jnp.float32, param_dtype=jnp.float32,
                      attn_impl=impl,
                      matmul_precision=None if precision == "default"
                      else precision)
    if mask_from is not None:
        # mask_from > depth disables the bg-mask feedback: deviation then
        # measures raw per-dot rounding with no 0.25-threshold tie cascade
        cfg = cfg.replace(mask_from=mask_from)
    return cfg


def _params_images(cfg, batch: int):
    import jax
    import jax.numpy as jnp
    from vision_transformer_cam_tpu.models import vit
    params = vit.init(cfg, jax.random.key(0))
    images = jax.random.normal(
        jax.random.key(1), (batch, cfg.img_size, cfg.img_size, 3),
        jnp.float32)
    return params, images


def _cam_fn(cfg):
    import jax
    from vision_transformer_cam_tpu.models import vit
    from vision_transformer_cam_tpu.ops import rollout

    @jax.jit
    def cam_extract(params, images):
        out = vit.forward(params, images, cfg, need_rollout=True)
        return (rollout.cam_from_rollout_row(out.rollout_row,
                                             cfg.grid_size),
                out.logits)

    return cam_extract


def ref_main(model: str, batch: int, out_path: str, mask_from=None,
             ref: str = "f64") -> None:
    """Subprocess entry: reference CAM on CPU.  ref="f64": true f64 passes
    everywhere (absolute truth).  ref="f32": plain f32 on CPU — true f32
    passes, the arithmetic class of the torch reference, i.e. the operand
    the BASELINE ≤1e-5 parity bar compares against.

    Params/images are sampled BEFORE x64 is enabled: under x64,
    jax.random.truncated_normal draws in f64 and the init differs from the
    TPU process's f32 draws in the low bits — the two processes must run
    the SAME model, not two models 1e-7 apart."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    cfg32 = _build(model, "xla", "default", mask_from)
    if ref == "f32":
        cam, logits = _cam_fn(cfg32)(*_params_images(cfg32, batch))
        np.savez(out_path, cam=np.asarray(cam, np.float64),
                 logits=np.asarray(logits, np.float64))
        print(f"wrote f32 reference CAM {cam.shape} -> {out_path}")
        return
    params, images = _params_images(cfg32, batch)
    params = jax.tree.map(lambda a: np.asarray(a), params)
    images = np.asarray(images)
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    cfg64 = cfg32.replace(dtype=jnp.float64, param_dtype=jnp.float64)
    p64 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), params)
    cam, logits = _cam_fn(cfg64)(p64, jnp.asarray(images, jnp.float64))
    np.savez(out_path, cam=np.asarray(cam, np.float64),
             logits=np.asarray(logits, np.float64))
    print(f"wrote f64 reference CAM {cam.shape} -> {out_path}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="vit_base_patch16_224_in21k")
    ap.add_argument("--precisions", default="default,high,highest")
    ap.add_argument("--impls", default="xla,pallas")
    ap.add_argument("--dev-batch", type=int, default=16)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--no-throughput", action="store_true")
    ap.add_argument("--mask-from", type=int, default=-1,
                    help="override cfg.mask_from (pass a value > depth to "
                         "disable the bg-mask feedback and measure raw "
                         "per-dot rounding without the 0.25-threshold tie "
                         "cascade); -1 = model default")
    ap.add_argument("--ref", default="f64", choices=("f64", "f32"))
    ap.add_argument("--hybrid", action="store_true",
                    help="add the 'highest-where-it-matters' rung (round-4 "
                         "verdict item 5): int8 W8A8 GEMMs + true-f32 "
                         "(highest) attention core + f32 rollout chain — "
                         "quantization where fidelity is cheap, full "
                         "precision where the CAM is made")
    ap.add_argument("--_ref_out", default="")
    args = ap.parse_args(argv)
    mask_from = None if args.mask_from < 0 else args.mask_from

    if args._ref_out:
        return ref_main(args.model, args.dev_batch, args._ref_out, mask_from,
                        args.ref)

    ref_path = (f"/tmp/ladder_ref_{args.ref}_{args.model}_{args.dev_batch}"
                f"_mf{args.mask_from}.npz")
    if not os.path.exists(ref_path):
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--model",
             args.model, "--dev-batch", str(args.dev_batch),
             "--mask-from", str(args.mask_from), "--ref", args.ref,
             "--_ref_out", ref_path],
            check=True, env=env)
    import numpy as np
    ref = np.load(ref_path)
    cam64, logits64 = ref["cam"], ref["logits"]

    import jax
    import jax.numpy as jnp

    cfg_probe = _build(args.model, "xla", "default")
    from vision_transformer_cam_tpu.utils import tune_tpu_for_long_sequence
    tune_tpu_for_long_sequence(cfg_probe)

    rows = []
    combos = [(prec, impl, False) for prec in args.precisions.split(",")
              for impl in args.impls.split(",")]
    if args.hybrid:
        combos += [("highest", impl, True)
                   for impl in args.impls.split(",")]
    for prec, impl, hybrid in combos:
            cfg = _build(args.model, impl, prec, mask_from)
            params, dev_images = _params_images(cfg, args.dev_batch)
            if hybrid:
                # int8 GEMM tier on the SAME float params: the deviation
                # then isolates what W8A8 GEMM quantization adds on top of
                # a true-f32 attention core + rollout chain
                from vision_transformer_cam_tpu.ops.quant import (
                    calibrate_act_scales, quantize_params)
                calib = jax.random.normal(
                    jax.random.key(7), (8, cfg.img_size, cfg.img_size, 3),
                    jnp.float32)
                scales = calibrate_act_scales(params, cfg, calib)
                params = quantize_params(params, act_scales=scales)
                impl = f"{impl}+int8gemm"
            fn = _cam_fn(cfg)
            cam, logits = fn(params, dev_images)
            cam = np.asarray(cam, np.float64)
            logits = np.asarray(logits, np.float64)
            d = np.abs(cam - cam64)
            row = {"impl": impl, "precision": prec,
                   f"cam_max_dev_vs_{args.ref}": float(np.max(d)),
                   "cam_mean_dev": float(np.mean(d)),
                   "cam_p99_dev": float(np.percentile(d, 99)),
                   "logits_max_dev": float(np.max(np.abs(logits
                                                         - logits64)))}
            if not args.no_throughput:
                images = jax.random.normal(
                    jax.random.key(1),
                    (args.batch, cfg.img_size, cfg.img_size, 3), jnp.float32)
                # block_until_ready is a no-op through the tunnel: sync via
                # a scalar device->host read (CLAUDE.md gotcha)
                float(jnp.sum(fn(params, images)[0]))
                float(jnp.sum(fn(params, images)[0]))
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    for _ in range(5):
                        res = fn(params, images)
                    float(jnp.sum(res[0]))
                    best = min(best, (time.perf_counter() - t0) / 5)
                row["img_per_s"] = round(args.batch / best, 1)
            rows.append(row)
            print(json.dumps(row), flush=True)
    return rows


if __name__ == "__main__":
    main()
