"""Headline benchmark: ViT-B/16 CAM-extraction throughput (images/sec/chip).

The reference pipeline materializes 12x[B,12,197,197] attention tensors and
runs per-sample Python loops with GPU->CPU syncs (vit_model.py:338-341,
375-388) plus a post-hoc rollout loop (predict.py:214-232); here the full
CAM (attention rollout) is fused into the forward scan and everything stays
on device.  BASELINE.json target: >= 5000 images/sec/chip on TPU v5e.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_IMG_PER_S = 5000.0  # BASELINE.json north-star target


def bench_train(batch, dtype):
    """Fine-tune step throughput (the train_and_validate.py hot loop).

    --accum N: gradient accumulation (train_step_accum) — N sequential
    microbatches of batch/N, one optimizer update; throughput counts the
    FULL batch.  The lever for effective batches beyond one chip's HBM
    (e.g. ViT-L at batch 512 on a single v5e).
    --model <zoo name>: any zoo config (default the flagship ViT-B/16-21k).
    """
    from vision_transformer_cam_tpu import configs
    from vision_transformer_cam_tpu.models import vit
    from vision_transformer_cam_tpu.train.state import (create_train_state,
                                                        make_optimizer)
    from vision_transformer_cam_tpu.train.step import (train_step,
                                                       train_step_accum)

    accum = int(sys.argv[sys.argv.index("--accum") + 1]) \
        if "--accum" in sys.argv else 1
    if "--model" in sys.argv:
        name = sys.argv[sys.argv.index("--model") + 1]
        cfg = configs.resolve_model(name)(num_classes=20)
        if getattr(cfg, "representation_size", None):
            cfg = cfg.replace(representation_size=None)
        metric_model = name
    else:
        cfg = configs.vit_base_patch16_224_in21k(num_classes=20,
                                                 has_logits=False)
        metric_model = "vit_b16"
    # --mixed: the production fine-tune recipe — f32 master weights +
    # AdamW state, bf16 compute (the configs.py default param_dtype).
    # Plain --train keeps the all-bf16 config for row continuity.
    if "--mixed" in sys.argv:
        cfg = cfg.replace(dtype=dtype, param_dtype=jnp.float32)
    else:
        cfg = cfg.replace(dtype=dtype, param_dtype=dtype)
    if "--xla" not in sys.argv:
        cfg = cfg.replace(attn_impl="pallas")
    # long-N training (ViT-L@384): the fused bwd kernel OOMs the 16 MB
    # scoped-VMEM default and routes to XLA without the raised partition —
    # must run before the first device use (same as the serving path)
    from vision_transformer_cam_tpu.utils import tune_tpu_for_long_sequence
    tune_tpu_for_long_sequence(cfg)
    params = vit.init(cfg, jax.random.key(0))
    tx, _ = make_optimizer(configs.OptimConfig(), global_batch_size=batch,
                           steps_per_epoch=100)
    state = create_train_state(params, tx)
    images = jax.random.normal(jax.random.key(1),
                               (batch, cfg.img_size, cfg.img_size, 3),
                               jnp.float32)
    labels = (jax.random.uniform(jax.random.key(2), (batch, 20)) < 0.15
              ).astype(jnp.float32)
    rng = jax.random.key(3)

    if accum > 1:
        def step(st):
            return train_step_accum(st, images, labels, rng, cfg, tx, accum)
    else:
        def step(st):
            return train_step(st, images, labels, rng, cfg, tx)

    state, m = step(state)
    _ = float(m["loss"])
    state, m = step(state)
    _ = float(m["loss"])
    chunk, iters, best = 5, 3, float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(chunk):
            state, m = step(state)
        _ = float(m["loss"])
        best = min(best, (time.perf_counter() - t0) / chunk)

    img_per_s = batch / best
    print(json.dumps({
        "metric": f"{metric_model}_train_step_throughput"
                  + ("_mixed" if "--mixed" in sys.argv else "")
                  + (f"_accum{accum}" if accum > 1 else ""),
        "value": round(img_per_s, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_s / BASELINE_IMG_PER_S, 3),
    }))


_FLAGS = {"--gelu-exact", "--stable-softmax", "--mlp-fusion", "--int8-fused",
          "--rollout-post", "--rollout-carry", "--ln-quant", "--int8",
          "--int8-hifi", "--bf16", "--f32", "--xla", "--no-int8-attn",
          "--int8-attn", "--int8-dynamic", "--no-cam", "--latency",
          "--train", "--mixed", "--batch-global-mask"}
_VALUE_FLAGS = {"--block-b", "--q-block", "--batch", "--model",
                "--dispatch-chunks", "--precision", "--accum"}


def _check_flags(argv):
    """Reject unknown/misspelled flags and value flags missing their value —
    silently ignoring a typo'd ablation flag benchmarks the WRONG config and
    the JSON line looks legitimate (review finding)."""
    i = 1
    while i < len(argv):
        tok = argv[i]
        if tok in _VALUE_FLAGS:
            # a following "--flag" is NOT a value — catching `--batch
            # --latency` here beats the raw int() crash (or, worse,
            # `--model --f32` silently eating an ablation flag) later
            if i + 1 >= len(argv) or argv[i + 1].startswith("--"):
                raise SystemExit(f"bench.py: {tok} needs a value")
            i += 2
            continue
        if tok.startswith("--") and tok not in _FLAGS:
            raise SystemExit(f"bench.py: unknown flag {tok!r} (known: "
                             f"{sorted(_FLAGS | _VALUE_FLAGS)})")
        i += 1


def build_cfg(argv, model=None):
    """Bench config from ablation flags.  Deliberately NOT routed through
    serving.apply_serving_mode — bench is the ablation surface, so every
    piece of the serving recipe stays individually switchable
    (--no-int8-attn, --int8-dynamic, --gelu-exact, ...) — but with NO
    ablation flags the result must equal the product serving config;
    tests/test_quant.py::test_bench_default_matches_serving_api pins that.

    Returns (cfg, use_int8).  use_int8 defaults ON: the 5000 img/s target
    is unreachable in bf16 (XLA bf16 GEMMs already run at ~95% of MXU
    peak — BENCHMARKS.md); --bf16 / --f32 opt out.  Fidelity of every
    serving mode vs the exact f32 path is characterized in BENCHMARKS.md
    and the exact math is pinned by the f64 goldens in tests/.
    """
    from vision_transformer_cam_tpu import configs

    _check_flags(argv)
    if model is None:
        model = argv[argv.index("--model") + 1] \
            if "--model" in argv else "vit_base_patch16_224_in21k"
    # bf16 is the production serving dtype (correctness is pinned separately
    # by the f32/f64 goldens in tests/); --f32 measures the parity dtype.
    dtype = jnp.float32 if "--f32" in argv else jnp.bfloat16
    cfg = configs.resolve_model(model)(num_classes=20)
    cfg = cfg.replace(representation_size=None,
                      dtype=dtype, param_dtype=dtype)
    # fused Pallas attention is the fastest measured config; --xla opts out
    if "--xla" not in argv:
        cfg = cfg.replace(attn_impl="pallas")
    # serving/inference mask-norm semantics (mirrors serving_config): the
    # reference validates at batch_size=1 where its global max IS the
    # per-sample max; batch-global at batch>1 couples images.
    # --batch-global-mask reproduces the old coupled graph for A/B.
    if "--f32" not in argv and "--batch-global-mask" not in argv:
        cfg = cfg.replace(per_sample_mask_norm=True)
    # tanh GELU: +23% measured; numerics differ from the reference's exact
    # erf by ~1e-3 — below bf16 rounding noise (f32 goldens pin exact math)
    if "--gelu-exact" not in argv:
        cfg = cfg.replace(gelu_approx=True)
    if "--stable-softmax" not in argv:
        cfg = cfg.replace(softmax_clamp=True)
    if "--mlp-fusion" in argv:
        cfg = cfg.replace(mlp_fusion=True)
    if "--int8-fused" in argv:
        cfg = cfg.replace(int8_fused_gemm=True)
    if "--rollout-post" in argv:
        cfg = cfg.replace(rollout_post=True)
    if "--rollout-carry" in argv:
        # force the in-scan joint carry (auto picks rollout_post at N>512)
        cfg = cfg.replace(rollout_post=False)
    if "--ln-quant" in argv:
        # fused LN -> int8 quantize pass (kernels/gemm.ln_quant)
        cfg = cfg.replace(ln_quant_fusion=True)
    if "--block-b" in argv:
        # images per attention-kernel program (0 = auto)
        cfg = cfg.replace(
            attn_block_b=int(argv[argv.index("--block-b") + 1]))
    if "--q-block" in argv:
        # query rows per attention-kernel block (0 = auto)
        cfg = cfg.replace(
            attn_q_block=int(argv[argv.index("--q-block") + 1]))
    if "--precision" in argv:
        # matmul pass precision ("highest" = true-f32 passes; TPU default
        # lowers f32 dots to bf16 passes — BENCHMARKS "f32 fidelity on TPU")
        cfg = cfg.replace(
            matmul_precision=argv[argv.index("--precision") + 1])
    use_int8 = ("--int8" in argv or "--int8-hifi" in argv
                or not ("--bf16" in argv or "--f32" in argv))
    # --int8-hifi == serving mode "int8_hifi": W8A8 GEMMs, float attention
    # core, kernel emits its OUTPUT int8 for the proj GEMM.  --no-int8-attn
    # stays a pure ablation flag: int8 GEMMs with the attention kernel
    # fully float and the proj input quantized OUTSIDE the kernel (the
    # round-2 3 856 / round-3 3 829 graph), so the old rows remain
    # reproducible.
    hifi = "--int8-hifi" in argv or "--no-int8-attn" in argv
    if use_int8 and not hifi:
        # match serving.serving_config: past 640 tokens the "int8" tier
        # routes attention through the output-only int8 kernel — measured
        # faster AND higher-fidelity than int8 attention I/O at N=1025
        # (223.1 vs 220.1 img/s).  --int8-attn below still forces I/O.
        if cfg.seq_len > 640:
            cfg = cfg.replace(int8_attn_out=True)
        else:
            cfg = cfg.replace(int8_attn_io=True)
    elif "--int8-hifi" in argv:
        cfg = cfg.replace(int8_attn_out=True)
    if "--int8-attn" in argv:
        cfg = cfg.replace(int8_attn_io=True)
    return cfg, use_int8


def main():
    from vision_transformer_cam_tpu.models import vit
    from vision_transformer_cam_tpu.ops import rollout

    _check_flags(sys.argv)
    batch = int(sys.argv[sys.argv.index("--batch") + 1]) \
        if "--batch" in sys.argv else 512
    dtype = jnp.float32 if "--f32" in sys.argv else jnp.bfloat16

    if "--train" in sys.argv:
        return bench_train(batch, dtype)

    model = sys.argv[sys.argv.index("--model") + 1] \
        if "--model" in sys.argv else "vit_base_patch16_224_in21k"
    cfg, use_int8 = build_cfg(sys.argv, model)
    # long-sequence models: raise the scoped-VMEM partition BEFORE the
    # first device use (single-q-block kernel; BENCHMARKS "ViT-L@384")
    from vision_transformer_cam_tpu.utils import tune_tpu_for_long_sequence
    tune_tpu_for_long_sequence(cfg)
    params = vit.init(cfg, jax.random.key(0))
    if use_int8:
        from vision_transformer_cam_tpu.ops.quant import (
            calibrate_act_scales, quantize_params)
        scales = None
        if "--int8-dynamic" not in sys.argv:
            calib = jax.random.normal(
                jax.random.key(7), (8, cfg.img_size, cfg.img_size, 3),
                jnp.float32)
            scales = calibrate_act_scales(params, cfg, calib)
        params = quantize_params(params, act_scales=scales)

    with_cam = "--no-cam" not in sys.argv
    latency = "--latency" in sys.argv
    if latency:
        batch = 1

    @jax.jit
    def cam_extract(params, images):
        # --no-cam: the batched multi-label inference path (validate.py's
        # classification metric, BASELINE config #2) without CAM extraction
        out = vit.forward(params, images, cfg, need_rollout=with_cam)
        if not with_cam:
            return out.logits, out.head1_logits, jax.nn.sigmoid(
                out.head1_logits)
        cam = rollout.cam_from_rollout_row(out.rollout_row, cfg.grid_size)
        return out.logits, out.head1_logits, cam

    # --dispatch-chunks N (N>1, throughput only): run N independent batches
    # under ONE jitted lax.scan per dispatch.  MEASURED DEAD END for the
    # host-dispatch-gap theory (BENCHMARKS.md): a wash at N=2 (5 527 vs
    # 5 532 default) and a collapse at N=4 (3 383 — the stacked f32 input is
    # 1.23 GB, HBM pressure), proving the 4.3 ms/batch wall-vs-device gap is
    # NOT per-dispatch host cost.  Kept as the measurement knob that pins
    # that conclusion.  Chunks get DISTINCT images so no compiler shortcut
    # can dedupe iterations.
    n_chunks = int(sys.argv[sys.argv.index("--dispatch-chunks") + 1]) \
        if "--dispatch-chunks" in sys.argv else 1
    if n_chunks > 1 and latency:
        raise SystemExit("bench.py: --dispatch-chunks is a throughput knob; "
                         "it does not compose with --latency")

    if n_chunks > 1:
        images = jax.random.normal(
            jax.random.key(1),
            (n_chunks, batch, cfg.img_size, cfg.img_size, 3), jnp.float32)

        @jax.jit
        def run(params, images):
            def body(carry, imgs):
                out = cam_extract(params, imgs)
                # carry a running scalar so the sync read depends on every
                # chunk's output without stacking N full CAM tensors
                return carry + jnp.sum(out[2].astype(jnp.float32)), None
            total, _ = jax.lax.scan(body, jnp.float32(0.0), images)
            return total

        def sync(res):
            return float(res)

        dispatch = run
        imgs_per_dispatch = batch * n_chunks
    else:
        images = jax.random.normal(
            jax.random.key(1), (batch, cfg.img_size, cfg.img_size, 3),
            jnp.float32)

        def sync(res):
            # On tunneled platforms block_until_ready can be a no-op; a
            # scalar device->host read is the only reliable barrier.
            return float(jnp.sum(res[2]))

        dispatch = cam_extract
        imgs_per_dispatch = batch

    # compile + warmup
    sync(dispatch(params, images))
    sync(dispatch(params, images))

    # Chain CHUNK async dispatches per timing window and sync once, so the
    # host<->device round-trip latency amortizes out of the measurement.
    # (--latency: batch=1, report the p50 per-window mean as the per-image
    # device latency — the ~30 ms tunnel RTT is excluded by construction,
    # matching how an on-device serving loop would see it.)
    chunk, iters = (10, 15) if latency else (10, 3)
    if n_chunks > 1:
        # each dispatch already covers n_chunks batches; keep the timed
        # window at ~10 batches of device work
        chunk = max(1, 10 // n_chunks)
    windows = []
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(chunk):
            res = dispatch(params, images)
        sync(res)
        windows.append((time.perf_counter() - t0) / chunk)
    best = min(windows)

    kind = "cam_extraction" if with_cam else "multilabel_inference"
    stem = "vit_b16" if model == "vit_base_patch16_224_in21k" else model
    if latency:
        p50 = sorted(windows)[len(windows) // 2] * 1e3
        # north star is a throughput target; report latency vs the 1-image
        # slice of it (5000 img/s = 0.2 ms/img) for a consistent ratio
        print(json.dumps({
            "metric": f"{stem}_{kind}_p50_latency",
            "value": round(p50, 3),
            "unit": "ms/image (device, batch 1)",
            "vs_baseline": round((1e3 / BASELINE_IMG_PER_S) / p50, 3),
        }))
        return

    img_per_s = imgs_per_dispatch / best
    print(json.dumps({
        "metric": f"{stem}_{kind}_throughput",
        "value": round(img_per_s, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_s / BASELINE_IMG_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
