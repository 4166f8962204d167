"""One-call serving-mode configuration.

The fast serving configs (measured in BENCHMARKS.md, quality-characterized
on trained weights by scripts/quality_eval.py) were previously assembled by
hand in each entry point; this is the single API a user switches a parity
model into a production-serving one with:

    params, cfg = serving.apply_serving_mode(params, cfg, "int8",
                                             calib_images=batch)

Modes
-----
- "off":  reference-parity f32 graph (the f64/f32 goldens' path); params
          and cfg are returned unchanged.  NOTE: on TPU the backend-default
          matmul precision runs f32 dots as bf16 passes (~5e-3 CAM dev vs
          f64); for the strict ≤1e-5 parity class set
          cfg.matmul_precision="highest" (BENCHMARKS "f32 fidelity on
          TPU").
- "bf16": bf16 activations+params, tanh GELU, clamp softmax, fused Pallas
          attention — quality cost <= 0.0001 mAP on trained weights.
- "int8": bf16 mode plus W8A8 GEMMs with static calibrated activation
          scales and int8 attention I/O with per-head q/k/v scales (the
          bench.py headline config) — quality cost <= 0.001 mAP.
- "int8_hifi": int8 W8A8 GEMMs but the attention core stays bf16/f32
          (no int8 attention I/O) — the high-fidelity serving point: CAM
          deviation stays in the ~1e-4 class of the bf16 path because the
          quantization never touches the attention probabilities the
          rollout is built from, at a modest throughput cost vs "int8"
          (numbers in BENCHMARKS.md).

The reference has no serving tier at all — validate.py/predict.py run the
f32 training graph (validate.py:106-110); this module is the TPU-native
replacement for "just run it in eval mode".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SERVING_MODES = ("off", "bf16", "int8", "int8_hifi")


def serving_config(cfg, mode: str):
    """The config half of apply_serving_mode (no params needed)."""
    if mode not in SERVING_MODES:
        raise ValueError(f"serving mode {mode!r}: expected one of "
                         f"{SERVING_MODES}")
    if mode == "off":
        return cfg
    # the fused Pallas kernel is the serving attention on TPU; elsewhere
    # (CPU CI, debugging) Pallas would run in interpret mode — orders of
    # magnitude slower than XLA — so resolve by backend, like the CLIs'
    # attn_impl=auto.  Callers can still force either impl afterwards.
    impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    # per_sample_mask_norm: the reference VALIDATES at batch_size=1
    # (validate.py:98), where its global-max mask normalization
    # (vit_model.py:335,372) IS the per-sample max — so per-sample is the
    # faithful inference semantics for a batched server.  Batch-global at
    # batch>1 couples images: any image whose cls-attention peak is below
    # mask_threshold x the batch max gets its ENTIRE patch set bg-masked
    # (measured: 58/64 synthetic eval images wiped to an all-NaN rollout
    # row — scripts/seg_diagnose.py).  Per-sample also makes serving
    # outputs batch-composition-invariant, which a deployment contract
    # needs.  Training keeps the reference's batch-global default.
    cfg = cfg.replace(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                      gelu_approx=True, softmax_clamp=True,
                      attn_impl=impl, per_sample_mask_norm=True)
    if mode == "int8":
        # int8_hifi deliberately leaves int8_attn_io off: the GEMMs run
        # W8A8 but the attention probabilities (and hence the rollout CAM)
        # are computed from unquantized bf16 q/k/v
        if cfg.seq_len > 640:
            # >1k-token regime: int8 attention I/O measured slower than
            # the output-only int8 path — 220.1 vs 223.1 img/s at N=1025
            # (ViT-L/16@512, 36 MB partition, batch 32).  The quantize
            # epilogues that pay for themselves at N<=577 lose once the
            # kernel is q-blocked at 384 rows; the "int8" tier therefore
            # routes its attention through the hifi kernel here (GEMMs
            # stay W8A8 — only the attention I/O story changes).  Fidelity
            # between the two routes is EQUIVALENT, not better: a
            # two-replicate trained-weights eval at @512 flips sign on
            # every consistency metric between seeds (BENCHMARKS
            # "ViT-L/16@512 quality"), so the reroute stands on
            # throughput alone.
            cfg = cfg.replace(int8_attn_out=True)
        else:
            cfg = cfg.replace(int8_attn_io=True)
    elif mode == "int8_hifi":
        # output-only int8 attention I/O: probabilities stay float (the
        # hifi contract) but the kernel emits the output pre-quantized for
        # the int8 proj GEMM — saves the bf16 attn-out write + the proj
        # input-quantize pass at zero fidelity cost vs quantizing outside
        cfg = cfg.replace(int8_attn_out=True)
    return cfg


def apply_serving_mode(params, cfg, mode: str, calib_images=None,
                       calib_margin: float = 1.0):
    """Return (params, cfg) rewritten for the given serving mode.

    calib_images: [N, H, W, 3] float batch for the int8 static activation
    calibration (8-16 representative images suffice; quality_eval.py uses
    16).  Required for "int8"/"int8_hifi" — passing none would silently
    fall back to dynamic absmax quantization, which is both slower (2 341
    vs 5 516 img/s) and NOT the characterized config, so it raises instead.
    """
    new_cfg = serving_config(cfg, mode)
    if mode == "off":
        return params, new_cfg
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
    if mode in ("int8", "int8_hifi"):
        if calib_images is None:
            raise ValueError(
                f"serving mode {mode!r} needs calib_images for the static "
                "activation scales (dynamic quantization is slower than "
                "bf16 — see BENCHMARKS.md)")
        from vision_transformer_cam_tpu.ops.quant import (
            calibrate_act_scales, quantize_params)
        scales = calibrate_act_scales(
            params, new_cfg, jnp.asarray(calib_images, jnp.float32),
            margin=calib_margin)
        params = quantize_params(params, act_scales=scales)
    return params, new_cfg


def serving_mode_help() -> str:
    """One-line-per-mode summary for CLI --serving help strings."""
    return ("off = reference-parity f32; bf16 = bf16 + tanh GELU + clamp "
            "softmax + fused Pallas attention; int8 adds W8A8 GEMMs + "
            "per-head int8 attention I/O (fastest; past 640 tokens it "
            "auto-routes to the output-only int8 attention path — measured "
            "faster AND higher-fidelity there); int8_hifi keeps the "
            "attention core float for ~1e-4-class CAM fidelity")
