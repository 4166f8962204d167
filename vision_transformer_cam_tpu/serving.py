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
          and cfg are returned unchanged.
- "bf16": bf16 activations+params, tanh GELU, clamp softmax, fused Pallas
          attention — quality cost <= 0.0001 mAP on trained weights.
- "int8": bf16 mode plus W8A8 GEMMs with static calibrated activation
          scales and int8 attention I/O (the bench.py headline config,
          5 516 img/s on one v5e chip) — quality cost <= 0.001 mAP.

The reference has no serving tier at all — validate.py/predict.py run the
f32 training graph (validate.py:106-110); this module is the TPU-native
replacement for "just run it in eval mode".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SERVING_MODES = ("off", "bf16", "int8")


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
    cfg = cfg.replace(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                      gelu_approx=True, softmax_clamp=True,
                      attn_impl=impl)
    if mode == "int8":
        cfg = cfg.replace(int8_attn_io=True)
    return cfg


def apply_serving_mode(params, cfg, mode: str, calib_images=None,
                       calib_margin: float = 1.0):
    """Return (params, cfg) rewritten for the given serving mode.

    calib_images: [N, H, W, 3] float batch for the int8 static activation
    calibration (8-16 representative images suffice; quality_eval.py uses
    16).  Required for "int8" — passing none would silently fall back to
    dynamic absmax quantization, which is both slower (2 341 vs 5 516
    img/s) and NOT the characterized config, so it raises instead.
    """
    new_cfg = serving_config(cfg, mode)
    if mode == "off":
        return params, new_cfg
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
    if mode == "int8":
        if calib_images is None:
            raise ValueError(
                "serving mode 'int8' needs calib_images for the static "
                "activation scales (dynamic quantization is slower than "
                "bf16 — see BENCHMARKS.md)")
        from vision_transformer_cam_tpu.ops.quant import (
            calibrate_act_scales, quantize_params)
        scales = calibrate_act_scales(
            params, new_cfg, jnp.asarray(calib_images, jnp.float32),
            margin=calib_margin)
        params = quantize_params(params, act_scales=scales)
    return params, new_cfg
