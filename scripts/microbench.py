"""Stage-level microbenchmarks on the real TPU chip.

Times individual pieces of the CAM-extraction hot path so perf work targets
the real bottleneck (BENCHMARKS.md records the results).  One variant per
invocation (first compile is slow; run ONE TPU process at a time):

  python scripts/microbench.py attn          # fused v2 kernel, one layer
  python scripts/microbench.py attn-rollout  # v2 + in-kernel rollout update
  python scripts/microbench.py attn-int8 [block_b]   # int8 serving I/O path
  python scripts/microbench.py attn-int8-rollout     # int8 I/O + rollout
  python scripts/microbench.py gemms         # the 4 per-block GEMMs, XLA bf16
  python scripts/microbench.py gemms-int8    # same, XLA int8 W8A8 static
  python scripts/microbench.py ln            # the 2 per-block LayerNorms
  python scripts/microbench.py model         # full cam_extract (bench parity)

Shapes: ViT-B/16 @224, batch 512, bf16 — the headline bench configuration.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B, N, C, H, DH, HID = 512, 197, 768, 12, 64, 3072
SCALE = 0.125
DEPTH = 12


def timeit(fn, *args, chunk=20, iters=3):
    """Best-of-iters mean ms over chunk chained dispatches; syncs via a
    scalar device->host read (block_until_ready is a no-op on the tunnel)."""
    def sync(r):
        leaf = jax.tree.leaves(r)[0]
        return float(jnp.sum(leaf.astype(jnp.float32).ravel()[:1]))

    sync(fn(*args))
    sync(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(chunk):
            r = fn(*args)
        sync(r)
        best = min(best, (time.perf_counter() - t0) / chunk)
    return best * 1e3


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "attn"
    key = jax.random.key(0)
    dt = jnp.bfloat16

    if variant in ("attn", "attn-rollout", "attn-headmean"):
        from vision_transformer_cam_tpu.kernels.attention import (
            masked_attention_fused)
        qkv = jax.random.normal(key, (B, N, 3 * C), dt)
        bg = (jax.random.uniform(jax.random.key(1), (B, N)) < 0.3
              ).astype(dt)
        # the 79 MB joint is a jit ARGUMENT, never a closure — closed-over
        # arrays bake into the HLO as constants and trip the remote
        # compiler's payload limit (CLAUDE.md HTTP-413 gotcha)
        joint = jnp.broadcast_to(jnp.eye(N, dtype=jnp.float32), (B, N, N)) \
            if variant == "attn-rollout" else None

        def f(qkv, bg, joint):
            return masked_attention_fused(
                qkv, bg, joint, num_heads=H, scale=SCALE,
                with_headmean=variant == "attn-headmean",
                clamp_softmax=True,
                block_b=int(sys.argv[2]) if len(sys.argv) > 2 else 1)

        ms = timeit(jax.jit(f), qkv, bg, joint)
        print(f"{variant}: {ms:.2f} ms/layer-call  "
              f"({ms * DEPTH:.1f} ms per 12-layer model)")

    elif variant in ("attn-int8", "attn-int8-rollout"):
        from vision_transformer_cam_tpu.kernels.attention import (
            masked_attention_fused)
        qkv = jax.random.randint(key, (B, N, 3 * C), -127, 127, jnp.int8)
        bg = (jax.random.uniform(jax.random.key(1), (B, N)) < 0.3
              ).astype(jnp.float32)
        joint = jnp.broadcast_to(jnp.eye(N, dtype=jnp.float32), (B, N, N)) \
            if variant.endswith("rollout") else None
        scales = jnp.asarray([0.02, 0.02, 0.02, 1 / 0.05], jnp.float32)

        def f(qkv, bg, joint):  # joint as ARGUMENT (HTTP-413 gotcha)
            return masked_attention_fused(
                qkv, bg, joint, scales, num_heads=H, scale=SCALE,
                clamp_softmax=True,
                block_b=int(sys.argv[2]) if len(sys.argv) > 2 else 1)

        ms = timeit(jax.jit(f), qkv, bg, joint)
        print(f"{variant}: {ms:.2f} ms/layer-call  "
              f"({ms * DEPTH:.1f} ms per 12-layer model)")

    elif variant in ("gemms", "gemms-int8"):
        x = jax.random.normal(key, (B, N, C), dt)
        wqkv = jax.random.normal(jax.random.key(1), (C, 3 * C), dt) * 0.02
        wproj = jax.random.normal(jax.random.key(2), (C, C), dt) * 0.02
        wfc1 = jax.random.normal(jax.random.key(3), (C, HID), dt) * 0.02
        wfc2 = jax.random.normal(jax.random.key(4), (HID, C), dt) * 0.02
        if variant == "gemms":
            def f(x):
                q = jnp.dot(x, wqkv, preferred_element_type=dt)
                o = jnp.dot(q[..., :C], wproj, preferred_element_type=dt)
                h = jnp.dot(o, wfc1, preferred_element_type=dt)
                h = jax.nn.gelu(h, approximate=True)
                return jnp.dot(h, wfc2, preferred_element_type=dt)
        else:
            from vision_transformer_cam_tpu.ops.quant import quantize_weight

            qs = {k: dict(quantize_weight(w), act_scale=jnp.float32(0.05))
                  for k, w in (("qkv", wqkv), ("proj", wproj),
                               ("fc1", wfc1), ("fc2", wfc2))}

            from vision_transformer_cam_tpu.ops.quant import qlinear

            def f(x):
                q = qlinear(x, qs["qkv"], out_dtype=dt)
                o = qlinear(q[..., :C], qs["proj"], out_dtype=dt)
                h = jax.nn.gelu(qlinear(o, qs["fc1"], out_dtype=dt),
                                approximate=True)
                return qlinear(h, qs["fc2"], out_dtype=dt)
        ms = timeit(jax.jit(f), x)
        print(f"{variant}: {ms:.2f} ms/block GEMMs  "
              f"({ms * DEPTH:.1f} ms per 12-layer model)")

    elif variant in ("mlp", "mlp-int8", "qkv-int8", "gemms-fused-int8"):
        from vision_transformer_cam_tpu.kernels.gemm import (
            linear_int8_fused, mlp_fused, mlp_fused_int8)
        from vision_transformer_cam_tpu.ops.quant import quantize_weight
        x = jax.random.normal(key, (B, N, C), dt)
        wfc1 = jax.random.normal(jax.random.key(3), (C, HID), jnp.float32) * 0.02
        bfc1 = jnp.zeros((HID,), jnp.float32)
        wfc2 = jax.random.normal(jax.random.key(4), (HID, C), jnp.float32) * 0.02
        bfc2 = jnp.zeros((C,), jnp.float32)
        if variant == "mlp":
            def f(x):
                return mlp_fused(x, wfc1.astype(dt), bfc1, wfc2.astype(dt),
                                 bfc2, gelu_approx=True,
                                 block_m=int(sys.argv[2]) if len(sys.argv) > 2
                                 else 256)
            ms = timeit(jax.jit(f), x)
            print(f"mlp(bf16 fused): {ms:.2f} ms "
                  f"({ms * DEPTH:.1f} ms per model)")
        elif variant == "mlp-int8":
            q1, q2 = quantize_weight(wfc1), quantize_weight(wfc2)
            a1, a2 = 0.05, 0.05
            cs1 = (q1["scale"].reshape(1, -1) * a1).astype(jnp.float32)
            cs2 = (q2["scale"].reshape(1, -1) * a2).astype(jnp.float32)

            def f(x):
                return mlp_fused_int8(
                    x, q1["kernel_q"], cs1, bfc1, q2["kernel_q"], cs2, bfc2,
                    1.0 / a1, 1.0 / a2, gelu_approx=True,
                    block_m=int(sys.argv[2]) if len(sys.argv) > 2 else 512)
            ms = timeit(jax.jit(f), x)
            print(f"mlp-int8(fused): {ms:.2f} ms "
                  f"({ms * DEPTH:.1f} ms per model)")
        elif variant == "qkv-int8":
            wqkv = jax.random.normal(jax.random.key(1), (C, 3 * C),
                                     jnp.float32) * 0.02
            qq = quantize_weight(wqkv)
            csq = (qq["scale"].reshape(1, -1) * 0.05).astype(jnp.float32)
            bq = jnp.zeros((3 * C,), jnp.float32)

            def f(x):
                return linear_int8_fused(
                    x, qq["kernel_q"], csq, bq, 1.0 / 0.05,
                    block_m=int(sys.argv[2]) if len(sys.argv) > 2 else 512)
            ms = timeit(jax.jit(f), x)
            print(f"qkv-int8(fused): {ms:.2f} ms "
                  f"({ms * DEPTH:.1f} ms per model)")
        else:  # gemms-fused-int8: the whole per-block GEMM set
            wqkv = jax.random.normal(jax.random.key(1), (C, 3 * C),
                                     jnp.float32) * 0.02
            wproj = jax.random.normal(jax.random.key(2), (C, C),
                                      jnp.float32) * 0.02
            qq, qp = quantize_weight(wqkv), quantize_weight(wproj)
            q1, q2 = quantize_weight(wfc1), quantize_weight(wfc2)
            a = 0.05
            csq = (qq["scale"].reshape(1, -1) * a).astype(jnp.float32)
            csp = (qp["scale"].reshape(1, -1) * a).astype(jnp.float32)
            cs1 = (q1["scale"].reshape(1, -1) * a).astype(jnp.float32)
            cs2 = (q2["scale"].reshape(1, -1) * a).astype(jnp.float32)
            zq = jnp.zeros((3 * C,), jnp.float32)
            zc = jnp.zeros((C,), jnp.float32)

            def f(x):
                q = linear_int8_fused(x, qq["kernel_q"], csq, zq, 1.0 / a)
                o = linear_int8_fused(q[..., :C], qp["kernel_q"], csp, zc,
                                      1.0 / a)
                return mlp_fused_int8(o, q1["kernel_q"], cs1, bfc1,
                                      q2["kernel_q"], cs2, bfc2, 1.0 / a,
                                      1.0 / a, gelu_approx=True)
            ms = timeit(jax.jit(f), x)
            print(f"gemms-fused-int8: {ms:.2f} ms/block "
                  f"({ms * DEPTH:.1f} ms per model)")

    elif variant in ("dots-bf16", "dots-int8", "dots-int8-dq"):
        # pure GEMM rate isolation: pre-quantized inputs, no quantize pass;
        # -dq adds only the int32->scaled-bf16 dequant epilogue
        m = B * N
        shapes = [(C, 3 * C), (C, C), (C, HID), (HID, C)]
        if variant == "dots-bf16":
            ws = [jax.random.normal(jax.random.key(i), s, dt) * 0.02
                  for i, s in enumerate(shapes)]
            xs = [jax.random.normal(jax.random.key(10 + i), (m, s[0]), dt)
                  for i, s in enumerate(shapes)]

            def f(*xs):
                return [jnp.dot(x, w, preferred_element_type=dt)
                        for x, w in zip(xs, ws)]
        else:
            ws = [jax.random.randint(jax.random.key(i), s, -127, 127,
                                     jnp.int8) for i, s in enumerate(shapes)]
            xs = [jax.random.randint(jax.random.key(10 + i), (m, s[0]),
                                     -127, 127, jnp.int8)
                  for i, s in enumerate(shapes)]
            dq = variant == "dots-int8-dq"

            def f(*xs):
                outs = []
                for x, w in zip(xs, ws):
                    acc = jnp.dot(x, w, preferred_element_type=jnp.int32)
                    if dq:
                        acc = (acc.astype(jnp.float32) * 7.8e-5).astype(dt)
                    outs.append(acc)
                return outs
        ms = timeit(jax.jit(f), *xs)
        print(f"{variant}: {ms:.2f} ms/block dots  "
              f"({ms * DEPTH:.1f} ms per 12-layer model)")

    elif variant == "ln":
        from vision_transformer_cam_tpu.models.vit import _layer_norm
        x = jax.random.normal(key, (B, N, C), dt)
        sc = jnp.ones((C,), dt)
        bi = jnp.zeros((C,), dt)

        def f(x):
            y = _layer_norm(x, sc, bi, 1e-6)
            return _layer_norm(y, sc, bi, 1e-6)

        ms = timeit(jax.jit(f), x)
        print(f"ln: {ms:.2f} ms per 2 LNs  "
              f"({ms * DEPTH:.1f} ms per 12-layer model)")

    elif variant == "io":
        # host JPEG->tensor pipeline: native C++ (libjpeg + threads) vs the
        # PIL fallback, on VOC-typical 500x375 JPEGs.  Host-side only — no
        # TPU involved; this box has 1 core, so the threaded win shows up
        # on real multi-core hosts (num_threads is per-call).
        import tempfile

        import numpy as np
        import PIL.Image
        from vision_transformer_cam_tpu.data.transforms import (
            load_and_preprocess)
        from vision_transformer_cam_tpu.io import native_loader

        rng = np.random.default_rng(0)
        tmpd = tempfile.mkdtemp()
        paths = []
        for i in range(64):
            arr = rng.integers(0, 256, size=(375, 500, 3), dtype=np.uint8)
            p = os.path.join(tmpd, f"{i}.jpg")
            PIL.Image.fromarray(arr).save(p, quality=90)
            paths.append(p)

        mean = np.asarray((0.485, 0.456, 0.406), np.float32)
        std = np.asarray((0.229, 0.224, 0.225), np.float32)
        # warm both paths OUTSIDE the timed window: the first native call
        # may trigger the one-time `make -C native` build + ctypes load
        native_loader.decode_batch(paths[:4], 224)
        load_and_preprocess(paths[0], 224, mean, std)

        t0 = time.perf_counter()
        native_loader.decode_batch(paths, 224)
        t_native = time.perf_counter() - t0
        t0 = time.perf_counter()
        for p in paths:
            load_and_preprocess(p, 224, mean, std)
        t_pil = time.perf_counter() - t0
        print(f"io: native {len(paths) / t_native:.0f} img/s, "
              f"PIL fallback {len(paths) / t_pil:.0f} img/s "
              f"({os.cpu_count()} host cores)")

    elif variant == "model":
        from vision_transformer_cam_tpu import configs
        from vision_transformer_cam_tpu.models import vit
        from vision_transformer_cam_tpu.ops import rollout
        cfg = configs.vit_base_patch16_224_in21k(num_classes=20)
        cfg = cfg.replace(representation_size=None, dtype=dt, param_dtype=dt,
                          attn_impl="pallas", gelu_approx=True,
                          softmax_clamp=True)
        params = vit.init(cfg, key)
        images = jax.random.normal(jax.random.key(1), (B, 224, 224, 3),
                                   jnp.float32)

        @jax.jit
        def f(params, images):
            out = vit.forward(params, images, cfg, need_rollout=True)
            return rollout.cam_from_rollout_row(out.rollout_row,
                                                cfg.grid_size)

        ms = timeit(f, params, images, chunk=10)
        print(f"model: {ms:.2f} ms/batch ({B / ms * 1e3:.0f} img/s)")

    else:
        raise SystemExit(f"unknown variant {variant}")


if __name__ == "__main__":
    main()
