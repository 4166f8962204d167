"""Device-side profile of the int8 serving model (the bench.py default).

Captures a jax.profiler trace of 3 CAM-extraction batches and prints the
per-op device-time table — works through the tunneled platform (the
xplane/trace.json land locally).  This is how the in-model stage budget in
BENCHMARKS.md ("In-model device profile") was measured; standalone
microbenchmarks over-estimate stages that XLA fuses or overlaps in-model.

  python scripts/profile_serving.py [--batch N] [--trace-dir DIR]
                                    [--train] [--model NAME] [--ln-quant]
                                    [--serving {bf16,int8,int8_hifi}]

--train profiles the fine-tune step (bf16 + Pallas fwd/bwd kernels + remat,
the bench.py --train config) instead of the int8 serving forward — the
ground truth for the training-floor statement in BENCHMARKS.md.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from vision_transformer_cam_tpu.utils import check_cli_flags
    check_cli_flags(sys.argv, bool_flags=("--train", "--ln-quant"),
                    value_flags=("--batch", "--trace-dir", "--model",
                                 "--serving", "--top"),
                    prog="profile_serving.py")
    batch = int(sys.argv[sys.argv.index("--batch") + 1]) \
        if "--batch" in sys.argv else 512
    trace_dir = sys.argv[sys.argv.index("--trace-dir") + 1] \
        if "--trace-dir" in sys.argv else "/tmp/jax-trace-serving"

    from vision_transformer_cam_tpu import configs, serving
    from vision_transformer_cam_tpu.models import vit
    from vision_transformer_cam_tpu.ops import rollout
    from vision_transformer_cam_tpu.utils import profiling

    model = sys.argv[sys.argv.index("--model") + 1] \
        if "--model" in sys.argv else "vit_base_patch16_224_in21k"
    cfg = configs.resolve_model(model)(num_classes=20)
    cfg = cfg.replace(representation_size=None)
    # profile the SAME long-N config bench/export ship (scoped-VMEM raised,
    # single-q-block kernel) — otherwise the designated attribution tool
    # traces a different graph than the one serving runs
    from vision_transformer_cam_tpu.utils import tune_tpu_for_long_sequence
    tune_tpu_for_long_sequence(cfg)

    if "--train" in sys.argv:
        # the bench.py --train config: bf16, Pallas fwd+bwd kernels, remat
        from vision_transformer_cam_tpu.train.state import (
            create_train_state, make_optimizer)
        from vision_transformer_cam_tpu.train.step import train_step
        if "--batch" not in sys.argv:
            batch = 256
        tcfg = cfg.replace(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                           attn_impl="pallas")
        tx, _ = make_optimizer(configs.OptimConfig(),
                               global_batch_size=batch, steps_per_epoch=100)
        state = create_train_state(vit.init(tcfg, jax.random.key(0)), tx)
        images = jax.random.normal(jax.random.key(1),
                                   (batch, cfg.img_size, cfg.img_size, 3),
                                   jnp.float32)
        labels = (jax.random.uniform(jax.random.key(2), (batch, 20)) < 0.15
                  ).astype(jnp.float32)
        rng = jax.random.key(3)

        def run_step(st):
            return train_step(st, images, labels, rng, tcfg, tx)

        state, m = run_step(state)
        _ = float(m["loss"])          # compile + warm
        n_iters = 3
        with profiling.trace(trace_dir):
            for _ in range(n_iters):
                state, m = run_step(state)
            _ = float(m["loss"])
    else:
        params = vit.init(cfg, jax.random.key(0))
        calib = jax.random.normal(jax.random.key(7),
                                  (8, cfg.img_size, cfg.img_size, 3),
                                  jnp.float32)
        mode = "int8"
        if "--serving" in sys.argv:
            i = sys.argv.index("--serving")
            modes = tuple(m for m in serving.SERVING_MODES if m != "off")
            if i + 1 >= len(sys.argv) or sys.argv[i + 1] not in modes:
                raise SystemExit(f"--serving needs one of {modes} (this "
                                 "script profiles the serving graphs)")
            mode = sys.argv[i + 1]
        params, cfg = serving.apply_serving_mode(params, cfg, mode, calib)
        if "--ln-quant" in sys.argv:
            cfg = cfg.replace(ln_quant_fusion=True)

        @jax.jit
        def f(params, images):
            out = vit.forward(params, images, cfg, need_rollout=True)
            return rollout.cam_from_rollout_row(out.rollout_row,
                                                cfg.grid_size)

        x = jax.random.normal(jax.random.key(1),
                              (batch, cfg.img_size, cfg.img_size, 3),
                              jnp.float32)
        float(jnp.sum(f(params, x)[:1]))  # compile + warm (d2h sync)
        n_iters = 3
        with profiling.trace(trace_dir):
            for _ in range(n_iters):
                r = f(params, x)
            float(jnp.sum(r[:1]))

    traces = sorted(glob.glob(os.path.join(trace_dir, "plugins", "profile",
                                           "*", "*.trace.json.gz")))
    if not traces:
        raise SystemExit(f"no trace produced under {trace_dir}")
    with gzip.open(traces[-1]) as fh:
        data = json.load(fh)
    pids = {e["pid"]: e["args"].get("name") for e in data["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = [p for p, name in pids.items() if name and "TPU" in name]
    # SELF-time accounting: Chrome-format X events nest by time on a tid
    # (jit_f contains while.12 contains the per-layer ops), so summing raw
    # durations double-counts every envelope into TOTAL (review finding).
    # Sweep each tid's events with a stack and subtract child time from the
    # enclosing event; envelopes (jit_f, while.12) then report only their
    # scheduling overhead while leaf ops keep their full durations.
    # ...and module/step envelope THREADS (jit_f lives on "XLA Modules",
    # not nested with the op rows' tid, so the sweep alone can't subtract
    # it) are excluded outright.
    tids = {(e["pid"], e["tid"]): e["args"].get("name")
            for e in data["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "thread_name"}
    envelope = {k for k, name in tids.items()
                if name and ("module" in name.lower()
                             or name.lower().startswith("step"))}
    per_tid = collections.defaultdict(list)
    for e in data["traceEvents"]:
        if e.get("ph") == "X" and e["pid"] in dev \
                and (e["pid"], e.get("tid")) not in envelope:
            per_tid[(e["pid"], e.get("tid"))].append(
                (e.get("ts", 0), e.get("dur", 0), e.get("name", "?")))
    dur = collections.Counter()
    for events in per_tid.values():
        events.sort(key=lambda t: (t[0], -t[1]))
        stack = []  # (end_ts, name, self_dur) — self_dur mutated via index
        selfd = []
        for ts, d, name in events:
            while stack and ts >= stack[-1][0]:
                end, nm, i = stack.pop()
                dur[nm] += selfd[i]
            if stack:  # child: subtract from the enclosing event
                selfd[stack[-1][2]] -= d
            stack.append((ts + d, name, len(selfd)))
            selfd.append(d)
        while stack:
            end, nm, i = stack.pop()
            dur[nm] += selfd[i]
    top = int(sys.argv[sys.argv.index("--top") + 1]) \
        if "--top" in sys.argv else 20
    print(f"device-op totals over {n_iters} batches of {batch} "
          f"(divide by {n_iters} for per-batch):")
    for name, d in dur.most_common(top):
        print(f"  {d / 1e3:9.2f} ms  {name}")
    print(f"  {sum(dur.values()) / 1e3:9.2f} ms  TOTAL device time")


if __name__ == "__main__":
    main()
