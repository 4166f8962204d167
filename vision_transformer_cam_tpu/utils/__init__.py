"""Shared utilities: metrics (utils/metrics.py) and runtime helpers."""

import os


def honor_jax_platforms_env() -> None:
    """Make JAX_PLATFORMS authoritative for CLI entry points.

    A site-installed PJRT plugin may force its own platform onto
    jax.config.jax_platforms at interpreter start, silently overriding the
    user's JAX_PLATFORMS (e.g. `JAX_PLATFORMS=cpu` for a host-only run).
    Re-assert the env value before first backend use."""
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax
        jax.config.update("jax_platforms", want)


SCOPED_VMEM_MARKER = "_VITCAM_SCOPED_VMEM_KIB"
LONG_N_SCOPED_VMEM_KIB = 32768
# >1k-token regime (N>640, e.g. ViT-L/16@512's 1025): the bf16 forward
# kernel's in-model scoped allocation is 33.0-33.1 MB at every viable
# q_block (320/384) — it OOMs the 32 MB partition by ~1 MB, fits 36 MB.
# int8 fits either; 36 MB costs int8 nothing measurable (qblock_sweep
# 36 MB probe).  Chosen by tune_tpu_for_long_sequence via cfg.seq_len.
GT1K_SCOPED_VMEM_KIB = 36864


def tune_tpu_for_long_sequence(cfg) -> bool:
    """Long-sequence TPU serving setup (N > 512, e.g. ViT-L/16@384's 577
    tokens): raise libtpu's scoped-VMEM partition via LIBTPU_INIT_ARGS so
    the attention kernel can run ONE query block per image instead of
    q-blocking around the default 16 MB limit — measured 467.7 -> 504.5
    img/s end-to-end (BENCHMARKS 'ViT-L@384').  Returns True when applied.

    MUST run before the first TPU use: LIBTPU_INIT_ARGS is consumed once at
    backend init (the CLIs call this right after config resolution).  Also
    sets a marker env the kernel's auto q_block reads.  No-op for short
    sequences — the raised limit measured 5.8% SLOWER on ViT-B@224 (XLA's
    own fusions schedule worse with a bigger scoped partition), so this is
    strictly a long-N knob.  Harmless off-TPU (CPU jax ignores the env)."""
    if cfg.seq_len <= 512 or os.environ.get(SCOPED_VMEM_MARKER):
        return False
    want = (GT1K_SCOPED_VMEM_KIB if cfg.seq_len > 640
            else LONG_N_SCOPED_VMEM_KIB)
    prev = os.environ.get("LIBTPU_INIT_ARGS", "")
    # The marker must only be set when the partition libtpu will ACTUALLY
    # use is >= LONG_N_SCOPED_VMEM_KIB — the kernel's auto q_block trusts it
    # to run one N-row query block, which OOMs under the 16 MB default.
    import re
    m = re.search(r"--xla_tpu_scoped_vmem_limit_kib=(\d+)", prev)
    if m is not None:
        # the user pinned a partition (e.g. a sweep): honor it, and only
        # advertise the single-q-block config if it is big enough
        have = int(m.group(1))
        if have >= LONG_N_SCOPED_VMEM_KIB:
            # honor the pin (e.g. a sweep).  At N>640 a 32 MB pin still
            # advertises the marker — int8 fits there; a bf16 forward will
            # OOM with a clear Mosaic message naming the partition.
            os.environ[SCOPED_VMEM_MARKER] = str(have)
            return True
        return False
    # Too late if a TPU backend already consumed LIBTPU_INIT_ARGS (e.g. a
    # short-N model ran first in this process): setting the env now has no
    # effect, so advertising 32 MB would hand the kernel an OOM config.
    # CPU/interpret runs ignore the env entirely — safe either way.
    import jax._src.xla_bridge as _xb
    init_check = getattr(_xb, "backends_are_initialized", None)
    if init_check is not None:
        initialized = init_check()
    elif hasattr(_xb, "_backends"):
        initialized = bool(_xb._backends)
    else:
        # jax internals changed and we cannot PROVE the backend is still
        # uninitialized — setting the marker without the partition actually
        # applying would hand the kernel an OOM config, so fail safe: keep
        # the default (q-blocked, correct, ~7% slower at N=577).
        import warnings
        warnings.warn(
            "tune_tpu_for_long_sequence: cannot determine backend-init "
            "state (jax._src.xla_bridge API changed); keeping the default "
            "scoped-VMEM partition. Set LIBTPU_INIT_ARGS="
            f"--xla_tpu_scoped_vmem_limit_kib={LONG_N_SCOPED_VMEM_KIB} in "
            "the environment to restore the long-N fast path.")
        return False
    if initialized:
        import jax
        if jax.default_backend() != "cpu":
            import warnings
            warnings.warn(
                "tune_tpu_for_long_sequence called after TPU backend init: "
                "LIBTPU_INIT_ARGS can no longer take effect; keeping the "
                "default scoped-VMEM partition (q-blocked kernel). Call it "
                "before the first device use (or run long-N models in their "
                "own process) for the fast single-q-block config.")
            return False
    flag = f"--xla_tpu_scoped_vmem_limit_kib={want}"
    os.environ["LIBTPU_INIT_ARGS"] = (prev + " " + flag).strip()
    os.environ[SCOPED_VMEM_MARKER] = str(want)
    return True


def check_cli_flags(argv, bool_flags, value_flags, prog="script"):
    """Strict sys.argv validation for the hand-rolled script parsers
    (scripts/quality_eval.py, qblock_sweep.py, profile_serving.py): reject
    unknown/misspelled flags and value flags missing their value.  A typo'd
    `--sed 1` silently reusing seed 0 poisons exactly the replicate-vs-
    structural-noise comparison the flag exists for (review finding; bench.py
    carries its own copy of this check, pinned by test)."""
    bool_flags, value_flags = set(bool_flags), set(value_flags)
    i = 1
    while i < len(argv):
        tok = argv[i]
        if tok in value_flags:
            if i + 1 >= len(argv) or argv[i + 1].startswith("--"):
                raise SystemExit(f"{prog}: {tok} needs a value")
            i += 2
            continue
        if tok.startswith("--") and tok not in bool_flags:
            raise SystemExit(
                f"{prog}: unknown flag {tok}; known: "
                f"{' '.join(sorted(bool_flags | value_flags))}")
        i += 1


def same_seeds(seed: int):
    """Determinism entry (same_seeds, duplicated at train_and_validate.py:
    23-31 / predict.py:51-59 / validate.py:21-29).  Seeds the host-side
    generators and returns the jax PRNG key that replaces torch/cuda seeding
    — XLA programs are deterministic given the key, so there is no analog of
    the reference's cudnn.deterministic toggle to set."""
    import random

    import numpy as np

    random.seed(seed)
    np.random.seed(seed)
    import jax
    return jax.random.key(seed)
