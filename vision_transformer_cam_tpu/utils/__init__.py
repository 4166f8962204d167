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
