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
