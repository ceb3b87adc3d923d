"""Make JAX_PLATFORMS=cpu actually work for the CLIs.

This environment registers a tunneled TPU backend ("axon") through site
config that re-forces itself over the JAX_PLATFORMS environment variable;
the only reliable override is `jax.config.update("jax_platforms", ...)`
after importing jax (see tests/conftest.py).  Every CLI entry point calls
`apply_platform_env()` first so that the documented

    JAX_PLATFORMS=cpu python -m mqgan_tpu.train.trainer ...

invocations behave as written, on this machine and on any other.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    """Honor the JAX_PLATFORMS env var even when site config overrides it."""
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax

    if jax.config.jax_platforms != want:
        jax.config.update("jax_platforms", want)
