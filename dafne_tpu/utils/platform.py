"""Explicit JAX platform pinning for CLI tools.

This build environment force-registers the `axon` TPU plugin from a
sitecustomize hook and exports JAX_PLATFORMS=axon globally; overriding the
env var per-process does NOT work (the plugin re-registers regardless).
The only reliable pin is `jax.config.update("jax_platforms", ...)` BEFORE
the backend initializes.

Tools call `pin_platform_from_env()` first thing in main(): set
`DAFNE_PLATFORM=cpu` (optionally with
`XLA_FLAGS=--xla_force_host_platform_device_count=8`) to run a tool on
host CPUs, e.g. for CPU smoke runs of the training CLI.
"""

from __future__ import annotations

import os


def pin_platform_from_env() -> str:
    """Pin jax to $DAFNE_PLATFORM if set; returns the chosen platform name.

    Must run before any jax.devices()/jit call in the process.
    """
    plat = os.environ.get("DAFNE_PLATFORM", "").strip()
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    return plat or os.environ.get("JAX_PLATFORMS", "")
