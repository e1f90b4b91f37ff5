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
    setup_compilation_cache()
    return plat or os.environ.get("JAX_PLATFORMS", "")


def setup_compilation_cache() -> str:
    """Enable JAX's persistent compilation cache for the CLI tools.

    First compile of the full detector program takes 1-5 minutes on the
    remote-compile TPU toolchain; the persistent cache makes restarts and
    repeated eval runs near-instant (the test suite already uses one,
    tests/conftest.py).  Opt out with DAFNE_COMPILE_CACHE=0, or point
    DAFNE_COMPILE_CACHE at a custom directory.  Returns the cache dir
    ("" when disabled).
    """
    env = os.environ.get("DAFNE_COMPILE_CACHE", "").strip()
    if env == "0":
        return ""
    cache_dir = env or os.path.expanduser("~/.cache/dafne_tpu/jax")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # cache is best-effort; never block the tool
        import sys

        print(
            f"[dafne_tpu] persistent compile cache disabled ({cache_dir}: "
            f"{e}); first compiles will not be cached",
            file=sys.stderr,
        )
        return ""
    return cache_dir
