"""Test configuration: force a virtual 8-device CPU mesh before backends init.

The ambient environment pins JAX to the real TPU tunnel (axon) via a
sitecustomize hook that runs before conftest, so the env var alone is not
enough — we also flip ``jax_platforms`` through the config API (backends
initialize lazily, so this wins as long as it happens before first use).
Multi-chip sharding tests then run on the host platform with
``--xla_force_host_platform_device_count=8`` (SURVEY.md §4: the reference
has no multi-node tests; we add them on a virtual mesh).
"""
import os

# LVSR_TEST_PLATFORM=tpu keeps the ambient (real-chip) platform so the
# on-chip kernel gate (test_tpu_gate.py, ``-m tpu``) can Mosaic-compile
# for real; everything else runs on the virtual CPU mesh.
_ON_CHIP = os.environ.get("LVSR_TEST_PLATFORM") == "tpu"

if not _ON_CHIP:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not _ON_CHIP:
    jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache (the Theano compiledir role): the quick
# gate is compile-bound on a 1-CPU box, and most tests recompile the same
# tiny programs every run.  Opt out with LVSR_TEST_NO_CACHE=1.
if not os.environ.get("LVSR_TEST_NO_CACHE"):
    _cache = os.path.join(os.path.dirname(__file__), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache)
    # cache EVERY compile: the gate is thousands of sub-second CPU
    # compiles (interpret-mode kernels especially), and a disk load is
    # ~5x cheaper than even a 50 ms compile on this box
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update(
        "jax_persistent_cache_min_entry_size_bytes", -1)
