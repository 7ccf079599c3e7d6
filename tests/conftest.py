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

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
