"""Test configuration: force a virtual 8-device CPU mesh before JAX loads.

Multi-chip sharding tests run on the host platform with
``--xla_force_host_platform_device_count=8`` (see SURVEY.md §4: the reference
has no multi-node tests; we add them on a virtual mesh).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
