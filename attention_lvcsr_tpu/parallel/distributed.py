"""Multi-host (multi-process) training utilities.

The reference's distributed layer was Platoon ASGD over zmq + POSIX shared
memory (single host, ``blocks-extras/.../synchronization.py``).  The
TPU-native equivalent for pods is JAX's multi-controller runtime: every
host runs the same program, ``jax.distributed.initialize`` wires the
processes, and the mesh from :mod:`attention_lvcsr_tpu.parallel.mesh`
spans all devices — gradient reduction rides ICI, host-to-host
coordination rides DCN.  No parameter server and no explicit
communication code: the jitted train step is already SPMD.

These helpers cover the host-side glue:

* :func:`initialize` — process wiring from env/args;
* :func:`process_shard` — which slice of the global batch this host
  feeds (data is read per-host, never gathered);
* :func:`local_batch_to_global` — build a globally-sharded array from
  per-host shards (``jax.make_array_from_process_local_data``).
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """Wire up multi-process JAX (no-op for single-process runs).

    Arguments default to the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID), which
    TPU pod runtimes set automatically.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1 and coordinator_address is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=(process_id if process_id is not None
                    else int(os.environ.get("JAX_PROCESS_ID", "0"))))
    return True


def process_shard(num_examples: int) -> slice:
    """The contiguous slice of a dataset this process should stream."""
    n = jax.process_count()
    i = jax.process_index()
    per = -(-num_examples // n)
    return slice(i * per, min((i + 1) * per, num_examples))


def local_batch_to_global(local_arrays: Sequence[np.ndarray], mesh: Mesh):
    """Assemble globally-sharded batch arrays from per-host local shards.

    Each process passes its local slice of the global batch; the returned
    arrays are addressable across the mesh with the batch axis sharded
    over 'data'.
    """
    sharding = NamedSharding(mesh, P("data"))
    out = []
    for arr in local_arrays:
        arr = np.asarray(arr)
        global_shape = (arr.shape[0] * jax.process_count(),) + arr.shape[1:]
        out.append(jax.make_array_from_process_local_data(
            sharding, arr, global_shape))
    return out
