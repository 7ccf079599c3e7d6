"""Device mesh + sharding rules for multi-chip training.

The reference's distribution story was host-side asynchronous data
parallelism over Platoon (shared-memory parameter server + zmq control,
``blocks-extras/blocks_extras/extensions/synchronization.py:42-195``) —
single-host multi-GPU, not wired into the shipped driver.  The TPU-native
replacement is synchronous SPMD over a ``jax.sharding.Mesh``:

* ``data`` axis: batch dimension sharded across chips; XLA's partitioner
  inserts the gradient all-reduce (psum over ICI) automatically when the
  jitted train step consumes a data-sharded batch with replicated (or
  model-sharded) parameters — no parameter server, no zmq;
* ``model`` axis: optional tensor-parallel sharding of the wide
  projection matrices (readout/post-merge kernels, feedback embedding,
  encoder forks) along their output dimension.

Pipeline/sequence/expert parallelism are not used: the reference bounds
attention cost by windowed priors + temporal subsampling instead of
sequence sharding (SURVEY.md §2.7), and the model family has no
pipeline-depth or MoE structure that would warrant PP/EP at this scale.
"""
from __future__ import annotations

import contextvars
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# set while tracing the per-shard body of the shard_map data-parallel
# train step: inside it every array has single-device (local) shape, so
# the Pallas-kernel gates that normally require device_count()==1 can
# fire (each shard runs its own kernel; grads are pmean'd explicitly)
_IN_SHARD_MAP = contextvars.ContextVar("lvsr_in_shard_map",
                                       default=False)


def in_shard_map() -> bool:
    """True while tracing inside the shard_map-dp train step."""
    return _IN_SHARD_MAP.get()


def pallas_train_kernels_allowed() -> bool:
    """Whether the differentiable Pallas training kernels may compile:
    they have no SPMD partitioning rule, so they need single-device
    SHAPES — one real device, or the local view inside the
    shard_map-dp train step."""
    return (jax.default_backend() == "tpu"
            and (jax.device_count() == 1 or in_shard_map()))


def get_shard_map():
    """The shard_map entry point across JAX versions."""
    try:
        from jax import shard_map
    except ImportError:                            # pragma: no cover
        from jax.experimental.shard_map import shard_map
    return shard_map


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1,
              devices=None) -> Mesh:
    """Mesh with ('data', 'model') axes over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel="
                         f"{model_parallel}")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, ("data", "model"))


# -- parameter sharding rules ----------------------------------------------

_TP_OUTPUT_SHARDED = (
    # wide output projections: shard the output (last) dimension
    "post_merge", "merge_", "fork_", "top_out", "handler", "mlp_",
)


def param_partition_spec(path) -> P:
    """PartitionSpec for one parameter leaf given its flax path."""
    names = [p.key if hasattr(p, "key") else str(p) for p in path]
    leaf = names[-1]
    if leaf == "embedding":
        return P(None, "model")
    if leaf == "kernel" and len(names) >= 2 and any(
            tag in names[-2] for tag in _TP_OUTPUT_SHARDED):
        return P(None, "model")
    return P()  # replicated


def shard_params(params, mesh: Mesh):
    """Place a parameter pytree on the mesh per the partition rules."""
    def place(path, leaf):
        spec = param_partition_spec(path)
        if len(spec) > leaf.ndim:
            spec = P()
        # only shard if the dimension divides evenly
        for axis, name in enumerate(spec):
            if name is not None and \
                    leaf.shape[axis] % mesh.shape[name] != 0:
                spec = P()
                break
        return jax.device_put(leaf, NamedSharding(mesh, spec))
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    return jax.tree_util.tree_unflatten(
        treedef, [place(path, leaf) for path, leaf in flat])


def batch_shardings(mesh: Mesh):
    """Sharding for batch arrays: leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def shard_batch(batch_arrays, mesh: Mesh):
    sharding = batch_shardings(mesh)
    return [jax.device_put(np.asarray(a), sharding) for a in batch_arrays]


def make_parallel_train_step(step_fn, mesh: Mesh, shard_map_dp=False):
    """jit the train step for the mesh.

    Default mode: parameters/opt-state keep whatever shardings they
    carry (params from :func:`shard_params`); batch args are expected
    data-sharded.  XLA's SPMD partitioner derives the collectives
    (gradient psum over 'data', activation collectives over 'model').
    The Pallas training kernels have no SPMD partitioning rule, so this
    mode runs the XLA scan paths.

    ``shard_map_dp=True``: pure data parallelism through
    ``jax.shard_map`` — each shard traces the step on LOCAL shapes
    (replicated params, its batch slice), which keeps every fused
    Pallas training kernel live per chip; ``step_fn`` must have been
    built with ``pmean_axis='data'`` so gradients (and monitors) are
    averaged over the axis before the optimizer update (identical
    replicated updates on every shard).  Requires mesh.shape['model']
    == 1 (tensor parallelism needs the SPMD partitioner).
    """
    if not shard_map_dp:
        return jax.jit(step_fn, donate_argnums=(0, 1))
    if mesh.shape.get("model", 1) != 1:
        raise ValueError(
            "shard_map_dp is pure data parallelism; use the default "
            "SPMD mode for model-parallel meshes")
    # without the in-step gradient pmean each shard would apply its
    # LOCAL gradient and silently diverge — require the marker that
    # make_train_step(pmean_axis='data') attaches
    if getattr(step_fn, "pmean_axis", None) != "data":
        raise ValueError(
            "shard_map_dp needs a step built with make_train_step("
            "..., pmean_axis='data') so gradients are averaged over "
            "the mesh inside the step")
    _shard_map = get_shard_map()

    def local_step(params, opt_state, rng, *batch):
        # per-shard rng so dropout / weight noise differ across shards
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        token = _IN_SHARD_MAP.set(True)
        try:
            return step_fn(params, opt_state, rng, *batch)
        finally:
            _IN_SHARD_MAP.reset(token)

    def wrapped(params, opt_state, rng, *batch):
        return _shard_map(
            local_step, mesh=mesh,
            in_specs=(P(), P(), P()) + (P("data"),) * len(batch),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )(params, opt_state, rng, *batch)

    return jax.jit(wrapped, donate_argnums=(0, 1))
