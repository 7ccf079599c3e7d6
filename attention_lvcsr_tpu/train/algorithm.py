"""GradientDescent: owns params/opt-state and the jitted train step.

Counterpart of ``blocks/algorithms/__init__.py:154`` (GradientDescent):
the reference compiled one Theano function doing fwd+bwd+update; here one
``jax.jit``-compiled step function does the same on device, returning a
dict of monitored scalars so monitoring adds no extra forward passes
(TrainingDataMonitoring piggybacking, blocks monitoring.py:84-143).
"""
from __future__ import annotations

import time
from typing import Any, Callable, Dict, Mapping, Optional

import jax
import numpy as np

from attention_lvcsr_tpu.models.recognizer import (param_path_dict,
                                                   params_from_path_dict)


class PackedMonitors:
    """Monitor scalars packed into ONE device array (converted to a
    dict of host floats in a single transfer by the training loop)."""

    __slots__ = ("names", "values")

    def __init__(self, names, values):
        self.names = names
        self.values = values

    def items(self):
        import numpy as np
        host = np.asarray(self.values)
        return list(zip(self.names, host.tolist()))

    def keys(self):
        return list(self.names)


class GradientDescent:
    def __init__(self, params, optimizer, step_fn: Callable,
                 batch_keys=("inputs", "inputs_mask", "labels",
                             "labels_mask"),
                 rng=None, donate=True):
        """``step_fn(params, opt_state, rng, *batch_arrays) ->
        (params, opt_state, monitors_dict)``."""
        self.params = params
        self.optimizer = optimizer
        self.opt_state = optimizer.init(params)
        self.batch_keys = tuple(batch_keys)
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        # One device program per batch: the rng split AND the packing of
        # every monitor scalar into a single array happen INSIDE the
        # jitted step.  Any eager op or per-scalar host pull between
        # steps costs a full dispatch/transfer round-trip on a tunneled
        # chip (measured: ~30 stray eager ops made the loop 100x slower
        # than the step itself).
        self._monitor_names: list = []

        def wrapped(params, opt_state, rng, *args):
            import jax.numpy as jnp
            rng, step_rng = jax.random.split(rng)
            new_params, new_opt, monitors = step_fn(
                params, opt_state, step_rng, *args)
            names = sorted(monitors)
            self._monitor_names = names
            stacked = jnp.stack([jnp.asarray(monitors[k], jnp.float32)
                                 for k in names])
            return new_params, new_opt, rng, stacked

        self._step = jax.jit(
            wrapped, donate_argnums=(0, 1) if donate else ())
        self.compile_stats: Dict[str, Any] = {}
        self._compiled_shapes = set()

    def process_batch(self, batch: Mapping[str, np.ndarray]) -> Dict:
        args = [batch[k] for k in self.batch_keys]
        # np.shape, NOT np.asarray(...).shape: the latter copies device
        # arrays to the host (a multi-hundred-ms stall per batch on a
        # tunneled chip)
        shapes = tuple(np.shape(a) for a in args)
        if shapes not in self._compiled_shapes:
            t0 = time.time()
            self._compiled_shapes.add(shapes)
            first = True
        else:
            first = False
        self.params, self.opt_state, self.rng, stacked = self._step(
            self.params, self.opt_state, self.rng, *args)
        if first:
            self.compile_stats.setdefault("compile_time_s", 0.0)
            # a real D2H pull, NOT block_until_ready: the latter can
            # return early on proxied backends, leaving the compile
            # in-flight and degrading every subsequent dispatch
            np.asarray(stacked)
            self.compile_stats["compile_time_s"] += time.time() - t0
            self.compile_stats["num_compiled_shapes"] = \
                len(self._compiled_shapes)
        return PackedMonitors(tuple(self._monitor_names), stacked)

    # -- parameter IO ------------------------------------------------------
    def parameter_dict(self) -> Dict[str, np.ndarray]:
        return param_path_dict(self.params)

    def set_parameters(self, path_dict: Mapping[str, np.ndarray]):
        self.params = params_from_path_dict(path_dict)
        self.opt_state = self.optimizer.init(self.params)

    def set_opt_state(self, opt_state):
        self.opt_state = opt_state
