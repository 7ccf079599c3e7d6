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
        self._step = jax.jit(
            step_fn, donate_argnums=(0, 1) if donate else ())
        self.compile_stats: Dict[str, Any] = {}
        self._compiled_shapes = set()

    def process_batch(self, batch: Mapping[str, np.ndarray]) -> Dict:
        args = [batch[k] for k in self.batch_keys]
        shapes = tuple(np.asarray(a).shape for a in args)
        if shapes not in self._compiled_shapes:
            t0 = time.time()
            self._compiled_shapes.add(shapes)
            first = True
        else:
            first = False
        self.rng, step_rng = jax.random.split(self.rng)
        self.params, self.opt_state, monitors = self._step(
            self.params, self.opt_state, step_rng, *args)
        if first:
            self.compile_stats.setdefault("compile_time_s", 0.0)
            jax.block_until_ready(monitors)
            self.compile_stats["compile_time_s"] += time.time() - t0
            self.compile_stats["num_compiled_shapes"] = \
                len(self._compiled_shapes)
        return monitors

    # -- parameter IO ------------------------------------------------------
    def parameter_dict(self) -> Dict[str, np.ndarray]:
        return param_path_dict(self.params)

    def set_parameters(self, path_dict: Mapping[str, np.ndarray]):
        self.params = params_from_path_dict(path_dict)
        self.opt_state = self.optimizer.init(self.params)

    def set_opt_state(self, opt_state):
        self.opt_state = opt_state
