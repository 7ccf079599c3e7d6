"""Recurrent cells with trainable initial states, built for `lax.scan`.

TPU-first re-design of the reference recurrent bricks
(``blocks/bricks/recurrent.py``: SimpleRecurrent:259, LSTM:335,
GatedRecurrent:486).  Two deliberate departures from the Theano design:

* Input ("fork") projections are **not** part of the per-step cell.  Callers
  precompute them for the whole sequence with one large batched matmul
  (MXU-friendly), so the sequential scan only carries the hidden-to-hidden
  matmuls.
* Cells expose a functional ``one_step`` plus a ``scan`` driver; the same
  step function serves training (teacher-forced scan), generation, and the
  beam-search decode loop, which keeps one-step-vs-scan equivalence testable
  (the reference's canonical RNN test pattern,
  ``blocks/tests/bricks/test_recurrent.py``).

The update equations match the reference bricks exactly (checked by
``tests/test_cells.py``), e.g. GRU: ``h' = z*tanh((r*h)Wss + x) + (1-z)*h``
with gates ``[z, r] = sigmoid(h Wsg + xg)``.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def _orthogonal_init(key, shape, dtype=jnp.float32):
    return nn.initializers.orthogonal()(key, shape, dtype)


def _apply_mask(mask, new, old):
    if mask is None:
        return new
    m = mask[..., None]
    return m * new + (1.0 - m) * old


class RecurrentCell(nn.Module):
    """Interface: `sequences` names, per-sequence dims, states as dicts."""

    # subclass attributes: dim; sequence_names; state_names

    def sequence_dims(self):
        raise NotImplementedError

    def initial_states(self, batch_size):
        raise NotImplementedError

    def one_step(self, states, seqs, mask=None):
        raise NotImplementedError

    def scan(self, seqs, mask=None, initial_states=None, pallas=None):
        """Run the cell over time.

        Parameters
        ----------
        seqs : dict name -> (T, B, d) precomputed input projections
        mask : (T, B) or None
        initial_states : dict name -> (B, dim), defaults to trainable init.

        Returns
        -------
        dict name -> (T, B, dim) state sequences (not including the initial
        state), plus key ``'final'`` mapping to the final state dict.
        ``pallas`` ('compile'/'interpret'/None): use the fused one-kernel
        scan where the cell supports it (forward-only; inference paths).
        """
        del pallas  # base implementation: XLA scan
        names = self.sequence_names
        xs = tuple(seqs[n] for n in names)
        batch_size = xs[0].shape[1]
        if initial_states is None:
            initial_states = self.initial_states(batch_size)

        def step(carry, inp):
            if mask is not None:
                *vals, m = inp
            else:
                vals, m = inp, None
            new = self.one_step(carry, dict(zip(names, vals)), mask=m)
            return new, new

        inputs = xs + ((mask,) if mask is not None else ())
        final, out = jax.lax.scan(step, initial_states, inputs)
        out = dict(out)
        out["final"] = final
        return out


class SimpleRecurrent(RecurrentCell):
    """Elman RNN: ``h' = tanh(h W + x)`` (blocks SimpleRecurrent:259)."""
    dim: int
    sequence_names = ("inputs",)
    state_names = ("states",)

    def setup(self):
        self.W = self.param("W", _orthogonal_init, (self.dim, self.dim))
        self.initial_state = self.param(
            "initial_state", nn.initializers.zeros, (self.dim,))

    def sequence_dims(self):
        return {"inputs": self.dim}

    def initial_states(self, batch_size):
        return {"states": jnp.broadcast_to(self.initial_state,
                                           (batch_size, self.dim))}

    def one_step(self, states, seqs, mask=None):
        h = states["states"]
        new_h = jnp.tanh(h @ self.W + seqs["inputs"])
        return {"states": _apply_mask(mask, new_h, h)}


class GatedRecurrent(RecurrentCell):
    """GRU with blocks' gate layout (update, reset) and update rule."""
    dim: int
    sequence_names = ("inputs", "gate_inputs")
    state_names = ("states",)

    def setup(self):
        self.state_to_state = self.param(
            "state_to_state", _orthogonal_init, (self.dim, self.dim))
        self.state_to_gates = self.param(
            "state_to_gates", _orthogonal_init, (self.dim, 2 * self.dim))
        self.initial_state = self.param(
            "initial_state", nn.initializers.zeros, (self.dim,))

    def sequence_dims(self):
        return {"inputs": self.dim, "gate_inputs": 2 * self.dim}

    def initial_states(self, batch_size):
        return {"states": jnp.broadcast_to(self.initial_state,
                                           (batch_size, self.dim))}

    def one_step(self, states, seqs, mask=None):
        h = states["states"]
        gates = jax.nn.sigmoid(h @ self.state_to_gates + seqs["gate_inputs"])
        update = gates[..., :self.dim]
        reset = gates[..., self.dim:]
        candidate = jnp.tanh((h * reset) @ self.state_to_state + seqs["inputs"])
        new_h = update * candidate + (1.0 - update) * h
        return {"states": _apply_mask(mask, new_h, h)}

    def scan(self, seqs, mask=None, initial_states=None, pallas=None):
        if pallas in ("compile", "interpret", "train",
                      "train_interpret"):
            batch = seqs["inputs"].shape[1]
            if initial_states is None:
                initial_states = self.initial_states(batch)
            if pallas in ("train", "train_interpret"):
                # differentiable fused scan (custom VJP)
                from attention_lvcsr_tpu.ops.pallas.gru_train import \
                    gru_scan_train as scan_fn
            else:
                from attention_lvcsr_tpu.ops.pallas.gru_scan import \
                    gru_scan as scan_fn
            states = scan_fn(seqs["inputs"], seqs["gate_inputs"], mask,
                             initial_states["states"],
                             self.state_to_state, self.state_to_gates,
                             interpret=pallas.endswith("interpret"))
            return {"states": states, "final": {"states": states[-1]}}
        return super().scan(seqs, mask=mask, initial_states=initial_states)


class LSTM(RecurrentCell):
    """LSTM with peepholes, blocks' gate order [in, forget, cell, out]."""
    dim: int
    sequence_names = ("inputs",)
    state_names = ("states", "cells")

    def setup(self):
        self.W_state = self.param(
            "W_state", _orthogonal_init, (self.dim, 4 * self.dim))
        self.W_cell_to_in = self.param(
            "W_cell_to_in", nn.initializers.zeros, (self.dim,))
        self.W_cell_to_forget = self.param(
            "W_cell_to_forget", nn.initializers.zeros, (self.dim,))
        self.W_cell_to_out = self.param(
            "W_cell_to_out", nn.initializers.zeros, (self.dim,))
        self.initial_state = self.param(
            "initial_state", nn.initializers.zeros, (self.dim,))
        self.initial_cells = self.param(
            "initial_cells", nn.initializers.zeros, (self.dim,))

    def sequence_dims(self):
        return {"inputs": 4 * self.dim}

    def initial_states(self, batch_size):
        return {
            "states": jnp.broadcast_to(self.initial_state,
                                       (batch_size, self.dim)),
            "cells": jnp.broadcast_to(self.initial_cells,
                                      (batch_size, self.dim)),
        }

    def one_step(self, states, seqs, mask=None):
        h, c = states["states"], states["cells"]
        acts = h @ self.W_state + seqs["inputs"]
        d = self.dim

        in_gate = jax.nn.sigmoid(acts[..., 0:d] + c * self.W_cell_to_in)
        forget_gate = jax.nn.sigmoid(acts[..., d:2 * d]
                                     + c * self.W_cell_to_forget)
        new_c = forget_gate * c + in_gate * jnp.tanh(acts[..., 2 * d:3 * d])
        out_gate = jax.nn.sigmoid(acts[..., 3 * d:4 * d]
                                  + new_c * self.W_cell_to_out)
        new_h = out_gate * jnp.tanh(new_c)
        return {"states": _apply_mask(mask, new_h, h),
                "cells": _apply_mask(mask, new_c, c)}

    def scan(self, seqs, mask=None, initial_states=None, pallas=None):
        if pallas in ("compile", "interpret", "train",
                      "train_interpret"):
            batch = seqs["inputs"].shape[1]
            if initial_states is None:
                initial_states = self.initial_states(batch)
            if pallas in ("train", "train_interpret"):
                # differentiable fused scan (custom VJP, streams gate
                # residuals for the backward pass)
                from attention_lvcsr_tpu.ops.pallas.lstm_train import \
                    lstm_scan_train as scan_fn
            else:
                # inference: forward-only kernel, no residual HBM traffic
                from attention_lvcsr_tpu.ops.pallas.lstm_train import \
                    lstm_scan as scan_fn
            states, cells = scan_fn(
                seqs["inputs"], mask, initial_states["states"],
                initial_states["cells"], self.W_state,
                self.W_cell_to_in, self.W_cell_to_forget,
                self.W_cell_to_out,
                interpret=pallas.endswith("interpret"))
            return {"states": states, "cells": cells,
                    "final": {"states": states[-1], "cells": cells[-1]}}
        return super().scan(seqs, mask=mask, initial_states=initial_states)


CELL_REGISTRY = {
    "simple": SimpleRecurrent,
    "gru": GatedRecurrent,
    "lstm": LSTM,
    # Reference YAML tag compatibility (blocks class names).
    "SimpleRecurrent": SimpleRecurrent,
    "GatedRecurrent": GatedRecurrent,
    "LSTM": LSTM,
}


def make_cell(kind, dim, name=None) -> RecurrentCell:
    if isinstance(kind, str):
        key = kind.rsplit(".", 1)[-1]
        return CELL_REGISTRY[key](dim=dim, name=name)
    raise ValueError(f"unknown cell spec {kind!r}")
