"""Speech encoder: stacked (bi)directional RNNs with temporal subsampling.

Re-design of the reference encoder (``lvsr/bricks/__init__.py:21-83``:
``RecurrentWithFork`` + ``Encoder`` with ``input_[::take_each]`` between
layers).  TPU-first details:

* Layout is batch-major ``(B, T, F)`` at the API boundary; the scan runs
  time-major internally.
* The per-layer input fork is one big batched matmul over the whole
  sequence (runs on the MXU, outside the sequential scan).
* The backward direction flips inputs and mask along time; padded frames
  (mask 0) leave the state untouched, so flipping the zero-padded tail to
  the front is equivalent to the reference's ``go_backwards`` scan.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from attention_lvcsr_tpu.models.cells import make_cell


class RecurrentWithFork(nn.Module):
    """Fork the input into the cell's sequence projections, then scan."""
    transition: str
    dim: int

    def setup(self):
        self.cell = make_cell(self.transition, self.dim, name="cell")
        self.fork = {
            name: nn.Dense(d, name=f"fork_{name}")
            for name, d in self.cell.sequence_dims().items()
        }

    def __call__(self, x, mask=None, pallas=None):
        # x: (B, T, F) -> (B, T, dim)
        seqs = {name: proj(x).transpose(1, 0, 2)
                for name, proj in self.fork.items()}
        tmask = mask.transpose(1, 0) if mask is not None else None
        out = self.cell.scan(seqs, mask=tmask, pallas=pallas)
        main_state = self.cell.state_names[0]
        return out[main_state].transpose(1, 0, 2)


class Bidirectional(nn.Module):
    """Forward + time-flipped backward pass, concatenated features."""
    transition: str
    dim: int

    def setup(self):
        self.forward = RecurrentWithFork(self.transition, self.dim,
                                         name="forward")
        self.backward = RecurrentWithFork(self.transition, self.dim,
                                          name="backward")

    def __call__(self, x, mask=None, pallas=None):
        from attention_lvcsr_tpu.models.cells import GatedRecurrent
        if pallas in ("train", "train_interpret") and isinstance(
                self.forward.cell, GatedRecurrent):
            # training only: the fused kernel streams gate/candidate
            # residuals for the backward pass; inference uses the
            # forward-only per-direction scan (no residual HBM traffic
            # on the bandwidth-bound decode/serving path)
            # BOTH directions in one fused kernel pair: each direction's
            # recurrence is a latency chain of two small dependent
            # matmuls, and interleaving the two independent chains
            # overlaps their latencies (~1.9x over separate kernels)
            from attention_lvcsr_tpu.ops.pallas.gru_train import \
                gru_scan_train_bidir
            B = x.shape[0]
            x_rev = jnp.flip(x, axis=1)
            mask_rev = (jnp.flip(mask, axis=1)
                        if mask is not None else None)
            sf = {n: p(x).transpose(1, 0, 2)
                  for n, p in self.forward.fork.items()}
            sb = {n: p(x_rev).transpose(1, 0, 2)
                  for n, p in self.backward.fork.items()}
            mf = mask.transpose(1, 0) if mask is not None else None
            mb = (mask_rev.transpose(1, 0)
                  if mask_rev is not None else None)
            fwd_s, bwd_s = gru_scan_train_bidir(
                sf["inputs"], sf["gate_inputs"], mf,
                sb["inputs"], sb["gate_inputs"], mb,
                self.forward.cell.initial_states(B)["states"],
                self.backward.cell.initial_states(B)["states"],
                self.forward.cell.state_to_state,
                self.forward.cell.state_to_gates,
                self.backward.cell.state_to_state,
                self.backward.cell.state_to_gates,
                interpret=pallas.endswith("interpret"))
            fwd = fwd_s.transpose(1, 0, 2)
            bwd = jnp.flip(bwd_s.transpose(1, 0, 2), axis=1)
            return jnp.concatenate([fwd, bwd], axis=-1)
        fwd = self.forward(x, mask, pallas=pallas)
        x_rev = jnp.flip(x, axis=1)
        mask_rev = jnp.flip(mask, axis=1) if mask is not None else None
        bwd = jnp.flip(self.backward(x_rev, mask_rev, pallas=pallas),
                       axis=1)
        return jnp.concatenate([fwd, bwd], axis=-1)


class Encoder(nn.Module):
    """Stack of (bi)directional recurrent layers with subsampling.

    Parameters mirror the reference ``Encoder``: ``dims`` per layer,
    ``subsample`` strides applied to the layer output (and mask), ``bidir``.
    """
    transition: str
    dims: Sequence[int]
    subsample: Sequence[int]
    bidir: bool = True

    def setup(self):
        layers = []
        for i, dim in enumerate(self.dims):
            if self.bidir:
                layers.append(Bidirectional(self.transition, dim,
                                            name=f"bidir{i}"))
            else:
                layers.append(RecurrentWithFork(self.transition, dim,
                                                name=f"with_fork{i}"))
        self.layers = layers

    @property
    def dim_encoded(self):
        return (2 if self.bidir else 1) * self.dims[-1]

    def __call__(self, x, mask=None, pallas=None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # x: (B, T, F); mask: (B, T); pallas: fused-scan mode for
        # inference paths (forward-only kernel, ops/pallas/gru_scan.py)
        for layer, take_each in zip(self.layers, self.subsample):
            x = layer(x, mask, pallas=pallas)
            x = x[:, ::take_each]
            if mask is not None:
                mask = mask[:, ::take_each]
        if mask is None:
            mask = jnp.ones(x.shape[:2], dtype=x.dtype)
        return x, mask
