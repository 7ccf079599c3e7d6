"""Content and location-aware (conv + window prior) attention.

TPU-native re-design of the reference attention stack:

* ``SequenceContentAttention`` — Bahdanau content attention
  (``blocks/bricks/attention.py:259-413``).
* ``SequenceContentAndConvAttention`` — hybrid content+convolutional
  attention with a windowed prior (``lvsr/bricks/attention.py:42-237``).

The reference restricts computation to a dynamic ``[begin:end)`` slice of
the attended sequence ("cut"), then pastes results back.  Dynamic slices
force recompilation / block XLA tiling on TPU, so here the window is a
**static-shape mask** over the full length: energies outside the global
window are masked out of the softmax (whose max-stabilizer runs over the
global window only, exactly like the reference's per-cut max), per-batch
``window_around_*`` bounds become a strict-inequality positional mask, and
the convolution input is ``weights * global_window`` (equal, within the
window, to convolving the zero-padded cut).  The outputs match the
reference semantics: weights/energies are zero outside the window.

Layout: batch-major.  ``attended`` is ``(B, L, D)``; states are
``(B, dim)``; weights/energies are ``(B, L)``.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from attention_lvcsr_tpu.ops.expressions import conv1d


def _uniform_filter_init(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype) * 0.1


class BaseAttention(nn.Module):
    """Shared contract: preprocess / take_glimpses / initial_glimpses."""

    def preprocess(self, attended):
        raise NotImplementedError

    def initial_glimpses(self, batch_size, attended) -> Dict[str, Any]:
        raise NotImplementedError

    def take_glimpses(self, attended, preprocessed_attended, attended_mask,
                      glimpses: Mapping[str, Any],
                      states: Mapping[str, Any]) -> Dict[str, Any]:
        raise NotImplementedError

    @property
    def glimpse_names(self) -> Tuple[str, ...]:
        raise NotImplementedError


def _weighted_average(weights, attended, beam=1):
    # (B, L) x (B, L, D) -> (B, D); with beam: (U*K, L) x (U, L, D)
    if beam == 1:
        return jnp.einsum("bl,bld->bd", weights, attended)
    U = attended.shape[0]
    out = jnp.einsum("ukl,uld->ukd",
                     weights.reshape(U, beam, -1), attended)
    return out.reshape(U * beam, -1)


def _expand_mask(mask, beam):
    """(U, L) 0/1 mask -> (U*K, L) view without materializing K copies
    until the consuming op (XLA broadcasts lazily inside fusions)."""
    if mask is None or beam == 1:
        return mask
    U, L = mask.shape
    return jnp.broadcast_to(mask[:, None, :], (U, beam, L)).reshape(
        U * beam, L)


class SequenceContentAttention(BaseAttention):
    """Bahdanau content attention: ``e = v^T tanh(Wa a + sum_s Ws s)``."""
    state_names: Sequence[str]
    attended_dim: int
    match_dim: int
    # consumed by the fused decode/train kernel routing (the content
    # math itself has no Pallas-specific path of its own)
    use_pallas: str = "auto"

    glimpse_names = ("weighted_averages", "weights")

    def setup(self):
        self.state_trans = {
            name: nn.Dense(self.match_dim, use_bias=False,
                           name=f"state_trans_{name}")
            for name in self.state_names
        }
        self.preprocessor = nn.Dense(self.match_dim, name="preprocess")
        self.energy = nn.Dense(1, use_bias=False, name="energy_comp")

    def preprocess(self, attended):
        return self.preprocessor(attended)

    def initial_glimpses(self, batch_size, attended):
        length = attended.shape[1]
        dtype = attended.dtype
        return {
            "weighted_averages": jnp.zeros((batch_size, self.attended_dim),
                                           dtype),
            "weights": jnp.zeros((batch_size, length), dtype),
        }

    def compute_energies(self, preprocessed_attended, states, beam=1):
        """``beam > 1``: per-hypothesis states (U*beam, d) attend over a
        shared per-utterance ``preprocessed_attended`` (U, L, M) — the
        attended tensors are read once per utterance instead of once per
        hypothesis (the decode hot path is HBM-bound)."""
        state_sum = 0.0
        for name in self.state_names:
            state_sum = state_sum + self.state_trans[name](states[name])
        if beam == 1:
            match = preprocessed_attended + state_sum[:, None, :]
            return self.energy(jnp.tanh(match))[..., 0]  # (B, L)
        U = preprocessed_attended.shape[0]
        match = (preprocessed_attended[:, None, :, :] +
                 state_sum.reshape(U, beam, 1, -1))
        return self.energy(jnp.tanh(match))[..., 0].reshape(
            U * beam, -1)

    def take_glimpses(self, attended, preprocessed_attended, attended_mask,
                      glimpses, states, beam=1):
        if preprocessed_attended is None:
            preprocessed_attended = self.preprocess(attended)
        energies = self.compute_energies(preprocessed_attended, states,
                                         beam=beam)
        mask = _expand_mask(attended_mask, beam)
        # Softmax with the reference's all-masked guard
        # (blocks/bricks/attention.py:229-235).
        m = jnp.max(energies, axis=1, keepdims=True)
        unnorm = jnp.exp(energies - m)
        if mask is not None:
            unnorm = unnorm * mask
            denom = unnorm.sum(axis=1, keepdims=True) + jnp.all(
                mask == 0, axis=1, keepdims=True)
        else:
            denom = unnorm.sum(axis=1, keepdims=True)
        weights = unnorm / denom
        return {
            "weighted_averages": _weighted_average(weights, attended,
                                                   beam=beam),
            "weights": weights,
        }


class SequenceContentAndConvAttention(BaseAttention):
    """Hybrid content + convolutional attention with a windowed prior.

    ``prior`` (config dict, ``lvsr/bricks/attention.py:75-78,120-168``):

    * ``{"type": "expanding", "initial_begin", "initial_end", "min_speed",
      "max_speed"}`` — the window ``[b0 + t*vmin, e0 + t*vmax)`` expands
      linearly with the decoding step ``t``.
    * ``{"type": "window_around_mean"|"window_around_median", "before",
      "after"}`` — window around the mean/median of the previous alignment.

    ``energy_normalizer``: 'softmax' (default), 'logistic', or 'relu'.
    """
    state_names: Sequence[str]
    attended_dim: int
    match_dim: int
    conv_n: int
    conv_num_filters: int = 1
    prior: Optional[Mapping[str, Any]] = None
    energy_normalizer: str = "softmax"
    # 'auto': Pallas energy kernel on TPU for the beam decode path;
    # 'fused': additionally the one-kernel fused score step
    #          (ops/pallas/decode_score.py);
    # 'interpret': force kernels in interpreter mode (tests);
    # 'never': always the XLA path.
    use_pallas: str = "auto"

    glimpse_names = ("weighted_averages", "weights", "energies", "step")

    def setup(self):
        self.state_trans = {
            name: nn.Dense(self.match_dim, use_bias=False,
                           name=f"state_trans_{name}")
            for name in self.state_names
        }
        self.preprocessor = nn.Dense(self.match_dim, name="preprocess")
        self.energy = nn.Dense(
            1, use_bias=self.energy_normalizer != "softmax",
            name="energy_comp")
        self.filter_handler = nn.Dense(self.match_dim, use_bias=False,
                                       name="handler")
        self.conv_filters = self.param(
            "conv_filters", _uniform_filter_init,
            (self.conv_num_filters, 2 * self.conv_n + 1))

    def _prior(self):
        if self.prior:
            return dict(self.prior)
        return dict(type="expanding", initial_begin=0, initial_end=10000,
                    min_speed=0, max_speed=0)

    def preprocess(self, attended):
        return self.preprocessor(attended)

    def initial_glimpses(self, batch_size, attended):
        length = attended.shape[1]
        dtype = attended.dtype
        onehot = jnp.concatenate(
            [jnp.ones((batch_size, 1), dtype),
             jnp.zeros((batch_size, length - 1), dtype)], axis=1)
        return {
            "weighted_averages": jnp.zeros((batch_size, self.attended_dim),
                                           dtype),
            "weights": onehot,
            "energies": onehot,
            "step": jnp.zeros((batch_size,), dtype=jnp.int32),
        }

    def _window(self, weights, step, length, dtype):
        """Global scalar window + optional per-batch mask for the prior."""
        p = self._prior()
        prior_type = p.get("type", "expanding")
        positions = jnp.arange(length, dtype=dtype)
        if prior_type == "expanding":
            begin = p["initial_begin"] + step[0] * p["min_speed"]
            end = p["initial_end"] + step[0] * p["max_speed"]
            begin = jnp.maximum(0, jnp.minimum(length - 1, begin))
            end = jnp.maximum(0, jnp.minimum(length, end))
            begin = jnp.floor(begin)
            end = jnp.ceil(end)
            global_mask = ((positions >= begin) & (positions < end)
                           ).astype(dtype)[None, :]
            return global_mask, None
        if prior_type.startswith("window_around"):
            if prior_type == "window_around_mean":
                expected_pos = (weights * positions[None, :]).sum(axis=1)
            elif prior_type == "window_around_median":
                above_half = (jnp.cumsum(weights, axis=1) - 0.5 >= 0
                              ).astype(jnp.int32)
                switches = above_half[:, 1:] - above_half[:, :-1]
                expected_pos = jnp.argmax(switches, axis=1).astype(dtype)
                expected_pos = jax.lax.stop_gradient(expected_pos)
            else:
                raise ValueError(f"Unknown prior type: {prior_type}")
            begins = jnp.floor(expected_pos - p["before"])       # (B,)
            ends = jnp.ceil(expected_pos + p["after"])           # (B,)
            begin = jnp.floor(jnp.maximum(0, begins.min()))
            end = jnp.ceil(jnp.minimum(length, ends.max()))
            global_mask = ((positions >= begin) & (positions < end)
                           ).astype(dtype)[None, :]
            additional = ((positions[None, :] > begins[:, None]) &
                          (positions[None, :] < ends[:, None])).astype(dtype)
            return global_mask, additional
        raise ValueError(f"Unknown prior type: {prior_type}")

    def compute_energies(self, preprocessed_attended, windowed_weights,
                         states, beam=1):
        """``beam > 1``: shared (U, L, M) preprocessed attended broadcast
        over per-hypothesis states/weights (see the content attention's
        compute_energies note)."""
        state_sum = 0.0
        for name in self.state_names:
            state_sum = state_sum + self.state_trans[name](states[name])
        # 'same' true-convolution over previous alignment weights
        # (full conv trimmed by conv_n on both sides, lvsr attention.py:108-111).
        conv = conv1d(windowed_weights, self.conv_filters,
                      border_mode="full")[:, :, self.conv_n:-self.conv_n]
        if beam > 1 and self._pallas_mode() is not None \
                and self.conv_num_filters == 1:
            return self._pallas_energies(preprocessed_attended, state_sum,
                                         conv[:, 0, :], beam)
        conv_proj = self.filter_handler(conv.transpose(0, 2, 1))
        if beam == 1:
            match = (preprocessed_attended + state_sum[:, None, :]
                     + conv_proj)
            return self.energy(jnp.tanh(match))[..., 0]  # (B, L)
        U, L = preprocessed_attended.shape[:2]
        match = (preprocessed_attended[:, None, :, :]
                 + state_sum.reshape(U, beam, 1, -1)
                 + conv_proj.reshape(U, beam, L, -1))
        return self.energy(jnp.tanh(match))[..., 0].reshape(U * beam, L)

    def _pallas_mode(self):
        if self.use_pallas == "never":
            return None
        if self.use_pallas == "interpret":
            return "interpret"
        if jax.default_backend() == "tpu":
            return "compile"
        return None

    # make_attention passes use_pallas through from the net config
    # ('net.use_pallas'), so configs can opt into the fused score step.

    def _pallas_energies(self, pre, state_sum, conv_out, beam):
        """Fused VMEM-resident energy kernel (ops/pallas/attention_energy).

        The handler row / energy vector / bias are extracted by running
        the tiny Dense layers on identity inputs (keeps the parameter
        tree identical to the XLA path)."""
        from attention_lvcsr_tpu.ops.pallas.attention_energy import (
            beam_attention_energies)
        dtype = pre.dtype
        M = pre.shape[-1]
        handler_w = self.filter_handler(jnp.ones((1, 1), dtype))[0]
        if self.energy_normalizer != "softmax":
            bias = self.energy(jnp.zeros((1, M), dtype))[0, 0]
        else:
            bias = jnp.zeros((), dtype)
        v = self.energy(jnp.eye(M, dtype=dtype))[:, 0] - bias
        return beam_attention_energies(
            pre, state_sum, conv_out, handler_w, v, bias, beam=beam,
            interpret=self._pallas_mode() == "interpret")

    def _normalize(self, energies, global_mask, combined_mask):
        if self.energy_normalizer == "softmax":
            neg_inf = jnp.finfo(energies.dtype).min
            masked = jnp.where(global_mask > 0, energies, neg_inf)
            m = jnp.max(masked, axis=1, keepdims=True)
            m = jnp.where(jnp.isfinite(m), m, 0.0)
            unnorm = jnp.exp(energies - m)
        elif self.energy_normalizer == "logistic":
            unnorm = jax.nn.sigmoid(energies)
        elif self.energy_normalizer == "relu":
            unnorm = jnp.maximum(energies / 1000.0, 0.0)
        else:
            raise ValueError(
                f"Unknown energy_normalizer: {self.energy_normalizer}")
        unnorm = unnorm * combined_mask
        denom = unnorm.sum(axis=1, keepdims=True) + jnp.all(
            combined_mask == 0, axis=1, keepdims=True)
        return unnorm / denom

    def take_glimpses(self, attended, preprocessed_attended, attended_mask,
                      glimpses, states, beam=1):
        if preprocessed_attended is None:
            preprocessed_attended = self.preprocess(attended)
        weights = glimpses["weights"]
        step = glimpses["step"]
        batch, length = weights.shape
        dtype = attended.dtype

        global_mask, additional = self._window(weights, step, length, dtype)
        combined = global_mask
        mask = _expand_mask(attended_mask, beam)
        if mask is not None:
            combined = combined * mask
        if additional is not None:
            combined = combined * additional

        energies = self.compute_energies(
            preprocessed_attended, weights * global_mask, states, beam=beam)
        new_weights = self._normalize(energies, global_mask, combined)
        return {
            "weighted_averages": _weighted_average(new_weights, attended,
                                                   beam=beam),
            "weights": new_weights,
            "energies": energies * global_mask,
            "step": step + 1,
        }


def make_attention(attention_type: str, state_names, attended_dim, match_dim,
                   conv_n=None, conv_num_filters=1, prior=None,
                   energy_normalizer=None, use_pallas="auto",
                   name=None) -> BaseAttention:
    if attention_type == "content":
        return SequenceContentAttention(
            state_names=tuple(state_names), attended_dim=attended_dim,
            match_dim=match_dim, use_pallas=use_pallas, name=name)
    if attention_type == "content_and_conv":
        return SequenceContentAndConvAttention(
            state_names=tuple(state_names), attended_dim=attended_dim,
            match_dim=match_dim, conv_n=conv_n,
            conv_num_filters=conv_num_filters, prior=prior,
            energy_normalizer=energy_normalizer or "softmax",
            use_pallas=use_pallas, name=name)
    raise ValueError(f"Unknown attention type {attention_type}")
