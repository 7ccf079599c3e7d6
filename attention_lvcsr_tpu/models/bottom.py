"""Input "bottoms": map raw sources to the encoder input sequence.

Counterparts of the reference bottoms (``lvsr/bricks/recognizer.py:33-156``):
``SpeechBottom`` (identity or MLP over feature frames) and ``LookupBottom``
(discrete inputs, used by character-level autoencoder debugging configs).
Layout is batch-major ``(B, T, ...)``.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class SpeechBottom(nn.Module):
    """Identity or MLP over speech feature frames (recordings source)."""
    dims: Optional[Sequence[int]] = None
    activation: str = "tanh"
    num_features: int = 0

    vector_input_sources = ("recordings",)
    discrete_input_sources = ()
    input_source = "recordings"

    @property
    def output_dim(self):
        return self.dims[-1] if self.dims else self.num_features

    def _act(self, x):
        if self.activation in ("tanh", None):
            return jnp.tanh(x)
        if self.activation in ("relu", "rectifier"):
            return jax.nn.relu(x)
        raise ValueError(self.activation)

    @nn.compact
    def __call__(self, recordings):
        x = recordings
        if self.dims:
            for i, d in enumerate(self.dims):
                x = self._act(nn.Dense(d, name=f"mlp_{i}")(x))
        return x


class LookupBottom(nn.Module):
    """Embedding over discrete input tokens (inputs source)."""
    dim: int
    num_chars: int = 0

    vector_input_sources = ()
    discrete_input_sources = ("inputs",)
    input_source = "inputs"

    @property
    def output_dim(self):
        return self.dim

    @nn.compact
    def __call__(self, inputs):
        return nn.Embed(self.num_chars, self.dim, name="lookup")(inputs)


BOTTOM_REGISTRY = {
    "speech": SpeechBottom,
    "lookup": LookupBottom,
    # Reference YAML tag compatibility.
    "SpeechBottom": SpeechBottom,
    "LookupBottom": LookupBottom,
}


def make_bottom(spec: dict, input_dims: dict, input_num_chars: dict,
                name="bottom"):
    spec = dict(spec)
    kind = spec.pop("bottom_class", "speech")
    if isinstance(kind, str):
        kind = kind.rsplit(".", 1)[-1]
    cls = BOTTOM_REGISTRY[kind]
    if cls is SpeechBottom:
        src = SpeechBottom.input_source
        return SpeechBottom(num_features=input_dims[src], name=name, **spec)
    src = LookupBottom.input_source
    return LookupBottom(num_chars=input_num_chars[src], name=name, **spec)
