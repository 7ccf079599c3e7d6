"""Small JAX expressions used by the attention stack and monitoring.

TPU-native counterparts of ``/root/reference/lvsr/expressions.py``:
``conv1d`` lowers to an XLA convolution instead of Theano's conv2d wrapper;
the attention diagnostics (`entropy`, `monotonicity_penalty`, `weights_std`)
keep the reference's time-major ``(T_out, B, L)`` weight layout so monitored
numbers are directly comparable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def conv1d(sequences, filters, border_mode="valid"):
    """Batched 1D *convolution* (filter flipped, like Theano conv2d).

    Parameters
    ----------
    sequences : (batch_size, length)
    filters : (num_filters, filter_length)
    border_mode : 'valid' or 'full'

    Returns
    -------
    (batch_size, num_filters, out_length)
    """
    sequences = jnp.asarray(sequences)
    if not jnp.issubdtype(sequences.dtype, jnp.floating):
        sequences = sequences.astype(jnp.float32)
    filters = jnp.asarray(filters, dtype=sequences.dtype)
    k = filters.shape[-1]
    # XLA convs compute correlation; flip to match convolution semantics.
    kernel = jnp.flip(filters, axis=-1)[:, None, :]          # (F, 1, K): OIW
    x = sequences[:, None, :]                                # (B, 1, L): NCW
    if border_mode == "valid":
        padding = [(0, 0)]
    elif border_mode == "full":
        padding = [(k - 1, k - 1)]
    else:
        raise ValueError(border_mode)
    return lax.conv_general_dilated(
        x, kernel, window_strides=(1,), padding=padding,
        dimension_numbers=("NCH", "OIH", "NCH"))


def weights_std(weights, mask_outputs=None):
    """Std of the attention position distribution, summed over steps.

    ``weights``: (T_out, B, L) time-major attention weights.
    """
    positions = jnp.arange(weights.shape[2], dtype=weights.dtype)
    expected = (weights * positions).sum(axis=2)
    expected2 = (weights * positions ** 2).sum(axis=2)
    result = jnp.sqrt(jnp.maximum(expected2 - expected ** 2, 0.0))
    if mask_outputs is not None:
        result = result * mask_outputs
    return result.sum() / weights.shape[0]


def monotonicity_penalty(weights, mask_x=None):
    """Penalty for attention moving backwards (cumsum increase step-to-step)."""
    cumsums = jnp.cumsum(weights, axis=2)
    penalties = jnp.maximum(cumsums[1:] - cumsums[:-1], 0).sum(axis=2)
    if mask_x is not None:
        penalties = penalties * mask_x[1:]
    return penalties.sum()


def entropy(weights, mask_x):
    """(Negated) entropy of attention weights, summed over steps and batch."""
    entropies = (weights * jnp.log(weights + 1e-7)).sum(axis=2)
    entropies = entropies * mask_x
    return entropies.sum()


def pad_to_a_multiple(tensor_, k, pad_with):
    """Pad the first axis of ``tensor_`` to a multiple of ``k``."""
    length = tensor_.shape[0]
    new_length = -(-length // k) * k
    if new_length == length:
        return tensor_
    pad_widths = [(0, new_length - length)] + [(0, 0)] * (tensor_.ndim - 1)
    return jnp.pad(tensor_, pad_widths, constant_values=pad_with)


def masked_softmax(energies, mask, axis=-1):
    """Softmax over ``axis`` with a 0/1 mask; all-masked rows return zeros.

    Replicates the reference normalization guard
    (``blocks/bricks/attention.py:229-235``): the denominator gets ``+1``
    when the mask is all zeros, keeping the output finite (and zero).
    """
    energies = jnp.asarray(energies)
    # explicit -inf (the isfinite guard below keys on it); finfo.min of
    # a float64 numpy input would also warn on the f32 cast
    masked = jnp.where(mask > 0, energies, -jnp.inf)
    m = jnp.max(masked, axis=axis, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    unnorm = jnp.exp(energies - m) * mask
    denom = unnorm.sum(axis=axis, keepdims=True)
    denom = denom + (mask.sum(axis=axis, keepdims=True) == 0)
    return unnorm / denom


def log_softmax(x, axis=-1):
    return jax.nn.log_softmax(x, axis=axis)
