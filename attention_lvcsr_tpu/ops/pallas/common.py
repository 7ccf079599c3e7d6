"""Shared helpers for the Pallas scan kernels."""
from __future__ import annotations

import jax
import jax.numpy as jnp

try:
    from jax.experimental.pallas import tpu as pltpu
    HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    HAS_PLTPU = False


def dot(a, b, contract=(1, 0)):
    """f32-accumulating dot_general contracting a[contract[0]] with
    b[contract[1]]."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((contract[0],), (contract[1],)),
                                 ((), ())),
        preferred_element_type=jnp.float32)


def mxu_dtype(dtype):
    """MXU operand dtype for in-kernel dots: bf16 activations keep bf16
    operands (single-pass MXU issue on a latency-critical recurrence;
    f32 operands cost ~3 passes); anything else computes in f32.
    Accumulation is always f32 (``preferred_element_type`` in
    :func:`dot`)."""
    return jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32


def pad_time(arr, t_pad):
    """Zero-pad the leading (time) dimension up to ``t_pad``."""
    T = arr.shape[0]
    if T == t_pad:
        return arr
    pad = jnp.zeros((t_pad - T,) + arr.shape[1:], arr.dtype)
    return jnp.concatenate([arr, pad], axis=0)
