"""Reward/gain matrices as a JAX host callback (gradient-free).

The reference computes these inside the graph with a Theano Op whose
gradient is disconnected (``lvsr/ops.py:236-294``).  Here the numpy DP
(:mod:`attention_lvcsr_tpu.ops.error_rate`) runs through
``jax.pure_callback`` and the result is wrapped in ``stop_gradient`` —
the matrices are integer-valued regression targets, so no gradient flows
through them by construction.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from attention_lvcsr_tpu.ops.error_rate import batch_reward_and_gain


def reward_and_gain(groundtruth, recognized, alphabet_size, eos_label=None):
    """Batched rewards & gains, ``(T, B) -> (T, B, alphabet_size)`` each.

    ``eos_label`` defaults to ``alphabet_size - 1`` (the lvsr convention:
    EOS is the last symbol of the alphabet is *not* universal — the
    recognizer passes its configured ``eos_label`` explicitly).
    """
    if eos_label is None:
        eos_label = alphabet_size - 1
    T, B = recognized.shape

    def host_fn(gt, rec):
        r, g = batch_reward_and_gain(np.asarray(gt), np.asarray(rec),
                                     alphabet_size, int(eos_label))
        return r.astype(np.int32), g.astype(np.int32)

    shape = jax.ShapeDtypeStruct((T, B, alphabet_size), jnp.int32)
    rewards, gains = jax.pure_callback(
        host_fn, (shape, shape), groundtruth, recognized,
        vmap_method="sequential")
    return (jax.lax.stop_gradient(rewards), jax.lax.stop_gradient(gains))
