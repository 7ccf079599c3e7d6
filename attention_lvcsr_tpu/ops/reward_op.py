"""Reward/gain matrices for task-loss training: on-device DP + callback.

The reference computes these inside the graph with a Theano Op whose
gradient is disconnected (``lvsr/ops.py:236-294``).  Two implementations:

* :func:`reward_and_gain_device` — a fully vectorized JAX DP
  (``lax.scan`` over groundtruth rows; the in-row deletion chain becomes
  a prefix-min via ``lax.cummin``), so the training step never leaves the
  device;
* :func:`reward_and_gain_callback` — the numpy/C++ DP through
  ``jax.pure_callback`` (reference-identical host path).

Both are gradient-free by construction (integer regression targets,
wrapped in ``stop_gradient``).  The default :func:`reward_and_gain` uses
the device DP.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from attention_lvcsr_tpu.ops.error_rate import batch_reward_and_gain

# plain numpy scalar, NOT jnp: a module-level jax Array closed over by a
# traced function becomes a hoisted constant argument, and jax 0.9.0's
# repeat-dispatch fast path drops const-args ("Execution supplied N
# buffers but compiled program expected N+1") on every call after the
# first.  numpy scalars embed as literals and dodge the whole class.
BIG = np.int32(1 << 20)


def reward_and_gain_callback(groundtruth, recognized, alphabet_size,
                             eos_label=None):
    """Host-callback path ((T,B) -> (T,B,A) int32 rewards/gains)."""
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


def _single_reward_gain(y, y_hat, n, m, alphabet_size, eos_label):
    """Rewards/gains for ONE pair of EOS-truncated sequences.

    ``y`` (T_g,), ``y_hat`` (T_r,) padded int32; ``n``/``m`` true lengths
    (positions >= n / >= m are ignored).  Returns (T_r, A) rewards and
    gains with the reference's -1/-1000 padding past ``m``.
    """
    T_g = y.shape[0]
    T_r = y_hat.shape[0]
    A = alphabet_size
    j = jnp.arange(T_r + 1)

    # --- Levenshtein rows via scan over y, cummin for deletions ---------
    row0 = j
    valid_j = j[1:] <= m  # DP columns beyond m are unused later

    def step(prev_row, yi):
        i, y_char = yi
        mismatch = (y_hat != y_char).astype(jnp.int32)
        diag = prev_row[:-1] + mismatch
        ins = prev_row[1:] + 1
        base = jnp.minimum(diag, ins)
        # deletion chain: row[j] = min_k<=j (seed/base[k] + (j - k))
        c = jnp.concatenate([(i + 1)[None], base - j[1:]])
        run = jax.lax.cummin(c)[1:]
        row = jnp.minimum(base, run + j[1:])
        row = jnp.concatenate([(i + 1)[None], row])
        # rows past the true groundtruth length keep the previous row
        row = jnp.where(i < n, row, prev_row)
        return row, row

    _, rows = jax.lax.scan(
        step, row0, (jnp.arange(T_g), y))
    dist = jnp.concatenate([row0[None], rows], axis=0)  # (T_g+1, T_r+1)

    # mask rows beyond n (they duplicate row n; keep them out of mins)
    i_idx = jnp.arange(T_g + 1)[:, None]
    dist_masked = jnp.where(i_idx <= n, dist, BIG)

    # --- reward matrix (error_rate.reward_matrix semantics) ------------
    optim = dist_masked.min(axis=0)                       # (T_r+1,)
    char_dist = jnp.full((T_r + 1, A), 0) + optim[:, None] + 1
    # scatter-min dist rows into their character columns:
    # cd[j, c] = min(optim[j]+1, min_{i<n, y[i]==c} dist[i, j])
    onehot = jax.nn.one_hot(y, A, dtype=jnp.int32)        # (T_g, A)
    active = (jnp.arange(T_g) < n)[:, None]
    sel = jnp.where(onehot * active > 0, 0, 1)            # 0 where y[i]==c
    per_char = (dist_masked[:-1, :, None] + sel[:, None, :] * BIG
                ).min(axis=0)                             # (T_r+1, A)
    char_dist = jnp.minimum(char_dist, per_char)
    reward = -char_dist
    # EOS column: -dist[n-1, j]
    last_row = jnp.take(dist, jnp.maximum(n - 1, 0), axis=0)
    reward = reward.at[:, eos_label].set(-last_row)

    # --- gains ----------------------------------------------------------
    taken = jnp.take_along_axis(reward[:-1], y_hat[:, None],
                                axis=1)[:, 0]             # (T_r,)
    gain = reward.at[1:].add(-taken[:, None])

    # --- truncate-last-row + padding (RewardOp semantics) ---------------
    pos = jnp.arange(T_r)[:, None]
    rewards_out = jnp.where(pos < m, reward[:-1], -1)
    gains_out = jnp.where(pos < m, gain[:-1], -1000)
    return rewards_out, gains_out


@functools.partial(jax.jit, static_argnames=("alphabet_size", "eos_label"))
def reward_and_gain_device(groundtruth, recognized, alphabet_size,
                           eos_label):
    """Fully on-device batched rewards/gains ((T,B) -> (T,B,A) int32)."""
    gt = groundtruth.astype(jnp.int32).T     # (B, T_g)
    rec = recognized.astype(jnp.int32).T     # (B, T_r)

    def length_to_eos(seq):
        # index of first EOS + 1, or full length if absent
        is_eos = seq == eos_label
        any_eos = is_eos.any(axis=1)
        first = jnp.argmax(is_eos, axis=1)
        return jnp.where(any_eos, first + 1, seq.shape[1])

    n = length_to_eos(gt)
    m = length_to_eos(rec)
    fn = functools.partial(_single_reward_gain,
                           alphabet_size=alphabet_size,
                           eos_label=eos_label)
    rewards, gains = jax.vmap(fn)(gt, rec, n, m)          # (B, T_r, A)
    rewards = jnp.transpose(rewards, (1, 0, 2))
    gains = jnp.transpose(gains, (1, 0, 2))
    return (jax.lax.stop_gradient(rewards), jax.lax.stop_gradient(gains))


def reward_and_gain(groundtruth, recognized, alphabet_size, eos_label=None):
    """Batched rewards & gains, ``(T, B) -> (T, B, alphabet_size)`` each.

    ``eos_label`` defaults to ``alphabet_size - 1``; the recognizer passes
    its configured label explicitly.
    """
    if eos_label is None:
        eos_label = alphabet_size - 1
    return reward_and_gain_device(groundtruth, recognized,
                                  int(alphabet_size), int(eos_label))
