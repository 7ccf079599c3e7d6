"""Edit-distance, CER/WER and task-loss reward/gain matrices.

Re-implements the reward math of the task-loss estimation paper
(arXiv:1511.06456) with vectorized numpy row-sweeps instead of the
reference's per-cell Python loops (reference semantics:
``/root/reference/lvsr/error_rate.py:11-112``).  The outputs are
golden-value compatible with the reference (checked in
``tests/test_error_rate.py``).

The DP recurrence ``dist[i][j] = min(ins, del, sub/copy)`` has a sequential
dependency along ``j`` (deletions).  We break it with the classic transform

    dist[i][j] = min_k<=j ( base[i][k] + (j - k) )

i.e. a prefix-min over ``base[i][k] - k`` (``numpy.minimum.accumulate``),
where ``base`` collects the insertion/substitution/copy candidates that only
look at row ``i-1``.  This makes each row one vector op, and the same trick
vectorizes the on-device batched version in
:mod:`attention_lvcsr_tpu.ops.reward_op`.
"""
from __future__ import annotations

import numpy as np

# Action codes, same encoding as the reference so golden tests carry over.
COPY = 0
INSERTION = 1
DELETION = 2
SUBSTITUTION = 3

INFINITY = 10 ** 9


def edit_distance_matrix(y, y_hat):
    """Full Levenshtein DP matrix together with the traceback actions.

    Parameters
    ----------
    y, y_hat : sequences (str or list of ints)
        Groundtruth and candidate.

    Returns
    -------
    dist : int64 array (len(y)+1, len(y_hat)+1)
        ``dist[i, j]`` is the edit distance between ``y[:i]`` and
        ``y_hat[:j]``.
    action : int64 array, same shape
        ``action[i, j]`` is the action applied to ``y_hat[j-1]`` in a chain
        of optimal actions transducing ``y_hat[:j]`` into ``y[:i]`` (with the
        reference's tie-breaking order: insertion < deletion < substitution
        < copy, later wins).
    """
    y = list(y)
    y_hat = list(y_hat)
    n, m = len(y), len(y_hat)
    dist = np.zeros((n + 1, m + 1), dtype=np.int64)
    action = np.zeros_like(dist)
    dist[:, 0] = np.arange(n + 1)
    dist[0, :] = np.arange(m + 1)

    if m == 0 or n == 0:
        return dist, action

    # mismatch[i-1, j-1] == 1 iff y[i-1] != y_hat[j-1]
    y_arr = np.empty(n, dtype=object)
    y_arr[:] = y
    y_hat_arr = np.empty(m, dtype=object)
    y_hat_arr[:] = y_hat
    mismatch = (y_arr[:, None] != y_hat_arr[None, :]).astype(np.int64)

    j_idx = np.arange(1, m + 1)
    for i in range(1, n + 1):
        ins = dist[i - 1, 1:] + 1
        diag = dist[i - 1, :-1] + mismatch[i - 1]  # copy (0) or substitution (+1)
        base = np.minimum(ins, diag)
        # Deletion chain: prefix-min over base[k] - k, seeded by dist[i,0] = i.
        c = np.concatenate(([np.int64(i)], base - j_idx))
        run = np.minimum.accumulate(c)[1:]
        row = np.minimum(base, run + j_idx)
        dist[i, 1:] = row

        # Traceback actions, replicating the reference's if-cascade order
        # (insertion check first — inheriting action[i-1][j] — then deletion,
        # substitution, copy; later conditions overwrite earlier ones).
        act = np.empty(m, dtype=np.int64)
        is_ins = row == ins
        is_del = row == dist[i, :-1] + 1
        is_sub = (row == diag) & (mismatch[i - 1] == 1)
        is_copy = (row == diag) & (mismatch[i - 1] == 0)
        act[is_ins] = action[i - 1, 1:][is_ins]
        act[is_del] = DELETION
        act[is_sub] = SUBSTITUTION
        act[is_copy] = COPY
        action[i, 1:] = act

    return dist, action


def edit_distance(y, y_hat):
    """Minimum number of edits (ins/del/sub) transforming ``y_hat`` into ``y``."""
    return int(edit_distance_matrix(y, y_hat)[0][-1, -1])


def wer(y, y_hat):
    """Length-normalized edit distance (CER when units are characters)."""
    return edit_distance(y, y_hat) / float(len(y))


def cer(y, y_hat):
    return wer(y, y_hat)


def reward_matrix(y, y_hat, alphabet, eos_label):
    """Per-(prefix, next-symbol) optimistic-future rewards.

    ``R[j, c]`` = minus the best achievable edit distance of any groundtruth
    prefix given that the candidate so far is ``y_hat[:j]`` followed by
    symbol ``c`` (reference semantics ``lvsr/error_rate.py:79-104``).  The
    groundtruth must end with ``eos_label``; the EOS column holds the final
    distance ``-dist[len(y)-1, j]``.
    """
    dist, _ = edit_distance_matrix(y, y_hat)
    alphabet = list(alphabet)
    y_indices = np.asarray([alphabet.index(c) for c in y])
    if y_indices[-1] != eos_label:
        raise ValueError("Last character of the groundtruth must be EOS")

    optim_dist = dist.min(axis=0)  # (len(y_hat)+1,)
    # Default: one worse than the prefix optimum (a wasted character).
    char_dist = np.tile(optim_dist[:, None] + 1, (1, len(alphabet)))
    # Emitting y[i] when the groundtruth prefix matched up to i keeps us at
    # dist[i, j]: scatter-min dist rows into the columns of their characters.
    # (np.minimum.at handles repeated characters in y.)
    n = len(y_indices)
    cols = np.broadcast_to(y_indices[None, :], (dist.shape[1], n))
    np.minimum.at(
        char_dist,
        (np.repeat(np.arange(dist.shape[1]), n), cols.ravel()),
        dist[:n, :].T.ravel(),
    )
    reward = -char_dist
    reward[:, eos_label] = -dist[len(y) - 1, :]
    return reward


def gain_matrix(y, y_hat, alphabet=None, given_reward_matrix=None,
                eos_label=None):
    """Stepwise gains: ``G[j, c] = R[j, c] - R[j-1, y_hat[j-1]]``."""
    alphabet = list(alphabet)
    y_hat_indices = np.asarray([alphabet.index(c) for c in y_hat], dtype=np.int64)
    reward = (np.array(given_reward_matrix, copy=True)
              if given_reward_matrix is not None
              else reward_matrix(y, y_hat, alphabet, eos_label))
    if len(y_hat_indices):
        taken = reward[np.arange(len(y_hat_indices)), y_hat_indices]
        reward[1:] -= taken[:, None]
    return reward


def batch_reward_and_gain(groundtruth, recognized, alphabet_size, eos_label,
                          min_reward=None):
    """Batched rewards/gains for task-loss training.

    Mirrors the semantics of the reference ``RewardOp.perform``
    (``lvsr/ops.py:244-285``): sequences are truncated at the first EOS
    (inclusive), rewards/gains are computed on the truncated pair, the final
    row is dropped, and rows past the truncated length are filled with ``-1``
    (rewards) / ``-1000`` (gains).

    Parameters
    ----------
    groundtruth, recognized : int arrays (T, B) — time-major like the
        reference, since these come straight from label matrices.

    Returns
    -------
    rewards, gains : int64 arrays (T, B, alphabet_size)
    """
    groundtruth = np.asarray(groundtruth)
    recognized = np.asarray(recognized)
    if groundtruth.ndim != 2 or recognized.ndim != 2 \
            or groundtruth.shape[1] != recognized.shape[1]:
        raise ValueError("expected (T, B) int matrices with equal batch")
    # fast path: native C++ batch DP (ops/native.py); requires every
    # groundtruth column to contain EOS (the python path would raise
    # otherwise, keeping the two paths equivalent).
    if np.isin(eos_label, groundtruth, assume_unique=False) and \
            (groundtruth == eos_label).any(axis=0).all():
        from attention_lvcsr_tpu.ops import native
        result = native.batch_reward_and_gain_native(
            groundtruth, recognized, alphabet_size, eos_label)
        if result is not None:
            rewards, gains = result
            if min_reward is not None:
                gains = np.maximum(gains, min_reward)
            return rewards, gains
    T, B = recognized.shape
    alphabet = list(range(alphabet_size))
    all_rewards = np.zeros((T, B, alphabet_size), dtype=np.int64)
    all_gains = np.zeros((T, B, alphabet_size), dtype=np.int64)
    for b in range(B):
        y = list(groundtruth[:, b])
        y_hat = list(recognized[:, b])
        if eos_label in y:
            y = y[:y.index(eos_label) + 1]
        if eos_label in y_hat:
            y_hat_trunc = y_hat[:y_hat.index(eos_label) + 1]
        else:
            y_hat_trunc = y_hat
        rewards_trunc = reward_matrix(y, y_hat_trunc, alphabet, eos_label)
        gains_trunc = gain_matrix(y, y_hat_trunc, alphabet,
                                  given_reward_matrix=rewards_trunc)
        rewards = np.full((T, alphabet_size), -1, dtype=np.int64)
        gains = np.full((T, alphabet_size), -1000, dtype=np.int64)
        rewards[:rewards_trunc.shape[0] - 1] = rewards_trunc[:-1]
        gains[:gains_trunc.shape[0] - 1] = gains_trunc[:-1]
        all_rewards[:, b] = rewards
        all_gains[:, b] = gains
    if min_reward is not None:
        all_gains = np.maximum(all_gains, min_reward)
    return all_rewards, all_gains
