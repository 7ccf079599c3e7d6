"""Native C++ kernels vs numpy reference parity."""
import numpy as np
import pytest
from numpy.testing import assert_equal

from attention_lvcsr_tpu.ops import native
from attention_lvcsr_tpu.ops.error_rate import edit_distance

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def _numpy_batch_reward_gain(gt, rec, A, eos):
    """Pure-python path (bypasses the native fast path)."""
    import attention_lvcsr_tpu.ops.error_rate as er
    T, B = np.asarray(rec).shape
    gt = np.asarray(gt)
    rec = np.asarray(rec)
    all_rewards = np.zeros((T, B, A), np.int64)
    all_gains = np.zeros((T, B, A), np.int64)
    for b in range(B):
        y = list(gt[:, b])
        y_hat = list(rec[:, b])
        if eos in y:
            y = y[:y.index(eos) + 1]
        if eos in y_hat:
            y_hat = y_hat[:y_hat.index(eos) + 1]
        r = er.reward_matrix(y, y_hat, list(range(A)), eos)
        g = er.gain_matrix(y, y_hat, list(range(A)), given_reward_matrix=r)
        rewards = np.full((T, A), -1, np.int64)
        gains = np.full((T, A), -1000, np.int64)
        rewards[:r.shape[0] - 1] = r[:-1]
        gains[:g.shape[0] - 1] = g[:-1]
        all_rewards[:, b] = rewards
        all_gains[:, b] = gains
    return all_rewards, all_gains


def test_native_reward_gain_parity_random():
    rng = np.random.RandomState(0)
    A, eos = 6, 5
    for trial in range(10):
        T_g, T_r, B = rng.randint(2, 9), rng.randint(2, 9), rng.randint(1, 4)
        gt = rng.randint(0, A - 1, size=(T_g, B)).astype(np.int64)
        # force an EOS somewhere in every groundtruth column
        pos = rng.randint(0, T_g, size=B)
        gt[pos, np.arange(B)] = eos
        rec = rng.randint(0, A, size=(T_r, B)).astype(np.int64)
        r_np, g_np = _numpy_batch_reward_gain(gt, rec, A, eos)
        out = native.batch_reward_and_gain_native(gt, rec, A, eos)
        assert out is not None
        r_cc, g_cc = out
        assert_equal(r_cc, r_np)
        assert_equal(g_cc, g_np)


def test_native_edit_distances():
    rng = np.random.RandomState(1)
    a_seqs = [list(rng.randint(0, 4, rng.randint(0, 10))) for _ in range(20)]
    b_seqs = [list(rng.randint(0, 4, rng.randint(0, 10))) for _ in range(20)]
    out = native.edit_distances_native(a_seqs, b_seqs)
    assert out is not None
    for a, b, d in zip(a_seqs, b_seqs, out):
        assert d == edit_distance(a, b)
