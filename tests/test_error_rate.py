"""Golden-value tests for the edit-distance / reward / gain math.

Fixture values are the outputs of the reference implementation
(``/root/reference/lvsr/error_rate.py``, ``lvsr/ops.py:RewardOp``) evaluated
on the inputs of ``/root/reference/tests/test_error_rate.py``.  (The
reference's own ``test_reward_op`` golden block is stale — it does not match
the shipped reference code; we pin the shipped-code behaviour.)
"""
import numpy
from numpy.testing import assert_allclose, assert_equal

from attention_lvcsr_tpu.ops.error_rate import (
    batch_reward_and_gain, edit_distance, edit_distance_matrix, gain_matrix,
    reward_matrix, wer)


def test_edit_distance_matrix():
    dist, action = edit_distance_matrix('abdce', 'abcd')
    assert_equal(dist, numpy.array(
        [[0, 1, 2, 3, 4],
         [1, 0, 1, 2, 3],
         [2, 1, 0, 1, 2],
         [3, 2, 1, 1, 1],
         [4, 3, 2, 1, 2],
         [5, 4, 3, 2, 2]]))
    assert_equal(action, numpy.array(
        [[0, 0, 0, 0, 0],
         [0, 0, 2, 2, 2],
         [0, 0, 0, 2, 2],
         [0, 0, 0, 3, 0],
         [0, 0, 0, 0, 3],
         [0, 0, 0, 0, 3]]))


def test_edit_distance_brute_force():
    # Randomized cross-check against a simple per-cell DP oracle.
    rng = numpy.random.RandomState(0)

    def oracle(y, y_hat):
        n, m = len(y), len(y_hat)
        d = numpy.zeros((n + 1, m + 1), dtype=int)
        d[:, 0] = numpy.arange(n + 1)
        d[0, :] = numpy.arange(m + 1)
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                d[i, j] = min(d[i - 1, j] + 1, d[i, j - 1] + 1,
                              d[i - 1, j - 1] + (y[i - 1] != y_hat[j - 1]))
        return d

    for _ in range(25):
        y = list(rng.randint(0, 4, size=rng.randint(0, 12)))
        y_hat = list(rng.randint(0, 4, size=rng.randint(0, 12)))
        assert_equal(edit_distance_matrix(y, y_hat)[0], oracle(y, y_hat))


def test_reward_matrix():
    matrix = reward_matrix('abc$', 'abc$', 'abc$', eos_label=3)
    assert_equal(matrix, numpy.array([[0, -1, -1, -3],
                                      [-1, 0, -1, -2],
                                      [-1, -1, 0, -1],
                                      [-1, -1, -1, 0],
                                      [-1, -1, -1, -1]]))
    matrix = reward_matrix('abc$', 'acb$', 'abc$', eos_label=3)
    assert_equal(matrix, numpy.array([[0, -1, -1, -3],
                                      [-1, 0, -1, -2],
                                      [-2, -1, -1, -1],
                                      [-2, -2, -1, -2],
                                      [-3, -3, -2, -2]]))


def test_gain_matrix():
    matrix = gain_matrix('abc$', 'abc$', alphabet='abc$', eos_label=3)
    assert_equal(matrix, numpy.array([[0, -1, -1, -3],
                                      [-1, 0, -1, -2],
                                      [-1, -1, 0, -1],
                                      [-1, -1, -1, 0],
                                      [-1, -1, -1, -1]]))
    matrix = gain_matrix('abc$', 'acb$', alphabet='abc$', eos_label=3)
    assert_equal(matrix, numpy.array([[0, -1, -1, -3],
                                      [-1, 0, -1, -2],
                                      [-1, 0, 0, 0],
                                      [-1, -1, 0, -1],
                                      [-1, -1, 0, 0]]))


def test_wer():
    assert_allclose(wer('abc', 'adc'), 0.333333, rtol=1e-4)
    assert edit_distance('kitten', 'sitting') == 3


def test_batch_reward_and_gain():
    groundtruth = [[0, 0, 0], [1, 2, 1], [2, 1, 4], [4, 3, 0], [0, 4, 0]]
    recognized = [[0, 0, 0], [2, 1, 1], [1, 2, 4], [3, 4, 0], [4, 0, 0]]
    rewards, gains = batch_reward_and_gain(
        groundtruth, recognized, alphabet_size=7, eos_label=4)
    rewards_should_be = numpy.array(
        [[[0, -1, -1, -1, -3, -1, -1],
          [0, -1, -1, -1, -4, -1, -1],
          [0, -1, -1, -1, -2, -1, -1]],
         [[-1, 0, -1, -1, -2, -1, -1],
          [-1, -1, 0, -1, -3, -1, -1],
          [-1, 0, -1, -1, -1, -1, -1]],
         [[-2, -1, -1, -2, -1, -2, -2],
          [-2, -1, -1, -1, -2, -2, -2],
          [-1, -1, -1, -1, 0, -1, -1]],
         [[-2, -2, -1, -2, -2, -2, -2],
          [-2, -1, -2, -2, -2, -2, -2],
          [-1, -1, -1, -1, -1, -1, -1]],
         [[-3, -3, -2, -3, -2, -3, -3],
          [-1, -1, -1, -1, -1, -1, -1],
          [-1, -1, -1, -1, -1, -1, -1]]])
    assert_equal(rewards, rewards_should_be)
    gains_should_be = numpy.array(
        [[[0, -1, -1, -1, -3, -1, -1],
          [0, -1, -1, -1, -4, -1, -1],
          [0, -1, -1, -1, -2, -1, -1]],
         [[-1, 0, -1, -1, -2, -1, -1],
          [-1, -1, 0, -1, -3, -1, -1],
          [-1, 0, -1, -1, -1, -1, -1]],
         [[-1, 0, 0, -1, 0, -1, -1],
          [-1, 0, 0, 0, -1, -1, -1],
          [-1, -1, -1, -1, 0, -1, -1]],
         [[-1, -1, 0, -1, -1, -1, -1],
          [-1, 0, -1, -1, -1, -1, -1],
          [-1000] * 7],
         [[-1, -1, 0, -1, 0, -1, -1],
          [-1000] * 7,
          [-1000] * 7]])
    assert_equal(gains, gains_should_be)

    # Groundtruth may itself be a prediction without EOS; different lengths OK.
    batch_reward_and_gain([[4]], [[1], [2]], alphabet_size=7, eos_label=4)
