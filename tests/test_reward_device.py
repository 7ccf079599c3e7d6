"""On-device reward/gain DP vs the numpy/C++ reference path."""
import numpy as np
import pytest
from numpy.testing import assert_equal

from attention_lvcsr_tpu.ops.error_rate import batch_reward_and_gain
from attention_lvcsr_tpu.ops.reward_op import (reward_and_gain_callback,
                                               reward_and_gain_device)


@pytest.mark.parametrize("seed", range(5))
def test_device_matches_numpy(seed):
    rng = np.random.RandomState(seed)
    A, eos = 6, 5
    T_g, T_r, B = rng.randint(3, 10), rng.randint(3, 10), rng.randint(1, 4)
    gt = rng.randint(0, A - 1, size=(T_g, B)).astype(np.int64)
    pos = rng.randint(0, T_g, size=B)
    gt[pos, np.arange(B)] = eos          # every groundtruth has an EOS
    rec = rng.randint(0, A, size=(T_r, B)).astype(np.int64)

    ref_r, ref_g = batch_reward_and_gain(gt, rec, A, eos)
    dev_r, dev_g = reward_and_gain_device(gt, rec, A, eos)
    assert_equal(np.asarray(dev_r), ref_r)
    assert_equal(np.asarray(dev_g), ref_g)


def test_golden_case_device():
    groundtruth = [[0, 0, 0], [1, 2, 1], [2, 1, 4], [4, 3, 0], [0, 4, 0]]
    recognized = [[0, 0, 0], [2, 1, 1], [1, 2, 4], [3, 4, 0], [4, 0, 0]]
    ref_r, ref_g = batch_reward_and_gain(
        np.asarray(groundtruth), np.asarray(recognized), 7, 4)
    dev_r, dev_g = reward_and_gain_device(
        np.asarray(groundtruth), np.asarray(recognized), 7, 4)
    assert_equal(np.asarray(dev_r), ref_r)
    assert_equal(np.asarray(dev_g), ref_g)


def test_callback_path_still_works():
    groundtruth = np.asarray([[0], [1], [4]])
    recognized = np.asarray([[1], [4], [0]])
    cb_r, cb_g = reward_and_gain_callback(groundtruth, recognized, 5, 4)
    dv_r, dv_g = reward_and_gain_device(groundtruth, recognized, 5, 4)
    assert_equal(np.asarray(cb_r), np.asarray(dv_r))
    assert_equal(np.asarray(cb_g), np.asarray(dv_g))
