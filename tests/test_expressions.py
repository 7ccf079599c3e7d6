"""Golden tests for conv1d / pad_to_a_multiple (reference tests/test_conv1d.py)."""
import numpy
from numpy.testing import assert_allclose

from attention_lvcsr_tpu.ops.expressions import (
    conv1d, entropy, masked_softmax, monotonicity_penalty, pad_to_a_multiple,
    weights_std)


def test_conv1d():
    a = [[1.0, 2, 3], [1, 0, 1]]
    b = [[2, 1], [1, 3.0]]
    c = numpy.asarray(conv1d(a, b))
    assert_allclose(c, [[[5, 8], [5, 9]], [[1, 2], [3, 1]]])
    d = numpy.asarray(conv1d(a, b, border_mode='full'))
    assert_allclose(d, [[[2, 5, 8, 3], [1, 5, 9, 9]],
                        [[2, 1, 2, 1], [1, 3, 1, 3]]])


def test_pad_to_a_multiple():
    a = numpy.array([[1, 2], [3, 4], [5, 6]])
    b = numpy.vstack([a, [[0, 0]]])
    assert_allclose(numpy.asarray(pad_to_a_multiple(a, 2, 0)), b)
    assert_allclose(numpy.asarray(pad_to_a_multiple(a, 3, 0)), a)


def test_masked_softmax():
    e = numpy.array([[1.0, 2.0, 3.0], [0.0, 0.0, 0.0]])
    mask = numpy.array([[1.0, 1.0, 0.0], [0.0, 0.0, 0.0]])
    w = numpy.asarray(masked_softmax(e, mask))
    assert_allclose(w[0, :2], numpy.exp([1.0, 2.0]) / numpy.exp([1.0, 2.0]).sum(),
                    rtol=1e-5)
    assert w[0, 2] == 0
    # All-masked row yields zeros, not NaNs.
    assert_allclose(w[1], 0.0)


def test_attention_diagnostics_shapes():
    rng = numpy.random.RandomState(0)
    w = rng.uniform(size=(4, 2, 7)).astype('float32')
    w /= w.sum(axis=2, keepdims=True)
    mask = numpy.ones((4, 2), 'float32')
    assert float(entropy(w, mask)) < 0
    assert float(monotonicity_penalty(w, mask)) >= 0
    assert numpy.isfinite(float(weights_std(w, mask)))
