"""One-step-vs-scan and numpy-reference tests for recurrent cells.

Follows the canonical pattern of the reference RNN tests
(``blocks/tests/bricks/test_recurrent.py``): drive the scanned apply and an
explicit numpy loop with identical weights and compare.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from attention_lvcsr_tpu.models.cells import (GatedRecurrent, LSTM,
                                              SimpleRecurrent)

DIM = 5
T, B = 7, 3


def _random_seqs(rng, cell, dims):
    return {name: jnp.asarray(rng.randn(T, B, d).astype('float32'))
            for name, d in dims.items()}


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


@pytest.mark.parametrize("with_mask", [False, True])
def test_gru_matches_numpy(with_mask):
    rng = np.random.RandomState(1)
    cell = GatedRecurrent(dim=DIM)
    seqs = _random_seqs(rng, cell, {"inputs": DIM, "gate_inputs": 2 * DIM})
    mask = (jnp.asarray((rng.uniform(size=(T, B)) > 0.3).astype('float32'))
            if with_mask else None)
    params = cell.init(jax.random.PRNGKey(0), seqs, mask, method=cell.scan)
    out = cell.apply(params, seqs, mask, method=cell.scan)

    p = jax.tree.map(np.asarray, params)["params"]
    Wss, Wsg = p["state_to_state"], p["state_to_gates"]
    h = np.tile(p["initial_state"], (B, 1))
    xs = np.asarray(seqs["inputs"])
    gs = np.asarray(seqs["gate_inputs"])
    for t in range(T):
        gates = sigmoid(h @ Wsg + gs[t])
        z, r = gates[:, :DIM], gates[:, DIM:]
        cand = np.tanh((h * r) @ Wss + xs[t])
        new_h = z * cand + (1 - z) * h
        if mask is not None:
            m = np.asarray(mask)[t][:, None]
            new_h = m * new_h + (1 - m) * h
        assert_allclose(np.asarray(out["states"][t]), new_h, atol=1e-5)
        h = new_h
    assert_allclose(np.asarray(out["final"]["states"]), h, atol=1e-5)


def test_simple_recurrent_matches_numpy():
    rng = np.random.RandomState(2)
    cell = SimpleRecurrent(dim=DIM)
    seqs = _random_seqs(rng, cell, {"inputs": DIM})
    params = cell.init(jax.random.PRNGKey(0), seqs, None, method=cell.scan)
    out = cell.apply(params, seqs, None, method=cell.scan)
    W = np.asarray(params["params"]["W"])
    h = np.zeros((B, DIM), 'float32')
    for t in range(T):
        h = np.tanh(h @ W + np.asarray(seqs["inputs"][t]))
        assert_allclose(np.asarray(out["states"][t]), h, atol=1e-5)


def test_lstm_matches_numpy():
    rng = np.random.RandomState(3)
    cell = LSTM(dim=DIM)
    seqs = _random_seqs(rng, cell, {"inputs": 4 * DIM})
    params = cell.init(jax.random.PRNGKey(0), seqs, None, method=cell.scan)
    # give the peepholes nonzero values
    params = jax.tree.map(
        lambda x: x + 0.1 if x.ndim == 1 else x, params)
    out = cell.apply(params, seqs, None, method=cell.scan)
    p = jax.tree.map(np.asarray, params)["params"]
    h = np.tile(p["initial_state"], (B, 1))
    c = np.tile(p["initial_cells"], (B, 1))
    for t in range(T):
        acts = h @ p["W_state"] + np.asarray(seqs["inputs"][t])
        i = sigmoid(acts[:, :DIM] + c * p["W_cell_to_in"])
        f = sigmoid(acts[:, DIM:2 * DIM] + c * p["W_cell_to_forget"])
        c = f * c + i * np.tanh(acts[:, 2 * DIM:3 * DIM])
        o = sigmoid(acts[:, 3 * DIM:] + c * p["W_cell_to_out"])
        h = o * np.tanh(c)
        assert_allclose(np.asarray(out["states"][t]), h, atol=1e-5)
        assert_allclose(np.asarray(out["cells"][t]), c, atol=1e-5)


def test_one_step_equals_scan():
    rng = np.random.RandomState(4)
    cell = GatedRecurrent(dim=DIM)
    seqs = _random_seqs(rng, cell, {"inputs": DIM, "gate_inputs": 2 * DIM})
    params = cell.init(jax.random.PRNGKey(0), seqs, None, method=cell.scan)
    out = cell.apply(params, seqs, None, method=cell.scan)

    states = cell.apply(params, B, method=cell.initial_states)
    for t in range(T):
        states = cell.apply(
            params, states, {k: v[t] for k, v in seqs.items()},
            method=cell.one_step)
        assert_allclose(np.asarray(states["states"]),
                        np.asarray(out["states"][t]), atol=1e-6)
