"""Recognizer assembly tests: cost graph, generate, cost-vs-generate parity.

The cost-vs-generate consistency test is the TPU analogue of the reference's
``blocks/tests/bricks/test_sequence_generators.py``: forcing the generate
step to consume the teacher labels must reproduce the teacher-forced cost
matrix step by step.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from attention_lvcsr_tpu.models.recognizer import (RecognizerNet,
                                                   SpeechRecognizer,
                                                   initialize_params,
                                                   param_path_dict,
                                                   params_from_path_dict)

NET_CONFIG = dict(
    input_dims={"recordings": 7},
    input_num_chars={},
    eos_label=4,
    num_phonemes=5,
    dim_dec=8,
    dims_bidir=[6],
    enc_transition="gru",
    dec_transition="gru",
    attention_type="content_and_conv",
    conv_n=2,
    use_states_for_readout=True,
    criterion={"name": "log_likelihood"},
    bottom={"bottom_class": "speech", "dims": [9]},
    subsample=[2],
    post_merge_dims=[10],
    max_decoded_length_scale=1.0,
)

B, T, F, TL = 2, 12, 7, 6


@pytest.fixture(scope="module")
def net_and_params():
    net = RecognizerNet(**NET_CONFIG)
    rng = np.random.RandomState(0)
    inputs = jnp.asarray(rng.randn(B, T, F), jnp.float32)
    inputs_mask = jnp.asarray(
        (np.arange(T)[None, :] < np.array([[12], [9]])).astype('float32'))
    labels = jnp.asarray(rng.randint(0, 5, size=(B, TL)), jnp.int32)
    labels_mask = jnp.asarray(
        (np.arange(TL)[None, :] < np.array([[6], [4]])).astype('float32'))
    params = net.init(jax.random.PRNGKey(0), inputs, inputs_mask, labels,
                      labels_mask, method=net.cost)
    return net, params, inputs, inputs_mask, labels, labels_mask


def test_cost_shapes(net_and_params):
    net, params, inputs, inputs_mask, labels, labels_mask = net_and_params
    out = net.apply(params, inputs, inputs_mask, labels, labels_mask,
                    method=net.cost)
    L = T // 2  # subsample 2
    assert out["costs"].shape == (TL, B)
    assert out["weights"].shape == (TL, B, L)
    assert out["encoded"].shape == (B, L, 12)
    # masked positions have zero cost
    costs = np.asarray(out["costs"])
    assert_allclose(costs[4:, 1], 0.0)
    assert np.isfinite(costs).all()


def test_cost_vs_generate_consistency(net_and_params):
    net, params, inputs, inputs_mask, labels, labels_mask = net_and_params
    out = net.apply(params, inputs, inputs_mask, labels,
                    jnp.ones_like(labels_mask), method=net.cost)
    ref_costs = np.asarray(out["costs"])  # (TL, B)

    contexts = net.apply(params, inputs, inputs_mask,
                         method=net.decode_contexts)
    carry = net.apply(params, B, contexts, method=net.decode_init)
    for t in range(TL):
        g_new, costs_vec, readouts = net.apply(
            params, carry, contexts, method=net.decode_score)
        step_cost = np.take_along_axis(
            np.asarray(costs_vec), np.asarray(labels[:, t])[:, None],
            axis=1)[:, 0]
        assert_allclose(step_cost, ref_costs[t], atol=2e-4)
        carry = net.apply(params, carry, g_new, labels[:, t], contexts,
                          method=net.decode_advance)


def test_generate_runs(net_and_params):
    net, params, inputs, inputs_mask, *_ = net_and_params
    out = net.apply(params, inputs, inputs_mask, 5, jax.random.PRNGKey(1),
                    method=net.generate)
    assert out["outputs"].shape == (5, B)
    assert out["costs"].shape == (5, B)
    assert np.asarray(out["outputs"]).max() < 5


def test_config_driven_initialization():
    rec = SpeechRecognizer(NET_CONFIG, init_config={
        "/recognizer": {
            "weights_init": ["isotropic_gaussian", 0.1],
            "biases_init": ["constant", 0.0],
            "rec_weights_init": ["orthogonal"],
        },
        "/recognizer/generator/feedback": {
            "weights_init": ["constant", 0.5],
        },
    })
    paths = param_path_dict(rec.params)
    # deeper path override applied
    emb = [v for k, v in paths.items() if "feedback" in k and
           k.endswith("embedding")]
    assert emb and np.allclose(emb[0], 0.5)
    # recurrent weights are orthogonal
    rec_w = [v for k, v in paths.items() if k.endswith("state_to_state")]
    assert rec_w
    w = rec_w[0]
    assert_allclose(w.T @ w, np.eye(w.shape[1]), atol=1e-4)
    # biases zero
    biases = [v for k, v in paths.items() if k.endswith("/bias")]
    assert biases and all(np.allclose(b, 0) for b in biases)


def test_param_path_roundtrip():
    rec = SpeechRecognizer(NET_CONFIG, init_config={})
    paths = param_path_dict(rec.params)
    assert all(k.startswith("/recognizer/") for k in paths)
    rebuilt = params_from_path_dict(paths)
    flat1 = jax.tree_util.tree_leaves(rec.params)
    flat2 = jax.tree_util.tree_leaves(rebuilt)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        assert_allclose(np.asarray(a), np.asarray(b))
