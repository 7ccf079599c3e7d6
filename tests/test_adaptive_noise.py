"""Adaptive (variational) weight-noise training tests (Graves'11)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attention_lvcsr_tpu.models.recognizer import (SpeechRecognizer,
                                                   param_path_dict,
                                                   params_from_path_dict)
from attention_lvcsr_tpu.train.driver import (LOG_SIGMA_SCALE,
                                              init_adaptive_noise_params,
                                              make_train_step)
from attention_lvcsr_tpu.train.rules import build_optimizer

NET_CONFIG = dict(
    input_dims={"recordings": 5}, input_num_chars={},
    eos_label=4, num_phonemes=5, dim_dec=6, dims_bidir=[5],
    enc_transition="gru", dec_transition="gru",
    attention_type="content", use_states_for_readout=False,
    criterion={"name": "log_likelihood"},
    bottom={"bottom_class": "speech"}, subsample=[1],
    post_merge_dims=[6], max_decoded_length_scale=1.0)


def _setup():
    rec = SpeechRecognizer(NET_CONFIG, init_config={
        "/recognizer": {"weights_init": ["isotropic_gaussian", 0.2],
                        "biases_init": ["constant", 0.0]}}, seed=0)
    config = {
        "net": dict(NET_CONFIG),
        "training": {"gradient_threshold": 100.0, "rules": ["momentum"],
                     "scale": 0.01, "momentum": 0.0},
        "regularization": {"adaptive_noise": {
            "init_sigma": 1e-3, "model_cost_coefficient": 1.0,
            "num_examples": 100}},
    }
    init_adaptive_noise_params(rec, 1e-3)
    optimizer = build_optimizer(config["training"], {})
    step = jax.jit(make_train_step(rec, optimizer, config, eos_label=4,
                                   input_key="recordings"))
    return rec, optimizer, step


def _batch(B=1, T=8, TL=4):
    rng = np.random.RandomState(0)
    return (jnp.asarray(rng.randn(B, T, 5), jnp.float32),
            jnp.ones((B, T), jnp.float32),
            jnp.asarray(rng.randint(0, 5, (B, TL)), jnp.int32),
            jnp.ones((B, TL), jnp.float32))


@pytest.mark.slow
def test_adaptive_noise_step_runs_and_learns():
    rec, optimizer, step = _setup()
    params = rec.params
    assert "noise" in params
    init_ls2 = float(jax.tree_util.tree_leaves(params["noise"])[0][0, 0]
                     if jax.tree_util.tree_leaves(
                         params["noise"])[0].ndim == 2
                     else jax.tree_util.tree_leaves(params["noise"])[0][0])
    np.testing.assert_allclose(init_ls2,
                               np.log(1e-3) * 2 / LOG_SIGMA_SCALE,
                               rtol=1e-5)
    opt_state = optimizer.init(params)
    costs = []
    for i in range(4):
        params, opt_state, monitors = step(
            params, opt_state, jax.random.PRNGKey(i), *_batch())
        for key in ("train_cost", "model_cost", "model_prior_mean",
                    "model_prior_variance"):
            assert np.isfinite(float(monitors[key])), key
        costs.append(float(monitors["sequence_total_cost"]))
    # log-variances moved away from their init
    moved = jax.tree_util.tree_leaves(params["noise"])[0]
    assert not np.allclose(np.asarray(moved),
                           np.log(1e-3) * 2 / LOG_SIGMA_SCALE)


def test_noise_params_checkpoint_roundtrip():
    rec, *_ = _setup()
    paths = param_path_dict(rec.params)
    noise_keys = [k for k in paths if k.startswith("/adaptive_noise/")]
    assert noise_keys
    rebuilt = params_from_path_dict(paths)
    assert "noise" in rebuilt and "params" in rebuilt
    for a, b in zip(jax.tree_util.tree_leaves(rec.params["noise"]),
                    jax.tree_util.tree_leaves(rebuilt["noise"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
