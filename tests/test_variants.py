"""Coverage for model variants: stacked decoder, LookupBottom, energy
normalizers, top MLP, unidirectional encoder, monitoring aggregation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from attention_lvcsr_tpu.models.recognizer import RecognizerNet
from attention_lvcsr_tpu.train.monitoring import (AveragedTrainMonitoring,
                                                  DataStreamMonitoring)
from attention_lvcsr_tpu.train.extensions import FinishAfter
from attention_lvcsr_tpu.train.loop import MainLoop

BASE = dict(
    input_dims={"recordings": 5}, input_num_chars={},
    eos_label=4, num_phonemes=5, dim_dec=6, dims_bidir=[5],
    enc_transition="gru", dec_transition="gru",
    attention_type="content_and_conv", conv_n=2,
    use_states_for_readout=False,
    criterion={"name": "log_likelihood"},
    bottom={"bottom_class": "speech"}, subsample=[1],
    post_merge_dims=[6], max_decoded_length_scale=1.0)


def _run_cost(cfg, discrete=False):
    net = RecognizerNet(**cfg)
    rng = np.random.RandomState(0)
    B, T, TL = 2, 8, 4
    if discrete:
        inputs = jnp.asarray(rng.randint(0, 7, (B, T)), jnp.int32)
    else:
        inputs = jnp.asarray(rng.randn(B, T, 5), jnp.float32)
    mask = jnp.ones((B, T), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 5, (B, TL)), jnp.int32)
    lmask = jnp.ones((B, TL), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), inputs, mask, labels, lmask,
                      method=net.cost)
    out = net.apply(params, inputs, mask, labels, lmask, method=net.cost)
    assert np.isfinite(np.asarray(out["costs"])).all()
    return net, params, out


@pytest.mark.slow
def test_dec_stack_2():
    cfg = dict(BASE, dec_stack=2, use_states_for_readout=True)
    net, params, out = _run_cost(cfg)
    assert "transition_1" in params["params"]["generator"]
    # stacked states appear as separate attention state transforms
    att = params["params"]["generator"]["attention"]
    assert "state_trans_states_0" in att and "state_trans_states_1" in att


def test_lookup_bottom():
    cfg = dict(BASE, bottom={"bottom_class": "lookup", "dim": 6},
               input_dims={}, input_num_chars={"inputs": 7})
    _run_cost(cfg, discrete=True)


@pytest.mark.parametrize("normalizer", ["logistic", "relu"])
def test_energy_normalizers(normalizer):
    cfg = dict(BASE, energy_normalizer=normalizer)
    net, params, out = _run_cost(cfg)
    w = np.asarray(out["weights"])
    assert (w >= 0).all() and np.isfinite(w).all()


def test_dims_top():
    cfg = dict(BASE, dims_top=[8])
    net, params, _ = _run_cost(cfg)
    assert "top" in params["params"]


def test_unidirectional_encoder():
    cfg = dict(BASE, bidir=False)
    net, params, out = _run_cost(cfg)
    assert out["encoded"].shape[-1] == 5  # dims_bidir[-1], not doubled


def test_simple_recurrent_transitions():
    cfg = dict(BASE, enc_transition="SimpleRecurrent",
               dec_transition="SimpleRecurrent")
    _run_cost(cfg)


def test_lstm_encoder():
    cfg = dict(BASE, enc_transition="LSTM")
    _run_cost(cfg)


def test_lstm_decoder():
    cfg = dict(BASE, dec_transition="LSTM")
    net, params, out = _run_cost(cfg)
    t = params["params"]["generator"]["transition_0"]
    assert "W_state" in t and "initial_cells" in t


class _Algo:
    params = {}
    opt_state = None

    def __init__(self):
        self.i = 0

    def process_batch(self, batch):
        self.i += 1
        return {"train_cost": float(self.i)}


def test_averaged_monitoring():
    loop = MainLoop(_Algo(), lambda: iter([{}] * 10), extensions=[
        AveragedTrainMonitoring(["train_cost"], every_n_batches=5),
        FinishAfter(after_n_epochs=1)])
    loop.run()
    # mean of 1..5 = 3, mean of 6..10 = 8
    times, values = loop.log.channel("average_train_cost")
    assert values == [3.0, 8.0]


def test_datastream_monitoring_weighted_mean():
    batches = [{"v": (10.0, 2.0)}, {"v": (2.0, 2.0)}]

    def eval_fn(batch):
        return batch

    mon = DataStreamMonitoring(eval_fn, lambda: iter(batches),
                               prefix="valid", after_epoch=True)
    loop = MainLoop(_Algo(), lambda: iter([{}]),
                    extensions=[mon, FinishAfter(after_n_epochs=1)])
    loop.run()
    assert loop.log.last_value("valid_v") == 3.0  # (10+2)/(2+2)


def test_maxout_readout():
    """Maxout(2) post-merge (reference wsj_jan_new.yaml readout;
    blocks/bricks/simple.py:134-181): merged dim halves before the final
    projection and the cost stays finite."""
    cfg = dict(BASE, post_merge_dims=[6], post_merge_activation="maxout:2")
    net, params, out = _run_cost(cfg)
    from flax import traverse_util
    flat = traverse_util.flatten_dict(params["params"])
    kernels = {"/".join(p): v for p, v in flat.items()
               if "post_merge_0" in "/".join(p) and p[-1] == "kernel"}
    (kernel,) = kernels.values()
    assert kernel.shape[0] == 3  # 6 merged units -> 3 maxout groups
