"""Beam-search tests on a randomly-initialized recognizer.

Analogue of ``blocks/tests/test_search.py``: checks that returned costs
match recomputed teacher-forced costs, that greedy (beam 1) matches an
explicit step-by-step argmin loop, and that widening the beam never hurts
the best cost.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from attention_lvcsr_tpu.models.recognizer import SpeechRecognizer

EOS = 4

NET_CONFIG = dict(
    input_dims={"recordings": 6},
    input_num_chars={},
    eos_label=EOS,
    num_phonemes=5,
    dim_dec=8,
    dims_bidir=[7],
    enc_transition="gru",
    dec_transition="gru",
    attention_type="content_and_conv",
    conv_n=1,
    use_states_for_readout=False,
    criterion={"name": "log_likelihood"},
    bottom={"bottom_class": "speech"},
    subsample=[1],
    post_merge_dims=[10],
    max_decoded_length_scale=1.0,
    data_prepend_eos=False,
)


@pytest.fixture(scope="module")
def recognizer():
    rec = SpeechRecognizer(NET_CONFIG, init_config={
        "/recognizer": {
            "weights_init": ["isotropic_gaussian", 0.5],
            "biases_init": ["constant", 0.0],
            "rec_weights_init": ["orthogonal"],
        },
    }, seed=7)
    # Bias the readout towards EOS so random decodes finish.
    p = rec.params["params"]["generator"]["readout"]["post_merge_0"]
    p["bias"] = p["bias"].at[EOS].add(1.5)
    return rec


@pytest.fixture(scope="module")
def utterance():
    rng = np.random.RandomState(3)
    return rng.randn(16, 6).astype("float32")


def _greedy_reference(rec, inputs, max_len):
    """Explicit numpy greedy loop over the split decode-step interface."""
    net = rec.net
    x = jnp.asarray(inputs)[None]
    mask = jnp.ones(x.shape[:2], jnp.float32)
    contexts = net.apply(rec.params, x, mask, method=net.decode_contexts)
    carry = net.apply(rec.params, 1, contexts, method=net.decode_init)
    outputs, total = [], 0.0
    for _ in range(max_len):
        g, costs, _ = net.apply(rec.params, carry, contexts,
                                method=net.decode_score)
        sym = int(np.argmin(np.asarray(costs)[0]))
        total += float(np.asarray(costs)[0, sym])
        outputs.append(sym)
        carry = net.apply(rec.params, carry, g, jnp.asarray([sym]),
                          contexts, method=net.decode_advance)
        if sym == EOS:
            break
    return outputs, total


def test_beam1_matches_greedy(recognizer, utterance):
    recognizer.init_beam_search(1)
    outputs, costs = recognizer.beam_search(utterance)
    g_out, g_cost = _greedy_reference(recognizer, utterance, 16)
    assert outputs[0] == g_out
    assert_allclose(costs[0], g_cost, rtol=1e-4)


def test_beam_costs_match_recomputation(recognizer, utterance):
    recognizer.init_beam_search(4)
    outputs, costs = recognizer.beam_search(utterance)
    assert len(outputs) >= 1
    for seq, cost in zip(outputs, costs):
        assert seq[-1] == EOS
        labels = jnp.asarray(np.asarray(seq, np.int32))[None, :]
        labels_mask = jnp.ones_like(labels, jnp.float32)
        out = recognizer.cost_fn()(
            recognizer.params, jnp.asarray(utterance)[None],
            jnp.ones((1, len(utterance)), jnp.float32), labels, labels_mask)
        assert_allclose(float(np.asarray(out["costs"]).sum()), cost,
                        rtol=2e-4, atol=2e-4)


def test_wider_beam_no_worse(recognizer, utterance):
    recognizer.init_beam_search(1)
    _, costs1 = recognizer.beam_search(utterance)
    recognizer.init_beam_search(8)
    _, costs8 = recognizer.beam_search(utterance)
    assert min(costs8) <= min(costs1) + 1e-4


def test_shape_bucketing_reuses_compilation(recognizer):
    """Different utterance lengths pad to one bucket -> one compilation."""
    rng = np.random.RandomState(9)
    recognizer.init_beam_search(2)
    for T in (11, 16, 23):
        utt = rng.randn(T, 6).astype("float32")
        outputs, costs = recognizer.beam_search(utt)
        assert outputs and np.isfinite(costs[0])
    assert len(recognizer._beam_search._jitted) == 1


def test_batch_padding_rows_ignored(recognizer):
    """A padded (fully masked) row yields no usable results but does not
    disturb the real rows."""
    rng = np.random.RandomState(10)
    utts = rng.randn(3, 16, 6).astype("float32")
    recognizer.init_beam_search(2)
    ref = recognizer.beam_search(utts[:1][0], as_arrays=True)
    out = recognizer.beam_search(utts, np.ones((3, 16), "f"),
                                 pad_batch_multiple=4, as_arrays=True)
    assert out["done_out"].shape[0] == 4
    np.testing.assert_allclose(out["done_cost"][0], ref["done_cost"][0],
                               rtol=1e-4, atol=1e-4)


def test_char_discount_prefers_longer(recognizer, utterance):
    recognizer.init_beam_search(4)
    out_plain, _ = recognizer.beam_search(utterance, char_discount=0.0)
    out_disc, _ = recognizer.beam_search(utterance, char_discount=5.0)
    # ranking with a large discount puts the longest finished hyp first
    lengths_disc = len(out_disc[0])
    assert lengths_disc >= max(len(o) for o in out_plain) - 8
