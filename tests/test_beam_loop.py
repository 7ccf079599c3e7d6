"""Whole-loop Pallas decode kernel vs the XLA ``lax.while_loop`` path.

``ops/pallas/beam_loop.py`` collapses the entire beam-search decode into
one kernel; the XLA path in ``search/beam.py`` is its semantic reference
(itself parity-tested against ``blocks/search.py:244-399`` in
``test_beam_parity.py``).  These tests run the kernel in interpret mode
on the CPU mesh and require the done-set token rows to match the XLA
path EXACTLY (same candidate selection, same tie-breaking, same stopping
bookkeeping), with costs equal to float tolerance.
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

INIT = {
    "/recognizer": {
        "weights_init": ["isotropic_gaussian", 0.5],
        "biases_init": ["constant", 0.0],
        "rec_weights_init": ["orthogonal"],
    },
}


def _build(use_pallas, prior=None, prepend_eos=False):
    cfg = dict(NET_CONFIG, use_pallas=use_pallas, prior=prior,
               data_prepend_eos=prepend_eos)
    rec = SpeechRecognizer(cfg, init_config=INIT, seed=7)
    p = rec.params["params"]["generator"]["readout"]["post_merge_0"]
    p["bias"] = p["bias"].at[EOS].add(1.5)
    return rec


def _batch():
    rng = np.random.RandomState(3)
    inputs = rng.randn(2, 16, 6).astype("float32")
    mask = (np.arange(16)[None] < np.array([[16], [12]])).astype("f")
    return inputs, mask


def _search_both(prior=None, **kwargs):
    inputs, mask = _batch()
    out = {}
    for name, mode in [("xla", "never"), ("loop", "interpret")]:
        rec = _build(mode, prior=prior)
        rec.init_beam_search(3)
        out[name] = rec.beam_search(inputs, mask, as_arrays=True,
                                    **kwargs)
    return out["xla"], out["loop"]


def _assert_parity(ref, loop):
    valid_ref = ref["done_valid"]
    valid_loop = loop["done_valid"]
    np.testing.assert_array_equal(valid_loop, valid_ref)
    assert valid_ref.any(), "test is vacuous: nothing decoded"
    for u in range(valid_ref.shape[0]):
        for k in range(valid_ref.shape[1]):
            if not valid_ref[u, k]:
                continue
            n_ref = ref["done_len"][u, k]
            assert loop["done_len"][u, k] == n_ref
            np.testing.assert_array_equal(
                loop["done_out"][u, k, :n_ref],
                ref["done_out"][u, k, :n_ref])
            assert_allclose(loop["done_cost"][u, k],
                            ref["done_cost"][u, k], rtol=1e-4, atol=1e-4)
            assert_allclose(loop["done_adjusted"][u, k],
                            ref["done_adjusted"][u, k],
                            rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("prior", [
    None,
    {"type": "expanding", "initial_begin": 0, "initial_end": 6,
     "min_speed": 1.0, "max_speed": 2.0},
    {"type": "window_around_mean", "before": 4, "after": 4},
    pytest.param({"type": "window_around_median", "before": 4,
                  "after": 4}, marks=pytest.mark.slow),
])
def test_loop_kernel_matches_xla(prior):
    ref, loop = _search_both(prior=prior, char_discount=0.1)
    _assert_parity(ref, loop)


def test_loop_kernel_optimistic_stop():
    ref, loop = _search_both(char_discount=0.5,
                             stop_on="optimistic_future_cost")
    _assert_parity(ref, loop)


def test_loop_kernel_round_to_inf():
    # a tiny round_to_inf forbids expensive EOS steps from finishing
    ref, loop = _search_both(char_discount=0.1, round_to_inf=2.0)
    np.testing.assert_array_equal(loop["done_valid"], ref["done_valid"])
    _assert_parity(ref, loop)


def test_loop_kernel_ignore_first_eol():
    inputs, mask = _batch()
    out = {}
    for name, mode in [("xla", "never"), ("loop", "interpret")]:
        rec = _build(mode, prepend_eos=True)
        rec.init_beam_search(3)
        out[name] = rec.beam_search(inputs, mask, as_arrays=True,
                                    char_discount=0.1)
    _assert_parity(out["xla"], out["loop"])


def test_loop_kernel_single_utterance_api():
    """The reference-style (outputs, costs) API agrees across paths."""
    inputs, mask = _batch()
    res = {}
    for name, mode in [("xla", "never"), ("loop", "interpret")]:
        rec = _build(mode)
        rec.init_beam_search(3)
        res[name] = rec.beam_search(inputs[0], char_discount=0.1)
    out_ref, costs_ref = res["xla"]
    out_loop, costs_loop = res["loop"]
    assert out_loop == out_ref
    assert_allclose(costs_loop, costs_ref, rtol=1e-4, atol=1e-4)


def test_loop_kernel_env_kill_switch(monkeypatch):
    monkeypatch.setenv("LVSR_NO_LOOP_KERNEL", "1")
    rec = _build("interpret")
    rec.init_beam_search(3)
    assert rec._beam_search._loop_kernel_mode() is None


def test_table_cache_invalidates_on_param_change():
    """The per-(params, length) dense-table cache must notice in-place
    tree edits (leaf replacement), not just new tree objects."""
    inputs, mask = _batch()
    rec = _build("interpret")
    rec.init_beam_search(3)
    out1 = rec.beam_search(inputs, mask, as_arrays=True,
                           char_discount=0.1)
    # in-place leaf replacement, same outer dict object
    p = rec.params["params"]["generator"]["readout"]["post_merge_0"]
    p["bias"] = p["bias"].at[0].add(3.0)
    out2 = rec.beam_search(inputs, mask, as_arrays=True,
                           char_discount=0.1)
    # fresh recognizer with the same perturbation agrees with out2
    rec3 = _build("interpret")
    p3 = rec3.params["params"]["generator"]["readout"]["post_merge_0"]
    p3["bias"] = p3["bias"].at[0].add(3.0)
    rec3.init_beam_search(3)
    out3 = rec3.beam_search(inputs, mask, as_arrays=True,
                            char_discount=0.1)
    np.testing.assert_array_equal(out2["done_out"], out3["done_out"])
    assert not np.array_equal(out1["done_out"], out2["done_out"]) or \
        not np.allclose(out1["done_cost"], out2["done_cost"])


def test_wide_beam_falls_back_to_xla():
    """Reference decode.sh uses beam 200 — far past the kernel's VMEM
    budget; the mode selector must route it to the XLA path."""
    rec = _build("interpret")
    rec.init_beam_search(200)
    assert rec._beam_search._loop_kernel_mode() is None
    rec.init_beam_search(3)
    assert rec._beam_search._loop_kernel_mode() == "interpret"
    # very long audio also falls back (estimated match tensor too big)
    assert rec._beam_search._loop_kernel_mode(
        num_frames=5_000_000) is None


def test_group_autosizing():
    rec = _build("interpret")
    rec.init_beam_search(10)
    bs = rec._beam_search
    assert bs._loop_group(200, 250) == 16
    assert bs._loop_group(1600, 250) == 2   # long audio: smaller groups
    assert bs._loop_group(400000, 250) == 1  # never below 1
