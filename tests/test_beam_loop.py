"""Whole-loop Pallas decode kernel vs the XLA ``lax.while_loop`` path.

``ops/pallas/beam_loop.py`` collapses the entire beam-search decode into
one kernel; the XLA path in ``search/beam.py`` is its semantic reference
(itself parity-tested against ``blocks/search.py:244-399`` in
``test_beam_parity.py``).  These tests run the kernel in interpret mode
on the CPU mesh and require the done-set token rows to match the XLA
path EXACTLY (same candidate selection, same tie-breaking, same stopping
bookkeeping), with costs equal to float tolerance.
"""
import os

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


# recognizers are memoized per config: rebuilding pays a fresh
# trace+compile of the search paths (~2.6 s each on the 1-CPU gate box)
# while a cached instance reuses its jitted functions.  Tests that
# MUTATE the recognizer (params surgery, beam-size churn) pass
# fresh=True.
_BUILD_CACHE = {}


def _build(use_pallas, prior=None, prepend_eos=False, fresh=False,
           **net_overrides):
    key = (use_pallas, repr(prior), prepend_eos,
           repr(sorted(net_overrides.items())))
    if not fresh and key in _BUILD_CACHE:
        return _BUILD_CACHE[key]
    cfg = dict(NET_CONFIG, use_pallas=use_pallas, prior=prior,
               data_prepend_eos=prepend_eos, **net_overrides)
    rec = SpeechRecognizer(cfg, init_config=INIT, seed=7)
    p = rec.params["params"]["generator"]["readout"]["post_merge_0"]
    p["bias"] = p["bias"].at[EOS].add(1.5)
    if not fresh:
        _BUILD_CACHE[key] = rec
    return rec


def _batch():
    rng = np.random.RandomState(3)
    inputs = rng.randn(2, 16, 6).astype("float32")
    mask = (np.arange(16)[None] < np.array([[16], [12]])).astype("f")
    return inputs, mask


def _search_both(prior=None, net_overrides=None, **kwargs):
    inputs, mask = _batch()
    out = {}
    for name, mode in [("xla", "never"), ("loop", "interpret")]:
        rec = _build(mode, prior=prior, **(net_overrides or {}))
        rec.init_beam_search(3)
        assert (rec._beam_search._loop_kernel_mode() is not None) \
            == (mode == "interpret"), "variant must route to the kernel"
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
    rec = _build("interpret", fresh=True)
    rec.init_beam_search(3)
    out1 = rec.beam_search(inputs, mask, as_arrays=True,
                           char_discount=0.1)
    # in-place leaf replacement, same outer dict object
    p = rec.params["params"]["generator"]["readout"]["post_merge_0"]
    p["bias"] = p["bias"].at[0].add(3.0)
    out2 = rec.beam_search(inputs, mask, as_arrays=True,
                           char_discount=0.1)
    # fresh recognizer with the same perturbation agrees with out2
    rec3 = _build("interpret", fresh=True)
    p3 = rec3.params["params"]["generator"]["readout"]["post_merge_0"]
    p3["bias"] = p3["bias"].at[0].add(3.0)
    rec3.init_beam_search(3)
    out3 = rec3.beam_search(inputs, mask, as_arrays=True,
                            char_discount=0.1)
    np.testing.assert_array_equal(out2["done_out"], out3["done_out"])
    assert not np.array_equal(out1["done_out"], out2["done_out"]) or \
        not np.allclose(out1["done_cost"], out2["done_cost"])


def test_wide_beam_supported_extreme_falls_back():
    """Reference decode.sh uses beam 200 — now IN kernel scope (fori
    selection rounds + L-chunked match tensor); only truly extreme
    configurations route to the XLA path."""
    rec = _build("interpret", fresh=True)
    rec.init_beam_search(200)
    assert rec._beam_search._loop_kernel_mode() == "interpret"
    rec.init_beam_search(1000)   # past MAX_LOOP_BEAM
    assert rec._beam_search._loop_kernel_mode() is None
    rec.init_beam_search(3)
    assert rec._beam_search._loop_kernel_mode() == "interpret"
    # very long audio also falls back (per-utterance alignment state
    # alone exceeds the budget even with match-tensor chunking)
    assert rec._beam_search._loop_kernel_mode(
        num_frames=50_000_000) is None


def test_group_autosizing():
    rec = _build("interpret", fresh=True)
    rec.init_beam_search(10)
    bs = rec._beam_search
    assert bs._loop_group(200, 250) == 16
    assert bs._loop_group(1600, 250) == 2   # long audio: smaller groups
    assert bs._loop_group(400000, 250) == 1  # never below 1


# ---------------------------------------------------------------------------
# LM shallow fusion in the kernel + wide beams / chunked energies
# ---------------------------------------------------------------------------

LM_ARPA_FST = None  # built lazily per tmp dir


_LM_DIR = None


def _lm_files(tmp_path=None):
    """A small bigram LM with real backoff epsilon arcs (multi-state
    live sets, K_arc > 1 closures) over the 5-char net alphabet.

    Written once to a module-stable directory so the packed-FST cache
    (keyed on path) and the memoized recognizers below are shared
    across tests."""
    global _LM_DIR
    import pathlib
    import tempfile
    if _LM_DIR is None:
        _LM_DIR = pathlib.Path(tempfile.mkdtemp(prefix="lvsr_lm_"))
    tmp_path = _LM_DIR
    from attention_lvcsr_tpu.ops.fst import arpa_to_fst, write_fst_text
    arpa_text = """
\\data\\
ngram 1=7
ngram 2=6

\\1-grams:
-99  <s>  -0.2
-1.2  </s>
-0.5  a  -0.4
-0.6  b  -0.3
-0.8  c  -0.2
-1.0  d  -0.5
-0.9  E  -0.1

\\2-grams:
-0.15  a b
-0.2  b c
-0.25  c E
-0.3  a c
-0.4  d a
-0.35  b E
\\end\\
""".strip().splitlines()
    syms = {"a": 1, "b": 2, "c": 3, "d": 4, "E": 5}
    path = str(tmp_path / "bigram.fst.txt")
    if not os.path.exists(path):
        fst = arpa_to_fst(arpa_text, syms)
        write_fst_text(fst, path)
    with open(path + ".syms", "w") as f:
        for s, i in syms.items():
            f.write(f"{s} {i}\n")
    return path


def _build_lm(use_pallas, lm_path, lm_overrides=None, beam=3, seed=7):
    key = (use_pallas, lm_path, repr(sorted((lm_overrides or {}).items())),
           beam, seed)
    if key in _BUILD_CACHE:
        return _BUILD_CACHE[key]
    lm = {"path": lm_path, "weight": 0.7, "no_transition_cost": 12.0}
    lm.update(lm_overrides or {})
    cfg = dict(NET_CONFIG, use_pallas=use_pallas, lm=lm,
               character_map={"a": 0, "b": 1, "c": 2, "d": 3, "E": 4})
    rec = SpeechRecognizer(cfg, init_config=INIT, seed=seed)
    rec.init_beam_search(beam)
    _BUILD_CACHE[key] = rec
    return rec


def test_lm_config_routes_to_xla_path():
    """ANY LM-fused decode takes the XLA path and decodes: the
    in-kernel fusion of rounds 2-4 was removed (Mosaic compile
    minutes-to-never past ~250 states, no measured win below — the
    XLA path's load-densified HBM lookups match the kernel's no-LM
    throughput at every graph scale; ops/pallas/beam_loop.py
    docstring records the evidence)."""
    lm_path = _lm_files()
    rec = _build_lm("interpret", lm_path)
    assert rec._beam_search._loop_kernel_mode() is None, \
        "LM decode must route to the XLA path (in-kernel fusion removed)"
    inputs, mask = _batch()
    out = rec.beam_search(inputs, mask, as_arrays=True,
                          char_discount=0.1)
    assert out["done_valid"].any()


@pytest.mark.parametrize("overrides", [
    {"use_states_for_readout": True},
    {"energy_normalizer": "logistic"},
    {"energy_normalizer": "relu"},
    {"post_merge_activation": "maxout:2"},
    {"use_states_for_readout": True,
     "post_merge_activation": "maxout:2",
     "energy_normalizer": "logistic"},
    {"post_merge_activation": "rectifier"},
    {"post_merge_activation": "sigmoid"},
    {"conv_num_filters": 3},
    {"conv_num_filters": 10,
     "post_merge_activation": "maxout:2"},
    {"attention_type": "content"},
    {"dec_stack": 2},
    {"dec_stack": 2, "use_states_for_readout": True},
    {"criterion": {"name": "mse_gain"}},
], ids=["states-readout", "logistic", "relu", "maxout", "combined",
        "post-rectifier", "post-sigmoid", "conv3",
        "mean-maxout-shape", "content-attention", "stack2",
        "stack2-states", "mse-gain"])
def test_variant_kernel_parity(overrides):
    """Non-flagship readout/normalizer variants (the wsj_good /
    mean_maxout / jan-bhd families, TIMIT nips_smooth) run through the
    loop kernel with exact parity vs the XLA path."""
    ref, loop = _search_both(net_overrides=overrides, char_discount=0.1)
    _assert_parity(ref, loop)


def test_wide_beam_fori_parity():
    """Beam past UNROLL_SLOTS uses fori_loop selection rounds — results
    must be identical to the unrolled/XLA semantics."""
    inputs, mask = _batch()
    out = {}
    for name, mode in [("xla", "never"), ("loop", "interpret")]:
        rec = _build(mode)
        rec.init_beam_search(40)
        out[name] = rec.beam_search(inputs, mask, as_arrays=True,
                                    char_discount=0.1)
    _assert_parity(out["xla"], out["loop"])


def test_l_chunked_energies_parity(monkeypatch):
    """Long audio: the match tensor is computed in L-chunks — identical
    results to the unchunked kernel and the XLA path."""
    from attention_lvcsr_tpu.ops.pallas import beam_loop
    rng = np.random.RandomState(5)
    inputs = rng.randn(2, 160, 6).astype("float32")
    mask = (np.arange(160)[None] < np.array([[160], [140]])).astype("f")
    out = {}
    for name, mode, chunk in [("xla", "never", None),
                              ("loop", "interpret", 128)]:
        if chunk is not None:
            monkeypatch.setattr(beam_loop, "pick_l_chunk",
                                lambda *a, **k: chunk)
        rec = _build(mode)
        rec.init_beam_search(3)
        out[name] = rec.beam_search(inputs, mask, as_arrays=True,
                                    char_discount=0.1)
    _assert_parity(out["xla"], out["loop"])


def test_wide_weight_spread_lm_uses_xla_path(tmp_path):
    """Wide-weight-spread graphs (the case that would underflow an
    exp-domain kernel fusion) decode fine on the XLA log-domain path."""
    from attention_lvcsr_tpu.ops.fst import arpa_to_fst, write_fst_text
    arpa_text = """
\\data\\
ngram 1=7

\\1-grams:
-99  <s>
-1.2  </s>
-0.2  a
-0.3  b
-0.4  c
-40.0  d
-0.5  E
\\end\\
""".strip().splitlines()
    syms = {"a": 1, "b": 2, "c": 3, "d": 4, "E": 5}
    path = str(tmp_path / "wide.fst.txt")
    write_fst_text(arpa_to_fst(arpa_text, syms), path)
    with open(path + ".syms", "w") as f:
        for s, i in syms.items():
            f.write(f"{s} {i}\n")
    rec = _build_lm("interpret", path)
    assert rec._beam_search._loop_kernel_mode() is None, \
        "LM configs must route to the XLA path"
    inputs, mask = _batch()
    out = rec.beam_search(inputs, mask, as_arrays=True, char_discount=0.1)
    assert out["done_valid"].any()


def test_shipped_config_library_routing():
    """Every shipped experiment config's net section must CLASSIFY
    through the loop-kernel routing without crashing, and the known
    kernel-eligible families must actually route to the kernel
    (regression net for the variant-coverage work: a config silently
    dropping to the XLA path is a 25%+ perf cliff)."""
    from attention_lvcsr_tpu.search.beam import BeamSearch

    from config_probe import build_net_from_config, shipped_config_paths

    paths = shipped_config_paths()
    assert len(paths) >= 20
    routed = {}
    for path in paths:
        net = build_net_from_config(path, use_pallas="interpret")
        if net is None:
            continue

        class _Rec:
            pass

        rec = _Rec()
        rec.net = net
        rec.num_phonemes = 32
        bs = BeamSearch(rec, 10)
        routed[os.path.basename(path)] = bs._loop_kernel_mode(
            num_frames=800)
    must_route = ["wsj_paper.yaml", "wsj_paper7.yaml",
                  "wsj_mean_maxout.yaml", "wsj_pyramide.yaml",
                  "nips_baseline.yaml", "wsj_jan_wsj13v2.yaml",
                  "wsj_reward.yaml"]
    for name in must_route:
        if name in routed:
            assert routed[name] == "interpret", \
                f"{name} fell off the loop kernel: {routed[name]}"
    assert sum(1 for v in routed.values() if v == "interpret") >= 15


def test_loop_kernel_bf16_close_to_f32():
    """compute_dtype=bfloat16 through the LOOP KERNEL (bf16 contexts +
    tables in HBM, f32 in-register math): runs, and the top hypothesis
    matches the f32 kernel decode with close costs."""
    inputs, mask = _batch()
    rec = _build("interpret", fresh=True)
    rec.init_beam_search(3, compute_dtype=None)
    out32 = rec.beam_search(inputs, mask, as_arrays=True,
                            char_discount=0.1)
    rec.init_beam_search(3, compute_dtype="bfloat16")
    assert rec._beam_search._loop_kernel_mode() == "interpret"
    out16 = rec.beam_search(inputs, mask, as_arrays=True,
                            char_discount=0.1)
    for u in range(2):
        order32 = np.argsort(out32["done_adjusted"][u])
        order16 = np.argsort(out16["done_adjusted"][u])
        b32, b16 = order32[0], order16[0]
        assert out32["done_valid"][u, b32] and out16["done_valid"][u, b16]
        n = out32["done_len"][u, b32]
        assert out16["done_len"][u, b16] == n
        np.testing.assert_array_equal(out16["done_out"][u, b16, :n],
                                      out32["done_out"][u, b32, :n])
        assert abs(out16["done_cost"][u, b16]
                   - out32["done_cost"][u, b32]) < 0.15
