"""FST subsystem tests: host semantics, ARPA construction, dense packing,
device LM parity, and shallow-fusion decoding."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from attention_lvcsr_tpu.ops.fst import (Fst, NOT_STATE, arpa_to_fst,
                                         combine_weights, dict_char_lm_fst,
                                         host_costs, pack_fst, read_arpa,
                                         read_fst_text, read_symbols,
                                         write_fst_text)

LN10 = math.log(10.0)


def _simple_fst():
    """0 -a-> 1 -b-> 2(final); 0 -eps(0.5)-> 3 -b-> 2; 1 -a(1.0)-> 1."""
    f = Fst(start=0)
    f.add_arc(0, 1, 1, 0.1, 1)    # a
    f.add_arc(0, 0, 0, 0.5, 3)    # eps
    f.add_arc(1, 2, 2, 0.2, 2)    # b
    f.add_arc(1, 1, 1, 1.0, 1)    # a self-loop
    f.add_arc(3, 2, 2, 0.3, 2)    # b
    f.set_final(2, 0.0)
    return f


def test_combine_weights():
    # -log(e^-1 + e^-2)
    assert_allclose(combine_weights([1.0, 2.0]),
                    -math.log(math.exp(-1) + math.exp(-2)), rtol=1e-12)
    assert combine_weights([]) > 1e29


def test_transition_and_expand():
    f = _simple_fst()
    states = f.expand({0: 0.0})
    assert set(states) == {0, 3}
    assert_allclose(states[3], 0.5)
    after_a = f.transition(states, 1)
    assert set(after_a) == {1}
    assert_allclose(after_a[1], 0.1)
    after_b = f.transition(f.expand(after_a), 2)
    assert set(after_b) == {2}
    assert_allclose(after_b[2], 0.1 + 0.2)


def test_explain():
    f = _simple_fst()
    # two b-paths: a b (0.3) does not use eps; eps b = 0.8 for "b" alone
    assert_allclose(f.explain([1, 2]), 0.3, rtol=1e-6)
    assert_allclose(f.explain([2]), 0.8, rtol=1e-6)


def test_text_roundtrip(tmp_path):
    f = _simple_fst()
    path = str(tmp_path / "x.fst.txt")
    write_fst_text(f, path)
    g = read_fst_text(path)
    assert g.start == 0
    assert_allclose(g.explain([1, 2]), f.explain([1, 2]))
    assert g.finals == f.finals


ARPA = """
\\data\\
ngram 1=4
ngram 2=3

\\1-grams:
-0.5  <s>  -0.30103
-0.60206  a  -0.30103
-0.9  b  -0.2
-0.7  </s>

\\2-grams:
-0.30103  <s> a
-0.1  a b
-0.2  b </s>

\\end\\
""".strip().splitlines()


def test_read_arpa():
    arpa = read_arpa(ARPA)
    assert arpa[1][("a",)] == (-0.60206, -0.30103)
    assert arpa[2][("a", "b")] == (-0.1, 0.0)


def test_arpa_to_fst_scores():
    syms = {"<eps>": 0, "a": 1, "b": 2}
    fst = arpa_to_fst(ARPA, syms)
    # Viterbi path = P(a|<s>) * P(b|a) * P(</s>|b)
    expected = -(-0.30103 - 0.1 - 0.2) * LN10
    assert_allclose(fst.explain([1, 2], tropical=True), expected, rtol=1e-5)
    # backoff path: P(a|<s>) P(a|a)=bo(a)*P(a) P(b|a) P(</s>|b)
    expected2 = -(-0.30103 + (-0.30103 - 0.60206) - 0.1 - 0.2) * LN10
    assert_allclose(fst.explain([1, 1, 2], tropical=True), expected2,
                    rtol=1e-5)
    # log semiring sums over all (incl. backoff) paths: never worse than
    # the best path, and close to it for a peaked model
    assert fst.explain([1, 2]) <= expected + 1e-9


def test_dict_char_lm():
    syms = {"<eps>": 0, "<spc>": 1, "c": 2, "a": 3, "t": 4, "r": 5}
    fst = dict_char_lm_fst(["cat", "car", "a"], syms)
    spell = lambda w: [syms[ch] for ch in w]
    assert fst.explain(spell("cat")) < 1e29
    assert fst.explain(spell("car")) < 1e29
    assert fst.explain(spell("ca")) > 1e29          # not a word
    # space chains words
    assert fst.explain(spell("cat") + [1] + spell("a")) < 1e29


def _random_walk_parity(fst, num_symbols, remap, steps, seed,
                        packer=pack_fst):
    """Device one_step vs host transition+expand on a random symbol walk."""
    from attention_lvcsr_tpu.models.lm import (FSTLanguageModel,
                                               register_packed_fst)
    packed = packer(fst, remap, num_symbols, no_transition_cost=25.0)
    key = f"test{seed}-{packer.__name__}"
    register_packed_fst(key, packed)
    lm = FSTLanguageModel(fst_key=key, num_symbols=num_symbols,
                          max_states=packed.max_states,
                          max_arcs=packed.next_state.shape[-1],
                          no_transition_cost=25.0)
    variables = lm.init(jax.random.PRNGKey(0), 1,
                        method=lm.initial_states)
    carry = lm.apply(variables, 1, method=lm.initial_states)

    host_states = fst.expand({fst.start: 0.0})
    rng = np.random.RandomState(seed)
    for step in range(steps):
        # compare 'add' vectors
        expected = host_costs(fst, remap, num_symbols, host_states, 25.0)
        got = np.asarray(carry["add"])[0]
        assert_allclose(got, expected, rtol=1e-4, atol=1e-4), step
        # compare state sets
        dev_states = np.asarray(carry["states"])[0]
        dev_weights = np.asarray(carry["weights"])[0]
        dev = {int(s): float(w) for s, w in zip(dev_states, dev_weights)
               if s != NOT_STATE}
        assert set(dev) == set(host_states)
        for s in host_states:
            assert_allclose(dev[s], host_states[s], rtol=1e-4, atol=1e-4)
        sym = rng.randint(0, num_symbols)
        carry = lm.apply(variables, carry, jnp.asarray([sym]),
                         method=lm.one_step)
        host_states = fst.expand(
            fst.transition(host_states, remap.get(sym, -99)))


def test_device_lm_parity_simple():
    fst = _simple_fst()
    remap = {0: 1, 1: 2}  # nn symbol 0 -> 'a'(1), 1 -> 'b'(2)
    _random_walk_parity(fst, 2, remap, steps=4, seed=0)


def test_device_lm_parity_arpa():
    syms = {"<eps>": 0, "a": 1, "b": 2}
    fst = arpa_to_fst(ARPA, syms)
    remap = {0: 1, 1: 2}
    _random_walk_parity(fst, 2, remap, steps=6, seed=1)


def test_device_lm_parity_csr():
    """The CSR lookup path (load-densified runtime: small graphs fit
    the HBM densify budget) matches host semantics too."""
    from attention_lvcsr_tpu.ops.fst import pack_fst_csr
    syms = {"<eps>": 0, "a": 1, "b": 2}
    fst = arpa_to_fst(ARPA, syms)
    remap = {0: 1, 1: 2}
    _random_walk_parity(fst, 2, remap, steps=6, seed=2,
                        packer=pack_fst_csr)
    _random_walk_parity(_simple_fst(), 2, {0: 1, 1: 2}, steps=4, seed=3,
                        packer=pack_fst_csr)


def test_device_lm_parity_csr_windowed(monkeypatch):
    """The beyond-densify-budget CSR runtime (windowed row gathers +
    one-hot reduction) matches host semantics: force it by zeroing the
    densify budget."""
    from attention_lvcsr_tpu.ops.fst import pack_fst_csr
    monkeypatch.setenv("LVSR_LM_DENSIFY_BUDGET", "0")
    syms = {"<eps>": 0, "a": 1, "b": 2}
    fst = arpa_to_fst(ARPA, syms)
    remap = {0: 1, 1: 2}
    _random_walk_parity(fst, 2, remap, steps=6, seed=4,
                        packer=pack_fst_csr)
    _random_walk_parity(_simple_fst(), 2, {0: 1, 1: 2}, steps=4, seed=5,
                        packer=pack_fst_csr)


def test_csr_matches_dense_tables():
    """CSR rows are exactly the dense tables' non-empty cells."""
    from attention_lvcsr_tpu.ops.fst import INF_COST, pack_fst_csr
    syms = {"<eps>": 0, "a": 1, "b": 2}
    fst = arpa_to_fst(ARPA, syms)
    remap = {0: 1, 1: 2}
    V = 2
    dense = pack_fst(fst, remap, V, no_transition_cost=25.0)
    csr = pack_fst_csr(fst, remap, V, no_transition_cost=25.0)
    assert csr.next_state.shape[-1] == dense.next_state.shape[-1]
    present = {(s, v) for s in range(dense.total_weight.shape[0])
               for v in range(V) if dense.total_weight[s, v] < INF_COST}
    assert {(int(k) // V, int(k) % V) for k in csr.keys} == present
    for i, k in enumerate(csr.keys):
        s, v = int(k) // V, int(k) % V
        assert_allclose(csr.total_weight[i], dense.total_weight[s, v])
        np.testing.assert_array_equal(csr.next_state[i],
                                      dense.next_state[s, v])
        assert_allclose(csr.next_weight[i], dense.next_weight[s, v])
    np.testing.assert_array_equal(csr.start_states, dense.start_states)


def test_all_closures_matches_expand():
    from attention_lvcsr_tpu.ops.fst import all_closures
    syms = {"<eps>": 0, "a": 1, "b": 2}
    for fst in (_simple_fst(), arpa_to_fst(ARPA, syms)):
        closures = all_closures(fst)
        for s in range(fst.num_states):
            ref = fst.expand({s: 0.0})
            assert set(closures[s]) == set(ref)
            for t, w in ref.items():
                assert_allclose(closures[s][t], w, rtol=1e-10, atol=1e-12)


@pytest.mark.slow
def test_lm_only_decoding_follows_the_lm(tmp_path):
    """With am_beta=0 and lm weight 1, the decode must reproduce exactly
    the single string a strict chain LM accepts — a full end-to-end
    semantic check of the fusion path."""
    from attention_lvcsr_tpu.models.recognizer import SpeechRecognizer
    syms = {"<eps>": 0, "a": 1, "b": 2, "c": 3, "d": 4, "<eol>": 5}
    chain = Fst(start=0)
    for i, ch in enumerate(["a", "b", "c", "<eol>"]):
        chain.add_arc(i, syms[ch], syms[ch], 0.0, i + 1)
    chain.set_final(4, 0.0)
    chain.isyms = dict(syms)
    lm_path = str(tmp_path / "chain.fst.txt")
    write_fst_text(chain, lm_path)
    with open(lm_path + ".syms", "w") as f:
        for s, i in syms.items():
            f.write(f"{s} {i}\n")

    net_config = dict(
        input_dims={"recordings": 6}, input_num_chars={},
        eos_label=4, num_phonemes=5, dim_dec=8, dims_bidir=[6],
        enc_transition="gru", dec_transition="gru",
        attention_type="content", use_states_for_readout=False,
        criterion={"name": "log_likelihood"},
        bottom={"bottom_class": "speech"}, subsample=[1],
        post_merge_dims=[8], max_decoded_length_scale=1.0,
        data_prepend_eos=False,
        character_map={"a": 0, "b": 1, "c": 2, "d": 3, "<eol>": 4},
        lm={"path": lm_path, "weight": 1.0, "am_beta": 0.0,
            "normalize_am_weights": False, "normalize_tot_weights": False,
            "no_transition_cost": 30.0},
    )
    rec = SpeechRecognizer(net_config, init_config={
        "/recognizer": {"weights_init": ["isotropic_gaussian", 0.5],
                        "biases_init": ["constant", 0.0]}}, seed=2)
    rec.init_beam_search(2)
    utt = np.random.RandomState(0).randn(8, 6).astype("float32")
    outputs, costs = rec.beam_search(utt)
    # nn ids: a=0 b=1 c=2 <eol>=4
    assert outputs[0] == [0, 1, 2, 4]


def test_shallow_fusion_decoding(tmp_path):
    """A recognizer with an FST LM decodes; LM shifts the scores."""
    from attention_lvcsr_tpu.models.recognizer import SpeechRecognizer
    syms = {"<eps>": 0, "a": 1, "b": 2, "c": 3, "d": 4, "<eol>": 5}
    # bigram-ish LM over the toy alphabet via ARPA
    arpa = """
\\data\\
ngram 1=6

\\1-grams:
-0.3  a
-0.4  b
-0.9  c
-1.2  d
-0.8  <eol>
-0.5  </s>

\\end\\
""".strip().splitlines()
    fst = arpa_to_fst(arpa, syms)
    lm_path = str(tmp_path / "g.fst.txt")
    write_fst_text(fst, lm_path)
    with open(lm_path + ".syms", "w") as f:
        for s, i in syms.items():
            f.write(f"{s} {i}\n")

    net_config = dict(
        input_dims={"recordings": 6}, input_num_chars={},
        eos_label=4, num_phonemes=5, dim_dec=8, dims_bidir=[6],
        enc_transition="gru", dec_transition="gru",
        attention_type="content", use_states_for_readout=False,
        criterion={"name": "log_likelihood"},
        bottom={"bottom_class": "speech"}, subsample=[1],
        post_merge_dims=[8], max_decoded_length_scale=1.0,
        data_prepend_eos=False,
        character_map={"a": 0, "b": 1, "c": 2, "d": 3, "<eol>": 4},
        lm={"path": lm_path, "weight": 0.5, "normalize_am_weights": True,
            "no_transition_cost": 20.0},
    )
    rec = SpeechRecognizer(net_config, init_config={
        "/recognizer": {"weights_init": ["isotropic_gaussian", 0.5],
                        "biases_init": ["constant", 0.0]}}, seed=11)
    assert "fst" in rec.params
    p = rec.params["params"]["generator"]["readout"]["post_merge_0"]
    p["bias"] = p["bias"].at[4].add(2.0)

    rng = np.random.RandomState(5)
    utt = rng.randn(10, 6).astype("float32")
    rec.init_beam_search(3)
    outputs, costs = rec.beam_search(utt)
    assert outputs and outputs[0][-1] == 4
    assert np.isfinite(costs[0])

    # same net without LM ranks/scores differently
    net2 = dict(net_config, lm={})
    rec2 = SpeechRecognizer(net2, init_config={
        "/recognizer": {"weights_init": ["isotropic_gaussian", 0.5],
                        "biases_init": ["constant", 0.0]}}, seed=11)
    p2 = rec2.params["params"]["generator"]["readout"]["post_merge_0"]
    p2["bias"] = p2["bias"].at[4].add(2.0)
    rec2.init_beam_search(3)
    outputs2, costs2 = rec2.beam_search(utt)
    assert not np.allclose(costs[0], costs2[0])
