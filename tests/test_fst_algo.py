"""FST construction algorithms: compose/determinize/minimize/push parity.

Oracle: ``fst_algo.path_cost`` (host DP over all paths).  Each
construction step must preserve the weighted language; determinization
must additionally yield an (ext-)deterministic machine — the properties
the reference gets from OpenFST/Kaldi binaries in bin/lm2fst.sh:43-139.
"""
import math

import jax
import numpy as np
import pytest

from attention_lvcsr_tpu.ops import fst as F
from attention_lvcsr_tpu.ops import fst_algo as FA
from attention_lvcsr_tpu.ops.lm_graph import (build_decoding_graph,
                                              build_eol_adapter,
                                              build_lexicon,
                                              build_symbol_tables,
                                              filter_arpa)

TOY_ARPA = """\\data\\
ngram 1=6
ngram 2=4

\\1-grams:
-1 <UNK> -0.2
-0.8 THE -0.3
-1.0 CAT -0.4
-1.2 SAT -0.2
-99 <s> -0.5
-0.9 </s>

\\2-grams:
-0.3 <s> THE
-0.5 THE CAT
-0.7 CAT SAT
-0.4 SAT </s>

\\end\\
""".split("\n")

NET_CHARS = {"<spc>": 0, "<noise>": 1, "<eol>": 2,
             "A": 3, "C": 4, "E": 5, "H": 6, "S": 7, "T": 8}


def _tiny_transducer():
    """Small nondeterministic transducer with epsilons."""
    f = F.Fst()
    f.start = 0
    f.add_arc(0, 1, 10, 0.5, 1)
    f.add_arc(0, 1, 11, 0.7, 2)
    f.add_arc(1, 2, 12, 0.1, 3)
    f.add_arc(2, 2, 12, 0.2, 3)
    f.add_arc(2, 0, 13, 0.3, 3)   # eps input, emits 13
    f.add_arc(3, 3, 0, 0.4, 4)    # emits eps
    f.set_final(3, 0.1)
    f.set_final(4, 0.0)
    return f


def _is_ext_deterministic(fst):
    for s, arcs in fst.arcs.items():
        seen = set()
        eps = 0
        for a in arcs:
            if a.ilabel == F.EPSILON:
                eps += 1
                continue
            if a.ilabel in seen:
                return False
            seen.add(a.ilabel)
        if eps > 1:
            return False
    return True


SAMPLE_STRINGS = [[], [1], [2], [1, 2], [1, 2, 3], [1, 3], [2, 2],
                  [1, 2, 2], [3], [1, 1], [1, 2, 3, 3]]


def _check_equivalent(a, b, tropical=True, ignore=()):
    for s in SAMPLE_STRINGS:
        ca = FA.path_cost(a, s, tropical=tropical, ignore_labels=ignore)
        cb = FA.path_cost(b, s, tropical=tropical, ignore_labels=ignore)
        if ca >= F.INF_COST / 2 and cb >= F.INF_COST / 2:
            continue
        assert ca == pytest.approx(cb, abs=1e-6), \
            f"cost mismatch on {s}: {ca} vs {cb}"


# ---------------------------------------------------------------------------
def test_connect_trims_dead_states():
    f = F.Fst()
    f.start = 0
    f.add_arc(0, 1, 1, 0.0, 1)
    f.add_arc(0, 2, 2, 0.0, 2)   # state 2 is a dead end
    f.add_arc(3, 1, 1, 0.0, 1)   # state 3 unreachable
    f.set_final(1, 0.0)
    g = FA.connect(f)
    assert g.num_states == 2
    _check_equivalent(f, g)


def test_compose_matches_manual_cascade():
    # a: maps 1 -> 10 (w .5); b: maps 10 -> 100 (w .25)
    a = F.Fst(); a.start = 0
    a.add_arc(0, 1, 10, 0.5, 1); a.set_final(1, 0.0)
    b = F.Fst(); b.start = 0
    b.add_arc(0, 10, 100, 0.25, 1); b.set_final(1, 0.125)
    c = FA.compose(a, b)
    assert FA.path_cost(c, [1]) == pytest.approx(0.875)
    assert [arc.olabel for arc in c.state_arcs(c.start)] == [100]


def test_compose_epsilon_filter_no_double_counting():
    # a emits an epsilon output; b has an epsilon input arc in parallel:
    # the filter must not create duplicate paths.
    a = F.Fst(); a.start = 0
    a.add_arc(0, 1, 0, 0.5, 1)       # 1:eps
    a.add_arc(1, 2, 10, 0.0, 2)
    a.set_final(2, 0.0)
    b = F.Fst(); b.start = 0
    b.add_arc(0, 0, 20, 0.25, 1)     # eps:20
    b.add_arc(1, 10, 30, 0.0, 2)
    b.add_arc(0, 10, 31, 1.0, 2)
    b.set_final(2, 0.0)
    c = FA.compose(a, b)
    # exactly two distinct accepting paths for input [1, 2]
    log_cost = FA.path_cost(c, [1, 2], tropical=False)
    expected = -np.logaddexp(-(0.75), -(1.5))
    assert log_cost == pytest.approx(expected, abs=1e-6)


def test_determinize_star_equivalence_and_determinism():
    f = _tiny_transducer()
    for use_log in (False, True):
        d = FA.determinize_star(f, use_log=use_log)
        # deterministic on (non-eps) input labels; eps-input chains
        # emitting residual output strings are allowed (as in Kaldi's
        # determinize-star output for non-functional corners)
        for s, arcs in d.arcs.items():
            labels = [a.ilabel for a in arcs if a.ilabel != F.EPSILON]
            assert len(labels) == len(set(labels))
        # tropical (best-path) semantics always preserved in tropical
        # mode; log mode preserves the log-sum over paths
        _check_equivalent(f, d, tropical=not use_log)


def test_determinize_star_merges_prefix_paths():
    # classic: two paths sharing a prefix must merge into one arc
    f = F.Fst(); f.start = 0
    f.add_arc(0, 1, 5, 1.0, 1)
    f.add_arc(0, 1, 5, 2.0, 2)
    f.add_arc(1, 2, 6, 0.0, 3)
    f.add_arc(2, 3, 7, 0.0, 3)
    f.set_final(3, 0.0)
    d = FA.determinize_star(f, use_log=False)
    first = [a for a in d.state_arcs(d.start)]
    assert len(first) == 1 and first[0].weight == pytest.approx(1.0)
    assert FA.path_cost(d, [1, 2]) == pytest.approx(1.0)
    assert FA.path_cost(d, [1, 3]) == pytest.approx(2.0)


def test_rm_epsilon_equivalence():
    f = F.Fst(); f.start = 0
    f.add_arc(0, 0, 0, 0.5, 1)     # eps:eps
    f.add_arc(1, 0, 0, 0.25, 2)    # eps:eps chain
    f.add_arc(0, 0, 0, 1.0, 2)     # parallel eps:eps
    f.add_arc(2, 1, 1, 0.0, 3)
    f.set_final(3, 0.0)
    f.set_final(1, 0.0)
    g = FA.rm_epsilon(f)
    assert all(not (a.ilabel == 0 and a.olabel == 0)
               for s in g.arcs for a in g.state_arcs(s))
    assert FA.path_cost(g, [1]) == pytest.approx(0.75)  # tropical best
    assert FA.path_cost(g, []) == pytest.approx(0.5)
    glog = FA.rm_epsilon(f, use_log=True)
    assert FA.path_cost(glog, [1], tropical=False) == pytest.approx(
        -np.logaddexp(-0.75, -1.0), abs=1e-6)


def test_minimize_encoded_reduces_and_preserves():
    # two structurally identical suffix branches must merge
    f = F.Fst(); f.start = 0
    f.add_arc(0, 1, 1, 0.5, 1)
    f.add_arc(0, 2, 2, 0.5, 2)
    f.add_arc(1, 3, 3, 0.25, 3)
    f.add_arc(2, 3, 3, 0.25, 4)
    f.set_final(3, 0.0)
    f.set_final(4, 0.0)
    m = FA.minimize_encoded(f)
    assert m.num_states < f.num_states
    _check_equivalent(f, m)


def test_push_weights_moves_mass_forward_and_preserves_costs():
    f = F.Fst(); f.start = 0
    f.add_arc(0, 1, 1, 0.0, 1)
    f.add_arc(1, 2, 2, 3.0, 2)
    f.add_arc(1, 3, 3, 5.0, 2)
    f.set_final(2, 1.0)
    p = FA.push_weights(f)
    _check_equivalent(f, p)
    # after pushing, every non-start state's best outgoing continuation
    # (arc or final) costs ~0
    for s in p.arcs:
        if s == p.start:
            continue
        best = min([a.weight for a in p.state_arcs(s)] +
                   ([p.finals[s]] if s in p.finals else []), default=None)
        if best is not None:
            assert best == pytest.approx(0.0, abs=1e-9)


def test_add_lex_disambig():
    entries = [("A", ("a",)), ("AB", ("a", "b")),   # prefix
               ("C", ("c",)), ("C2", ("c",))]       # homophones
    out, n = FA.add_lex_disambig(entries)
    assert out[0] == ("A", ("a", "#1"))
    assert out[1] == ("AB", ("a", "b"))
    assert out[2] == ("C", ("c", "#1"))
    assert out[3] == ("C2", ("c", "#2"))
    assert n == 2


def test_make_lexicon_fst_spells_words():
    chars = {"<eps>": 0, "a": 1, "b": 2, "<spc>": 3}
    words = {"<eps>": 0, "AB": 1, "A": 2}
    lex = FA.make_lexicon_fst(
        [("AB", ("a", "b", "<spc>")), ("A", ("a", "<spc>"))], chars, words)
    # input "a b <spc>" outputs word AB and returns to the loop state
    cost = FA.path_cost(lex, [1, 2, 3])
    assert cost == pytest.approx(0.0)
    assert FA.path_cost(lex, [1, 3]) == pytest.approx(0.0)
    assert FA.path_cost(lex, [2, 3]) >= F.INF_COST / 2


# ---------------------------------------------------------------------------
# the full pipeline on a toy trigram-style LM
# ---------------------------------------------------------------------------

def _word_seq_cost(words_syms, g, text):
    # tropical best path = the exact ARPA score (an n-gram backoff FST
    # also admits redundant backoff paths, so the log-semiring sum over
    # paths is slightly lower — a property of the reference graphs too)
    ids = [words_syms[w] for w in text.split()]
    return FA.path_cost(g, ids, tropical=True,
                        ignore_labels=[words_syms["#0"]])


def test_g_fst_matches_arpa_scores():
    arpa = filter_arpa(F.read_arpa(TOY_ARPA))
    chars, words = build_symbol_tables(arpa, NET_CHARS)
    g = FA.eps_to_disambig(F.arpa_to_fst(arpa, words), words["#0"])
    ln10 = math.log(10)
    # P(THE|<s>) P(CAT|THE) P(SAT|CAT) P(</s>|SAT), all exact bigrams
    expected = -(-0.3 - 0.5 - 0.7 - 0.4) * ln10
    assert _word_seq_cost(words, g, "THE CAT SAT") == \
        pytest.approx(expected, abs=1e-5)
    # backoff path: P(THE|<s>)=bigram, P(THE|THE)=backoff(THE)+uni(THE)
    expected2 = -(-0.3 + (-0.3 - 0.8) - 0.3 - 0.9) * ln10
    assert _word_seq_cost(words, g, "THE THE") == \
        pytest.approx(expected2, abs=1e-5)


def _chars_of(text):
    """network char ids of a spelled-out word sequence + <eol>."""
    ids = []
    for i, word in enumerate(text.split()):
        if i:
            ids.append(NET_CHARS["<spc>"])
        ids.extend(NET_CHARS[ch] for ch in word)
    ids.append(NET_CHARS["<eol>"])
    return ids


@pytest.fixture(scope="module")
def graph(tmp_path_factory):
    out = tmp_path_factory.mktemp("lm_graphs")
    # deterministic=True: these tests exercise the --deterministic
    # variant's contract (the pipeline default is the reference's
    # nondeterministic recipe, bin/lm2fst.sh)
    return build_decoding_graph(TOY_ARPA, NET_CHARS, deterministic=True,
                                out_dir=str(out)), out


def test_lg_no_eol_best_path_is_exact_arpa_score(graph):
    """Before the second (log) determinization, the graph's tropical
    best path reproduces the exact ARPA chain score."""
    result, _ = graph
    lg = result["LG_no_eol"]
    chars = result["chars"]
    nn_to_fst = {nn: chars[ch] for ch, nn in NET_CHARS.items()}
    ln10 = math.log(10)

    def char_cost(text):
        # LG_no_eol terminates words with <spc> (no <eol> adapter yet)
        labels = [nn_to_fst[i] for i in _chars_of(text)[:-1]]
        return FA.path_cost(lg, labels + [chars["<spc>"]], tropical=True)

    expected = -(-0.3 - 0.5 - 0.7 - 0.4) * ln10
    assert char_cost("THE CAT SAT") == pytest.approx(expected, abs=1e-4)
    expected2 = -(-0.3 + (-0.3 - 0.8) - 0.3 - 0.9) * ln10
    assert char_cost("THE THE") == pytest.approx(expected2, abs=1e-4)


def test_decoding_graph_end_to_end_costs(graph):
    """LG / LG_pushed parity: the second determinization runs in the log
    semiring (bin/lm2fst.sh:120 ``--use-log=true``), so the deterministic
    graph's unique path per string carries the log-sum over the parallel
    (backoff-detour) paths of ``adapter o LG_no_eol`` — the reference's
    graphs have the same property.  Pushing must not change any cost."""
    result, _ = graph
    chars = result["chars"]
    nn_to_fst = {nn: chars[ch] for ch, nn in NET_CHARS.items()}
    adapter = build_eol_adapter(result["chars_disambig"])
    oracle_fst = FA.compose(adapter, result["LG_no_eol"])
    ln10 = math.log(10)

    for text in ("THE CAT SAT", "THE THE", "CAT"):
        labels = [nn_to_fst[i] for i in _chars_of(text)]
        oracle = FA.path_cost(oracle_fst, labels, tropical=False)
        for key in ("LG", "LG_pushed"):
            got = FA.path_cost(result[key], labels, tropical=True)
            assert got == pytest.approx(oracle, abs=1e-4), (text, key)
    # and the graph score stays near the exact ARPA chain score
    labels = [nn_to_fst[i] for i in _chars_of("THE CAT SAT")]
    exact = -(-0.3 - 0.5 - 0.7 - 0.4) * ln10
    assert abs(FA.path_cost(result["LG_pushed"], labels, tropical=True)
               - exact) < 0.75


def test_decoding_graph_is_deterministic_and_pushed(graph):
    result, _ = graph
    lg = result["LG_pushed"]
    assert _is_ext_deterministic(result["LG"])
    # pushed: per non-start state the best continuation is ~0
    slack = []
    for s in lg.arcs:
        if s == lg.start:
            continue
        ws = [a.weight for a in lg.state_arcs(s)]
        if s in lg.finals:
            ws.append(lg.finals[s])
        if ws:
            slack.append(min(ws))
    assert max(slack) < 1e-6


def test_decoding_graph_artifacts_on_disk(graph):
    result, out = graph
    import os
    for name in ("chars.txt", "words.txt", "lexicon_disambig.txt",
                 "G.fst.txt", "L_disambig.fst.txt", "LG.fst.txt",
                 "LG_pushed.fst.txt", "LG_pushed.fst.txt.syms",
                 "LG_pushed_withsyms.fst.txt", "LG_pushed.npz"):
        assert os.path.exists(os.path.join(str(out), name)), name
    # reloadable by the text reader
    isyms = F.read_symbols(os.path.join(str(out),
                                        "LG_pushed.fst.txt.syms"))
    reloaded = F.read_fst_text(os.path.join(str(out),
                                            "LG_pushed.fst.txt"),
                               isyms=isyms)
    assert reloaded.num_states == result["LG_pushed"].num_states


def test_packed_tables_drive_device_lm(graph):
    """LG_pushed.npz feeds the on-device FSTLanguageModel end-to-end."""
    import jax.numpy as jnp
    from attention_lvcsr_tpu.models.lm import (FSTLanguageModel,
                                               register_packed_fst)
    result, _ = graph
    packed = result["packed"]
    key = "test_lg_pushed"
    register_packed_fst(key, packed)
    lm = FSTLanguageModel(fst_key=key,
                          num_symbols=packed.total_weight.shape[1],
                          max_states=packed.max_states,
                          max_arcs=packed.next_state.shape[-1],
                          no_transition_cost=1e12)
    variables = lm.init(jax.random.PRNGKey(0), 1,
                        method=lm.initial_states)

    def run(symbols):
        carry = lm.apply(variables, 1, method=lm.initial_states)
        total = 0.0
        for sym in symbols:
            total += float(carry["add"][0, sym])
            carry = lm.apply(variables, carry,
                             jnp.asarray([sym], jnp.int32),
                             method=lm.one_step)
        return total, carry

    ln10 = math.log(10)
    syms = _chars_of("THE CAT SAT")
    total, _ = run(syms)
    # the device runtime log-sums over live states, so its total equals
    # the host log-semiring oracle on the same graph...
    chars = result["chars"]
    nn_to_fst = {nn: chars[ch] for ch, nn in NET_CHARS.items()}
    labels = [nn_to_fst[i] for i in syms]
    oracle = FA.path_cost(result["LG_pushed"], labels, tropical=False)
    assert total == pytest.approx(oracle, abs=1e-3)
    # ...and stays close to the exact ARPA score (backoff-path slack)
    expected = -(-0.3 - 0.5 - 0.7 - 0.4) * ln10
    assert abs(total - expected) < 0.75
