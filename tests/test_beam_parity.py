"""Golden beam-search parity vs a faithful replay of the reference loop.

The oracle below re-implements ``blocks/search.py:244-399`` line for line
in numpy (initial dummy output row, ``char_discount * len(costs)`` ranking
where ``len(costs)`` counts the initial row, patience-30 and
optimistic-future-cost stopping checked at the TOP of each iteration,
EOS retirement with the ``round_to_inf`` filter, ``_smallest``
candidate selection).  Both the oracle and the device beam search are
driven by the same scripted per-(step, previous-symbol) cost table, so
every stopping/discount decision is compared on identical numbers.

Two deliberate deviations from the literal reference are documented here:

* in ``optimistic_future_cost`` mode the reference indexes ``done`` in
  insertion order (``search.py:325``) although its own comment says the
  list is "sorted by the cost with char discount subtracted" — it is only
  sorted in the patience branch.  The oracle (and the device search)
  implement the intended semantics: the K-th BEST finished hypothesis.
* with ``ignore_first_eol`` the reference still inserts a first-step EOS
  into the done set (``search.py:363-371`` runs unconditionally) while
  masking it from retirement; the device search ignores it entirely
  (a first-step EOS is a BOS artifact, not a solution).
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from attention_lvcsr_tpu.search.beam import BeamSearch, DecodeConstraint

V = 5
EOL = 4


# ---------------------------------------------------------------------------
# scripted "model": cost of symbol v at step t given previous symbol p
# ---------------------------------------------------------------------------

class _ScriptedNet:
    def __init__(self, table):
        self.table = jnp.asarray(table)        # (S, V, V) float32

    def apply(self, params, *args, method=None, **kwargs):
        return method(*args, **kwargs)

    def decode_contexts(self, inputs, inputs_mask):
        return {}

    def decode_init(self, n, contexts):
        return {"glimpses": {"weights": jnp.zeros((n, 1))},
                "step": jnp.zeros((n,), jnp.int32),
                "prev": jnp.zeros((n,), jnp.int32)}

    def decode_score(self, carry, contexts, beam=None):
        t = jnp.minimum(carry["step"], self.table.shape[0] - 1)
        return dict(carry["glimpses"]), self.table[t, carry["prev"]], None

    def decode_advance(self, carry, glimpses, symbols, contexts):
        return {"glimpses": dict(glimpses),
                "step": carry["step"] + 1,
                "prev": symbols.astype(jnp.int32)}


@dataclasses.dataclass
class _ScriptedRecognizer:
    net: _ScriptedNet
    num_phonemes: int = V


def _device_search(table, K, max_length, **kwargs):
    rec = _ScriptedRecognizer(_ScriptedNet(table))
    bs = BeamSearch(rec, K)
    out = bs.search({}, np.zeros((1, max_length, 1), np.float32),
                    np.ones((1, max_length), np.float32), EOL, max_length,
                    as_arrays=True, **kwargs)
    hyps = []
    for k in range(K):
        if out["done_valid"][0, k]:
            n = out["done_len"][0, k]
            hyps.append((tuple(int(x) for x in out["done_out"][0, k, :n]),
                         float(out["done_cost"][0, k]),
                         float(out["done_adjusted"][0, k])))
    hyps.sort(key=lambda h: h[2])
    return hyps


# ---------------------------------------------------------------------------
# the oracle: blocks/search.py replayed in numpy
# ---------------------------------------------------------------------------

def _smallest(matrix, k):
    """blocks/search.py:220-242."""
    flat = matrix.flatten()
    if flat.shape[0] > k:
        args = np.argpartition(flat, k)[:k]
    else:
        args = np.arange(flat.shape[0])
    args = args[np.argsort(flat[args])]
    return np.unravel_index(args, matrix.shape), flat[args]


def _reference_search(table, K, max_length, char_discount=0.0,
                      round_to_inf=1e9, stop_on="patience"):
    table = np.asarray(table, np.float32)
    S = table.shape[0]
    states = np.zeros((1,), np.int64)            # previous symbols, beam=1
    all_outputs = np.zeros((1, 1), np.int64)     # initial dummy row
    all_costs = np.zeros((1, 1), np.float32)
    done = []                                    # (outputs_col, costs_col)
    min_cost, patience = 1000.0, 30

    def key(entry):
        # cost[-1] - char_discount * len(costs); len includes the initial
        # row (search.py:307,310) => emitted_length + 1
        return entry[1][-1] - char_discount * len(entry[1])

    for i in range(max_length):
        if states.size == 0:
            break
        if stop_on == "patience":
            done = sorted(done, key=key)[:K]
            if done:
                best = key(done[0])
                if best < min_cost:
                    min_cost, patience = best, 30
                else:
                    patience -= 1
                    if patience == 0:
                        break
        else:  # optimistic_future_cost (intended semantics: sorted done)
            if len(done) >= K:
                done_sorted = sorted(done, key=key)
                optimistic = (all_costs[-1].min()
                              - char_discount * max_length)
                if key(done_sorted[K - 1]) < optimistic:
                    break
        logprobs = table[min(i, S - 1)][states]          # (alive, V)
        next_costs = (all_costs[-1][:, None] + logprobs).astype(np.float32)
        (rows, cols), chosen = _smallest(next_costs, K)
        all_outputs = np.vstack([all_outputs[:, rows], cols[None]])
        all_costs = np.vstack([all_costs[:, rows], chosen[None]])
        states = cols
        mask = cols != EOL
        for idx in np.where((cols == EOL) &
                            (all_costs[-1] - all_costs[-2]
                             < round_to_inf))[0]:
            done.append((all_outputs[:, idx].copy(),
                         all_costs[:, idx].copy()))
        keep = np.where(mask)[0]
        states = states[keep]
        all_outputs = all_outputs[:, keep]
        all_costs = all_costs[:, keep]

    done = sorted(done, key=key)[:K]
    # strip the initial dummy row (search.py:392-394)
    return [(tuple(int(x) for x in o[1:]), float(c[-1]), float(key((o, c))))
            for o, c in done]


def _table(seed, steps=12, eol_bias=0.0):
    rng = np.random.RandomState(seed)
    t = rng.uniform(0.2, 3.0, size=(steps, V, V)).astype(np.float32)
    t[..., EOL] -= eol_bias
    return t


# ---------------------------------------------------------------------------
# parity tests
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("char_discount", [0.0, 0.5])
def test_patience_parity(seed, char_discount):
    table = _table(seed, eol_bias=0.8)
    ref = _reference_search(table, 4, 12, char_discount=char_discount)
    dev = _device_search(table, 4, 12, char_discount=char_discount)
    assert [h[0] for h in dev] == [h[0] for h in ref]
    np.testing.assert_allclose([h[1] for h in dev], [h[1] for h in ref],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose([h[2] for h in dev], [h[2] for h in ref],
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_optimistic_future_cost_parity(seed):
    table = _table(seed, eol_bias=1.2)
    kwargs = dict(char_discount=0.3, stop_on="optimistic_future_cost")
    ref = _reference_search(table, 3, 12, **kwargs)
    dev = _device_search(table, 3, 12, **kwargs)
    assert [h[0] for h in dev] == [h[0] for h in ref]
    np.testing.assert_allclose([h[2] for h in dev], [h[2] for h in ref],
                               rtol=1e-5, atol=1e-5)


def test_round_to_inf_parity():
    """An EOS whose step cost exceeds round_to_inf retires the hypothesis
    without entering the done set — on both sides."""
    table = _table(7, eol_bias=-1.5)      # EOS costs all exceed 1.5...
    table[5, :, EOL] = 0.1                # ...except at step 5
    ref = _reference_search(table, 4, 10, round_to_inf=1.5)
    dev = _device_search(table, 4, 10, round_to_inf=1.5)
    assert ref, "oracle should still finish via the cheap step-5 EOS"
    assert [h[0] for h in dev] == [h[0] for h in ref]
    # every surviving hypothesis ends with the cheap EOS
    assert all(len(h[0]) == 6 for h in dev)


def test_patience_stop_is_before_expansion():
    """Patience hits zero at iteration i => candidates from iteration i's
    expansion must NOT enter the done set (the reference breaks before
    expanding, search.py:311-317)."""
    steps = 40
    table = np.full((steps, V, V), 2.0, np.float32)
    table[..., EOL] = 3.0
    table[0, :, 0] = 0.5
    table[0, :, EOL] = 1.0    # one early finish seeds the done set
    # much later, a very cheap EOS appears — but patience (30) runs out
    # at iteration 31 before it can be reaped at iteration 35
    table[35, :, EOL] = 0.01
    ref = _reference_search(table, 2, steps)
    dev = _device_search(table, 2, steps)
    assert [h[0] for h in dev] == [h[0] for h in ref]
    assert all(len(h[0]) == 1 for h in dev)   # only the step-0 finish


# ---------------------------------------------------------------------------
# dictionary-constrained decoding (validate_solution_function role)
# ---------------------------------------------------------------------------

CHAR_MAP = {"a": 0, "b": 1, "<spc>": 2, "c": 3}   # EOL = 4


def test_constraint_masks_out_of_dictionary():
    """Unconstrained decode emits an out-of-dictionary string; the same
    table with a trie constraint returns only dictionary words."""
    steps = 6
    table = np.full((steps, V, V), 3.0, np.float32)
    # the model loves "c c <eol>" (out-of-dictionary)
    table[0, :, 3] = 0.1
    table[1, 3, 3] = 0.1
    table[2, 3, EOL] = 0.1
    # "a b <eol>" is a bit worse
    table[0, :, 0] = 0.3
    table[1, 0, 1] = 0.3
    table[2, 1, EOL] = 0.3
    free = _device_search(table, 3, steps)
    assert free[0][0] == (3, 3, EOL)

    constraint = DecodeConstraint.from_words(["ab", "c"], CHAR_MAP, V)
    constrained = _device_search(table, 3, steps,
                                 validate_solution_function=constraint)
    assert constrained, "constrained search must still find a solution"
    assert constrained[0][0] == (0, 1, EOL)       # "ab"
    # every returned hypothesis is dictionary-valid
    for hyp, _, _ in constrained:
        assert hyp != (3, 3, EOL)


def test_constraint_eos_only_in_final_states():
    """EOS mid-word is forbidden: 'a' alone is not a dictionary word, so
    no hypothesis may stop after just 'a' when the dictionary is {ab}."""
    steps = 6
    table = np.full((steps, V, V), 2.0, np.float32)
    table[0, :, 0] = 0.1      # 'a' first
    table[1, 0, EOL] = 0.1    # then the model wants to stop
    table[1, 0, 1] = 0.5      # 'b' continues the word
    table[2, 1, EOL] = 0.2
    constraint = DecodeConstraint.from_words(["ab"], CHAR_MAP, V)
    out = _device_search(table, 2, steps,
                         validate_solution_function=constraint)
    assert out
    assert out[0][0] == (0, 1, EOL)
    assert all(h[0] != (0, EOL) for h in out)


def test_host_callable_post_filter():
    """A plain Python validate_solution_function filters the kept set."""
    table = _table(11, eol_bias=1.0)
    free = _device_search(table, 4, 10)
    assert len(free) >= 2
    banned = free[0][0]

    def validate(utt_inputs, symbols):
        return tuple(symbols) != banned

    filtered = _device_search(table, 4, 10,
                              validate_solution_function=validate)
    assert all(h[0] != banned for h in filtered)
    assert filtered and filtered[0][0] == free[1][0]


def test_host_filter_runs_at_insertion_time():
    """K invalid candidates finishing early must not crowd a later valid
    one out of the K done slots (reference blocks/search.py:365-371
    filters every finishing candidate BEFORE insertion; a post-hoc filter
    over the kept K would return nothing here)."""
    steps, K = 8, 2
    table = np.full((steps, V, V), 9.0, np.float32)
    table[0, :, 0] = 0.1            # (0,)       and
    table[0, :, 1] = 0.5            # (1,)       seed the beam
    table[1, 0, EOL] = 0.1          # (0, EOL)         cost 0.2   too short
    table[1, 1, 3] = 0.2            # (1, 3)
    table[2, 3, 3] = 0.3            # (1, 3, 3)
    table[2, 3, EOL] = 0.35         # (1, 3, EOL)      cost 1.05  too short
    table[3, 3, EOL] = 0.1          # (1, 3, 3, EOL)   cost 1.1   valid

    free = _device_search(table, K, steps)
    # both done slots go to too-short strings: the valid one is crowded out
    assert [h[0] for h in free][:2] == [(0, EOL), (1, 3, EOL)]

    def validate(utt_inputs, symbols):
        return len(symbols) > 3     # demands >= 3 symbols before the EOL

    filtered = _device_search(table, K, steps,
                              validate_solution_function=validate)
    assert filtered and filtered[0][0] == (1, 3, 3, EOL)
