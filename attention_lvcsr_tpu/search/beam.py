"""Fully batched on-device beam search.

Replaces the reference's host-side beam loop
(``blocks/search.py:244-399``: four small compiled functions + numpy
``argpartition`` bookkeeping, with a device round-trip per step per
hypothesis) with ONE ``lax.while_loop`` running entirely on device:
utterances x beam is a single batch dimension, candidate selection is
``lax.top_k`` over ``(K*V,)`` scores, and hypothesis storage is a static
``(U, K, L)`` ring of int32 in HBM.

Reference semantics preserved (same-named parameters):

* ``char_discount`` length bonus in hypothesis ranking,
* ``round_to_inf``: an EOS whose step-cost exceeds this retires the
  hypothesis without entering the done set,
* ``ignore_first_eol`` for BOS-as-EOS data (``recognizer.beam_search:531``),
* stopping criteria ``patience`` (30 steps without improving the best
  finished hypothesis) and ``optimistic_future_cost``,
* EOS retirement: finished hypotheses leave the beam (their slot cost is
  pinned to +inf, which is how a shrinking beam is expressed with static
  shapes),
* the first step expands a single initial state into K candidates (slot 0
  starts at cost 0, slots 1.. at +inf).

Tie-breaking is deterministic (lowest flat index wins, i.e. lower beam row
then lower symbol id); the reference's ``argpartition`` order is unstable,
so bit-identical tie order with the reference is not defined.

``validate_solution_function`` (dictionary-constrained decoding) is not
supported on-device yet; pass None.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

INF = 1e9
PATIENCE = 30


class CandidateNotFoundError(Exception):
    """No finished hypothesis was produced (blocks/search.py:15)."""


class BeamSearch:
    def __init__(self, recognizer, beam_size: int, compute_dtype=None):
        self.recognizer = recognizer
        self.net = recognizer.net
        self.beam_size = beam_size
        # 'bfloat16' halves the HBM traffic of the (bandwidth-bound)
        # decode; candidate ranking stays in float32 regardless.
        self.compute_dtype = compute_dtype
        self._jitted = {}

    # ------------------------------------------------------------------
    def search(self, params, inputs, inputs_mask, eol_symbol, max_length,
               ignore_first_eol=False, as_arrays=False, char_discount=0.0,
               round_to_inf=1e9, stop_on="patience",
               validate_solution_function=None):
        if validate_solution_function is not None:
            raise NotImplementedError(
                "validate_solution_function is not supported by the "
                "on-device beam search")
        key = (inputs.shape, stop_on, bool(ignore_first_eol))
        if key not in self._jitted:
            self._jitted[key] = jax.jit(functools.partial(
                self._search_core, stop_on=stop_on,
                ignore_first_eol=bool(ignore_first_eol)))
        out = self._jitted[key](
            params, jnp.asarray(inputs), jnp.asarray(inputs_mask),
            jnp.int32(eol_symbol), jnp.int32(max_length),
            jnp.float32(char_discount), jnp.float32(round_to_inf))
        out = {k: np.asarray(v) for k, v in out.items()}
        if as_arrays:
            return out
        return self._to_lists(out)

    @staticmethod
    def _to_lists(out):
        """Best-first outputs/costs for the first utterance (the reference
        API decodes one utterance at a time; batched callers use
        as_arrays=True)."""
        valid = out["done_valid"][0]
        if not valid.any():
            raise CandidateNotFoundError()
        order = np.argsort(out["done_adjusted"][0])
        order = [i for i in order if valid[i]]
        outputs = [list(out["done_out"][0, i, :out["done_len"][0, i]])
                   for i in order]
        costs = [float(out["done_cost"][0, i]) for i in order]
        return outputs, costs

    # ------------------------------------------------------------------
    def _search_core(self, params, inputs, inputs_mask, eol_symbol,
                     max_length, char_discount, round_to_inf, *,
                     stop_on="patience", ignore_first_eol=False):
        net, K = self.net, self.beam_size
        U = inputs.shape[0]
        L = inputs.shape[1]  # output buffer bound; max_length <= T frames
        V = self.recognizer.num_phonemes

        if self.compute_dtype is not None:
            dtype = jnp.dtype(self.compute_dtype)
            cast = (lambda a: a.astype(dtype)
                    if jnp.issubdtype(a.dtype, jnp.floating) else a)
            params = jax.tree.map(cast, params)
            inputs = inputs.astype(dtype)
            inputs_mask = inputs_mask.astype(dtype)

        # contexts stay per-utterance (U, ...); the score step broadcasts
        # over the beam axis instead of reading K copies of the attended.
        contexts = net.apply(params, inputs, inputs_mask,
                             method=net.decode_contexts)
        carry0 = net.apply(params, U * K, contexts,
                           method=net.decode_init)
        # the decode carry only needs the glimpses the attention consumes
        # (weights + step) plus the weighted averages the transition
        # consumes in the same step; output-only glimpses (energies) are
        # dropped to save per-step gathers (kernel count is the decode
        # loop's cost driver, not tensor sizes).
        carry0["glimpses"] = {
            k: v for k, v in carry0["glimpses"].items()
            if k in ("weights", "step", "weighted_averages")}

        # done-set scalars packed into one (U, K, 3) array
        # [cost, adjusted, length]; invalid entries have adjusted = INF.
        # fully-masked rows are batch padding: start them retired so the
        # early-stopping conditions see them as finished immediately
        row_dead = (inputs_mask.sum(axis=1) == 0)[:, None]       # (U, 1)
        state = {
            "carry": carry0,
            "alive_costs": jnp.where(
                row_dead | (jnp.arange(K)[None, :] != 0), INF, 0.0
            ) * jnp.ones((U, K)),
            "alive_out": jnp.zeros((U, K, L), jnp.int32),
            "done_out": jnp.zeros((U, K, L), jnp.int32),
            "done_meta": jnp.tile(
                jnp.asarray([INF, INF, 0.0])[None, None, :], (U, K, 1)),
            "i": jnp.int32(0),
            "patience": jnp.full((U,), PATIENCE, jnp.int32),
            "min_cost": jnp.full((U,), 1000.0),
            "stopped": jnp.zeros((U,), bool),
        }

        def beam_empty(s):
            return jnp.all(s["alive_costs"] >= INF, axis=1)

        def cond(s):
            return (s["i"] < max_length) & ~jnp.all(
                s["stopped"] | beam_empty(s))

        def body(s):
            i = s["i"]
            done_adjusted = s["done_meta"][:, :, 1]
            done_valid = done_adjusted < INF / 2
            # ---- stopping bookkeeping (reference search.py:306-332) ----
            has_done = done_valid.any(axis=1)
            best_adj = jnp.min(done_adjusted, axis=1)
            if stop_on == "patience":
                improved = best_adj < s["min_cost"]
                new_min = jnp.where(has_done & improved, best_adj,
                                    s["min_cost"])
                new_patience = jnp.where(
                    has_done,
                    jnp.where(improved, PATIENCE, s["patience"] - 1),
                    s["patience"])
                newly_stopped = new_patience <= 0
            else:  # optimistic_future_cost
                new_min, new_patience = s["min_cost"], s["patience"]
                kth_adj = jnp.max(
                    jnp.where(done_valid, done_adjusted, -INF), axis=1)
                alive_min = jnp.min(s["alive_costs"], axis=1)
                optimistic = alive_min - char_discount * \
                    max_length.astype(jnp.float32)
                newly_stopped = (done_valid.all(axis=1)
                                 & (kth_adj < optimistic))
            stopped = s["stopped"] | newly_stopped | beam_empty(s)

            # NOTE: stopped utterances are NOT frozen element-wise — their
            # retired beams (all costs INF) cannot produce new done-set
            # candidates (the prev_costs guard below), so their state
            # evolves harmlessly.  Eliding the per-leaf freeze removes a
            # dozen kernels from the loop body, which is what the step
            # time is made of.

            # ---- expand ------------------------------------------------
            g_new, costs_vec, _ = net.apply(params, s["carry"], contexts,
                                            method=net.decode_score,
                                            beam=K)
            # rank in f32 even when the model computes in bf16
            logprobs = costs_vec.astype(jnp.float32).reshape(U, K, V)
            next_costs = s["alive_costs"][:, :, None] + logprobs
            flat = next_costs.reshape(U, K * V)
            chosen_costs, flat_idx = jax.lax.top_k(-flat, K)
            chosen_costs = -chosen_costs                      # (U, K)
            beam_idx = flat_idx // V                          # (U, K)
            symbols = (flat_idx % V).astype(jnp.int32)        # (U, K)

            # ---- gather hypotheses by source beam row ------------------
            gidx = (jnp.arange(U)[:, None] * K + beam_idx).reshape(-1)
            carry = jax.tree.map(lambda x: x[gidx], s["carry"])
            g_new = {k: v for k, v in g_new.items()
                     if k in ("weights", "step", "weighted_averages")}
            g_sel = jax.tree.map(lambda x: x[gidx], g_new)
            alive_out = jnp.take_along_axis(
                s["alive_out"], beam_idx[:, :, None], axis=1)
            prev_costs = jnp.take_along_axis(s["alive_costs"], beam_idx,
                                             axis=1)

            # ---- record symbol (every alive row has length i+1) ---------
            alive_out = jax.lax.dynamic_update_index_in_dim(
                alive_out, symbols, jnp.minimum(i, L - 1), axis=2)
            alive_len = (i + 1).astype(jnp.float32)
            step_costs = chosen_costs - prev_costs

            # ---- advance decoder states --------------------------------
            carry = net.apply(params, carry, g_sel, symbols.reshape(-1),
                              contexts, method=net.decode_advance)
            carry["glimpses"] = {
                k: v for k, v in carry["glimpses"].items()
                if k in ("weights", "step", "weighted_averages")}

            # ---- EOS retirement ----------------------------------------
            is_eos = symbols == eol_symbol
            if ignore_first_eol:
                is_eos = is_eos & (i > 0)
            # prev_costs guard: rows already retired (INF) must not
            # re-finish with garbage costs
            finishing = (is_eos & (step_costs < round_to_inf)
                         & (prev_costs < INF / 2))
            adjusted = chosen_costs - char_discount * (alive_len + 1.0)

            # merge finishing hyps into the done set: 2K candidates -> K
            new_meta = jnp.stack(
                [chosen_costs, jnp.where(finishing, adjusted, INF),
                 jnp.broadcast_to(alive_len, (U, K))], axis=-1)
            cand_meta = jnp.concatenate([s["done_meta"], new_meta], axis=1)
            cand_out = jnp.concatenate([s["done_out"], alive_out], axis=1)
            _, keep = jax.lax.top_k(-cand_meta[:, :, 1], K)      # (U, K)
            done_meta = jnp.take_along_axis(cand_meta, keep[:, :, None],
                                            axis=1)
            done_out = jnp.take_along_axis(cand_out, keep[:, :, None],
                                           axis=1)

            # finished rows leave the beam
            alive_costs = jnp.where(is_eos, INF, chosen_costs)

            return {
                "carry": carry,
                "alive_costs": alive_costs,
                "alive_out": alive_out,
                "done_out": done_out,
                "done_meta": done_meta,
                "i": i + 1,
                "patience": new_patience,
                "min_cost": new_min,
                "stopped": stopped,
            }

        final = jax.lax.while_loop(cond, body, state)
        meta = final["done_meta"]
        return {
            "done_out": final["done_out"],
            "done_cost": meta[:, :, 0],
            "done_adjusted": meta[:, :, 1],
            "done_len": meta[:, :, 2].astype(jnp.int32),
            "done_valid": meta[:, :, 1] < INF / 2,
            "steps": final["i"],
        }
