"""On-device FST language model for shallow fusion.

The reference crosses device->host EVERY decoding step to run PyFST
(``FSTTransitionOp``/``FSTCostsOp`` host ops, lvsr/ops.py:124-233,
wrapped as a recurrent brick in lvsr/bricks/language_models.py:14-71).
Here the packed dense tables (:class:`attention_lvcsr_tpu.ops.fst.PackedFst`)
live in HBM and the per-step transition is gathers + masked logsumexp:

* live state set: ``(B, M)`` states + weights (M = MAX_STATES = 7, the
  reference's own live-set bound, lvsr/ops.py:23);
* consuming a symbol gathers the epsilon-closed successor lists of all
  live states ``(B, M, K)``, merges duplicate successor states by
  log-sum-exp (pairwise-equality trick over the M*K candidates), and
  keeps the best M;
* the per-symbol cost vector ("add") is
  ``-logsumexp_m(-(w_m + total_weight[s_m, :])) - total`` — identities
  are not needed thanks to the precomputed ``total_weight`` table.

The tables are flax variables in the ``fst`` collection (not trainable
parameters), injected from a host-side registry at init.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from attention_lvcsr_tpu.ops.fst import (Fst, NOT_STATE, PackedFst,
                                         PackedFstCSR, load_packed,
                                         pack_fst_auto, read_fst_text,
                                         read_symbols)

# host-side registry: module fields must stay hashable, so modules carry a
# string key and the packed numpy tables are looked up at init time.
_PACKED_REGISTRY: Dict[str, Any] = {}


def register_packed_fst(key: str, packed):
    _PACKED_REGISTRY[key] = packed


def get_packed_for_config(lm_conf: Mapping[str, Any]):
    """The packed FST a ``net.lm`` config section resolves to, if it has
    been built already (the registry key mirrors
    :func:`make_language_model`); None before the first model init."""
    if not lm_conf or not lm_conf.get("path"):
        return None
    key = (f"{lm_conf['path']}"
           f"|{float(lm_conf.get('no_transition_cost', 1e12))}"
           f"|{int(lm_conf.get('max_states', 7))}")
    return _PACKED_REGISTRY.get(key)


def _neg_logsumexp_neg(costs, axis, valid=None):
    """combine_weights on arrays: -logsumexp(-costs) with validity mask."""
    x = -costs
    if valid is not None:
        x = jnp.where(valid, x, -jnp.inf)
    return -jax.nn.logsumexp(x, axis=axis)


class FSTLanguageModel(nn.Module):
    fst_key: str
    num_symbols: int
    max_states: int
    max_arcs: int
    no_transition_cost: float

    state_names = ("states", "weights", "add")

    @property
    def is_csr(self):
        return isinstance(_PACKED_REGISTRY[self.fst_key], PackedFstCSR)

    def setup(self):
        packed = _PACKED_REGISTRY[self.fst_key]

        def init_tables():
            common = {
                "next_state": jnp.asarray(packed.next_state),
                "next_weight": jnp.asarray(packed.next_weight),
                "total_weight": jnp.asarray(packed.total_weight),
                "start_states": jnp.asarray(packed.start_states),
                "start_weights": jnp.asarray(packed.start_weights),
            }
            if isinstance(packed, PackedFstCSR):
                # sorted (state * V + symbol) keys for on-device binary
                # search; int32 is enough for any graph whose key space
                # fits the flat index (guarded at pack time here)
                if packed.num_states * packed.num_symbols >= 2 ** 31:
                    raise ValueError(
                        "CSR FST key space exceeds int32; this graph "
                        "needs jax_enable_x64")
                common["keys"] = jnp.asarray(packed.keys, jnp.int32)
            return common

        self.tables = self.variable("fst", "tables", init_tables)

    # -- table lookups (dense gather vs CSR binary search) --------------
    def _lookup_total(self, states):
        """``total_weight[s, :]`` rows for the live set -> (B, M, V),
        INF_COST where (state, symbol) has no transition."""
        t = self.tables.value
        idx = jnp.maximum(states, 0)
        if not self.is_csr:
            return t["total_weight"][idx]
        V = self.num_symbols
        q = idx[..., None] * V + jnp.arange(V, dtype=jnp.int32)
        i = jnp.searchsorted(t["keys"], q)
        i = jnp.minimum(i, t["keys"].shape[0] - 1)
        found = t["keys"][i] == q
        from attention_lvcsr_tpu.ops.fst import INF_COST
        return jnp.where(found, t["total_weight"][i], INF_COST)

    def _lookup_next(self, states, symbols):
        """Closed successor rows for (state, consumed symbol):
        (ns, nw) each (B, M, K), NOT_STATE / INF_COST padded."""
        t = self.tables.value
        idx = jnp.maximum(states, 0)
        if not self.is_csr:
            return (t["next_state"][idx, symbols[:, None]],
                    t["next_weight"][idx, symbols[:, None]])
        q = idx * self.num_symbols + symbols[:, None]
        i = jnp.searchsorted(t["keys"], q)
        i = jnp.minimum(i, t["keys"].shape[0] - 1)
        found = (t["keys"][i] == q)[..., None]
        from attention_lvcsr_tpu.ops.fst import INF_COST
        ns = jnp.where(found, t["next_state"][i], NOT_STATE)
        nw = jnp.where(found, t["next_weight"][i], INF_COST)
        return ns, nw

    # ------------------------------------------------------------------
    def _costs(self, states, weights):
        """FSTCostsOp: per-symbol transition costs (B, V)."""
        valid = states != NOT_STATE
        tw = self._lookup_total(states)              # (B, M, V)
        nxt_total = _neg_logsumexp_neg(
            weights[..., None] + tw, axis=1, valid=valid[..., None])
        total = _neg_logsumexp_neg(weights, axis=1, valid=valid)
        costs = nxt_total - total[..., None]
        has_any = valid.any(axis=1, keepdims=True)
        # table padding uses INF_COST (1e30), which is float-finite
        reachable = jnp.isfinite(costs) & (nxt_total < 1e29) & has_any
        costs = jnp.where(reachable, costs, self.no_transition_cost)
        return costs

    def initial_states(self, batch_size):
        t = self.tables.value
        states = jnp.tile(t["start_states"][None], (batch_size, 1))
        weights = jnp.tile(t["start_weights"][None], (batch_size, 1))
        return {"states": states, "weights": weights,
                "add": self._costs(states, weights)}

    def one_step(self, carry, symbols, mask=None):
        """Consume ``symbols`` (B,) ints; returns the new carry."""
        t = self.tables.value
        states, weights = carry["states"], carry["weights"]
        B, M = states.shape
        K = t["next_state"].shape[-1]

        valid = states != NOT_STATE
        ns, nw = self._lookup_next(states, symbols)            # (B, M, K)
        nw = weights[..., None] + nw
        cand_valid = valid[..., None] & (ns != NOT_STATE)
        ns = jnp.where(cand_valid, ns, NOT_STATE).reshape(B, M * K)
        nw = jnp.where(cand_valid, nw, jnp.inf).reshape(B, M * K)

        # merge duplicate successor states: combined weight per candidate,
        # keep only the first occurrence of each state id.
        same = (ns[:, :, None] == ns[:, None, :]) & \
            (ns[:, None, :] != NOT_STATE)                      # (B, N, N)
        merged = _neg_logsumexp_neg(
            jnp.broadcast_to(nw[:, None, :], same.shape), axis=2,
            valid=same)
        n_idx = jnp.arange(M * K)
        first = same & (n_idx[None, None, :] < n_idx[None, :, None])
        is_first = ~first.any(axis=2) & (ns != NOT_STATE)
        merged = jnp.where(is_first, merged, jnp.inf)

        # keep the best M by weight
        top_w, top_i = jax.lax.top_k(-merged, M)
        new_weights = -top_w
        new_states = jnp.take_along_axis(ns, top_i, axis=1)
        dead = ~jnp.isfinite(new_weights)
        new_states = jnp.where(dead, NOT_STATE, new_states)
        new_weights = jnp.where(dead, 0.0, new_weights)

        if mask is not None:
            m = mask[:, None]
            new_states = jnp.where(m > 0, new_states, states)
            new_weights = jnp.where(m > 0, new_weights, weights)
        return {"states": new_states, "weights": new_weights,
                "add": self._costs(new_states, new_weights)}

    def evaluate(self, outputs, mask=None):
        """Teacher-forced LM pass: ``outputs`` (T, B) -> dict with the
        PRE-update 'add' sequence (T, B, V) (the readout at step t sees
        the LM scores before consuming outputs[t], matching
        BaseSequenceGenerator.evaluate's ``results[:-1]`` slicing)."""
        T, B = outputs.shape
        init = self.initial_states(B)

        def step(mdl, carry, inp):
            sym, m = inp
            new = mdl.one_step(carry, sym, mask=m)
            return new, carry["add"]

        xs = (outputs, mask if mask is not None
              else jnp.ones((T, B), jnp.float32))
        scan = nn.scan(step, variable_broadcast=("params", "fst"),
                       split_rngs={"params": False})
        _, adds = scan(self, init, xs)
        return {"add": adds}


def make_language_model(lm_conf: Mapping[str, Any],
                        nn_char_map: Mapping[str, int],
                        name="language_model") -> FSTLanguageModel:
    """Build the LM module from the ``net.lm`` config section.

    ``lm_conf['path']`` points at an FST text file (fstprint format, with
    ``path + '.syms'`` or an embedded symbol table) or a prepacked
    ``.npz``.  ``nn_char_map`` maps characters to network output ids
    (lvsr/bricks/language_models.py:108-119).
    """
    import os
    lm_conf = dict(lm_conf)
    path = lm_conf.pop("path")
    no_transition_cost = float(lm_conf.pop("no_transition_cost", 1e12))
    max_states = int(lm_conf.pop("max_states", 7))
    lm_conf.pop("type", None)

    key = f"{path}|{no_transition_cost}|{max_states}"
    if key not in _PACKED_REGISTRY:
        if path.endswith(".npz"):
            packed = load_packed(path, no_transition_cost, max_states)
        else:
            syms_path = path + ".syms"
            isyms = (read_symbols(syms_path)
                     if os.path.exists(syms_path) else None)
            fst = read_fst_text(path, isyms=isyms)
            fst_char_map = dict(fst.isyms or {})
            fst_char_map.pop("<eps>", None)
            if len(fst_char_map) != len(nn_char_map):
                raise ValueError(
                    f"LM symbols ({len(fst_char_map)}) do not match the "
                    f"network alphabet ({len(nn_char_map)})")
            remap = {nn_char_map[ch]: code
                     for ch, code in fst_char_map.items()}
            packed = pack_fst_auto(
                fst, remap, num_nn_symbols=max(nn_char_map.values()) + 1,
                max_states=max_states,
                no_transition_cost=no_transition_cost)
        register_packed_fst(key, packed)
    packed = _PACKED_REGISTRY[key]
    num_symbols = (packed.num_symbols
                   if isinstance(packed, PackedFstCSR)
                   else packed.total_weight.shape[1])
    return FSTLanguageModel(
        fst_key=key, num_symbols=num_symbols,
        max_states=max_states, max_arcs=packed.next_state.shape[-1],
        no_transition_cost=no_transition_cost, name=name)
