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

import os
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


def _densify_budget_bytes() -> int:
    """Load-time densification budget for CSR graphs: dense (S, V)
    total + (S, V, K) next tables below this many bytes live dense in
    HBM (v5e has 16 GB; a 1e6-state char LG at K=3 is ~0.9 GB).
    Beyond it the windowed-CSR lookups run instead."""
    return int(os.environ.get("LVSR_LM_DENSIFY_BUDGET", 2 << 30))


def _csr_runtime_meta(packed) -> Dict[str, Any]:
    """Pick and prepare the CSR runtime (densified vs windowed) for a
    :class:`PackedFstCSR`; memoized on the packed object (host numpy
    work happens once per process, not once per module binding)."""
    budget = _densify_budget_bytes()
    meta = getattr(packed, "_runtime_meta", None)
    if meta is not None and meta.get("budget") == budget:
        return meta
    from attention_lvcsr_tpu.ops.fst import INF_COST
    S, V = packed.num_states, packed.num_symbols
    if S * V >= 2 ** 31:
        raise ValueError("CSR FST key space exceeds int32; this graph "
                         "needs jax_enable_x64")
    K = packed.next_state.shape[1]
    dense_bytes = S * V * 4 * (1 + 2 * K)
    if dense_bytes <= budget:
        s = (packed.keys // V).astype(np.int64)
        v = (packed.keys % V).astype(np.int64)
        tw = np.full((S, V), INF_COST, np.float32)
        tw[s, v] = packed.total_weight
        ns = np.full((S, V, K), NOT_STATE, np.int32)
        ns[s, v] = packed.next_state
        nw = np.full((S, V, K), INF_COST, np.float32)
        nw[s, v] = packed.next_weight
        meta = {"runtime": "densified", "tw": tw, "ns": ns, "nw": nw,
                "budget": budget}
    else:
        row_ptr = np.searchsorted(
            packed.keys // V, np.arange(S + 1)).astype(np.int32)
        window = max(int(np.diff(row_ptr).max(initial=1)), 1)
        meta = {"runtime": "windowed", "row_ptr": row_ptr,
                "window": window, "budget": budget}
    packed._runtime_meta = meta
    return meta


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
        # CSR runtime strategy.  The round-4 CSR decode ran per-step
        # jnp.searchsorted over (B, M, V) queries — log2(P) dependent
        # element-gather rounds — and measured 7x slower than the dense
        # path (33.7 vs 254 utt/s).  TPU gathers are fast for contiguous
        # ROWS and slow per-element, so:
        # * "densified": graphs whose dense (S, V[, K]) tables fit the
        #   HBM budget get densified AT LOAD TIME (storage stays CSR;
        #   a 1e5-state char graph is only ~45 MB dense) — lookups are
        #   then the same row gathers as small dense graphs;
        # * "windowed": beyond-budget graphs gather each state's
        #   contiguous arc window keys[row_ptr[s]:row_ptr[s+1]] and
        #   reduce with a one-hot mask — still ~6x faster than the
        #   searchsorted path (measured on v5e).
        self._csr_runtime = None
        if isinstance(packed, PackedFstCSR):
            self._csr_runtime = _csr_runtime_meta(packed)

        def init_tables():
            meta = self._csr_runtime
            if meta is not None and meta["runtime"] == "densified":
                return {
                    "next_state": jnp.asarray(meta["ns"]),
                    "next_weight": jnp.asarray(meta["nw"]),
                    "total_weight": jnp.asarray(meta["tw"]),
                    "start_states": jnp.asarray(packed.start_states),
                    "start_weights": jnp.asarray(packed.start_weights),
                }
            common = {
                "next_state": jnp.asarray(packed.next_state),
                "next_weight": jnp.asarray(packed.next_weight),
                "total_weight": jnp.asarray(packed.total_weight),
                "start_states": jnp.asarray(packed.start_states),
                "start_weights": jnp.asarray(packed.start_weights),
            }
            if meta is not None:
                common["keys"] = jnp.asarray(packed.keys, jnp.int32)
                common["row_ptr"] = jnp.asarray(meta["row_ptr"])
            return common

        self.tables = self.variable("fst", "tables", init_tables)

    @property
    def _dense_layout(self):
        """True when the device tables are (S, V)-indexed (small dense
        graphs AND load-densified CSR graphs)."""
        return (not self.is_csr
                or self._csr_runtime["runtime"] == "densified")

    def _csr_window_gather(self, states):
        """Gather each live state's arc window: positions, in-window
        symbols, and validity.  ``states`` (..., M) -> arrays
        (..., M, A) with A = the graph's max out-degree."""
        t = self.tables.value
        idx = jnp.maximum(states, 0)
        base = t["row_ptr"][idx]                        # (..., M)
        deg = t["row_ptr"][idx + 1] - base
        j = jnp.arange(self._csr_runtime["window"], dtype=jnp.int32)
        pos = jnp.minimum(base[..., None] + j,
                          t["keys"].shape[0] - 1)       # (..., M, A)
        valid = j < deg[..., None]
        sym = t["keys"][pos] - idx[..., None] * self.num_symbols
        return pos, sym, valid

    # -- table lookups (dense gather vs CSR binary search) --------------
    def _lookup_total(self, states):
        """``total_weight[s, :]`` rows for the live set -> (B, M, V),
        INF_COST where (state, symbol) has no transition."""
        t = self.tables.value
        idx = jnp.maximum(states, 0)
        if self._dense_layout:
            return t["total_weight"][idx]        # contiguous row gather
        from attention_lvcsr_tpu.ops.fst import INF_COST
        V = self.num_symbols
        # windowed gather + one-hot masked min into the dense (V,) row
        # (each (state, symbol) key appears at most once, so min == the
        # stored value); beats a scatter on TPU (no serialization)
        pos, sym, valid = self._csr_window_gather(states)
        w = t["total_weight"][pos]
        oh = (sym[..., None] == jnp.arange(V)) & valid[..., None]
        return jnp.min(jnp.where(oh, w[..., None], INF_COST), axis=-2)

    def _lookup_next(self, states, symbols):
        """Closed successor rows for (state, consumed symbol):
        (ns, nw) each (B, M, K), NOT_STATE / INF_COST padded."""
        t = self.tables.value
        idx = jnp.maximum(states, 0)
        if self._dense_layout:
            return (t["next_state"][idx, symbols[:, None]],
                    t["next_weight"][idx, symbols[:, None]])
        from attention_lvcsr_tpu.ops.fst import INF_COST
        # the consumed symbol's slot inside each state's arc window
        pos, sym, valid = self._csr_window_gather(states)
        hit = (sym == symbols[:, None, None]) & valid    # (B, M, A)
        found = hit.any(axis=-1, keepdims=True)          # (B, M, 1)
        at = jnp.take_along_axis(
            pos, jnp.argmax(hit, axis=-1)[..., None], axis=-1)[..., 0]
        ns = jnp.where(found, t["next_state"][at], NOT_STATE)
        nw = jnp.where(found, t["next_weight"][at], INF_COST)
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
