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

``validate_solution_function`` (the reference's dictionary-constrained
decoding hook, ``blocks/search.py:368-371`` /
``lvsr/main.py:109-110,803-804``) is supported two ways:

* a :class:`DecodeConstraint` (dense deterministic FST over the output
  alphabet) runs ON DEVICE: per-beam-row constraint state in the loop
  carry, symbols with no transition are masked out of the expansion, and
  EOS is only allowed from accepting states — strictly stronger than the
  reference's finish-time filter (invalid prefixes never waste beam
  slots) while accepting exactly the same solution set;
* an arbitrary Python callable ``fn(utterance_inputs, symbols) -> bool``
  runs at INSERTION time, exactly like the reference: each step's
  finishing candidates are validated through a ``jax.pure_callback``
  before they may enter the done set, so a rejected candidate can never
  crowd a valid one out of the K done slots and the beam keeps
  searching.  (``symbols`` includes the final EOL, no BOS.)  This pays
  one host round-trip per step that finishes a candidate — the
  on-device :class:`DecodeConstraint` is the fast path.
"""
from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

INF = 1e9
PATIENCE = 30
NOT_STATE = -1


class CandidateNotFoundError(Exception):
    """No finished hypothesis was produced (blocks/search.py:15)."""


def _cast_tree(params, dtype):
    """Cast floating leaves to the compute dtype — EXCEPT the ``fst``
    collection: packed LM tables are exact lookup data (state ids,
    INF_COST pads, log-probs) and stay f32 regardless."""
    cast = (lambda a: a.astype(dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a)
    if isinstance(params, dict) and "fst" in params:
        return {k: (v if k == "fst" else jax.tree.map(cast, v))
                for k, v in params.items()}
    return jax.tree.map(cast, params)


@dataclasses.dataclass(frozen=True)
class DecodeConstraint:
    """Dense deterministic acceptor over the network's output alphabet.

    ``trans[s, v]`` is the successor of state ``s`` on symbol ``v`` (or
    ``NOT_STATE`` when ``v`` is not allowed); state 0 is the start;
    ``final[s]`` marks states where the hypothesis may end (emit EOS).
    """
    trans: np.ndarray   # (S, V) int32
    final: np.ndarray   # (S,) bool

    @classmethod
    def from_fst(cls, fst, num_symbols: int,
                 remap: Optional[dict] = None) -> "DecodeConstraint":
        """Densify a host ``ops.fst.Fst`` acceptor.  The FST must be
        input-deterministic and epsilon-free (determinize/rm_epsilon it
        first — see :mod:`attention_lvcsr_tpu.ops.fst_algo`); ``remap``
        maps network symbol ids -> FST input labels (identity default).
        """
        from attention_lvcsr_tpu.ops.fst import EPSILON
        S = fst.num_states
        trans = np.full((S, num_symbols), NOT_STATE, np.int32)
        # state ids must be dense with start == 0 for the device tables
        if fst.start != 0:
            raise ValueError("constraint FST start state must be 0")
        for s in fst.arcs:
            seen = {}
            for a in fst.state_arcs(s):
                if a.ilabel == EPSILON:
                    raise ValueError(
                        "constraint FST has epsilon arcs; rm_epsilon first")
                if a.ilabel in seen and seen[a.ilabel] != a.nextstate:
                    raise ValueError(
                        f"constraint FST nondeterministic at state {s} "
                        f"label {a.ilabel}; determinize first")
                seen[a.ilabel] = a.nextstate
            for v in range(num_symbols):
                lab = remap.get(v) if remap is not None else v
                if lab in seen:
                    trans[s, v] = seen[lab]
        final = np.zeros((S,), bool)
        for s in fst.finals:
            final[s] = True
        return cls(trans=trans, final=final)

    @classmethod
    def from_words(cls, words, char_map: dict, num_symbols: int,
                   spc: str = "<spc>") -> "DecodeConstraint":
        """Dictionary constraint: hypotheses must be ``<spc>``-separated
        sequences of the given words (``dict_char_lm_fst`` trie)."""
        from attention_lvcsr_tpu.ops.fst import dict_char_lm_fst
        # shift labels by +1: network id 0 would collide with the FST
        # epsilon convention (label 0)
        shifted = {ch: code + 1 for ch, code in char_map.items()}
        fst = dict_char_lm_fst(words, shifted, spc=spc)
        remap = {code: code + 1 for code in char_map.values()}
        return cls.from_fst(fst, num_symbols, remap=remap)


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
               validate_solution_function=None, mesh=None):
        """``mesh``: a ``jax.sharding.Mesh`` with a 'data' axis — the
        utterance batch is sharded across it and XLA's SPMD partitioner
        runs the decode data-parallel over the mesh (serving-scale batch
        decode; each utterance's compute is unchanged, so results are
        bit-identical to single-device).  The batch must divide the
        'data' axis size.  Params keep the shardings they carry
        (replicated if unsharded host arrays)."""
        if mesh is not None:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P
            batch_sh = NamedSharding(mesh, P("data"))
            inputs = jax.device_put(jnp.asarray(inputs), batch_sh)
            inputs_mask = jax.device_put(jnp.asarray(inputs_mask),
                                         batch_sh)
            if not any(isinstance(leaf, jax.Array) and len(
                    leaf.sharding.device_set) > 1
                    for leaf in jax.tree.leaves(params)):
                params = jax.device_put(
                    params, NamedSharding(mesh, P()))
        constraint = post_filter = None
        if isinstance(validate_solution_function, DecodeConstraint):
            constraint = validate_solution_function
        elif callable(validate_solution_function):
            post_filter = validate_solution_function
        elif validate_solution_function is not None:
            raise TypeError(
                "validate_solution_function must be a DecodeConstraint, "
                "a callable, or None")
        if post_filter is not None and mesh is not None:
            raise ValueError(
                "a host validate_solution_function cannot run under a "
                "sharded mesh decode (host callbacks don't partition); "
                "use a DecodeConstraint instead")
        # the whole-loop kernel is a single-device program; a pure
        # data-parallel mesh runs it PER SHARD through jax.shard_map
        # (each shard sees local shapes), while model-parallel meshes
        # use the XLA path, which the SPMD partitioner splits
        loop_mode = (self._loop_kernel_mode(
                         num_frames=np.shape(inputs)[1])
                     if constraint is None and post_filter is None
                     and (mesh is None
                          or mesh.shape.get("model", 1) == 1)
                     else None)
        if loop_mode is not None:
            out = self._search_loop_kernel(
                params, jnp.asarray(inputs), jnp.asarray(inputs_mask),
                stop_on=stop_on,
                ignore_first_eol=bool(ignore_first_eol),
                eol=int(eol_symbol), max_len=max(1, int(max_length)),
                char_discount=float(char_discount),
                round_to_inf=float(round_to_inf),
                interpret=loop_mode == "interpret", mesh=mesh)
        else:
            key = (inputs.shape, stop_on, bool(ignore_first_eol),
                   constraint is not None, post_filter is not None)
            # the host filter is baked into the jitted closure; cache
            # entries carry it so a DIFFERENT callable recompiles
            # instead of silently reusing the stale one
            cached = self._jitted.get(key)
            if cached is None or cached[1] is not post_filter:
                self._jitted[key] = (jax.jit(functools.partial(
                    self._search_core, stop_on=stop_on,
                    ignore_first_eol=bool(ignore_first_eol),
                    use_constraint=constraint is not None,
                    host_filter=post_filter)), post_filter)
            cargs = ()
            if constraint is not None:
                cargs = (jnp.asarray(constraint.trans),
                         jnp.asarray(constraint.final))
            out = self._jitted[key][0](
                params, jnp.asarray(inputs), jnp.asarray(inputs_mask),
                jnp.int32(eol_symbol), jnp.int32(max_length),
                jnp.float32(char_discount), jnp.float32(round_to_inf),
                *cargs)
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

    # VMEM budget for the kernel's dominant intermediates: the
    # (G, K, L, M) attention-match tensor (L-chunked by the kernel when
    # one utterance alone exceeds it) and the per-row (R, L) alignment
    # tensors.  The group size is chosen to fit; truly impossible
    # configurations fall back to the XLA path.
    LOOP_VMEM_BUDGET = 64 << 20
    MAX_LOOP_BEAM = 512

    def _loop_bytes(self, attended_len, match_dim):
        """(fixed, per-utterance, per-utterance-unchunkable) VMEM bytes."""
        K, L = self.beam_size, attended_len
        n_filters = int(getattr(self.net, "conv_num_filters", 1) or 1)
        fixed = (1 + n_filters) * L * L * 4
        # ~8 (R, L) alignment-sized tensors + the per-row (R, Fc*L)
        # convolution stack + the K x K permutations
        per_utt_base = (K * L * 4 * (8 + n_filters)
                        + K * K * 4 * 3)
        per_utt = per_utt_base + K * L * match_dim * 4
        return fixed, per_utt, per_utt_base

    def _loop_group(self, attended_len, match_dim):
        env = os.environ.get("LVSR_LOOP_GROUP")
        if env:
            return max(1, int(env))
        fixed, per_utt, per_utt_base = self._loop_bytes(
            attended_len, match_dim)
        avail = max(self.LOOP_VMEM_BUDGET - fixed, 0)
        g = avail // max(per_utt, 1)
        if g < 1:
            # wide beams / long audio: one utterance per grid step, the
            # kernel chunks the match tensor over L
            return 1
        return max(1, min(16, g))

    # ------------------------------------------------------------------
    def _loop_kernel_mode(self, num_frames=None):
        """'compile'/'interpret' when the whole-loop Pallas decode kernel
        (ops/pallas/beam_loop.py) covers this model, else None.  The
        support conditions mirror
        ``SequenceGenerator.fused_score_supported`` but are evaluated
        from the RecognizerNet config fields (available outside apply)."""
        net = self.net
        if os.environ.get("LVSR_NO_LOOP_KERNEL"):
            return None
        if not hasattr(net, "criterion"):
            return None  # scripted/test doubles: XLA path only
        if self.beam_size > self.MAX_LOOP_BEAM:
            return None  # selection rounds are O(K) sequential
        lm = dict(net.lm) if net.lm else {}
        if lm.get("path"):
            # LM-fused decode always takes the XLA path: its lookups hit
            # the load-densified HBM tables (models/lm.py) at the same
            # measured throughput as the no-LM kernel, while the former
            # in-kernel fusion Mosaic-compiled for minutes-to-never past
            # ~250 states (see ops/pallas/beam_loop.py docstring)
            return None
        if num_frames is not None:
            # even with the kernel's L-chunked match tensor, the per-row
            # alignment state of ONE utterance (plus the fixed tables)
            # must fit the budget, else fall back to the XLA path
            # instead of failing in Mosaic
            subsample = 1
            for s in (net.subsample or []):
                subsample *= int(s)
            l_est = -(-int(num_frames) // max(subsample, 1))
            m_est = net.dim_matcher or net.dim_dec
            fixed, _, per_utt_base = self._loop_bytes(l_est, m_est)
            if fixed + per_utt_base > 1.5 * self.LOOP_VMEM_BUDGET:
                return None
        crit = dict(net.criterion or {"name": "log_likelihood"})
        canon = lambda n: n.rsplit(".", 1)[-1] if isinstance(n, str) else n
        act = net.post_merge_activation or "tanh"
        is_content = net.attention_type == "content"
        supported = (
            (is_content
             or (net.attention_type == "content_and_conv"
                 and (net.conv_num_filters or 1) <= 16
                 and (net.energy_normalizer or "softmax") in (
                     "softmax", "logistic", "relu")))
            and (crit["name"] == "log_likelihood"
                 or (crit["name"].startswith("mse") and not lm))
            and (net.dec_stack or 1) <= 4
            and canon(net.dec_transition) in ("gru", "GatedRecurrent")
            and net.post_merge_dims is not None
            and len(net.post_merge_dims) == 1
            and (act in ("tanh", "relu", "rectifier", "sigmoid",
                         "logistic", "identity")
                 or act.startswith("maxout")))
        if not supported:
            return None
        if net.use_pallas == "interpret":
            return "interpret"
        if net.use_pallas == "never":
            return None
        if jax.default_backend() == "tpu":
            return "compile"
        return None

    def _search_loop_kernel(self, params, inputs, inputs_mask, *,
                            stop_on, ignore_first_eol, eol, max_len,
                            char_discount, round_to_inf, interpret,
                            mesh=None):
        """Whole-loop Pallas decode: encoder + ONE kernel.

        Runs as three jitted pieces so the params-only dense weight
        tables (and any compute-dtype param cast) are computed ONCE per
        (params, encoded-length) instead of on every call — table
        extraction costs ~36 ms on the flagship model, a third of the
        decode itself."""
        from attention_lvcsr_tpu.ops.pallas.beam_loop import (
            INF as LOOP_INF, beam_search_loop)
        net = self.net
        # Cache keys are the tuple of parameter LEAF ids (jax arrays are
        # immutable, so any weight change replaces at least one leaf;
        # keying on the outer dict's identity would serve stale tables
        # after in-place tree edits like params['...']['bias'] = new).
        params_token = tuple(map(id, jax.tree.leaves(params)))
        if self.compute_dtype is not None:
            dtype = jnp.dtype(self.compute_dtype)
            cached = getattr(self, "_cast_cache", None)
            if cached is not None and cached[0] == (params_token, dtype):
                params = cached[1]
            else:
                if "loop_cast" not in self._jitted:
                    self._jitted["loop_cast"] = jax.jit(
                        functools.partial(_cast_tree, dtype=dtype))
                cast_params = self._jitted["loop_cast"](params)
                # keep a strong ref to the source tree so its leaf ids
                # cannot be recycled while the cache entry lives
                self._cast_cache = ((params_token, dtype), cast_params,
                                    params)
                params = cast_params
            params_token = tuple(map(id, jax.tree.leaves(params)))
            inputs = inputs.astype(dtype)
            inputs_mask = inputs_mask.astype(dtype)

        ctx_key = ("loop_ctx", inputs.shape, inputs.dtype)
        if ctx_key not in self._jitted:
            self._jitted[ctx_key] = jax.jit(functools.partial(
                net.apply, method=net.decode_loop))
        data = self._jitted[ctx_key](params, inputs, inputs_mask)

        L = data["attended"].shape[1]
        dt = data["attended"].dtype
        tkey = (L, str(dt))
        cached = getattr(self, "_tables_cache", None)
        if cached is not None and cached[0] == params_token \
                and tkey in cached[1]:
            tables = cached[1][tkey]
        else:
            if "loop_tables" not in self._jitted:
                self._jitted["loop_tables"] = jax.jit(
                    functools.partial(net.apply,
                                      method=net.decode_loop_tables),
                    static_argnums=(1, 2))
            tables = self._jitted["loop_tables"](params, L, dt)
            if cached is None or cached[0] != params_token:
                self._tables_cache = (params_token, {}, params)
            self._tables_cache[1][tkey] = tables
        data = dict(data, tables=tables)
        # content-only attention has no window prior: synthesize an
        # expanding window covering EVERY position (the default 1e4
        # literal could clip extreme-length audio)
        is_content = net.attention_type == "content"
        prior = ({"initial_end": float(L) + 1.0} if is_content
                 else dict(net.prior or {}))
        act = net.post_merge_activation or "tanh"
        maxout = 0
        if act.startswith("maxout"):
            maxout = int(act.split(":")[1]) if ":" in act else 2
        loop_fn = beam_search_loop
        if mesh is not None:
            # data-parallel serving decode: every shard runs the WHOLE
            # kernel on its local batch slice (tables replicated);
            # results are bit-identical to single-device per utterance
            from jax.sharding import PartitionSpec as P

            from attention_lvcsr_tpu.parallel.mesh import get_shard_map
            _shard_map = get_shard_map()
            dp = mesh.shape["data"]
            if data["pre"].shape[0] % dp:
                raise ValueError(
                    f"batch {data['pre'].shape[0]} must be a multiple "
                    f"of the 'data' axis size ({dp}) for the sharded "
                    f"loop decode")

            def loop_fn(pre, attended, amask, tables, **kw):
                return _shard_map(
                    functools.partial(beam_search_loop, **kw),
                    mesh=mesh,
                    in_specs=(P("data"), P("data"), P("data"), P()),
                    out_specs=(P("data"), P("data"), P("data")),
                    check_vma=False,
                )(pre, attended, amask, tables)

        done_out, done_meta, steps = loop_fn(
            data["pre"], data["attended"], data["attended_mask"],
            data["tables"], beam=self.beam_size,
            group=self._loop_group(L, int(tables["v"].shape[0])),
            max_len=max_len,
            normalizer=("softmax" if is_content
                        else net.energy_normalizer or "softmax"),
            states_readout=bool(net.use_states_for_readout),
            maxout=maxout, post_act=act, content_attention=is_content,
            dec_stack=int(net.dec_stack or 1),
            mse_cost=dict(net.criterion or {}).get(
                "name", "log_likelihood").startswith("mse"),
            eol=eol, stop_on=stop_on, ignore_first_eol=ignore_first_eol,
            char_discount=char_discount, round_to_inf=round_to_inf,
            prior=prior.get("type", "expanding"),
            before=float(prior.get("before", 0.0)),
            after=float(prior.get("after", 0.0)),
            initial_begin=float(prior.get("initial_begin", 0.0)),
            initial_end=float(prior.get("initial_end", 1e4)),
            min_speed=float(prior.get("min_speed", 0.0)),
            max_speed=float(prior.get("max_speed", 0.0)),
            interpret=interpret)
        return {
            "done_out": done_out,
            "done_cost": done_meta[:, :, 0],
            "done_adjusted": done_meta[:, :, 1],
            "done_len": done_meta[:, :, 2].astype(jnp.int32),
            "done_valid": done_meta[:, :, 1] < LOOP_INF / 2,
            "steps": jnp.max(steps),
        }

    def _search_core(self, params, inputs, inputs_mask, eol_symbol,
                     max_length, char_discount, round_to_inf,
                     ctrans=None, cfinal=None, *,
                     stop_on="patience", ignore_first_eol=False,
                     use_constraint=False, host_filter=None):
        net, K = self.net, self.beam_size
        U = inputs.shape[0]
        L = inputs.shape[1]  # output buffer bound; max_length <= T frames
        V = self.recognizer.num_phonemes

        # the host filter sees the ORIGINAL features, not the bf16 cast
        raw_inputs = inputs
        if self.compute_dtype is not None:
            dtype = jnp.dtype(self.compute_dtype)
            params = _cast_tree(params, dtype)
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
        if use_constraint:
            state["cstate"] = jnp.zeros((U, K), jnp.int32)

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
            if use_constraint:
                # mask symbols the constraint FST forbids; EOS only from
                # accepting states (device-side validate_solution role)
                rows = ctrans[s["cstate"]]                     # (U, K, V)
                is_eol = jnp.arange(V) == eol_symbol           # (V,)
                allowed = jnp.where(is_eol[None, None, :],
                                    cfinal[s["cstate"]][:, :, None],
                                    rows != NOT_STATE)
                logprobs = jnp.where(allowed, logprobs, INF)
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
            # re-finish with garbage costs.  The ~stopped gate matches the
            # reference's control flow exactly: blocks/search.py:306-332
            # checks the stopping criteria at the TOP of iteration i and
            # breaks BEFORE expanding, so candidates from the expansion
            # after the stop decision must not enter the done set.
            finishing = (is_eos & (step_costs < round_to_inf)
                         & (prev_costs < INF / 2) & ~stopped[:, None])
            if host_filter is not None:
                # insertion-time validation (reference
                # blocks/search.py:365-371): every finishing candidate is
                # checked on the host BEFORE it may enter the done set,
                # so a rejected candidate never crowds out a valid one.
                # The callback fires only on steps that finish something.
                def _host_validate(fin, outs, step, feats):
                    fin = np.array(fin)
                    outs = np.asarray(outs)
                    n = int(step) + 1          # length incl. the EOL
                    feats = np.asarray(feats)
                    for u, k in zip(*np.nonzero(fin)):
                        seq = list(outs[u, k, :min(n, outs.shape[2])])
                        if not host_filter(feats[u], seq):
                            fin[u, k] = False
                    return fin

                finishing = jax.lax.cond(
                    finishing.any(),
                    lambda fin, outs, step, feats: jax.pure_callback(
                        _host_validate,
                        jax.ShapeDtypeStruct(finishing.shape, jnp.bool_),
                        fin, outs, step, feats),
                    lambda fin, outs, step, feats: fin,
                    finishing, alive_out, i, raw_inputs)
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

            new_s = {}
            if use_constraint:
                cstate_sel = jnp.take_along_axis(s["cstate"], beam_idx,
                                                 axis=1)
                nxt = ctrans[cstate_sel, symbols]
                new_s["cstate"] = jnp.where(
                    is_eos, cstate_sel, jnp.maximum(nxt, 0))

            return {
                **new_s,
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
