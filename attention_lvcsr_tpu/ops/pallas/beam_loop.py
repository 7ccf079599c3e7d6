"""The ENTIRE beam-search decode loop as one Pallas kernel.

Motivation (measured on the real chip, see BENCH history): the XLA
``lax.while_loop`` decode costs ~2 ms/step in fixed per-fusion dispatch
overhead plus ~75 us/utterance/step of poorly-overlapped small ops — for
the WSJ flagship model that is ~7 ms/step at batch 64 while the actual
math is a few microseconds per utterance.  Collapsing the whole loop
(score -> top-k -> gather -> GRU advance -> EOS retirement -> done-set
merge -> stopping criteria) into ONE kernel with every piece of state
VMEM-resident removes all of it: the decode becomes encoder + one
``pallas_call``.

Scope: the flagship configuration (conv location attention with one
filter, softmax energy normalizer, single-layer GRU decoder, embedding
feedback, weighted-averages-only readout with one tanh post-merge layer,
log-likelihood criterion, no LM fusion, no decode constraint).  The XLA
path in :mod:`attention_lvcsr_tpu.search.beam` remains for everything
else and is the semantic reference — this kernel replicates it exactly
(same candidate selection tie-breaking, same stopping bookkeeping; see
``tests/test_beam_loop.py`` for the parity suite).

Reference pedigree of the semantics: ``blocks/search.py:244-399``.

Per-utterance grid; all compute in f32 regardless of the HBM dtype.
Dynamic-structure tricks (no dynamic shapes inside kernels):

* top-k over the (K, V) candidate grid = K unrolled rounds of
  (min, lowest-flat-index argmin, mask-out) — identical tie order to
  ``lax.top_k`` of the negated costs;
* hypothesis gathers become one-hot permutation matmuls (MXU);
* the done-set merge is the same selection over the concatenated
  (2K,) adjusted costs, existing entries first (ties keep the old one,
  like the XLA path);
* the 2n+1-tap convolution over alignment weights is a banded-Toeplitz
  matmul and the median-window cumsum is an upper-triangular matmul
  (both from ops/pallas/decode_score.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 1e9
BIG = 3e38
NEG = -1e30
PATIENCE = 30


def _kernel(pre_ref, att_ref, mask_ref,
            toep_ref, tri_ref, st_ref, handler_ref, v_ref,
            merge_ref, mergeb_ref, post_ref, postb_ref,
            embed_ref, fin_ref, finb_ref, fgate_ref, fgateb_ref,
            din_ref, dgate_ref, wsg_ref, wss_ref, h0_ref,
            done_out_ref, done_meta_ref, steps_ref,
            h_sc, w_sc, aout_sc, acost_sc, dout_sc, dcost_sc, dadj_sc,
            dlen_sc,
            *, beam, max_len, eol, stop_on, ignore_first_eol,
            char_discount, round_to_inf, prior, before, after,
            initial_begin, initial_end, min_speed, max_speed):
    f32 = jnp.float32
    K = beam
    L = w_sc.shape[-1]
    M = st_ref.shape[-1]
    S = h_sc.shape[-1]
    V = post_ref.shape[-1]
    Lout = aout_sc.shape[-1]

    pre = pre_ref[0].astype(f32)              # (L, M)
    attended = att_ref[0].astype(f32)         # (L, D)
    att_mask = mask_ref[0].astype(f32)        # (1, L)
    toep = toep_ref[:].astype(f32)
    tri = tri_ref[:].astype(f32)
    st = st_ref[:].astype(f32)
    handler = handler_ref[:].astype(f32)      # (1, M)
    v = v_ref[:].astype(f32)                  # (M, 1)
    merge_k = merge_ref[:].astype(f32)
    merge_b = mergeb_ref[:].astype(f32)
    post_k = post_ref[:].astype(f32)
    post_b = postb_ref[:].astype(f32)
    embed = embed_ref[:].astype(f32)          # (Vf, F)
    fin = fin_ref[:].astype(f32)
    finb = finb_ref[:].astype(f32)
    fgate = fgate_ref[:].astype(f32)
    fgateb = fgateb_ref[:].astype(f32)
    din = din_ref[:].astype(f32)
    dgate = dgate_ref[:].astype(f32)
    wsg = wsg_ref[:].astype(f32)
    wss = wss_ref[:].astype(f32)

    pos_row = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1).astype(f32)
    pos_k = jax.lax.broadcasted_iota(jnp.int32, (K, L), 1).astype(f32)
    row_k = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
    iota_k_row = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
    iota_2k_row = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * K), 1)
    out_cols = jax.lax.broadcasted_iota(jnp.int32, (K, Lout), 1)
    # flat candidate index k*V + v, the XLA path's reshape order
    flat_iota = (jax.lax.broadcasted_iota(jnp.int32, (K, V), 0) * V
                 + jax.lax.broadcasted_iota(jnp.int32, (K, V), 1))

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32)

    # ---- init ------------------------------------------------------------
    row_dead = jnp.sum(att_mask) == 0.0
    h_sc[:] = jnp.broadcast_to(h0_ref[:].astype(f32), (K, S))
    w_sc[:] = (pos_k == 0.0).astype(f32)
    aout_sc[:] = jnp.zeros((K, Lout), f32)
    dout_sc[:] = jnp.zeros((K, Lout), f32)
    acost_sc[:] = jnp.where((row_k == 0) & (~row_dead), 0.0, INF)
    dcost_sc[:] = jnp.full((K, 1), INF, f32)
    dadj_sc[:] = jnp.full((K, 1), INF, f32)
    dlen_sc[:] = jnp.zeros((K, 1), f32)

    def body(i, carry):
        patience, min_cost, stopped, steps = carry
        dadj = dadj_sc[:]                                   # (K, 1)
        valid = dadj < INF / 2
        has_done = jnp.max(valid.astype(f32)) > 0.0
        best_adj = jnp.min(dadj)
        alive = acost_sc[:]                                  # (K, 1)
        alive_min = jnp.min(alive)
        empty = alive_min >= INF

        # ---- stopping bookkeeping (search/beam.py body top) -------------
        if stop_on == "patience":
            improved = best_adj < min_cost
            min_cost = jnp.where(has_done & improved, best_adj, min_cost)
            patience = jnp.where(
                has_done,
                jnp.where(improved, PATIENCE, patience - 1), patience)
            newly = patience <= 0
        else:  # optimistic_future_cost
            kth_adj = jnp.max(jnp.where(valid, dadj, -INF))
            optimistic = alive_min - char_discount * float(max_len)
            newly = jnp.all(valid) & (kth_adj < optimistic)
        stopped = stopped | newly | empty
        steps = jnp.where(stopped, steps, i + 1)

        @pl.when(jnp.logical_not(stopped))
        def _():
            w = w_sc[:]                                      # (K, L)
            h = h_sc[:]                                      # (K, S)

            # ---- window prior ------------------------------------------
            if prior == "expanding":
                step0 = jnp.asarray(i, f32)
                begin = jnp.maximum(0.0, jnp.minimum(
                    float(L - 1), initial_begin + step0 * min_speed))
                end = jnp.maximum(0.0, jnp.minimum(
                    float(L), initial_end + step0 * max_speed))
                begin = jnp.floor(begin)
                end = jnp.ceil(end)
                global_mask = ((pos_row >= begin)
                               & (pos_row < end)).astype(f32)
                combined = global_mask * att_mask
                combined = jnp.broadcast_to(combined, (K, L))
            else:
                if prior == "window_around_mean":
                    expected = (w * pos_k).sum(axis=1, keepdims=True)
                else:  # window_around_median
                    cs = dot(w, tri)                         # (K, L)
                    below = (cs < 0.5).astype(f32).sum(axis=1,
                                                       keepdims=True)
                    expected = jnp.maximum(0.0, below - 1.0)
                begins = jnp.floor(expected - before)        # (K, 1)
                ends = jnp.ceil(expected + after)
                gb = jnp.floor(jnp.maximum(0.0, begins.min()))
                ge = jnp.ceil(jnp.minimum(float(L), ends.max()))
                global_mask = ((pos_row >= gb) & (pos_row < ge)).astype(f32)
                additional = ((pos_k > begins) & (pos_k < ends)).astype(f32)
                combined = global_mask * additional * att_mask

            # ---- energies (conv via Toeplitz matmul) ---------------------
            conv = dot(w * global_mask, toep)                # (K, L)
            sp = dot(h, st)                                  # (K, M)
            match = jnp.tanh(pre[None, :, :] + sp[:, None, :]
                             + conv[:, :, None] * handler[None, :, :])
            energies = dot(match.reshape(K * L, M), v).reshape(K, L)

            # ---- masked softmax ------------------------------------------
            masked = jnp.where(global_mask > 0, energies, NEG)
            mx = jnp.max(masked, axis=1, keepdims=True)
            mx = jnp.where(mx > NEG / 2, mx, 0.0)
            unnorm = jnp.exp(energies - mx) * combined
            denom = unnorm.sum(axis=1, keepdims=True) + \
                (combined.sum(axis=1, keepdims=True) == 0).astype(f32)
            wnew = unnorm / denom                            # (K, L)

            # ---- readout --------------------------------------------------
            wa = dot(wnew, attended)                         # (K, D)
            act = jnp.tanh(dot(wa, merge_k) + merge_b)
            logits = dot(act, post_k) + post_b               # (K, V)
            lmx = jnp.max(logits, axis=1, keepdims=True)
            lse = lmx + jnp.log(
                jnp.sum(jnp.exp(logits - lmx), axis=1, keepdims=True))
            costs = lse - logits                             # (K, V)

            # ---- top-k over K*V candidates -------------------------------
            work = alive + costs                             # (K, V)
            perm_rows, sym_vals, cost_vals = [], [], []
            for _ in range(K):
                m = jnp.min(work)
                idx = jnp.min(jnp.where(work == m, flat_iota, K * V))
                perm_rows.append((iota_k_row == idx // V).astype(f32))
                sym_vals.append(jnp.full((1, 1), idx % V, jnp.int32))
                cost_vals.append(jnp.full((1, 1), m, f32))
                work = jnp.where(flat_iota == idx, BIG, work)
            perm = jnp.concatenate(perm_rows, axis=0)        # (K, K)
            symbols = jnp.concatenate(sym_vals, axis=0).astype(f32)
            chosen = jnp.concatenate(cost_vals, axis=0)      # (K, 1)

            # ---- gather by source beam row --------------------------------
            prev_costs = dot(perm, alive)                    # (K, 1)
            h_src = dot(perm, h)
            w_src = dot(perm, wnew)
            wa_src = dot(perm, wa)
            aout = dot(perm, aout_sc[:])                     # (K, Lout)

            # ---- record symbol --------------------------------------------
            aout_col = jnp.where(out_cols == i, symbols, aout)
            aout_sc[:] = aout_col
            alive_len = jnp.asarray(i + 1, f32)
            step_costs = chosen - prev_costs

            # ---- GRU advance ----------------------------------------------
            fb_onehot = (jax.lax.broadcasted_iota(
                jnp.int32, (K, embed.shape[0]), 1).astype(f32)
                == symbols).astype(f32)
            fb = dot(fb_onehot, embed)                       # (K, F)
            gate_in = dot(fb, fgate) + fgateb + dot(wa_src, dgate)
            in_tot = dot(fb, fin) + finb + dot(wa_src, din)
            gates = jax.nn.sigmoid(dot(h_src, wsg) + gate_in)
            update = gates[:, :S]
            reset = gates[:, S:]
            cand = jnp.tanh(dot(h_src * reset, wss) + in_tot)
            h_sc[:] = update * cand + (1.0 - update) * h_src
            w_sc[:] = w_src

            # ---- EOS retirement -------------------------------------------
            is_eos = symbols == float(eol)
            if ignore_first_eol:
                is_eos = is_eos & (i > 0)
            finishing = (is_eos & (step_costs < round_to_inf)
                         & (prev_costs < INF / 2))
            adjusted = chosen - char_discount * (alive_len + 1.0)
            new_adj = jnp.where(finishing, adjusted, INF)

            # ---- done-set merge (2K -> K, existing entries win ties) ------
            cand_adj = jnp.concatenate([dadj_sc[:], new_adj], axis=0)
            cand_cost = jnp.concatenate([dcost_sc[:], chosen], axis=0)
            cand_len = jnp.concatenate(
                [dlen_sc[:], jnp.full((K, 1), alive_len, f32)], axis=0)
            workd = cand_adj.reshape(1, 2 * K)
            perm2_rows = []
            for _ in range(K):
                m = jnp.min(workd)
                idx = jnp.min(jnp.where(workd == m, iota_2k_row, 2 * K))
                perm2_rows.append((iota_2k_row == idx).astype(f32))
                workd = jnp.where(iota_2k_row == idx, BIG, workd)
            perm2 = jnp.concatenate(perm2_rows, axis=0)      # (K, 2K)
            dadj_sc[:] = dot(perm2, cand_adj)
            dcost_sc[:] = dot(perm2, cand_cost)
            dlen_sc[:] = dot(perm2, cand_len)
            cand_out = jnp.concatenate([dout_sc[:], aout_col], axis=0)
            dout_sc[:] = dot(perm2, cand_out)

            # finished rows leave the beam
            acost_sc[:] = jnp.where(is_eos, INF, chosen)

        return patience, min_cost, stopped, steps

    carry0 = (jnp.int32(PATIENCE), jnp.float32(1000.0), row_dead,
              jnp.int32(0))
    _, _, _, steps = jax.lax.fori_loop(0, max_len, body, carry0)

    done_out_ref[0] = dout_sc[:].astype(jnp.int32)
    done_meta_ref[0] = jnp.concatenate(
        [dcost_sc[:], dadj_sc[:], dlen_sc[:]], axis=1)
    steps_ref[:] = steps.reshape(1, 1, 1)


@functools.partial(
    jax.jit,
    static_argnames=("beam", "max_len", "eol", "stop_on",
                     "ignore_first_eol", "char_discount", "round_to_inf",
                     "prior", "before", "after", "initial_begin",
                     "initial_end", "min_speed", "max_speed", "interpret"))
def beam_search_loop(pre, attended, att_mask, tables, *,
                     beam, max_len, eol, stop_on="patience",
                     ignore_first_eol=False, char_discount=0.0,
                     round_to_inf=1e9, prior="expanding", before=0.0,
                     after=0.0, initial_begin=0.0, initial_end=1e4,
                     min_speed=0.0, max_speed=0.0, interpret=False):
    """Run the full decode loop.  Returns (done_out (U,K,max_len) int32,
    done_meta (U,K,3) [cost, adjusted, len] f32, steps (U,) int32).

    ``tables`` is the dict from
    ``SequenceGenerator.loop_decode_tables`` (dense weight tables).
    """
    U, L, M = pre.shape
    D = attended.shape[-1]
    S = tables["wss"].shape[0]
    R = tables["merge_k"].shape[-1]
    V = tables["post_k"].shape[-1]
    Vf = tables["embed"].shape[0]
    F = tables["embed"].shape[-1]
    K = beam
    f32 = jnp.float32
    Lout = int(max_len)

    kernel = functools.partial(
        _kernel, beam=K, max_len=Lout, eol=int(eol),
        stop_on=stop_on, ignore_first_eol=bool(ignore_first_eol),
        char_discount=float(char_discount),
        round_to_inf=float(round_to_inf), prior=prior,
        before=float(before), after=float(after),
        initial_begin=float(initial_begin),
        initial_end=float(initial_end), min_speed=float(min_speed),
        max_speed=float(max_speed))
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)

    full = lambda *dims: pl.BlockSpec(dims, lambda u: (0,) * len(dims))
    peru = lambda *dims: pl.BlockSpec((1,) + dims,
                                      lambda u: (u,) + (0,) * len(dims))
    done_out, done_meta, steps = pl.pallas_call(
        kernel,
        grid=(U,),
        in_specs=[
            peru(L, M),             # pre
            peru(L, D),             # attended
            peru(1, L),             # att_mask
            full(L, L),             # toeplitz
            full(L, L),             # tri
            full(S, M),             # state_trans
            full(1, M),             # handler
            full(M, 1),             # v
            full(D, R),             # merge kernel
            full(1, R),             # merge bias
            full(R, V),             # post kernel
            full(1, V),             # post bias
            full(Vf, F),            # feedback embedding
            full(F, S),             # fork inputs W
            full(1, S),             # fork inputs b
            full(F, 2 * S),         # fork gates W
            full(1, 2 * S),         # fork gates b
            full(D, S),             # distribute inputs W
            full(D, 2 * S),         # distribute gates W
            full(S, 2 * S),         # GRU state_to_gates
            full(S, S),             # GRU state_to_state
            full(1, S),             # GRU initial state
        ],
        out_specs=(peru(K, Lout), peru(K, 3), peru(1, 1)),
        out_shape=(
            jax.ShapeDtypeStruct((U, K, Lout), jnp.int32),
            jax.ShapeDtypeStruct((U, K, 3), f32),
            jax.ShapeDtypeStruct((U, 1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((K, S), f32),          # h
            pltpu.VMEM((K, L), f32),          # weights
            pltpu.VMEM((K, Lout), f32),       # alive_out
            pltpu.VMEM((K, 1), f32),          # alive_costs
            pltpu.VMEM((K, Lout), f32),       # done_out (f32 work copy)
            pltpu.VMEM((K, 1), f32),          # done cost
            pltpu.VMEM((K, 1), f32),          # done adjusted
            pltpu.VMEM((K, 1), f32),          # done len
        ],
        interpret=interpret,
        **kwargs,
    )(pre, attended, att_mask.reshape(U, 1, L),
      tables["toeplitz"], tables["tri"], tables["state_trans"],
      tables["handler"].reshape(1, M), tables["v"].reshape(M, 1),
      tables["merge_k"], tables["merge_b"].reshape(1, R),
      tables["post_k"], tables["post_b"].reshape(1, V),
      tables["embed"], tables["fork_in_w"],
      tables["fork_in_b"].reshape(1, S), tables["fork_gate_w"],
      tables["fork_gate_b"].reshape(1, 2 * S), tables["dist_in_w"],
      tables["dist_gate_w"], tables["wsg"], tables["wss"],
      tables["h0"].reshape(1, S))
    return done_out, done_meta, steps.reshape(U)
