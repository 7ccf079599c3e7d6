"""The ENTIRE beam-search decode loop as one Pallas kernel.

Motivation (measured on the real chip, see BENCH history): the XLA
``lax.while_loop`` decode costs ~2 ms/step in fixed per-fusion dispatch
overhead plus poorly-overlapped small ops — for the WSJ flagship model
that is ~7 ms/step at batch 64 while the actual math is a few
microseconds per utterance.  Collapsing the whole loop (score -> top-k
-> gather -> GRU advance -> EOS retirement -> done-set merge -> stopping
criteria) into ONE kernel with every piece of state VMEM-resident
removes all of it: the decode becomes encoder + one ``pallas_call``.

The kernel is **utterance-grouped**: each grid step decodes G utterances
together (default 16).  Grid steps are sequential on a TPU core, so
per-utterance grids serialize the many small VPU ops (the top-k rounds)
64x at batch 64; grouping turns the thin per-utterance matmuls into
(G*K)-row MXU matmuls and makes every top-k/merge round process G
utterances in the same vector op.  Per-utterance gathers become ONE
block-diagonal one-hot matmul over the grouped rows.

Scope: the flagship configuration (conv location attention, softmax
energy normalizer, single-layer GRU decoder, embedding feedback,
weighted-averages readout with one tanh post-merge layer,
log-likelihood criterion, no decode constraint) — plus the
non-flagship variants of the shipped config families: multi-filter
conv attention and content-only attention (``n_filters``), logistic /
relu energy normalizers, states-for-readout, and maxout / relu /
sigmoid / identity post-merge activations — and INCLUDING

* **wide beams** (reference decode.sh uses up to 200): the top-k /
  done-merge selection rounds roll into ``lax.fori_loop`` above 32
  slots (unrolled below), and the (G,K,L,M) attention-match tensor is
  computed in static L-chunks when it exceeds the VMEM budget.

FST shallow fusion is deliberately NOT in this kernel.  Rounds 2–4
carried an in-kernel LM (live state set in VMEM scratch, one-hot
matmul table gathers): its Mosaic compile grew super-linearly with the
state count (2 min at 242 states, never finished at >=507; round-5
remeasurement: >9.5 min cold at 242 states through the tunnel), so it
was gated to <=256-state graphs — below every real decoding graph —
while the XLA decode path with load-densified HBM tables
(``models/lm.py``) measures the SAME throughput at every graph scale
(266 utt/s at 1058 states, 282 utt/s at 113k states, v5e beam 10).  A
path that compiles for minutes, is routed off everywhere that matters,
and wins nothing where it runs is complexity without evidence — LM
decode is owned by the XLA route (``search/beam.py _search_core``),
matching the reference's split (its FST runtime is a 294-line host
module, lvsr/ops.py).

The XLA path in :mod:`attention_lvcsr_tpu.search.beam` remains for
everything else and is the semantic reference — this kernel replicates
it exactly (same candidate selection tie-breaking, same stopping
bookkeeping; see ``tests/test_beam_loop.py`` for the parity suite).

Reference pedigree of the semantics: ``blocks/search.py:244-399``.

Per-group grid; all compute in f32 regardless of the HBM dtype.
Dynamic-structure tricks (no dynamic shapes inside kernels):

* top-k over the (G, K*V) candidate grid = K rounds of (row-min,
  lowest-flat-index argmin, mask-out) — identical tie order to
  ``lax.top_k`` of the negated costs;
* hypothesis gathers are block-diagonal one-hot permutation matmuls
  (MXU), built from row/column iota comparisons.  Mosaic f32 matmuls
  run in bf16 passes and perturb copied values in the last ulps, so
  equality-based selections never consume raw matmul copies;
* the done-set merge is the same selection over the per-utterance
  (2K,) adjusted costs, existing entries first (ties keep the old one,
  like the XLA path);
* the 2n+1-tap convolution over alignment weights is a banded-Toeplitz
  matmul and the median-window cumsum is an upper-triangular matmul
  (both from ops/pallas/decode_score.py).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 1e9
BIG = 3e38
NEG = -1e30
PATIENCE = 30
NOT_STATE = -1.0
# selection rounds unroll below this many slots, fori_loop above
UNROLL_SLOTS = 32

# Profiling instrument (tools/prof_kernel_phases.py): phase names in this
# set are replaced at TRACE TIME with shape-preserving stand-ins, so the
# per-step cost of each phase can be attributed by differencing against
# the full kernel.  Ablated kernels decode GARBAGE — never set outside
# the profiler.  Valid names: attention, wa, logits, topk, gather, gru,
# merge.
ABLATE: frozenset = frozenset()


def _kernel(*refs,
            beam, group, max_len, eol, stop_on, ignore_first_eol,
            char_discount, round_to_inf, prior, before, after,
            initial_begin, initial_end, min_speed, max_speed,
            l_chunk,
            normalizer, states_readout, maxout, post_act, n_filters,
            dec_stack, mse_cost):
    n_in = (23 + (2 if dec_stack > 1 else 0)
            + (1 if states_readout else 0))
    (pre_ref, att_ref, mask_ref,
     toep_ref, tri_ref, st_ref, handler_ref, v_ref,
     merge_ref, mergeb_ref, post_ref, postb_ref,
     embed_ref, fin_ref, finb_ref, fgate_ref, fgateb_ref,
     din_ref, dgate_ref, wsg_ref, wss_ref, h0_ref,
     eb_ref) = refs[:23]
    nxt = 23
    if dec_stack > 1:
        iin_ref, igate_ref = refs[nxt:nxt + 2]
        nxt += 2
    if states_readout:
        ms_ref = refs[nxt]
        nxt += 1
    (done_out_ref, done_meta_ref, steps_ref) = refs[n_in:n_in + 3]
    (h_sc, w_sc, aout_sc, acost_sc, dout_sc, dcost_sc, dadj_sc,
     dlen_sc) = refs[n_in + 3:n_in + 11]

    f32 = jnp.float32
    K = beam
    G = group
    R = G * K                                  # grouped hypothesis rows
    L = pre_ref.shape[1]
    M = st_ref.shape[-1]
    S = h_sc.shape[-1] // dec_stack            # per-layer state dim
    V = post_ref.shape[-1]
    Lout = aout_sc.shape[-1]

    pre = pre_ref[:].astype(f32)              # (G, L, M)
    attended = att_ref[:].astype(f32)         # (G, L, D)
    att_mask = mask_ref[:, 0, :].astype(f32)  # (G, L)
    toep = toep_ref[:].astype(f32)            # (L, n_filters*L)
    tri = tri_ref[:].astype(f32)
    st = st_ref[:].astype(f32)
    handler = handler_ref[:].astype(f32)      # (n_filters, M)
    v = v_ref[:].astype(f32)                  # (M, 1)
    merge_k = merge_ref[:].astype(f32)
    merge_b = mergeb_ref[:].astype(f32)
    post_k = post_ref[:].astype(f32)
    post_b = postb_ref[:].astype(f32)
    e_bias = eb_ref[0, 0].astype(f32)
    if states_readout:
        merge_s = ms_ref[:].astype(f32)       # (S, Rm)
    embed = embed_ref[:].astype(f32)          # (Vf, F)
    fin = fin_ref[:].astype(f32)
    finb = finb_ref[:].astype(f32)
    fgate = fgate_ref[:].astype(f32)
    fgateb = fgateb_ref[:].astype(f32)
    din = din_ref[:].astype(f32)
    dgate = dgate_ref[:].astype(f32)
    wsg = wsg_ref[:].astype(f32)              # (S, stack*2S)
    wss = wss_ref[:].astype(f32)              # (S, stack*S)
    if dec_stack > 1:
        inter_in = iin_ref[:].astype(f32)     # (S, (stack-1)*S)
        inter_gate = igate_ref[:].astype(f32)

    pos_g = jax.lax.broadcasted_iota(jnp.int32, (G, L), 1).astype(f32)
    pos_r = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1).astype(f32)
    slot_r = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) % K
    out_cols = jax.lax.broadcasted_iota(jnp.int32, (R, Lout), 1)
    # flat candidate index k*V + v of each (row, symbol) within its
    # utterance — the XLA path's reshape order (lowest flat index wins
    # ties); laid out row-space so no sublane->lane reshape is needed
    flat_rv = (slot_r * V
               + jax.lax.broadcasted_iota(jnp.int32, (R, V), 1))
    iota_2k = jax.lax.broadcasted_iota(jnp.int32, (G, 2 * K), 1)
    # block-diagonal helpers over grouped rows
    rows_r = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    cols_r = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    rows_2r = jax.lax.broadcasted_iota(jnp.int32, (R, 2 * R), 0)
    cols_2r = jax.lax.broadcasted_iota(jnp.int32, (R, 2 * R), 1)

    def dot(a, b):
        # Precision.HIGHEST is REQUIRED, not a nicety: Mosaic's default
        # f32 matmul is a single bf16 pass (measured on chip: one-hot
        # copies come back bf16-rounded, 4e-3 relative).  Every one-hot
        # gather/permutation in this kernel would corrupt costs without
        # it; HIGHEST one-hot copies are bit-exact.  The handful of
        # genuine compute matmuls here are tiny (R x D-ish), so the
        # extra MXU passes are noise in this latency-bound kernel.
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST)

    def rows_to_groups(x):                     # (R, 1) -> (G, K)
        return x.reshape(G, K)

    def per_group(x):                          # (G, 1) -> (R, 1)
        # EXACT broadcast (single-lane reshapes are layout-free in
        # Mosaic).  A one-hot matmul would NOT be exact — Mosaic f32
        # matmuls run in bf16 passes, and a last-ulp perturbation here
        # breaks the equality-based argmin selections below.
        return jnp.broadcast_to(x.reshape(G, 1, 1),
                                (G, K, 1)).reshape(R, 1)


    # ---- init ------------------------------------------------------------
    rows_dead = (jnp.sum(att_mask, axis=1, keepdims=True) == 0.0)  # (G,1)
    dead_r = per_group(rows_dead.astype(f32)) > 0.5                # (R,1)
    h_sc[:] = jnp.broadcast_to(h0_ref[:].astype(f32),
                               (R, S * dec_stack))
    w_sc[:] = (pos_r == 0.0).astype(f32)
    aout_sc[:] = jnp.zeros((R, Lout), f32)
    dout_sc[:] = jnp.zeros((R, Lout), f32)
    acost_sc[:] = jnp.where((slot_r == 0) & ~dead_r, 0.0, INF)
    dcost_sc[:] = jnp.full((R, 1), INF, f32)
    dadj_sc[:] = jnp.full((R, 1), INF, f32)
    dlen_sc[:] = jnp.zeros((R, 1), f32)

    def body(i, carry):
        patience, min_cost, stopped, steps = carry      # (G,1) each
        dadj_g = rows_to_groups(dadj_sc[:])             # (G, K)
        valid = dadj_g < INF / 2
        has_done = jnp.max(valid.astype(f32), axis=1,
                           keepdims=True) > 0.0         # (G,1)
        best_adj = jnp.min(dadj_g, axis=1, keepdims=True)
        alive_g = rows_to_groups(acost_sc[:])           # (G, K)
        alive_min = jnp.min(alive_g, axis=1, keepdims=True)
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
            kth_adj = jnp.max(jnp.where(valid, dadj_g, -INF), axis=1,
                              keepdims=True)
            optimistic = alive_min - char_discount * float(max_len)
            newly = (jnp.min(valid.astype(f32), axis=1, keepdims=True)
                     > 0.0) & (kth_adj < optimistic)
        # ``stopped`` rides the fori carry as f32 0/1 — i1 vectors in
        # scf.for carries fail Mosaic legalization
        stopped = jnp.maximum(stopped,
                              jnp.maximum(newly.astype(f32),
                                          empty.astype(f32)))  # (G, 1)
        steps = jnp.where(stopped > 0.5, steps, i + 1)
        live = per_group(stopped) < 0.5                 # (R, 1) bool

        w = w_sc[:]                                     # (R, L)
        h = h_sc[:]                                     # (R, S)

        # ---- window prior ------------------------------------------
        # ``gmask`` (the energy cut + conv input mask) is window-only;
        # the attention mask enters ``combined`` (the softmax support)
        # only — exactly like the reference/XLA path.
        # ---- attention phase (window prior + energies + normalize);
        # skippable as one unit by the phase profiler ---------------
        if "attention" in ABLATE:
            wnew, bad_row = w, None            # profiling stand-in
        else:
            att_rows = jnp.broadcast_to(att_mask[:, None, :],
                                        (G, K, L)).reshape(R, L)

            def broadcast_rows(x_g):                        # (G, L) -> (R, L)
                return jnp.broadcast_to(x_g[:, None, :],
                                        (G, K, L)).reshape(R, L)

            if prior == "expanding":
                step0 = jnp.asarray(i, f32)
                begin = jnp.maximum(0.0, jnp.minimum(
                    float(L - 1), initial_begin + step0 * min_speed))
                end = jnp.maximum(0.0, jnp.minimum(
                    float(L), initial_end + step0 * max_speed))
                begin = jnp.floor(begin)
                end = jnp.ceil(end)
                gmask = broadcast_rows(
                    ((pos_g >= begin) & (pos_g < end)).astype(f32))
                combined = gmask * att_rows
            else:
                if prior == "window_around_mean":
                    expected = (w * pos_r).sum(axis=1, keepdims=True)
                else:  # window_around_median
                    cs = dot(w, tri)                        # (R, L)
                    below = (cs < 0.5).astype(f32).sum(axis=1, keepdims=True)
                    expected = jnp.maximum(0.0, below - 1.0)
                begins = jnp.floor(expected - before)       # (R, 1)
                ends = jnp.ceil(expected + after)
                gb = jnp.floor(jnp.maximum(
                    0.0, jnp.min(rows_to_groups(begins.reshape(R, 1)),
                                 axis=1, keepdims=True)))   # (G, 1)
                ge = jnp.ceil(jnp.minimum(
                    float(L), jnp.max(rows_to_groups(ends.reshape(R, 1)),
                                      axis=1, keepdims=True)))
                gmask = broadcast_rows(
                    ((pos_g >= gb) & (pos_g < ge)).astype(f32))
                additional = ((pos_r > begins) & (pos_r < ends)).astype(f32)
                combined = gmask * additional * att_rows

            # ---- energies (conv via Toeplitz matmul) ---------------------
            # The (G, K, Lt, M) match tensor is the kernel's dominant
            # intermediate; ``l_chunk`` bounds it for wide beams/long audio
            # (static chunking — concat over lane tiles).
            # n_filters == 0: content-only attention, no conv term at all
            conv = (dot(w * gmask, toep) if n_filters    # (R, n_filters*L)
                    else None)
            sp = dot(h, st)                                 # (R, M)
            parts = []
            step_l = l_chunk or L
            for l0 in range(0, L, step_l):
                lt = min(step_l, L - l0)
                # filter_handler's Dense(Fc -> M) as a sum of rank-1 terms
                # (one per filter) — identical reduction order to the XLA
                # path's matmul over the filter axis
                conv_term = 0.0
                for f in range(n_filters):
                    c = conv[:, f * L + l0:f * L + l0 + lt]
                    conv_term = conv_term + (
                        c.reshape(G, K, lt, 1)
                        * handler[f].reshape(1, 1, 1, M))
                match = jnp.tanh(
                    pre[:, l0:l0 + lt].reshape(G, 1, lt, M)
                    + sp.reshape(G, K, 1, M)
                    + conv_term)
                # energy matvec as a VPU lane-reduce over M, NOT
                # reshape(R*lt, M) @ (M, 1): reshaping the computed 4D
                # match across the lt/M boundary forces a Mosaic
                # relayout whose compile cost sank the training kernel
                # (evidence/r05_compile_fix.json), and at HIGHEST
                # precision the MXU matvec pays 6 bf16 passes over the
                # kernel's dominant intermediate to use 1/128 of the
                # array.  The leading (G, K) merge below is layout-free.
                parts.append(
                    (match * v.reshape(1, 1, 1, M)).sum(axis=3)
                    .reshape(R, lt) + e_bias)
            energies = (parts[0] if len(parts) == 1
                        else jnp.concatenate(parts, axis=1))    # (R, L)

            # ---- masked normalization (attention.py:_normalize) ----------
            if normalizer == "softmax":
                masked = jnp.where(gmask > 0, energies, NEG)
                mx = jnp.max(masked, axis=1, keepdims=True)
                mx = jnp.where(mx > NEG / 2, mx, 0.0)
                unnorm = jnp.exp(energies - mx) * combined
            elif normalizer == "logistic":
                unnorm = jax.nn.sigmoid(energies) * combined
            else:  # relu
                unnorm = jnp.maximum(energies / 1000.0, 0.0) * combined
            denom = unnorm.sum(axis=1, keepdims=True) + \
                (combined.sum(axis=1, keepdims=True) == 0).astype(f32)
            # relu is the one normalizer whose unnormalized weights can be
            # all-zero over a nonzero mask (all energies <= 0): the XLA path
            # divides 0/0 there and the row's NaN candidates simply lose
            # lax.top_k and are never gathered.  Here NaN would poison the
            # min-based selection AND the one-hot gather matmuls (0*NaN), so
            # give such rows zero weights and force their candidates to lose
            # the selection below — the same observable outcome.
            if normalizer == "relu":
                bad_row = denom == 0.0                      # (R, 1)
                denom = denom + bad_row.astype(f32)
            else:
                bad_row = None
            wnew = unnorm / denom                           # (R, L)

        # ---- readout (weighted averages, batched per utterance) ------
        # batched dot keeps each utterance's accumulation order
        # identical to the ungrouped kernel (a block-diagonal matmul
        # would sum over G*L terms and perturb last-ulp rounding)
        if "wa" in ABLATE:
            wa = jnp.broadcast_to(wnew[:, :1],
                                  (R, attended.shape[-1]))  # stand-in
        else:
            wa = jax.lax.dot_general(
                wnew.reshape(G, K, L), attended,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=f32,
                precision=jax.lax.Precision.HIGHEST
            ).reshape(R, -1)                                 # (R, D)
        if "logits" in ABLATE:                  # profiling stand-in
            costs = jnp.broadcast_to(wa[:, :1], (R, V))
        else:
            merged = dot(wa, merge_k) + merge_b
            if states_readout:
                merged = merged + dot(h, merge_s)
            if maxout:
                # max over groups of ``maxout`` consecutive units
                # (Readout._activation): value selection by exact 0/1
                # matmuls (one nonzero per output), then elementwise max
                Rm = merged.shape[1]
                rows_m = jax.lax.broadcasted_iota(
                    jnp.int32, (Rm, Rm // maxout), 0)
                cols_m = jax.lax.broadcasted_iota(
                    jnp.int32, (Rm, Rm // maxout), 1)
                piece0 = None
                for p in range(maxout):
                    sel = (rows_m == cols_m * maxout + p).astype(f32)
                    val = dot(merged, sel)                  # (R, Rm//maxout)
                    piece0 = val if piece0 is None else \
                        jnp.maximum(piece0, val)
                act = piece0
            elif post_act in ("relu", "rectifier"):
                act = jnp.maximum(merged, 0.0)
            elif post_act in ("sigmoid", "logistic"):
                act = jax.nn.sigmoid(merged)
            elif post_act == "identity":
                act = merged
            else:
                act = jnp.tanh(merged)
            logits = dot(act, post_k) + post_b              # (R, V)
            if mse_cost:
                # task-loss models: readouts are predicted gains, the
                # emitter cost is their negation (RewardRegressionEmitter)
                costs = -logits
            else:
                lmx = jnp.max(logits, axis=1, keepdims=True)
                lse = lmx + jnp.log(
                    jnp.sum(jnp.exp(logits - lmx), axis=1, keepdims=True))
                costs = lse - logits                        # (R, V)
            if bad_row is not None:
                costs = jnp.where(bad_row, BIG, costs)

        # ---- top-k over each utterance's K*V candidates --------------
        # Candidates stay in row space (R, V); per-utterance reductions
        # go lane-min -> (R,1) -> (G,K) reshape -> lane-min -> (G,1),
        # and come back to rows through the per_group broadcast.  K
        # rounds, each selecting one winner for ALL G utterances —
        # unrolled for small beams, fori_loop for wide ones.
        alive = acost_sc[:]                             # (R, 1)

        def sel_round(slot, sel):
            work, src, symf, chosen = sel
            m = jnp.min(rows_to_groups(
                jnp.min(work, axis=1, keepdims=True)),
                axis=1, keepdims=True)                  # (G, 1)
            m_r = per_group(m)                          # (R, 1)
            cand = jnp.where(work == m_r, flat_rv, K * V)
            idx = jnp.min(rows_to_groups(
                jnp.min(cand, axis=1, keepdims=True)),
                axis=1, keepdims=True)                  # (G, 1)
            idx_r = per_group(idx.astype(f32)).astype(jnp.int32)
            work = jnp.where(flat_rv == idx_r, BIG, work)
            mine = slot_r == slot
            src = jnp.where(mine, idx_r // V, src)
            symf = jnp.where(mine, (idx_r % V).astype(f32), symf)
            chosen = jnp.where(mine, m_r, chosen)
            return work, src, symf, chosen

        sel0 = (alive + costs, jnp.zeros((R, 1), jnp.int32),
                jnp.zeros((R, 1), f32), jnp.zeros((R, 1), f32))
        if "topk" in ABLATE:                   # profiling stand-in
            src = jnp.zeros((R, 1), jnp.int32)
            symbols = jnp.zeros((R, 1), f32)
            chosen = alive + costs[:, :1]
        else:
            if K <= UNROLL_SLOTS:
                for slot in range(K):
                    sel0 = sel_round(slot, sel0)
            else:
                sel0 = jax.lax.fori_loop(0, K, sel_round, sel0)
            _, src, symbols, chosen = sel0              # symbols (R,1) f32

        # ---- gather by source beam row (block-diag one-hot matmul) ---
        if "gather" in ABLATE:                 # profiling stand-in
            prev_costs, h_src, w_src, wa_src = alive, h, wnew, wa
            aout = aout_sc[:]
        else:
            src_flat = (rows_r // K) * K + src          # (R, R) bcast
            perm = (cols_r == src_flat).astype(f32)     # (R, R)
            prev_costs = dot(perm, alive)               # (R, 1)
            h_src = dot(perm, h)
            w_src = dot(perm, wnew)
            wa_src = dot(perm, wa)
            aout = dot(perm, aout_sc[:])                # (R, Lout)

        # ---- record symbol -------------------------------------------
        aout_col = jnp.where(out_cols == i, symbols, aout)
        alive_len = jnp.asarray(i + 1, f32)
        step_costs = chosen - prev_costs

        # ---- GRU advance (stacked layers advance sequentially:
        # layer i>0 adds interlayer projections of the layer below's
        # UPDATED state — generator._compute_states) -------------------
        if "gru" in ABLATE:                 # profiling stand-in
            h_new = h_src
        else:
            fb_onehot = (jax.lax.broadcasted_iota(
                jnp.int32, (R, embed.shape[0]), 1).astype(f32)
                == symbols).astype(f32)
            fb = dot(fb_onehot, embed)                      # (R, F)
            gate_in = dot(fb, fgate) + fgateb + dot(wa_src, dgate)
            in_tot = dot(fb, fin) + finb + dot(wa_src, din)
            h_parts = []
            below = None
            for ly in range(dec_stack):            # NOT i — that's the step
                h_i = h_src[:, ly * S:(ly + 1) * S]
                gi = gate_in[:, ly * 2 * S:(ly + 1) * 2 * S]
                ii = in_tot[:, ly * S:(ly + 1) * S]
                if ly > 0:
                    gi = gi + dot(
                        below, inter_gate[:, (ly - 1) * 2 * S:ly * 2 * S])
                    ii = ii + dot(below, inter_in[:, (ly - 1) * S:ly * S])
                gates = jax.nn.sigmoid(
                    dot(h_i, wsg[:, ly * 2 * S:(ly + 1) * 2 * S]) + gi)
                update = gates[:, :S]
                reset = gates[:, S:]
                cand = jnp.tanh(
                    dot(h_i * reset, wss[:, ly * S:(ly + 1) * S]) + ii)
                h_parts.append(update * cand + (1.0 - update) * h_i)
                below = h_parts[-1]
            h_new = (h_parts[0] if dec_stack == 1
                     else jnp.concatenate(h_parts, axis=1))

        # ---- EOS retirement ------------------------------------------
        is_eos = symbols == float(eol)
        if ignore_first_eol:
            is_eos = is_eos & (i > 0)
        finishing = (is_eos & (step_costs < round_to_inf)
                     & (prev_costs < INF / 2) & live)
        adjusted = chosen - char_discount * (alive_len + 1.0)
        new_adj = jnp.where(finishing, adjusted, INF)

        if "merge" in ABLATE:               # profiling stand-in
            dadj_new = jnp.minimum(dadj_sc[:], new_adj)
            dcost_new = dcost_sc[:]
            dlen_new = dlen_sc[:]
            dout_new = dout_sc[:]
        else:
            # ---- done-set merge (2K -> K per utterance, old entries win
            # ties).  Candidate order: [existing K, new K] per utterance.
            def merge_round(slot, mrg):
                workd, pick = mrg
                m = jnp.min(workd, axis=1, keepdims=True)
                idx = jnp.min(jnp.where(workd == m, iota_2k, 2 * K),
                              axis=1, keepdims=True)        # (G,1)
                workd = jnp.where(iota_2k == idx, BIG, workd)
                idx_r = per_group(idx.astype(f32)).astype(jnp.int32)
                pick = jnp.where(slot_r == slot, idx_r, pick)
                return workd, pick

            mrg0 = (jnp.concatenate(
                [rows_to_groups(dadj_sc[:]),
                 rows_to_groups(new_adj)], axis=1),          # (G, 2K)
                jnp.zeros((R, 1), jnp.int32))
            if K <= UNROLL_SLOTS:
                for slot in range(K):
                    mrg0 = merge_round(slot, mrg0)
            else:
                mrg0 = jax.lax.fori_loop(0, K, merge_round, mrg0)
            _, pick = mrg0
            # flat row in the stacked [done (R); alive (R)] candidate array
            g_of_row = rows_2r // K
            pick_flat = jnp.where(pick < K,
                                  g_of_row * K + pick,
                                  R + g_of_row * K + (pick - K))
            perm2 = (cols_2r == pick_flat).astype(f32)      # (R, 2R)

            def merge(done_col, new_col):
                return dot(perm2, jnp.concatenate([done_col, new_col],
                                                  axis=0))

            dadj_new = merge(dadj_sc[:], new_adj)
            dcost_new = merge(dcost_sc[:], chosen)
            dlen_new = merge(dlen_sc[:],
                             jnp.full((R, 1), alive_len, f32))
            dout_new = merge(dout_sc[:], aout_col)

        # ---- commit state (stopped utterances keep everything) -------
        h_sc[:] = jnp.where(live, h_new, h)
        w_sc[:] = jnp.where(live, w_src, w)
        aout_sc[:] = jnp.where(live, aout_col, aout_sc[:])
        acost_sc[:] = jnp.where(live, jnp.where(is_eos, INF, chosen),
                                acost_sc[:])
        dadj_sc[:] = jnp.where(live, dadj_new, dadj_sc[:])
        dcost_sc[:] = jnp.where(live, dcost_new, dcost_sc[:])
        dlen_sc[:] = jnp.where(live, dlen_new, dlen_sc[:])
        dout_sc[:] = jnp.where(live, dout_new, dout_sc[:])

        return patience, min_cost, stopped, steps

    carry0 = (jnp.full((G, 1), PATIENCE, jnp.int32),
              jnp.full((G, 1), 1000.0, f32),
              rows_dead.astype(f32),
              jnp.zeros((G, 1), jnp.int32))
    if os.environ.get("LVSR_BEAM_NO_EARLY_EXIT"):
        _, _, _, steps = jax.lax.fori_loop(0, max_len, body, carry0)
    else:
        # Early exit: once every utterance in this grid-step's group has
        # stopped, the remaining (max_len - i) iterations are pure waste
        # — the body only re-reads scratch and masks all its commits.
        # Measured on a trained model (steps << max_len) this is the
        # difference between paying for ~30 steps and paying for 300.
        # ``stopped`` rides the carry as f32 0/1 (G, 1); the scalar
        # reduce in the condition is legal Mosaic.
        def w_cond(c):
            i = c[0]
            stopped = c[3]
            return (i < max_len) & (jnp.min(stopped) < 0.5)

        def w_body(c):
            i = c[0]
            return (i + 1,) + body(i, c[1:])

        fin = jax.lax.while_loop(w_cond, w_body,
                                 (jnp.int32(0),) + carry0)
        steps = fin[4]

    done_out_ref[:] = dout_sc[:].reshape(G, K, Lout).astype(jnp.int32)
    done_meta_ref[:] = jnp.concatenate(
        [dcost_sc[:], dadj_sc[:], dlen_sc[:]],
        axis=1).reshape(G, K, 3)
    steps_ref[:] = steps.reshape(G, 1, 1)


# the (G, K, Lt, M) match tensor is chunked over L to stay below this
MATCH_VMEM_BUDGET = 48 << 20


def pick_l_chunk(beam, group, length, match_dim):
    """Static L-chunk (multiple of 128 for clean lane slicing) keeping
    the match tensor below MATCH_VMEM_BUDGET; None = no chunking."""
    rows = beam * group
    if rows * length * match_dim * 4 <= MATCH_VMEM_BUDGET:
        return None
    lt = (MATCH_VMEM_BUDGET // (rows * match_dim * 4)) // 128 * 128
    return max(128, int(lt))


@functools.partial(
    jax.jit,
    static_argnames=("beam", "max_len", "eol", "stop_on",
                     "ignore_first_eol", "char_discount", "round_to_inf",
                     "prior", "before", "after", "initial_begin",
                     "initial_end", "min_speed", "max_speed", "group",
                     "normalizer", "states_readout",
                     "maxout", "post_act", "content_attention",
                     "dec_stack", "mse_cost", "interpret"))
def beam_search_loop(pre, attended, att_mask, tables, *,
                     beam, max_len, eol, stop_on="patience",
                     ignore_first_eol=False, char_discount=0.0,
                     round_to_inf=1e9, prior="expanding", before=0.0,
                     after=0.0, initial_begin=0.0, initial_end=1e4,
                     min_speed=0.0, max_speed=0.0, group=16,
                     normalizer="softmax",
                     states_readout=False, maxout=0, post_act="tanh",
                     content_attention=False, dec_stack=1,
                     mse_cost=False, interpret=False):
    """Run the full decode loop.  Returns (done_out (U,K,max_len) int32,
    done_meta (U,K,3) [cost, adjusted, len] f32, steps (U,) int32).

    ``tables`` is the dict from
    ``SequenceGenerator.loop_decode_tables`` (dense weight tables).
    ``group``: utterances decoded together per grid step; the batch is
    padded up to a multiple (padded rows are fully-masked and retire
    immediately).
    """
    U, L, M = pre.shape
    D = attended.shape[-1]
    Fc = tables["toeplitz"].shape[-1] // L
    n_filt = 0 if content_attention else Fc
    S = tables["wss"].shape[0]
    NS = int(dec_stack) * S                    # stacked state width
    R = tables["merge_k"].shape[-1]
    Ra = tables["post_k"].shape[0]
    V = tables["post_k"].shape[-1]
    Vf = tables["embed"].shape[0]
    F = tables["embed"].shape[-1]
    K = beam
    f32 = jnp.float32
    Lout = int(max_len)
    G = max(1, min(int(group), U))
    U_pad = -(-U // G) * G
    if U_pad != U:
        zeros = lambda a: jnp.zeros((U_pad - U,) + a.shape[1:], a.dtype)
        pre = jnp.concatenate([pre, zeros(pre)])
        attended = jnp.concatenate([attended, zeros(attended)])
        att_mask = jnp.concatenate([att_mask, zeros(att_mask)])

    kernel = functools.partial(
        _kernel, beam=K, group=G, max_len=Lout, eol=int(eol),
        stop_on=stop_on, ignore_first_eol=bool(ignore_first_eol),
        char_discount=float(char_discount),
        round_to_inf=float(round_to_inf), prior=prior,
        before=float(before), after=float(after),
        initial_begin=float(initial_begin),
        initial_end=float(initial_end), min_speed=float(min_speed),
        max_speed=float(max_speed),
        l_chunk=pick_l_chunk(K, G, L, M),
        normalizer=str(normalizer), states_readout=bool(states_readout),
        maxout=int(maxout), post_act=str(post_act),
        n_filters=int(n_filt), dec_stack=int(dec_stack),
        mse_cost=bool(mse_cost))
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024)

    full = lambda *dims: pl.BlockSpec(dims, lambda u: (0,) * len(dims))
    perg = lambda *dims: pl.BlockSpec((G,) + dims,
                                      lambda u: (u,) + (0,) * len(dims))
    in_specs = [
        perg(L, M),             # pre
        perg(L, D),             # attended
        perg(1, L),             # att_mask
        full(L, Fc * L),        # toeplitz (filter-major lane stack)
        full(L, L),             # tri
        full(NS, M),            # state_trans (row-stacked over layers)
        full(Fc, M),            # handler
        full(M, 1),             # v
        full(D, R),             # merge kernel
        full(1, R),             # merge bias
        full(Ra, V),            # post kernel (maxout shrinks R -> Ra)
        full(1, V),             # post bias
        full(Vf, F),            # feedback embedding
        full(F, NS),            # fork inputs W (lane-stacked layers)
        full(1, NS),            # fork inputs b
        full(F, 2 * NS),        # fork gates W
        full(1, 2 * NS),        # fork gates b
        full(D, NS),            # distribute inputs W
        full(D, 2 * NS),        # distribute gates W
        full(S, 2 * NS),        # GRU state_to_gates (lane-stacked)
        full(S, NS),            # GRU state_to_state (lane-stacked)
        full(1, NS),            # GRU initial state
        full(1, 1),             # energy bias (non-softmax normalizers)
    ]
    inputs = [pre, attended, att_mask.reshape(U_pad, 1, L),
              tables["toeplitz"], tables["tri"], tables["state_trans"],
              tables["handler"].reshape(Fc, M),
              tables["v"].reshape(M, 1),
              tables["merge_k"], tables["merge_b"].reshape(1, R),
              tables["post_k"], tables["post_b"].reshape(1, V),
              tables["embed"], tables["fork_in_w"],
              tables["fork_in_b"].reshape(1, NS),
              tables["fork_gate_w"],
              tables["fork_gate_b"].reshape(1, 2 * NS),
              tables["dist_in_w"], tables["dist_gate_w"],
              tables["wsg"], tables["wss"],
              tables["h0"].reshape(1, NS),
              tables["energy_b"].reshape(1, 1).astype(jnp.float32)]
    if dec_stack > 1:
        in_specs += [full(S, (dec_stack - 1) * S),
                     full(S, (dec_stack - 1) * 2 * S)]
        inputs += [tables["inter_in_w"], tables["inter_gate_w"]]
    if states_readout:
        in_specs.append(full(NS, R))
        inputs.append(tables["merge_states_k"])
    scratch_shapes = [
        pltpu.VMEM((G * K, NS), f32),         # h (all stack layers)
        pltpu.VMEM((G * K, L), f32),          # weights
        pltpu.VMEM((G * K, Lout), f32),       # alive_out
        pltpu.VMEM((G * K, 1), f32),          # alive_costs
        pltpu.VMEM((G * K, Lout), f32),       # done_out (f32 work)
        pltpu.VMEM((G * K, 1), f32),          # done cost
        pltpu.VMEM((G * K, 1), f32),          # done adjusted
        pltpu.VMEM((G * K, 1), f32),          # done len
    ]

    done_out, done_meta, steps = pl.pallas_call(
        kernel,
        grid=(U_pad // G,),
        in_specs=in_specs,
        out_specs=(perg(K, Lout), perg(K, 3), perg(1, 1)),
        out_shape=(
            jax.ShapeDtypeStruct((U_pad, K, Lout), jnp.int32),
            jax.ShapeDtypeStruct((U_pad, K, 3), f32),
            jax.ShapeDtypeStruct((U_pad, 1, 1), jnp.int32),
        ),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        **kwargs,
    )(*inputs)
    return done_out[:U], done_meta[:U], steps.reshape(U_pad)[:U]
