"""Fused teacher-forced attention-decoder scan with a custom VJP.

The training sibling of the fused decode-score cell
(:mod:`.decode_score`): the whole label-time loop of
``SequenceGenerator.evaluate`` — windowed prior, Toeplitz-matmul
alignment convolution, match/tanh/energy, masked softmax, weighted
average, and the GRU transition — runs as ONE Pallas kernel pair
(forward + reverse-grid backward), eliminating the per-step fusion
dispatches an XLA ``lax.scan`` backward pays (the decoder was ~45 % of
the flagship train step, almost all of it in the backward while-loop).

Design notes (same playbook as :mod:`.gru_train` / :mod:`.decode_score`):

* the label-step recurrence carries (h, weights, wa) in VMEM scratch
  across grid steps; chunked time steps amortize block fetches;
* ``pre`` (B, L, M) and ``attended`` (B, L, D) stay VMEM-resident for
  the whole loop (constant block index);
* residuals streamed to HBM are exactly the per-step outputs the
  backward needs: masked h/weights/wa plus the unmasked GRU gate
  activations — the attention match tensor is RECOMPUTED in the
  backward from (h_prev, w_prev) instead of streaming (T, B, L, M);
* window-prior masks are non-differentiable (floor/compare), matching
  the XLA path's stop-gradient median;
* parameter gradients (state-trans, handler, energy vector, Toeplitz,
  GRU + distribute matrices) accumulate in f32 across the reverse grid;
  the Toeplitz gradient maps back to the conv taps through the
  differentiable band construction outside the kernel.

Applicability is checked by the caller (``models/generator.py``):
content+conv attention (any filter count; the Toeplitz bands stack
filter-major along lanes) or content-only attention (``n_filters=0``),
softmax/logistic/relu energy normalizers (with the biased energy
projection the non-softmax ones use), stacked GRU decoders (lane-
stacked per-layer tables; layer i > 0 adds interlayer projections of
the layer below's unmasked updated state, recomputed from residuals in
the backward), no LM.
States-for-readout and any post-merge activation compose freely (the
readout happens outside the scan).  Reference semantics:
``blocks/bricks/sequence_generators.py`` evaluate +
``lvsr/bricks/attention.py:75-168``.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from attention_lvcsr_tpu.ops.pallas.common import HAS_PLTPU as _HAS_PLTPU
from attention_lvcsr_tpu.ops.pallas.common import dot as _dot
from attention_lvcsr_tpu.ops.pallas.common import pad_time as _pad_time
from attention_lvcsr_tpu.ops.pallas.common import pltpu

NEG = -1e30
CHUNK = 4

# VMEM working-set budget per batch block.  v5e has ~128 MB of VMEM and
# the pallas_call asserts vmem_limit_bytes=100 MB; the bytes model below
# is an estimate (Mosaic adds register-allocator slack), so the picker
# targets well under the limit.
VMEM_BUDGET = 72 * 1024 * 1024


def _fwd_bytes(BB, C, L, M, D, NS, Fh):
    """Estimated forward-kernel VMEM bytes at batch block ``BB``."""
    elems = (
        BB * L * (M + D) + BB * L            # pre, attended, amask
        + L * Fh * L + L * L + NS * M        # toep, tri, state_trans
        + BB * 2 * (NS + L + D + L)          # init rows + carry scratch
        + 2 * C * BB * 3 * NS                # seq inputs (double-buffered)
        + 2 * C * BB * (4 * NS + 2 * L + D)  # seq outputs
        + 2 * BB * L * M + BB * L * D        # match + conv_term + wa temp
        + BB * Fh * L                        # conv
    )
    return 4 * elems


def _bwd_bytes(BB, C, L, M, D, NS, Fh):
    """Estimated backward-kernel VMEM bytes at batch block ``BB``.

    Round 3's failure: at B=64/L=200/M=250/D=500 the un-blocked
    backward wanted 179.31 MB (92.5 MB register spill from the
    (B,L,M)/(B,L,D) grad accumulators held live across the chunk loop).
    The accumulators now live in the output refs and the batch is
    blocked, so this model bounds the true working set."""
    elems = (
        2 * BB * L * (M + D) + BB * L        # pre/att + dpre/datt refs
        + L * Fh * L + L * L + NS * M        # toep, tri, state_trans
        + BB * (NS + L + D)                  # carry scratch
        + 2 * C * BB * (6 * NS + 3 * L + 2 * D)   # seq inputs
        + 2 * C * BB * 3 * NS                # dfx/dfg outputs
        + 2 * BB * L * M + 2 * BB * L * D    # match/dmatch + outer temps
        + 3 * BB * Fh * L                    # conv/dconv/dwg
    )
    return 4 * elems


def pick_batch_block(B, T, L, M, D, NS, Fh, bytes_fn):
    """Largest divisor of ``B`` whose working set fits VMEM_BUDGET,
    or None when even a single row does not fit (caller falls back to
    the XLA scan).  ``LVSR_TRAIN_BB`` forces a specific block size for
    tests (must divide B)."""
    C = min(CHUNK, max(T, 1))
    env = os.environ.get("LVSR_TRAIN_BB")
    if env:
        bb = min(int(env), B)
        if B % bb == 0:
            return bb
    for bb in range(B, 0, -1):
        if B % bb:
            continue
        # Mosaic tiling: a batch block must be the full batch or a
        # multiple of the 8-row sublane (block shapes (BB, X))
        if bb != B and bb % 8:
            continue
        if bytes_fn(bb, C, L, M, D, NS, Fh) <= VMEM_BUDGET:
            return bb
    return None


def fused_train_fits(B, T, L, M, D, S, dec_stack, n_filters):
    """Shape gate for models/generator._fused_train_mode: True when both
    kernels have a batch block that fits VMEM (VERDICT r3 task 1 — the
    variant gate alone let B=64 reach Mosaic and RESOURCE_EXHAUSTED)."""
    NS = S * int(dec_stack)
    Fh = max(int(n_filters), 1)
    return (pick_batch_block(B, T, L, M, D, NS, Fh, _fwd_bytes)
            is not None
            and pick_batch_block(B, T, L, M, D, NS, Fh, _bwd_bytes)
            is not None)


def _window_masks(w, step0, amask, pos, pos1, tri, *, prior, before,
                  after, initial_begin, initial_end, min_speed,
                  max_speed, L):
    """(global_mask (1, L), combined (B, L)) for one step — decode-score
    parity (ops/pallas/decode_score.py:64-92), per-batch-row windows."""
    f32 = jnp.float32
    if prior == "expanding":
        begin = jnp.maximum(0.0, jnp.minimum(
            float(L - 1), initial_begin + step0 * min_speed))
        end = jnp.maximum(0.0, jnp.minimum(
            float(L), initial_end + step0 * max_speed))
        begin = jnp.floor(begin)
        end = jnp.ceil(end)
        gmask = ((pos1 >= begin) & (pos1 < end)).astype(f32)
        combined = gmask * amask
        return gmask, combined
    if prior == "window_around_mean":
        expected = (w * pos).sum(axis=1, keepdims=True)
    else:  # window_around_median
        # running cumsum as a lower-triangular ones matmul (Mosaic has
        # no cumsum primitive; decode_score.py:79-84 trick)
        cs = _dot(w, tri)
        below = (cs < 0.5).astype(f32).sum(axis=1, keepdims=True)
        expected = jnp.maximum(0.0, below - 1.0)
    begins = jnp.floor(expected - before)
    ends = jnp.ceil(expected + after)
    gb = jnp.floor(jnp.maximum(0.0, begins.min()))
    ge = jnp.ceil(jnp.minimum(float(L), ends.max()))
    gmask = ((pos1 >= gb) & (pos1 < ge)).astype(f32)
    additional = ((pos > begins) & (pos < ends)).astype(f32)
    return gmask, gmask * additional * amask


def _attention_fwd(h, w, pre, att, amask, toep, tri, st, hand, v, e_b,
                   pos, pos1, step0, cfg):
    """One attention step.  Returns
    (wnew, wa_new, energies, gmask, combined, denom, conv, match).

    ``cfg["n_filters"]``: conv filters (0 = content-only attention, no
    conv term); ``cfg["normalizer"]``: softmax / logistic / relu, the
    attention._normalize semantics; ``e_b``: energy projection bias
    (non-softmax normalizers, zero otherwise)."""
    f32 = jnp.float32
    L = cfg["L"]
    n_filters = cfg["n_filters"]
    gmask, combined = _window_masks(
        w, step0, amask, pos, pos1, tri, prior=cfg["prior"],
        before=cfg["before"], after=cfg["after"],
        initial_begin=cfg["initial_begin"],
        initial_end=cfg["initial_end"], min_speed=cfg["min_speed"],
        max_speed=cfg["max_speed"], L=L)
    wg = w * gmask
    sp = _dot(h, st)                                        # (B, M)
    if n_filters:
        conv = _dot(wg, toep)                     # (B, n_filters*L)
        conv_term = 0.0
        for f in range(n_filters):
            conv_term = conv_term + (
                conv[:, f * L:(f + 1) * L][:, :, None]
                * hand[f][None, None, :])
    else:
        conv = None
        conv_term = 0.0
    match = jnp.tanh(pre + sp[:, None, :] + conv_term)      # (B, L, M)
    # energy matvec as a VPU lane-reduce, NOT reshape(B*L, M) @ (M, 1):
    # reshaping a *computed* (B, L, M) value across the B/L boundary
    # sinks Mosaic's compiler (195 s vs 1.3 s for a 4-step toy kernel,
    # evidence/r05_compile_fix.json) and the MXU wastes 127/128 columns
    # on a matvec anyway
    energies = (match * v.reshape(1, 1, -1)).sum(axis=2) + e_b
    normalizer = cfg["normalizer"]
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
    wnew = unnorm / denom
    # batched (B,L)x(B,L,D) contraction as multiply-reduce (Mosaic has
    # no batched dot_general; L is small enough for the VPU)
    wa_new = (wnew[:, :, None] * att).sum(axis=1)           # (B, D)
    return wnew, wa_new, energies, gmask, combined, denom, conv, match


def _fwd_kernel(*refs, cfg, chunk):
    (fx_ref, fg_ref, m_ref, s0_ref, pre_ref, att_ref,
     amask_ref, h0_ref, w0_ref, wa0_ref, e0_ref,
     toep_ref, tri_ref, st_ref, hand_ref, v_ref, eb_ref,
     wss_ref, wsg_ref, dx_ref, dg_ref) = refs[:21]
    nxt = 21
    if cfg["dec_stack"] > 1:
        iin_ref, igate_ref = refs[nxt:nxt + 2]
        nxt += 2
    (h_out, w_out, wa_out, e_out, u_out, r_out, c_out) = \
        refs[nxt:nxt + 7]
    (h_sc, w_sc, wa_sc, e_sc) = refs[nxt + 7:nxt + 11]
    f32 = jnp.float32
    S = cfg["S"]
    L = cfg["L"]
    t = pl.program_id(1)               # grid = (batch blocks, T chunks)

    @pl.when(t == 0)
    def _():
        h_sc[...] = h0_ref[0].astype(f32)
        w_sc[...] = w0_ref[0].astype(f32)
        wa_sc[...] = wa0_ref[0].astype(f32)
        e_sc[...] = e0_ref[0].astype(f32)

    pre = pre_ref[...].astype(f32)                          # (B, L, M)
    att = att_ref[...].astype(f32)                          # (B, L, D)
    amask = amask_ref[...].astype(f32)                      # (B, L)
    toep = toep_ref[...].astype(f32)          # (L, n_filters*L)
    tri = tri_ref[...].astype(f32)
    st = st_ref[...].astype(f32)
    hand = hand_ref[...].astype(f32)          # (n_filters|1, M)
    v = v_ref[...].astype(f32)                              # (1, M)
    e_b = eb_ref[0, 0].astype(f32)
    wss = wss_ref[...].astype(f32)            # (S, stack*S)
    wsg = wsg_ref[...].astype(f32)            # (S, stack*2S)
    dxm = dx_ref[...].astype(f32)             # (D, stack*S)
    dgm = dg_ref[...].astype(f32)             # (D, stack*2S)
    if cfg["dec_stack"] > 1:
        iin = iin_ref[...].astype(f32)        # (S, (stack-1)*S)
        igate = igate_ref[...].astype(f32)
    B = h_sc.shape[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1).astype(f32)
    pos1 = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1).astype(f32)

    h = h_sc[...]
    w = w_sc[...]
    wa = wa_sc[...]
    e_keep = e_sc[...]
    for j in range(chunk):
        step0 = s0_ref[j, 0, 0].astype(f32)
        wnew, wa_new, energies, gmask, _, _, _, _ = _attention_fwd(
            h, w, pre, att, amask, toep, tri, st, hand, v, e_b, pos,
            pos1, step0, cfg)
        # stacked GRU advance: layer ly > 0 adds interlayer projections
        # of the layer below's (unmasked) updated state — the exact
        # generator._compute_states order.  All per-layer tables are
        # lane-stacked; stack=1 reduces to the single-layer math.
        N = cfg["dec_stack"]
        fg_j = fg_ref[j].astype(f32)
        fx_j = fx_ref[j].astype(f32)
        h_parts, u_parts, r_parts, c_parts = [], [], [], []
        below = None
        for ly in range(N):
            h_ly = h[:, ly * S:(ly + 1) * S]
            g_in = (fg_j[:, ly * 2 * S:(ly + 1) * 2 * S]
                    + _dot(wa_new, dgm[:, ly * 2 * S:(ly + 1) * 2 * S]))
            x_in = (fx_j[:, ly * S:(ly + 1) * S]
                    + _dot(wa_new, dxm[:, ly * S:(ly + 1) * S]))
            if ly > 0:
                g_in = g_in + _dot(
                    below, igate[:, (ly - 1) * 2 * S:ly * 2 * S])
                x_in = x_in + _dot(
                    below, iin[:, (ly - 1) * S:ly * S])
            gacts = jax.nn.sigmoid(
                _dot(h_ly, wsg[:, ly * 2 * S:(ly + 1) * 2 * S]) + g_in)
            u_ly = gacts[:, :S]
            r_ly = gacts[:, S:]
            cand_ly = jnp.tanh(
                _dot(h_ly * r_ly, wss[:, ly * S:(ly + 1) * S]) + x_in)
            h_new_ly = u_ly * cand_ly + (1.0 - u_ly) * h_ly
            below = h_new_ly
            h_parts.append(h_new_ly)
            u_parts.append(u_ly)
            r_parts.append(r_ly)
            c_parts.append(cand_ly)
        catl = lambda xs: (xs[0] if N == 1
                           else jnp.concatenate(xs, axis=1))
        h_new = catl(h_parts)
        u = catl(u_parts)
        r = catl(r_parts)
        cand = catl(c_parts)

        m = m_ref[j].astype(f32) > 0.5                      # (B, 1)
        # where-mix, not arithmetic mix: a relu-normalizer row whose
        # masked energies are all <= 0 divides 0/0 (the reference's own
        # behavior) and 0 * NaN would leak the NaN into masked rows
        # where the XLA scan keeps the old value
        h = jnp.where(m, h_new, h)
        w = jnp.where(m, wnew, w)
        wa = jnp.where(m, wa_new, wa)
        e_keep = jnp.where(m, energies * gmask, e_keep)
        h_out[j] = h.astype(h_out.dtype)
        w_out[j] = w.astype(w_out.dtype)
        wa_out[j] = wa.astype(wa_out.dtype)
        e_out[j] = e_keep.astype(e_out.dtype)
        u_out[j] = u.astype(u_out.dtype)
        r_out[j] = r.astype(r_out.dtype)
        c_out[j] = cand.astype(c_out.dtype)
    h_sc[...] = h
    w_sc[...] = w
    wa_sc[...] = wa
    e_sc[...] = e_keep


def _bwd_kernel(*refs, cfg, chunk, steps):
    (dh_ref, dw_ref, dwa_ref,
     hprev_ref, wprev_ref,
     h_ref, w_ref, wa_ref, u_ref, r_ref, c_ref,
     m_ref, s0_ref,
     pre_ref, att_ref, amask_ref,
     toep_ref, tri_ref, st_ref, hand_ref, v_ref, eb_ref,
     wss_ref, wsg_ref, dx_ref, dg_ref) = refs[:26]
    nxt = 26
    stacked = cfg["dec_stack"] > 1
    if stacked:
        iin_ref, igate_ref = refs[nxt:nxt + 2]
        nxt += 2
    (dfx_ref, dfg_ref, dh0_ref, dwa0_ref,
     dpre_ref, datt_ref, dtoep_ref, dst_ref, dhand_ref,
     dv_ref, deb_ref, dwss_ref, dwsg_ref, ddx_ref, ddg_ref) = \
        refs[nxt:nxt + 15]
    nxt += 15
    if stacked:
        diin_ref, digate_ref = refs[nxt:nxt + 2]
        nxt += 2
    (dh_sc, dw_sc, dwa_sc) = refs[nxt:nxt + 3]
    f32 = jnp.float32
    S = cfg["S"]
    L = cfg["L"]
    N = cfg["dec_stack"]
    b = pl.program_id(0)               # grid = (batch blocks, T chunks)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        # per-batch-block state: the reverse-time carry and the
        # batch-blocked input grads (their blocks are b-indexed, so each
        # block starts fresh when its b slice begins)
        dh_sc[...] = jnp.zeros_like(dh_sc)
        dw_sc[...] = jnp.zeros_like(dw_sc)
        dwa_sc[...] = jnp.zeros_like(dwa_sc)
        dpre_ref[...] = jnp.zeros_like(dpre_ref)
        datt_ref[...] = jnp.zeros_like(datt_ref)

    @pl.when((b == 0) & (t == 0))
    def _():
        # parameter grads accumulate across ALL batch blocks (constant
        # block index): zero exactly once at the very first grid step
        dtoep_ref[...] = jnp.zeros_like(dtoep_ref)
        dst_ref[...] = jnp.zeros_like(dst_ref)
        dhand_ref[...] = jnp.zeros_like(dhand_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)
        deb_ref[...] = jnp.zeros_like(deb_ref)
        dwss_ref[...] = jnp.zeros_like(dwss_ref)
        dwsg_ref[...] = jnp.zeros_like(dwsg_ref)
        ddx_ref[...] = jnp.zeros_like(ddx_ref)
        ddg_ref[...] = jnp.zeros_like(ddg_ref)
        if stacked:
            diin_ref[...] = jnp.zeros_like(diin_ref)
            digate_ref[...] = jnp.zeros_like(digate_ref)

    pre = pre_ref[...].astype(f32)
    att = att_ref[...].astype(f32)
    amask = amask_ref[...].astype(f32)
    toep = toep_ref[...].astype(f32)
    tri = tri_ref[...].astype(f32)
    st = st_ref[...].astype(f32)
    hand = hand_ref[...].astype(f32)
    v = v_ref[...].astype(f32)
    e_b = eb_ref[0, 0].astype(f32)
    wss = wss_ref[...].astype(f32)
    wsg = wsg_ref[...].astype(f32)
    dxm = dx_ref[...].astype(f32)
    dgm = dg_ref[...].astype(f32)
    if stacked:
        iin = iin_ref[...].astype(f32)
        igate = igate_ref[...].astype(f32)
    B = dh_sc.shape[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1).astype(f32)
    pos1 = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1).astype(f32)

    # Gradients accumulate DIRECTLY into the output refs (VMEM) per
    # chunk step.  Round 3 carried (B,L,M)/(B,L,D) f32 accumulator
    # VALUES across the whole chunk loop instead — Mosaic kept them
    # live in registers and spilled 92.5 MB at B=64.
    dh_c = dh_sc[...]
    dw_c = dw_sc[...]
    dwa_c = dwa_sc[...]
    for j in reversed(range(chunk)):
        m = m_ref[j].astype(f32)                            # (B, 1)
        h_prev = hprev_ref[j].astype(f32)
        w_prev = wprev_ref[j].astype(f32)
        u = u_ref[j].astype(f32)
        r = r_ref[j].astype(f32)
        cand = c_ref[j].astype(f32)
        wnew = w_ref[j].astype(f32)      # post-mix; exact where m=1
        wa_new = wa_ref[j].astype(f32)
        step0 = s0_ref[j, 0, 0].astype(f32)

        dh_tot = dh_c + dh_ref[j].astype(f32)
        dw_tot = dw_c + dw_ref[j].astype(f32)
        dwa_tot = dwa_c + dwa_ref[j].astype(f32)

        dh_new = dh_tot * m
        dh_keep = dh_tot * (1.0 - m)
        dwnew = dw_tot * m
        dw_keep = dw_tot * (1.0 - m)
        dwa_new = dwa_tot * m
        dwa_keep = dwa_tot * (1.0 - m)

        # ---- GRU backward (stack: layers in REVERSE, dbelow flows
        # into the unmasked h_new of the layer below; that h_new is
        # recomputed from the residuals, not streamed) -----------------
        dfx_parts = [None] * N
        dfg_parts = [None] * N
        diin_parts = [None] * max(N - 1, 0)
        digate_parts = [None] * max(N - 1, 0)
        dwss_parts = [None] * N
        dwsg_parts = [None] * N
        ddx_parts = [None] * N
        ddg_parts = [None] * N
        dh_prev_parts = [None] * N
        dbelow = None
        for ly in reversed(range(N)):
            sl1 = slice(ly * S, (ly + 1) * S)
            sl2 = slice(ly * 2 * S, (ly + 1) * 2 * S)
            u_ly = u[:, sl1]
            r_ly = r[:, sl1]
            cand_ly = cand[:, sl1]
            h_prev_ly = h_prev[:, sl1]
            dh_new_ly = dh_new[:, sl1]
            if dbelow is not None:
                dh_new_ly = dh_new_ly + dbelow
            du = dh_new_ly * (cand_ly - h_prev_ly)
            dcand = dh_new_ly * u_ly
            dh_prev_ly = dh_new_ly * (1.0 - u_ly)
            dcandacts = dcand * (1.0 - cand_ly * cand_ly)
            d_hr = _dot(dcandacts, wss[:, sl1], contract=(1, 1))
            dwss_parts[ly] = _dot(h_prev_ly * r_ly, dcandacts,
                                  contract=(0, 0))
            dh_prev_ly += d_hr * r_ly
            dr = d_hr * h_prev_ly
            dgacts = jnp.concatenate(
                [du * u_ly * (1.0 - u_ly), dr * r_ly * (1.0 - r_ly)],
                axis=1)
            dh_prev_ly += _dot(dgacts, wsg[:, sl2], contract=(1, 1))
            dwsg_parts[ly] = _dot(h_prev_ly, dgacts, contract=(0, 0))
            dfx_parts[ly] = dcandacts
            dfg_parts[ly] = dgacts
            dwa_new += _dot(dcandacts, dxm[:, sl1], contract=(1, 1)) \
                + _dot(dgacts, dgm[:, sl2], contract=(1, 1))
            ddx_parts[ly] = _dot(wa_new, dcandacts, contract=(0, 0))
            ddg_parts[ly] = _dot(wa_new, dgacts, contract=(0, 0))
            dh_prev_parts[ly] = dh_prev_ly
            if ly > 0:
                isl1 = slice((ly - 1) * S, ly * S)
                isl2 = slice((ly - 1) * 2 * S, ly * 2 * S)
                dbelow = (_dot(dcandacts, iin[:, isl1],
                               contract=(1, 1))
                          + _dot(dgacts, igate[:, isl2],
                                 contract=(1, 1)))
                # the interlayer input is the UNMASKED updated state of
                # the layer below — recompute it from the residuals
                below_val = (u[:, isl1] * cand[:, isl1]
                             + (1.0 - u[:, isl1]) * h_prev[:, isl1])
                diin_parts[ly - 1] = _dot(below_val, dcandacts,
                                          contract=(0, 0))
                digate_parts[ly - 1] = _dot(below_val, dgacts,
                                            contract=(0, 0))
            else:
                dbelow = None
        catl = lambda xs: (xs[0] if N == 1
                           else jnp.concatenate(xs, axis=1))
        dh_prev = catl(dh_prev_parts)
        if stacked:
            diin_ref[...] += (diin_parts[0] if N == 2
                              else jnp.concatenate(diin_parts, axis=1))
            digate_ref[...] += (digate_parts[0] if N == 2
                                else jnp.concatenate(digate_parts, axis=1))
        dwss_ref[...] += catl(dwss_parts)
        dwsg_ref[...] += catl(dwsg_parts)
        ddx_ref[...] += catl(ddx_parts)
        ddg_ref[...] += catl(ddg_parts)
        dfx_ref[j] = catl(dfx_parts).astype(dfx_ref.dtype)
        dfg_ref[j] = catl(dfg_parts).astype(dfg_ref.dtype)

        # ---- weighted average backward -------------------------------
        dwnew = dwnew + (att * dwa_new[:, None, :]).sum(axis=2)
        datt_ref[...] += wnew[:, :, None] * dwa_new[:, None, :]

        # ---- recompute the attention step for the backward ----------
        _, _, energies, gmask, combined, denom, conv, match = \
            _attention_fwd(
                h_prev, w_prev, pre, att, amask, toep, tri, st, hand,
                v, e_b, pos, pos1, step0, cfg)

        # ---- normalizer backward (masked rows carry zero cotangent) --
        srow = (dwnew * wnew).sum(axis=1, keepdims=True)
        if cfg["normalizer"] == "softmax":
            # the max-shift cancels: dE = w * (dw - sum(dw * w))
            dE = wnew * (dwnew - srow)                       # (B, L)
        else:
            # wnew = q / denom, q = g(E) * combined:
            # dq = (dw - sum(dw * w)) / denom; dE = dq * g'(E) * combined
            dq = (dwnew - srow) / denom
            if cfg["normalizer"] == "logistic":
                sig = jax.nn.sigmoid(energies)
                gprime = sig * (1.0 - sig)
            else:  # relu
                gprime = (energies > 0.0).astype(f32) / 1000.0
            dE = dq * gprime * combined
        if cfg["normalizer"] != "softmax":
            # softmax is shift-invariant: the bias cotangent is exactly
            # zero there, so skip the per-step global reduce
            deb_ref[...] += dE.sum().reshape(1, 1)

        # ---- energies backward over the recomputed match tensor ------
        dmatch = (dE[:, :, None] * v[None, :, :]
                  * (1.0 - match * match))                   # (B, L, M)
        dpre_ref[...] += dmatch
        dv_ref[...] += (match * dE[:, :, None]).sum(axis=(0, 1),
                                                    keepdims=True)[0]
        dsp = dmatch.sum(axis=1)                             # (B, M)
        dh_prev += _dot(dsp, st, contract=(1, 1))
        dst_ref[...] += _dot(h_prev, dsp, contract=(0, 0))
        if cfg["n_filters"]:
            # per-filter rank-1 splits of dmatch; the lane-stacked
            # layouts make dwg/dtoep single matmuls over (B|L, Fc*L)
            dconv_parts, dhand_rows = [], []
            for f in range(cfg["n_filters"]):
                dconv_parts.append(
                    (dmatch * hand[f][None, None, :]).sum(axis=2))
                dhand_rows.append(
                    (dmatch
                     * conv[:, f * L:(f + 1) * L][:, :, None]).sum(
                        axis=(0, 1), keepdims=True)[0])
            dconv = (dconv_parts[0] if cfg["n_filters"] == 1
                     else jnp.concatenate(dconv_parts, axis=1))
            dhand_ref[...] += (dhand_rows[0] if cfg["n_filters"] == 1
                               else jnp.concatenate(dhand_rows, axis=0))
            wg = w_prev * gmask
            dwg = _dot(dconv, toep, contract=(1, 1))
            dtoep_ref[...] += _dot(wg, dconv, contract=(0, 0))
            dw_prev = dwg * gmask + dw_keep
        else:
            # content-only attention: weights do not feed the energies
            dw_prev = dw_keep

        dh_c = dh_prev + dh_keep
        dw_c = dw_prev
        dwa_c = dwa_keep

    dh_sc[...] = dh_c
    dw_sc[...] = dw_c
    dwa_sc[...] = dwa_c

    @pl.when(t == steps - 1)
    def _():
        dh0_ref[...] = dh_c
        dwa0_ref[...] = dwa_c


def _cfg_key(cfg):
    return tuple(sorted(cfg.items()))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _decoder_scan(cfgk, interpret, fx, fg, mask, step0, pre, attended,
                  amask, h0, w0, wa0, toep, st, hand, v, e_bias, wss,
                  wsg, dxm, dgm, iin, igate):
    out, _ = _decoder_scan_fwd(cfgk, interpret, fx, fg, mask, step0,
                               pre, attended, amask, h0, w0, wa0, toep,
                               st, hand, v, e_bias, wss, wsg, dxm, dgm,
                               iin, igate)
    return out


def _decoder_scan_fwd(cfgk, interpret, fx, fg, mask, step0, pre,
                      attended, amask, h0, w0, wa0, toep, st, hand, v,
                      e_bias, wss, wsg, dxm, dgm, iin, igate):
    cfg = dict(cfgk)
    T, B, NS = fx.shape                        # NS = dec_stack * S
    N = cfg["dec_stack"]
    S = cfg["S"]
    L = cfg["L"]
    M = st.shape[1]
    D = attended.shape[2]
    Fh = hand.shape[0] if hand.ndim == 2 else 1
    C = min(CHUNK, T)
    T_pad = -(-T // C) * C
    fx_p = _pad_time(fx, T_pad)
    fg_p = _pad_time(fg, T_pad)
    mask_p = _pad_time(mask, T_pad)
    step0_p = _pad_time(step0.reshape(T, 1), T_pad)

    tri = jnp.triu(jnp.ones((L, L), jnp.float32))   # cumsum matmul
    kernel = functools.partial(_fwd_kernel, cfg=cfg, chunk=C)
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    # batch blocking: grid = (B // BB, T chunks), batch-major so each
    # batch block runs its full time recurrence before the next starts
    # (TPU grids iterate the last dimension fastest)
    BB = pick_batch_block(B, T, L, M, D, NS, Fh, _fwd_bytes) or B
    seq = lambda *d: pl.BlockSpec((C, BB) + d[1:],
                                  lambda b, t: (t, b) + (0,) * (len(d) - 1))
    const = lambda *d: pl.BlockSpec(d, lambda b, t: (0,) * len(d))
    perb = lambda *d: pl.BlockSpec((BB,) + d[1:],
                                   lambda b, t: (b,) + (0,) * (len(d) - 1))
    e0 = jnp.zeros((B, L), jnp.float32)
    in_specs = [
        seq(B, NS),                  # fx (lane-stacked layers)
        seq(B, 2 * NS),              # fg
        pl.BlockSpec((C, BB, 1), lambda b, t: (t, b, 0)),   # mask
        pl.BlockSpec((C, 1, 1), lambda b, t: (t, 0, 0)),    # step0
        perb(B, L, M),               # pre
        perb(B, L, D),               # attended
        perb(B, L),                  # amask
        pl.BlockSpec((1, BB, NS), lambda b, t: (0, b, 0)),  # h0
        pl.BlockSpec((1, BB, L), lambda b, t: (0, b, 0)),   # w0
        pl.BlockSpec((1, BB, D), lambda b, t: (0, b, 0)),   # wa0
        pl.BlockSpec((1, BB, L), lambda b, t: (0, b, 0)),   # e0
        const(L, Fh * L),            # toep (filter-major lanes)
        const(L, L),                 # tri
        const(NS, M),                # state_trans (row-stacked)
        const(Fh, M), const(1, M),
        const(1, 1),                 # energy bias
        const(S, NS), const(S, 2 * NS),     # wss / wsg (lane-stacked)
        const(D, NS), const(D, 2 * NS),     # dxm / dgm
    ]
    operands = [fx_p, fg_p, mask_p.reshape(T_pad, B, 1),
                step0_p.reshape(T_pad, 1, 1).astype(jnp.int32),
                pre, attended, amask,
                h0[None], w0[None], wa0[None], e0[None], toep, tri, st,
                hand.reshape(Fh, M), v.reshape(1, M),
                e_bias.reshape(1, 1), wss, wsg, dxm, dgm]
    if N > 1:
        in_specs += [const(S, (N - 1) * S), const(S, (N - 1) * 2 * S)]
        operands += [iin, igate]
    outs = pl.pallas_call(
        kernel,
        grid=(B // BB, T_pad // C),
        in_specs=in_specs,
        out_specs=(seq(B, NS), seq(B, L), seq(B, D), seq(B, L),
                   seq(B, NS), seq(B, NS), seq(B, NS)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((T_pad, B, d), jnp.float32)
            for d in (NS, L, D, L, NS, NS, NS)),
        scratch_shapes=[pltpu.VMEM((BB, NS), jnp.float32),
                        pltpu.VMEM((BB, L), jnp.float32),
                        pltpu.VMEM((BB, D), jnp.float32),
                        pltpu.VMEM((BB, L), jnp.float32)]
        if _HAS_PLTPU else [],
        interpret=interpret,
        **kwargs,
    )(*operands)
    hs, ws, was, es, us, rs, cs = outs
    res = (fx, fg, mask_p, step0_p, pre, attended, amask, h0, w0, wa0,
           toep, st, hand, v, e_bias, wss, wsg, dxm, dgm, iin, igate,
           hs, ws, was, us, rs, cs)
    out = (hs[:T], ws[:T], was[:T], es[:T])
    return out, res


def _decoder_scan_bwd(cfgk, interpret, res, cts):
    cfg = dict(cfgk)
    (fx, fg, mask_p, step0_p, pre, attended, amask, h0, w0, wa0, toep,
     st, hand, v, e_bias, wss, wsg, dxm, dgm, iin, igate, hs, ws, was,
     us, rs, cs) = res
    dhs, dws, dwas, _des = cts
    T, B, NS = fx.shape
    N = cfg["dec_stack"]
    S = cfg["S"]
    T_pad = hs.shape[0]
    L = cfg["L"]
    M = st.shape[1]
    D = attended.shape[2]
    C = min(CHUNK, T)
    Tc = T_pad // C
    Fh = hand.shape[0] if hand.ndim == 2 else 1

    def cot(x, shape):
        if x is None:
            return jnp.zeros(shape, jnp.float32)
        return _pad_time(x.astype(jnp.float32), T_pad)

    dhs = cot(dhs, (T_pad, B, NS))
    dws = cot(dws, (T_pad, B, L))
    dwas = cot(dwas, (T_pad, B, D))
    hprev = jnp.concatenate([h0[None].astype(jnp.float32), hs[:-1]], 0)
    wprev = jnp.concatenate([w0[None].astype(jnp.float32), ws[:-1]], 0)

    tri = jnp.triu(jnp.ones((L, L), jnp.float32))
    kernel = functools.partial(_bwd_kernel, cfg=cfg, chunk=C, steps=Tc)
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    BB = pick_batch_block(B, T, L, M, D, NS, Fh, _bwd_bytes) or B
    rev = lambda *d: pl.BlockSpec(
        (C, BB) + d[1:],
        lambda b, t: (Tc - 1 - t, b) + (0,) * (len(d) - 1))
    const = lambda *d: pl.BlockSpec(d, lambda b, t: (0,) * len(d))
    perb = lambda *d: pl.BlockSpec(
        (BB,) + d[1:], lambda b, t: (b,) + (0,) * (len(d) - 1))
    f32 = jnp.float32
    in_specs = [
        rev(B, NS), rev(B, L), rev(B, D),          # cotangents
        rev(B, NS), rev(B, L),                     # prev h/w
        rev(B, NS), rev(B, L), rev(B, D),          # h/w/wa
        rev(B, NS), rev(B, NS), rev(B, NS),        # u r cand
        pl.BlockSpec((C, BB, 1), lambda b, t: (Tc - 1 - t, b, 0)),
        pl.BlockSpec((C, 1, 1), lambda b, t: (Tc - 1 - t, 0, 0)),
        perb(B, L, M), perb(B, L, D), perb(B, L),
        const(L, Fh * L),                          # toep
        const(L, L),                               # tri
        const(NS, M), const(Fh, M), const(1, M),
        const(1, 1),                               # energy bias
        const(S, NS), const(S, 2 * NS),
        const(D, NS), const(D, 2 * NS),
    ]
    operands = [dhs, dws, dwas, hprev, wprev, hs, ws, was, us, rs, cs,
                mask_p.reshape(T_pad, B, 1),
                step0_p.reshape(T_pad, 1, 1).astype(jnp.int32),
                pre, attended, amask, toep, tri, st,
                hand.reshape(Fh, M), v.reshape(1, M),
                e_bias.reshape(1, 1), wss, wsg, dxm, dgm]
    if N > 1:
        in_specs += [const(S, (N - 1) * S), const(S, (N - 1) * 2 * S)]
        operands += [iin, igate]
    out_specs = [rev(B, NS), rev(B, 2 * NS),
                 pl.BlockSpec((BB, NS), lambda b, t: (b, 0)),
                 pl.BlockSpec((BB, D), lambda b, t: (b, 0)),
                 perb(B, L, M), perb(B, L, D), const(L, Fh * L),
                 const(NS, M), const(Fh, M), const(1, M),
                 const(1, 1),
                 const(S, NS), const(S, 2 * NS),
                 const(D, NS), const(D, 2 * NS)]
    out_shape = [
        jax.ShapeDtypeStruct((T_pad, B, NS), f32),
        jax.ShapeDtypeStruct((T_pad, B, 2 * NS), f32),
        jax.ShapeDtypeStruct((B, NS), f32),
        jax.ShapeDtypeStruct((B, D), f32),
        jax.ShapeDtypeStruct((B, L, M), f32),
        jax.ShapeDtypeStruct((B, L, D), f32),
        jax.ShapeDtypeStruct((L, Fh * L), f32),
        jax.ShapeDtypeStruct((NS, M), f32),
        jax.ShapeDtypeStruct((Fh, M), f32),
        jax.ShapeDtypeStruct((1, M), f32),
        jax.ShapeDtypeStruct((1, 1), f32),
        jax.ShapeDtypeStruct((S, NS), f32),
        jax.ShapeDtypeStruct((S, 2 * NS), f32),
        jax.ShapeDtypeStruct((D, NS), f32),
        jax.ShapeDtypeStruct((D, 2 * NS), f32),
    ]
    if N > 1:
        out_specs += [const(S, (N - 1) * S),
                      const(S, (N - 1) * 2 * S)]
        out_shape += [
            jax.ShapeDtypeStruct((S, (N - 1) * S), f32),
            jax.ShapeDtypeStruct((S, (N - 1) * 2 * S), f32)]
    outs = pl.pallas_call(
        kernel,
        grid=(B // BB, Tc),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((BB, NS), f32),
                        pltpu.VMEM((BB, L), f32),
                        pltpu.VMEM((BB, D), f32)]
        if _HAS_PLTPU else [],
        interpret=interpret,
        **kwargs,
    )(*operands)
    if N > 1:
        (dfx, dfg, dh0, dwa0, dpre, datt, dtoep, dst, dhand, dv, deb,
         dwss, dwsg, ddx, ddg, diin, digate) = outs
    else:
        (dfx, dfg, dh0, dwa0, dpre, datt, dtoep, dst, dhand, dv, deb,
         dwss, dwsg, ddx, ddg) = outs
        diin = jnp.zeros_like(iin)
        digate = jnp.zeros_like(igate)
    z = jnp.zeros
    return (dfx[:T].astype(fx.dtype), dfg[:T].astype(fg.dtype),
            z((T, B), fx.dtype),          # mask
            z((T,), fx.dtype),            # step0
            dpre.astype(pre.dtype), datt.astype(attended.dtype),
            z(amask.shape, amask.dtype),
            dh0.astype(h0.dtype),
            z(w0.shape, w0.dtype),        # initial onehot: constant
            dwa0.astype(wa0.dtype),
            dtoep.astype(toep.dtype), dst.astype(st.dtype),
            dhand.reshape(hand.shape).astype(hand.dtype),
            dv.reshape(v.shape).astype(v.dtype),
            deb.reshape(e_bias.shape).astype(e_bias.dtype),
            dwss.astype(wss.dtype), dwsg.astype(wsg.dtype),
            ddx.astype(dxm.dtype), ddg.astype(dgm.dtype),
            diin.astype(iin.dtype), digate.astype(igate.dtype))


_decoder_scan.defvjp(_decoder_scan_fwd, _decoder_scan_bwd)


def decoder_scan_train(fx, fg, mask, pre, attended, att_mask, h0, w0,
                       wa0, toep, st, hand, v, wss, wsg, dxm, dgm, *,
                       prior, e_bias=None, normalizer="softmax",
                       n_filters=1, dec_stack=1, inter_in=None,
                       inter_gate=None, interpret=False):
    """Differentiable fused attention-decoder scan.

    fx (T,B,S) / fg (T,B,2S): fork projections of the fed-back labels
    (bias included); mask (T,B) or None; pre (B,L,M) preprocessed
    attended; attended (B,L,D); att_mask (B,L); h0/w0/wa0 initial
    state/alignment/weighted-average; toep (L, max(n_filters,1)*L)
    banded Toeplitz stack of the conv taps (filter-major lanes);
    st attention state-trans; hand (max(n_filters,1), M) conv handler
    rows; v energy vector; e_bias energy projection bias (non-softmax
    normalizers; differentiable); wss/wsg GRU matrices; dxm/dgm
    distribute matrices.  ``normalizer``: softmax/logistic/relu;
    ``n_filters=0`` = content-only attention (no conv term, pass zero
    toep/hand).  Returns (h_seq, weights_seq, wa_seq, energies_seq),
    each (T,B,·), mask-mixed like the XLA scan.
    """
    T, B, NS = fx.shape
    S = NS // int(dec_stack)                   # per-layer state dim
    if mask is None:
        mask = jnp.ones((T, B), jnp.float32)
    if e_bias is None:
        e_bias = jnp.zeros((1, 1), jnp.float32)
    if inter_in is None:
        # placeholders keep the custom-VJP arity stable for stack=1
        # (they are not wired into the kernels then)
        inter_in = jnp.zeros((S, 1), jnp.float32)
        inter_gate = jnp.zeros((S, 1), jnp.float32)
    # the expanding prior consumes step[0]: the per-step scalar equals
    # the number of unmasked steps row 0 has seen (mask-mixed carry)
    step0 = jnp.concatenate(
        [jnp.zeros((1,), jnp.float32),
         jnp.cumsum(mask[:, 0])[:-1]]).astype(jnp.int32)
    p = dict(prior)
    cfg = dict(
        L=int(attended.shape[1]), S=S,
        prior=p.get("type", "expanding"),
        before=float(p.get("before", 0.0)),
        after=float(p.get("after", 0.0)),
        initial_begin=float(p.get("initial_begin", 0.0)),
        initial_end=float(p.get("initial_end", 1e4)),
        min_speed=float(p.get("min_speed", 0.0)),
        max_speed=float(p.get("max_speed", 0.0)),
        normalizer=str(normalizer), n_filters=int(n_filters),
        dec_stack=int(dec_stack),
    )
    f32 = jnp.float32
    hand2 = hand.reshape(-1, hand.shape[-1]) if hand.ndim == 2 \
        else hand.reshape(1, -1)
    return _decoder_scan(
        _cfg_key(cfg), bool(interpret), fx.astype(f32), fg.astype(f32),
        mask.astype(f32), step0, pre.astype(f32), attended.astype(f32),
        att_mask.astype(f32), h0.astype(f32), w0.astype(f32),
        wa0.astype(f32), toep.astype(f32), st.astype(f32),
        hand2.astype(f32), v.astype(f32),
        jnp.asarray(e_bias, f32).reshape(1, 1), wss.astype(f32),
        wsg.astype(f32), dxm.astype(f32), dgm.astype(f32),
        inter_in.astype(f32), inter_gate.astype(f32))
