"""Fully fused decode score step: one Pallas kernel per utterance.

Profiling the decode loop shows per-fusion launch overhead dominating the
per-step time (each XLA fusion in the `lax.while_loop` body costs a fixed
~0.25 ms on the target runtime while the actual math is microseconds).
This kernel collapses the entire score path — window prior, convolution
over previous alignments, match/tanh/energy, masked softmax, weighted
average, readout merge + post-merge, log-softmax costs — into ONE kernel,
with all tensors VMEM-resident per utterance.

Applicability (checked by the caller, models/generator.py): conv
attention with one filter, softmax energy normalizer, no
states-in-readout, no LM, single-layer post-merge.  The general XLA path
remains for everything else.

TPU-specific tricks:

* the 2n+1-tap convolution over alignment weights becomes a matmul with
  a precomputed banded Toeplitz matrix (MXU instead of a tiny 1-channel
  conv);
* the running cumsum for the median window prior becomes a matmul with a
  lower-triangular ones matrix, and the median index is
  ``max(0, #(cumsum < 0.5) - 1)`` (monotone indicator counting — no
  argmax needed);
* everything computes in f32 inside VMEM regardless of the HBM dtype.
"""
from __future__ import annotations

import functools
from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

NEG = -1e30


def _kernel(pre_ref, att_ref, mask_ref, w_ref, step_ref, states_ref,
            toep_ref, tri_ref, st_ref, handler_ref, v_ref, merge_ref,
            mergeb_ref, post_ref, postb_ref,
            costs_ref, wnew_ref, energies_ref, wa_ref,
            *, beam, prior, before, after, initial_begin, initial_end,
            min_speed, max_speed):
    f32 = jnp.float32
    K = beam
    L = w_ref.shape[-1]

    pre = pre_ref[0].astype(f32)            # (L, M)
    att_mask = mask_ref[0].astype(f32)      # (1, L)
    w = w_ref[0].astype(f32)                # (K, L)
    # Mosaic iota must be integer-typed; cast after
    pos = jax.lax.broadcasted_iota(jnp.int32, (K, L), 1).astype(f32)
    pos_row = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1).astype(f32)

    # ---- window prior -------------------------------------------------
    if prior == "expanding":
        step0 = step_ref[0, 0, 0].astype(f32)
        begin = jnp.maximum(0.0, jnp.minimum(
            float(L - 1), initial_begin + step0 * min_speed))
        end = jnp.maximum(0.0, jnp.minimum(
            float(L), initial_end + step0 * max_speed))
        begin = jnp.floor(begin)
        end = jnp.ceil(end)
        global_mask = ((pos_row >= begin) & (pos_row < end)).astype(f32)
        additional = jnp.ones((K, L), f32)
    else:
        if prior == "window_around_mean":
            expected = (w * pos).sum(axis=1, keepdims=True)      # (K, 1)
        else:  # window_around_median
            tri = tri_ref[:].astype(f32)                         # (L, L)
            cs = jax.lax.dot_general(
                w, tri, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32)                      # (K, L)
            below = (cs < 0.5).astype(f32).sum(axis=1, keepdims=True)
            expected = jnp.maximum(0.0, below - 1.0)
        begins = jnp.floor(expected - before)                    # (K, 1)
        ends = jnp.ceil(expected + after)
        gb = jnp.floor(jnp.maximum(0.0, begins.min()))
        ge = jnp.ceil(jnp.minimum(float(L), ends.max()))
        global_mask = ((pos_row >= gb) & (pos_row < ge)).astype(f32)
        additional = ((pos > begins) & (pos < ends)).astype(f32)

    combined = global_mask * additional * att_mask               # (K, L)

    # ---- conv over windowed weights via banded Toeplitz matmul ---------
    wg = w * global_mask
    toep = toep_ref[:].astype(f32)                               # (L, L)
    conv = jax.lax.dot_general(
        wg, toep, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32)                              # (K, L)

    # ---- energies -------------------------------------------------------
    states = states_ref[0].astype(f32)                           # (K, S)
    st = st_ref[:].astype(f32)                                   # (S, M)
    sp = jax.lax.dot_general(
        states, st, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32)                              # (K, M)
    handler = handler_ref[:].astype(f32)                         # (1, M)
    match = jnp.tanh(pre[None, :, :] + sp[:, None, :]
                     + conv[:, :, None] * handler[None, :, :])   # (K, L, M)
    v = v_ref[:].astype(f32)                                     # (1, M)
    M = v.shape[-1]
    energies = jax.lax.dot_general(
        match.reshape(K * L, M), v.reshape(M, 1),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32).reshape(K, L)

    # ---- masked softmax (max over the global window only) --------------
    masked = jnp.where(global_mask > 0, energies, NEG)
    mx = jnp.max(masked, axis=1, keepdims=True)
    mx = jnp.where(mx > NEG / 2, mx, 0.0)
    unnorm = jnp.exp(energies - mx) * combined
    denom = unnorm.sum(axis=1, keepdims=True) + \
        (combined.sum(axis=1, keepdims=True) == 0).astype(f32)
    wnew = unnorm / denom                                        # (K, L)

    # ---- weighted average + readout -------------------------------------
    attended = att_ref[0].astype(f32)                            # (L, D)
    wa = jax.lax.dot_general(
        wnew, attended, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32)                              # (K, D)
    merged = jax.lax.dot_general(
        wa, merge_ref[:].astype(f32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32) + mergeb_ref[:].astype(f32)
    act = jnp.tanh(merged)                                       # (K, R)
    logits = jax.lax.dot_general(
        act, post_ref[:].astype(f32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32) + postb_ref[:].astype(f32)   # (K, V)
    logz = jax.nn.logsumexp(logits, axis=1, keepdims=True)
    costs = logz - logits                                        # (K, V)

    costs_ref[0] = costs
    wnew_ref[0] = wnew.astype(wnew_ref.dtype)
    energies_ref[0] = (energies * global_mask).astype(energies_ref.dtype)
    wa_ref[0] = wa.astype(wa_ref.dtype)


def toeplitz_band(filters: jnp.ndarray, length: int) -> jnp.ndarray:
    """(L, L) matrix T with T[i, l] = filter[n + l - i] inside the band.

    ``wg @ T`` equals the reference's trimmed full convolution
    (conv1d(w, f, 'full')[:, n:-n])."""
    taps = filters.reshape(-1)
    n = (taps.shape[0] - 1) // 2
    i = jnp.arange(length)[:, None]
    l = jnp.arange(length)[None, :]
    offset = l - i + n
    inside = (offset >= 0) & (offset < taps.shape[0])
    return jnp.where(inside, taps[jnp.clip(offset, 0, taps.shape[0] - 1)],
                     0.0)


@functools.partial(
    jax.jit,
    static_argnames=("beam", "prior", "before", "after", "initial_begin",
                     "initial_end", "min_speed", "max_speed", "interpret"))
def fused_decode_score(pre, attended, att_mask, weights, step, states,
                       toeplitz, tri, state_trans, handler_w, v,
                       merge_k, merge_b, post_k, post_b, *,
                       beam, prior="window_around_median", before=100.0,
                       after=100.0, initial_begin=0.0, initial_end=1e4,
                       min_speed=0.0, max_speed=0.0, interpret=False):
    """One-kernel score step.  Shapes:

    pre (U,L,M), attended (U,L,D), att_mask (U,L), weights (U*K,L),
    step (U*K,), states (U*K,S), toeplitz (L,L), tri (L,L),
    state_trans (S,M), handler_w (M,), v (M,), merge_k (D,R),
    merge_b (R,), post_k (R,V), post_b (V,).

    Returns (costs (U*K,V) f32, weights (U*K,L), energies (U*K,L),
    wa (U*K,D)).
    """
    U, L, M = pre.shape
    D = attended.shape[-1]
    S = states.shape[-1]
    R = merge_k.shape[-1]
    V = post_k.shape[-1]
    UK = weights.shape[0]
    assert UK == U * beam

    kernel = functools.partial(
        _kernel, beam=beam, prior=prior, before=float(before),
        after=float(after), initial_begin=float(initial_begin),
        initial_end=float(initial_end), min_speed=float(min_speed),
        max_speed=float(max_speed))
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)

    full = lambda *dims: pl.BlockSpec(dims, lambda u: (0,) * len(dims))
    peru = lambda *dims: pl.BlockSpec((1,) + dims,
                                      lambda u: (u,) + (0,) * len(dims))
    costs, wnew, energies, wa = pl.pallas_call(
        kernel,
        grid=(U,),
        in_specs=[
            peru(L, M),          # pre
            peru(L, D),          # attended
            peru(1, L),          # att_mask (U, 1, L)
            peru(beam, L),       # weights
            peru(1, 1),          # step (U, 1, 1)
            peru(beam, S),       # states
            full(L, L),          # toeplitz
            full(L, L),          # tri
            full(S, M),          # state_trans
            full(1, M),          # handler
            full(1, M),          # v
            full(D, R),          # merge kernel
            full(1, R),          # merge bias
            full(R, V),          # post kernel
            full(1, V),          # post bias
        ],
        out_specs=(peru(beam, V), peru(beam, L), peru(beam, L),
                   peru(beam, D)),
        out_shape=(
            jax.ShapeDtypeStruct((U, beam, V), jnp.float32),
            jax.ShapeDtypeStruct((U, beam, L), weights.dtype),
            jax.ShapeDtypeStruct((U, beam, L), weights.dtype),
            jax.ShapeDtypeStruct((U, beam, D), attended.dtype),
        ),
        interpret=interpret,
        **kwargs,
    )(pre, attended, att_mask.reshape(U, 1, L),
      weights.reshape(U, beam, L),
      step.reshape(U, beam)[:, :1].reshape(U, 1, 1).astype(jnp.int32),
      states.reshape(U, beam, S), toeplitz, tri,
      state_trans, handler_w.reshape(1, M), v.reshape(1, M), merge_k,
      merge_b.reshape(1, R), post_k, post_b.reshape(1, V))
    return (costs.reshape(UK, V), wnew.reshape(UK, L),
            energies.reshape(UK, L), wa.reshape(UK, D))
