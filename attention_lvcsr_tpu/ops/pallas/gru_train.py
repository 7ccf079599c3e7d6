"""Fused GRU sequence scan with a custom VJP: training in TWO kernels.

The training-path encoder is ~85 % of the train step (measured on chip:
89 ms of a 105 ms fwd+bwd at B=32, T=800): an XLA ``lax.scan`` forward
plus its transposed backward scan dispatch thousands of small fusions.
Here the forward runs as ONE Pallas kernel (like the inference scan in
:mod:`.gru_scan`, but also streaming the gate/candidate activations to
HBM as residuals), and the backward runs as ONE reverse-grid kernel that
carries ``dh`` in VMEM, accumulates the recurrent-weight gradients in
VMEM across all T steps, and emits the per-step input-projection
gradients.

Saving residuals costs (3 tensors of (T, B, D)) ~0.2 ms of HBM traffic
per scan — far cheaper than recomputing the gates in the backward pass.

Semantics are exactly ``models/cells.py GatedRecurrent.one_step`` with
mask freezing (blocks' gate layout: [update, reset]); gradients are
checked against ``jax.grad`` of the XLA scan in
``tests/test_gru_train_pallas.py``.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from attention_lvcsr_tpu.ops.pallas.common import (HAS_PLTPU as
                                                   _HAS_PLTPU)
from attention_lvcsr_tpu.ops.pallas.common import dot as _dot
from attention_lvcsr_tpu.ops.pallas.common import (mxu_dtype as
                                                   _mxu_dtype)
from attention_lvcsr_tpu.ops.pallas.common import pad_time as _pad_time
from attention_lvcsr_tpu.ops.pallas.common import pltpu


# ---------------------------------------------------------------------------
# forward kernel: states + residuals (update, reset, candidate)
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, g_ref, m_ref, h0_ref, wss_ref, wsg_ref,
                out_ref, u_ref, r_ref, c_ref, h_scratch, *, dim,
                chunk, mxu_dt):
    # ``chunk`` time steps per grid step: the per-step math is tiny, so
    # grid-step (block fetch + dispatch) overhead dominates a 1-step
    # grid; unrolling C steps inside amortizes it C-fold.
    #
    # ``mxu_dt`` is the matmul operand dtype: bf16 inputs keep bf16 MXU
    # operands (a single-pass MXU issue; f32 operands cost ~3 passes on
    # the critical recurrence chain), f32 accumulation always
    # (``preferred_element_type`` in :func:`common.dot`).  The carried
    # state stays f32 in VMEM either way.
    f32 = jnp.float32
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scratch[...] = h0_ref[0].astype(f32)

    h = h_scratch[...]                                   # (B, D)
    wsg = wsg_ref[:].astype(mxu_dt)
    wss = wss_ref[:].astype(mxu_dt)
    for j in range(chunk):
        gates = jax.nn.sigmoid(_dot(h.astype(mxu_dt), wsg)
                               + g_ref[j].astype(f32))
        update = gates[:, :dim]
        reset = gates[:, dim:]
        cand = jnp.tanh(_dot((h * reset).astype(mxu_dt), wss)
                        + x_ref[j].astype(f32))
        new_h = update * cand + (1.0 - update) * h
        m = m_ref[j, 0].astype(f32).reshape(-1, 1)       # (B, 1)
        new_h = m * new_h + (1.0 - m) * h
        out_ref[j] = new_h.astype(out_ref.dtype)
        u_ref[j] = update.astype(u_ref.dtype)
        r_ref[j] = reset.astype(r_ref.dtype)
        c_ref[j] = cand.astype(c_ref.dtype)
        h = new_h
    h_scratch[...] = h


# ---------------------------------------------------------------------------
# backward kernel: reverse time, dh carried in VMEM, dW accumulated
# ---------------------------------------------------------------------------

def _bwd_kernel(dout_ref, u_ref, r_ref, c_ref, hprev_ref, m_ref,
                wss_ref, wsg_ref,
                dxin_ref, dxgate_ref, dwss_ref, dwsg_ref, dh0_ref,
                dh_scratch, *, dim, steps, chunk, mxu_dt):
    f32 = jnp.float32
    t = pl.program_id(0)      # chunk index, reversed by the BlockSpecs

    @pl.when(t == 0)
    def _():
        dh_scratch[...] = jnp.zeros_like(dh_scratch)
        dwss_ref[...] = jnp.zeros_like(dwss_ref)
        dwsg_ref[...] = jnp.zeros_like(dwsg_ref)

    wss = wss_ref[:].astype(mxu_dt)
    wsg = wsg_ref[:].astype(mxu_dt)
    dwss = jnp.zeros_like(dwss_ref)
    dwsg = jnp.zeros_like(dwsg_ref)
    dh_prev = dh_scratch[...]
    for j in reversed(range(chunk)):
        u = u_ref[j].astype(f32)
        r = r_ref[j].astype(f32)
        cand = c_ref[j].astype(f32)
        h_prev = hprev_ref[j].astype(f32)
        m = m_ref[j, 0].astype(f32).reshape(-1, 1)

        dh = dh_prev + dout_ref[j].astype(f32)           # (B, D)
        draw = dh * m              # grad into the unmasked new_h
        dh_prev = dh * (1.0 - m)   # mask passthrough

        du = draw * (cand - h_prev)
        dcand = draw * u
        dh_prev = dh_prev + draw * (1.0 - u)

        da = dcand * (1.0 - cand * cand)                 # pre-tanh
        dxin_ref[j] = da.astype(dxin_ref.dtype)
        da_m = da.astype(mxu_dt)
        dhr = _dot(da_m, wss, contract=(1, 1))           # @ wss.T
        dwss = dwss + _dot((h_prev * r).astype(mxu_dt), da_m,
                           contract=(0, 0))
        dh_prev = dh_prev + dhr * r
        dr = dhr * h_prev

        gates = jnp.concatenate([u, r], axis=1)
        dg = jnp.concatenate([du, dr], axis=1) * gates * (1.0 - gates)
        dxgate_ref[j] = dg.astype(dxgate_ref.dtype)
        dg_m = dg.astype(mxu_dt)
        hp_m = h_prev.astype(mxu_dt)
        dh_prev = dh_prev + _dot(dg_m, wsg, contract=(1, 1))
        dwsg = dwsg + _dot(hp_m, dg_m, contract=(0, 0))

    dwss_ref[...] += dwss
    dwsg_ref[...] += dwsg
    dh_scratch[...] = dh_prev

    @pl.when(t == steps - 1)
    def _():
        dh0_ref[...] = dh_prev


# ---------------------------------------------------------------------------
# custom-VJP wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _gru_train(x_proj, gate_proj, mask, h0, w_state, w_gates,
               interpret):
    out, _ = _gru_train_fwd(x_proj, gate_proj, mask, h0, w_state,
                            w_gates, interpret)
    return out


# Time steps per grid step: amortizes block fetch + grid dispatch
# across C sequential mini-steps.  8 balances dispatch amortization
# against in-kernel unroll size (Mosaic compile time grows with the
# unroll); LVSR_GRU_CHUNK overrides for tuning sweeps
# (tools/prof_train_kernel.py).
CHUNK = int(os.environ.get("LVSR_GRU_CHUNK", "8"))

# Streamed (B, D)-equivalent VMEM blocks per time step across the
# fwd+bwd kernel pair, sized by the wider (bwd) member.  Unidir bwd
# streams ds+u+r+c+hprev in and dx+dgates(2D) out = 8; bidir doubles
# the inputs and adds both directions' outputs = 16.  Mosaic
# double-buffers every grid-streamed block, hence the 2x below.
_STREAM_FACTOR_UNI = 8
_STREAM_FACTOR_BD = 16
_VMEM_CHUNK_BUDGET = 88 * 1024 * 1024   # headroom under the 100MB scoped limit


def _fit_chunk(chunk, B, D, itemsize, factor):
    """Clamp the time-chunk so the kernel's streamed blocks fit VMEM.

    Without this, wide (batch, chunk) combinations — e.g. B=256 with
    LVSR_GRU_CHUNK=16 at D=250 — exceed the 100MB scoped-VMEM stack
    limit at Mosaic compile time (112.5M observed).  fwd and bwd call
    this with the same arguments so their grids tile the same T_pad.
    """
    per_step = factor * B * D * itemsize * 2
    c = max(1, chunk)
    while c > 1 and c * per_step > _VMEM_CHUNK_BUDGET:
        c //= 2
    return c



def _gru_train_fwd(x_proj, gate_proj, mask, h0, w_state, w_gates,
                   interpret):
    T, B, D = x_proj.shape
    C = _fit_chunk(min(CHUNK, T), B, D, x_proj.dtype.itemsize,
                   _STREAM_FACTOR_UNI)
    T_pad = -(-T // C) * C       # padded steps have mask 0: state frozen
    x_proj = _pad_time(x_proj, T_pad)
    gate_proj = _pad_time(gate_proj, T_pad)
    mask_p = _pad_time(mask, T_pad)
    kernel = functools.partial(_fwd_kernel, dim=D, chunk=C,
                               mxu_dt=_mxu_dtype(x_proj.dtype))
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    seq = lambda d: pl.BlockSpec((C, B, d), lambda t: (t, 0, 0))
    states, u, r, c = pl.pallas_call(
        kernel,
        grid=(T_pad // C,),
        in_specs=[
            seq(D),                                           # x
            seq(2 * D),                                       # gates
            pl.BlockSpec((C, 1, B), lambda t: (t, 0, 0)),     # mask
            pl.BlockSpec((1, B, D), lambda t: (0, 0, 0)),     # h0
            pl.BlockSpec((D, D), lambda t: (0, 0)),
            pl.BlockSpec((D, 2 * D), lambda t: (0, 0)),
        ],
        out_specs=(seq(D), seq(D), seq(D), seq(D)),
        out_shape=tuple(jax.ShapeDtypeStruct((T_pad, B, D),
                                             x_proj.dtype)
                        for _ in range(4)),
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32)]
        if _HAS_PLTPU else [],
        interpret=interpret,
        **kwargs,
    )(x_proj, gate_proj, mask_p.reshape(T_pad, 1, B), h0[None],
      w_state, w_gates)
    res = (states, u, r, c, mask, h0, w_state, w_gates)
    return states[:T], res


def _gru_train_bwd(interpret, res, dstates):
    states, u, r, c, mask, h0, w_state, w_gates = res
    T_pad, B, D = states.shape   # residuals are already time-padded
    T = mask.shape[0]
    C = _fit_chunk(min(CHUNK, T), B, D, states.dtype.itemsize,
                   _STREAM_FACTOR_UNI)
    # h_{t-1} sequence: [h0, states[:-1]]
    hprev = jnp.concatenate([h0[None], states[:-1]], axis=0)
    dstates = _pad_time(dstates, T_pad)
    mask_p = _pad_time(mask, T_pad)
    Tc = T_pad // C
    kernel = functools.partial(_bwd_kernel, dim=D, steps=Tc, chunk=C,
                               mxu_dt=_mxu_dtype(states.dtype))
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    rev = lambda d: pl.BlockSpec((C, B, d), lambda t: (Tc - 1 - t, 0, 0))
    f32 = jnp.float32
    dxin, dxgate, dwss, dwsg, dh0 = pl.pallas_call(
        kernel,
        grid=(Tc,),
        in_specs=[
            rev(D),                                           # dstates
            rev(D), rev(D), rev(D),                           # u, r, cand
            rev(D),                                           # h_prev
            pl.BlockSpec((C, 1, B), lambda t: (Tc - 1 - t, 0, 0)),
            pl.BlockSpec((D, D), lambda t: (0, 0)),
            pl.BlockSpec((D, 2 * D), lambda t: (0, 0)),
        ],
        out_specs=(rev(D), rev(2 * D),
                   pl.BlockSpec((D, D), lambda t: (0, 0)),
                   pl.BlockSpec((D, 2 * D), lambda t: (0, 0)),
                   pl.BlockSpec((B, D), lambda t: (0, 0))),
        out_shape=(
            jax.ShapeDtypeStruct((T_pad, B, D), states.dtype),
            jax.ShapeDtypeStruct((T_pad, B, 2 * D), states.dtype),
            jax.ShapeDtypeStruct((D, D), f32),
            jax.ShapeDtypeStruct((D, 2 * D), f32),
            jax.ShapeDtypeStruct((B, D), f32),
        ),
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32)]
        if _HAS_PLTPU else [],
        interpret=interpret,
        **kwargs,
    )(dstates, u, r, c, hprev, mask_p.reshape(T_pad, 1, B),
      w_state, w_gates)
    return (dxin[:T].astype(states.dtype),
            dxgate[:T].astype(states.dtype),
            jnp.zeros_like(mask),
            dh0.astype(h0.dtype),
            dwss.astype(w_state.dtype),
            dwsg.astype(w_gates.dtype))


_gru_train.defvjp(_gru_train_fwd, _gru_train_bwd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gru_scan_train(x_proj, gate_proj, mask, h0, w_state, w_gates,
                   interpret=False):
    """Differentiable fused GRU scan.

    Same contract as :func:`attention_lvcsr_tpu.ops.pallas.gru_scan.
    gru_scan` — x_proj (T, B, D), gate_proj (T, B, 2D), mask (T, B) or
    None, h0 (B, D), w_state (D, D), w_gates (D, 2D) -> (T, B, D) — but
    with a custom VJP so it serves the training path.
    """
    T, B = x_proj.shape[:2]
    if mask is None:
        mask = jnp.ones((T, B), x_proj.dtype)
    return _gru_train(x_proj, gate_proj, mask, h0, w_state, w_gates,
                      interpret)


# ---------------------------------------------------------------------------
# BIDIRECTIONAL fusion: both directions' independent recurrence chains in
# ONE kernel.  A GRU step is a latency chain of two small dependent
# matmuls; a single direction leaves the MXU pipeline mostly idle.
# Interleaving the two independent chains overlaps their latencies
# (measured ~1.9x over running the directions as separate kernels).
# ---------------------------------------------------------------------------

def _fwd_kernel_bd(xf_ref, gf_ref, mf_ref, xb_ref, gb_ref, mb_ref,
                   h0f_ref, h0b_ref, wssf_ref, wsgf_ref, wssb_ref,
                   wsgb_ref,
                   sf_ref, uf_ref, rf_ref, cf_ref,
                   sb_ref, ub_ref, rb_ref, cb_ref,
                   hf_sc, hb_sc, *, dim, chunk, mxu_dt):
    f32 = jnp.float32
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        hf_sc[...] = h0f_ref[0].astype(f32)
        hb_sc[...] = h0b_ref[0].astype(f32)

    hf = hf_sc[...]
    hb = hb_sc[...]
    wsgf = wsgf_ref[:].astype(mxu_dt)
    wssf = wssf_ref[:].astype(mxu_dt)
    wsgb = wsgb_ref[:].astype(mxu_dt)
    wssb = wssb_ref[:].astype(mxu_dt)
    for j in range(chunk):
        gates_f = jax.nn.sigmoid(_dot(hf.astype(mxu_dt), wsgf)
                                 + gf_ref[j].astype(f32))
        gates_b = jax.nn.sigmoid(_dot(hb.astype(mxu_dt), wsgb)
                                 + gb_ref[j].astype(f32))
        uf, rf = gates_f[:, :dim], gates_f[:, dim:]
        ub, rb = gates_b[:, :dim], gates_b[:, dim:]
        cf = jnp.tanh(_dot((hf * rf).astype(mxu_dt), wssf)
                      + xf_ref[j].astype(f32))
        cb = jnp.tanh(_dot((hb * rb).astype(mxu_dt), wssb)
                      + xb_ref[j].astype(f32))
        nhf = uf * cf + (1.0 - uf) * hf
        nhb = ub * cb + (1.0 - ub) * hb
        mf = mf_ref[j, 0].astype(f32).reshape(-1, 1)
        mb = mb_ref[j, 0].astype(f32).reshape(-1, 1)
        nhf = mf * nhf + (1.0 - mf) * hf
        nhb = mb * nhb + (1.0 - mb) * hb
        sf_ref[j] = nhf.astype(sf_ref.dtype)
        sb_ref[j] = nhb.astype(sb_ref.dtype)
        uf_ref[j] = uf.astype(uf_ref.dtype)
        rf_ref[j] = rf.astype(rf_ref.dtype)
        cf_ref[j] = cf.astype(cf_ref.dtype)
        ub_ref[j] = ub.astype(ub_ref.dtype)
        rb_ref[j] = rb.astype(rb_ref.dtype)
        cb_ref[j] = cb.astype(cb_ref.dtype)
        hf, hb = nhf, nhb
    hf_sc[...] = hf
    hb_sc[...] = hb


def _bwd_kernel_bd(df_ref, uf_ref, rf_ref, cf_ref, hpf_ref, mf_ref,
                   db_ref, ub_ref, rb_ref, cb_ref, hpb_ref, mb_ref,
                   wssf_ref, wsgf_ref, wssb_ref, wsgb_ref,
                   dxf_ref, dgf_ref, dxb_ref, dgb_ref,
                   dwssf_ref, dwsgf_ref, dwssb_ref, dwsgb_ref,
                   dh0f_ref, dh0b_ref, dhf_sc, dhb_sc,
                   *, dim, steps, chunk, mxu_dt):
    f32 = jnp.float32
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        dhf_sc[...] = jnp.zeros_like(dhf_sc)
        dhb_sc[...] = jnp.zeros_like(dhb_sc)
        dwssf_ref[...] = jnp.zeros_like(dwssf_ref)
        dwsgf_ref[...] = jnp.zeros_like(dwsgf_ref)
        dwssb_ref[...] = jnp.zeros_like(dwssb_ref)
        dwsgb_ref[...] = jnp.zeros_like(dwsgb_ref)

    wssf = wssf_ref[:].astype(mxu_dt)
    wsgf = wsgf_ref[:].astype(mxu_dt)
    wssb = wssb_ref[:].astype(mxu_dt)
    wsgb = wsgb_ref[:].astype(mxu_dt)
    awssf = jnp.zeros_like(dwssf_ref)
    awsgf = jnp.zeros_like(dwsgf_ref)
    awssb = jnp.zeros_like(dwssb_ref)
    awsgb = jnp.zeros_like(dwsgb_ref)
    dhf = dhf_sc[...]
    dhb = dhb_sc[...]

    def step_dir(dh_prev, dout, u, r, cand, h_prev, m, wss, wsg):
        dh = dh_prev + dout
        draw = dh * m
        dh_prev = dh * (1.0 - m)
        du = draw * (cand - h_prev)
        dcand = draw * u
        dh_prev = dh_prev + draw * (1.0 - u)
        da = dcand * (1.0 - cand * cand)
        da_m = da.astype(mxu_dt)
        dhr = _dot(da_m, wss, contract=(1, 1))
        dwss_inc = _dot((h_prev * r).astype(mxu_dt), da_m,
                        contract=(0, 0))
        dh_prev = dh_prev + dhr * r
        dr = dhr * h_prev
        gates = jnp.concatenate([u, r], axis=1)
        dg = jnp.concatenate([du, dr], axis=1) * gates * (1.0 - gates)
        dg_m = dg.astype(mxu_dt)
        dh_prev = dh_prev + _dot(dg_m, wsg, contract=(1, 1))
        dwsg_inc = _dot(h_prev.astype(mxu_dt), dg_m, contract=(0, 0))
        return dh_prev, da, dg, dwss_inc, dwsg_inc

    for j in reversed(range(chunk)):
        mf = mf_ref[j, 0].astype(f32).reshape(-1, 1)
        mb = mb_ref[j, 0].astype(f32).reshape(-1, 1)
        dhf, daf, dgf, iwssf, iwsgf = step_dir(
            dhf, df_ref[j].astype(f32), uf_ref[j].astype(f32),
            rf_ref[j].astype(f32), cf_ref[j].astype(f32),
            hpf_ref[j].astype(f32), mf, wssf, wsgf)
        dhb, dab, dgb, iwssb, iwsgb = step_dir(
            dhb, db_ref[j].astype(f32), ub_ref[j].astype(f32),
            rb_ref[j].astype(f32), cb_ref[j].astype(f32),
            hpb_ref[j].astype(f32), mb, wssb, wsgb)
        dxf_ref[j] = daf.astype(dxf_ref.dtype)
        dgf_ref[j] = dgf.astype(dgf_ref.dtype)
        dxb_ref[j] = dab.astype(dxb_ref.dtype)
        dgb_ref[j] = dgb.astype(dgb_ref.dtype)
        awssf = awssf + iwssf
        awsgf = awsgf + iwsgf
        awssb = awssb + iwssb
        awsgb = awsgb + iwsgb

    dwssf_ref[...] += awssf
    dwsgf_ref[...] += awsgf
    dwssb_ref[...] += awssb
    dwsgb_ref[...] += awsgb
    dhf_sc[...] = dhf
    dhb_sc[...] = dhb

    @pl.when(t == steps - 1)
    def _():
        dh0f_ref[...] = dhf
        dh0b_ref[...] = dhb


@functools.partial(jax.custom_vjp, nondiff_argnums=(12,))
def _gru_train_bd(xf, gf, mf, xb, gb, mb, h0f, h0b, wssf, wsgf, wssb,
                  wsgb, interpret):
    out, _ = _gru_train_bd_fwd(xf, gf, mf, xb, gb, mb, h0f, h0b, wssf,
                               wsgf, wssb, wsgb, interpret)
    return out


def _gru_train_bd_fwd(xf, gf, mf, xb, gb, mb, h0f, h0b, wssf, wsgf,
                      wssb, wsgb, interpret):
    T, B, D = xf.shape
    C = _fit_chunk(min(CHUNK, T), B, D, xf.dtype.itemsize,
                   _STREAM_FACTOR_BD)
    T_pad = -(-T // C) * C
    xf_p, gf_p, mf_p = (_pad_time(a, T_pad) for a in (xf, gf, mf))
    xb_p, gb_p, mb_p = (_pad_time(a, T_pad) for a in (xb, gb, mb))
    kernel = functools.partial(_fwd_kernel_bd, dim=D, chunk=C,
                               mxu_dt=_mxu_dtype(xf.dtype))
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    seq = lambda d: pl.BlockSpec((C, B, d), lambda t: (t, 0, 0))
    mspec = pl.BlockSpec((C, 1, B), lambda t: (t, 0, 0))
    hspec = pl.BlockSpec((1, B, D), lambda t: (0, 0, 0))
    outs = pl.pallas_call(
        kernel,
        grid=(T_pad // C,),
        in_specs=[seq(D), seq(2 * D), mspec,
                  seq(D), seq(2 * D), mspec,
                  hspec, hspec,
                  pl.BlockSpec((D, D), lambda t: (0, 0)),
                  pl.BlockSpec((D, 2 * D), lambda t: (0, 0)),
                  pl.BlockSpec((D, D), lambda t: (0, 0)),
                  pl.BlockSpec((D, 2 * D), lambda t: (0, 0))],
        out_specs=tuple(seq(D) for _ in range(8)),
        out_shape=tuple(jax.ShapeDtypeStruct((T_pad, B, D), xf.dtype)
                        for _ in range(8)),
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32)] * 2
        if _HAS_PLTPU else [],
        interpret=interpret,
        **kwargs,
    )(xf_p, gf_p, mf_p.reshape(T_pad, 1, B),
      xb_p, gb_p, mb_p.reshape(T_pad, 1, B),
      h0f[None], h0b[None], wssf, wsgf, wssb, wsgb)
    sf, uf, rf, cf, sb, ub, rb, cb = outs
    res = (sf, uf, rf, cf, sb, ub, rb, cb, mf, mb, h0f, h0b,
           wssf, wsgf, wssb, wsgb)
    return (sf[:T], sb[:T]), res


def _gru_train_bd_bwd(interpret, res, cts):
    dsf, dsb = cts
    (sf, uf, rf, cf, sb, ub, rb, cb, mf, mb, h0f, h0b,
     wssf, wsgf, wssb, wsgb) = res
    T_pad, B, D = sf.shape
    T = mf.shape[0]
    C = _fit_chunk(min(CHUNK, T), B, D, sf.dtype.itemsize,
                   _STREAM_FACTOR_BD)
    Tc = T_pad // C
    if dsf is None:
        dsf = jnp.zeros((T, B, D), sf.dtype)
    if dsb is None:
        dsb = jnp.zeros((T, B, D), sb.dtype)
    hpf = jnp.concatenate([h0f[None], sf[:-1]], axis=0)
    hpb = jnp.concatenate([h0b[None], sb[:-1]], axis=0)
    dsf_p, dsb_p = _pad_time(dsf, T_pad), _pad_time(dsb, T_pad)
    mf_p, mb_p = _pad_time(mf, T_pad), _pad_time(mb, T_pad)
    kernel = functools.partial(_bwd_kernel_bd, dim=D, steps=Tc, chunk=C,
                               mxu_dt=_mxu_dtype(sf.dtype))
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    rev = lambda d: pl.BlockSpec((C, B, d), lambda t: (Tc - 1 - t, 0, 0))
    mrev = pl.BlockSpec((C, 1, B), lambda t: (Tc - 1 - t, 0, 0))
    wD = pl.BlockSpec((D, D), lambda t: (0, 0))
    w2D = pl.BlockSpec((D, 2 * D), lambda t: (0, 0))
    hD = pl.BlockSpec((B, D), lambda t: (0, 0))
    f32 = jnp.float32
    outs = pl.pallas_call(
        kernel,
        grid=(Tc,),
        in_specs=[rev(D), rev(D), rev(D), rev(D), rev(D), mrev,
                  rev(D), rev(D), rev(D), rev(D), rev(D), mrev,
                  wD, w2D, wD, w2D],
        out_specs=(rev(D), rev(2 * D), rev(D), rev(2 * D),
                   wD, w2D, wD, w2D, hD, hD),
        out_shape=(
            jax.ShapeDtypeStruct((T_pad, B, D), sf.dtype),
            jax.ShapeDtypeStruct((T_pad, B, 2 * D), sf.dtype),
            jax.ShapeDtypeStruct((T_pad, B, D), sb.dtype),
            jax.ShapeDtypeStruct((T_pad, B, 2 * D), sb.dtype),
            jax.ShapeDtypeStruct((D, D), f32),
            jax.ShapeDtypeStruct((D, 2 * D), f32),
            jax.ShapeDtypeStruct((D, D), f32),
            jax.ShapeDtypeStruct((D, 2 * D), f32),
            jax.ShapeDtypeStruct((B, D), f32),
            jax.ShapeDtypeStruct((B, D), f32),
        ),
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32)] * 2
        if _HAS_PLTPU else [],
        interpret=interpret,
        **kwargs,
    )(dsf_p, uf, rf, cf, hpf, mf_p.reshape(T_pad, 1, B),
      dsb_p, ub, rb, cb, hpb, mb_p.reshape(T_pad, 1, B),
      wssf, wsgf, wssb, wsgb)
    (dxf, dgf, dxb, dgb, dwssf, dwsgf, dwssb, dwsgb, dh0f, dh0b) = outs
    return (dxf[:T].astype(sf.dtype), dgf[:T].astype(sf.dtype),
            jnp.zeros_like(mf),
            dxb[:T].astype(sb.dtype), dgb[:T].astype(sb.dtype),
            jnp.zeros_like(mb),
            dh0f.astype(h0f.dtype), dh0b.astype(h0b.dtype),
            dwssf.astype(wssf.dtype), dwsgf.astype(wsgf.dtype),
            dwssb.astype(wssb.dtype), dwsgb.astype(wsgb.dtype))


_gru_train_bd.defvjp(_gru_train_bd_fwd, _gru_train_bd_bwd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gru_scan_train_bidir(xf, gf, mf, xb, gb, mb, h0f, h0b, wssf, wsgf,
                         wssb, wsgb, interpret=False):
    """Both directions of a bidirectional GRU layer in one fused kernel
    pair (differentiable).  The backward direction's sequences arrive
    pre-reversed in time (the caller flips them back afterwards).
    Returns (states_fwd (T,B,D), states_bwd (T,B,D))."""
    T, B = xf.shape[:2]
    if mf is None:
        mf = jnp.ones((T, B), xf.dtype)
    if mb is None:
        mb = jnp.ones((T, B), xb.dtype)
    return _gru_train_bd(xf, gf, mf, xb, gb, mb, h0f, h0b, wssf, wsgf,
                         wssb, wsgb, interpret)
