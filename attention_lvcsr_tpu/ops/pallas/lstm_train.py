"""Fused LSTM sequence scan with a custom VJP (peepholes, blocks' gate
order [in, forget, cell, out] — ``models/cells.py LSTM.one_step``).

Same design as the GRU pair (:mod:`.gru_train`): the whole time loop is
ONE Pallas kernel per direction — forward streams the gate activations
to HBM as residuals; backward runs a reverse grid carrying (dh, dc) in
VMEM and accumulating the recurrent-weight and peephole gradients
in-kernel.  Serves both the training path (differentiable) and the fast
inference path of the LSTM encoder/decoder variants.

Gradient parity vs ``jax.grad`` of the XLA scan:
``tests/test_lstm_train_pallas.py``.
"""
from __future__ import annotations

import functools

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


def _fwd_kernel(x_ref, m_ref, h0_ref, c0_ref, w_ref, pci_ref, pcf_ref,
                pco_ref, h_out, c_out, i_out, f_out, z_out, o_out,
                h_sc, c_sc, *, dim, chunk, mxu_dt):
    f32 = jnp.float32
    D = dim
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_sc[...] = h0_ref[0].astype(f32)
        c_sc[...] = c0_ref[0].astype(f32)

    h = h_sc[...]
    c = c_sc[...]
    pci = pci_ref[:].astype(f32)              # (1, D) peepholes
    pcf = pcf_ref[:].astype(f32)
    pco = pco_ref[:].astype(f32)
    w = w_ref[:].astype(mxu_dt)
    for j in range(chunk):
        acts = _dot(h.astype(mxu_dt), w) + x_ref[j].astype(f32)
        i = jax.nn.sigmoid(acts[:, :D] + c * pci)
        f = jax.nn.sigmoid(acts[:, D:2 * D] + c * pcf)
        z = jnp.tanh(acts[:, 2 * D:3 * D])
        new_c = f * c + i * z
        o = jax.nn.sigmoid(acts[:, 3 * D:] + new_c * pco)
        new_h = o * jnp.tanh(new_c)
        m = m_ref[j, 0].astype(f32).reshape(-1, 1)
        new_h = m * new_h + (1.0 - m) * h
        new_c = m * new_c + (1.0 - m) * c
        h_out[j] = new_h.astype(h_out.dtype)
        c_out[j] = new_c.astype(c_out.dtype)
        i_out[j] = i.astype(i_out.dtype)
        f_out[j] = f.astype(f_out.dtype)
        z_out[j] = z.astype(z_out.dtype)
        o_out[j] = o.astype(o_out.dtype)
        h, c = new_h, new_c
    h_sc[...] = h
    c_sc[...] = c


def _bwd_kernel(dh_ref, dcseq_ref, i_ref, f_ref, z_ref, o_ref,
                hprev_ref, cprev_ref, m_ref, w_ref,
                pci_ref, pcf_ref, pco_ref,
                dx_ref, dw_ref, dpci_ref, dpcf_ref, dpco_ref,
                dh0_ref, dc0_ref, dh_sc, dc_sc, *, dim, steps, chunk,
                mxu_dt):
    f32 = jnp.float32
    D = dim
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        dh_sc[...] = jnp.zeros_like(dh_sc)
        dc_sc[...] = jnp.zeros_like(dc_sc)
        dw_ref[...] = jnp.zeros_like(dw_ref)
        dpci_ref[...] = jnp.zeros_like(dpci_ref)
        dpcf_ref[...] = jnp.zeros_like(dpcf_ref)
        dpco_ref[...] = jnp.zeros_like(dpco_ref)

    pci = pci_ref[:].astype(f32)
    pcf = pcf_ref[:].astype(f32)
    pco = pco_ref[:].astype(f32)
    w = w_ref[:].astype(mxu_dt)
    dw_acc = jnp.zeros_like(dw_ref)
    dpci_acc = jnp.zeros_like(dpci_ref)
    dpcf_acc = jnp.zeros_like(dpcf_ref)
    dpco_acc = jnp.zeros_like(dpco_ref)
    dh_prev = dh_sc[...]
    dc_prev = dc_sc[...]
    for j in reversed(range(chunk)):
        i = i_ref[j].astype(f32)
        f = f_ref[j].astype(f32)
        z = z_ref[j].astype(f32)
        o = o_ref[j].astype(f32)
        h_prev = hprev_ref[j].astype(f32)
        c_prev = cprev_ref[j].astype(f32)
        c_raw = f * c_prev + i * z
        m = m_ref[j, 0].astype(f32).reshape(-1, 1)

        dh = dh_prev + dh_ref[j].astype(f32)
        dc = dc_prev + dcseq_ref[j].astype(f32)
        draw_h = dh * m
        dh_keep = dh * (1.0 - m)
        draw_c = dc * m
        dc_keep = dc * (1.0 - m)

        hc = jnp.tanh(c_raw)
        do = draw_h * hc
        dacts_o = do * o * (1.0 - o)
        dcr = draw_h * o * (1.0 - hc * hc) + dacts_o * pco + draw_c

        df = dcr * c_prev
        dacts_f = df * f * (1.0 - f)
        di = dcr * z
        dacts_i = di * i * (1.0 - i)
        dz = dcr * i
        dacts_z = dz * (1.0 - z * z)

        dc_prev = (dcr * f + dacts_f * pcf + dacts_i * pci + dc_keep)
        dacts = jnp.concatenate([dacts_i, dacts_f, dacts_z, dacts_o],
                                axis=1)                  # (B, 4D)
        dx_ref[j] = dacts.astype(dx_ref.dtype)
        dacts_m = dacts.astype(mxu_dt)
        dh_prev = dh_keep + _dot(dacts_m, w, contract=(1, 1))
        dw_acc = dw_acc + _dot(h_prev.astype(mxu_dt), dacts_m,
                               contract=(0, 0))
        dpci_acc = dpci_acc + jnp.sum(dacts_i * c_prev, axis=0,
                                      keepdims=True)
        dpcf_acc = dpcf_acc + jnp.sum(dacts_f * c_prev, axis=0,
                                      keepdims=True)
        dpco_acc = dpco_acc + jnp.sum(dacts_o * c_raw, axis=0,
                                      keepdims=True)

    dw_ref[...] += dw_acc
    dpci_ref[...] += dpci_acc
    dpcf_ref[...] += dpcf_acc
    dpco_ref[...] += dpco_acc
    dh_sc[...] = dh_prev
    dc_sc[...] = dc_prev

    @pl.when(t == steps - 1)
    def _():
        dh0_ref[...] = dh_prev
        dc0_ref[...] = dc_prev


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _lstm_train(x_proj, mask, h0, c0, w_state, pci, pcf_pco, interpret):
    out, _ = _lstm_train_fwd(x_proj, mask, h0, c0, w_state, pci,
                             pcf_pco, interpret)
    return out


CHUNK = 8



def _lstm_train_fwd(x_proj, mask, h0, c0, w_state, pci, pcf_pco,
                    interpret):
    pcf, pco = pcf_pco
    T, B, D4 = x_proj.shape
    D = D4 // 4
    C = min(CHUNK, T)
    T_pad = -(-T // C) * C
    x_proj = _pad_time(x_proj, T_pad)
    mask_p = _pad_time(mask, T_pad)
    kernel = functools.partial(_fwd_kernel, dim=D, chunk=C,
                               mxu_dt=_mxu_dtype(x_proj.dtype))
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    seq = lambda d: pl.BlockSpec((C, B, d), lambda t: (t, 0, 0))
    outs = pl.pallas_call(
        kernel,
        grid=(T_pad // C,),
        in_specs=[
            seq(4 * D),                                       # x
            pl.BlockSpec((C, 1, B), lambda t: (t, 0, 0)),     # mask
            pl.BlockSpec((1, B, D), lambda t: (0, 0, 0)),     # h0
            pl.BlockSpec((1, B, D), lambda t: (0, 0, 0)),     # c0
            pl.BlockSpec((D, 4 * D), lambda t: (0, 0)),
            pl.BlockSpec((1, D), lambda t: (0, 0)),           # pci
            pl.BlockSpec((1, D), lambda t: (0, 0)),           # pcf
            pl.BlockSpec((1, D), lambda t: (0, 0)),           # pco
        ],
        out_specs=tuple(seq(D) for _ in range(6)),
        out_shape=tuple(jax.ShapeDtypeStruct((T_pad, B, D),
                                             x_proj.dtype)
                        for _ in range(6)),
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32)] * 2
        if _HAS_PLTPU else [],
        interpret=interpret,
        **kwargs,
    )(x_proj, mask_p.reshape(T_pad, 1, B), h0[None], c0[None], w_state,
      pci.reshape(1, D), pcf.reshape(1, D), pco.reshape(1, D))
    hs, cs, i, f, z, o = outs
    res = (hs, cs, i, f, z, o, mask, h0, c0, w_state, pci, pcf, pco)
    return (hs[:T], cs[:T]), res


def _lstm_train_bwd(interpret, res, cts):
    dhs, dcs = cts
    hs, cs, i, f, z, o, mask, h0, c0, w_state, pci, pcf, pco = res
    T_pad, B, D = hs.shape       # residuals are time-padded
    T = mask.shape[0]
    C = min(CHUNK, T)
    Tc = T_pad // C
    if dhs is None:
        dhs = jnp.zeros((T, B, D), hs.dtype)
    if dcs is None:
        dcs = jnp.zeros((T, B, D), cs.dtype)
    dhs = _pad_time(dhs, T_pad)
    dcs = _pad_time(dcs, T_pad)
    mask_p = _pad_time(mask, T_pad)
    hprev = jnp.concatenate([h0[None], hs[:-1]], axis=0)
    cprev = jnp.concatenate([c0[None], cs[:-1]], axis=0)
    kernel = functools.partial(_bwd_kernel, dim=D, steps=Tc, chunk=C,
                               mxu_dt=_mxu_dtype(hs.dtype))
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    rev = lambda d: pl.BlockSpec((C, B, d), lambda t: (Tc - 1 - t, 0, 0))
    f32 = jnp.float32
    dx, dw, dpci, dpcf, dpco, dh0, dc0 = pl.pallas_call(
        kernel,
        grid=(Tc,),
        in_specs=[
            rev(D), rev(D),                               # dh, dc seq
            rev(D), rev(D), rev(D), rev(D),               # i f z o
            rev(D), rev(D),                               # hprev cprev
            pl.BlockSpec((C, 1, B), lambda t: (Tc - 1 - t, 0, 0)),
            pl.BlockSpec((D, 4 * D), lambda t: (0, 0)),
            pl.BlockSpec((1, D), lambda t: (0, 0)),
            pl.BlockSpec((1, D), lambda t: (0, 0)),
            pl.BlockSpec((1, D), lambda t: (0, 0)),
        ],
        out_specs=(rev(4 * D),
                   pl.BlockSpec((D, 4 * D), lambda t: (0, 0)),
                   pl.BlockSpec((1, D), lambda t: (0, 0)),
                   pl.BlockSpec((1, D), lambda t: (0, 0)),
                   pl.BlockSpec((1, D), lambda t: (0, 0)),
                   pl.BlockSpec((B, D), lambda t: (0, 0)),
                   pl.BlockSpec((B, D), lambda t: (0, 0))),
        out_shape=(
            jax.ShapeDtypeStruct((T_pad, B, 4 * D), hs.dtype),
            jax.ShapeDtypeStruct((D, 4 * D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((B, D), f32),
            jax.ShapeDtypeStruct((B, D), f32),
        ),
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32)] * 2
        if _HAS_PLTPU else [],
        interpret=interpret,
        **kwargs,
    )(dhs, dcs, i, f, z, o, hprev, cprev,
      mask_p.reshape(T_pad, 1, B), w_state, pci.reshape(1, D),
      pcf.reshape(1, D), pco.reshape(1, D))
    return (dx[:T].astype(hs.dtype),
            jnp.zeros_like(mask),
            dh0.astype(h0.dtype),
            dc0.astype(c0.dtype),
            dw.astype(w_state.dtype),
            dpci.reshape(pci.shape).astype(pci.dtype),
            (dpcf.reshape(pcf.shape).astype(pcf.dtype),
             dpco.reshape(pco.shape).astype(pco.dtype)))


_lstm_train.defvjp(_lstm_train_fwd, _lstm_train_bwd)


def _fwd_only_kernel(x_ref, m_ref, h0_ref, c0_ref, w_ref, pci_ref,
                     pcf_ref, pco_ref, h_out, c_out, h_sc, c_sc, *,
                     dim, chunk, mxu_dt):
    # inference sibling of _fwd_kernel: identical recurrence, but no
    # gate residuals streamed to HBM (2 instead of 6 (T,B,D) outputs)
    f32 = jnp.float32
    D = dim
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_sc[...] = h0_ref[0].astype(f32)
        c_sc[...] = c0_ref[0].astype(f32)

    h = h_sc[...]
    c = c_sc[...]
    pci = pci_ref[:].astype(f32)
    pcf = pcf_ref[:].astype(f32)
    pco = pco_ref[:].astype(f32)
    w = w_ref[:].astype(mxu_dt)
    for j in range(chunk):
        acts = _dot(h.astype(mxu_dt), w) + x_ref[j].astype(f32)
        i = jax.nn.sigmoid(acts[:, :D] + c * pci)
        f = jax.nn.sigmoid(acts[:, D:2 * D] + c * pcf)
        z = jnp.tanh(acts[:, 2 * D:3 * D])
        new_c = f * c + i * z
        o = jax.nn.sigmoid(acts[:, 3 * D:] + new_c * pco)
        new_h = o * jnp.tanh(new_c)
        m = m_ref[j, 0].astype(f32).reshape(-1, 1)
        new_h = m * new_h + (1.0 - m) * h
        new_c = m * new_c + (1.0 - m) * c
        h_out[j] = new_h.astype(h_out.dtype)
        c_out[j] = new_c.astype(c_out.dtype)
        h, c = new_h, new_c
    h_sc[...] = h
    c_sc[...] = c


@functools.partial(jax.jit, static_argnames=("interpret",))
def lstm_scan(x_proj, mask, h0, c0, w_state, pci, pcf, pco,
              interpret=False):
    """Forward-only fused LSTM scan for the inference/serving paths.

    Same recurrence as :func:`lstm_scan_train` but streams only states
    and cells to HBM — no gate residuals, mirroring ``gru_scan`` vs
    ``gru_scan_train`` (3x less output HBM traffic when no backward
    pass will run).
    """
    T, B, D4 = x_proj.shape
    D = D4 // 4
    if mask is None:
        mask = jnp.ones((T, B), x_proj.dtype)
    C = min(CHUNK, T)
    T_pad = -(-T // C) * C
    x_proj = _pad_time(x_proj, T_pad)
    mask_p = _pad_time(mask, T_pad)
    kernel = functools.partial(_fwd_only_kernel, dim=D, chunk=C,
                               mxu_dt=_mxu_dtype(x_proj.dtype))
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    seq = lambda d: pl.BlockSpec((C, B, d), lambda t: (t, 0, 0))
    hs, cs = pl.pallas_call(
        kernel,
        grid=(T_pad // C,),
        in_specs=[
            seq(4 * D),                                       # x
            pl.BlockSpec((C, 1, B), lambda t: (t, 0, 0)),     # mask
            pl.BlockSpec((1, B, D), lambda t: (0, 0, 0)),     # h0
            pl.BlockSpec((1, B, D), lambda t: (0, 0, 0)),     # c0
            pl.BlockSpec((D, 4 * D), lambda t: (0, 0)),
            pl.BlockSpec((1, D), lambda t: (0, 0)),           # pci
            pl.BlockSpec((1, D), lambda t: (0, 0)),           # pcf
            pl.BlockSpec((1, D), lambda t: (0, 0)),           # pco
        ],
        out_specs=(seq(D), seq(D)),
        out_shape=(jax.ShapeDtypeStruct((T_pad, B, D), x_proj.dtype),
                   jax.ShapeDtypeStruct((T_pad, B, D), x_proj.dtype)),
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32)] * 2
        if _HAS_PLTPU else [],
        interpret=interpret,
        **kwargs,
    )(x_proj, mask_p.reshape(T_pad, 1, B), h0[None], c0[None], w_state,
      pci.reshape(1, D), pcf.reshape(1, D), pco.reshape(1, D))
    return hs[:T], cs[:T]


@functools.partial(jax.jit, static_argnames=("interpret",))
def lstm_scan_train(x_proj, mask, h0, c0, w_state, pci, pcf, pco,
                    interpret=False):
    """Differentiable fused LSTM scan.

    x_proj (T, B, 4D) precomputed input projections, mask (T, B) or
    None, h0/c0 (B, D), w_state (D, 4D), peepholes pci/pcf/pco (D,)
    -> (states (T, B, D), cells (T, B, D)).
    """
    T, B = x_proj.shape[:2]
    if mask is None:
        mask = jnp.ones((T, B), x_proj.dtype)
    return _lstm_train(x_proj, mask, h0, c0, w_state, pci, (pcf, pco),
                       interpret)
