"""Fused GRU sequence scan: the whole time loop as ONE Pallas kernel.

An XLA `lax.scan` compiles to a while loop whose body is several fusions;
at T=800 encoder frames that is thousands of kernel dispatches per layer.
Here the recurrence runs inside a single kernel: grid over time steps
(sequential on one core), the hidden state lives in a VMEM scratch that
persists across grid steps, and the recurrent weights stay VMEM-resident
(constant block index -> fetched once).  Input/gate projections are still
precomputed outside as large batched matmuls (MXU-friendly); the kernel
only carries the sequential part.

Forward-only (no custom VJP yet): used on the inference paths
(decode contexts / sampling); training keeps the XLA scan.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _kernel(x_ref, g_ref, m_ref, h0_ref, wss_ref, wsg_ref, out_ref,
            h_scratch, *, dim, masked, chunk, mxu_dt):
    # ``chunk`` time steps per grid step (amortizes block fetch +
    # dispatch overhead, which dominates a 1-step grid); ``mxu_dt``
    # keeps bf16 activations' matmul operands bf16 (single-pass MXU
    # issue) with f32 accumulation
    f32 = jnp.float32
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scratch[...] = h0_ref[0].astype(f32)

    h = h_scratch[...]                                   # (B, D) f32
    wsg = wsg_ref[:].astype(mxu_dt)
    wss = wss_ref[:].astype(mxu_dt)
    for j in range(chunk):
        gates = jax.nn.sigmoid(
            jax.lax.dot_general(h.astype(mxu_dt), wsg,
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=f32)
            + g_ref[j].astype(f32))
        update = gates[:, :dim]
        reset = gates[:, dim:]
        cand = jnp.tanh(
            jax.lax.dot_general((h * reset).astype(mxu_dt), wss,
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=f32)
            + x_ref[j].astype(f32))
        new_h = update * cand + (1.0 - update) * h
        if masked:
            # unmasked calls skip the per-step mask load/multiply; any
            # chunk-padding garbage beyond T is sliced off by the caller
            m = m_ref[j, 0].astype(f32).reshape(-1, 1)   # (B, 1)
            new_h = m * new_h + (1.0 - m) * h
        out_ref[j] = new_h.astype(out_ref.dtype)
        h = new_h
    h_scratch[...] = h


@functools.partial(jax.jit, static_argnames=("interpret",))
def gru_scan(x_proj, gate_proj, mask, h0, w_state, w_gates,
             interpret=False):
    """Run the GRU over time in one kernel.

    x_proj (T, B, D), gate_proj (T, B, 2D), mask (T, B) or None,
    h0 (B, D), w_state (D, D), w_gates (D, 2D) -> states (T, B, D).
    """
    T, B, D = x_proj.shape
    masked = mask is not None
    if mask is None:
        mask = jnp.ones((T, B), x_proj.dtype)
    from attention_lvcsr_tpu.ops.pallas.common import pad_time
    C = min(8, T)
    T_pad = -(-T // C) * C
    x_proj = pad_time(x_proj, T_pad)
    gate_proj = pad_time(gate_proj, T_pad)
    mask = pad_time(mask, T_pad)

    from attention_lvcsr_tpu.ops.pallas.common import mxu_dtype
    kernel = functools.partial(_kernel, dim=D, masked=masked,
                               chunk=C, mxu_dt=mxu_dtype(x_proj.dtype))
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
        scratch = [pltpu.VMEM((B, D), jnp.float32)]
    else:
        scratch = [pltpu.VMEM((B, D), jnp.float32)] if _HAS_PLTPU else []

    out = pl.pallas_call(
        kernel,
        grid=(T_pad // C,),
        in_specs=[
            pl.BlockSpec((C, B, D), lambda t: (t, 0, 0)),      # x
            pl.BlockSpec((C, B, 2 * D), lambda t: (t, 0, 0)),  # gates
            pl.BlockSpec((C, 1, B), lambda t: (t, 0, 0)),      # mask
            pl.BlockSpec((1, B, D), lambda t: (0, 0, 0)),      # h0
            pl.BlockSpec((D, D), lambda t: (0, 0)),            # w_state
            pl.BlockSpec((D, 2 * D), lambda t: (0, 0)),        # w_gates
        ],
        out_specs=pl.BlockSpec((C, B, D), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T_pad, B, D), x_proj.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
        **kwargs,
    )(x_proj, gate_proj, mask.reshape(T_pad, 1, B), h0[None], w_state,
      w_gates)
    return out[:T]
