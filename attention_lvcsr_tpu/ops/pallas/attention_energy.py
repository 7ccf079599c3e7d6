"""Fused beam-attention energy kernel.

The decode hot loop's dominant tensor is the attention match
``tanh(pre[u,l,:] + state_sum[uk,:] + conv[uk,l]*handler[:]) @ v`` over
(U*K hypotheses, L positions, M match dims).  The XLA path materializes
the conv projection and match tensors in HBM every step; this kernel
keeps everything in VMEM per utterance:

* grid over utterances ``u``;
* the shared ``pre`` (L, M) tile is loaded ONCE per utterance and reused
  by all K hypotheses (beam reuse in VMEM instead of K-fold HBM reads);
* per hypothesis: broadcast-add state row + rank-1 conv contribution,
  tanh on the VPU, contraction with ``v`` on the MXU;
* output: energies (U*K, L), never materializing (U*K, L, M).

Covers the ``conv_num_filters == 1`` case (all shipped reference configs,
e.g. exp/wsj/configs/*: conv_num_filters defaults to 1,
lvsr/bricks/recognizer.py:198); other cases fall back to the XLA path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu is importable on all platforms; kernels run via interpret off-TPU
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _kernel(pre_ref, state_ref, conv_ref, handler_ref, v_ref, bias_ref,
            out_ref, *, beam):
    # compute in f32 inside VMEM (Mosaic also restricts sub-32-bit
    # reshapes/extracts; inputs may be bf16)
    f32 = jnp.float32
    pre = pre_ref[0].astype(f32)            # (L, M)
    handler = handler_ref[:].astype(f32)    # (1, M)
    v = v_ref[:].astype(f32)                # (1, M)
    bias = bias_ref[0, 0]
    for k in range(beam):
        sp = state_ref[0, k].astype(f32)    # (M,)
        cv = conv_ref[:, k].astype(f32)     # (1, L)
        match = jnp.tanh(pre + sp[None, :]
                         + cv.reshape(-1, 1) * handler)
        e = jax.lax.dot_general(
            match, v.reshape(-1, 1),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32)[:, 0] + bias
        out_ref[0, k] = e.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("beam", "interpret"))
def beam_attention_energies(pre, state_sum, conv_out, handler_w, v, bias,
                            *, beam, interpret=False):
    """energies (U*K, L) = v . tanh(pre + state + conv (rank-1)) + bias.

    Parameters
    ----------
    pre : (U, L, M) shared preprocessed attended
    state_sum : (U*K, M) per-hypothesis state projections
    conv_out : (U*K, L) per-hypothesis conv-over-weights scalar track
    handler_w : (M,) the 1-filter handler projection row
    v : (M,) energy vector; bias: scalar (0 for softmax normalizers)
    """
    U, L, M = pre.shape
    UK = state_sum.shape[0]
    assert UK == U * beam

    grid = (U,)
    kernel = functools.partial(_kernel, beam=beam)
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)
    # (U, K, ...) layout so blocks cover full trailing dims (TPU tiling
    # requires the last two block dims divisible by (8, 128) or full).
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, L, M), lambda u: (u, 0, 0)),
            pl.BlockSpec((1, beam, M), lambda u: (u, 0, 0)),
            pl.BlockSpec((1, beam, L), lambda u: (u, 0, 0)),
            pl.BlockSpec((1, M), lambda u: (0, 0)),
            pl.BlockSpec((1, M), lambda u: (0, 0)),
            pl.BlockSpec((1, 1), lambda u: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, beam, L), lambda u: (u, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((U, beam, L), pre.dtype),
        interpret=interpret,
        **kwargs,
    )(pre, state_sum.reshape(U, beam, M), conv_out.reshape(U, beam, L),
      handler_w[None, :], v[None, :],
      # bias as f32: Mosaic only supports 32-bit scalar extracts
      jnp.asarray(bias, jnp.float32).reshape(1, 1))
    return out.reshape(UK, L)
