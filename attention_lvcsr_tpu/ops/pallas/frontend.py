"""Fused log-mel-fbank + delta frontend as ONE Pallas kernel.

Role of the reference's Kaldi feature pipeline
(``exp/wsj/write_hdf_dataset.sh:99-104``: ``compute-fbank-feats`` 40 mel
bins + energy, ``add-deltas``), redesigned for the MXU instead of
translated: the 512-point rFFT is expressed as two DFT **matmuls** — at
this size the MXU eats the extra MACs and the whole frontend becomes a
chain of matrix products the kernel keeps in VMEM, instead of XLA's
slow generic TPU FFT plus a dozen elementwise kernels:

* preemphasis and the Hamming window are linear, so they are folded
  into the DFT matrices on the host (``A = (DFT[:, :400] * window) @ P``);
* frames are built in-VMEM from three shifted ``(T, hop)`` row views of
  the waveform — no (T, 400) gather ever hits HBM;
* the 80 garbage columns beyond the 400-sample frame multiply zero rows
  of ``A`` (no lane-dim slicing);
* power spectrum, mel projection (second matmul), log, log-energy, and
  both Kaldi delta FIR passes (edge-replicated) happen in the same
  kernel; the only HBM output is the final (T, 123) feature matrix.

Variable utterance lengths inside a padded batch are handled with a
scalar-prefetched per-row frame count: rows past ``n`` are overwritten
with row ``n - 1`` before the delta FIRs, so the edge replication is
exact at every utterance's true end (host-parity incl. the last frames).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from attention_lvcsr_tpu.data.features import delta_coeffs, mel_filterbank
from attention_lvcsr_tpu.ops.pallas.common import HAS_PLTPU, pltpu


def _round_up(x, m):
    return -(-x // m) * m


@functools.lru_cache(maxsize=None)
def _matrices(sample_rate, num_bins, frame_ms, hop_ms, preemphasis):
    """(A_cos, A_sin, fbT, frame_length, hop, n_freqs) — host, cached.

    A_* are (frame_length + hop_pad, NB) with window+preemphasis folded
    in and zero rows beyond frame_length; fbT is (NB, num_bins) with
    zero rows beyond the n_freqs real bins.  NB is the lane-padded
    frequency count.
    """
    frame_length = int(sample_rate * frame_ms / 1000)
    hop = int(sample_rate * hop_ms / 1000)
    fft_size = 1 << (frame_length - 1).bit_length()
    n_freqs = fft_size // 2 + 1
    nb = _round_up(n_freqs, 128)

    # preemphasis as a matrix (pre[0] uses x[0], matching numpy fbank)
    P = np.eye(frame_length)
    P[0, 0] -= preemphasis
    for j in range(1, frame_length):
        P[j, j - 1] = -preemphasis
    w = np.hamming(frame_length)
    ang = -2.0 * math.pi * np.outer(np.arange(n_freqs),
                                    np.arange(frame_length)) / fft_size
    Ac = (np.cos(ang) * w) @ P                       # (n_freqs, 400)
    As = (np.sin(ang) * w) @ P
    # frames arrive as (T, frame_length + rest-of-row) with garbage
    # columns at the end: zero rows kill them in the contraction
    in_rows = frame_length + (-frame_length) % hop + hop
    A_cos = np.zeros((in_rows, nb), np.float32)
    A_sin = np.zeros((in_rows, nb), np.float32)
    A_cos[:frame_length, :n_freqs] = Ac.T
    A_sin[:frame_length, :n_freqs] = As.T
    fb = mel_filterbank(num_bins, fft_size, sample_rate)   # (bins, 257)
    fbT = np.zeros((nb, num_bins), np.float32)
    fbT[:n_freqs] = fb.T
    return (jnp.asarray(A_cos), jnp.asarray(A_sin), jnp.asarray(fbT),
            frame_length, hop, n_freqs)


def _dot_hi(a, b):
    # f32 DFT needs the multi-pass MXU mode: single-pass f32 on Mosaic
    # is bf16-accurate, which is ~1e-2 relative — visible after the log
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def _kernel(n_ref, rows_ref, ac_ref, as_ref, fb_ref, out_ref, *,
            T, frame_length, hop, num_bins, use_energy, deltas_order,
            delta_window):
    b = pl.program_id(0)
    rows = rows_ref[0].astype(jnp.float32)           # (T + k, hop)
    k = frame_length // hop + (1 if frame_length % hop else 0)

    # the (T, frame_length) frame matrix is never materialized: a
    # lane-dim concat of sublane-shifted views is a Mosaic relayout
    # (and was rejected outright on v5e), so the DFT contraction is
    # decomposed over the shifted (T, hop) row views —
    # frames @ A == sum_i view_i @ A[i*hop:(i+1)*hop]
    xc = xs = None
    energy = None
    col = jax.lax.broadcasted_iota(jnp.int32, (T, hop), 1)
    for i in range(k + 1):
        live = frame_length - i * hop                # frame cols in view
        if live <= 0:
            break
        v = rows[i:T + i]                            # (T, hop)
        c = _dot_hi(v, ac_ref[i * hop:(i + 1) * hop, :])
        s = _dot_hi(v, as_ref[i * hop:(i + 1) * hop, :])
        xc = c if xc is None else xc + c
        xs = s if xs is None else xs + s
        if use_energy:
            sq = v * v
            if live < hop:
                sq = jnp.where(col < live, sq, 0.0)
            e = jnp.sum(sq, axis=1, keepdims=True)
            energy = e if energy is None else energy + e

    feats = []
    if use_energy:
        feats.append(jnp.log(jnp.maximum(energy, 1e-10)))
    power = xc * xc + xs * xs                        # (T, NB)
    mel = jnp.log(jnp.maximum(_dot_hi(power, fb_ref[:]), 1e-10))
    feats.append(mel)
    f = jnp.concatenate(feats, axis=1)               # (T, D0)

    # exact edge replication at the utterance's true end: rows >= n
    # become copies of row n-1 before EVERY FIR pass (numpy add_deltas
    # edge-replicates each delta order's own output, not just the base)
    n = n_ref[b]
    row = jax.lax.broadcasted_iota(jnp.int32, f.shape, 0)

    def clamp_tail(x):
        # row n-1 via masked VPU reduction (exact; Mosaic has no
        # dynamic_slice, and a one-hot f32 matmul is bf16-pass inexact)
        last = jnp.sum(jnp.where(row == n - 1, x, 0.0), axis=0,
                       keepdims=True)
        return jnp.where(row < n, x, last)

    f = clamp_tail(f)
    coeffs = delta_coeffs(delta_window)              # numpy, correlation
    outs = [f]
    cur = f
    for _ in range(deltas_order):
        pad_lo = jnp.concatenate([cur[:1]] * delta_window + [cur],
                                 axis=0)
        padded = jnp.concatenate([pad_lo] + [cur[-1:]] * delta_window,
                                 axis=0)             # (T + 2w, D0)
        nxt = clamp_tail(sum(float(c) * padded[m:m + T]
                             for m, c in enumerate(coeffs) if c))
        outs.append(nxt)
        cur = nxt
    out = jnp.concatenate(outs, axis=1)              # (T, D0*(1+order))
    out_ref[0] = out.astype(out_ref.dtype)


def frontend_vmem_bytes(T, num_bins=40, use_energy=True,
                        sample_rate=16000, frame_ms=25.0, hop_ms=10.0):
    """Rough VMEM budget for one grid step (guard for the dispatcher).

    Derived from the SAME geometry the kernel builds (``_matrices``):
    hop-sized row views, (frame+pad, NB) DFT matrices with NB the
    128-padded frequency count — so the guard stays correct for
    non-16 kHz audio."""
    frame_length = int(sample_rate * frame_ms / 1000)
    hop = int(sample_rate * hop_ms / 1000)
    in_rows = frame_length + (-frame_length) % hop + hop
    fft_size = 1 << (frame_length - 1).bit_length()
    nb = -(-(fft_size // 2 + 1) // 128) * 128       # padded n_freqs
    d0 = num_bins + (1 if use_energy else 0)
    per_row = 4 * (hop + 2 * in_rows + 3 * nb + 8 * d0 + 128)
    weights = 4 * (2 * in_rows * nb + nb * num_bins)
    return T * per_row + weights


def fbank_deltas_pallas(wav, num_frames=None, sample_rate=16000,
                        num_bins=40, frame_ms=25.0, hop_ms=10.0,
                        preemphasis=0.97, use_energy=True,
                        deltas_order=2, delta_window=2,
                        interpret=False):
    """Fused frontend: (B, N) waveforms -> (B, T, D) features.

    ``num_frames`` (B,) int32 gives each row's true frame count (defaults
    to the full padded T); features past a row's count replicate its last
    real frame through the delta FIRs, then carry no information — mask
    them downstream exactly like padded frames from the HDF5 pipeline.
    """
    ac, asin, fbT, frame_length, hop, _ = _matrices(
        sample_rate, num_bins, float(frame_ms), float(hop_ms),
        float(preemphasis))
    B, N = wav.shape
    T = 1 + (N - frame_length) // hop
    if T < 1:
        raise ValueError(f"waveform too short: {N} samples")
    k = frame_length // hop + (1 if frame_length % hop else 0)
    rows_needed = T + k + 1
    n_pad = rows_needed * hop
    wav = jnp.asarray(wav, jnp.float32)
    if n_pad > N:
        wav = jnp.pad(wav, ((0, 0), (0, n_pad - N)))
    else:
        wav = wav[:, :n_pad]
    rows = wav.reshape(B, rows_needed, hop)

    if num_frames is None:
        num_frames = jnp.full((B,), T, jnp.int32)
    num_frames = jnp.clip(jnp.asarray(num_frames, jnp.int32), 1, T)

    d0 = num_bins + (1 if use_energy else 0)
    D = d0 * (1 + deltas_order)
    kernel = functools.partial(
        _kernel, T=T, frame_length=frame_length, hop=hop,
        num_bins=num_bins, use_energy=use_energy,
        deltas_order=deltas_order, delta_window=delta_window)
    nb = ac.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, rows_needed, hop), lambda b, n: (b, 0, 0)),
            pl.BlockSpec((ac.shape[0], nb), lambda b, n: (0, 0)),
            pl.BlockSpec((ac.shape[0], nb), lambda b, n: (0, 0)),
            pl.BlockSpec((nb, num_bins), lambda b, n: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, T, D), lambda b, n: (b, 0, 0)),
    )
    kwargs = {}
    if HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, D), jnp.float32),
        interpret=interpret,
        **kwargs,
    )(num_frames, rows, ac, asin, fbT)
