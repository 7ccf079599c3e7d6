"""Speech feature extraction: log-mel filterbanks + deltas + CMVN.

The reference shells out to Kaldi for features
(``exp/wsj/write_hdf_dataset.sh:99-104``: ``compute-fbank-feats`` with 40
mel bins + energy, ``add-deltas``, global CMVN).  This module provides the
same pipeline natively:

* a numpy implementation for the offline dataset converter
  (:mod:`tools.kaldi2hdf`);
* a JAX implementation (same math, jit/vmap-able) so the frontend can run
  on device in the serving path — frames -> matmul with the mel
  filterbank (MXU) -> log -> delta FIR convs, all fusable by XLA.

Defaults follow Kaldi's fbank: 25 ms window / 10 ms hop, preemphasis
0.97, Hamming-type window, 23..40 mel bins, optional log-energy feature,
delta window 2 with order 2.
"""
from __future__ import annotations

import math
from typing import Optional

import numpy as np


def mel_filterbank(num_bins: int, fft_size: int, sample_rate: int,
                   low_freq: float = 20.0,
                   high_freq: Optional[float] = None) -> np.ndarray:
    """Triangular mel filterbank matrix (num_bins, fft_size//2 + 1)."""
    if high_freq is None:
        high_freq = sample_rate / 2.0
    mel = lambda f: 1127.0 * math.log(1.0 + f / 700.0)
    imel = lambda m: 700.0 * (math.exp(m / 1127.0) - 1.0)
    points = np.linspace(mel(low_freq), mel(high_freq), num_bins + 2)
    freqs = np.asarray([imel(m) for m in points])
    bins = freqs * fft_size / sample_rate
    n_freqs = fft_size // 2 + 1
    fb = np.zeros((num_bins, n_freqs), np.float32)
    idx = np.arange(n_freqs)
    for b in range(num_bins):
        left, center, right = bins[b], bins[b + 1], bins[b + 2]
        up = (idx - left) / max(center - left, 1e-10)
        down = (right - idx) / max(right - center, 1e-10)
        fb[b] = np.maximum(0.0, np.minimum(up, down))
    return fb


def frame_signal(wav: np.ndarray, frame_length: int, hop: int) -> np.ndarray:
    n = max(0, 1 + (len(wav) - frame_length) // hop)
    if n == 0:
        return np.zeros((0, frame_length), np.float32)
    idx = np.arange(frame_length)[None, :] + hop * np.arange(n)[:, None]
    return wav[idx].astype(np.float32)


def fbank(wav: np.ndarray, sample_rate: int = 16000, num_bins: int = 40,
          frame_ms: float = 25.0, hop_ms: float = 10.0,
          preemphasis: float = 0.97, use_energy: bool = True,
          dither: float = 0.0, rng=None) -> np.ndarray:
    """Log-mel filterbank features (T, num_bins [+1 energy])."""
    wav = np.asarray(wav, np.float64)
    if dither and rng is not None:
        wav = wav + dither * rng.randn(len(wav))
    frame_length = int(sample_rate * frame_ms / 1000)
    hop = int(sample_rate * hop_ms / 1000)
    fft_size = 1 << (frame_length - 1).bit_length()

    frames = frame_signal(wav, frame_length, hop)
    if not len(frames):
        return np.zeros((0, num_bins + (1 if use_energy else 0)),
                        np.float32)
    log_energy = np.log(np.maximum((frames ** 2).sum(axis=1), 1e-10))
    # per-frame preemphasis + window
    pre = frames - preemphasis * np.concatenate(
        [frames[:, :1], frames[:, :-1]], axis=1)
    window = np.hamming(frame_length)
    spec = np.abs(np.fft.rfft(pre * window, n=fft_size, axis=1)) ** 2
    fb = mel_filterbank(num_bins, fft_size, sample_rate)
    mels = np.log(np.maximum(spec @ fb.T, 1e-10))
    if use_energy:
        mels = np.concatenate([log_energy[:, None], mels], axis=1)
    return mels.astype(np.float32)


def delta_coeffs(window: int = 2) -> np.ndarray:
    """Kaldi-style delta regression filter of half-width ``window``."""
    norm = 2 * sum(i * i for i in range(1, window + 1))
    return np.asarray([i / norm for i in range(-window, window + 1)],
                      np.float32)


def add_deltas(feats: np.ndarray, order: int = 2,
               window: int = 2) -> np.ndarray:
    """Append delta (and delta-delta, ...) features (Kaldi add-deltas).

    Edge frames are edge-replicated before the regression filter.
    """
    coeffs = delta_coeffs(window)[::-1]  # correlation via convolve
    outs = [feats]
    current = feats
    for _ in range(order):
        padded = np.pad(current, ((window, window), (0, 0)), mode="edge")
        nxt = np.stack([
            np.convolve(padded[:, d], coeffs, mode="valid")
            for d in range(padded.shape[1])], axis=1)
        outs.append(nxt.astype(np.float32))
        current = nxt
    return np.concatenate(outs, axis=1)


def extract_features(wav, sample_rate=16000, num_bins=40, use_energy=True,
                     deltas_order: int = 2) -> np.ndarray:
    """compute-fbank-feats + add-deltas pipeline (one utterance)."""
    feats = fbank(wav, sample_rate=sample_rate, num_bins=num_bins,
                  use_energy=use_energy)
    if deltas_order:
        feats = add_deltas(feats, order=deltas_order)
    return feats


# ---------------------------------------------------------------------------
# JAX (device) versions — identical math, jit/vmap-able
# ---------------------------------------------------------------------------

def jax_fbank(wav, sample_rate: int = 16000, num_bins: int = 40,
              frame_ms: float = 25.0, hop_ms: float = 10.0,
              preemphasis: float = 0.97, use_energy: bool = True):
    import jax.numpy as jnp
    frame_length = int(sample_rate * frame_ms / 1000)
    hop = int(sample_rate * hop_ms / 1000)
    fft_size = 1 << (frame_length - 1).bit_length()
    n = max(0, 1 + (wav.shape[-1] - frame_length) // hop)

    idx = (jnp.arange(frame_length)[None, :]
           + hop * jnp.arange(n)[:, None])
    frames = wav[..., idx]
    log_energy = jnp.log(jnp.maximum((frames ** 2).sum(-1), 1e-10))
    pre = frames - preemphasis * jnp.concatenate(
        [frames[..., :1], frames[..., :-1]], axis=-1)
    window = jnp.asarray(np.hamming(frame_length), jnp.float32)
    spec = jnp.abs(jnp.fft.rfft(pre * window, n=fft_size, axis=-1)) ** 2
    fb = jnp.asarray(mel_filterbank(num_bins, fft_size, sample_rate))
    mels = jnp.log(jnp.maximum(spec @ fb.T, 1e-10))
    if use_energy:
        mels = jnp.concatenate([log_energy[..., None], mels], axis=-1)
    return mels


def device_frontend(wav_batch, num_frames=None, sample_rate: int = 16000,
                    num_bins: int = 40, use_energy: bool = True,
                    deltas_order: int = 2, interpret: bool = False):
    """On-device fbank+deltas for a (B, N) waveform batch.

    Dispatches to the fused Pallas kernel (``ops/pallas/frontend.py``)
    when the whole-utterance working set fits the VMEM guard, else to
    the jitted XLA composition of :func:`jax_fbank` + deltas.  Returns
    (B, T, D) float32; rows past ``num_frames[b]`` carry replicated
    edge features — mask them downstream.
    """
    import jax

    from attention_lvcsr_tpu.ops.pallas.common import HAS_PLTPU
    from attention_lvcsr_tpu.ops.pallas.frontend import (
        fbank_deltas_pallas, frontend_vmem_bytes)

    frame_length = int(sample_rate * 25.0 / 1000)
    hop = int(sample_rate * 10.0 / 1000)
    T = 1 + (wav_batch.shape[1] - frame_length) // hop
    use_kernel = interpret or (HAS_PLTPU
                               and jax.default_backend() == "tpu")
    if use_kernel and frontend_vmem_bytes(
            T, num_bins, use_energy,
            sample_rate=sample_rate) < 64 * 2 ** 20:
        return fbank_deltas_pallas(
            wav_batch, num_frames=num_frames, sample_rate=sample_rate,
            num_bins=num_bins, use_energy=use_energy,
            deltas_order=deltas_order, interpret=interpret)

    import jax.numpy as jnp

    if num_frames is None:
        num_frames = jnp.full((wav_batch.shape[0],), T, jnp.int32)
    num_frames = jnp.clip(jnp.asarray(num_frames, jnp.int32), 1, T)

    def one(w, n):
        f = jax_fbank(w, sample_rate=sample_rate, num_bins=num_bins,
                      use_energy=use_energy)
        row = jnp.arange(f.shape[0])[:, None]

        def clamp(x):
            # same end-edge semantics as the Pallas kernel: rows past
            # the true frame count replicate row n-1 before EVERY FIR
            last = jax.lax.dynamic_slice_in_dim(x, n - 1, 1, 0)
            return jnp.where(row < n, x, last)

        cur = clamp(f)
        outs = [cur]
        coeffs = delta_coeffs()
        for _ in range(deltas_order):
            padded = jnp.concatenate(
                [jnp.repeat(cur[:1], 2, 0), cur,
                 jnp.repeat(cur[-1:], 2, 0)], axis=0)
            cur = clamp(sum(float(c) * padded[m:m + f.shape[0]]
                            for m, c in enumerate(coeffs) if c))
            outs.append(cur)
        return jnp.concatenate(outs, axis=1)

    return jax.vmap(one)(jnp.asarray(wav_batch, jnp.float32), num_frames)


def jax_add_deltas(feats, order: int = 2, window: int = 2):
    """Delta FIR along time via depthwise convolution (fusable by XLA)."""
    import jax.numpy as jnp
    from jax import lax
    coeffs = jnp.asarray(delta_coeffs(window))
    outs = [feats]
    current = feats
    for _ in range(order):
        padded = jnp.concatenate(
            [jnp.repeat(current[..., :1, :], window, axis=-2), current,
             jnp.repeat(current[..., -1:, :], window, axis=-2)], axis=-2)
        # (T+2w, D) -> correlation along time per feature dim
        x = jnp.moveaxis(padded, -1, 0)[:, None, :]   # (D, 1, T+2w)
        k = coeffs[None, None, :]
        y = lax.conv_general_dilated(x, k, (1,), "VALID",
                                     dimension_numbers=("NCH", "OIH",
                                                        "NCH"))
        nxt = jnp.moveaxis(y[:, 0, :], 0, -1)
        outs.append(nxt)
        current = nxt
    return jnp.concatenate(outs, axis=-1)
