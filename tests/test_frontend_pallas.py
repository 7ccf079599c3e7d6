"""Fused Pallas log-mel+delta frontend vs the numpy Kaldi-style pipeline
(``data/features.py`` — itself golden-tested against the reference's
compute-fbank-feats semantics).  Interpret mode on CPU."""
import numpy as np
import pytest
from numpy.testing import assert_allclose

from attention_lvcsr_tpu.data.features import extract_features
from attention_lvcsr_tpu.ops.pallas.frontend import (fbank_deltas_pallas,
                                                     frontend_vmem_bytes)


@pytest.fixture(scope="module")
def wavs():
    rng = np.random.RandomState(0)
    # speech-ish: coloured noise + a few tones, different lengths
    t = np.arange(16000)
    w1 = (0.1 * rng.randn(16000)
          + 0.3 * np.sin(2 * np.pi * 440 * t / 16000)
          + 0.2 * np.sin(2 * np.pi * 1330 * t / 16000)).astype("f")
    w2 = (0.2 * rng.randn(12000)
          + 0.4 * np.sin(2 * np.pi * 220 * np.arange(12000) / 16000)
          ).astype("f")
    return w1, w2


def test_single_utterance_matches_numpy(wavs):
    w1, _ = wavs
    ref = extract_features(w1)                       # (T, 123)
    out = np.asarray(fbank_deltas_pallas(w1[None], interpret=True)[0])
    assert out.shape == ref.shape
    # f32 DFT-as-matmul vs float64 np.fft: compare after the log
    assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_batch_with_lengths_matches_per_utterance(wavs):
    w1, w2 = wavs
    N = len(w1)
    batch = np.zeros((2, N), "f")
    batch[0] = w1
    batch[1, :len(w2)] = w2
    t1 = extract_features(w1).shape[0]
    t2 = extract_features(w2).shape[0]
    out = np.asarray(fbank_deltas_pallas(
        batch, num_frames=np.asarray([t1, t2]), interpret=True))
    assert_allclose(out[0, :t1], extract_features(w1), rtol=2e-3,
                    atol=2e-3)
    # row 2 is shorter: its true-end delta edge replication must match
    # the per-utterance numpy result INCLUDING the last frames
    assert_allclose(out[1, :t2], extract_features(w2), rtol=2e-3,
                    atol=2e-3)


def test_no_energy_variant(wavs):
    w1, _ = wavs
    ref = extract_features(w1[:4000], use_energy=False)
    out = np.asarray(fbank_deltas_pallas(w1[None, :4000],
                                         use_energy=False,
                                         interpret=True)[0])
    assert out.shape == ref.shape
    assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_vmem_guard_is_sane():
    assert frontend_vmem_bytes(100) < frontend_vmem_bytes(1000)
    assert frontend_vmem_bytes(800) < 64 * 1024 * 1024


def test_device_frontend_cpu_fallback_matches_numpy(wavs):
    """On a non-TPU backend the dispatcher's XLA path must reproduce the
    numpy pipeline with the same exact end-edge semantics."""
    from attention_lvcsr_tpu.data.features import device_frontend
    w1, w2 = wavs
    N = len(w1)
    batch = np.zeros((2, N), "f")
    batch[0] = w1
    batch[1, :len(w2)] = w2
    t1 = extract_features(w1).shape[0]
    t2 = extract_features(w2).shape[0]
    out = np.asarray(device_frontend(batch,
                                     num_frames=np.asarray([t1, t2])))
    assert_allclose(out[0, :t1], extract_features(w1), rtol=2e-3,
                    atol=2e-3)
    assert_allclose(out[1, :t2], extract_features(w2), rtol=2e-3,
                    atol=2e-3)
