"""Fused Pallas GRU scan vs XLA scan parity (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from attention_lvcsr_tpu.models.cells import GatedRecurrent

T, B, D = 9, 4, 8


@pytest.mark.parametrize("with_mask", [False, True])
def test_pallas_gru_scan_matches_xla(with_mask):
    rng = np.random.RandomState(0)
    cell = GatedRecurrent(dim=D)
    seqs = {"inputs": jnp.asarray(rng.randn(T, B, D), jnp.float32),
            "gate_inputs": jnp.asarray(rng.randn(T, B, 2 * D), jnp.float32)}
    mask = (jnp.asarray((rng.uniform(size=(T, B)) > 0.3).astype("f"))
            if with_mask else None)
    params = cell.init(jax.random.PRNGKey(0), seqs, mask, method=cell.scan)
    ref = cell.apply(params, seqs, mask, method=cell.scan)
    out = cell.apply(params, seqs, mask, pallas="interpret",
                     method=cell.scan)
    assert_allclose(np.asarray(out["states"]), np.asarray(ref["states"]),
                    rtol=1e-5, atol=1e-5)
    assert_allclose(np.asarray(out["final"]["states"]),
                    np.asarray(ref["final"]["states"]), rtol=1e-5,
                    atol=1e-5)


def test_encoder_fast_path_matches(recognizer_config=None):
    from attention_lvcsr_tpu.models.encoder import Encoder
    rng = np.random.RandomState(1)
    enc = Encoder(transition="gru", dims=(6,), subsample=(1,), bidir=True)
    x = jnp.asarray(rng.randn(2, 10, 5), jnp.float32)
    mask = jnp.asarray((np.arange(10)[None] <
                        np.array([[10], [7]])).astype("f"))
    params = enc.init(jax.random.PRNGKey(0), x, mask)
    ref, _ = enc.apply(params, x, mask)
    fast, _ = enc.apply(params, x, mask, pallas="interpret")
    assert_allclose(np.asarray(fast), np.asarray(ref), rtol=1e-5,
                    atol=1e-5)
