"""Pallas fused energy kernel vs XLA path parity (interpreter mode)."""
import jax
import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose

from attention_lvcsr_tpu.models.attention import \
    SequenceContentAndConvAttention

U, K, L, D, M = 3, 4, 16, 6, 8


def _run(use_pallas):
    att = SequenceContentAndConvAttention(
        state_names=("states",), attended_dim=D, match_dim=M, conv_n=2,
        conv_num_filters=1, use_pallas=use_pallas)
    rng = np.random.RandomState(0)
    attended = jnp.asarray(rng.randn(U, L, D), jnp.float32)
    mask = jnp.ones((U, L))
    states = {"states": jnp.asarray(rng.randn(U * K, 5), jnp.float32)}
    w = rng.rand(U * K, L).astype("float32")
    w /= w.sum(1, keepdims=True)
    glimpses = {
        "weighted_averages": jnp.zeros((U * K, D)),
        "weights": jnp.asarray(w),
        "energies": jnp.asarray(w),
        "step": jnp.ones((U * K,), jnp.int32),
    }
    variables = att.init(jax.random.PRNGKey(1), attended, None, mask,
                         glimpses, states, beam=K,
                         method=att.take_glimpses)
    out = att.apply(variables, attended, None, mask, glimpses, states,
                    beam=K, method=att.take_glimpses)
    return out


def test_pallas_energy_matches_xla():
    ref = _run("never")
    pal = _run("interpret")
    assert_allclose(np.asarray(pal["energies"]), np.asarray(ref["energies"]),
                    rtol=2e-4, atol=2e-5)
    assert_allclose(np.asarray(pal["weights"]), np.asarray(ref["weights"]),
                    rtol=2e-4, atol=2e-5)
    assert_allclose(np.asarray(pal["weighted_averages"]),
                    np.asarray(ref["weighted_averages"]),
                    rtol=2e-4, atol=2e-5)
