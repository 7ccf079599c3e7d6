"""Fused one-kernel decode score vs the XLA path (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from attention_lvcsr_tpu.models.recognizer import RecognizerNet
from attention_lvcsr_tpu.ops.expressions import conv1d
from attention_lvcsr_tpu.ops.pallas.decode_score import toeplitz_band

U, K = 2, 3

BASE = dict(
    input_dims={"recordings": 5}, input_num_chars={},
    eos_label=4, num_phonemes=5, dim_dec=8, dims_bidir=[6],
    enc_transition="gru", dec_transition="gru",
    attention_type="content_and_conv", conv_n=2,
    use_states_for_readout=False,
    criterion={"name": "log_likelihood"},
    bottom={"bottom_class": "speech"}, subsample=[1],
    post_merge_dims=[10], max_decoded_length_scale=1.0)


def test_toeplitz_matches_conv1d():
    rng = np.random.RandomState(0)
    filters = jnp.asarray(rng.randn(1, 5), jnp.float32)  # n = 2
    w = jnp.asarray(rng.randn(4, 12), jnp.float32)
    ref = conv1d(w, filters, border_mode="full")[:, 0, 2:-2]
    toep = toeplitz_band(filters, 12)
    assert_allclose(np.asarray(w @ toep), np.asarray(ref), rtol=1e-5,
                    atol=1e-6)


@pytest.mark.parametrize("prior", [
    pytest.param(None, marks=pytest.mark.slow),
    {"type": "expanding", "initial_begin": 0, "initial_end": 6,
     "min_speed": 1.0, "max_speed": 2.0},
    {"type": "window_around_mean", "before": 3, "after": 3},
    {"type": "window_around_median", "before": 3, "after": 3},
])
def test_fused_score_matches_xla(prior):
    cfg = dict(BASE, prior=prior)
    rng = np.random.RandomState(1)
    inputs = jnp.asarray(rng.randn(U, 14, 5), jnp.float32)
    mask = jnp.asarray((np.arange(14)[None] <
                        np.array([[14], [11]])).astype("f"))
    labels = jnp.zeros((U, 3), jnp.int32)
    lmask = jnp.ones((U, 3), jnp.float32)

    def build(use_pallas):
        net = RecognizerNet(**cfg)
        params = net.init(jax.random.PRNGKey(0), inputs, mask, labels,
                          lmask, method=net.cost)
        # patch the attention pallas mode by rebuilding the net config
        return net, params

    net, params = build("never")
    ctx = net.apply(params, inputs, mask, method=net.decode_contexts)
    assert "fused_tables" not in ctx  # cpu: pallas off by default
    carry = net.apply(params, U * K, ctx, method=net.decode_init)
    # evolve a couple of steps with the XLA path to get nontrivial state
    for t in range(2):
        g, costs, _ = net.apply(params, carry, ctx,
                                method=net.decode_score, beam=K)
        syms = jnp.argmin(costs, axis=1).astype(jnp.int32)
        carry = net.apply(params, carry, g, syms, ctx,
                          method=net.decode_advance)

    g_ref, costs_ref, _ = net.apply(params, carry, ctx,
                                    method=net.decode_score, beam=K)

    # fused path (interpret mode)
    tables = net.apply(params, ctx["attended"].shape[1],
                       ctx["attended"].dtype,
                       method=lambda m, L, d:
                       m.generator.fused_score_tables(L, d))
    ctx_fused = dict(ctx, fused_tables=tables)
    g_fused, costs_fused, _ = net.apply(
        params, carry, ctx_fused,
        method=lambda m, c, cx: m.generator._fused_score(
            c, cx, K, interpret=True))

    assert_allclose(np.asarray(costs_fused),
                    np.asarray(costs_ref), rtol=1e-4, atol=1e-4)
    assert_allclose(np.asarray(g_fused["weights"]),
                    np.asarray(g_ref["weights"]), rtol=1e-4, atol=1e-5)
    assert_allclose(np.asarray(g_fused["energies"]),
                    np.asarray(g_ref["energies"]), rtol=1e-4, atol=1e-4)
    assert_allclose(np.asarray(g_fused["weighted_averages"]),
                    np.asarray(g_ref["weighted_averages"]),
                    rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(g_fused["step"]),
                                  np.asarray(g_ref["step"]))
