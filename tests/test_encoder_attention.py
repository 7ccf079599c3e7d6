"""Encoder subsampling/masking and attention-window semantics tests."""
import jax
import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose

from attention_lvcsr_tpu.models.attention import (
    SequenceContentAndConvAttention, SequenceContentAttention)
from attention_lvcsr_tpu.models.encoder import Encoder

B, T, F = 2, 12, 5


def test_encoder_shapes_and_subsampling():
    enc = Encoder(transition="gru", dims=(4, 6), subsample=(1, 2), bidir=True)
    x = jnp.asarray(np.random.RandomState(0).randn(B, T, F), jnp.float32)
    mask = jnp.ones((B, T))
    params = enc.init(jax.random.PRNGKey(0), x, mask)
    out, out_mask = enc.apply(params, x, mask)
    assert out.shape == (B, T // 2, 12)  # bidir doubles the feature dim
    assert out_mask.shape == (B, T // 2)
    assert enc.dim_encoded == 12


def test_encoder_mask_invariance():
    """Padded frames must not change the valid-region encodings."""
    enc = Encoder(transition="gru", dims=(4,), subsample=(1,), bidir=True)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, T, F), jnp.float32)
    mask = jnp.asarray((np.arange(T) < 8)[None, :].astype('float32'))
    params = enc.init(jax.random.PRNGKey(0), x, mask)
    out1, _ = enc.apply(params, x, mask)
    # Perturb padded frames only
    noise = jnp.asarray(rng.randn(1, T, F), jnp.float32) * (1 - mask)[..., None]
    out2, _ = enc.apply(params, x + 100 * noise, mask)
    assert_allclose(np.asarray(out1[:, :8]), np.asarray(out2[:, :8]),
                    atol=1e-5)


def _setup_conv_attention(prior=None, L=10, D=6, match=4):
    att = SequenceContentAndConvAttention(
        state_names=("states",), attended_dim=D, match_dim=match,
        conv_n=2, conv_num_filters=3, prior=prior)
    rng = np.random.RandomState(2)
    attended = jnp.asarray(rng.randn(B, L, D), jnp.float32)
    states = {"states": jnp.asarray(rng.randn(B, 5), jnp.float32)}
    mask = jnp.ones((B, L))

    def run(params_rng, glimpses=None):
        variables = att.init(
            jax.random.PRNGKey(params_rng), B, attended,
            method=att.initial_glimpses)
        if glimpses is None:
            glimpses = att.apply(variables, B, attended,
                                 method=att.initial_glimpses)
        # init full take_glimpses to create all params
        variables = att.init(jax.random.PRNGKey(params_rng), attended, None,
                             mask, glimpses, states,
                             method=att.take_glimpses)
        out = att.apply(variables, attended, None, mask, glimpses, states,
                        method=att.take_glimpses)
        return out

    return att, attended, states, mask, run


def test_conv_attention_shapes_and_normalization():
    att, attended, states, mask, run = _setup_conv_attention()
    out = run(0)
    L = attended.shape[1]
    assert out["weights"].shape == (B, L)
    assert out["energies"].shape == (B, L)
    assert out["weighted_averages"].shape == (B, attended.shape[2])
    assert_allclose(np.asarray(out["weights"].sum(axis=1)), 1.0, rtol=1e-5)
    assert np.all(np.asarray(out["step"]) == 1)


def test_expanding_window_restricts_support():
    prior = dict(type="expanding", initial_begin=2, initial_end=5,
                 min_speed=0, max_speed=0)
    att, attended, states, mask, run = _setup_conv_attention(prior=prior)
    out = run(0)
    w = np.asarray(out["weights"])
    # Zero outside [2, 5), sums to one inside.
    assert_allclose(w[:, :2], 0.0)
    assert_allclose(w[:, 5:], 0.0)
    assert_allclose(w.sum(axis=1), 1.0, rtol=1e-5)
    # Energies outside the window are pasted zeros.
    e = np.asarray(out["energies"])
    assert_allclose(e[:, :2], 0.0)
    assert_allclose(e[:, 5:], 0.0)


def test_window_around_mean():
    prior = dict(type="window_around_mean", before=2, after=2)
    att, attended, states, mask, run = _setup_conv_attention(prior=prior)
    # Previous weights focused at position 5 -> window approx (3, 7)
    w_prev = np.zeros((B, 10), 'float32')
    w_prev[:, 5] = 1.0
    glimpses = {
        "weighted_averages": jnp.zeros((B, 6)),
        "weights": jnp.asarray(w_prev),
        "energies": jnp.asarray(w_prev),
        "step": jnp.ones((B,), jnp.int32),
    }
    out = run(0, glimpses=glimpses)
    w = np.asarray(out["weights"])
    # strict inequalities: support is positions 4..6
    assert_allclose(w[:, :4], 0.0)
    assert_allclose(w[:, 7:], 0.0)
    assert_allclose(w.sum(axis=1), 1.0, rtol=1e-5)


def test_window_around_median():
    prior = dict(type="window_around_median", before=1, after=1)
    att, attended, states, mask, run = _setup_conv_attention(prior=prior)
    w_prev = np.zeros((B, 10), 'float32')
    w_prev[:, 4] = 0.4
    w_prev[:, 6] = 0.6  # cumsum crosses 0.5 at position 6 -> median idx 5
    glimpses = {
        "weighted_averages": jnp.zeros((B, 6)),
        "weights": jnp.asarray(w_prev),
        "energies": jnp.asarray(w_prev),
        "step": jnp.ones((B,), jnp.int32),
    }
    out = run(0, glimpses=glimpses)
    w = np.asarray(out["weights"])
    assert w.sum() > 0
    # window (median-1, median+1) strict -> only the median position
    support = np.nonzero(w[0])[0]
    assert len(support) >= 1 and support.min() >= 4 and support.max() <= 6


def test_content_attention_masked():
    att = SequenceContentAttention(
        state_names=("states",), attended_dim=6, match_dim=4)
    rng = np.random.RandomState(3)
    attended = jnp.asarray(rng.randn(B, 10, 6), jnp.float32)
    states = {"states": jnp.asarray(rng.randn(B, 5), jnp.float32)}
    mask = jnp.asarray((np.arange(10) < 7)[None, :].repeat(B, 0)
                       .astype('float32'))
    glimpses_vars = att.init(jax.random.PRNGKey(0), attended, None, mask,
                             {}, states, method=att.take_glimpses)
    out = att.apply(glimpses_vars, attended, None, mask, {}, states,
                    method=att.take_glimpses)
    w = np.asarray(out["weights"])
    assert_allclose(w[:, 7:], 0.0)
    assert_allclose(w.sum(axis=1), 1.0, rtol=1e-5)
