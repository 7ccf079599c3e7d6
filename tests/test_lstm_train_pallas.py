"""Fused LSTM scan (fwd + custom VJP) vs jax.grad of the XLA scan:
value AND cotangent parity for every input, interpret mode on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from attention_lvcsr_tpu.ops.pallas.lstm_train import lstm_scan_train

T, B, D = 6, 3, 4


def _xla_lstm(x, mask, h0, c0, w, pci, pcf, pco):
    def step(carry, inp):
        h, c = carry
        xt, m = inp
        acts = h @ w + xt
        i = jax.nn.sigmoid(acts[:, :D] + c * pci)
        f = jax.nn.sigmoid(acts[:, D:2 * D] + c * pcf)
        new_c = f * c + i * jnp.tanh(acts[:, 2 * D:3 * D])
        o = jax.nn.sigmoid(acts[:, 3 * D:] + new_c * pco)
        new_h = o * jnp.tanh(new_c)
        new_h = m[:, None] * new_h + (1.0 - m[:, None]) * h
        new_c = m[:, None] * new_c + (1.0 - m[:, None]) * c
        return (new_h, new_c), (new_h, new_c)

    _, (hs, cs) = jax.lax.scan(step, (h0, c0), (x, mask))
    return hs, cs


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.RandomState(0)
    return (jnp.asarray(rng.randn(T, B, 4 * D), jnp.float32),
            jnp.asarray((rng.rand(T, B) > 0.2).astype("f")),
            jnp.asarray(rng.randn(B, D), jnp.float32) * 0.3,
            jnp.asarray(rng.randn(B, D), jnp.float32) * 0.3,
            jnp.asarray(rng.randn(D, 4 * D), jnp.float32) * 0.4,
            jnp.asarray(rng.randn(D), jnp.float32) * 0.2,
            jnp.asarray(rng.randn(D), jnp.float32) * 0.2,
            jnp.asarray(rng.randn(D), jnp.float32) * 0.2)


def test_forward_matches_xla(inputs):
    x, mask, h0, c0, w, pci, pcf, pco = inputs
    ref_h, ref_c = _xla_lstm(x, mask, h0, c0, w, pci, pcf, pco)
    out_h, out_c = lstm_scan_train(x, mask, h0, c0, w, pci, pcf, pco,
                                   interpret=True)
    assert_allclose(np.asarray(out_h), np.asarray(ref_h), rtol=1e-5,
                    atol=1e-6)
    assert_allclose(np.asarray(out_c), np.asarray(ref_c), rtol=1e-5,
                    atol=1e-6)


def test_gradients_match_xla(inputs):
    x, mask, h0, c0, w, pci, pcf, pco = inputs
    rng = np.random.RandomState(1)
    wh = jnp.asarray(rng.randn(T, B, D), jnp.float32)
    wc = jnp.asarray(rng.randn(T, B, D), jnp.float32)

    def loss_of(fn):
        def loss(x, h0, c0, w, pci, pcf, pco):
            hs, cs = fn(x, mask, h0, c0, w, pci, pcf, pco)
            return (wh * hs).sum() + (wc * cs).sum()
        return loss

    argnums = tuple(range(7))
    g_ref = jax.grad(loss_of(_xla_lstm), argnums=argnums)(
        x, h0, c0, w, pci, pcf, pco)
    g_ker = jax.grad(loss_of(
        lambda *a, **k: lstm_scan_train(*a, interpret=True, **k)),
        argnums=argnums)(x, h0, c0, w, pci, pcf, pco)
    names = ("dx", "dh0", "dc0", "dw", "dpci", "dpcf", "dpco")
    for name, a, b in zip(names, g_ker, g_ref):
        assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-4,
                        atol=2e-5, err_msg=name)


def test_lstm_cell_scan_uses_kernel(inputs):
    """Integration: LSTM.scan(pallas='train_interpret') matches the XLA
    base scan, values and gradients."""
    from attention_lvcsr_tpu.models.cells import LSTM
    x, mask, *_ = inputs
    cell = LSTM(dim=D)
    seqs = {"inputs": x}
    params = cell.init(jax.random.PRNGKey(0), seqs, mask,
                       method=cell.scan)
    params = jax.tree.map(lambda a: a + 0.1 if a.ndim == 1 else a,
                          params)

    def loss(p, pallas):
        out = cell.apply(p, seqs, mask, method=cell.scan,
                         pallas=pallas)
        return out["states"].sum() + 0.5 * out["cells"].sum()

    v_ref, g_ref = jax.value_and_grad(loss)(params, None)
    v_ker, g_ker = jax.value_and_grad(loss)(params, "train_interpret")
    assert_allclose(float(v_ker), float(v_ref), rtol=1e-5)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_ker)[0],
            jax.tree_util.tree_flatten_with_path(g_ref)[0]):
        assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-4,
                        atol=2e-5, err_msg=jax.tree_util.keystr(pa))


def test_forward_only_scan_matches_xla(inputs):
    """lstm_scan (inference kernel, no gate residuals) == the XLA scan."""
    from attention_lvcsr_tpu.ops.pallas.lstm_train import lstm_scan
    x, mask, h0, c0, w, pci, pcf, pco = inputs
    ref_h, ref_c = _xla_lstm(x, mask, h0, c0, w, pci, pcf, pco)
    out_h, out_c = lstm_scan(x, mask, h0, c0, w, pci, pcf, pco,
                             interpret=True)
    assert_allclose(np.asarray(out_h), np.asarray(ref_h), rtol=1e-5,
                    atol=1e-6)
    assert_allclose(np.asarray(out_c), np.asarray(ref_c), rtol=1e-5,
                    atol=1e-6)
    # maskless call (the specialized no-mask path)
    out_h2, _ = lstm_scan(x, None, h0, c0, w, pci, pcf, pco,
                          interpret=True)
    ones_h, _ = _xla_lstm(x, jnp.ones((T, B)), h0, c0, w, pci, pcf, pco)
    assert_allclose(np.asarray(out_h2), np.asarray(ones_h), rtol=1e-5,
                    atol=1e-6)
