"""Training GRU kernel (fwd + custom VJP) vs jax.grad of the XLA scan.

The one-step-vs-scan pattern of blocks/tests/test_recurrent.py, extended
to gradients: value parity AND cotangent parity for every input of
``gru_scan_train`` (interpret mode on CPU).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from attention_lvcsr_tpu.ops.pallas.gru_train import gru_scan_train

T, B, D = 7, 3, 5


def _xla_gru(x_proj, gate_proj, mask, h0, wss, wsg):
    def step(h, inp):
        x, g, m = inp
        gates = jax.nn.sigmoid(h @ wsg + g)
        u, r = gates[:, :D], gates[:, D:]
        cand = jnp.tanh((h * r) @ wss + x)
        new_h = u * cand + (1.0 - u) * h
        new_h = m[:, None] * new_h + (1.0 - m[:, None]) * h
        return new_h, new_h

    _, hs = jax.lax.scan(step, h0, (x_proj, gate_proj, mask))
    return hs


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(T, B, D), jnp.float32)
    g = jnp.asarray(rng.randn(T, B, 2 * D), jnp.float32)
    mask = jnp.asarray((rng.rand(T, B) > 0.2).astype("f"))
    h0 = jnp.asarray(rng.randn(B, D), jnp.float32) * 0.3
    wss = jnp.asarray(rng.randn(D, D), jnp.float32) * 0.4
    wsg = jnp.asarray(rng.randn(D, 2 * D), jnp.float32) * 0.4
    return x, g, mask, h0, wss, wsg


def test_forward_matches_xla(inputs):
    x, g, mask, h0, wss, wsg = inputs
    ref = _xla_gru(x, g, mask, h0, wss, wsg)
    out = gru_scan_train(x, g, mask, h0, wss, wsg, interpret=True)
    assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                    atol=1e-6)


def test_gradients_match_xla(inputs):
    x, g, mask, h0, wss, wsg = inputs
    rng = np.random.RandomState(1)
    # weighted loss so every (t, b, d) state contributes distinctly
    w = jnp.asarray(rng.randn(T, B, D), jnp.float32)

    def loss_ref(x, g, h0, wss, wsg):
        return (w * _xla_gru(x, g, mask, h0, wss, wsg)).sum()

    def loss_ker(x, g, h0, wss, wsg):
        return (w * gru_scan_train(x, g, mask, h0, wss, wsg,
                                   interpret=True)).sum()

    grads_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
        x, g, h0, wss, wsg)
    grads_ker = jax.grad(loss_ker, argnums=(0, 1, 2, 3, 4))(
        x, g, h0, wss, wsg)
    names = ("dx", "dgate", "dh0", "dwss", "dwsg")
    for name, a, b in zip(names, grads_ker, grads_ref):
        assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                        atol=1e-5, err_msg=name)


def test_no_mask_and_vmap_compat(inputs):
    x, g, _, h0, wss, wsg = inputs
    ref = _xla_gru(x, g, jnp.ones((T, B), jnp.float32), h0, wss, wsg)
    out = gru_scan_train(x, g, None, h0, wss, wsg, interpret=True)
    assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                    atol=1e-6)


@pytest.mark.slow  # full-recognizer grad parity; kernel-level parity runs in the quick gate
def test_recognizer_cost_grads_match_through_train_kernel():
    """Full cost-graph gradients with the fused train scan
    (use_pallas='interpret' -> train_interpret on CPU) match the pure
    XLA path."""
    from attention_lvcsr_tpu.models.recognizer import SpeechRecognizer
    cfg = dict(
        input_dims={"recordings": 5}, input_num_chars={}, eos_label=4,
        num_phonemes=5, dim_dec=6, dims_bidir=[6, 6],
        enc_transition="gru", dec_transition="gru",
        attention_type="content_and_conv", conv_n=1,
        use_states_for_readout=False,
        criterion={"name": "log_likelihood"},
        bottom={"bottom_class": "speech"}, subsample=[1, 2],
        post_merge_dims=[7], max_decoded_length_scale=1.0,
        data_prepend_eos=False)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(3, 12, 5), jnp.float32)
    xm = jnp.asarray((np.arange(12)[None] <
                      np.array([[12], [9], [7]])).astype("f"))
    y = jnp.asarray(rng.randint(0, 5, (3, 4)), jnp.int32)
    ym = jnp.ones((3, 4), jnp.float32)

    grads = {}
    for mode in ("never", "interpret"):
        rec = SpeechRecognizer(dict(cfg, use_pallas=mode), init_config={
            "/recognizer": {"weights_init": ["isotropic_gaussian", 0.4],
                            "biases_init": ["constant", 0.0]}}, seed=5)
        loss = lambda p, net=rec.net: net.apply(
            p, x, xm, y, ym, method=net.cost)["costs"].sum()
        grads[mode] = jax.grad(loss)(rec.params)

    flat_ref = jax.tree_util.tree_flatten_with_path(grads["never"])[0]
    flat_ker = jax.tree_util.tree_flatten_with_path(grads["interpret"])[0]
    for (path, a), (_, b) in zip(flat_ref, flat_ker):
        assert_allclose(np.asarray(b), np.asarray(a), rtol=5e-4,
                        atol=1e-5,
                        err_msg=jax.tree_util.keystr(path))


@pytest.mark.slow  # interpret-mode bidirectional kernel is heavy on 1 CPU
def test_bidirectional_fused_matches_xla():
    """The fused both-directions kernel (Bidirectional fast path)
    matches the XLA per-direction path in values and gradients."""
    from attention_lvcsr_tpu.models.encoder import Bidirectional
    Tn, Bn, F, Dn = 9, 3, 4, 5
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(Bn, Tn, F), jnp.float32)
    mask = jnp.asarray((np.arange(Tn)[None] <
                        np.array([[9], [7], [5]])).astype("f"))
    layer = Bidirectional("gru", Dn)
    params = layer.init(jax.random.PRNGKey(0), x, mask)

    def loss(p, pallas):
        out = layer.apply(p, x, mask, pallas=pallas)
        w = jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape)
        return (out * w * (mask[..., None])).sum()

    v_ref, g_ref = jax.value_and_grad(loss)(params, None)
    v_ker, g_ker = jax.value_and_grad(loss)(params, "train_interpret")
    assert_allclose(float(v_ker), float(v_ref), rtol=1e-5)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_ker)[0],
            jax.tree_util.tree_flatten_with_path(g_ref)[0]):
        assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-4,
                        atol=2e-5, err_msg=jax.tree_util.keystr(pa))
    # inference mode parity too
    out_inf = layer.apply(params, x, mask, pallas="interpret")
    out_ref = layer.apply(params, x, mask)
    assert_allclose(np.asarray(out_inf), np.asarray(out_ref),
                    rtol=1e-5, atol=1e-6)


def test_bf16_mixed_precision_path(inputs):
    """bf16 activations keep bf16 MXU operands in-kernel (common.
    mxu_dtype): values and gradients track the f32 kernel within bf16
    tolerance — the train_step_bf16 operating point's kernel path."""
    x, g, mask, h0, wss, wsg = inputs
    bf16 = jnp.bfloat16
    args16 = (x.astype(bf16), g.astype(bf16), mask, h0.astype(bf16),
              wss.astype(bf16), wsg.astype(bf16))

    out16 = gru_scan_train(*args16, interpret=True)
    out32 = gru_scan_train(x, g, mask, h0, wss, wsg, interpret=True)
    assert out16.dtype == bf16
    assert_allclose(np.asarray(out16, np.float32), np.asarray(out32),
                    rtol=0.05, atol=0.05)

    w = jnp.asarray(np.random.RandomState(1).randn(T, B, D),
                    jnp.float32)

    def loss16(x, g, h0, wss, wsg):
        out = gru_scan_train(x, g, mask, h0, wss, wsg, interpret=True)
        return (w * out.astype(jnp.float32)).sum()

    def loss32(x, g, h0, wss, wsg):
        out = gru_scan_train(x, g, mask, h0, wss, wsg, interpret=True)
        return (w * out).sum()

    g16 = jax.grad(loss16, argnums=(0, 1, 2, 3, 4))(
        *(a for i, a in enumerate(args16) if i != 2))
    g32 = jax.grad(loss32, argnums=(0, 1, 2, 3, 4))(x, g, h0, wss, wsg)
    for a16, a32 in zip(g16, g32):
        assert_allclose(np.asarray(a16, np.float32), np.asarray(a32),
                        rtol=0.15, atol=0.15)


def test_fit_chunk_vmem_clamp():
    """The time-chunk clamp keeps streamed VMEM under budget (the
    B=256 / LVSR_GRU_CHUNK=16 point RESOURCE_EXHAUSTED at 112.5M before
    it existed) without touching shapes that already fit."""
    from attention_lvcsr_tpu.ops.pallas import gru_train as gt

    # the observed blowup: bidir, B=256, D=250, f32, chunk 16 -> halved
    c = gt._fit_chunk(16, 256, 250, 4, gt._STREAM_FACTOR_BD)
    assert c < 16
    assert (c * gt._STREAM_FACTOR_BD * 256 * 250 * 4 * 2
            <= gt._VMEM_CHUNK_BUDGET)
    # bf16 at the same point fits at chunk 16 (half the bytes)
    assert gt._fit_chunk(16, 256, 250, 2, gt._STREAM_FACTOR_BD) == 16
    # small shapes are untouched, and the clamp never returns < 1
    assert gt._fit_chunk(8, 32, 250, 4, gt._STREAM_FACTOR_BD) == 8
    assert gt._fit_chunk(1, 4096, 4096, 4, gt._STREAM_FACTOR_BD) == 1


def test_gru_train_value_parity_under_clamp(inputs):
    """A chunk larger than T still produces scan-parity values (the
    clamp + padding path must not change semantics)."""
    import os
    x, g, mask, h0, wss, wsg = inputs
    prior = os.environ.get("LVSR_GRU_CHUNK")
    os.environ["LVSR_GRU_CHUNK"] = "16"
    try:
        import importlib
        from attention_lvcsr_tpu.ops.pallas import gru_train as gt
        importlib.reload(gt)
        out = gt.gru_scan_train(x, g, mask, h0, wss, wsg,
                                interpret=True)
        ref = _xla_gru(x, g, mask, h0, wss, wsg)
        assert_allclose(np.asarray(out), np.asarray(ref),
                        rtol=1e-5, atol=1e-5)
    finally:
        if prior is None:
            os.environ.pop("LVSR_GRU_CHUNK", None)
        else:
            os.environ["LVSR_GRU_CHUNK"] = prior
        import importlib
        from attention_lvcsr_tpu.ops.pallas import gru_train as gt
        importlib.reload(gt)
