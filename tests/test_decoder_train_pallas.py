"""Fused training decoder scan (fwd + custom VJP) vs the XLA nn.scan:
value AND gradient parity through the full cost graph, interpret mode."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from attention_lvcsr_tpu.models.recognizer import RecognizerNet

U = 3

BASE = dict(
    input_dims={"recordings": 5}, input_num_chars={},
    eos_label=4, num_phonemes=5, dim_dec=8, dims_bidir=[6],
    enc_transition="gru", dec_transition="gru",
    attention_type="content_and_conv", conv_n=2,
    use_states_for_readout=False,
    criterion={"name": "log_likelihood"},
    bottom={"bottom_class": "speech"}, subsample=[1],
    post_merge_dims=[10], max_decoded_length_scale=1.0)


def _data(seed=1, T=14, TL=6):
    rng = np.random.RandomState(seed)
    inputs = jnp.asarray(rng.randn(U, T, 5), jnp.float32)
    mask = jnp.asarray((np.arange(T)[None]
                        < np.array([[T], [T - 3], [T]])).astype("f"))
    labels = jnp.asarray(rng.randint(0, 5, size=(U, TL)), jnp.int32)
    lmask = jnp.asarray((np.arange(TL)[None]
                         < np.array([[TL], [TL - 2], [3]])).astype("f"))
    return inputs, mask, labels, lmask


def _cost_and_grad(cfg, use_pallas, params, data):
    net = RecognizerNet(**dict(cfg, use_pallas=use_pallas))
    inputs, mask, labels, lmask = data

    def cost(p):
        out = net.apply(p, inputs, mask, labels, lmask,
                        method=net.cost)
        return out["costs"].sum()

    out = net.apply(params, inputs, mask, labels, lmask,
                    method=net.cost)
    grad = jax.grad(cost)(params)
    return out, grad


EXPANDING = {"type": "expanding", "initial_begin": 0, "initial_end": 6,
             "min_speed": 1.0, "max_speed": 2.0}


# quick gate runs the flagship expanding prior + one multi-filter
# variant; the other window kinds (same mask plumbing, different window
# math) and the normalizer/content variants run in the slow suite
@pytest.mark.parametrize("prior,states_readout,overrides", [
    (EXPANDING, False, {}),
    (EXPANDING, False, {"conv_num_filters": 3}),
    pytest.param({"type": "window_around_mean", "before": 3, "after": 3},
                 False, {}, marks=pytest.mark.slow),
    pytest.param({"type": "window_around_median", "before": 3, "after": 3},
                 False, {}, marks=pytest.mark.slow),
    pytest.param({"type": "window_around_median", "before": 3, "after": 3},
                 True, {}, marks=pytest.mark.slow),
    pytest.param(EXPANDING, False, {"energy_normalizer": "logistic"},
                 marks=pytest.mark.slow),
    pytest.param(EXPANDING, False, {"energy_normalizer": "relu"},
                 marks=pytest.mark.slow),
    pytest.param(EXPANDING, True,
                 {"conv_num_filters": 10,
                  "post_merge_activation": "maxout:2"},
                 marks=pytest.mark.slow),
    pytest.param(None, False, {"attention_type": "content"},
                 marks=pytest.mark.slow),
    pytest.param(EXPANDING, False, {"dec_stack": 2},
                 marks=pytest.mark.slow),
    pytest.param(EXPANDING, True, {"dec_stack": 2},
                 marks=pytest.mark.slow),
], ids=["flagship", "conv3", "mean", "median", "median-states",
        "logistic", "relu", "mean-maxout-shape", "content",
        "stack2", "stack2-states"])
def test_fused_train_scan_matches_xla(prior, states_readout, overrides):
    cfg = dict(BASE, prior=prior, use_states_for_readout=states_readout,
               **overrides)
    data = _data()
    net = RecognizerNet(**dict(cfg, use_pallas="never"))
    params = net.init(jax.random.PRNGKey(0), *data, method=net.cost)
    if overrides.get("energy_normalizer") == "relu":
        # the bhd relu recipes initialize the energy bias to 1 so the
        # unnormalized weights are not all-zero (0/0) at the start —
        # replicate that here to test the math, not NaN plumbing
        eb = params["params"]["generator"]["attention"]["energy_comp"]
        eb["bias"] = eb["bias"] + 1.0

    ref_out, ref_grad = _cost_and_grad(cfg, "never", params, data)
    fused_out, fused_grad = _cost_and_grad(cfg, "interpret", params,
                                           data)

    for key in ("costs", "weights", "energies"):
        if ref_out[key] is None:
            # content attention exposes no energies glimpse — the fused
            # path must mirror the structure exactly
            assert fused_out[key] is None, key
            continue
        assert_allclose(np.asarray(fused_out[key]),
                        np.asarray(ref_out[key]), rtol=2e-4, atol=1e-5,
                        err_msg=key)
    flat_ref, _ = jax.tree_util.tree_flatten_with_path(ref_grad)
    flat_fused = dict(jax.tree_util.tree_flatten_with_path(fused_grad)[0])
    checked = 0
    for path, leaf in flat_ref:
        got = None
        for p2, l2 in jax.tree_util.tree_flatten_with_path(fused_grad)[0]:
            if p2 == path:
                got = l2
                break
        name = jax.tree_util.keystr(path)
        assert got is not None, name
        assert_allclose(np.asarray(got), np.asarray(leaf), rtol=5e-4,
                        atol=5e-5, err_msg=name)
        checked += 1
    assert checked > 10


def test_fused_route_is_taken():
    """The interpret gate actually routes through the kernel (guard
    against silently testing XLA vs XLA)."""
    import attention_lvcsr_tpu.ops.pallas.decoder_train as dt
    calls = []
    orig = dt.decoder_scan_train
    dt.decoder_scan_train = lambda *a, **k: (calls.append(1),
                                             orig(*a, **k))[1]
    try:
        cfg = dict(BASE, prior={"type": "window_around_median",
                                "before": 3, "after": 3})
        data = _data()
        net = RecognizerNet(**dict(cfg, use_pallas="interpret"))
        params = net.init(jax.random.PRNGKey(0), *data, method=net.cost)
        net.apply(params, *data, method=net.cost)
    finally:
        dt.decoder_scan_train = orig
    assert calls, "fused decoder route was not taken"


def test_shipped_config_library_train_routing():
    """Every shipped config's net section must classify through the
    fused-train routing without crashing, and the paper families must
    route to the fused decoder scan when training (interpret here)."""
    import os

    from config_probe import build_net_from_config, shipped_config_paths

    paths = shipped_config_paths()
    assert len(paths) >= 20
    routed = {}
    for path in paths:
        net = build_net_from_config(path, drop_lm=True,
                                    use_pallas="interpret")
        if net is None:
            continue
        # _fused_train_mode reads module attributes bound in setup, so
        # probe it inside an init trace (params are thrown away)
        mode = {}

        def probe(mdl):
            mode["m"] = mdl.generator._fused_train_mode()
            return jnp.zeros(())

        net.init(jax.random.PRNGKey(0), method=lambda mdl: probe(mdl))
        routed[os.path.basename(path)] = mode.get("m")
    must_route = ["wsj_paper.yaml", "wsj_paper7.yaml",
                  "wsj_mean_maxout.yaml", "wsj_pyramide.yaml",
                  "nips_baseline.yaml", "wsj_jan_wsj13v2.yaml"]
    for name in must_route:
        if name in routed:
            assert routed[name] == "interpret", \
                f"{name} trains on the XLA scan: {routed[name]}"
    assert sum(1 for v in routed.values() if v == "interpret") >= 15


def test_batch_blocked_parity(monkeypatch):
    """Batch blocking (grid = (B//BB, Tc)) is bit-compatible with the
    single-block kernel: forcing BB=1 over the U=3 batch must reproduce
    the XLA scan exactly (VERDICT r3 task 1 — the B=64 VMEM fix)."""
    monkeypatch.setenv("LVSR_TRAIN_BB", "1")
    cfg = dict(BASE, prior=EXPANDING)
    data = _data()
    net = RecognizerNet(**dict(cfg, use_pallas="never"))
    params = net.init(jax.random.PRNGKey(0), *data, method=net.cost)
    ref_out, ref_grad = _cost_and_grad(cfg, "never", params, data)
    fused_out, fused_grad = _cost_and_grad(cfg, "interpret", params,
                                           data)
    assert_allclose(np.asarray(fused_out["costs"]),
                    np.asarray(ref_out["costs"]), rtol=2e-4, atol=1e-5)
    for (p1, l1), (p2, l2) in zip(
            jax.tree_util.tree_flatten_with_path(ref_grad)[0],
            jax.tree_util.tree_flatten_with_path(fused_grad)[0]):
        assert p1 == p2
        assert_allclose(np.asarray(l2), np.asarray(l1), rtol=5e-4,
                        atol=5e-5, err_msg=jax.tree_util.keystr(p1))


def test_vmem_gate_shapes():
    """The bytes model admits the flagship shapes (via batch blocking)
    and rejects shapes where even one row cannot fit."""
    from attention_lvcsr_tpu.ops.pallas import decoder_train as dt
    # round-3 crash shape: B=64, T=100, L=200, M=250, D=500, S=250
    assert dt.fused_train_fits(64, 100, 200, 250, 500, 250, 1, 1)
    # long-utterance flagship (16 s WSJ, 4x subsampling): L=400, T=200
    assert dt.fused_train_fits(32, 200, 400, 250, 500, 250, 1, 1)
    assert dt.fused_train_fits(256, 100, 200, 250, 500, 250, 1, 1)
    # the picked block is batch-blocked, not the whole batch
    bb = dt.pick_batch_block(64, 100, 200, 250, 500, 250, 1,
                             dt._bwd_bytes)
    assert bb is not None and bb < 64
    # absurd L: the (L, L) Toeplitz/tri tables alone exceed VMEM
    assert not dt.fused_train_fits(8, 100, 4096, 250, 500, 250, 1, 1)


def test_oversize_routes_to_xla_scan(monkeypatch):
    """When no batch block fits, evaluate must route to the XLA scan
    (not crash in Mosaic): regression for BENCH_r03 rc=1."""
    from attention_lvcsr_tpu.ops.pallas import decoder_train as dt
    monkeypatch.setattr(dt, "VMEM_BUDGET", 0)

    def boom(*a, **k):
        raise AssertionError("fused kernel must not be entered")

    monkeypatch.setattr(dt, "decoder_scan_train", boom)
    cfg = dict(BASE, prior=EXPANDING)
    data = _data()
    net = RecognizerNet(**dict(cfg, use_pallas="interpret"))
    params = net.init(jax.random.PRNGKey(0), *data, method=net.cost)
    out = net.apply(params, *data, method=net.cost)
    assert np.isfinite(np.asarray(out["costs"])).all()
