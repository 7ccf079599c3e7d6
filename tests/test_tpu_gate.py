"""On-chip kernel smoke gate: Mosaic-compile every shipped Pallas kernel
family at flagship shapes, under wall-clock compile budgets.

Interpret-mode CPU tests cannot catch VMEM exhaustion or Mosaic
compile-complexity blowups — round 3 shipped two such failures (the fused
training decoder's 179 MB VMEM demand at B=64 and the in-kernel LM
fusion's never-finishing compile at 1058 states) that the green CPU gate
was structurally blind to.  This suite is the fix (VERDICT r3 task 4):

    LVSR_TEST_PLATFORM=tpu python -m pytest tests/test_tpu_gate.py -m tpu -q

Every test skips unless the backend is a real TPU (so the CPU quick gate
collects them as instant skips).  Budgets are generous cold-compile
bounds — the point is to catch the "never finishes / RESOURCE_EXHAUSTED"
class, not to benchmark; warm (persistent-cache) runs finish the whole
gate in well under ten minutes.

The reference has no hardware gate at all (SURVEY.md §4: Travis runs
Theano on CPU); this is an addition the TPU design needs.
"""
import os
import sys
import time

import numpy as np
import pytest

pytestmark = [pytest.mark.tpu, pytest.mark.slow]

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _tpu():
    import jax
    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("on-chip gate: needs a real TPU backend "
                    "(run with LVSR_TEST_PLATFORM=tpu)")


@pytest.fixture(scope="module")
def bench_mod():
    _tpu()
    import bench
    bench._enable_compilation_cache()
    return bench


# -- fused training decoder (ops/pallas/decoder_train.py) ---------------
# the round-3 hard crash was B=64/F=800/T=100: RESOURCE_EXHAUSTED wanting
# 179.31 MB of VMEM.  B=32/F=1600/T=200 is the 16-second-utterance shape
# (VERDICT r3 task 8).
@pytest.mark.parametrize("batch,frames,labels", [
    (32, 800, 100),
    (64, 800, 100),
    (32, 1600, 200),
])
def test_decoder_train_fused(bench_mod, batch, frames, labels):
    import jax
    import jax.numpy as jnp
    from attention_lvcsr_tpu.train.driver import make_train_step
    from attention_lvcsr_tpu.train.rules import build_optimizer

    rec = bench_mod._recognizer("auto")
    config = {"net": rec.net_config,
              "training": {"gradient_threshold": 100.0,
                           "rules": ["adadelta"]},
              "regularization": {}}
    optimizer = build_optimizer(config["training"], {})
    step_fn = make_train_step(rec, optimizer, config,
                              eos_label=rec.net_config["eos_label"],
                              input_key="recordings")
    params = rec.params
    opt_state = optimizer.init(params)
    rng = jax.random.PRNGKey(0)
    data = np.random.RandomState(0)
    args = (params, opt_state, rng,
            jnp.asarray(data.randn(batch, frames, 123), jnp.float32),
            jnp.ones((batch, frames), jnp.float32),
            jnp.asarray(data.randint(0, 31, size=(batch, labels)),
                        jnp.int32),
            jnp.ones((batch, labels), jnp.float32))
    t0 = time.time()
    _, _, monitors = jax.jit(step_fn)(*args)
    cost = float(monitors["train_cost"])
    compile_s = time.time() - t0
    assert np.isfinite(cost), f"non-finite train cost {cost}"
    # cold budget calibrated on the tunneled dev chip: after the energy
    # lane-reduce fix every flagship shape cold-compiles in 31-36 s
    # (evidence/r05_compile_fix.json; the pre-fix reshape->MXU-matvec
    # construct cost 461 s).  120 s leaves headroom for a loaded tunnel
    # while still catching a Mosaic complexity regression.
    assert compile_s < 120, (
        f"train step B={batch} F={frames} T={labels} took {compile_s:.0f}s "
        "to compile+run (cold budget 120s)")


# -- whole-loop decode kernel (ops/pallas/beam_loop.py) ------------------
@pytest.mark.parametrize("beam", [10, 200])
def test_beam_loop_decode(bench_mod, beam):
    import jax
    import jax.numpy as jnp
    rec = bench_mod._recognizer("auto")
    rec.init_beam_search(beam)
    mode = rec._beam_search._loop_kernel_mode(num_frames=bench_mod.FRAMES)
    assert mode == "compile", f"flagship no-LM decode must route to the " \
        f"loop kernel on chip (got {mode!r})"
    rng = np.random.RandomState(0)
    inputs = jnp.asarray(rng.randn(8, bench_mod.FRAMES, 123), jnp.float32)
    mask = jnp.ones((8, bench_mod.FRAMES), jnp.float32)
    t0 = time.time()
    out = rec.beam_search(inputs, mask, as_arrays=True, char_discount=0.1)
    compile_s = time.time() - t0
    assert int(out["steps"]) > 0
    assert compile_s < 420, (
        f"loop-kernel decode beam={beam} took {compile_s:.0f}s cold "
        "(budget 420s)")


# -- LM fusion routing + the XLA dense path ------------------------------
def test_lm_dense_xla_decode(bench_mod):
    """The 1058-state bench trigram must route OFF the loop kernel (the
    in-kernel fusion Mosaic compile never finishes at this size) and the
    dense-XLA path must decode within the bench compile budget."""
    import jax.numpy as jnp
    rec = bench_mod._recognizer(
        "auto", lm_path=bench_mod._bench_lm_npz(csr=False))
    rec.init_beam_search(10)
    mode = rec._beam_search._loop_kernel_mode(num_frames=bench_mod.FRAMES)
    assert mode is None, (
        "LM-fused decode must route to the XLA path (the in-kernel "
        f"fusion was removed in round 5), got {mode!r}")
    rng = np.random.RandomState(0)
    inputs = jnp.asarray(rng.randn(8, bench_mod.FRAMES, 123), jnp.float32)
    mask = jnp.ones((8, bench_mod.FRAMES), jnp.float32)
    t0 = time.time()
    out = rec.beam_search(inputs, mask, as_arrays=True, char_discount=1.0)
    compile_s = time.time() - t0
    assert int(out["steps"]) > 0
    assert compile_s < bench_mod.COMPILE_BUDGET_S + 180, (
        f"dense-XLA LM decode compile {compile_s:.0f}s")


def test_lm_biggraph_csr_decode(bench_mod):
    """Production-scale LM decode gate: the 113k-state character-trie
    lexicon graph (CSR storage, load-densified HBM tables) must compile
    within budget and decode on chip — the north-star operating point
    at real graph size (VERDICT r4 #1)."""
    import jax.numpy as jnp
    lm_path = bench_mod._bench_biggraph_npz()
    rec = bench_mod._recognizer("auto", lm_path=lm_path)
    rec.init_beam_search(10)
    mode = rec._beam_search._loop_kernel_mode(num_frames=bench_mod.FRAMES)
    assert mode is None, f"LM decode must take the XLA path, got {mode!r}"
    rng = np.random.RandomState(0)
    inputs = jnp.asarray(rng.randn(4, bench_mod.FRAMES, 123), jnp.float32)
    mask = jnp.ones((4, bench_mod.FRAMES), jnp.float32)
    t0 = time.time()
    out = rec.beam_search(inputs, mask, as_arrays=True, char_discount=1.0)
    compile_s = time.time() - t0
    assert int(out["steps"]) > 0
    assert compile_s < bench_mod.COMPILE_BUDGET_S + 180, (
        f"biggraph CSR decode compile {compile_s:.0f}s")


# -- fused recurrent cells + frontend ------------------------------------
def test_gru_lstm_frontend_kernels(bench_mod):
    """The encoder scan kernels and the Pallas log-mel frontend at
    flagship shapes (the remaining kernel families)."""
    import jax
    import jax.numpy as jnp
    from attention_lvcsr_tpu.ops.pallas.frontend import fbank_deltas_pallas
    from attention_lvcsr_tpu.ops.pallas.gru_train import gru_scan_train
    from attention_lvcsr_tpu.ops.pallas.lstm_train import lstm_scan_train

    rng = np.random.RandomState(0)
    B, T, D = 32, 400, 250
    x = jnp.asarray(rng.randn(T, B, D) * 0.1, jnp.float32)
    g = jnp.asarray(rng.randn(T, B, 2 * D) * 0.1, jnp.float32)
    h0 = jnp.zeros((B, D), jnp.float32)
    m = jnp.ones((T, B), jnp.float32)
    ws = jnp.asarray(rng.randn(D, D) * 0.05, jnp.float32)
    wg = jnp.asarray(rng.randn(D, 2 * D) * 0.05, jnp.float32)

    def gru_loss(w):
        return gru_scan_train(x, g, m, h0, w, wg).sum()

    t0 = time.time()
    val, grad = jax.jit(jax.value_and_grad(gru_loss))(ws)
    jax.block_until_ready(grad)
    assert np.isfinite(float(val))
    assert time.time() - t0 < 300, "GRU train kernel compile over budget"

    xl = jnp.asarray(rng.randn(T, B, 4 * D) * 0.1, jnp.float32)
    wl = jnp.asarray(rng.randn(D, 4 * D) * 0.05, jnp.float32)
    c0 = jnp.zeros((B, D), jnp.float32)
    peep = jnp.zeros((D,), jnp.float32)

    def lstm_loss(w):
        return lstm_scan_train(xl, m, h0, c0, w, peep, peep, peep)[0].sum()

    t0 = time.time()
    val, grad = jax.jit(jax.value_and_grad(lstm_loss))(wl)
    jax.block_until_ready(grad)
    assert np.isfinite(float(val))
    assert time.time() - t0 < 300, "LSTM train kernel compile over budget"

    wav = jnp.asarray(rng.randn(16, 8 * 16000) * 0.1, jnp.float32)
    t0 = time.time()
    feats = jax.jit(fbank_deltas_pallas)(wav)
    jax.block_until_ready(feats)
    assert np.isfinite(np.asarray(feats)).all()
    assert time.time() - t0 < 300, "frontend kernel compile over budget"
