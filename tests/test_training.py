"""Training services tests: rules, log, checkpoint, loop/extensions."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from numpy.testing import assert_allclose

from attention_lvcsr_tpu.train import rules
from attention_lvcsr_tpu.train.checkpoint import (load_checkpoint,
                                                  load_parameters,
                                                  save_checkpoint,
                                                  save_parameters)
from attention_lvcsr_tpu.train.extensions import (FinishAfter, Printing,
                                                  SimpleExtension, Timing,
                                                  TrackTheBest)
from attention_lvcsr_tpu.train.log import TrainingLog
from attention_lvcsr_tpu.train.loop import MainLoop


class MockAlgorithm:
    """Records batches; emits a decreasing cost (blocks MockAlgorithm
    pattern, blocks/tests/test_main_loop.py)."""

    def __init__(self):
        self.batches = []
        self.params = {}
        self.opt_state = None

    def process_batch(self, batch):
        self.batches.append(batch)
        return {"train_cost": 1.0 / (len(self.batches))}

    def parameter_dict(self):
        return {"/recognizer/w": np.zeros(3)}


def test_log_columns_and_rows():
    log = TrainingLog()
    log.status["iterations_done"] = 1
    log.current_row["cost"] = 5.0
    log.status["iterations_done"] = 2
    log.current_row["cost"] = 4.0
    log.current_row["other"] = 1
    assert log.last_value("cost") == 4.0
    assert log[1]["cost"] == 5.0
    times, values = log.channel("cost")
    assert times == [1, 2] and values == [5.0, 4.0]
    df = log.to_dataframe()
    assert list(df["cost"]) == [5.0, 4.0]
    # state-dict round trip
    log2 = TrainingLog.from_state_dict(log.state_dict())
    assert log2.last_value("cost") == 4.0


def test_main_loop_epochs_and_finish():
    algo = MockAlgorithm()
    data = lambda: iter([{"x": i} for i in range(5)])
    loop = MainLoop(algo, data, extensions=[
        Timing(), FinishAfter(after_n_epochs=3)])
    loop.run()
    assert loop.log.status["epochs_done"] == 3
    assert loop.log.status["iterations_done"] == 15
    assert loop.log.last_value("train_cost") is not None


def test_finish_after_batches():
    algo = MockAlgorithm()
    loop = MainLoop(algo, lambda: iter([{"x": i} for i in range(100)]),
                    extensions=[FinishAfter(after_n_batches=7)])
    loop.run()
    assert loop.log.status["iterations_done"] == 7


def test_track_the_best():
    algo = MockAlgorithm()

    class WriteCost(SimpleExtension):
        values = [3.0, 2.0, 2.5, 1.0]

        def do(self, which_callback, *args):
            i = self.main_loop.log.status["epochs_done"] - 1
            self.main_loop.log.current_row["valid_cost"] = self.values[i]

    loop = MainLoop(algo, lambda: iter([{"x": 0}]),
                    extensions=[WriteCost(after_epoch=True),
                                TrackTheBest("valid_cost"),
                                FinishAfter(after_n_epochs=4)])
    loop.run()
    assert loop.log.status["best_valid_cost"] == 1.0


def test_checkpoint_roundtrip(tmp_path):
    path = str(tmp_path / "model.zip")
    params = {"/recognizer/a": np.arange(3.0), "/recognizer/b/c":
              np.ones((2, 2))}
    opt_state = {"momentum": np.zeros(3)}
    log = TrainingLog()
    log.status["iterations_done"] = 42
    log.current_row["cost"] = 1.5
    save_checkpoint(path, params, opt_state, log.state_dict(),
                    meta={"iterations_done": 42})
    state = load_checkpoint(path)
    assert_allclose(state["parameters"]["/recognizer/a"], np.arange(3.0))
    assert state["meta"]["iterations_done"] == 42
    log2 = TrainingLog.from_state_dict(state["log_state"])
    assert log2[42]["cost"] == 1.5
    # parameters-only npz
    p2 = str(tmp_path / "params.npz")
    save_parameters(p2, params)
    assert_allclose(load_parameters(p2)["/recognizer/b/c"], np.ones((2, 2)))


def test_remove_not_finite():
    rule = rules.remove_not_finite(0.0)
    params = {"w": jnp.ones(3)}
    updates = {"w": jnp.asarray([jnp.nan, 1.0, 2.0])}
    state = rule.init(params)
    fixed, _ = rule.update(updates, state, params)
    assert_allclose(np.asarray(fixed["w"]), 0.0)
    ok = {"w": jnp.asarray([0.5, 1.0, 2.0])}
    fixed, _ = rule.update(ok, state, params)
    assert_allclose(np.asarray(fixed["w"]), [0.5, 1.0, 2.0])


def test_burn_in():
    rule = rules.burn_in(2)
    params = {"w": jnp.ones(2)}
    state = rule.init(params)
    for i in range(4):
        updates, state = rule.update({"w": jnp.ones(2)}, state, params)
        expected = 0.0 if i < 2 else 1.0
        assert_allclose(np.asarray(updates["w"]), expected)


def test_max_norm_constraint():
    rule = rules.max_norm_constraint(1.0)
    params = {"dense": {"kernel": jnp.zeros((3, 2)),
                        "bias": jnp.zeros(2)}}
    updates = {"dense": {"kernel": jnp.full((3, 2), 10.0),
                         "bias": jnp.full(2, 10.0)}}
    state = rule.init(params)
    fixed, _ = rule.update(updates, state, params)
    new_kernel = np.asarray(params["dense"]["kernel"] +
                            fixed["dense"]["kernel"])
    col_norms = np.sqrt((new_kernel ** 2).sum(axis=0))
    assert np.all(col_norms <= 1.0 + 1e-5)
    # bias untouched
    assert_allclose(np.asarray(fixed["dense"]["bias"]), 10.0)


def test_adaptive_clipping_threshold_moves():
    rule = rules.adaptive_clipping(10.0, decay_rate=0.5, burnin_period=3)
    params = {"w": jnp.ones(4)}
    state = rule.init(params)
    for _ in range(10):
        updates, state = rule.update({"w": jnp.full(4, 0.01)}, state, params)
    # after burn-in the threshold adapts to the tiny observed norms
    assert float(state.threshold) < 10.0


def test_build_optimizer_runs():
    opt = rules.build_optimizer(
        {"gradient_threshold": 10.0, "rules": ["momentum", "adadelta"],
         "scale": 0.01, "momentum": 0.9, "burn_in_steps": 1},
        {"max_norm": 2.0})
    params = {"k": {"kernel": jnp.ones((3, 3))}}
    state = opt.init(params)
    grads = {"k": {"kernel": jnp.ones((3, 3))}}
    updates, state = opt.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    assert np.isfinite(np.asarray(new["k"]["kernel"])).all()


def test_bf16_mixed_precision_train_step():
    """training.compute_dtype bfloat16: fwd/bwd run in bf16 while master
    params, optimizer state, and the loss stay float32; the step stays
    close to the full-f32 step on a tiny model."""
    from attention_lvcsr_tpu.models.recognizer import SpeechRecognizer
    from attention_lvcsr_tpu.train.driver import make_train_step
    from attention_lvcsr_tpu.train.rules import build_optimizer

    cfg = dict(
        input_dims={"recordings": 5}, input_num_chars={}, eos_label=4,
        num_phonemes=5, dim_dec=8, dims_bidir=[6], enc_transition="gru",
        dec_transition="gru", attention_type="content_and_conv",
        conv_n=1, use_states_for_readout=False,
        criterion={"name": "log_likelihood"},
        bottom={"bottom_class": "speech"}, subsample=[1],
        post_merge_dims=[8], max_decoded_length_scale=1.0,
        data_prepend_eos=False)
    rec = SpeechRecognizer(cfg, init_config={
        "/recognizer": {"weights_init": ["isotropic_gaussian", 0.3],
                        "biases_init": ["constant", 0.0]}}, seed=3)
    rng = np.random.RandomState(0)
    batch = (jnp.asarray(rng.randn(2, 11, 5), jnp.float32),
             jnp.ones((2, 11), jnp.float32),
             jnp.asarray(rng.randint(0, 5, (2, 4)), jnp.int32),
             jnp.ones((2, 4), jnp.float32))

    results = {}
    for name, dtype in [("f32", None), ("bf16", "bfloat16")]:
        training = {"rules": ["momentum"], "scale": 0.01,
                    "momentum": 0.0}
        if dtype:
            training["compute_dtype"] = dtype
        config = {"net": rec.net_config, "training": training,
                  "regularization": {}}
        optimizer = build_optimizer(training, {})
        step = jax.jit(make_train_step(rec, optimizer, config,
                                       eos_label=4,
                                       input_key="recordings"))
        params, opt_state = rec.params, optimizer.init(rec.params)
        params, opt_state, monitors = step(
            params, opt_state, jax.random.PRNGKey(0), *batch)
        # master params stay f32
        assert all(l.dtype == jnp.float32
                   for l in jax.tree.leaves(params)
                   if jnp.issubdtype(l.dtype, jnp.floating))
        assert monitors["train_cost"].dtype == jnp.float32
        results[name] = (params, float(monitors["train_cost"]))

    assert np.isfinite(results["bf16"][1])
    # bf16 has ~3 decimal digits; the costs agree loosely
    assert_allclose(results["bf16"][1], results["f32"][1],
                    rtol=0.05)
    # the steps move parameters in (approximately) the same direction
    f32_leaves = jax.tree.leaves(results["f32"][0])
    bf16_leaves = jax.tree.leaves(results["bf16"][0])
    for a, b in zip(f32_leaves, bf16_leaves):
        assert a.shape == b.shape


def test_scale_schedule():
    """training.scale_schedule [[step, factor], ...] anneals the update
    magnitude at the given boundaries (the blocks SharedVariableModifier
    role, compiled into the optimizer instead of host-mutated)."""
    opt = rules.build_optimizer(
        {"rules": ["momentum"], "scale": 1.0, "momentum": 0.0,
         "gradient_threshold": 0,
         "scale_schedule": [[2, 0.5], [4, 0.1]]}, {})
    params = {"w": jnp.zeros(())}
    state = opt.init(params)
    grads = {"w": jnp.ones(())}
    seen = []
    for _ in range(6):
        updates, state = opt.update(grads, state, params)
        seen.append(float(updates["w"]))
    assert_allclose(seen, [-1.0, -1.0, -0.5, -0.5, -0.1, -0.1],
                    rtol=1e-6)


def test_scale_schedule_unsorted_and_duplicates():
    """Unsorted entries anneal correctly (sorted before chaining the
    multiplicative ratios); duplicate steps are rejected."""
    opt = rules.build_optimizer(
        {"rules": ["momentum"], "scale": 1.0, "momentum": 0.0,
         "gradient_threshold": 0,
         "scale_schedule": [[4, 0.1], [2, 0.5]]}, {})
    params = {"w": jnp.zeros(())}
    state = opt.init(params)
    seen = []
    for _ in range(6):
        updates, state = opt.update({"w": jnp.ones(())}, state, params)
        seen.append(float(updates["w"]))
    assert_allclose(seen, [-1.0, -1.0, -0.5, -0.5, -0.1, -0.1],
                    rtol=1e-6)
    with pytest.raises(ValueError):
        rules.build_optimizer(
            {"rules": ["momentum"],
             "scale_schedule": [[2, 0.5], [2, 0.1]]}, {})
