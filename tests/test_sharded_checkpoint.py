"""Sharded checkpoint round-trip across differently-shaped meshes.

Role of ``blocks/serialization.py:145-283`` (checkpoint save/restore),
extended to the SPMD world the reference never had: a checkpoint saved
from a dp4 x tp2 train state must restore into a dp2 x tp4 (or single
device) mesh and continue training with identical numerics — the
on-disk format is a mesh-agnostic flat path-keyed npz.
"""
import numpy as np
import pytest

import __graft_entry__ as graft
from attention_lvcsr_tpu.models.recognizer import (SpeechRecognizer,
                                                   param_path_dict)
from attention_lvcsr_tpu.parallel import (make_mesh, shard_batch,
                                          shard_params)
from attention_lvcsr_tpu.train.checkpoint import (
    load_parameters, restore_sharded_train_state, save_sharded_checkpoint)
from attention_lvcsr_tpu.train.driver import make_train_step
from attention_lvcsr_tpu.train.rules import build_optimizer

import jax


@pytest.fixture(scope="module")
def setup():
    cfg = graft._tiny_net_config()
    rec = SpeechRecognizer(cfg, init_config={
        "/recognizer": {"weights_init": ["isotropic_gaussian", 0.1],
                        "biases_init": ["constant", 0.0],
                        "rec_weights_init": ["orthogonal"]}})
    config = {"net": cfg,
              "training": {"gradient_threshold": 100.0,
                           "rules": ["adadelta"]},
              "regularization": {}}
    optimizer = build_optimizer(config["training"], {})
    step_fn = make_train_step(rec, optimizer, config, eos_label=31,
                              input_key="recordings")
    rng = np.random.RandomState(0)
    B, T, TL = 8, 16, 6
    batch = [rng.randn(B, T, 12).astype("float32"),
             np.ones((B, T), "float32"),
             rng.randint(0, 32, size=(B, TL)).astype("int32"),
             np.ones((B, TL), "float32")]
    return rec, optimizer, step_fn, batch


def _one_step(step_fn, params, opt_state, batch, mesh):
    with mesh:
        sharded = shard_batch(batch, mesh)
        step = jax.jit(step_fn)
        new_params, new_opt, monitors = step(
            params, opt_state, jax.random.PRNGKey(7), *sharded)
        jax.block_until_ready(monitors)
    return new_params, new_opt, float(monitors["train_cost"])


@pytest.mark.slow  # mesh->mesh resharding also covered by the driver dryrun; single-device roundtrip stays quick
def test_roundtrip_into_smaller_tp_mesh(tmp_path, setup):
    rec, optimizer, step_fn, batch = setup
    mesh_a = make_mesh(8, model_parallel=2)          # dp4 x tp2
    mesh_b = make_mesh(8, model_parallel=4)          # dp2 x tp4

    with mesh_a:
        params = shard_params(rec.params, mesh_a)
        opt_state = optimizer.init(params)
    params1, opt1, cost1 = _one_step(step_fn, params, opt_state, batch,
                                     mesh_a)

    path = str(tmp_path / "ckpt.zip")
    save_sharded_checkpoint(path, params1, opt_state=opt1,
                            meta={"iterations_done": 1})

    # saved values match the (gathered) live state
    saved = load_parameters(path)
    live = param_path_dict(jax.tree.map(np.asarray, params1))
    assert set(saved) == set(live)
    for k in saved:
        np.testing.assert_allclose(saved[k], live[k], rtol=1e-6)

    # restore into a differently-shaped mesh and continue training
    with mesh_b:
        params_b, opt_b = restore_sharded_train_state(path, optimizer,
                                                      mesh_b)
    # restored params are actually model-sharded on the new mesh
    flat, _ = jax.tree_util.tree_flatten_with_path(params_b)
    assert any(
        getattr(leaf.sharding, "spec", None) is not None
        and any(s == "model" for s in leaf.sharding.spec if s is not None)
        for _, leaf in flat), "no parameter landed on the tp axis"

    params2a, _, cost2a = _one_step(step_fn, params1, opt1, batch, mesh_a)
    params2b, _, cost2b = _one_step(step_fn, params_b, opt_b, batch,
                                    mesh_b)
    assert np.isclose(cost2a, cost2b, rtol=1e-5)
    a = param_path_dict(jax.tree.map(np.asarray, params2a))
    b = param_path_dict(jax.tree.map(np.asarray, params2b))
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-4, atol=1e-6,
                                   err_msg=k)


def test_roundtrip_into_single_device(tmp_path, setup):
    rec, optimizer, step_fn, batch = setup
    mesh_a = make_mesh(8, model_parallel=2)
    mesh_1 = make_mesh(1)

    with mesh_a:
        params = shard_params(rec.params, mesh_a)
        opt_state = optimizer.init(params)
    params1, opt1, _ = _one_step(step_fn, params, opt_state, batch, mesh_a)

    path = str(tmp_path / "ckpt.zip")
    save_sharded_checkpoint(path, params1, opt_state=opt1)
    with mesh_1:
        params_1, opt_1 = restore_sharded_train_state(path, optimizer,
                                                      mesh_1)

    _, _, cost2a = _one_step(step_fn, params1, opt1, batch, mesh_a)
    _, _, cost2one = _one_step(step_fn, params_1, opt_1, batch, mesh_1)
    assert np.isclose(cost2a, cost2one, rtol=1e-5)
