"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attention_lvcsr_tpu.parallel import (make_mesh, param_partition_spec,
                                          shard_batch, shard_params)


def test_mesh_shapes():
    mesh = make_mesh(8, model_parallel=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh = make_mesh(8)
    assert dict(mesh.shape) == {"data": 8, "model": 1}


@pytest.mark.slow
def test_dryrun_multichip_dp_tp():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_single():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(1)


def test_param_sharding_rules():
    mesh = make_mesh(8, model_parallel=2)
    params = {"generator": {"readout": {"post_merge_0": {
        "kernel": jnp.zeros((16, 32)), "bias": jnp.zeros(32)}}}}
    sharded = shard_params(params, mesh)
    kernel = sharded["generator"]["readout"]["post_merge_0"]["kernel"]
    # output dim sharded over 'model'
    spec = kernel.sharding.spec
    assert tuple(spec) in ((None, "model"), (None, "model", ))
    bias = sharded["generator"]["readout"]["post_merge_0"]["bias"]
    assert all(s is None for s in tuple(bias.sharding.spec))


def test_data_parallel_grad_matches_single_device():
    """The sharded step computes the same gradients as one device."""
    mesh = make_mesh(4, model_parallel=1)

    def loss(w, x):
        return jnp.sum((x @ w) ** 2)

    grad = jax.grad(loss)
    w = jnp.ones((6, 3))
    x = np.random.RandomState(0).randn(8, 6).astype("float32")
    g_single = grad(w, jnp.asarray(x))
    with mesh:
        w_sharded = shard_params({"w": w}, mesh)["w"]
        (x_sharded,) = shard_batch([x], mesh)
        g_sharded = jax.jit(grad)(w_sharded, x_sharded)
    np.testing.assert_allclose(np.asarray(g_single),
                               np.asarray(g_sharded), rtol=1e-5)


def test_sharded_beam_search_matches_single_device():
    """Batch decode sharded over the mesh 'data' axis returns exactly
    the single-device hypotheses (each utterance's compute is
    unchanged; XLA only splits the batch)."""
    from attention_lvcsr_tpu.models.recognizer import SpeechRecognizer

    cfg = dict(
        input_dims={"recordings": 6}, input_num_chars={}, eos_label=4,
        num_phonemes=5, dim_dec=8, dims_bidir=[7], enc_transition="gru",
        dec_transition="gru", attention_type="content_and_conv",
        conv_n=1, use_states_for_readout=False,
        criterion={"name": "log_likelihood"},
        bottom={"bottom_class": "speech"}, subsample=[1],
        post_merge_dims=[10], max_decoded_length_scale=1.0,
        data_prepend_eos=False, use_pallas="never")
    rec = SpeechRecognizer(cfg, init_config={
        "/recognizer": {"weights_init": ["isotropic_gaussian", 0.5],
                        "biases_init": ["constant", 0.0],
                        "rec_weights_init": ["orthogonal"]}}, seed=7)
    p = rec.params["params"]["generator"]["readout"]["post_merge_0"]
    p["bias"] = p["bias"].at[4].add(1.5)
    rec.init_beam_search(3)

    rng = np.random.RandomState(3)
    inputs = rng.randn(8, 16, 6).astype("float32")
    mask = (np.arange(16)[None] <
            rng.randint(10, 17, size=(8, 1))).astype("f")

    single = rec.beam_search(inputs, mask, as_arrays=True)
    mesh = make_mesh(8, model_parallel=1)
    sharded = rec.beam_search(inputs, mask, as_arrays=True, mesh=mesh)

    np.testing.assert_array_equal(sharded["done_valid"],
                                  single["done_valid"])
    np.testing.assert_array_equal(sharded["done_out"],
                                  single["done_out"])
    np.testing.assert_allclose(sharded["done_cost"], single["done_cost"],
                               rtol=1e-5, atol=1e-6)


def test_shard_map_dp_step_matches_single_device():
    """shard_map-dp mode (parallel/mesh.py): each shard traces the
    train step on LOCAL shapes — the Pallas training kernels stay live
    per shard (interpret mode here) — and the pmean'd gradients must
    produce the same updated params as one device on the full batch."""
    from attention_lvcsr_tpu.models.recognizer import SpeechRecognizer
    from attention_lvcsr_tpu.parallel import make_parallel_train_step
    from attention_lvcsr_tpu.train.driver import make_train_step
    from attention_lvcsr_tpu.train.rules import build_optimizer

    cfg = dict(
        input_dims={"recordings": 5}, input_num_chars={}, eos_label=4,
        num_phonemes=5, dim_dec=8, dims_bidir=[6], enc_transition="gru",
        dec_transition="gru", attention_type="content_and_conv",
        conv_n=2, use_states_for_readout=False,
        criterion={"name": "log_likelihood"},
        bottom={"bottom_class": "speech"}, subsample=[1],
        post_merge_dims=[10], max_decoded_length_scale=1.0,
        prior={"type": "expanding", "initial_begin": 0,
               "initial_end": 6, "min_speed": 1.0, "max_speed": 2.0},
        use_pallas="interpret")
    rec = SpeechRecognizer(cfg, init_config={
        "/recognizer": {"weights_init": ["isotropic_gaussian", 0.1],
                        "biases_init": ["constant", 0.0],
                        "rec_weights_init": ["orthogonal"]}}, seed=3)
    config = {"net": rec.net_config,
              "training": {"rules": ["adadelta"]}, "regularization": {}}
    optimizer = build_optimizer(config["training"], {})

    rng = np.random.RandomState(0)
    B, T, TL = 8, 12, 5
    inputs = rng.randn(B, T, 5).astype("float32")
    mask = np.ones((B, T), "float32")
    labels = rng.randint(0, 5, size=(B, TL)).astype("int32")
    lmask = np.ones((B, TL), "float32")
    key = jax.random.PRNGKey(0)

    # single device, full batch
    step1 = make_train_step(rec, optimizer, config, eos_label=4,
                            input_key="recordings")
    p1, _, m1 = jax.jit(step1)(
        rec.params, optimizer.init(rec.params), key,
        jnp.asarray(inputs), jnp.asarray(mask), jnp.asarray(labels),
        jnp.asarray(lmask))

    # shard_map dp over 8 shards
    mesh = make_mesh(8, model_parallel=1)
    step8 = make_train_step(rec, optimizer, config, eos_label=4,
                            input_key="recordings", pmean_axis="data")
    par = make_parallel_train_step(step8, mesh, shard_map_dp=True)
    with mesh:
        batch = shard_batch([inputs, mask, labels, lmask], mesh)
        p8, _, m8 = par(rec.params, optimizer.init(rec.params), key,
                        *batch)

    np.testing.assert_allclose(float(m8["train_cost"]),
                               float(m1["train_cost"]), rtol=2e-5)
    flat1 = jax.tree_util.tree_leaves(p1)
    flat8 = jax.tree_util.tree_leaves(p8)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


def test_sharded_loop_kernel_decode_matches_single_device():
    """On a pure data-parallel mesh the WHOLE-LOOP Pallas decode kernel
    runs per shard through jax.shard_map (serving-scale decode at
    kernel speed) — hypotheses identical to the single-device kernel."""
    from attention_lvcsr_tpu.models.recognizer import SpeechRecognizer

    cfg = dict(
        input_dims={"recordings": 6}, input_num_chars={}, eos_label=4,
        num_phonemes=5, dim_dec=8, dims_bidir=[7], enc_transition="gru",
        dec_transition="gru", attention_type="content_and_conv",
        conv_n=1, use_states_for_readout=False,
        criterion={"name": "log_likelihood"},
        bottom={"bottom_class": "speech"}, subsample=[1],
        post_merge_dims=[10], max_decoded_length_scale=1.0,
        data_prepend_eos=False, use_pallas="interpret")
    rec = SpeechRecognizer(cfg, init_config={
        "/recognizer": {"weights_init": ["isotropic_gaussian", 0.5],
                        "biases_init": ["constant", 0.0],
                        "rec_weights_init": ["orthogonal"]}}, seed=7)
    p = rec.params["params"]["generator"]["readout"]["post_merge_0"]
    p["bias"] = p["bias"].at[4].add(1.5)
    rec.init_beam_search(3)
    assert rec._beam_search._loop_kernel_mode() == "interpret"

    rng = np.random.RandomState(3)
    inputs = rng.randn(8, 16, 6).astype("float32")
    mask = (np.arange(16)[None] <
            rng.randint(10, 17, size=(8, 1))).astype("f")

    single = rec.beam_search(inputs, mask, as_arrays=True)
    mesh = make_mesh(8, model_parallel=1)
    sharded = rec.beam_search(inputs, mask, as_arrays=True, mesh=mesh)

    np.testing.assert_array_equal(sharded["done_valid"],
                                  single["done_valid"])
    np.testing.assert_array_equal(sharded["done_out"],
                                  single["done_out"])
    np.testing.assert_allclose(sharded["done_cost"], single["done_cost"],
                               rtol=1e-5, atol=1e-6)
