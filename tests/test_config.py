"""Config system tests: parents, merging, overrides, stages, schema,
reference-YAML-tag compatibility."""
import os
import textwrap

import pytest

from attention_lvcsr_tpu.config import (Configuration, load_yaml,
                                        make_config_changes,
                                        merge_recursively, read_config)
from attention_lvcsr_tpu.config.schema import (ConfigValidationError,
                                               validate_config)

PROTO = os.path.join(os.path.dirname(__file__), os.pardir,
                     "attention_lvcsr_tpu", "config", "prototypes",
                     "prototype_speech.yaml")


def test_merge_recursively():
    base = {"a": {"b": 1, "c": 2}, "d": 3}
    merge_recursively(base, {"a": {"b": 10}, "e": 4})
    assert base == {"a": {"b": 10, "c": 2}, "d": 3, "e": 4}


def test_parent_chain(tmp_path):
    parent = tmp_path / "parent.yaml"
    parent.write_text("net:\n  dim_dec: 5\n  subsample: [1]\n")
    child = tmp_path / "child.yaml"
    child.write_text(f"parent: {parent}\nnet:\n  dim_dec: 7\n")
    with open(child) as f:
        config = read_config(f)
    assert config["net"] == {"dim_dec": 7, "subsample": [1]}


def test_env_expansion_in_parent(tmp_path, monkeypatch):
    parent = tmp_path / "base.yaml"
    parent.write_text("net: {dim_dec: 3}\n")
    child = tmp_path / "child.yaml"
    child.write_text("parent: $MYROOT/base.yaml\n")
    monkeypatch.setenv("MYROOT", str(tmp_path))
    with open(child) as f:
        config = read_config(f)
    assert config["net"]["dim_dec"] == 3


def test_cli_overrides():
    config = {"training": {"scale": 0.01}, "net": {"dim_dec": 5}}
    make_config_changes(config, [("training.scale", "0.1"),
                                 ("net.dims_bidir", "[4, 5]")])
    assert config["training"]["scale"] == 0.1
    assert config["net"]["dims_bidir"] == [4, 5]


def test_stages(tmp_path):
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(textwrap.dedent(f"""
        parent: {PROTO}
        stages:
            pretraining:
                number: 0
                training: {{num_epochs: 1}}
            main:
                number: 100
                training: {{num_epochs: 10, restart_from: _best_ll}}
    """))
    config = Configuration(str(cfg))
    assert config.multi_stage
    names = list(config.ordered_stages)
    assert names == ["pretraining", "main"]
    assert config.ordered_stages["pretraining"]["training"]["num_epochs"] == 1
    assert config.ordered_stages["main"]["training"]["num_epochs"] == 10
    # stage configs inherit the base net section
    assert config.ordered_stages["main"]["net"]["dim_dec"] == 100
    assert "stages" not in config.ordered_stages["main"]


def test_schema_catches_unknown_key(tmp_path):
    cfg = tmp_path / "bad.yaml"
    cfg.write_text("net:\n  not_a_real_option: 3\n")
    with pytest.raises(ConfigValidationError):
        Configuration(str(cfg))


def test_schema_accepts_prototype():
    config = Configuration(PROTO)
    assert config["net"]["dim_dec"] == 100


def test_reference_yaml_tags():
    text = textwrap.dedent("""
        net:
            enc_transition: !!python/name:blocks.bricks.recurrent.GatedRecurrent
            bottom:
                bottom_class: !!python/name:lvsr.bricks.recognizer.SpeechBottom
                activation: !!python/object/apply:blocks.bricks.Rectifier []
        initialization:
            /recognizer:
                weights_init:
                    !!python/object/apply:blocks.initialization.IsotropicGaussian [0.1]
                rec_weights_init:
                    !!python/object/apply:blocks.initialization.Orthogonal []
    """)
    config = load_yaml(text)
    assert config["net"]["enc_transition"] == "GatedRecurrent"
    assert config["net"]["bottom"]["bottom_class"] == "SpeechBottom"
    assert config["net"]["bottom"]["activation"] == "relu"
    init = config["initialization"]["/recognizer"]
    assert init["weights_init"] == ["IsotropicGaussian", 0.1]
    assert init["rec_weights_init"] == ["Orthogonal"]


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference tree not mounted")
def test_loads_reference_wsj_config(monkeypatch):
    """The shipped WSJ paper config (with its parent chain) parses."""
    monkeypatch.setenv("LVSR", "/root/reference")
    with open("/root/reference/exp/wsj/configs/wsj_paper.yaml") as f:
        config = read_config(f)
    assert config["net"]["dims_bidir"] == [250, 250, 250, 250]
    assert config["net"]["subsample"] == [1, 1, 2, 2]
    assert config["net"]["prior"]["type"] == "window_around_median"
    assert "stages" in config


def test_all_shipped_configs_validate():
    """Every experiment config under exp/ and every prototype parses,
    schema-validates, and expands its stages (reference parity for the
    config library: exp/wsj/configs, exp/timit/configs)."""
    import glob
    root = os.path.join(os.path.dirname(__file__), os.pardir)
    paths = sorted(
        glob.glob(os.path.join(root, "exp", "*", "configs", "*.yaml"))
        + glob.glob(os.path.join(root, "attention_lvcsr_tpu", "config",
                                 "prototypes", "*.yaml")))
    assert len(paths) >= 15
    for path in paths:
        config = Configuration(path)
        if config.multi_stage:
            assert config.ordered_stages


def test_stage_deletion_with_null(tmp_path):
    """A child config can delete a parent stage by setting it to null
    (reference wsj_reward1.yaml: ``annealing2: null``)."""
    parent = tmp_path / "parent.yaml"
    parent.write_text(textwrap.dedent("""
        net: {dim_dec: 4}
        stages:
            a: {number: 0, training: {num_epochs: 1}}
            b: {number: 1, training: {num_epochs: 2}}
    """))
    child = tmp_path / "child.yaml"
    child.write_text("parent: %s\nstages:\n    b: null\n" % parent)
    config = Configuration(str(child))
    assert list(config.ordered_stages) == ["a"]


def test_maxout_tag_resolution():
    text = "net:\n post_merge_activation: !!python/object/apply:blocks.bricks.Maxout [2]\n"
    config = load_yaml(text)
    assert config["net"]["post_merge_activation"] == "maxout:2"


@pytest.mark.slow  # full wsj_good lineage build-and-step
def test_wsj_good_builds_and_steps():
    """The pre-paper `wsj_good` lineage exercises keys the paper chain
    does not: rectifier bottom, use_states_for_readout, the
    momentum+adadelta rule chain, and wide conv_n.  Build the model
    (shrunk dims) and take one optimizer step."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from attention_lvcsr_tpu.models.recognizer import SpeechRecognizer
    from attention_lvcsr_tpu.train import rules

    root = os.path.join(os.path.dirname(__file__), os.pardir)
    config = Configuration(
        os.path.join(root, "exp/wsj/configs/wsj_good.yaml"),
        config_changes=[
            ["net.dim_dec", 10], ["net.dims_bidir", [8]],
            ["net.bottom.dims", [9]], ["net.conv_n", 5],
        ])
    net_config = dict(config["net"])
    assert net_config["use_states_for_readout"] is True
    assert net_config["bottom"]["activation"] == "rectifier"
    rec = SpeechRecognizer(
        dict(net_config, input_dims={"recordings": 6},
             input_num_chars={}, eos_label=4, num_phonemes=5),
        init_config=config["initialization"], seed=0)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 12, 6), jnp.float32)
    xm = jnp.ones((2, 12), jnp.float32)
    y = jnp.asarray(rng.randint(0, 5, (2, 4)), jnp.int32)
    ym = jnp.ones((2, 4), jnp.float32)

    def loss(p):
        return rec.net.apply(p, x, xm, y, ym,
                             method=rec.net.cost)["costs"].sum()

    opt = rules.build_optimizer(config["training"],
                                config.get("regularization", {}))
    state = opt.init(rec.params)
    grads = jax.grad(loss)(rec.params)
    updates, _ = opt.update(grads, state, rec.params)
    assert np.isfinite(float(loss(rec.params)))
    assert all(np.all(np.isfinite(u)) for u in jax.tree.leaves(updates))


def test_max_norm_negative_disables():
    """wsj_paper9 sets regularization.max_norm -1. to turn the
    constraint off (reference lvsr/main.py:491 tests `> 0`)."""
    from attention_lvcsr_tpu.train import rules
    opt_off = rules.build_optimizer({"rules": ["adadelta"]},
                                    {"max_norm": -1.0})
    opt_on = rules.build_optimizer({"rules": ["adadelta"]},
                                   {"max_norm": 1.0})
    import jax.numpy as jnp
    params = {"kernel": jnp.ones((4, 4)) * 10.0}
    for opt, expect_clip in [(opt_off, False), (opt_on, True)]:
        state = opt.init(params)
        updates, _ = opt.update({"kernel": jnp.zeros((4, 4))}, state,
                                params)
        new = params["kernel"] + updates["kernel"]
        clipped = bool(jnp.all(jnp.linalg.norm(new, axis=0) < 10.0))
        assert clipped == expect_clip


def test_stage_deltas_are_coerced(tmp_path):
    """Archival numeric strings inside stage deltas coerce like the top
    level (stages are schema-opaque, so they need their own pass)."""
    cfg = tmp_path / "c.yaml"
    cfg.write_text(textwrap.dedent("""
        training: {epsilon: 1e-8}
        stages:
            main: {number: 0, training: {epsilon: 1e-9}}
    """))
    config = Configuration(str(cfg))
    assert config["training"]["epsilon"] == 1e-8
    assert config.ordered_stages["main"]["training"]["epsilon"] == 1e-9
