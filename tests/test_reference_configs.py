"""Drop-in compatibility: build and run a model straight from the
reference repo's own experiment YAML (parent chain + python tags)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(not os.path.isdir("/root/reference"),
                                reason="reference tree not mounted")


@pytest.mark.slow
def test_model_from_reference_wsj_config(monkeypatch):
    from attention_lvcsr_tpu.config import read_config
    from attention_lvcsr_tpu.models.recognizer import SpeechRecognizer

    monkeypatch.setenv("LVSR", "/root/reference")
    with open("/root/reference/exp/wsj/configs/wsj_paper.yaml") as f:
        config = read_config(f)

    net = dict(config["net"])
    recognizer = SpeechRecognizer(
        dict(net,
             input_dims={"recordings": 123},
             input_num_chars={},
             eos_label=31,
             num_phonemes=32,
             character_map=None,
             data_prepend_eos=bool(config["data"].get("add_bos"))),
        init_config=config["initialization"], seed=1)

    # paper-scale parameter count (4x250 BiGRU + attention decoder)
    n_params = sum(int(np.prod(p.shape)) for p in
                   jax.tree_util.tree_leaves(recognizer.params))
    assert 5_000_000 < n_params < 30_000_000

    B, T, TL = 2, 24, 6
    rng = np.random.RandomState(0)
    out = recognizer.cost_fn()(
        recognizer.params,
        jnp.asarray(rng.randn(B, T, 123), jnp.float32),
        jnp.ones((B, T), jnp.float32),
        jnp.asarray(rng.randint(0, 32, (B, TL)), jnp.int32),
        jnp.ones((B, TL), jnp.float32))
    assert np.isfinite(np.asarray(out["costs"])).all()

    # the multistage pretraining stage flips the prior to 'expanding'
    from attention_lvcsr_tpu.config import merge_recursively
    import copy
    stage = copy.deepcopy(config)
    del stage["stages"]
    changes = dict(config["stages"]["pretraining"])
    del changes["number"]
    merge_recursively(stage, changes)
    assert stage["net"]["prior"]["type"] == "expanding"


@pytest.mark.slow
def test_optimizer_from_reference_training_section(monkeypatch):
    from attention_lvcsr_tpu.config import read_config
    from attention_lvcsr_tpu.train.rules import build_optimizer
    monkeypatch.setenv("LVSR", "/root/reference")
    with open("/root/reference/exp/wsj/configs/wsj_paper.yaml") as f:
        config = read_config(f)
    opt = build_optimizer(config["training"],
                          config.get("regularization", {}))
    params = {"k": {"kernel": jnp.ones((4, 4))}}
    state = opt.init(params)
    updates, _ = opt.update({"k": {"kernel": jnp.ones((4, 4))}}, state,
                            params)
    assert np.isfinite(np.asarray(updates["k"]["kernel"])).all()


def test_every_reference_config_parses_and_validates(monkeypatch):
    """ALL the reference's shipped experiment configs (the full
    exp/wsj + exp/timit libraries, 50 YAMLs incl. the archival jan/bhd
    series with python/object tags, string-typed numbers, and stale
    keys) load through our parent-chain loader, coerce, and
    schema-validate."""
    import glob

    from attention_lvcsr_tpu.config import read_config
    from attention_lvcsr_tpu.config.schema import (coerce_config,
                                                   validate_config)
    monkeypatch.setenv("LVSR", "/root/reference")
    paths = sorted(glob.glob("/root/reference/exp/*/configs/*.yaml"))
    assert len(paths) >= 50
    for path in paths:
        with open(path) as f:
            config = read_config(f)
        coerce_config(config)
        validate_config(config)
    # a coerced archival quirk: string-typed scientific notation
    with open("/root/reference/exp/wsj/configs/"
              "wsj_prior_conv_adadelta.yaml") as f:
        config = coerce_config(read_config(f))
    assert config["training"]["epsilon"] == 1e-8
