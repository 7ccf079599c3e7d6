"""The quality proxy's compile-economics knobs (round 4).

Through the tunneled dev chip every distinct padded batch shape costs
minutes of remote compile, so ``--pad R,L`` must collapse the bucketed
pipeline to ONE train shape.  This exercises the template plumbing and
the actual padded shapes the Data pipeline emits — without training.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.mark.slow
def test_pad_override_collapses_to_one_shape(tmp_path):
    from tools.quality_proxy import (CONFIG_TEMPLATE, make_dataset,
                                     make_language, sample_corpus)

    rng = np.random.RandomState(0)
    words, succ = make_language(rng, num_words=8)
    corpus = sample_corpus(words, succ, rng, 40, min_len=2, max_len=4)
    value_map = {"<spc>": 0, "<eol>": 1}
    for ch in "ABCDEFGHIJKL":
        value_map[ch] = len(value_map)
    ds = str(tmp_path / "synth.h5")
    make_dataset(ds, corpus, value_map, rng, feat_dim=8, frames_lo=2,
                 frames_hi=4, noise=0.5,
                 splits=(("train", 30), ("valid", 5), ("test", 5)))

    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(CONFIG_TEMPLATE.format(
        dataset=ds, batch_size=8, dim=16, dims_bidir="[16]",
        subsample="[2]", pretrain_epochs=1, main_epochs=1,
        pad_rec=120, pad_lab=40))

    from attention_lvcsr_tpu.config import Configuration
    from attention_lvcsr_tpu.data import Data
    config = Configuration(str(cfg_path))
    assert config["data"]["pad_multiple"] == {"recordings": 120,
                                              "labels": 40}
    data = Data(**config["data"])
    shapes = {(b["recordings"].shape[1], b["labels"].shape[1])
              for b in data.get_stream("train", batches=True)}
    assert len(shapes) == 1, shapes
    (rec_t, lab_t), = shapes
    assert rec_t % 120 == 0 and lab_t % 40 == 0


def test_cli_flags_exist():
    """--pad/--epochs/--skip-train must stay on the CLI surface (the
    round-4 on-chip runs are driven through them)."""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "quality_proxy.py"),
         "--help"], capture_output=True, text=True, timeout=120)
    assert out.returncode == 0
    for flag in ("--pad", "--epochs", "--skip-train", "--tier"):
        assert flag in out.stdout
