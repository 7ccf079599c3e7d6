"""Checkpoint-surgery tool (the add_bos_to_parameters.py capability)."""
import subprocess
import sys

import numpy as np
import pytest

from attention_lvcsr_tpu.train.checkpoint import (load_parameters,
                                                  save_checkpoint,
                                                  save_parameters)

TOOL = ["tools/edit_params.py"]


def _run(*args):
    return subprocess.run([sys.executable] + TOOL + list(args),
                          capture_output=True, text=True, check=True,
                          cwd=__file__.rsplit("/", 2)[0])


@pytest.fixture()
def ckpt(tmp_path):
    path = str(tmp_path / "model.zip")
    save_checkpoint(path, {
        "/recognizer/generator/lookup/embeddings": np.arange(33 * 4,
            dtype=np.float32).reshape(33, 4),
        "/recognizer/generator/readout/bias": np.ones(33, np.float32),
        "/recognizer/encoder/kernel": np.ones((4, 8), np.float32),
    }, meta={"iterations": 7})
    return path


def test_grow_adds_vocab_row(ckpt, tmp_path):
    out = str(tmp_path / "grown.npz")
    _run("grow", ckpt, out, "--dim-size", "33")
    grown = load_parameters(out)
    emb = grown["/recognizer/generator/lookup/embeddings"]
    assert emb.shape == (34, 4)
    assert (emb[-1] == 0).all() and (emb[:33] != 0).any()
    assert grown["/recognizer/generator/readout/bias"].shape == (34,)
    # untouched parameter unchanged
    assert grown["/recognizer/encoder/kernel"].shape == (4, 8)


def test_rename_and_merge(ckpt, tmp_path):
    renamed = str(tmp_path / "renamed.npz")
    _run("rename", ckpt, renamed, "/encoder/", "/enc2/")
    keys = load_parameters(renamed)
    assert "/recognizer/enc2/kernel" in keys
    assert "/recognizer/encoder/kernel" not in keys

    overlay = str(tmp_path / "overlay.npz")
    save_parameters(overlay, {"/recognizer/enc2/kernel":
                              np.zeros((4, 8), np.float32)})
    merged = str(tmp_path / "merged.npz")
    _run("merge", renamed, overlay, merged)
    assert (load_parameters(merged)["/recognizer/enc2/kernel"] == 0).all()


def test_extract_and_list(ckpt, tmp_path):
    out = str(tmp_path / "gen.npz")
    _run("extract", ckpt, out, "/generator/")
    assert len(load_parameters(out)) == 2
    listing = _run("list", ckpt).stdout
    assert "/recognizer/encoder/kernel  float32[4, 8]" in listing
