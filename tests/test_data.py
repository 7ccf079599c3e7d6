"""Data layer tests: HDF5 roundtrip, pipeline semantics, normalization."""
import sys

import numpy as np
import pytest
from numpy.testing import assert_allclose

sys.path.insert(0, "tools")

from attention_lvcsr_tpu.data import Data
from attention_lvcsr_tpu.data.h5 import H5AudioDataset
from attention_lvcsr_tpu.data.pipeline import pad_batch, sorted_buckets
from attention_lvcsr_tpu.data.preprocessing import Normalization
from make_toy_dataset import make_toy_dataset


@pytest.fixture(scope="module")
def toy_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "toy.h5"
    make_toy_dataset(str(path), num_examples=50, num_chars=4, feat_dim=5,
                     seed=1)
    return str(path)


def _make_data(toy_path, **kwargs):
    defaults = dict(
        dataset_filename=toy_path,
        sources_map={"recordings": "recordings", "labels": "labels",
                     "uttids": "uttids"},
        default_sources=["recordings", "labels"],
        batch_size=8, prefetch=False)
    defaults.update(kwargs)
    return Data(**defaults)


def test_dataset_roundtrip(toy_path):
    ds = H5AudioDataset(toy_path, which_sets=("train",),
                        sources=("recordings", "labels"),
                        target_source="labels")
    assert ds.num_examples == 40
    rec, lab = ds.get_example(0)
    assert rec.ndim == 2 and rec.shape[1] == 5
    assert ds.eos_label == 4
    assert ds.num_characters == 5
    decoded = ds.decode(list(lab) + [ds.eos_label])
    assert all(c in "abcd" for c in decoded)


def test_stream_batches(toy_path):
    data = _make_data(toy_path)
    batch = next(iter(data.get_stream("train", shuffle=False)))
    B, T, F = batch["recordings"].shape
    assert B == 8 and F == 5
    assert batch["recordings_mask"].shape == (B, T)
    assert batch["labels"].shape == batch["labels_mask"].shape
    # EOS appended at the last unmasked position of every row
    for i in range(B):
        L = int(batch["labels_mask"][i].sum())
        assert batch["labels"][i, L - 1] == data.eos_label


def test_sort_k_batches_bucketing(toy_path):
    data = _make_data(toy_path, sort_k_batches=3, batch_size=4)
    batches = list(data.get_stream("train", shuffle=False))
    # within a bucket group, batches are length-sorted -> padding waste low
    lengths = [b["recordings"].shape[1] for b in batches]
    assert len(batches) == 10
    # each batch internally has little length variance after sorting
    for b in batches:
        row_lens = b["recordings_mask"].sum(axis=1)
        assert row_lens.max() - row_lens.min() <= row_lens.max()


def test_pad_multiple(toy_path):
    data = _make_data(toy_path, pad_multiple=16)
    for batch in data.get_stream("train", shuffle=False):
        assert batch["recordings"].shape[1] % 16 == 0


def test_per_source_pad_multiple_and_pad_batches(toy_path):
    data = _make_data(toy_path, batch_size=16,
                      pad_multiple={"recordings": 16, "labels": 4},
                      pad_batches=True)
    batches = list(data.get_stream("train", shuffle=False))
    for batch in batches:
        assert batch["recordings"].shape[0] == 16  # last batch padded
        assert batch["recordings"].shape[1] % 16 == 0
        assert batch["labels"].shape[1] % 4 == 0
    # padded rows are fully masked
    last = batches[-1]
    assert last["recordings_mask"][-1].sum() == 0 or \
        40 % 16 == 0  # (40 examples -> last batch has 8 real rows)


def test_length_filter_switch(toy_path):
    data = _make_data(toy_path, max_length=10)
    n_filtered = sum(1 for _ in data.get_stream("train", batches=False,
                                                shuffle=False))
    data.length_filter.max_length = None
    n_all = sum(1 for _ in data.get_stream("train", batches=False,
                                           shuffle=False))
    assert n_filtered < n_all == 40


def test_normalization(toy_path, tmp_path):
    data = _make_data(toy_path)
    norm = Normalization.compute(
        data.get_stream("train", batches=False, shuffle=False),
        source="recordings")
    path = str(tmp_path / "norm.npz")
    norm.save(path)
    data2 = _make_data(toy_path, normalization=path)
    feats = np.concatenate([
        ex["recordings"] for ex in data2.get_stream("train", batches=False,
                                                    shuffle=False)])
    assert abs(feats.mean()) < 0.05
    assert abs(feats.std() - 1.0) < 0.1


def test_prefetcher(toy_path):
    data = _make_data(toy_path, prefetch=True)
    batches = list(data.get_stream("train", shuffle=False))
    assert len(batches) == 5


def test_pad_batch_static_batch_dim():
    group = [{"x": np.ones((3, 2))}, {"x": np.ones((5, 2))}]
    out = pad_batch(group, ["x"], pad_multiple=4, pad_batch_to=4)
    assert out["x"].shape == (4, 8, 2)
    assert out["x_mask"].sum() == 8.0


def test_uttid_source_archival_alias():
    """data.uttid_source (old reference configs) aliases the uttids
    source without overriding an explicit sources_map entry."""
    from attention_lvcsr_tpu.data import Data
    d = Data("nonexistent.h5", uttid_source="utterance_ids")
    assert d.sources_map["uttids"] == "utterance_ids"
    d2 = Data("nonexistent.h5", sources_map={"uttids": "ids"},
              uttid_source="utterance_ids")
    assert d2.sources_map["uttids"] == "ids"
