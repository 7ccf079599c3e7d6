"""End-to-end TIMIT recipe on a synthetic TIMIT-shaped tree.

Builds a miniature TIMIT distribution (wav + .PHN files), runs the real
dataset pipeline (``exp/timit/read_phone_transcripts.py`` +
``exp/timit/make_timit_dataset.sh``), loads the result through the
config/Data machinery with ``H5AudioDatasetTimit``, and checks the
61->39 phone folding in decoding/scoring (the reference's
``exp/timit/write_hdf_dataset.sh`` + ``H5PYAudioDatasetTimit`` path).
"""
import os
import struct
import subprocess
import sys
import wave

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

UTTS = {
    ("TRAIN", "DR1", "SPK0", "SA1"): ["h#", "sh", "ix", "hv", "eh", "h#"],
    ("TRAIN", "DR1", "SPK0", "SX2"): ["h#", "ao", "q", "ae", "h#"],
    ("TRAIN", "DR2", "SPK1", "SA1"): ["h#", "dcl", "d", "ux", "h#"],
    ("TEST", "DR3", "SPK2", "SA1"): ["h#", "ax-h", "zh", "el", "h#"],
}


def _write_wav(path, seed, n=3200, rate=16000):
    rng = np.random.RandomState(seed)
    data = (rng.randn(n) * 3000).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(data.tobytes())


@pytest.fixture(scope="module")
def timit_h5(tmp_path_factory):
    root = tmp_path_factory.mktemp("timit")
    timit_dir = root / "TIMIT"
    lists = root / "lists"
    lists.mkdir()
    scps = {"train": [], "dev": [], "test": []}
    for i, ((tset, dr, spk, utt), phones) in enumerate(sorted(UTTS.items())):
        d = timit_dir / tset / dr / spk
        d.mkdir(parents=True, exist_ok=True)
        wav = d / f"{utt}.WAV.wav"
        _write_wav(str(wav), seed=i)
        with open(d / f"{utt}.PHN", "w") as f:
            start = 0
            for ph in phones:
                f.write(f"{start} {start + 400} {ph}\n")
                start += 400
        uttid = f"{spk}_{utt}"
        part = "test" if tset == "TEST" else \
            ("dev" if spk == "SPK1" else "train")
        scps[part].append(f"{uttid} {wav}\n")
    for part, lines in scps.items():
        with open(lists / f"wav_{part}.scp", "w") as f:
            f.writelines(sorted(lines))

    out = root / "timit.h5"
    env = dict(os.environ, TIMIT_DIR=str(timit_dir),
               TIMIT_LISTS=str(lists))
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "exp/timit/make_timit_dataset.sh"),
         str(out)], env=env, cwd=REPO, capture_output=True, text=True)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    return str(out)


def test_dataset_layout_and_folding(timit_h5):
    from attention_lvcsr_tpu.data import Data
    data = Data(dataset_filename=timit_h5,
                dataset_class="H5AudioDatasetTimit",
                name_mapping={"train": "train", "valid": "dev",
                              "test": "test"},
                sources_map={"recordings": "fbank_dd",
                             "labels": "phonemes"},
                default_sources=["recordings", "labels"],
                batch_size=2)
    ds = data.get_dataset("train")
    assert ds.num_examples == 2
    assert data.get_dataset("valid").num_examples == 1
    assert data.get_dataset("test").num_examples == 1
    # 40 mel bins + energy, with delta + delta-delta = 123 dims
    assert data.num_features("recordings") == 123

    ex = next(iter(data.get_stream("train", batches=False, shuffle=False)))
    labels = [int(l) for l in ex["labels"]]
    # stream appends <eol>; decode folds 61->39 and drops it
    folded = ds.decode(labels)
    raw = ds.decode(labels, map_to_39=False)
    assert raw[0] == "h#" and folded[0] == "sil"
    # SPK0_SA1: sh ix hv eh -> sh ih hh eh (ix->ih, hv->hh), h#->sil
    assert folded == ["sil", "sh", "ih", "hh", "eh", "sil"]
    assert ds.pretty_print(labels) == "sil sh ih hh eh sil"


def test_folding_drops_q_and_merges(timit_h5):
    from attention_lvcsr_tpu.data import Data
    data = Data(dataset_filename=timit_h5,
                dataset_class="H5AudioDatasetTimit",
                name_mapping={"train": "train", "valid": "dev",
                              "test": "test"},
                sources_map={"recordings": "fbank_dd",
                             "labels": "phonemes"},
                default_sources=["recordings", "labels"], batch_size=2)
    ds = data.get_dataset("train")
    cmap = ds.character_map("phonemes")
    # q folds to nothing; ao folds to aa; dcl to sil
    seq = [cmap["h#"], cmap["ao"], cmap["q"], cmap["ae"], cmap["h#"]]
    assert ds.decode(seq) == ["sil", "aa", "ae", "sil"]

    # folded scoring: 61-phone hypothesis differing only within folds
    # scores a zero error rate against the folded groundtruth
    from attention_lvcsr_tpu.ops.error_rate import wer
    hyp = [cmap["dcl"], cmap["ao"], cmap["ae"], cmap["dcl"]]
    assert wer(ds.decode(seq), ds.decode(hyp)) == 0.0


@pytest.mark.slow
def test_iclr_reward_config_builds_and_trains(timit_h5, tmp_path):
    """The task-loss TIMIT experiment: config parses with stages, the
    model builds with the mse_gain criterion, and one stage trains."""
    from attention_lvcsr_tpu.config import Configuration
    config = Configuration(
        os.path.join(REPO, "exp/timit/configs/iclr_reward.yaml"),
        config_changes=[
            ["data.dataset_filename", timit_h5],
            ["data.batch_size", 2],
            ["data.sort_k_batches", 1],
            ["net.dim_dec", 12], ["net.dims_bidir", [10, 10]],
            ["net.dim_matcher", 10], ["net.subsample", [1, 2]],
            ["net.post_merge_dims", [12]], ["net.conv_n", 3],
            ["training.num_epochs", 1],
            ["monitoring.search_every_epochs", 0],
            ["monitoring.validate_every_epochs", 0],
        ])
    stages = config.ordered_stages
    # parent chain contributes main/annealing; iclr_reward adds
    # pretraining2 between them (number ordering)
    assert list(stages) == ["pretraining", "pretraining2", "main",
                            "annealing"]
    pre = stages["pretraining"]
    assert pre["net"]["criterion"]["name"] == "mse_gain"
    assert pre["net"]["criterion"]["min_reward"] == -1
    assert pre["net"]["energy_normalizer"] == "logistic"
    assert pre["training"]["exploration"] == "greedy"

    from attention_lvcsr_tpu.train.driver import train
    out = os.path.join(str(tmp_path), "reward", "model.zip")
    train(pre, save_path=out)
    assert os.path.exists(out)
