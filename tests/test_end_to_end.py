"""End-to-end: config -> data -> train -> decode -> checkpoint/resume.

The integration test the reference never had (SURVEY.md §4): a tiny
recognizer overfits the synthetic dataset through the full driver stack,
beam search decodes it with low CER, and training resumes from a
checkpoint.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "tools")

from attention_lvcsr_tpu.config import Configuration
from attention_lvcsr_tpu.train import driver
from make_toy_dataset import make_toy_dataset

CONFIG_TEMPLATE = """
data:
    dataset_filename: {dataset}
    batch_size: 10
    sources_map:
        recordings: recordings
        labels: labels
    default_sources: [recordings, labels]
    sort_k_batches: 2
net:
    dim_dec: 32
    dims_bidir: [24]
    dim_matcher: 24
    bottom:
        bottom_class: SpeechBottom
        dims: []
    enc_transition: GatedRecurrent
    dec_transition: GatedRecurrent
    attention_type: content_and_conv
    conv_n: 2
    subsample: [1]
    post_merge_dims: [32]
    use_states_for_readout: true
    max_decoded_length_scale: 1.0
    criterion:
        name: log_likelihood
    lm: {{}}
initialization:
    /recognizer:
        weights_init: [IsotropicGaussian, 0.1]
        biases_init: [Constant, 0.0]
        rec_weights_init: [Orthogonal]
training:
    gradient_threshold: 100.0
    rules: [adadelta]
    decay_rate: 0.95
    epsilon: 1.0e-6
    num_epochs: {num_epochs}
    seed: 1
monitoring:
    validate_every_epochs: 2
    search_every_epochs: 0
    search:
        beam_size: 3
        char_discount: 0.0
        stop_on: patience
"""


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    dataset = d / "toy.h5"
    make_toy_dataset(str(dataset), num_examples=60, num_chars=4, feat_dim=6,
                     min_len=2, max_len=5, frames_per_char=3, noise=0.05,
                     seed=3)
    return d


def _write_config(workdir, num_epochs):
    cfg_path = workdir / f"cfg_{num_epochs}.yaml"
    cfg_path.write_text(CONFIG_TEMPLATE.format(
        dataset=str(workdir / "toy.h5"), num_epochs=num_epochs))
    return Configuration(str(cfg_path))


@pytest.mark.slow
def test_train_decode_resume(workdir):
    config = _write_config(workdir, 40)
    save_path = str(workdir / "model.zip")
    loop = driver.train(config, save_path, fast_start=True)
    log = loop.log

    costs = log.channel("train_cost")[1]
    assert len(costs) >= 40
    # the model learns: large cost decrease
    assert np.mean(costs[-5:]) < 0.5 * np.mean(costs[:5])
    # validation ran and was recorded
    assert log.last_value("valid_sequence_total_cost") is not None
    # checkpoint written
    assert os.path.exists(save_path)

    # -- decode with beam search and score CER ---------------------------
    from attention_lvcsr_tpu.data import Data
    data = Data(**config["data"])
    recognizer = driver.create_model(config, data, save_path)
    recognizer.init_beam_search(3)
    errors, total = 0.0, 0.0
    from attention_lvcsr_tpu.ops.error_rate import wer
    for i, ex in enumerate(data.get_stream("valid", batches=False,
                                           shuffle=False)):
        outputs, costs_ = recognizer.beam_search(
            np.asarray(ex["recordings"], np.float32))
        groundtruth = data.decode(ex["labels"])
        recognized = data.decode(outputs[0])
        errors += min(1.0, wer(groundtruth, recognized)) * len(groundtruth)
        total += len(groundtruth)
    cer = errors / total
    assert cer < 0.3, f"beam-decode CER too high: {cer}"

    # -- resume from checkpoint ------------------------------------------
    config2 = _write_config(workdir, 42)
    loop2 = driver.train(config2, str(workdir / "model2.zip"),
                         params_path=save_path, use_load_ext=True,
                         fast_start=True)
    # resumed at iteration count from the checkpoint and continued
    assert loop2.log.status["iterations_done"] > \
        log.status["iterations_done"]
    resumed_costs = loop2.log.channel("train_cost")[1]
    assert np.mean(resumed_costs[-5:]) <= np.mean(costs[:5])
