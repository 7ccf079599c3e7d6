"""Multi-stage training: stage chaining with restart_from checkpoints."""
import os
import sys
import textwrap

import numpy as np
import pytest

sys.path.insert(0, "tools")

from attention_lvcsr_tpu.config import Configuration
from attention_lvcsr_tpu.train import driver
from make_toy_dataset import make_toy_dataset

CONFIG = """
data:
    dataset_filename: {dataset}
    batch_size: 10
    sources_map: {{recordings: recordings, labels: labels}}
    default_sources: [recordings, labels]
net:
    dim_dec: 12
    dims_bidir: [8]
    dim_matcher: 12
    bottom: {{bottom_class: SpeechBottom, dims: []}}
    enc_transition: GatedRecurrent
    dec_transition: GatedRecurrent
    attention_type: content_and_conv
    conv_n: 2
    subsample: [1]
    post_merge_dims: [12]
    max_decoded_length_scale: 1.0
    criterion: {{name: log_likelihood}}
    prior:
        type: window_around_median
        before: 5
        after: 5
initialization:
    /recognizer:
        weights_init: [IsotropicGaussian, 0.1]
        biases_init: [Constant, 0.0]
training:
    gradient_threshold: 100.0
    rules: [adadelta]
    seed: 2
monitoring:
    validate_every_epochs: 1
    search_every_epochs: 0
    search: {{beam_size: 2, stop_on: patience}}
stages:
    pretraining:
        number: 0
        net:
            prior:
                type: expanding
                initial_begin: 0
                initial_end: 30
                min_speed: 0.0
                max_speed: 0.0
        training: {{num_epochs: 2}}
    main:
        number: 100
        training: {{num_epochs: 2, restart_from: _best_ll}}
"""


@pytest.mark.slow
def test_train_multistage(tmp_path):
    dataset = tmp_path / "toy.h5"
    make_toy_dataset(str(dataset), num_examples=30, num_chars=4, feat_dim=5,
                     max_len=4, seed=7)
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(CONFIG.format(dataset=dataset))
    config = Configuration(str(cfg_path))
    assert config.multi_stage

    save_dir = str(tmp_path / "run")
    loops = driver.train_multistage(config, save_dir, fast_start=True)
    assert len(loops) == 2
    # both stage checkpoints plus best-cost aliases exist
    assert os.path.exists(os.path.join(save_dir, "pretraining.zip"))
    assert os.path.exists(os.path.join(save_dir, "pretraining_best_ll.zip"))
    assert os.path.exists(os.path.join(save_dir, "main.zip"))
    # second stage trained (iterations advanced within its own log)
    assert loops[1].log.status["iterations_done"] > 0
    # the main stage used a different window prior (expanding ->
    # window_around_median); its config was a fresh merge
    assert config.ordered_stages["main"]["net"]["prior"]["type"] == \
        "window_around_median"
