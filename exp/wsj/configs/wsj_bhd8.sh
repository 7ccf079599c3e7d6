#!/usr/bin/env bash
# Port of the reference job wrapper exp/wsj/configs/wsj_bhd8.bash
# (archival experiment lineage).  LVSR_TPU must point at the repo root.
set -e
# BHD7, but regularize at the initial stage as well
python "$LVSR_TPU/bin/run.py"  train wsj_bhd8.zip "$LVSR_TPU"/exp/wsj/configs/wsj_bhd4.yaml training.num_epochs 3 \
    regularization.max_norm 1
python "$LVSR_TPU/bin/run.py" --params wsj_bhd8.zip train wsj_bhd8r.zip "$LVSR_TPU"/exp/wsj/configs/wsj_bhd4.yaml\
    regularization.max_norm 1 net.prior.type "'window_around_median'"
