#!/usr/bin/env bash
# Port of the reference job wrapper exp/wsj/configs/wsj_bhd10.bash
# (archival experiment lineage).  LVSR_TPU must point at the repo root.
set -e
# like bhd8 but with no regularization at the second stage
python "$LVSR_TPU/bin/run.py" --params wsj_bhd8.zip train wsj_bhd10r.zip "$LVSR_TPU"/exp/wsj/configs/wsj_bhd4.yaml\
    regularization.max_norm 0 net.prior.type "'window_around_median'"
