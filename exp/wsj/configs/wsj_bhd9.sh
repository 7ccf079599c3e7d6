#!/usr/bin/env bash
# Port of the reference job wrapper exp/wsj/configs/wsj_bhd9.bash
# (archival experiment lineage).  LVSR_TPU must point at the repo root.
set -e
# like jan_baseline but with smaller initial weights
python "$LVSR_TPU/bin/run.py"  train wsj_bhd9.zip "$LVSR_TPU"/exp/wsj/configs/wsj_bhd9.yaml training.num_epochs 3
python "$LVSR_TPU/bin/run.py" --params wsj_bhd9.zip train wsj_bhd9r.zip "$LVSR_TPU"/exp/wsj/configs/wsj_bhd9.yaml\
    net.prior.type "'window_around_median'"
