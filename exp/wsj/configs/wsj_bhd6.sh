#!/usr/bin/env bash
# Port of the reference job wrapper exp/wsj/configs/wsj_bhd6.bash
# (archival experiment lineage).  LVSR_TPU must point at the repo root.
set -e
# Try to exactly replicate the fruitful BHD3 experiment
python "$LVSR_TPU/bin/run.py"  train wsj_bhd6.zip "$LVSR_TPU"/exp/wsj/configs/wsj_jan_baseline.yaml training.num_epochs 3
python "$LVSR_TPU/bin/run.py" --params wsj_bhd6.zip train wsj_bhd6r.zip "$LVSR_TPU"/exp/wsj/configs/wsj_jan_baseline.yaml\
   regularization.max_norm 1 net.prior.type "'window_around_median'"
