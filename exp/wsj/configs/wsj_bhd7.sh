#!/usr/bin/env bash
# Port of the reference job wrapper exp/wsj/configs/wsj_bhd7.bash
# (archival experiment lineage).  LVSR_TPU must point at the repo root.
set -e
# Assuming that BHD6 will get to the level of wsj_jan_baseline2r_best,
# let's add one more recurrent layer
python "$LVSR_TPU/bin/run.py"  train wsj_bhd7.zip "$LVSR_TPU"/exp/wsj/configs/wsj_bhd4.yaml training.num_epochs 3 \
    regularization.max_norm 0
python "$LVSR_TPU/bin/run.py" --params wsj_bhd7.zip train wsj_bhd7r.zip "$LVSR_TPU"/exp/wsj/configs/wsj_bhd4.yaml\
    regularization.max_norm 1 net.prior.type "'window_around_median'"
