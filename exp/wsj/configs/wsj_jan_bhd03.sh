#!/usr/bin/env bash
# Port of the reference job wrapper exp/wsj/configs/wsj_jan_bhd03.bash
# (archival experiment lineage).  LVSR_TPU must point at the repo root.
set -e
# like bhd7 and bhd8, but with smaller initial weights and no normalization
python "$LVSR_TPU/bin/run.py"  train wsj_jan_bhd03.zip "$LVSR_TPU"/exp/wsj/configs/wsj_jan_bhd03.yaml training.num_epochs 3
python "$LVSR_TPU/bin/run.py" --params wsj_jan_bhd03.zip train wsj_jan_bhd03r.zip "$LVSR_TPU"/exp/wsj/configs/wsj_jan_bhd03.yaml\
    net.prior.type "'window_around_median'"
