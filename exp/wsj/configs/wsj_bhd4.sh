#!/usr/bin/env bash
# Port of the reference job wrapper exp/wsj/configs/wsj_bhd4.bash
# (archival experiment lineage).  LVSR_TPU must point at the repo root.
set -e
python "$LVSR_TPU/bin/run.py"  train wsj_bhd4.zip "$LVSR_TPU"/exp/wsj/configs/wsj_bhd4.yaml training.num_epochs 1
python "$LVSR_TPU/bin/run.py" --params wsj_bhd4.zip train wsj_bhd4r.zip "$LVSR_TPU"/exp/wsj/configs/wsj_bhd4.yaml net.prior.type "'window_around_mean'"
