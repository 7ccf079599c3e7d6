#!/usr/bin/env bash
# Decode a task-loss-estimation (reward) model, with or without the
# trigram LM decoding graph (the reference exp/wsj/decode_tle.sh:
# lm weight 0.15 on LG_pushed, reports under <model>/reports/).
#
# Usage: LM=trigram LM_PATH=data/lms/wsj_trigram decode_tle.sh \
#            <model_dir> <part> <beam> [config.yaml]
set -uex
cd "$(dirname "$0")/../.."

MODEL=$1
PART=$2
BEAM_SIZE=$3
CONFIG=${4:-$MODEL/config.yaml}
LM=${LM:=nolm}
LM_PATH=${LM_PATH:=data/lms/wsj_trigram}

mkdir -p "$MODEL/reports"

LM_CONF=(monitoring.search.beam_size "$BEAM_SIZE")
if [ ! "$LM" == nolm ]; then
    LM_CONF+=(net.lm.weight 0.15)
    LM_CONF+=(net.lm.path "$LM_PATH/LG_pushed.npz")
    LM_CONF+=(vocabulary "$LM_PATH/words.txt")
fi

python bin/run.py search --part="$PART" \
    --report "$MODEL/reports/${PART}_${LM}_${BEAM_SIZE}" \
    --params "$MODEL/annealing_best_ll.zip" "$CONFIG" \
    "${LM_CONF[@]}"
