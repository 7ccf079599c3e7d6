#!/usr/bin/env bash
# Decode a WSJ model and score it (the exp/wsj/decode.sh + score.sh roles).
#
# Usage: decode_and_score.sh <model.zip> <config.yaml> <part> [beam] [extra overrides...]
#
# Reference settings carried over (exp/wsj/decode.sh:7-26): char_discount
# 0.1 without LM / 1.0 with LM, lm weight 0.5, no_transition_cost 20.
set -euo pipefail
cd "$(dirname "$0")/../.."

MODEL=$1; CONFIG=$2; PART=${3:-test}; BEAM=${4:-10}
shift $(( $# > 4 ? 4 : $# )) || true
OUT=$(dirname "$MODEL")/decode_${PART}_beam${BEAM}

mkdir -p "$OUT"
python bin/run.py search --params "$MODEL" --part "$PART" \
    --report "$OUT" --decoded-save "$OUT/decoded.txt" "$CONFIG" \
    monitoring.search.beam_size "$BEAM" "$@"

if [ -f "$OUT/../ref_${PART}.txt" ]; then
    python tools/score.py "$OUT/../ref_${PART}.txt" "$OUT/decoded.txt" \
        | tee "$OUT/wer.txt"
fi
echo "report: $OUT/report.txt"
