#!/usr/bin/env bash
# Beam-search decode with the reference's per-LM settings
# (exp/wsj/decode.sh:7-26): no-LM decodes use char_discount 0.1; LM
# decodes use char_discount 1.0, shallow-fusion weight 0.5,
# no_transition_cost 20 and the word vocabulary for char->word mapping.
#
# Usage: decode.sh <model.zip> <config.yaml> <part> <beam> [extra overrides...]
# Env:   LM=nolm|trigram|...   LM_PATH=dir with LG_pushed.npz + words.txt
set -euo pipefail
cd "$(dirname "$0")/../.."

MODEL=$1; CONFIG=$2; PART=$3; BEAM=$4; shift 4
LM=${LM:-nolm}
LM_PATH=${LM_PATH:-data/lms/wsj_trigram_no_bos}

OUT=$(dirname "$MODEL")/reports
mkdir -p "$OUT"

LM_CONF=(monitoring.search.beam_size "$BEAM")
if [ "$LM" == nolm ]; then
    LM_CONF+=(monitoring.search.char_discount 0.1)
else
    LM_CONF+=(monitoring.search.char_discount 1.0)
    LM_CONF+=(net.lm.weight 0.5 net.lm.no_transition_cost 20)
    LM_CONF+=(net.lm.path "$LM_PATH/LG_pushed.npz")
    LM_CONF+=(vocabulary "$LM_PATH/words.txt")
fi

python bin/run.py search --part "$PART" \
    --report "$OUT/${PART}_${LM}_${BEAM}" \
    --decoded-save "$OUT/${PART}_${LM}_${BEAM}_decoded.txt" \
    --params "$MODEL" "$CONFIG" \
    net.prior.before 10 "${LM_CONF[@]}" "$@"
echo "report: $OUT/${PART}_${LM}_${BEAM}"
