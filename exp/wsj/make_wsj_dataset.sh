#!/usr/bin/env bash
# Build wsj.h5 from WSJ audio + transcripts (the role of
# exp/wsj/write_hdf_dataset.sh, without Kaldi):
#   - log-mel fbank (40 bins + energy) with delta and delta-delta
#     features (data/features.py = compute-fbank-feats | add-deltas)
#   - character transcripts with <spc>/<noise>/<eol> conventions
#   - split table for train_si284 / test_dev93 / test_eval92
#
# Inputs expected in $WSJ_DIR: wav_{si284,dev93,eval92}.scp,
# text_{si284,dev93,eval92}, characters.txt (optional symbol table).
set -euo pipefail
cd "$(dirname "$0")/../.."
WSJ_DIR=${WSJ_DIR:?set WSJ_DIR to the prepared WSJ lists}
OUT=${1:-wsj.h5}

rm -f "$OUT"
cat "$WSJ_DIR"/wav_{si284,dev93,eval92}.scp > /tmp/all_wav.scp
cat "$WSJ_DIR"/text_{si284,dev93,eval92} > /tmp/all_text

python tools/kaldi2hdf.py add-wavs "$OUT" /tmp/all_wav.scp
python tools/kaldi2hdf.py add-text "$OUT" /tmp/all_text \
    ${WSJ_CHARS:+--symbols "$WSJ_CHARS"}
python tools/kaldi2hdf.py split "$OUT" \
    train_si284="$WSJ_DIR/wav_si284.scp" \
    test_dev93="$WSJ_DIR/wav_dev93.scp" \
    test_eval92="$WSJ_DIR/wav_eval92.scp"
echo "wrote $OUT"
