#!/usr/bin/env bash
# Build timit.h5 from the raw TIMIT distribution (the role of
# exp/timit/write_hdf_dataset.sh + read_phone60_transcripts.py, without
# Kaldi):
#   - phone transcripts read straight from the .PHN files
#   - 40-bin log-mel fbank + energy + delta/delta-delta features
#     (data/features.py = compute-fbank-feats --use-energy | add-deltas)
#   - split table for train / dev / test from uttid lists
#
# Inputs: $TIMIT_DIR points at the TIMIT tree (TRAIN/ TEST/);
#   $1 = output h5 (default timit.h5);
#   wav lists wav_{train,dev,test}.scp ("uttid path" lines) expected in
#   $TIMIT_LISTS (the standard Kaldi split: 462-speaker train, 50-speaker
#   dev, 24-speaker core test).
set -euo pipefail
cd "$(dirname "$0")/../.."
TIMIT_DIR=${TIMIT_DIR:?set TIMIT_DIR to the TIMIT distribution root}
TIMIT_LISTS=${TIMIT_LISTS:?set TIMIT_LISTS to the dir with wav_*.scp lists}
OUT=${1:-timit.h5}
WORK=$(mktemp -d)

python exp/timit/read_phone_transcripts.py "$TIMIT_DIR" "$WORK"

rm -f "$OUT"
cat "$TIMIT_LISTS"/wav_{train,dev,test}.scp | sort > "$WORK/all_wav.scp"
# transcripts restricted (and ordered) to the utterances in the lists
awk 'NR==FNR { want[$1]=1; next } ($1 in want)' \
    "$WORK/all_wav.scp" "$WORK/phones60_all" > "$WORK/phones60_used"

python tools/kaldi2hdf.py add-wavs "$OUT" "$WORK/all_wav.scp" \
    --source fbank_dd
python tools/kaldi2hdf.py add-text "$OUT" "$WORK/phones60_used" \
    --source phonemes --tokens --symbols "$WORK/phones60.txt"
python tools/kaldi2hdf.py split "$OUT" \
    train="$TIMIT_LISTS/wav_train.scp" \
    dev="$TIMIT_LISTS/wav_dev.scp" \
    test="$TIMIT_LISTS/wav_test.scp"
cp "$WORK/phones60.txt" "${OUT%.h5}_phones60.txt"
rm -rf "$WORK"
echo "wrote $OUT"
