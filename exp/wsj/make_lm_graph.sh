#!/usr/bin/env bash
# Build character-level LM decoding graphs (the bin/lm2fst.sh +
# exp/wsj/make_all_wsj_graphs.sh role, OpenFST-free):
#   - trigram/bigram ARPA -> G.fst (text format + symbol table)
#   - unigram and weight-free dictionary variants
#   - dense device tables (.npz) for the on-device runtime
#
# Usage: make_lm_graph.sh <lm.arpa> <out_dir>
set -euo pipefail
cd "$(dirname "$0")/../.."
ARPA=$1; OUT=${2:-lm_graphs}
mkdir -p "$OUT"

python tools/lm_tools.py arpa2fst "$ARPA" "$OUT/G.fst.txt"
python tools/lm_tools.py arpa-to-unigram "$ARPA" "$OUT/unigram.arpa"
python tools/lm_tools.py arpa-to-dict "$ARPA" "$OUT/dict.arpa"
python tools/lm_tools.py create-lexicon "$ARPA"
mv -f lexicon.txt words.txt characters.txt "$OUT/"
python tools/lm_tools.py pack "$OUT/G.fst.txt" "$OUT/G.packed.npz"
echo "graphs in $OUT"

# Full character decoding graph (create_character_decoding_graph.sh role):
# L∘G -> determinize(log) -> rmsymbols -> rmeps -> minimize -> eol adapter
# -> minimize -> push -> LG_pushed(.npz).  Like the reference's
# lm2fst.sh default, the eol-adapter composition is NOT determinized
# (log-semiring determinization there can explode the state count; the
# decoder's FST state-set fusion handles nondeterminism).  Pass
# LVSR_DETERMINISTIC_LG=1 for the --deterministic variant, which also
# enables the ext-determinism check.
# Requires the network character table (dataset value_map) as $3.
NET_CHARS=${3:-}
if [ -n "$NET_CHARS" ]; then
  if [ -n "${LVSR_DETERMINISTIC_LG:-}" ]; then
    python tools/lm_tools.py build-lg --deterministic \
        "$ARPA" "$NET_CHARS" "$OUT"
    python tools/lm_tools.py check-deterministic "$OUT/LG.fst.txt"
  else
    python tools/lm_tools.py build-lg "$ARPA" "$NET_CHARS" "$OUT"
  fi
  echo "decoding graph (LG_pushed + npz) in $OUT"
fi
