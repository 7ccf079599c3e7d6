#!/usr/bin/env bash
# Build the whole WSJ decoding-graph family from one trigram ARPA LM
# (the reference exp/wsj/make_all_wsj_graphs.sh role, OpenFST-free):
#
#   wsj_trigram_no_bos/   full trigram LG_pushed
#   wsj_trigram_with_bos/ same, graph accounts for the <bol> marker
#   wsj_unigram_no_bos/   unigram backoff of the LM
#   wsj_dict_no_bos/      weight-free dictionary graph (weights stripped)
#   wsj_dict_dev93_no_bos/ dictionary graph over the dev93 transcripts
#                          (needs --dev-text; create_graph_form_text.sh role)
#
# Usage: make_all_wsj_graphs.sh <lm.arpa> <net_chars.txt> <out_root>
#        [--dev-text raw_text.txt]
set -euo pipefail
cd "$(dirname "$0")/../.."

ARPA=$1; NET_CHARS=$2; ROOT=$3; shift 3
DEV_TEXT=""
while [ $# -gt 0 ]; do
  case "$1" in
    --dev-text) DEV_TEXT=$2; shift 2;;
    *) echo "unknown option $1" >&2; exit 1;;
  esac
done
build() {  # build <dir> <arpa> [extra build-lg flags...]
  local dir=$1 arpa=$2; shift 2
  mkdir -p "$dir"
  python tools/lm_tools.py build-lg "$arpa" "$NET_CHARS" "$dir" "$@"
}

mkdir -p "$ROOT"

build "$ROOT/wsj_trigram_no_bos" "$ARPA"
# the <bol>-aware graphs only make sense when the network alphabet has
# the marker (data.add_bos configs)
if grep -q "^<bol>" "$NET_CHARS"; then
  build "$ROOT/wsj_trigram_with_bos" "$ARPA" --use-bol
else
  echo "net chars have no <bol>: skipping the with_bos graphs"
fi

mkdir -p "$ROOT/wsj_unigram_no_bos"
python tools/lm_tools.py arpa-to-unigram "$ARPA" \
    "$ROOT/wsj_unigram_no_bos/lm_unigram.arpa"
build "$ROOT/wsj_unigram_no_bos" "$ROOT/wsj_unigram_no_bos/lm_unigram.arpa"

mkdir -p "$ROOT/wsj_dict_no_bos"
python tools/lm_tools.py arpa-to-dict "$ARPA" \
    "$ROOT/wsj_dict_no_bos/lm_dict.arpa"
build "$ROOT/wsj_dict_no_bos" "$ROOT/wsj_dict_no_bos/lm_dict.arpa"
# dictionary graphs are used weight-free (make_all_wsj_graphs.sh strips
# LG* weights for the dict variants)
for fst in LG.fst.txt LG_no_eol.fst.txt LG_pushed.fst.txt; do
  python tools/lm_tools.py strip-weights \
      "$ROOT/wsj_dict_no_bos/$fst" "$ROOT/wsj_dict_no_bos/$fst"
done
python tools/lm_tools.py pack --char-map "$NET_CHARS" \
    "$ROOT/wsj_dict_no_bos/LG_pushed.fst.txt" \
    "$ROOT/wsj_dict_no_bos/LG_pushed.npz"

if [ -n "$DEV_TEXT" ]; then
  d="$ROOT/wsj_dict_dev93_no_bos"
  mkdir -p "$d"
  python tools/lm_tools.py dict-lm-from-text "$DEV_TEXT" "$d/lm_dict.arpa"
  build "$d" "$d/lm_dict.arpa"
  for fst in LG.fst.txt LG_no_eol.fst.txt LG_pushed.fst.txt; do
    python tools/lm_tools.py strip-weights "$d/$fst" "$d/$fst"
  done
  python tools/lm_tools.py pack --char-map "$NET_CHARS" \
      "$d/LG_pushed.fst.txt" "$d/LG_pushed.npz"
fi

echo "graph family in $ROOT"
