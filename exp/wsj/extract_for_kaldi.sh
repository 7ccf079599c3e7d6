#!/usr/bin/env bash
# Extract "uttid transcript" lines from a search report for scoring with
# Kaldi's compute-wer (or tools/score.py).  Transcript sanitization rules
# from the Kaldi WSJ s5 recipe (the reference exp/wsj/extract_for_kaldi.sh).
#
# Usage: extract_for_kaldi.sh <report.txt>

paste -d ' '\
 <( grep Utterance "$1" | sed 's/.*(\(.*\))/\1/' )\
 <( grep 'Recognized:' "$1" | sed 's/Recognized: \(.*\)/\1/' )\
 | sed 's/<noise>/<NOISE>/g'\
 | sed 's/\<QUOTE\>/"QUOTE/g'\
 | sed 's/\<END-QUOTE\>/"END-QUOTE/g'\
 | sed 's/\<UNQUOTE\>/"UNQUOTE/g'
