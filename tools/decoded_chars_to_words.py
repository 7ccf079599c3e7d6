#!/usr/bin/env python
"""Map decoded character strings back to words through a lexicon
(reference bin/decoded_chars_to_words.py): input lines are
``uttid c h a r s <spc> ...``; each ``<spc>``-separated character group
is replaced by the lexicon word that spells it (unknown spellings pass
through unchanged)."""
import argparse
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("lexicon")
    parser.add_argument("in_file", default="-", nargs="?")
    parser.add_argument("out_file", default="-", nargs="?")
    parser.add_argument("--spc", default="<spc>", help="the space token")
    args = parser.parse_args(argv)

    lexicon = {}
    with open(args.lexicon) as lf:
        for line in lf:
            parts = line.split()
            if not parts:
                continue
            word, chars = parts[0], parts[1:]
            if chars and chars[-1] == args.spc:
                chars = chars[:-1]
            lexicon["".join(chars)] = word

    in_f = sys.stdin if args.in_file == "-" else open(args.in_file)
    out_f = sys.stdout if args.out_file == "-" \
        else open(args.out_file, "w")
    try:
        for line in in_f:
            parts = line.split()
            if not parts:
                continue
            uttid = parts[0]
            spelled = "".join(parts[1:]).split(args.spc)
            words = [lexicon.get(s, s) for s in spelled if s]
            out_f.write(f"{uttid} {' '.join(words)}\n")
    finally:
        if in_f is not sys.stdin:
            in_f.close()
        if out_f is not sys.stdout:
            out_f.close()


if __name__ == "__main__":
    main()
