#!/usr/bin/env python
"""Read TIMIT .PHN phone transcripts into flat files.

The ``exp/timit/read_phone60_transcripts.py`` role: walks
``<timit_dir>/{TRAIN,TEST}/*/*/*.PHN``, emits

* ``phones60_all`` — ``<speaker>_<utt> ph1 ph2 ...`` per line (sorted by
  uttid), one token per phone mark (the h#/sil marks included — folding
  to the 39-phone eval set happens at scoring time, see
  ``attention_lvcsr_tpu/data/h5.py`` TIMIT_FOLD);
* ``phones60.txt`` — ``<phone> <id>`` symbol table over the phones seen,
  sorted, with ``<eol>`` appended last (the reference's table layout).

Usage: read_phone_transcripts.py <timit_dir> <out_dir>
"""
import glob
import os
import sys


def read_transcripts(timit_dir):
    transcripts = {}
    phones = set()
    for tset in ("TRAIN", "TEST"):
        pattern = os.path.join(timit_dir, tset, "*", "*", "*.PHN")
        files = glob.glob(pattern) + glob.glob(pattern.lower())
        for path in files:
            parts = path.split(os.sep)
            speaker, utt = parts[-2], os.path.splitext(parts[-1])[0]
            uttid = f"{speaker}_{utt}"
            if uttid in transcripts:
                raise SystemExit(f"duplicate uttid {uttid} ({path})")
            seq = []
            with open(path) as f:
                for line in f:
                    fields = line.split()
                    if len(fields) < 3:
                        break
                    seq.append(fields[2])
            phones.update(seq)
            transcripts[uttid] = seq
    return transcripts, phones


def main():
    timit_dir, out_dir = sys.argv[1:3]
    transcripts, phones = read_transcripts(timit_dir)
    if not transcripts:
        raise SystemExit(f"no .PHN files under {timit_dir}")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "phones60_all"), "w") as f:
        for uttid in sorted(transcripts):
            f.write(f"{uttid} {' '.join(transcripts[uttid])}\n")
    with open(os.path.join(out_dir, "phones60.txt"), "w") as f:
        for i, phone in enumerate(sorted(phones) + ["<eol>"]):
            f.write(f"{phone} {i}\n")
    print(f"{len(transcripts)} transcripts, {len(phones)} phones "
          f"-> {out_dir}/phones60_all, phones60.txt")


if __name__ == "__main__":
    main()
