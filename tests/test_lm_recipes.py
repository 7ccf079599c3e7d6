"""The make_all_wsj_graphs.sh umbrella recipe (reference
exp/wsj/make_all_wsj_graphs.sh): one trigram ARPA -> the whole decoding
graph family (trigram / unigram / weight-free dict / dict-from-text),
each a complete LG_pushed graph with packed device tables."""
import os
import subprocess
import sys

import numpy as np
import pytest

# the umbrella graph-family build shells out to make_all_wsj_graphs.sh
# (~45 s on 1 CPU); the pipeline itself is covered quick by test_fst_algo
pytestmark = pytest.mark.slow

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))

TOY_ARPA = """\\data\\
ngram 1=6
ngram 2=4

\\1-grams:
-1 <UNK> -0.2
-0.8 THE -0.3
-1.0 CAT -0.4
-1.2 SAT -0.2
-99 <s> -0.5
-0.9 </s>

\\2-grams:
-0.3 <s> THE
-0.5 THE CAT
-0.7 CAT SAT
-0.4 SAT </s>

\\end\\
"""

NET_CHARS = {"<spc>": 0, "<noise>": 1, "<eol>": 2,
             "A": 3, "C": 4, "E": 5, "H": 6, "S": 7, "T": 8}


@pytest.fixture(scope="module")
def family(tmp_path_factory):
    d = tmp_path_factory.mktemp("lm_family")
    (d / "lm.arpa").write_text(TOY_ARPA)
    (d / "net_chars.txt").write_text(
        "".join(f"{s} {i}\n" for s, i in NET_CHARS.items()))
    (d / "dev_text.txt").write_text("utt1 THE CAT\nutt2 CAT SAT\n")
    r = subprocess.run(
        ["bash", os.path.join(ROOT, "exp", "wsj",
                              "make_all_wsj_graphs.sh"),
         str(d / "lm.arpa"), str(d / "net_chars.txt"), str(d / "graphs"),
         "--dev-text", str(d / "dev_text.txt")],
        capture_output=True, text=True, timeout=300,
        env=dict(os.environ, JAX_PLATFORMS="cpu"))
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    return d / "graphs"


def test_family_builds_all_variants(family):
    for variant in ("wsj_trigram_no_bos", "wsj_unigram_no_bos",
                    "wsj_dict_no_bos", "wsj_dict_dev93_no_bos"):
        npz = family / variant / "LG_pushed.npz"
        assert npz.exists(), variant
        tables = np.load(npz)
        assert tables["next_state"].shape[1] == len(NET_CHARS)


def test_dict_variants_are_weight_free(family):
    for variant in ("wsj_dict_no_bos", "wsj_dict_dev93_no_bos"):
        r = subprocess.run(
            [sys.executable, os.path.join(ROOT, "tools", "lm_tools.py"),
             "check-zero", str(family / variant / "LG_pushed.fst.txt")],
            capture_output=True, text=True, timeout=60)
        assert r.returncode == 0
        assert "all weights are zero" in r.stdout


def test_dev_text_dictionary_covers_exactly_its_words(family):
    """The dev93-text graph accepts THE/CAT/SAT (the words of the
    transcript) and rejects out-of-dictionary strings."""
    from attention_lvcsr_tpu.ops import fst as F
    path = str(family / "wsj_dict_dev93_no_bos" / "LG_pushed.fst.txt")
    isyms = F.read_symbols(path + ".syms")
    fst = F.read_fst_text(path, isyms=isyms)

    def accepts(word):
        labels = [isyms[ch] for ch in word] + [isyms["<eol>"]]
        return fst.explain(labels, tropical=True) < 1e9

    assert accepts("THE") and accepts("CAT") and accepts("SAT")
    assert not accepts("TCA")
