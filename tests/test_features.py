"""Feature extraction tests: fbank/deltas numpy-vs-jax parity, converter."""
import os
import subprocess
import sys
import wave

import numpy as np
import pytest
from numpy.testing import assert_allclose

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))

from attention_lvcsr_tpu.data.features import (add_deltas, delta_coeffs,
                                               extract_features, fbank,
                                               jax_add_deltas, jax_fbank,
                                               mel_filterbank)


def test_mel_filterbank_properties():
    fb = mel_filterbank(40, 512, 16000)
    assert fb.shape == (40, 257)
    assert (fb >= 0).all()
    # every filter has support; peaks ordered by frequency
    peaks = fb.argmax(axis=1)
    assert (np.diff(peaks) > 0).all()


def test_fbank_shapes():
    rng = np.random.RandomState(0)
    wav = rng.randn(16000).astype("float32")  # 1 s
    feats = fbank(wav, use_energy=True)
    assert feats.shape == ((16000 - 400) // 160 + 1, 41)
    assert np.isfinite(feats).all()


def test_delta_coeffs_golden():
    # standard regression formula, window 2: [-2,-1,0,1,2]/10
    assert_allclose(delta_coeffs(2), np.array([-2, -1, 0, 1, 2]) / 10.0)


def test_add_deltas_linear_ramp():
    # a linear ramp has constant delta = slope, zero delta-delta (interior)
    T = 10
    feats = np.arange(T, dtype="float32")[:, None] * 2.0
    out = add_deltas(feats, order=2, window=2)
    assert out.shape == (T, 3)
    assert_allclose(out[3:-3, 1], 2.0, atol=1e-5)
    assert_allclose(out[4:-4, 2], 0.0, atol=1e-5)


def test_jax_matches_numpy():
    rng = np.random.RandomState(1)
    wav = rng.randn(8000).astype("float32")
    np_f = fbank(wav)
    jx_f = np.asarray(jax_fbank(wav))
    assert_allclose(jx_f, np_f, rtol=1e-3, atol=1e-3)

    feats = rng.randn(12, 5).astype("float32")
    assert_allclose(np.asarray(jax_add_deltas(feats)),
                    add_deltas(feats), rtol=1e-4, atol=1e-5)


def test_extract_features_dim():
    rng = np.random.RandomState(2)
    wav = rng.randn(16000).astype("float32")
    feats = extract_features(wav, num_bins=40, use_energy=True,
                             deltas_order=2)
    assert feats.shape[1] == 41 * 3  # fbank+energy, deltas, delta-deltas


def test_kaldi2hdf_roundtrip(tmp_path):
    import kaldi2hdf
    from attention_lvcsr_tpu.data.h5 import H5AudioDataset

    # synthesize wavs
    rng = np.random.RandomState(3)
    scp_lines = []
    for i in range(4):
        path = tmp_path / f"u{i}.wav"
        data = (rng.randn(8000 + 2000 * i) * 3000).astype("<i2")
        with wave.open(str(path), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(data.tobytes())
        scp_lines.append(f"utt{i} {path}")
    scp = tmp_path / "wav.scp"
    scp.write_text("\n".join(scp_lines) + "\n")

    texts = tmp_path / "text"
    texts.write_text("utt0 ab a\nutt1 b ab\nutt2 aa b\nutt3 ba ba\n")
    trainlist = tmp_path / "train.lst"
    trainlist.write_text("utt0\nutt1\nutt2\n")
    validlist = tmp_path / "valid.lst"
    validlist.write_text("utt3\n")

    h5_path = str(tmp_path / "data.h5")
    kaldi2hdf.main(["add-wavs", h5_path, str(scp)])
    kaldi2hdf.main(["add-text", h5_path, str(texts)])
    kaldi2hdf.main(["split", h5_path, f"train={trainlist}",
                    f"valid={validlist}"])

    ds = H5AudioDataset(h5_path, which_sets=("train",),
                        sources=("recordings", "labels"),
                        target_source="labels")
    assert ds.num_examples == 3
    rec, lab = ds.get_example(0)
    assert rec.shape[1] == 41 * 3
    assert ds.eos_label is not None
    assert set(ds.decode(lab)) <= {"a", "b", "<spc>"}
    assert ds.pretty_print(lab) == "ab a"


def test_dataset_surgery_and_text_tools(tmp_path, capsys):
    """read-symbols / read-text / add-label (reference kaldi2fuel
    read_symbols / read_raw_text, exp/wsj/add_bol.py) plus
    decoded_chars_to_words (bin/decoded_chars_to_words.py)."""
    import h5py
    import kaldi2hdf

    texts = tmp_path / "text"
    texts.write_text("utt0 ab a\nutt1 b ab\n")
    h5_path = str(tmp_path / "data.h5")
    kaldi2hdf.main(["add-text", h5_path, str(texts)])
    # read-symbols dumps the value_map
    syms = tmp_path / "chars.txt"
    kaldi2hdf.main(["read-symbols", h5_path, str(syms)])
    table = dict(line.split() for line in syms.read_text().splitlines())
    assert {"a", "b", "<spc>", "<eol>"} <= set(table)
    # read-text reconstructs the transcripts
    out = tmp_path / "raw.txt"
    kaldi2hdf.main(["read-text", h5_path, str(out)])
    assert out.read_text().splitlines() == ["utt0 ab a", "utt1 b ab"]
    # add-label appends a fresh symbol with the next free id
    kaldi2hdf.main(["add-label", h5_path, "<bol>"])
    with h5py.File(h5_path, "r") as h5:
        vm = h5["labels"].attrs["value_map"]
        got = {k.decode(): int(v) for k, v in zip(vm["key"], vm["val"])}
    assert got["<bol>"] == max(v for k, v in got.items()
                               if k != "<bol>") + 1
    with pytest.raises(SystemExit):
        kaldi2hdf.main(["add-label", h5_path, "<bol>"])

    # decoded_chars_to_words maps spelled-out decodes through a lexicon
    import decoded_chars_to_words
    lex = tmp_path / "lexicon.txt"
    lex.write_text("ALPHA a b <spc>\nBETA b a\n")
    dec = tmp_path / "decoded.txt"
    dec.write_text("utt0 a b <spc> b a\n")
    out2 = tmp_path / "words.txt"
    decoded_chars_to_words.main([str(lex), str(dec), str(out2)])
    assert out2.read_text() == "utt0 ALPHA BETA\n"


def test_print_config_tool(capsys):
    import print_config
    cfg = os.path.join(ROOT, "exp", "wsj", "configs", "wsj_paper.yaml")
    print_config.main([cfg, "{net[dim_dec]}"])
    assert capsys.readouterr().out.strip() == "250"
    print_config.main([cfg, "{net[dim_dec]}", "net.dim_dec", "300"])
    assert capsys.readouterr().out.strip() == "300"
