"""bf16 decode path: runs and closely matches f32 results."""
import numpy as np
import pytest

from tests.test_beam_search import NET_CONFIG, EOS
from attention_lvcsr_tpu.models.recognizer import SpeechRecognizer


def test_bf16_beam_matches_f32():
    rec = SpeechRecognizer(dict(NET_CONFIG), init_config={
        "/recognizer": {"weights_init": ["isotropic_gaussian", 0.5],
                        "biases_init": ["constant", 0.0],
                        "rec_weights_init": ["orthogonal"]}}, seed=7)
    p = rec.params["params"]["generator"]["readout"]["post_merge_0"]
    p["bias"] = p["bias"].at[EOS].add(1.5)
    utt = np.random.RandomState(3).randn(16, 6).astype("float32")

    rec.init_beam_search(4, compute_dtype=None)
    out32, costs32 = rec.beam_search(utt)
    rec.init_beam_search(4, compute_dtype="bfloat16")
    out16, costs16 = rec.beam_search(utt)
    assert out16[0] == out32[0]
    assert abs(costs16[0] - costs32[0]) < 0.15
