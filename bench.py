#!/usr/bin/env python
"""Throughput benchmark: encode + batched beam-10 decode on one chip.

Metric (BASELINE.json): WSJ eval92-shaped utterances/sec/chip for
encode + beam-10 decode; target >=100x realtime per chip
(``vs_baseline`` = achieved realtime factor / 100).

Synthetic eval92-shaped load: 8-second utterances (800 frames of 10 ms,
123-dim fbank+energy+deltas features), WSJ-paper flagship model
(4x250 BiGRU encoder with 2x2 temporal subsampling, conv-attention
decoder, 32-char alphabet), batched on-device beam search with beam 10
and a 100-step decode cap (~12.5 chars/s speaking rate + margin,
max_decoded_length_scale=8).
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


def _enable_compilation_cache():
    """Persistent XLA compilation cache (the Theano compiledir role,
    config/theano.rc:4): repeated bench/driver runs skip the multi-minute
    first compile."""
    import jax
    cache_dir = os.environ.get(
        "LVSR_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass


def main():
    import jax
    import jax.numpy as jnp
    _enable_compilation_cache()
    from __graft_entry__ import FLAGSHIP_NET
    from attention_lvcsr_tpu.models.recognizer import SpeechRecognizer

    BATCH = 64
    FRAMES = 800           # 8 s per utterance at 10 ms hop
    FRAME_S = 0.01
    BEAM = 10
    REPEATS = 5            # take the best (shared dev chip drifts ~2x)

    net_config = dict(FLAGSHIP_NET)
    net_config["max_decoded_length_scale"] = 8.0

    rec = SpeechRecognizer(net_config, init_config={
        "/recognizer": {"weights_init": ["isotropic_gaussian", 0.1],
                        "biases_init": ["constant", 0.0],
                        "rec_weights_init": ["orthogonal"]}})
    # decode computes in bf16 (candidate ranking stays f32)
    rec.init_beam_search(BEAM, compute_dtype="bfloat16")

    rng = np.random.RandomState(0)
    inputs = rng.randn(BATCH, FRAMES, 123).astype("float32")
    inputs_mask = np.ones((BATCH, FRAMES), "float32")

    # warmup (compile)
    out = rec.beam_search(inputs, inputs_mask, as_arrays=True)
    steps = int(out["steps"])

    times = []
    for _ in range(REPEATS):
        t0 = time.time()
        out = rec.beam_search(inputs, inputs_mask, as_arrays=True)
        times.append(time.time() - t0)
    wall = min(times)

    audio_seconds = BATCH * FRAMES * FRAME_S
    utt_per_sec = BATCH / wall
    rtf = audio_seconds / wall

    print(json.dumps({
        "metric": "wsj-shaped utterances/sec/chip, encode + beam-10 decode",
        "value": round(utt_per_sec, 3),
        "unit": "utt/s",
        "vs_baseline": round(rtf / 100.0, 3),
        "detail": {
            "realtime_factor": round(rtf, 1),
            "batch": BATCH,
            "frames": FRAMES,
            "beam": BEAM,
            "decode_steps": steps,
            "wall_s": round(wall, 3),
            "platform": jax.devices()[0].platform,
        },
    }))


if __name__ == "__main__":
    main()
