#!/usr/bin/env python
"""Phase attribution for the flagship batch decode (VERDICT r3 task 7).

Splits `decode_best`'s wall time into its three device programs —
encoder/context, dense-table extraction (cached across calls), and the
whole-loop Pallas beam kernel — then sweeps the kernel's utterance
grouping and beam width, and times the XLA `lax.while_loop` fallback at
the same operating point.  Every section flushes to --out as soon as it
completes, so a timeout still leaves a usable artifact.

Run on the chip (shapes match bench.py: B=64, F=800, beam 10):

    python tools/prof_decode.py --out evidence/r04_decode_phases.json
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import numpy as np

OUT = {"task": "decode phase attribution (bench.py decode_best shapes)"}


def flush(path):
    with open(path, "w") as f:
        json.dump(OUT, f, indent=1)


def timed(fn, n=7):
    import jax
    jax.block_until_ready(fn())                  # warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="evidence/r04_decode_phases.json")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--frames", type=int, default=800)
    ap.add_argument("--repeats", type=int, default=7)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("LVSR_COMPILE_CACHE",
                                     os.path.join(os.path.dirname(
                                         os.path.abspath(__file__)),
                                         os.pardir, ".jax_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from __graft_entry__ import FLAGSHIP_NET
    from attention_lvcsr_tpu.models.recognizer import SpeechRecognizer

    B, F = args.batch, args.frames
    OUT["batch"], OUT["frames"] = B, F
    net_config = dict(FLAGSHIP_NET)
    net_config["use_pallas"] = "auto"
    rec = SpeechRecognizer(net_config, init_config={
        "/recognizer": {"weights_init": ["isotropic_gaussian", 0.1],
                        "biases_init": ["constant", 0.0],
                        "rec_weights_init": ["orthogonal"]}})
    rec.init_beam_search(10)
    bs = rec._beam_search
    rng = np.random.RandomState(0)
    inputs = jax.device_put(jnp.asarray(rng.randn(B, F, 123), jnp.float32))
    mask = jax.device_put(jnp.ones((B, F), jnp.float32))
    jax.block_until_ready(inputs)

    # ---- full decode (the bench.py decode_best measurement) ----------
    full = timed(lambda: rec.beam_search(inputs, mask, as_arrays=True),
                 args.repeats)
    out = rec.beam_search(inputs, mask, as_arrays=True)
    OUT["full_decode_s"] = round(full, 4)
    OUT["utt_per_s"] = round(B / full, 1)
    OUT["steps"] = int(out["steps"])
    flush(args.out)

    # ---- phase 1: encoder + context preprocessing --------------------
    # the ctx jit is cached under ("loop_ctx", shape, dtype) after the
    # warm call above; timing it alone isolates the encoder share.
    # Both jits only exist on the loop-kernel path — on the XLA
    # fallback (e.g. LVSR_NO_LOOP_KERNEL preset) skip the phase split
    # with a note instead of KeyError'ing the whole profile.
    ctx_key = ("loop_ctx", inputs.shape, inputs.dtype)
    ctx_entry = bs._jitted.get(ctx_key)
    if ctx_entry is None:
        OUT["phase_split"] = ("skipped: XLA fallback path ran (no "
                              "loop_ctx jit); phases exist only on the "
                              "Pallas loop-kernel path")
        flush(args.out)
    else:
        ctx_fn = ctx_entry
        data = ctx_fn(rec.params, inputs, mask)
        OUT["encoder_ctx_s"] = round(
            timed(lambda: ctx_fn(rec.params, inputs, mask),
                  args.repeats), 4)
        L = int(data["attended"].shape[1])
        OUT["L"] = L
        flush(args.out)

        # ---- phase 2: dense weight tables (cached across calls) ------
        tab_fn = bs._jitted.get("loop_tables")
        if tab_fn is not None:
            OUT["tables_s"] = round(
                timed(lambda: tab_fn(rec.params, L,
                                     data["attended"].dtype),
                      args.repeats), 4)
        OUT["kernel_plus_overhead_s"] = round(
            OUT["full_decode_s"] - OUT["encoder_ctx_s"], 4)
        flush(args.out)

    # ---- kernel grouping sweep ---------------------------------------
    # LVSR_LOOP_GROUP overrides how many utterances share one grid row;
    # smaller groups parallelize across the grid but rerun the shared
    # tables more often (search/beam.py:321 _loop_group)
    groups = {}
    for g in (8, 16, 32, 64):
        os.environ["LVSR_LOOP_GROUP"] = str(g)
        try:
            bs2 = type(bs)(rec, 10)
            rec._beam_search = bs2
            t0 = time.perf_counter()
            rec.beam_search(inputs, mask, as_arrays=True)
            compile_s = time.perf_counter() - t0
            groups[str(g)] = {
                "full_s": round(timed(
                    lambda: rec.beam_search(inputs, mask, as_arrays=True),
                    args.repeats), 4),
                "first_call_s": round(compile_s, 1),
            }
        except Exception as exc:                  # pragma: no cover
            groups[str(g)] = {"error": str(exc)[:300]}
        finally:
            os.environ.pop("LVSR_LOOP_GROUP", None)
        OUT["group_sweep"] = groups
        flush(args.out)
    rec._beam_search = bs

    # ---- XLA while-loop fallback at the same operating point ---------
    prior_no_loop = os.environ.get("LVSR_NO_LOOP_KERNEL")
    os.environ["LVSR_NO_LOOP_KERNEL"] = "1"
    try:
        bs3 = type(bs)(rec, 10)
        rec._beam_search = bs3
        OUT["xla_fallback_s"] = round(timed(
            lambda: rec.beam_search(inputs, mask, as_arrays=True),
            args.repeats), 4)
    finally:
        # restore any pre-existing user value instead of clobbering it
        if prior_no_loop is None:
            os.environ.pop("LVSR_NO_LOOP_KERNEL", None)
        else:
            os.environ["LVSR_NO_LOOP_KERNEL"] = prior_no_loop
        rec._beam_search = bs
    flush(args.out)

    # ---- beam sweep (kernel path) ------------------------------------
    beams = {}
    for beam in (5, 10, 20):
        rec.init_beam_search(beam)
        beams[str(beam)] = round(timed(
            lambda: rec.beam_search(inputs, mask, as_arrays=True),
            args.repeats), 4)
        OUT["beam_sweep"] = beams
        flush(args.out)

    print(json.dumps(OUT, indent=1))


if __name__ == "__main__":
    main()
