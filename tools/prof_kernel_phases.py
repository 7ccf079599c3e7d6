"""Per-phase attribution INSIDE the beam-loop decode kernel step.

VERDICT r4 #7: ``tools/prof_decode.py`` splits encoder / table packing /
kernel but stops at "kernel+overhead"; this instrument attributes the
per-step cost of each phase *inside* the kernel (attention energies,
readout matvec, logits+LSE, top-k selection rounds, source gather, GRU
advance, done-set merge) by compiling variant kernels with one phase
replaced by a shape-preserving stand-in (``ops/pallas/beam_loop.ABLATE``)
and differencing steady-state step time against the full kernel.

Every variant runs with early exit DISABLED so each pays exactly
``max_len`` iterations — ablated kernels decode garbage, so their
stopping behavior would otherwise differ and corrupt the comparison.
The early-exit win itself is measured separately at the end (full
kernel, exit on vs off).

Usage (real chip):  python tools/prof_kernel_phases.py [--beam 10]
Writes evidence/r05_kernel_phases.json.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

PHASES = ("attention", "wa", "logits", "topk", "gather", "gru", "merge")


def _decode_once(rec, inputs, mask):
    return rec.beam_search(inputs, mask, as_arrays=True,
                           char_discount=1.0)


def _median_wall(fn, repeats):
    import jax
    walls = []
    for _ in range(repeats):
        t0 = time.time()
        jax.block_until_ready(jax.tree_util.tree_leaves(fn()))
        walls.append(time.time() - t0)
    walls.sort()
    return walls[len(walls) // 2]


def run(beam, repeats, out_path):
    import jax
    import bench as bench_mod
    from attention_lvcsr_tpu.ops.pallas import beam_loop

    bench_mod._enable_compilation_cache()
    rng = np.random.RandomState(0)
    inputs = jax.device_put(np.asarray(
        rng.randn(bench_mod.BATCH, bench_mod.FRAMES, 123), np.float32))
    mask = jax.device_put(np.ones(
        (bench_mod.BATCH, bench_mod.FRAMES), np.float32))
    jax.block_until_ready(inputs)

    prior_exit = os.environ.get("LVSR_BEAM_NO_EARLY_EXIT")
    rows = {}
    try:
        os.environ["LVSR_BEAM_NO_EARLY_EXIT"] = "1"
        for variant in ("full",) + PHASES:
            beam_loop.ABLATE = (frozenset()
                                if variant == "full"
                                else frozenset([variant]))
            beam_loop.beam_search_loop.clear_cache()
            rec = bench_mod._recognizer("auto")
            rec.init_beam_search(beam)
            t0 = time.time()
            out = _decode_once(rec, inputs, mask)   # compile + run
            compile_s = time.time() - t0
            steps = int(out["steps"])
            med = _median_wall(
                lambda r=rec: _decode_once(r, inputs, mask), repeats)
            rows[variant] = {
                "wall_s_median": round(med, 4),
                "compile_s": round(compile_s, 1),
                "steps": steps,
            }
            print(json.dumps({variant: rows[variant]}), flush=True)
    finally:
        beam_loop.ABLATE = frozenset()
        if prior_exit is None:
            os.environ.pop("LVSR_BEAM_NO_EARLY_EXIT", None)
        else:
            os.environ["LVSR_BEAM_NO_EARLY_EXIT"] = prior_exit

    # attribute: phase cost ~= full - ablated (same forced step count)
    full_w = rows["full"]["wall_s_median"]
    steps = max(1, rows["full"]["steps"])
    attribution = {}
    for p in PHASES:
        delta = full_w - rows[p]["wall_s_median"]
        attribution[p] = {
            "delta_ms_per_step": round(delta / steps * 1e3, 4),
            "share_of_step": round(delta / full_w, 3),
        }

    # the early-exit measurement: full kernel, exit on vs off
    beam_loop.beam_search_loop.clear_cache()
    rec = bench_mod._recognizer("auto")
    rec.init_beam_search(beam)
    _decode_once(rec, inputs, mask)                  # compile
    exit_on = _median_wall(
        lambda: _decode_once(rec, inputs, mask), repeats)

    result = {
        "operating_point": {
            "batch": bench_mod.BATCH, "frames": bench_mod.FRAMES,
            "beam": beam, "weights": "random (bench decode point)",
        },
        "forced_full_iterations": rows,
        "per_step_attribution_ms": attribution,
        "full_step_ms": round(full_w / steps * 1e3, 4),
        "early_exit": {
            "off_wall_s": full_w,
            "on_wall_s": round(exit_on, 4),
            "speedup": round(full_w / exit_on, 3),
        },
        "note": "ablated variants replace one phase with a shape-"
                "preserving stand-in at trace time; deltas under-count "
                "overlap-hidden phases and the stand-ins are not free, "
                "so shares are a ranking, not an exact decomposition",
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"early_exit": result["early_exit"],
                      "full_step_ms": result["full_step_ms"]}))
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--beam", type=int, default=10)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "evidence", "r05_kernel_phases.json"))
    args = ap.parse_args()
    run(args.beam, args.repeats, args.out)


if __name__ == "__main__":
    main()
