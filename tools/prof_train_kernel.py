"""On-chip sweep of the fused-GRU train step: (dtype, batch, chunk).

VERDICT r4 #6: train MFU was flat at single digits for three rounds and
bf16 had only ever been measured at B=32.  This instrument measures the
full train step (bench.bench_train: fwd+bwd+optimizer, per-call and
pipelined) across the three levers that plausibly move the
sequential-RNN roofline:

- compute dtype (f32 vs bf16 — with ops/pallas/common.mxu_dtype the
  bf16 path now keeps bf16 MXU operands inside the recurrence),
- batch size (wider per-step matmuls amortize the latency chain),
- LVSR_GRU_CHUNK (time steps per grid step: dispatch amortization vs
  in-kernel unroll size).

Each point runs in a SUBPROCESS so LVSR_GRU_CHUNK (read at module
import) takes effect and one oversized shape cannot kill the sweep.

Usage (real chip):  python tools/prof_train_kernel.py
Writes evidence/r05_train_sweep.json.
"""
import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_POINT_SNIPPET = """
import json, sys
import bench as bench_mod
bench_mod._enable_compilation_cache()
r = bench_mod.bench_train(compute_dtype={dtype!r} or None, batch={batch})
print("POINT_JSON:" + json.dumps(
    {{k: r[k] for k in ("wall_s_median", "pipelined_wall_s",
                        "pipelined_utt_per_s", "mfu_vs_197tflops_bf16",
                        "mfu_pipelined", "step_tflops") if k in r}}))
"""


def run_point(dtype, batch, chunk, timeout):
    env = dict(os.environ)
    env["LVSR_GRU_CHUNK"] = str(chunk)
    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             _POINT_SNIPPET.format(dtype=dtype or "", batch=batch)],
            cwd=ROOT, env=env, capture_output=True, text=True,
            timeout=timeout)
    except subprocess.TimeoutExpired:
        return {"error": f"timeout {timeout}s"}
    for line in proc.stdout.splitlines():
        if line.startswith("POINT_JSON:"):
            return json.loads(line[len("POINT_JSON:"):])
    tail = (proc.stderr or proc.stdout or "").strip().splitlines()
    return {"error": (tail[-1][:300] if tail
                      else f"rc={proc.returncode}, no output")}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="32,128,256")
    ap.add_argument("--chunks", default="8,16")
    ap.add_argument("--dtypes", default="f32,bfloat16")
    ap.add_argument("--timeout", type=int, default=1500,
                    help="per-point budget incl. cold compile")
    ap.add_argument("--out", default=os.path.join(
        ROOT, "evidence", "r05_train_sweep.json"))
    args = ap.parse_args()

    points = {}
    for dtype in args.dtypes.split(","):
        dt = None if dtype in ("f32", "") else dtype
        for chunk in (int(c) for c in args.chunks.split(",")):
            for batch in (int(b) for b in args.batches.split(",")):
                key = f"{dtype}_b{batch}_c{chunk}"
                points[key] = run_point(dt, batch, chunk, args.timeout)
                print(json.dumps({key: points[key]}), flush=True)
                with open(args.out, "w") as f:
                    json.dump({"points": points,
                               "note": "full train step fwd+bwd+opt; "
                                       "mfu_pipelined is the MainLoop-"
                                       "sustained rate"}, f, indent=1)

    best = max((v.get("mfu_pipelined", 0.0), k)
               for k, v in points.items())
    print(json.dumps({"best_point": best[1],
                      "best_mfu_pipelined": best[0]}))


if __name__ == "__main__":
    main()
