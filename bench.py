#!/usr/bin/env python
"""Throughput benchmark: decode (default + best config) and training.

Primary metric (BASELINE.json): WSJ eval92-shaped utterances/sec/chip
for encode + batched beam-10 decode in the BEST configuration — the
whole-loop Pallas decode kernel (``ops/pallas/beam_loop.py``), which
is also the default on TPU; target >=100x realtime per chip
(``vs_baseline`` = achieved realtime factor / 100).  ``detail``
additionally reports the pure-XLA ``lax.while_loop`` fallback decode
and a full training step (fwd+bwd+update) with an
XLA-cost-analysis-based MFU estimate, so every README performance
claim is reproduced by this artifact.

Synthetic eval92-shaped load: 8-second utterances (800 frames of
10 ms, 123-dim fbank+energy+delta features), WSJ-paper flagship model
(4x250 BiGRU encoder with 2x2 temporal subsampling, conv-attention
decoder with windowed prior, 32-char alphabet), beam 10, 100-step
decode cap (~12.5 chars/s speaking rate + margin).

Timing discipline: median of REPEATS runs (min/max reported) — the
shared dev chip drifts run-to-run, and a median is an honest central
estimate where best-of-N is not.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

import numpy as np

BATCH = 64
FRAMES = 800            # 8 s per utterance at 10 ms hop
FRAME_S = 0.01
BEAM = 10
LABELS = 100            # ~12.5 chars/s teacher-forced transcript
TRAIN_BATCH = 32
REPEATS = 7

# Peak matmul throughput used for the MFU denominator.  TPU v5e:
# 197 TFLOP/s bf16 (f32 matmuls on TPU run through the MXU in bf16
# passes, so the same peak is the right roofline for this model).
PEAK_FLOPS = float(os.environ.get("LVSR_PEAK_FLOPS", 197e12))


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


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


def _recognizer(use_pallas, lm_path=None, lm_csr=False):
    from __graft_entry__ import FLAGSHIP_NET
    from attention_lvcsr_tpu.models.recognizer import SpeechRecognizer
    net_config = dict(FLAGSHIP_NET)
    net_config["max_decoded_length_scale"] = 8.0
    net_config["use_pallas"] = use_pallas
    if lm_path:
        # the reference's WER-parity decode configuration:
        # exp/wsj/decode.sh:7-26 — trigram LM, weight 0.5,
        # no_transition_cost 20 (char_discount 1.0 goes to the search)
        net_config["lm"] = {"path": lm_path, "weight": 0.5,
                            "no_transition_cost": 20.0}
    return SpeechRecognizer(net_config, init_config={
        "/recognizer": {"weights_init": ["isotropic_gaussian", 0.1],
                        "biases_init": ["constant", 0.0],
                        "rec_weights_init": ["orthogonal"]}})


def _bench_lm_npz(csr=False):
    """Build (once, cached on disk) a WSJ-shaped character trigram LM
    over the flagship 32-symbol alphabet and pack it for the device.

    The dense pack (~1k states: every char bigram history, as a real
    char-trigram automaton has) feeds the in-kernel fusion; ``csr=True``
    packs the same graph into the CSR layout to time the
    production-size-graph lookup path (ops/fst.py:PackedFstCSR)."""
    from attention_lvcsr_tpu.ops import fst as F
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_cache")
    os.makedirs(cache, exist_ok=True)
    path = os.path.join(cache, f"lm_trigram_{'csr' if csr else 'dense'}.npz")
    if os.path.exists(path):
        return path
    rng = np.random.RandomState(11)
    nchars = 31                      # nn ids 0..30; 31 = <eol>
    toks = [f"c{i}" for i in range(nchars)] + ["E"]
    uni = {("<s>",): (-99.0, -0.4), ("</s>",): (-1.5, 0.0)}
    for t in toks:
        uni[(t,)] = (float(-1.2 - rng.rand()), -0.5)
    bi, tri = {}, {}
    for a in toks:
        for b in toks:
            bi[(a, b)] = (float(-0.8 - rng.rand()), -0.3)
    for a in toks:
        for b in toks:
            # a sparse third order (3 continuations per bigram)
            for c in rng.choice(len(toks), size=3, replace=False):
                tri[(a, b, toks[c])] = (float(-0.5 - rng.rand()), 0.0)
    arpa = {1: uni, 2: bi, 3: tri}
    syms = {t: i + 1 for i, t in enumerate(toks)}
    fst = F.arpa_to_fst(arpa, syms)
    remap = {i: i + 1 for i in range(len(toks))}   # nn id i -> label i+1
    packer = F.pack_fst_csr if csr else F.pack_fst
    packed = packer(fst, remap, num_nn_symbols=32,
                    no_transition_cost=20.0)
    F.save_packed(path, packed)
    _log(f"built bench LM: {fst.num_states} states -> {path}")
    return path


def _bench_biggraph_npz():
    """Build (once, disk-cached) a production-scale (>=1e5 states)
    character decoding graph over the flagship 32-symbol alphabet: a
    25k-word character-trie lexicon LM with unigram word costs (the
    reference's ``arpa_lm_to_dict_lm`` + character-lexicon pipeline,
    ``bin/arpa_lm_to_dict_lm.py``), word ends looping to the root via
    ``<spc>`` and accepting ``<eol>``.  Packs CSR (S*V is ~30x past the
    dense cell budget) — this row times the CSR windowed-lookup decode
    at the graph size the reference's LG_pushed actually has."""
    from attention_lvcsr_tpu.ops import fst as F
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_cache")
    os.makedirs(cache, exist_ok=True)
    path = os.path.join(cache, "lm_biggraph_csr.npz")
    if os.path.exists(path):
        return path
    rng = np.random.RandomState(17)
    # fst labels: 'a'..'z' -> 1..26 spell words, <spc> -> 27, <eol> -> 32
    char_syms = {chr(97 + i): i + 1 for i in range(26)}
    char_syms["<spc>"] = 27
    eol_lab = 32
    words = set()
    while len(words) < 25000:
        n = int(rng.randint(4, 11))
        words.add("".join(chr(97 + rng.randint(26)) for _ in range(n)))
    words = sorted(words)
    weights = {w: float(2.0 + 6.0 * rng.rand()) for w in words}
    fst = F.dict_char_lm_fst(words, char_syms, weights=weights)
    # allow <eol> wherever <spc> is allowed: E-labeled arcs to the root
    # (the eol_to_spc adapter role, exp/wsj/make_lm_graph.sh)
    for s in list(fst.arcs):
        for a in list(fst.state_arcs(s)):
            if a.ilabel == char_syms["<spc>"]:
                fst.add_arc(s, eol_lab, eol_lab, a.weight, a.nextstate)
    # nn ids 0..26 -> labels 1..27; nn id 31 (<eol>) -> label 32
    remap = {i: i + 1 for i in range(27)}
    remap[31] = eol_lab
    packed = F.pack_fst_auto(fst, remap, num_nn_symbols=32,
                             no_transition_cost=20.0)
    F.save_packed(path, packed)
    _log(f"built biggraph LM: {fst.num_states} states, "
         f"{packed.keys.shape[0]} arc-keys -> {path}")
    assert fst.num_states >= 100_000, fst.num_states
    return path


COMPILE_BUDGET_S = 120.0


def bench_decode_lm(label, beam, use_pallas="auto", csr=False,
                    lm_npz=None, repeats=REPEATS):
    """The north-star operating point: encode + beam decode WITH trigram
    LM shallow fusion (BASELINE.json: utt/s at WER parity is defined at
    this configuration; exp/wsj/decode.sh beams 10..200).

    The first (compiling) call is timed against COMPILE_BUDGET_S — the
    round-3 in-kernel fusion path burned >10 min in Mosaic without
    finishing; a path whose compile exceeds the budget is flagged in the
    artifact rather than silently shipped."""
    _log(f"bench decode-lm[{label}]: beam={beam} csr={csr}")
    import jax
    import jax.numpy as jnp
    if callable(lm_npz):
        lm_npz = lm_npz()   # built inside the row's fault isolation
    rec = _recognizer(use_pallas,
                      lm_path=lm_npz or _bench_lm_npz(csr=csr))
    rec.init_beam_search(beam)
    mode = None
    if not csr and use_pallas == "auto":
        mode = rec._beam_search._loop_kernel_mode(num_frames=FRAMES)
        _log(f"  loop-kernel mode: {mode}")
    rng = np.random.RandomState(0)
    inputs = jax.device_put(jnp.asarray(
        rng.randn(BATCH, FRAMES, 123), jnp.float32))
    mask = jax.device_put(jnp.ones((BATCH, FRAMES), jnp.float32))
    jax.block_until_ready(inputs)
    t0 = time.time()
    out = rec.beam_search(inputs, mask, as_arrays=True,
                          char_discount=1.0)    # compile
    compile_s = time.time() - t0
    steps = int(out["steps"])
    finished = int(out["done_valid"].any(axis=1).sum())
    med, lo, hi = _timed(
        lambda: rec.beam_search(inputs, mask, as_arrays=True,
                                char_discount=1.0),
        repeats=repeats)
    result = {
        "utt_per_s": round(BATCH / med, 3),
        "realtime_factor": round(BATCH * FRAMES * FRAME_S / med, 1),
        "wall_s_median": round(med, 4),
        "wall_s_min": round(lo, 4), "wall_s_max": round(hi, 4),
        "decode_steps": steps, "beam": beam,
        "finished_utts": finished,
        "compile_s": round(compile_s, 1),
        "path": ("csr-xla" if csr
                 else ("loop-kernel" if mode else "dense-xla")),
    }
    if compile_s > COMPILE_BUDGET_S:
        result["compile_over_budget"] = True
    return result


def _timed(fn, repeats=REPEATS):
    times = []
    for _ in range(repeats):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    return (statistics.median(times), min(times), max(times))


def bench_decode(label, use_pallas, compute_dtype, no_loop_kernel=False,
                 batch=None):
    _log(f"bench decode[{label}]: use_pallas={use_pallas} "
         f"dtype={compute_dtype} no_loop_kernel={no_loop_kernel}")
    import jax
    import jax.numpy as jnp
    BATCH = batch or globals()["BATCH"]
    rec = _recognizer(use_pallas)
    rec.init_beam_search(BEAM, compute_dtype=compute_dtype)
    rng = np.random.RandomState(0)
    # Features are staged on device before timing: the training/serving
    # pipelines prefetch batches asynchronously, so steady-state decode
    # throughput excludes the host->device copy.  (On this tunneled dev
    # chip the synchronous copy of a 25 MB batch costs ~0.55 s — an
    # artifact of the tunnel, not of TPU DMA.)
    inputs = jax.device_put(jnp.asarray(
        rng.randn(BATCH, FRAMES, 123), jnp.float32))
    mask = jax.device_put(jnp.ones((BATCH, FRAMES), jnp.float32))
    jax.block_until_ready(inputs)
    prior_no_loop = os.environ.get("LVSR_NO_LOOP_KERNEL")
    if no_loop_kernel:
        os.environ["LVSR_NO_LOOP_KERNEL"] = "1"
    try:
        out = rec.beam_search(inputs, mask, as_arrays=True)  # compile
        steps = int(out["steps"])
        med, lo, hi = _timed(
            lambda: rec.beam_search(inputs, mask, as_arrays=True))
    finally:
        if prior_no_loop is None:
            os.environ.pop("LVSR_NO_LOOP_KERNEL", None)
        else:
            os.environ["LVSR_NO_LOOP_KERNEL"] = prior_no_loop
    rtf = BATCH * FRAMES * FRAME_S / med
    return {
        "utt_per_s": round(BATCH / med, 3),
        "realtime_factor": round(rtf, 1),
        "wall_s_median": round(med, 4),
        "wall_s_min": round(lo, 4), "wall_s_max": round(hi, 4),
        "decode_steps": steps,
        "use_pallas": use_pallas, "compute_dtype": compute_dtype or "f32",
        "loop_kernel": not no_loop_kernel, "batch": BATCH,
    }


def bench_train_breakdown(compute_dtype=None, batch=TRAIN_BATCH,
                          repeats=5):
    """Per-phase step-time breakdown at the flagship shape.

    Times (pipelined, 10 dispatches per sync) separately-jitted
    subgraphs; phase costs come from differences:
    encoder fwd+bwd, full-cost fwd+bwd (=> decoder+readout share), and
    the full step (=> optimizer + clipping share).
    """
    import jax
    import jax.numpy as jnp
    from attention_lvcsr_tpu.train.driver import make_train_step
    from attention_lvcsr_tpu.train.rules import build_optimizer

    rec = _recognizer("auto")
    net = rec.net
    training = {"gradient_threshold": 100.0, "rules": ["adadelta"]}
    if compute_dtype:
        training["compute_dtype"] = compute_dtype
    config = {"net": rec.net_config, "training": training,
              "regularization": {}}
    optimizer = build_optimizer(config["training"], {})
    step_fn = make_train_step(rec, optimizer, config,
                              eos_label=rec.net_config["eos_label"],
                              input_key="recordings")
    params = rec.params
    opt_state = optimizer.init(params)
    data = np.random.RandomState(0)
    inputs = jnp.asarray(data.randn(batch, FRAMES, 123), jnp.float32)
    inputs_mask = jnp.ones((batch, FRAMES), jnp.float32)
    labels = jnp.asarray(data.randint(0, 31, size=(batch, LABELS)),
                         jnp.int32)
    labels_mask = jnp.ones((batch, LABELS), jnp.float32)
    rng = jax.random.PRNGKey(0)

    def timed(fn, *args):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            for _ in range(10):
                out = fn(*args)
            np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
            times.append((time.perf_counter() - t0) / 10)
        return statistics.median(times)

    def enc_loss(p, x, m):
        encoded, _, _ = net.apply(p, x, m, method=net.encode)
        return jnp.sum(encoded * encoded)

    def cost_loss(p, x, m, y, ym):
        out = net.apply(p, x, m, y, ym, method=net.cost)
        return out["costs"].sum()

    enc_fwd = timed(jax.jit(enc_loss), params, inputs, inputs_mask)
    enc_fb = timed(jax.jit(jax.grad(enc_loss)), params, inputs,
                   inputs_mask)
    cost_fwd = timed(jax.jit(cost_loss), params, inputs, inputs_mask,
                     labels, labels_mask)
    cost_fb = timed(jax.jit(jax.grad(cost_loss)), params, inputs,
                    inputs_mask, labels, labels_mask)
    full = timed(jax.jit(step_fn), params, opt_state, rng, inputs,
                 inputs_mask, labels, labels_mask)
    return {
        "batch": batch,
        "encoder_fwd_ms": round(enc_fwd * 1e3, 2),
        "encoder_fwd_bwd_ms": round(enc_fb * 1e3, 2),
        "cost_fwd_ms": round(cost_fwd * 1e3, 2),
        "cost_fwd_bwd_ms": round(cost_fb * 1e3, 2),
        "full_step_ms": round(full * 1e3, 2),
        "decoder_share_ms": round((cost_fb - enc_fb) * 1e3, 2),
        "optimizer_share_ms": round((full - cost_fb) * 1e3, 2),
    }


def bench_train(compute_dtype=None, batch=TRAIN_BATCH):
    _log(f"bench train step dtype={compute_dtype or 'f32'} B={batch}")
    import jax
    import jax.numpy as jnp
    from attention_lvcsr_tpu.train.driver import make_train_step
    from attention_lvcsr_tpu.train.rules import build_optimizer

    rec = _recognizer("auto")
    training = {"gradient_threshold": 100.0, "rules": ["adadelta"]}
    if compute_dtype:
        training["compute_dtype"] = compute_dtype
    config = {"net": rec.net_config, "training": training,
              "regularization": {}}
    optimizer = build_optimizer(config["training"], {})
    step_fn = make_train_step(rec, optimizer, config,
                              eos_label=rec.net_config["eos_label"],
                              input_key="recordings")
    params = rec.params
    opt_state = optimizer.init(params)
    rng = jax.random.PRNGKey(0)
    data = np.random.RandomState(0)
    inputs = jnp.asarray(data.randn(batch, FRAMES, 123),
                         jnp.float32)
    inputs_mask = jnp.ones((batch, FRAMES), jnp.float32)
    labels = jnp.asarray(
        data.randint(0, 31, size=(batch, LABELS)), jnp.int32)
    labels_mask = jnp.ones((batch, LABELS), jnp.float32)

    jitted = jax.jit(step_fn, donate_argnums=(0, 1))
    args = (params, opt_state, rng, inputs, inputs_mask, labels,
            labels_mask)

    flops = None
    try:
        analysis = jax.jit(step_fn).lower(*args).compile().cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        flops = float(analysis.get("flops", 0.0)) or None
    except Exception as exc:                      # pragma: no cover
        _log(f"cost_analysis unavailable: {exc}")

    # warmup (also primes the donated-buffer path)
    params, opt_state, monitors = jitted(*args)
    float(monitors["train_cost"])

    times = []
    for _ in range(REPEATS):
        t0 = time.time()
        params, opt_state, monitors = jitted(
            params, opt_state, rng, inputs, inputs_mask, labels,
            labels_mask)
        # hard sync: pull the scalar to the host.  block_until_ready on
        # donated outputs has been observed to return early on the
        # tunneled axon platform; a D2H read cannot.
        float(monitors["train_cost"])
        times.append(time.time() - t0)
    med = statistics.median(times)

    # PIPELINED throughput: N steps enqueued, one sync — what the real
    # MainLoop achieves (monitor conversion is one step delayed,
    # train/loop.py), excluding the per-call dispatch round-trip.
    N = 20
    t0 = time.time()
    for _ in range(N):
        params, opt_state, monitors = jitted(
            params, opt_state, rng, inputs, inputs_mask, labels,
            labels_mask)
    float(monitors["train_cost"])
    pipelined_wall = (time.time() - t0) / N
    out = {
        "utt_per_s": round(batch / med, 3),
        "realtime_factor": round(
            batch * FRAMES * FRAME_S / med, 1),
        "wall_s_median": round(med, 4),
        "wall_s_min": round(min(times), 4),
        "wall_s_max": round(max(times), 4),
        "pipelined_utt_per_s": round(batch / pipelined_wall, 3),
        "pipelined_realtime_factor": round(
            batch * FRAMES * FRAME_S / pipelined_wall, 1),
        "pipelined_wall_s": round(pipelined_wall, 4),
        "batch": batch, "labels": LABELS,
    }
    if flops:
        achieved = flops / med
        out["step_tflops"] = round(flops / 1e12, 2)
        out["achieved_tflop_s"] = round(achieved / 1e12, 2)
        out["mfu_vs_197tflops_bf16"] = round(achieved / PEAK_FLOPS, 4)
        # the sustained (pipelined) rate is what the MainLoop achieves;
        # the per-call median above includes one dispatch round-trip
        out["mfu_pipelined"] = round(
            flops / pipelined_wall / PEAK_FLOPS, 4)
    return out


def bench_frontend(batch=16, seconds=8, repeats=REPEATS):
    """Fused Pallas log-mel+delta frontend vs the XLA composition.

    Serving was frontend-bound when features were computed on the host
    (README round-2: 30 utt/s through a 1-CPU frontend vs 301 utt/s
    chip decode capability); this row shows the on-device frontend's
    headroom.  Pipelined timing (10 dispatches per D2H pull) isolates
    compute from the tunnel's round-trip latency floor.
    """
    import jax

    from attention_lvcsr_tpu.data.features import (jax_add_deltas,
                                                   jax_fbank)
    from attention_lvcsr_tpu.ops.pallas.frontend import fbank_deltas_pallas

    rng = np.random.RandomState(0)
    N = 16000 * seconds
    wav = jax.device_put((0.1 * rng.randn(batch, N)).astype("float32"))
    nf = jax.device_put(np.full((batch,), 1 + (N - 400) // 160,
                                np.int32))

    def timed(fn, *args):
        np.asarray(fn(*args))                      # compile + settle
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            outs = [fn(*args) for _ in range(10)]
            np.asarray(outs[-1])
            times.append((time.perf_counter() - t0) / 10)
        return statistics.median(times)

    pallas_s = timed(jax.jit(
        lambda b, n: fbank_deltas_pallas(b, num_frames=n).sum()),
        wav, nf)
    xla_s = timed(jax.jit(lambda b: jax.vmap(
        lambda w: jax_add_deltas(jax_fbank(w)))(b).sum()), wav)
    audio_s = batch * seconds
    return {
        "pallas_ms_per_batch": round(pallas_s * 1e3, 2),
        "xla_ms_per_batch": round(xla_s * 1e3, 2),
        "batch": batch, "utt_seconds": seconds,
        "pallas_utt_per_s": round(batch / pallas_s, 1),
        "pallas_realtime_factor": round(audio_s / pallas_s, 1),
        "pallas_vs_xla": round(xla_s / pallas_s, 2),
    }


PARTIAL_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            ".bench_partial.json")
# the committed full-detail artifact (stdout carries only a compact
# summary line the driver's tail capture can always parse)
DETAIL_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_DETAIL.json")


def _wait_for_chip():
    """Probe the TPU backend in a SUBPROCESS with a timeout (a down
    tunnel hangs backend init for ~25 min, which would wedge the whole
    bench), retrying for up to LVSR_BENCH_WAIT seconds (default 45 min)
    so a transient outage at bench time still yields a real artifact."""
    import subprocess
    deadline = time.time() + float(os.environ.get("LVSR_BENCH_WAIT",
                                                  2700))
    while True:
        try:
            proc = subprocess.run(
                [sys.executable, "-c",
                 "import jax; d = jax.devices(); "
                 "print(d[0].platform, d[0].device_kind)"],
                capture_output=True, text=True, timeout=150)
            if proc.returncode == 0 and proc.stdout.strip():
                _log(f"chip probe OK: {proc.stdout.strip()}")
                return True
            _log(f"chip probe failed: {proc.stderr.strip()[-200:]}")
        except subprocess.TimeoutExpired:
            _log("chip probe timed out (tunnel down?)")
        if time.time() > deadline:
            return False
        _log("retrying chip probe in 120 s")
        time.sleep(120)


def main():
    if not _wait_for_chip():
        print(json.dumps({
            "metric": ("wsj-shaped utterances/sec/chip, encode + beam-10"
                       " decode (whole-loop Pallas decode kernel)"),
            "value": 0, "unit": "utt/s", "vs_baseline": 0,
            "error": ("TPU backend unavailable for the whole bench "
                      "window (tunnel down); see .bench_partial.json "
                      "of a prior run for the last real numbers"),
        }))
        return
    import jax
    _enable_compilation_cache()

    # Streamed partial results: each completed row lands in
    # .bench_partial.json immediately (in the final artifact's shape,
    # with the headline metric as soon as decode_best exists), so a
    # wedged compile or a driver timeout late in the run cannot zero
    # out the whole artifact.
    detail = {}

    def _headline_row():
        """The best decode operating point measured so far: the row key
        and row dict with the highest utt/s among the decode_best*
        candidates (the headline batch is whatever that row ran at)."""
        key, row = None, None
        for k in ("decode_best", "decode_best_b128",
                  "decode_best_b256"):
            r = detail.get(k)
            if (isinstance(r, dict)
                    and r.get("utt_per_s", 0) > (
                        row.get("utt_per_s", 0) if row else 0)):
                key, row = k, r
        return key, row

    def _flush_partial():
        partial = {"partial": True, "detail": detail}
        key, best = _headline_row()
        if best:
            partial.update({
                "metric": ("wsj-shaped utterances/sec/chip, encode + "
                           "beam-10 decode (whole-loop Pallas decode "
                           "kernel)"),
                "value": best["utt_per_s"],
                "unit": "utt/s",
                "vs_baseline": round(
                    best["realtime_factor"] / 100.0, 3),
                "headline_row": key,
            })
        with open(PARTIAL_PATH, "w") as f:
            json.dump(partial, f, indent=1)

    def done(key, fn, *args, **kwargs):
        """Row-level fault isolation (VERDICT r3 task 2): a crashing
        row records a compact error summary in its slot and the run
        continues — one poisoned kernel must never zero the artifact.
        Returns the row value (or the error dict)."""
        t0 = time.time()
        try:
            value = fn(*args, **kwargs)
        except BaseException as exc:              # incl. KeyboardInterrupt
            if isinstance(exc, (KeyboardInterrupt, SystemExit)):
                raise
            value = {"error": _summarize_error(exc),
                     "elapsed_s": round(time.time() - t0, 1)}
            _log(f"row {key} FAILED: {value['error']['class']}: "
                 f"{value['error']['message'][:200]}")
        detail[key] = value
        _flush_partial()
        return value

    done("decode_best", bench_decode,
         "best", use_pallas="auto", compute_dtype=None)
    done("decode_best_bf16", bench_decode,
         "best-bf16", use_pallas="auto", compute_dtype="bfloat16")
    # batch is a free throughput lever for offline decode: B=128 halves
    # the per-batch fixed costs (dispatch, tables) per utterance
    # (the sequential-chain floor amortizes, docs/DESIGN.md decode
    # roofline); the headline is whichever operating point wins
    done("decode_best_b128", bench_decode,
         "best-b128", use_pallas="auto", compute_dtype=None,
         batch=128)
    done("decode_best_b256", bench_decode,
         "best-b256", use_pallas="auto", compute_dtype=None,
         batch=256)
    done("decode_xla_fallback", bench_decode,
         "xla-fallback", use_pallas="never",
         compute_dtype=None, no_loop_kernel=True)
    done("frontend", bench_frontend)
    train = done("train_step", bench_train)
    done("train_step_bf16", bench_train, "bfloat16")

    # batch-scaling curve + per-phase breakdown: the MFU story
    # (VERDICT r2: is the small-RNN step latency- or compute-bound?)
    # Each batch point is its own fault-isolated row so one oversized
    # shape cannot take down the curve (the round-3 failure mode).
    def _curve_point(b, dtype=None):
        r = bench_train(compute_dtype=dtype, batch=b)
        return {k: r[k] for k in
                ("pipelined_utt_per_s", "wall_s_median",
                 "mfu_vs_197tflops_bf16", "mfu_pipelined") if k in r}

    train_curve = {}
    if isinstance(train, dict) and "error" not in train:
        train_curve["32"] = {k: train[k] for k in
                             ("pipelined_utt_per_s", "wall_s_median",
                              "mfu_vs_197tflops_bf16", "mfu_pipelined")
                             if k in train}
    for b in (64, 128, 256):
        train_curve[str(b)] = done(f"train_b{b}", _curve_point, b)
        detail.pop(f"train_b{b}", None)
    # bf16 at large batch: the MFU operating point (VERDICT r4 #6 —
    # bf16 had only ever been measured at B=32)
    for b in (128, 256):
        train_curve[f"{b}_bf16"] = done(
            f"train_b{b}_bf16", _curve_point, b, "bfloat16")
        detail.pop(f"train_b{b}_bf16", None)
    detail["train_batch_curve"] = train_curve
    _flush_partial()
    done("train_breakdown", bench_train_breakdown)
    # the north-star operating point: decode WITH the trigram LM
    # (BASELINE.json defines utt/s at WER parity at this config;
    # exp/wsj/decode.sh sweeps beams 10..200).  These rows involve the
    # largest compiles of the suite, so they run LAST (a compile
    # blowup must not cost the rows above) and honor LVSR_BENCH_NO_LM.
    if os.environ.get("LVSR_BENCH_NO_LM"):
        for key in ("decode_lm_beam10", "decode_lm_beam200",
                    "decode_lm_beam10_csr", "decode_lm_beam10_biggraph"):
            done(key, lambda: {"skipped": "LVSR_BENCH_NO_LM"})
    else:
        done("decode_lm_beam10", bench_decode_lm, "beam10", beam=10)
        done("decode_lm_beam200",
             bench_decode_lm, "beam200", beam=200, repeats=3)
        done("decode_lm_beam10_csr",
             bench_decode_lm, "beam10-csr", beam=10, csr=True)
        # production graph scale (VERDICT r4 #1): >=1e5-state character
        # decoding graph through the CSR windowed-lookup path
        done("decode_lm_beam10_biggraph",
             bench_decode_lm, "beam10-biggraph", beam=10, csr=True,
             lm_npz=_bench_biggraph_npz)

    # Full detail goes to a FILE (BENCH_DETAIL.json); stdout's final
    # line is a compact summary (<1500 chars) so the driver's bounded
    # tail capture always parses it (round-4 failure: the inline detail
    # overflowed the 2000-char tail and the official artifact recorded
    # parsed=null).
    key, best = _headline_row()
    env = {"batch": BATCH, "frames": FRAMES, "beam": BEAM,
           "platform": jax.devices()[0].platform,
           "device_kind": jax.devices()[0].device_kind}
    with open(DETAIL_PATH, "w") as f:
        json.dump({"detail": detail, "headline_row": key, **env}, f,
                  indent=1)
    rows = {}
    errors = []
    for k, v in detail.items():
        if not isinstance(v, dict):
            continue
        if "utt_per_s" in v:
            rows[k] = v["utt_per_s"]
        elif "pallas_utt_per_s" in v:
            rows[k] = v["pallas_utt_per_s"]
        elif "error" in v:
            errors.append(k)
    summary = {
        "metric": ("wsj-shaped utterances/sec/chip, encode + beam-10 "
                   "decode (whole-loop Pallas decode kernel)"),
        "value": best["utt_per_s"] if best else 0,
        "unit": "utt/s",
        "vs_baseline": (round(best["realtime_factor"] / 100.0, 3)
                        if best else 0),
        "detail": {
            "headline_row": key,
            "headline_batch": (best or {}).get("batch"),
            "rows_utt_per_s": rows,
            "failed_rows": errors,
            "detail_file": "BENCH_DETAIL.json",
            **env,
        },
    }
    line = json.dumps(summary)
    if len(line) > 1900:  # belt and braces: drop rows, keep headline
        summary["detail"] = {"headline_row": key,
                             "detail_file": "BENCH_DETAIL.json"}
        line = json.dumps(summary)
    print(line)


def _summarize_error(exc):
    """Compact, grep-friendly error record (ADVICE r3: the artifact
    must carry the failure class and the key resource lines, not a
    truncated raw traceback tail)."""
    import re
    msg = str(exc)
    key_lines = []
    for pat in (r".*RESOURCE_EXHAUSTED.*", r".*VMEM.*exceeds.*",
                r".*[Rr]equested.*[Mm]B.*", r".*Mosaic.*failed.*",
                r".*scoped vmem.*", r".*Attempting to allocate.*"):
        for m in re.finditer(pat, msg):
            line = m.group(0).strip()
            if line not in key_lines:
                key_lines.append(line)
        if len(key_lines) >= 6:
            break
    return {
        "class": type(exc).__name__,
        "message": msg.splitlines()[0][:500] if msg else "",
        "key_lines": key_lines[:6],
    }


if __name__ == "__main__":
    main()
