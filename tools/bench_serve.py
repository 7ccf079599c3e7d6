#!/usr/bin/env python
"""Serving benchmark: latency + sustained throughput of the HTTP decode
endpoint (serve.py) on the flagship WSJ model — the artifact behind the
README serving numbers.

Measures, with binary .npy payloads (8-second utterances):
  * single-request p50 latency,
  * 8-concurrent burst wall time,
  * sustained throughput over 128 requests.

Run on the TPU host: ``python tools/bench_serve.py``.  First calls
compile (minutes, cached persistently).
"""
import io
import json
import os
import statistics
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(
    __file__)), os.pardir))

import numpy as np  # noqa: E402


def main():
    os.environ.setdefault(
        "LVSR_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     os.pardir, ".jax_cache"))
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["LVSR_COMPILE_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    from __graft_entry__ import FLAGSHIP_NET

    from attention_lvcsr_tpu.models.recognizer import SpeechRecognizer
    from attention_lvcsr_tpu.serve import Transcriber, make_server

    cfg = dict(FLAGSHIP_NET)
    cfg["max_decoded_length_scale"] = 8.0
    rec = SpeechRecognizer(cfg, init_config={
        "/recognizer": {"weights_init": ["isotropic_gaussian", 0.1],
                        "biases_init": ["constant", 0.0],
                        "rec_weights_init": ["orthogonal"]}})
    transcriber = Transcriber(rec, char_map={"<eol>": cfg["eos_label"]},
                              beam_size=10)
    srv = make_server(transcriber, port=0, max_batch=8,
                      batch_wait_ms=10, request_timeout=3000)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    host, port = srv.server_address

    rng = np.random.RandomState(0)
    buf = io.BytesIO()
    np.save(buf, rng.randn(800, 123).astype("f"))
    payload = buf.getvalue()

    def post():
        req = urllib.request.Request(
            f"http://{host}:{port}/decode", data=payload,
            headers={"Content-Type": "application/octet-stream"})
        t0 = time.time()
        with urllib.request.urlopen(req, timeout=3600) as resp:
            json.loads(resp.read())
        return time.time() - t0

    print("warming (first calls compile)...", file=sys.stderr,
          flush=True)
    post()
    lat = [post() for _ in range(10)]

    def burst(n):
        lats = []
        threads = [threading.Thread(
            target=lambda: lats.append(post())) for _ in range(n)]
        t0 = time.time()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        return time.time() - t0, lats

    burst(8)                                    # warm the B=8 bucket
    walls = [burst(8)[0] for _ in range(5)]

    n = 128
    sem = threading.Semaphore(24)

    def client():
        with sem:
            post()

    threads = [threading.Thread(target=client) for _ in range(n)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    sustained_wall = time.time() - t0

    print(json.dumps({
        "single_request_p50_ms": round(1e3 * statistics.median(lat), 1),
        "single_request_min_ms": round(1e3 * min(lat), 1),
        "burst8_wall_p50_ms": round(1e3 * statistics.median(walls), 1),
        "sustained_utt_per_s": round(n / sustained_wall, 2),
        "sustained_realtime_factor": round(n * 8 / sustained_wall, 1),
        "payload": "npy", "audio_seconds": 8, "max_batch": 8,
    }))


if __name__ == "__main__":
    main()
