"""Production decode serving: HTTP endpoint + micro-batching.

The reference has no serving story (decoding is the offline
``run.py search`` driver, one utterance at a time); this module is the
TPU-framework's production path: requests are collected into
micro-batches so the chip always decodes utterances*beam as one batch
(the shape the on-device beam search is built for, ``search/beam.py``),
with shape bucketing keeping recompilation bounded
(``recognizer.beam_search`` pads to bucket shapes).

Protocol (JSON over HTTP, stdlib-only — the same dependency discipline
as the TCP data server ``data/server.py``):

* ``POST /decode`` body ``{"features": [[...frame...], ...]}`` — a
  (T, F) float feature matrix, or ``{"waveform": [...],
  "sample_rate": 16000}`` to run the native log-mel fbank+delta
  frontend (``data/features.py``) server-side.  Response:
  ``{"labels": [...], "transcript": "...", "cost": ...}``.
* ``GET /healthz`` — model/config info + request counters.

Batching: requests wait at most ``batch_wait_ms`` for companions, up to
``max_batch`` per decode.  Under load the wait never adds latency (the
batch fills first); idle, a request pays at most the wait window.
"""
from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional

import numpy as np


def _frontend_fn(bucket: int, sample_rate: int):
    """Jitted device frontend for one (bucket, rate) shape — cached."""
    import functools

    key = (bucket, sample_rate)
    fn = _frontend_fn._cache.get(key)
    if fn is None:
        import jax

        from attention_lvcsr_tpu.data.features import device_frontend
        fn = jax.jit(functools.partial(device_frontend,
                                       sample_rate=sample_rate))
        _frontend_fn._cache[key] = fn
    return fn


_frontend_fn._cache = {}


class Transcriber:
    """Recognizer + symbol table -> text results (batched)."""

    def __init__(self, recognizer, char_map: Optional[dict] = None,
                 normalization=None, beam_size: int = 10,
                 compute_dtype="default", search_kwargs=None):
        self.recognizer = recognizer
        self.recognizer.init_beam_search(beam_size,
                                         compute_dtype=compute_dtype)
        char_map = char_map or dict(recognizer.character_map or {})
        self.num2char = {v: k for k, v in char_map.items()}
        self.normalization = normalization
        self.search_kwargs = dict(search_kwargs or {})
        dims = recognizer.net_config.get("input_dims") or {}
        self.expected_dim = dims.get("recordings")

    def features_from_waveform(self, wav: np.ndarray,
                               sample_rate: int = 16000) -> np.ndarray:
        """On-device fused fbank+delta frontend, length-bucketed.

        Waveforms are zero-padded to power-of-two second buckets so the
        jit cache stays bounded; the true frame count rides along so the
        delta edge replication is exact at the utterance's real end, and
        the padded rows are sliced off before decoding.
        """
        frame_length = int(sample_rate * 25 / 1000)
        hop = int(sample_rate * 10 / 1000)
        n = len(wav)
        if n < frame_length:
            raise ValueError(
                f"waveform too short: {n} samples < one {frame_length}"
                f"-sample frame")
        t_real = 1 + (n - frame_length) // hop
        bucket = sample_rate
        while bucket < n:
            bucket *= 2
        padded = np.zeros((1, bucket), np.float32)
        padded[0, :n] = wav
        fn = _frontend_fn(bucket, sample_rate)
        out = fn(padded, np.asarray([t_real], np.int32))
        return np.asarray(out[0, :t_real])

    def _text(self, labels) -> str:
        eos = self.recognizer.eos_label
        chars = [self.num2char.get(int(l), "") for l in labels
                 if int(l) != eos]
        return "".join(" " if c == "<spc>" else c
                       for c in chars if not (c.startswith("<")
                                              and c != "<spc>")).strip()

    def transcribe_batch(self, features: List[np.ndarray]) -> List[dict]:
        """``features``: list of (T_i, F) float arrays -> result dicts."""
        if self.normalization is not None:
            features = [(np.asarray(f, np.float32)
                         - self.normalization.mean)
                        / self.normalization.std for f in features]
        B = len(features)
        T = max(f.shape[0] for f in features)
        F = features[0].shape[1]
        batch = np.zeros((B, T, F), np.float32)
        mask = np.zeros((B, T), np.float32)
        for i, f in enumerate(features):
            batch[i, :f.shape[0]] = f
            mask[i, :f.shape[0]] = 1.0
        out = self.recognizer.beam_search(batch, mask, as_arrays=True,
                                          **self.search_kwargs)
        results = []
        for i in range(B):
            valid = out["done_valid"][i]
            if not valid.any():
                results.append({"labels": [], "transcript": "",
                                "cost": None})
                continue
            adjusted = np.where(valid, out["done_adjusted"][i], np.inf)
            k = int(np.argmin(adjusted))
            labels = [int(x) for x in
                      out["done_out"][i, k, :out["done_len"][i, k]]]
            results.append({
                "labels": labels,
                "transcript": self._text(labels),
                "cost": float(out["done_cost"][i, k]),
            })
        return results


class _Batcher:
    """Collect concurrent requests into one decode call."""

    def __init__(self, transcriber: Transcriber, max_batch: int = 8,
                 batch_wait_ms: float = 20.0,
                 request_timeout: float = 600.0):
        self.transcriber = transcriber
        self.max_batch = max_batch
        self.batch_wait = batch_wait_ms / 1000.0
        # generous default: the FIRST decode of a shape bucket includes
        # an XLA compile that can take minutes
        self.request_timeout = request_timeout
        self._lock = threading.Lock()
        self._pending = []          # (features, event, result_box)
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._stop = False
        self._worker.start()

    def submit(self, features: np.ndarray, timeout: float = None):
        if timeout is None:
            timeout = self.request_timeout
        event = threading.Event()
        box: dict = {}
        entry = (features, event, box)
        with self._lock:
            self._pending.append(entry)
        if not event.wait(timeout):
            # shed the abandoned request if it is still queued —
            # otherwise overload deepens as the chip decodes batches
            # nobody will read
            with self._lock:
                try:
                    self._pending.remove(entry)
                except ValueError:
                    pass
            raise TimeoutError("decode timed out")
        if "error" in box:
            raise RuntimeError(box["error"])
        return box["result"]

    def _run(self):
        while not self._stop:
            with self._lock:
                have = len(self._pending)
            if not have:
                time.sleep(0.002)
                continue
            if have < self.max_batch:
                time.sleep(self.batch_wait)  # companion window
            with self._lock:
                # only feature-compatible requests batch together: one
                # client's odd feature dim must not poison the others
                group, rest = [], []
                feat_dim = None
                for entry in self._pending:
                    dim = entry[0].shape[1]
                    if feat_dim is None:
                        feat_dim = dim
                    if dim == feat_dim and len(group) < self.max_batch:
                        group.append(entry)
                    else:
                        rest.append(entry)
                self._pending = rest
            if not group:
                continue
            try:
                results = self.transcriber.transcribe_batch(
                    [g[0] for g in group])
                for (_, event, box), result in zip(group, results):
                    box["result"] = result
                    event.set()
            except Exception as exc:    # surface to every waiter
                for _, event, box in group:
                    box["error"] = f"{type(exc).__name__}: {exc}"
                    event.set()

    def close(self):
        self._stop = True


def make_server(transcriber: Transcriber, host: str = "127.0.0.1",
                port: int = 0, max_batch: int = 8,
                batch_wait_ms: float = 20.0,
                request_timeout: float = 600.0) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server; ``server.server_address``
    carries the bound port when ``port=0``."""
    batcher = _Batcher(transcriber, max_batch, batch_wait_ms,
                       request_timeout)
    stats = {"requests": 0, "errors": 0, "started": time.time()}

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):       # quiet
            pass

        def _reply(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path != "/healthz":
                return self._reply(404, {"error": "not found"})
            self._reply(200, {
                "status": "ok",
                "uptime_s": round(time.time() - stats["started"], 1),
                "requests": stats["requests"],
                "errors": stats["errors"],
                "beam_size": transcriber.recognizer.beam_size,
            })

        def do_POST(self):
            if self.path != "/decode":
                return self._reply(404, {"error": "not found"})
            stats["requests"] += 1
            try:
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length)
                ctype = self.headers.get("Content-Type", "")
                if "octet-stream" in ctype:
                    # binary .npy feature matrix — ~10x cheaper to parse
                    # than JSON for real feature payloads (a 2.5 MB
                    # 8-second utterance is CPU-bound in json.loads)
                    import io
                    feats = np.load(io.BytesIO(body),
                                    allow_pickle=False)
                    feats = np.asarray(feats, np.float32)
                    if feats.ndim != 2:
                        raise ValueError("npy payload must be (T, F)")
                    req = {"features": feats}
                else:
                    req = json.loads(body)
                if "features" in req:
                    feats = np.asarray(req["features"], np.float32)
                elif "waveform" in req:
                    # fused on-device frontend (Pallas fbank+deltas);
                    # the host numpy path remains in data/features.py
                    # for offline dataset conversion
                    feats = transcriber.features_from_waveform(
                        np.asarray(req["waveform"], np.float32),
                        sample_rate=int(req.get("sample_rate", 16000)))
                else:
                    raise ValueError(
                        "body needs 'features' or 'waveform'")
                if feats.ndim != 2:
                    raise ValueError("features must be (T, F)")
                expected = transcriber.expected_dim
                if expected is not None and feats.shape[1] != expected:
                    raise ValueError(
                        f"model expects {expected}-dim features, got "
                        f"{feats.shape[1]}")
            except Exception as exc:    # malformed request
                stats["errors"] += 1
                return self._reply(400, {"error":
                                         f"{type(exc).__name__}: {exc}"})
            try:
                result = batcher.submit(feats)
                self._reply(200, result)
            except Exception as exc:    # decode/server failure
                stats["errors"] += 1
                self._reply(500, {"error":
                                  f"{type(exc).__name__}: {exc}"})

    server = ThreadingHTTPServer((host, port), Handler)
    server.batcher = batcher
    return server


def serve(config, load_path, host="127.0.0.1", port=8000,
          beam_size=None, max_batch=8, batch_wait_ms=20.0):
    """CLI entry (run.py serve): build the model from config + params
    and serve forever."""
    from attention_lvcsr_tpu.data import Data
    from attention_lvcsr_tpu.train.driver import create_model
    data = Data(**config["data"])
    recognizer = create_model(config, data, load_path)
    search_conf = config.get("monitoring", {}).get("search", {})
    transcriber = Transcriber(
        recognizer,
        char_map=data.character_map("labels"),
        normalization=data.normalization,
        beam_size=beam_size or search_conf.get("beam_size", 10),
        search_kwargs={
            "char_discount": search_conf.get("char_discount", 0.0),
            "round_to_inf": search_conf.get("round_to_inf", 1e9),
            "stop_on": search_conf.get("stop_on", "patience"),
        })
    server = make_server(transcriber, host, port, max_batch,
                         batch_wait_ms)
    print(f"serving on http://{server.server_address[0]}:"
          f"{server.server_address[1]} (POST /decode, GET /healthz)")
    server.serve_forever()
