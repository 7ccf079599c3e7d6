"""HTTP decode serving (serve.py): micro-batched endpoint over a tiny
recognizer, exercised with concurrent clients."""
import json
import threading
import urllib.request

import numpy as np
import pytest

from attention_lvcsr_tpu.models.recognizer import SpeechRecognizer
from attention_lvcsr_tpu.serve import Transcriber, make_server

EOS = 4
CHAR_MAP = {"a": 0, "b": 1, "c": 2, "<spc>": 3, "<eol>": EOS}

NET_CONFIG = dict(
    input_dims={"recordings": 6}, input_num_chars={}, eos_label=EOS,
    num_phonemes=5, dim_dec=8, dims_bidir=[7], enc_transition="gru",
    dec_transition="gru", attention_type="content_and_conv", conv_n=1,
    use_states_for_readout=False,
    criterion={"name": "log_likelihood"},
    bottom={"bottom_class": "speech"}, subsample=[1],
    post_merge_dims=[10], max_decoded_length_scale=1.0,
    data_prepend_eos=False, character_map=CHAR_MAP)


@pytest.fixture(scope="module")
def server():
    rec = SpeechRecognizer(NET_CONFIG, init_config={
        "/recognizer": {"weights_init": ["isotropic_gaussian", 0.5],
                        "biases_init": ["constant", 0.0],
                        "rec_weights_init": ["orthogonal"]}}, seed=7)
    p = rec.params["params"]["generator"]["readout"]["post_merge_0"]
    p["bias"] = p["bias"].at[EOS].add(1.5)
    transcriber = Transcriber(rec, beam_size=3,
                              search_kwargs={"char_discount": 0.1})
    srv = make_server(transcriber, port=0, max_batch=4, batch_wait_ms=30)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield srv, transcriber
    srv.batcher.close()
    srv.shutdown()


def _post(srv, payload):
    host, port = srv.server_address
    req = urllib.request.Request(
        f"http://{host}:{port}/decode",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as resp:
        return resp.status, json.loads(resp.read())


def test_decode_endpoint_matches_direct(server):
    srv, transcriber = server
    rng = np.random.RandomState(3)
    feats = rng.randn(16, 6).astype("float32")
    status, result = _post(srv, {"features": feats.tolist()})
    assert status == 200
    direct = transcriber.transcribe_batch([feats])[0]
    assert result["labels"] == direct["labels"]
    assert result["transcript"] == direct["transcript"]
    assert result["cost"] == pytest.approx(direct["cost"])
    # transcript is the spelled-out labels without specials
    spelled = "".join(" " if l == CHAR_MAP["<spc>"] else
                      "abc"[l] if l < 3 else ""
                      for l in result["labels"]).strip()
    assert result["transcript"] == spelled


def test_concurrent_requests_micro_batch(server):
    srv, _ = server
    rng = np.random.RandomState(5)
    results, errors = {}, []

    def client(i):
        try:
            feats = rng.randn(12 + i, 6).astype("float32")
            status, result = _post(srv, {"features": feats.tolist()})
            assert status == 200
            results[i] = result
        except Exception as exc:       # pragma: no cover
            errors.append(exc)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    assert not errors
    assert len(results) == 6
    assert all("labels" in r for r in results.values())


def test_healthz_and_errors(server):
    srv, _ = server
    host, port = srv.server_address
    with urllib.request.urlopen(f"http://{host}:{port}/healthz",
                                timeout=30) as resp:
        health = json.loads(resp.read())
    assert health["status"] == "ok" and health["beam_size"] == 3
    # malformed body -> 400 with an error message
    req = urllib.request.Request(
        f"http://{host}:{port}/decode", data=b'{"nope": 1}',
        headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False, "expected HTTPError"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "error" in json.loads(e.read())


def test_waveform_frontend(server):
    srv, _ = server
    # the tiny model expects 6-dim features; waveform frontend produces
    # 123-dim — the server must surface the mismatch as a clean error
    rng = np.random.RandomState(7)
    req = urllib.request.Request(
        f"http://{srv.server_address[0]}:{srv.server_address[1]}/decode",
        data=json.dumps({"waveform": rng.randn(4000).tolist(),
                         "sample_rate": 16000}).encode(),
        headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req, timeout=120)
        assert False, "expected HTTPError"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_mixed_feature_dims_rejected_cleanly(server):
    """A request with the wrong feature dim gets its own 400 and does
    not poison concurrently batched valid requests."""
    srv, _ = server
    rng = np.random.RandomState(11)
    results, codes = {}, {}

    def good(i):
        _, results[i] = _post(
            srv, {"features": rng.randn(14, 6).tolist()})

    def bad():
        try:
            _post(srv, {"features": rng.randn(14, 9).tolist()})
            codes["bad"] = 200
        except urllib.error.HTTPError as e:
            codes["bad"] = e.code

    threads = [threading.Thread(target=good, args=(i,)) for i in range(3)]
    threads.append(threading.Thread(target=bad))
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert codes["bad"] == 400
    assert len(results) == 3
    assert all("labels" in r for r in results.values())


def test_binary_npy_payload(server):
    """Binary .npy feature payloads decode identically to JSON (and are
    ~10x cheaper to parse)."""
    import io as _io
    srv, transcriber = server
    rng = np.random.RandomState(13)
    feats = rng.randn(15, 6).astype("float32")
    buf = _io.BytesIO()
    np.save(buf, feats)
    req = urllib.request.Request(
        f"http://{srv.server_address[0]}:{srv.server_address[1]}/decode",
        data=buf.getvalue(),
        headers={"Content-Type": "application/octet-stream"})
    with urllib.request.urlopen(req, timeout=120) as resp:
        result = json.loads(resp.read())
    direct = transcriber.transcribe_batch([feats])[0]
    assert result["labels"] == direct["labels"]
