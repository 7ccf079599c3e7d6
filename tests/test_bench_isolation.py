"""bench.py row fault isolation (VERDICT r3 task 2).

Round 3's artifact was zeroed by a single poisoned row (the B=64 train
batch-curve point VMEM-crashed and took the process down before any
JSON printed).  These tests inject a raise into one row and assert the
final JSON still prints with every other row populated and the error
recorded in the failed row's slot.
"""
import io
import json
import sys

import pytest


@pytest.fixture()
def bench(monkeypatch):
    sys.path.insert(0, ".")
    import bench as bench_mod

    monkeypatch.setattr(bench_mod, "_wait_for_chip", lambda: True)
    monkeypatch.setattr(bench_mod, "_enable_compilation_cache",
                        lambda: None)

    ok_decode = {"utt_per_s": 100.0, "realtime_factor": 800.0,
                 "wall_s_median": 0.64}
    ok_train = {"pipelined_utt_per_s": 50.0, "wall_s_median": 0.7,
                "mfu_vs_197tflops_bf16": 0.05}
    monkeypatch.setattr(bench_mod, "bench_decode",
                        lambda *a, **k: dict(ok_decode))
    monkeypatch.setattr(bench_mod, "bench_frontend",
                        lambda *a, **k: {"pallas_vs_xla": 1.3})
    monkeypatch.setattr(bench_mod, "bench_train",
                        lambda *a, **k: dict(ok_train))
    monkeypatch.setattr(bench_mod, "bench_train_breakdown",
                        lambda *a, **k: {"full_step_ms": 700.0})
    monkeypatch.setattr(bench_mod, "bench_decode_lm",
                        lambda *a, **k: dict(ok_decode, beam=k.get(
                            "beam", 10)))
    return bench_mod


def _run_main(bench_mod, capsys, tmp_path):
    """Run main(); return (compact stdout summary, full detail file).

    The compact final stdout line must stay under the driver's tail
    capture (VERDICT r4 missing #3); full rows live in DETAIL_PATH.
    """
    bench_mod.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert len(out) < 1900, "final stdout line must fit tail capture"
    with open(tmp_path / "detail.json") as f:
        detail = json.load(f)["detail"]
    return json.loads(out), detail


def test_failing_batch_curve_row_keeps_artifact(bench, monkeypatch,
                                                capsys, tmp_path):
    monkeypatch.setattr(bench, "PARTIAL_PATH",
                        str(tmp_path / "partial.json"))
    monkeypatch.setattr(bench, "DETAIL_PATH",
                        str(tmp_path / "detail.json"))

    real_train = bench.bench_train

    def train(compute_dtype=None, batch=32):
        if batch == 64:
            raise RuntimeError(
                "RESOURCE_EXHAUSTED: Attempting to allocate 179.31M "
                "in scoped vmem. That was not possible.")
        return real_train(compute_dtype, batch=batch)

    monkeypatch.setattr(bench, "bench_train", train)
    out, detail = _run_main(bench, capsys, tmp_path)
    assert out["value"] == 100.0, "headline survives a row failure"
    curve = detail["train_batch_curve"]
    assert "error" in curve["64"]
    assert curve["64"]["error"]["class"] == "RuntimeError"
    assert any("RESOURCE_EXHAUSTED" in line
               for line in curve["64"]["error"]["key_lines"])
    assert "pipelined_utt_per_s" in curve["128"], \
        "later batch points still run"
    assert detail["decode_lm_beam10"]["utt_per_s"] == 100.0, \
        "rows after the failure still run"
    assert out["detail"]["rows_utt_per_s"]["decode_lm_beam10"] == 100.0


def test_failing_headline_row_still_prints_json(bench, monkeypatch,
                                                capsys, tmp_path):
    monkeypatch.setattr(bench, "PARTIAL_PATH",
                        str(tmp_path / "partial.json"))
    monkeypatch.setattr(bench, "DETAIL_PATH",
                        str(tmp_path / "detail.json"))

    def boom(*a, **k):
        raise ValueError("Mosaic failed to compile")

    monkeypatch.setattr(bench, "bench_decode", boom)
    out, detail = _run_main(bench, capsys, tmp_path)
    assert out["value"] == 0
    assert detail["decode_best"]["error"]["class"] == "ValueError"
    assert detail["train_step"]["pipelined_utt_per_s"] == 50.0
    assert "decode_best" in out["detail"]["failed_rows"]


def test_summarize_error_extracts_key_lines(bench):
    exc = RuntimeError(
        "jaxlib.xla_extension.XlaRuntimeError: RESOURCE_EXHAUSTED: "
        "Ran out of memory\nAttempting to allocate 179.31M in scoped "
        "vmem. That was not possible.\nlots of allocation dump "
        "lines\n" + "x" * 10000)
    summary = bench._summarize_error(exc)
    assert summary["class"] == "RuntimeError"
    assert len(summary["message"]) <= 500
    assert any("179.31M" in line for line in summary["key_lines"])
