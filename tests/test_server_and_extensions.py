"""Data server / process prefetch / new extensions tests."""
import os
import time

import numpy as np
import pytest

from attention_lvcsr_tpu.data.server import (MultiProcessStream,
                                             ServerDataStream, start_server)
from attention_lvcsr_tpu.train.extensions import (FinishAfter, NanGuard,
                                                  Plot)
from attention_lvcsr_tpu.train.loop import MainLoop


def _batches():
    for i in range(5):
        yield {"x": np.full((2, 3), i, "float32"), "idx": i}


@pytest.mark.slow  # spawn-based TCP server roundtrip; test_multiprocess_stream keeps spawn coverage quick
def test_server_roundtrip():
    proc, port = start_server(_batches, epochs=1)
    try:
        got = list(ServerDataStream(port=port))
        assert len(got) == 5
        np.testing.assert_allclose(got[3]["x"], 3.0)
        assert got[3]["idx"] == 3
    finally:
        proc.terminate()


def test_multiprocess_stream():
    got = list(MultiProcessStream(_batches, depth=2))
    assert len(got) == 5
    np.testing.assert_allclose(got[-1]["x"], 4.0)


class _Algo:
    params = {}
    opt_state = None

    def __init__(self, costs):
        self.costs = list(costs)

    def process_batch(self, batch):
        return {"train_cost": self.costs.pop(0),
                "total_gradient_norm": 1.0}


def test_nan_guard_raises():
    # the guard sees monitors one batch late (delayed flush), so the
    # NaN from batch 2 aborts during batch 3
    loop = MainLoop(_Algo([1.0, float("nan"), 5.0]),
                    lambda: iter([{}, {}, {}]),
                    extensions=[NanGuard(), FinishAfter(after_n_epochs=1)])
    with pytest.raises(FloatingPointError):
        loop.run()


def test_plot_extension(tmp_path):
    path = str(tmp_path / "curves")
    loop = MainLoop(_Algo([3.0, 2.0, 1.0]),
                    lambda: iter([{}, {}, {}]),
                    extensions=[Plot(path, [["train_cost"]],
                                     every_n_batches=0, after_epoch=True),
                                FinishAfter(after_n_epochs=1)])
    loop.run()
    assert os.path.exists(path + ".json")
    assert os.path.exists(path + ".png")


def test_plot_server_serves_live_data():
    """PlotServer: HTML page + live channel JSON over HTTP during
    training (the bokeh-server live-plot role, dependency-free)."""
    import json
    import urllib.request

    from attention_lvcsr_tpu.train.extensions import (PlotServer,
                                                      TrainingExtension)

    server = PlotServer([["train_cost"]], port=0)
    fetched = {}

    class _Probe(TrainingExtension):
        def after_epoch(self):
            base = f"http://127.0.0.1:{server.port}"
            with urllib.request.urlopen(base + "/", timeout=10) as r:
                fetched["html"] = r.read().decode()
            with urllib.request.urlopen(base + "/data.json",
                                        timeout=10) as r:
                fetched["data"] = json.loads(r.read())
            try:
                urllib.request.urlopen(base + "/nope", timeout=10)
            except urllib.error.HTTPError as e:
                fetched["missing_status"] = e.code

    loop = MainLoop(_Algo([3.0, 2.0, 1.0]),
                    lambda: iter([{}, {}, {}]),
                    extensions=[server, _Probe(),
                                FinishAfter(after_n_epochs=1)])
    loop.run()
    assert "<canvas" in fetched["html"] or "canvas" in fetched["html"]
    series = fetched["data"][0]["train_cost"]
    assert [v for _, v in series] == [3.0, 2.0, 1.0]
    assert fetched["missing_status"] == 404
    assert server._httpd is None  # shut down after training


def test_server_child_crash_is_diagnosed():
    """A stream factory whose blob fails to DESERIALIZE in the spawned
    child (it dies before reporting its port -> pipe EOF) must surface
    a diagnostic RuntimeError, not a bare EOFError."""

    def _boom():
        raise RuntimeError("boom at unpickle")

    class ExplodesOnLoad:
        def __reduce__(self):
            return (_boom, ())

    with pytest.raises(RuntimeError, match="exited before reporting"):
        start_server(ExplodesOnLoad(), epochs=1)
