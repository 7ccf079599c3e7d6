"""Two-process distributed training test (CPU, 2 procs x 2 devices).

Exceeds the reference, whose Platoon sync layer shipped with zero
multi-node tests (SURVEY.md §2.5/§4): spawns two real processes wired by
``jax.distributed.initialize``, runs one sharded train step over a
4-device 'data' mesh, and asserts both processes produce parameters
identical to a single-process run on the full batch.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_grads_match_single(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "_dist_worker.py"),
             f"127.0.0.1:{port}", "2", str(pid), str(tmp_path)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    w0 = np.load(tmp_path / "w0.npy")
    w1 = np.load(tmp_path / "w1.npy")
    np.testing.assert_allclose(w0, w1, rtol=1e-6)

    # single-process oracle on the full batch
    import jax
    import jax.numpy as jnp
    x = np.random.RandomState(0).randn(8, 6).astype("float32")
    w = jnp.ones((6, 3))

    def loss(w, x):
        return jnp.sum((x @ w) ** 2)

    expected = w - 0.01 * jax.grad(loss)(w, jnp.asarray(x))
    np.testing.assert_allclose(w0, np.asarray(expected), rtol=1e-5)
    cost0 = np.load(tmp_path / "cost0.npy")
    np.testing.assert_allclose(cost0, float(loss(w, jnp.asarray(x))),
                               rtol=1e-5)
