"""Worker process for the two-process distributed test.

Usage: _dist_worker.py <coordinator> <num_processes> <process_id> <outdir>

Each worker owns 2 virtual CPU devices (XLA_FLAGS set by the parent), so
2 workers form a 4-device 'data' mesh.  Each streams its own slice of
the global batch (`process_shard`), assembles the globally-sharded batch
(`local_batch_to_global`), and runs one sharded grad+SGD step; the
resulting (replicated) parameters are written out for the parent to
compare against a single-process run.
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")   # the env sitecustomize may
                                            # have pinned the TPU backend

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from attention_lvcsr_tpu.parallel import distributed, make_mesh, \
    shard_params  # noqa: E402


def main():
    coordinator, nproc, pid, outdir = sys.argv[1:5]
    assert distributed.initialize(coordinator, int(nproc), int(pid))
    assert jax.process_count() == int(nproc), jax.process_count()
    assert jax.device_count() == 2 * int(nproc), jax.device_count()

    mesh = make_mesh(jax.device_count())

    def loss(w, x):
        return jnp.sum((x @ w) ** 2)

    def train_step(w, x):
        g = jax.grad(loss)(w, x)
        return w - 0.01 * g, loss(w, x)

    x_global = np.random.RandomState(0).randn(8, 6).astype("float32")
    local = x_global[distributed.process_shard(len(x_global))]

    with mesh:
        w = shard_params({"w": jnp.ones((6, 3))}, mesh)["w"]
        (x,) = distributed.local_batch_to_global([local], mesh)
        new_w, cost = jax.jit(train_step)(w, x)

    np.save(f"{outdir}/w{pid}.npy",
            np.asarray(new_w.addressable_data(0)))
    np.save(f"{outdir}/cost{pid}.npy", np.asarray(cost.addressable_data(0)))
    print(f"worker {pid}: cost={float(cost.addressable_data(0)):.4f} OK")


if __name__ == "__main__":
    main()
