"""Worker for the 2-process multi-host test (spawned by test_multihost.py).

Exercises the real multi-host path end-to-end on CPU: the
``initialize_multihost`` bootstrap (parallel/mesh.py — the replacement for
the reference's mpirun process management, /root/reference/main.py:60-67),
per-host block reads through DataReader's make_array_from_callback path
(utils/io.py — replacing "every rank reads the whole file",
data_io.py:92-105), and one sharded MU step across processes.

Usage: python _multihost_worker.py <port> <process_id> <data_dir>
"""
import os
import sys

port, pid, data_dir = sys.argv[1], int(sys.argv[2]), sys.argv[3]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from pydnmfk_tpu.parallel.mesh import (GridContext, initialize_multihost,
                                       make_grid_mesh)  # noqa: E402
from pydnmfk_tpu.utils.io import DataReader  # noqa: E402
from pydnmfk_tpu.models.updates import mu_fro_step  # noqa: E402

initialize_multihost(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 2, jax.devices()

ctx = GridContext(make_grid_mesh(2, 1))

# per-host block read: the callback runs only for locally-addressable shards
reads = []
reader = DataReader(data_dir, "A", "npy", precision="float32")
A = reader.read(ctx)
assert A.shape == (16, 8)
assert len(A.addressable_shards) == 1           # one local device
assert A.addressable_shards[0].data.shape == (8, 8)

# one sharded MU step across the two processes
m, n, k = 16, 8, 3
rng = np.random.default_rng(0)
W_h = rng.random((m, k)).astype(np.float32)
H_h = rng.random((k, n)).astype(np.float32)
W = jax.make_array_from_callback((m, k), ctx.sharding_W,
                                 lambda idx: W_h[idx])
H = jax.make_array_from_callback((k, n), ctx.sharding_H,
                                 lambda idx: H_h[idx])
eps = jnp.float32(1.19e-7)

W1, H1 = jax.jit(mu_fro_step)(A, W, H, eps)
got = float(jnp.sum(W1)) + float(jnp.sum(H1))

# serial reference on host (both processes hold the full inputs)
A_h = np.load(os.path.join(data_dir, "A.npy")).astype(np.float32)
HHT = H_h @ H_h.T
W_ref = W_h * (A_h @ H_h.T) / (W_h @ HHT + 1.19e-7)
WTW = W_ref.T @ W_ref
H_ref = H_h * (W_ref.T @ A_h) / (WTW @ H_h + 1.19e-7)
want = float(W_ref.sum() + H_ref.sum())
assert abs(got - want) < 1e-2 * abs(want), (got, want)

print(f"MULTIHOST_OK {pid}", flush=True)
