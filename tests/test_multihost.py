"""2-process multi-host execution test: jax.distributed bootstrap + per-host
DataReader block reads + one cross-process sharded MU step (VERDICT r1 item
8; reference analogue: mpirun process management, main.py:60-67)."""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_step(tmp_path):
    rng = np.random.default_rng(42)
    A = rng.random((16, 8)).astype(np.float32)
    np.save(tmp_path / "A.npy", A)
    from scipy.io import savemat
    savemat(tmp_path / "B.mat",
            {"X": rng.random((15, 8)).astype(np.float32)})
    # 'folder' fixture: A pre-split on a (2, 2) pgrid (reference layout)
    from pydnmfk_tpu.parallel.partition import partition_slices
    for r, sl in enumerate(partition_slices((2, 2), A.shape)):
        np.save(tmp_path / f"F{r}.npy", A[sl])
    # sparse CSR npz fixture
    from scipy import sparse as sp
    S = sp.random(16, 8, density=0.3, format="csr", random_state=3,
                  dtype=np.float64)
    sp.save_npz(tmp_path / "S.npz", S)

    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(pid), str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out:\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"MULTIHOST_OK {pid}" in out, out
    # both processes ran the FULL NMFk pipeline and agreed on nopt
    nopts = []
    for pid, out in enumerate(outs):
        line = [ln for ln in out.splitlines()
                if ln.startswith(f"NMFK_NOPT {pid} ")]
        assert line, out
        nopts.append(int(line[0].split()[-1]))
    assert nopts[0] == nopts[1], nopts
