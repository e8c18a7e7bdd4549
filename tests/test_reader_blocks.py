"""Per-host block reads for every format and uneven shapes (VERDICT r2
item 4).  mat/csv go through a one-time .npy cache then block-read like
npy; uneven global shapes are zero-padded inside the block callbacks so no
host ever assembles the full matrix; the true dims thread to the models as
orig_shape.  Reference wart replaced: every rank reads the whole file
(/root/reference/pyDNMFk/data_io.py:92-105)."""
import os

import numpy as np
import pytest
from scipy.io import savemat

from pydnmfk_tpu.parallel.mesh import grid_context
from pydnmfk_tpu.utils.io import DataReader


@pytest.fixture
def cache_dir(tmp_path, monkeypatch):
    d = tmp_path / "cache"
    monkeypatch.setenv("PYDNMFK_CACHE_DIR", str(d))
    return d


def _write_mat(tmp_path, shape, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.random(shape).astype(np.float32)
    savemat(tmp_path / "M.mat", {"X": X})
    return X


def test_mat_cache_block_reads(tmp_path, cache_dir):
    X = _write_mat(tmp_path, (10, 6))
    r = DataReader(str(tmp_path), "M", "mat")
    blk = r._read_block(2, 7, 1, 5)
    np.testing.assert_allclose(blk, X[2:7, 1:5])
    # the conversion cache exists and is reused (mtime-validated)
    cached = [f for f in os.listdir(cache_dir) if f.endswith(".npy")]
    assert len(cached) == 1
    assert r._global_shape() == (10, 6)


def test_uneven_mat_pad_to_mesh_no_full_read(tmp_path, cache_dir,
                                             monkeypatch):
    """Uneven (10, 6) on a (4, 2) mesh -> padded (12, 6) sharded array
    assembled purely from block reads; read_global is banned."""
    X = _write_mat(tmp_path, (10, 6))
    r = DataReader(str(tmp_path), "M", "mat")
    r._block_readable_path()        # build the cache before banning reads
    monkeypatch.setattr(
        DataReader, "read_global",
        lambda self: pytest.fail("read_global on the block path"))
    ctx = grid_context(4, 2)
    A = r.read(ctx, pad_to_mesh=True)
    assert A.shape == (12, 6)
    assert r.last_global_shape == (10, 6)
    want = np.zeros((12, 6), np.float32)
    want[:10] = X
    np.testing.assert_allclose(np.asarray(A), want)


def test_csv_block_reads(tmp_path, cache_dir):
    rng = np.random.default_rng(1)
    X = rng.random((9, 5)).astype(np.float32)
    np.savetxt(tmp_path / "C.csv", X, delimiter=",")
    r = DataReader(str(tmp_path), "C", "csv")
    blk = r._read_block(3, 8, 0, 4)
    np.testing.assert_allclose(blk, X[3:8, 0:4], rtol=1e-6)


def test_readonly_source_dir_uses_cache_not_source(cache_dir):
    """The cache never writes next to the source file — reading from a
    read-only data dir (e.g. the reference fixtures) must still block-read
    through the user cache."""
    src_dir = "/root/reference/data"
    if not os.path.exists(os.path.join(src_dir, "wtsi.mat")):
        pytest.skip("reference fixture unavailable")
    r = DataReader(src_dir, "wtsi", "mat")
    blk = r._read_block(10, 20, 0, 5)
    assert blk.shape == (10, 5)
    from scipy.io import loadmat
    X = loadmat(os.path.join(src_dir, "wtsi.mat"))["X"]
    np.testing.assert_allclose(blk, X[10:20, 0:5].astype(np.float32))
    assert not any(f.endswith(".cache.npy") for f in os.listdir(src_dir))


def test_unwritable_cache_warns_once(tmp_path, monkeypatch):
    """An unwritable cache dir silently degraded to one full-file parse per
    block read; now the first fallback warns, naming the dir and the fix
    (VERDICT r3 item 8)."""
    X = _write_mat(tmp_path, (10, 6))
    # a regular file as the cache dir's parent: makedirs raises for any
    # user (chmod-based unwritability is invisible to root)
    blocker = tmp_path / "blocker"
    blocker.write_text("")
    monkeypatch.setenv("PYDNMFK_CACHE_DIR", str(blocker / "cache"))
    r = DataReader(str(tmp_path), "M", "mat")
    with pytest.warns(UserWarning, match="not writable"):
        blk = r._read_block(2, 7, 1, 5)
    np.testing.assert_allclose(blk, X[2:7, 1:5])
    # still correct, and the warning fires only once per reader
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        blk2 = r._read_block(0, 3, 0, 2)
    np.testing.assert_allclose(blk2, X[0:3, 0:2])


def test_prepadded_input_matches_host_array_path(tmp_path, cache_dir):
    """A pre-padded sharded read (pad_to_mesh) must give the SAME result
    as handing NMF the host array: rand init draws at the true dims, so
    the PRNG streams agree."""
    from pydnmfk_tpu.config import NMFConfig
    from pydnmfk_tpu.models.nmf import NMF

    X = _write_mat(tmp_path, (10, 6), seed=4)
    ctx = grid_context(4, 2)
    r = DataReader(str(tmp_path), "M", "mat")
    A_pad = r.read(ctx, pad_to_mesh=True)
    assert A_pad.shape == (12, 6)
    cfg = NMFConfig(k=2, grid=(4, 2), norm="fro", method="mu", itr=50,
                    seed=11)
    W1, H1, e1 = NMF(cfg).fit(A_pad, orig_shape=r.last_global_shape)
    W2, H2, e2 = NMF(cfg).fit(X)
    assert float(e1) == float(e2)
    np.testing.assert_array_equal(np.asarray(W1), np.asarray(W2))
    np.testing.assert_array_equal(np.asarray(H1), np.asarray(H2))


def test_runner_uneven_mat_orig_shape_threading(tmp_path, cache_dir):
    """End-to-end: Runner on an uneven mat over a (4, 2) mesh returns
    factors at the TRUE dims and the same reconstruction error as the
    single-device run (orig_shape threading through NMF.fit)."""
    from pydnmfk_tpu.runner import Runner

    rng = np.random.default_rng(3)
    X = (rng.random((30, 7)) @ np.eye(7)).astype(np.float32)
    savemat(tmp_path / "U.mat", {"X": X})

    kw = dict(fpath=str(tmp_path), ftype="mat", fname="U",
              results_path=str(tmp_path / "res"), k=3)
    r1 = Runner(process="pyDNMF", norm="fro", method="mu", itr=150,
                init="rand").run(grid=(1, 1), **kw)
    r2 = Runner(process="pyDNMF", norm="fro", method="mu", itr=150,
                init="rand").run(grid=(4, 2), **kw)
    assert r2["W"].shape == (30, 3) and r2["H"].shape == (3, 7)
    np.testing.assert_allclose(r1["err"], r2["err"], rtol=5e-2)
