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


def test_folder_mesh_block_reads(tmp_path):
    """'folder' chunks on a mesh are assembled from ONLY the overlapping
    chunk files per block (VERDICT r3 item 4) — no host-side reassembly of
    the full matrix; uneven shapes pad inside the callbacks."""
    from pydnmfk_tpu.parallel.partition import partition_slices

    rng = np.random.default_rng(2)
    X = rng.random((10, 6)).astype(np.float32)
    for r, sl in enumerate(partition_slices((2, 2), X.shape)):
        np.save(tmp_path / f"F{r}.npy", X[sl])

    r = DataReader(str(tmp_path), "F", "folder", pgrid=(2, 2))
    assert r._folder_shape() == (10, 6)
    # a block inside the top-left folder chunk touches only that file
    blk = r._read_block_folder(0, 3, 0, 2, (10, 6))
    np.testing.assert_allclose(blk, X[0:3, 0:2])
    assert r.folder_chunks_read == {0}
    # a block spanning the row split touches exactly the two row chunks
    r2 = DataReader(str(tmp_path), "F", "folder", pgrid=(2, 2))
    blk = r2._read_block_folder(3, 8, 0, 3, (10, 6))
    np.testing.assert_allclose(blk, X[3:8, 0:3])
    assert r2.folder_chunks_read == {0, 2}

    # full mesh read (uneven -> pad_to_mesh) equals the padded matrix and
    # never calls read_global
    r3 = DataReader(str(tmp_path), "F", "folder", pgrid=(2, 2))
    r3.read_global = lambda: pytest.fail("read_global on the folder path")
    ctx = grid_context(4, 2)
    A = r3.read(ctx, pad_to_mesh=True)
    assert A.shape == (12, 6) and r3.last_global_shape == (10, 6)
    want = np.zeros((12, 6), np.float32)
    want[:10] = X
    np.testing.assert_allclose(np.asarray(A), want)


def test_npz_sparse_grid_streamed_read(tmp_path):
    """read_sparse_grid streams a CSR npz into grid blocks that compute
    identically to the host-global BCOO + shard_sparse_grid path, tracking
    which row panels were materialized (VERDICT r3 item 4)."""
    import jax.numpy as jnp
    from scipy import sparse as sp
    from pydnmfk_tpu.ops.sparse import (rs_a_ht, rs_kl_wtu, rs_wt_a,
                                        shard_sparse_grid)

    rng = np.random.default_rng(4)
    M = sp.random(37, 23, density=0.2, format="csr", random_state=5,
                  dtype=np.float64)
    sp.save_npz(tmp_path / "S.npz", M)
    ctx = grid_context(2, 2)
    r = DataReader(str(tmp_path), "S", "npz", precision="float32")
    bundle = r.read_sparse_grid(ctx)
    gs, dims, perm, nnz = bundle.gs, bundle.dims, bundle.perm, bundle.nse
    assert nnz == M.nnz and r.last_global_shape == (37, 23)
    assert bundle.shape == (37, 23)
    # the flat values vector is the CSR data member in storage order
    np.testing.assert_allclose(np.asarray(bundle.data),
                               M.data.astype(np.float32))
    # both row panels materialized (single host owns the whole mesh), and
    # nothing outside them
    assert sorted(r.npz_rows_materialized) == [(0, 19), (19, 37)]

    A_bcoo = DataReader(str(tmp_path), "S", "npz",
                        precision="float32").read_global()
    gs2, dims2 = shard_sparse_grid(A_bcoo, ctx)
    assert dims == dims2
    k = 3
    W = jnp.asarray(rng.random((dims[0], k)), jnp.float32)
    H = jnp.asarray(rng.random((k, dims[1])), jnp.float32)
    np.testing.assert_allclose(np.asarray(rs_a_ht(gs, H)),
                               np.asarray(rs_a_ht(gs2, H)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rs_wt_a(gs, W)),
                               np.asarray(rs_wt_a(gs2, W)), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(rs_kl_wtu(gs, W, H, 1e-7)),
        np.asarray(rs_kl_wtu(gs2, W, H, 1e-7)), rtol=1e-5)
    # perm covers every stored entry exactly once (padding slots == nnz)
    p = np.sort(np.asarray(perm).ravel())
    assert (p[:nnz] == np.arange(nnz)).all() and (p[nnz:] == nnz).all()


def test_npz_csc_fallback_bundle(tmp_path):
    """Non-CSR npz (e.g. CSC) cannot stream row panels; read_sparse_grid
    falls back to the host-global read + block partition and still
    returns a working SparseGridInput."""
    import jax.numpy as jnp
    from scipy import sparse as sp
    from pydnmfk_tpu.ops.sparse import SparseGridInput, rs_a_ht

    rng = np.random.default_rng(1)
    M = sp.random(30, 20, density=0.25, format="csc", random_state=2,
                  dtype=np.float64)
    sp.save_npz(tmp_path / "C.npz", M)
    ctx = grid_context(2, 2)
    b = DataReader(str(tmp_path), "C", "npz", precision="float32").read(ctx)
    assert isinstance(b, SparseGridInput)
    assert b.shape == (30, 20) and b.nse == M.nnz
    H = jnp.asarray(rng.random((3, b.dims[1]), np.float32))
    dense = np.zeros(b.dims, np.float32)
    dense[:30, :20] = M.toarray()
    np.testing.assert_allclose(np.asarray(rs_a_ht(b.gs, H)),
                               dense @ np.asarray(H).T, rtol=1e-5)


def test_npz_bundle_nmfk_matches_bcoo(tmp_path):
    """NMFk fed a reader SparseGridInput bundle (per-host panel reads, no
    host-global BCOO) selects the same k with identical statistics as the
    BCOO path — canonical CSR storage order == BCOO row-major order, so
    the member noise streams are bit-identical."""
    import jax.numpy as jnp
    from jax.experimental import sparse as jsparse
    from scipy import sparse as sp
    from pydnmfk_tpu.config import NMFConfig, NMFkConfig
    from pydnmfk_tpu.models.nmfk import NMFk

    rng = np.random.default_rng(7)
    m, n, ktrue = 78, 60, 3
    W = np.zeros((m, ktrue))
    for i in range(ktrue):
        c = (i + 0.5) * m / ktrue
        W[:, i] = np.exp(-0.5 * ((np.arange(m) - c) / (0.06 * m)) ** 2)
    H = rng.random((ktrue, n)) + 0.1
    A = ((W @ H) * (rng.random((m, n)) < 0.5)).astype(np.float32)
    sp.save_npz(tmp_path / "P.npz", sp.csr_matrix(A))

    mk = lambda sub: NMFkConfig(
        nmf=NMFConfig(k=0, grid=(2, 2), norm="fro", method="mu", itr=250,
                      init="rand", seed=42),
        start_k=2, end_k=4, perturbations=4, noise_var=0.03, sill_thr=0.6,
        results_path=str(tmp_path / sub) + "/", fname="P",
        checkpoint=False)

    ctx = grid_context(2, 2)
    reader = DataReader(str(tmp_path), "P", "npz", precision="float32")
    bundle = reader.read(ctx)           # grid ctx -> SparseGridInput
    from pydnmfk_tpu.ops.sparse import SparseGridInput
    assert isinstance(bundle, SparseGridInput)
    nb = NMFk(mk("bundle"), ctx)
    nopt_b = nb.fit(bundle)

    Abcoo = jsparse.BCOO.fromdense(jnp.asarray(A))
    nc = NMFk(mk("bcoo"), ctx)
    nopt_c = nc.fit(Abcoo)
    assert nopt_b == nopt_c == ktrue
    for k in (2, 3, 4):
        sb, sc = nb.per_k_stats[k], nc.per_k_stats[k]
        np.testing.assert_allclose(sb["avgErr"], sc["avgErr"], rtol=1e-5)
        np.testing.assert_allclose(sb["L_err"], sc["L_err"],
                                   rtol=1e-4, atol=1e-6)


def test_runner_npz_grid_single_solve(tmp_path):
    """Runner on an npz over a (2, 2) grid (now the SparseGridInput path)
    matches the dense solve of the same matrix."""
    from pydnmfk_tpu.runner import Runner

    rng = np.random.default_rng(0)
    from scipy import sparse as sp
    A = ((rng.random((60, 3)) @ rng.random((3, 40)))
         * (rng.random((60, 40)) < 0.4)).astype(np.float32)
    sp.save_npz(tmp_path / "S.npz", sp.csr_matrix(A))
    np.save(tmp_path / "D.npy", A)
    kw = dict(fpath=str(tmp_path), results_path=str(tmp_path / "res"), k=3)
    r1 = Runner(process="pyDNMF", norm="fro", method="mu", itr=150,
                init="rand").run(grid=(2, 2), ftype="npz", fname="S", **kw)
    r2 = Runner(process="pyDNMF", norm="fro", method="mu", itr=150,
                init="rand").run(grid=(2, 2), ftype="npy", fname="D", **kw)
    np.testing.assert_allclose(r1["err"], r2["err"], rtol=1e-3)
    assert r1["W"].shape == (60, 3) and r1["H"].shape == (3, 40)


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
