"""Uneven (non-divisible) global shapes on a mesh: pad-and-mask path.

XLA's explicit NamedShardings require even tiling; the framework pads with
zeros before sharding and slices factors back (SURVEY hard-part (d)).
wtsi (96x21) on 2x2 and 4x1 grids is the canonical uneven case."""
import numpy as np

from conftest import reference_path
from pydnmfk_tpu import NMF, NMFConfig, NMFk, NMFkConfig, grid_context


def wtsi():
    from scipy.io import loadmat
    return loadmat(reference_path("data", "wtsi.mat"))["X"].astype(np.float32)


def test_uneven_nmf_matches_single_device():
    A = wtsi()
    cfg = NMFConfig(k=4, itr=300, norm="fro", method="mu",
                    precision="float64")
    W1, H1, err1 = NMF(cfg).fit(A)
    W2, H2, err2 = NMF(cfg.replace(grid=(2, 2))).fit(A)
    assert W2.shape == (96, 4) and H2.shape == (4, 21)
    np.testing.assert_allclose(err1, err2, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(W1), np.asarray(W2), rtol=1e-5,
                               atol=1e-8)


def test_uneven_column_err_length():
    A = wtsi()
    cfg = NMFConfig(k=3, itr=100, norm="fro", method="mu",
                    precision="float64", grid=(2, 2))
    model = NMF(cfg)
    model.fit(A)
    col = model.column_err()
    assert col.shape == (21,)
    assert np.isfinite(col).all()


def test_uneven_nmfk_wtsi_golden_on_reference_grid(tmp_path):
    """The reference wtsi example runs on a 4x1 grid (mpirun -n 4); same
    grid here, uneven n=21 unsharded, golden nopt=4."""
    A = wtsi()
    cfg = NMFkConfig(
        nmf=NMFConfig(itr=500, norm="fro", method="mu", init="nnsvd",
                      precision="float32", grid=(4, 1)),
        start_k=1, end_k=8, perturbations=10, sill_thr=0.6,
        results_path=str(tmp_path) + "/", fname="wtsi", checkpoint=False)
    assert NMFk(cfg).fit(A) == 4
