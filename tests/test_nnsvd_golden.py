"""NNSVD initialization vs the reference's committed sklearn golden factors.

Mirrors reference tests/test_dist_nnsvd.py: seeded rank-2 products, SVD
reconstruction < 1e-15, NNSVD reconstruction < 0.11, W allclose to the
sklearn-computed golden at rtol/atol 1e-3."""
import numpy as np
import pytest

from conftest import reference_path
from pydnmfk_tpu.models.svd import DistSVD


def _setup_x64():
    import jax
    jax.config.update("jax_enable_x64", True)


def _make(m, k, n, rng):
    W = rng.random((m, k))
    H = rng.random((k, n))
    return W @ H


@pytest.mark.parametrize("shape,fixture", [
    ((24, 16), "nnsvd_factors_24x16.npy"),
    ((16, 24), "nnsvd_factors_16x24.npy"),
])
def test_nnsvd_vs_sklearn_golden(shape, fixture):
    _set = _setup_x64()
    # reference test generates BOTH matrices from one seed-0 stream
    rng = np.random.RandomState(0)
    A_tall = _make(24, 2, 16, rng)
    A_wide = _make(16, 2, 24, rng)
    A = A_tall if shape == (24, 16) else A_wide

    eps = float(np.finfo(np.float64).eps)
    dsvd = DistSVD(k=2, eps=eps)
    (W, H), err = dsvd.nnsvd(A, flag=1, verbose=1)

    assert err["recon_err_svd"] < 1e-12
    assert err["recon_err_nnsvd"] < 0.11

    golden = np.load(reference_path("tests", fixture),
                     allow_pickle=True).item()
    np.testing.assert_allclose(np.asarray(W), golden["W"],
                               rtol=1e-3, atol=1e-3)


def test_svd_values():
    _setup_x64()
    rng = np.random.RandomState(3)
    A = rng.random((40, 12))
    S, U, Vt = DistSVD(k=5, eps=1e-16).svd(A)
    S_np = np.linalg.svd(A, compute_uv=False)[:5]
    np.testing.assert_allclose(np.asarray(S), S_np, rtol=1e-10)
    # orthonormality
    np.testing.assert_allclose(np.asarray(U).T @ np.asarray(U),
                               np.eye(5), atol=1e-10)
    np.testing.assert_allclose(np.asarray(Vt) @ np.asarray(Vt).T,
                               np.eye(5), atol=1e-10)


def test_randomized_svd_path():
    _setup_x64()
    from pydnmfk_tpu.models.svd import _svd_randomized
    import jax
    rng = np.random.RandomState(7)
    # exactly rank-4 matrix: randomized path must nail it
    A = rng.random((300, 6)) @ rng.random((6, 200))
    S, U, Vt = _svd_randomized(jax.numpy.asarray(A), jax.random.key(0), 6)
    S_np = np.linalg.svd(A, compute_uv=False)[:6]
    np.testing.assert_allclose(np.asarray(S), S_np, rtol=1e-6)
