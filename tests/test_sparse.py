"""Sparse-A support (beyond the dense-only reference): FRO-norm solvers on
BCOO matrices, with error computed via the Gram identity (no dense m x n
residual ever exists)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import sparse

from pydnmfk_tpu.config import NMFConfig
from pydnmfk_tpu.models import nmf as nmf_mod
from pydnmfk_tpu.models.nmf import NMF
from pydnmfk_tpu.ops import linalg


def _sparse_lowrank(m, n, k, density=0.1, seed=0):
    rng = np.random.default_rng(seed)
    A = (rng.random((m, k)) @ rng.random((k, n))).astype(np.float32)
    mask = rng.random((m, n)) < density
    A = A * mask
    return A, sparse.BCOO.fromdense(jnp.asarray(A))


def test_sparse_error_identities():
    rng = np.random.default_rng(1)
    A, Asp = _sparse_lowrank(60, 40, 3, density=0.2)
    W = jnp.asarray(rng.random((60, 5)), jnp.float32)
    H = jnp.asarray(rng.random((5, 40)), jnp.float32)
    dense_err = float(linalg.relative_error(jnp.asarray(A), W, H))
    sp_err = float(linalg.relative_error(Asp, W, H))
    np.testing.assert_allclose(sp_err, dense_err, rtol=1e-4)
    dense_col = np.asarray(linalg.column_error(jnp.asarray(A), W, H))
    sp_col = np.asarray(linalg.column_error(Asp, W, H))
    np.testing.assert_allclose(sp_col, dense_col, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("method", ["mu", "hals"])
def test_sparse_solve_matches_dense(method):
    A, Asp = _sparse_lowrank(48, 36, 3, density=0.3, seed=2)
    rng = np.random.default_rng(3)
    W0 = jnp.asarray(rng.random((48, 3)), jnp.float32)
    H0 = jnp.asarray(rng.random((3, 36)), jnp.float32)
    eps = jnp.float32(1.19e-7)
    cfg = NMFConfig(k=3, norm="fro", method=method, itr=50)
    Wd, Hd, errd = nmf_mod.solve(jnp.asarray(A), W0, H0, eps, cfg)
    Ws, Hs, errs = nmf_mod.solve(Asp, W0, H0, eps, cfg)
    np.testing.assert_allclose(np.asarray(Ws), np.asarray(Wd), rtol=5e-4,
                               atol=1e-5)
    np.testing.assert_allclose(float(errs), float(errd), rtol=1e-3)


def test_sparse_nmf_driver_and_column_err(tmp_path):
    A, Asp = _sparse_lowrank(40, 30, 3, density=0.4, seed=4)
    cfg = NMFConfig(k=3, norm="fro", method="mu", itr=150, init="rand",
                    results_path=str(tmp_path))
    model = NMF(cfg)
    W, H, err = model.fit(Asp)
    assert W.shape == (40, 3) and H.shape == (3, 30)
    # masking a rank-3 matrix breaks exact low-rankness; just require real
    # progress from a random start (which sits at ~1.0 relative error)
    assert 0 < err < 0.8
    col = model.column_err()
    assert col.shape == (30,)
    assert np.all(np.isfinite(col))


def test_sparse_rejects_unsupported():
    _, Asp = _sparse_lowrank(16, 12, 2)
    W = jnp.ones((16, 2), jnp.float32)
    H = jnp.ones((2, 12), jnp.float32)
    eps = jnp.float32(1e-7)
    with pytest.raises(ValueError, match="sparse"):
        nmf_mod.solve(Asp, W, H, eps, NMFConfig(k=2, norm="kl", itr=5))
    with pytest.raises(ValueError, match="sparse"):
        nmf_mod.solve(Asp, W, H, eps,
                      NMFConfig(k=2, norm="fro", method="bcd", itr=5))
    with pytest.raises(ValueError, match="nnsvd"):
        NMF(NMFConfig(k=2, init="nnsvd")).fit(Asp)
