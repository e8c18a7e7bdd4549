"""NMF solver convergence on synthetic exactly-low-rank data.

Mirrors reference tests/test_dist_nmf_1d.py / test_dist_nmf_2d.py: a random
rank-2 24x12 product must be recovered to relative error < 1e-3 (1e-4 on the
row-sharded grid) for every (method, norm) combination, across mesh shapes
that exercise row, column, and true 2D sharding (which the reference's 2-rank
CI could not — its '2d' test actually ran the 1D path, pyDNMF.py:83-87)."""
import numpy as np
import pytest

from pydnmfk_tpu import NMF, NMFConfig

COMBOS = [("fro", "mu"), ("kl", "mu"), ("fro", "hals"), ("fro", "bcd")]


def make_data(m=24, n=12, k=2, seed=100):
    rng = np.random.default_rng(seed)
    W = rng.random((m, k))
    H = rng.random((k, n))
    return (W @ H).astype(np.float64)


@pytest.mark.parametrize("norm,method", COMBOS)
@pytest.mark.parametrize("grid", [(1, 1), (2, 1), (1, 2)])
def test_low_rank_recovery_1d(norm, method, grid):
    A = make_data()
    cfg = NMFConfig(k=2, grid=grid, itr=2000, norm=norm, method=method,
                    init="rand", precision="float64", seed=100)
    _, _, err = NMF(cfg).fit(A)
    assert err < 1e-3, f"{norm}/{method} on {grid}: err={err}"


@pytest.mark.parametrize("norm,method", COMBOS)
def test_low_rank_recovery_2d_mesh(norm, method):
    A = make_data()
    cfg = NMFConfig(k=2, grid=(2, 2), itr=2000, norm=norm, method=method,
                    init="rand", precision="float64", seed=100)
    _, _, err = NMF(cfg).fit(A)
    assert err < 1e-3, f"{norm}/{method} on 2x2: err={err}"


def test_mu_fro_tight_threshold_row_sharded():
    # reference test_dist_nmf_2d.py asserts < 1e-4 on grid [2,1]
    A = make_data()
    cfg = NMFConfig(k=2, grid=(2, 1), itr=2000, norm="fro", method="mu",
                    init="rand", precision="float64", seed=100)
    _, _, err = NMF(cfg).fit(A)
    assert err < 1e-4


def test_sharded_matches_single_device():
    """Shard-vs-replicated equivalence (replaces the reference's
    distributed-vs-serial checks)."""
    A = make_data()
    cfg = NMFConfig(k=2, grid=(1, 1), itr=200, norm="fro", method="mu",
                    init="rand", precision="float64", seed=100)
    W1, H1, err1 = NMF(cfg).fit(A)
    cfg4 = cfg.replace(grid=(2, 2))
    W4, H4, err4 = NMF(cfg4).fit(A)
    np.testing.assert_allclose(np.asarray(W1), np.asarray(W4),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(err1, err4, rtol=1e-8)


def test_nnsvd_init_recovery():
    """Mirrors tests/test_dist_nmf_1d_nnsvd_init.py: tall and wide matrices,
    nnsvd init, rel err < 1e-1."""
    for m, n, grid in [(24, 12, (2, 1)), (12, 24, (1, 2))]:
        A = make_data(m, n)
        cfg = NMFConfig(k=2, grid=grid, itr=2000, norm="fro", method="mu",
                        init="nnsvd", precision="float64")
        _, _, err = NMF(cfg).fit(A)
        assert err < 1e-1


def test_w_frozen_regression():
    """W_update=False must keep W fixed and still fit H."""
    A = make_data()
    rng = np.random.default_rng(0)
    W0 = rng.random((24, 2))
    H0 = rng.random((2, 12))
    cfg = NMFConfig(k=2, grid=(1, 1), itr=500, norm="fro", method="mu",
                    precision="float64", W_update=False)
    W, H, err = NMF(cfg).fit(A, factors=(W0, H0))
    # W only changes by the final L1 column normalization
    Wn = W0 / W0.sum(axis=0, keepdims=True)
    np.testing.assert_allclose(np.asarray(W), Wn, rtol=1e-6, atol=1e-8)


def test_bcd_gram_objective_matches_residual():
    """The Gram-identity BCD objective (VERDICT r4 item 4) drives the same
    restore-vs-extrapolate decisions as the reference's explicit m x n
    residual wherever the decision is above cancellation noise; the
    trajectories agree to solver tolerance (decisions can flip only once
    successive objective differences are below fp resolution, where both
    branches are equally valid)."""
    A = make_data()
    base = NMFConfig(k=2, itr=500, norm="fro", method="bcd",
                     precision="float64", seed=100)
    Wg, Hg, err_g = NMF(base).fit(A)                       # default: gram
    Wr, Hr, err_r = NMF(base.replace(bcd_obj="residual")).fit(A)
    np.testing.assert_allclose(np.asarray(Wg), np.asarray(Wr),
                               rtol=1e-4, atol=1e-8)
    # On exactly-low-rank data the residual path can converge to machine
    # eps; the gram path's documented floor is ~sqrt(eps)*||A|| — both are
    # far below any real NMF reconstruction error.
    assert err_r <= err_g
    assert err_g < 1e-6, err_g
    f32 = base.replace(precision="float32")
    _, _, e32g = NMF(f32).fit(A.astype(np.float32))
    _, _, e32r = NMF(f32.replace(bcd_obj="residual")).fit(
        A.astype(np.float32))
    assert abs(e32g - e32r) < 1e-3, (e32g, e32r)
    assert e32g < 1e-2


def test_hals_blocked_matches_column_sweep():
    """The blocked delayed-update HALS (VERDICT r4 item 6) is exact
    Gauss-Seidel: same update order and fixed point as the
    reference-structured column-by-column sweep, differing only in fp
    summation order — near-identical at f64, close at f32."""
    import jax
    import jax.numpy as jnp
    from pydnmfk_tpu.models.updates import hals_step

    rng = np.random.default_rng(3)
    m, n, k = 48, 40, 24
    A64 = jnp.asarray(rng.random((m, n)), jnp.float64)
    W64 = jnp.asarray(rng.random((m, k)), jnp.float64)
    H64 = jnp.asarray(rng.random((k, n)), jnp.float64)
    eps = jnp.float64(np.finfo(np.float64).eps)

    # single-step comparison: multi-step trajectories amplify fp-level
    # differences chaotically through the max(v, eps) clips (true of ANY
    # reordering — bf16 storage does the same), so exactness is pinned at
    # the sweep level; end-to-end behavior by the convergence test below
    run = jax.jit(lambda A, W, H, eps, block: hals_step(
        A, W, H, eps, block=block), static_argnames=("block",))
    Wc, Hc = run(A64, W64, H64, eps, 0)
    for B in (5, 8, 16):          # incl. non-dividing blocks (ragged tail)
        Wb, Hb = run(A64, W64, H64, eps, B)
        np.testing.assert_allclose(np.asarray(Wb), np.asarray(Wc),
                                   rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(np.asarray(Hb), np.asarray(Hc),
                                   rtol=1e-10, atol=1e-12)

    A32, W32, H32 = (x.astype(jnp.float32) for x in (A64, W64, H64))
    Wc, Hc = run(A32, W32, H32, jnp.float32(1.19e-7), 0)
    Wb, Hb = run(A32, W32, H32, jnp.float32(1.19e-7), 8)
    np.testing.assert_allclose(np.asarray(Wb), np.asarray(Wc),
                               rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(Hb), np.asarray(Hc),
                               rtol=5e-3, atol=1e-4)


def test_hals_blocked_full_solve_convergence():
    """End-to-end HALS solve with the blocked sweep forced on reaches the
    same recovery threshold as the reference-structured sweep."""
    A = make_data()
    base = NMFConfig(k=2, grid=(1, 1), itr=2000, norm="fro",
                     method="hals", init="rand", precision="float64",
                     seed=100)
    _, _, err_b = NMF(base.replace(hals_block=1)).fit(A)   # B=1 blocks
    _, _, err_c = NMF(base.replace(hals_block=0)).fit(A)
    assert err_b < 1e-3 and err_c < 1e-3
    # both converge to ~machine eps on exactly-low-rank data
    np.testing.assert_allclose(err_b, err_c, rtol=1e-6, atol=1e-12)


def test_early_stop_tolerance():
    """tol > 0 stops once the error plateaus; result quality comparable to
    the full budget at a fraction of the iterations."""
    A = make_data()
    full = NMFConfig(k=2, itr=5000, norm="fro", method="mu",
                     precision="float64", seed=100)
    _, _, err_full = NMF(full).fit(A)
    tol = full.replace(tol=1e-10, tol_check_every=50)
    _, _, err_tol = NMF(tol).fit(A)
    assert err_tol < 5e-3          # converged to a good solution
    # and the mechanism is exact when tol=0 (same jit path as before)
    _, _, err0 = NMF(full.replace(tol=0.0)).fit(A)
    assert err0 == err_full
