"""Ensemble clustering + silhouettes vs the reference's serial golden.

Mirrors reference tests/test_dist_clustering.py: 3 Gaussian-bump features,
4 perturbations with shuffled columns + noise, silhouettes must match the
committed serial golden ``sill.npy`` at rtol/atol 1e-3."""
import numpy as np

from conftest import reference_path
from pydnmfk_tpu.models.clustering import CustomClustering, cluster_ensemble


def _reference_fixture():
    """Replicates the reference test's seeded data generation exactly."""
    np.random.seed(100)

    def gauss(n, mean, std):
        return np.exp(-(np.linspace(1, n, n) - mean) ** 2 / std)

    m, p, k = 16, 4, 3
    W = np.vstack([gauss(m, 3, 3), gauss(m, 8, 2), gauss(m, 14, 3)]).T
    W_all = np.stack([W[:, np.random.permutation(k)]
                      + np.random.rand(m, k) * .1 for _ in range(p)], axis=-1)
    H_all = np.random.rand(k, 5, p)
    return W_all, H_all


def test_silhouettes_vs_golden():
    W_all, H_all = _reference_fixture()
    golden = np.load(reference_path("tests", "sill.npy"))

    # convert reference (m,k,p)/(k,n,p) layout to leading-perturbation axis
    Wb = np.moveaxis(W_all, -1, 0).astype(np.float64)
    Hb = np.moveaxis(H_all, -1, 0).astype(np.float64)
    eps = float(np.finfo(np.float64).eps)
    (centroids, cent_std, H_out, cluster_sils, avg_sil,
     sils) = cluster_ensemble(Wb, Hb, eps)

    np.testing.assert_allclose(np.asarray(sils), golden,
                               rtol=1e-3, atol=1e-3)


def test_alignment_recovers_permutation():
    """All perturbations must end aligned: pairwise column correlation of
    aligned W slices should be near-diagonal-dominant."""
    W_all, H_all = _reference_fixture()
    Wb = np.moveaxis(W_all, -1, 0)
    Hb = np.moveaxis(H_all, -1, 0)
    cc = CustomClustering(Wb, Hb, eps=1e-16)
    centroids, cent_std, H_out, cluster_sils, avg_sil, sils = cc.fit()
    assert float(avg_sil) > 0.8           # well-separated bumps => stable
    assert np.asarray(cluster_sils).shape == (3,)
    assert np.asarray(centroids).shape == (16, 3)
    assert np.asarray(cent_std).shape == (16, 3)


def test_single_k_silhouettes_are_ones():
    rng = np.random.default_rng(0)
    Wb = rng.random((4, 10, 1))
    Hb = rng.random((4, 1, 5))
    *_, avg_sil, sils = cluster_ensemble(Wb, Hb, 1e-16)
    np.testing.assert_allclose(np.asarray(sils), 1.0)


def test_early_exit_matches_fixed_100_iterations():
    """The alignment loop's fixed-point early exit (models/clustering.py)
    is BITWISE equal to the reference's fixed 100 iterations: once an
    iteration with median-derived centroids applies only identity
    permutations, all remaining iterations are the identity map."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from pydnmfk_tpu.models.clustering import (_cluster_loop,
                                               greedy_assignment)
    from pydnmfk_tpu.ops import linalg

    def fixed_loop(W_all, H_all, eps, n_iter=100):
        # the reference-shaped loop: exactly n_iter iterations, no exit
        p = W_all.shape[0]
        centroids = W_all[0]

        def one_iter(_, state):
            W_all, H_all, centroids = state

            def one_pert(i, carry):
                W_all, H_all = carry
                Wp = lax.dynamic_index_in_dim(W_all, i, 0, keepdims=False)
                Hp = lax.dynamic_index_in_dim(H_all, i, 0, keepdims=False)
                perm = greedy_assignment(linalg.matmul(centroids.T, Wp))
                W_all = lax.dynamic_update_index_in_dim(
                    W_all, jnp.take(Wp, perm, axis=1), i, 0)
                H_all = lax.dynamic_update_index_in_dim(
                    H_all, jnp.take(Hp, perm, axis=0), i, 0)
                return W_all, H_all

            W_all, H_all = lax.fori_loop(0, p, one_pert, (W_all, H_all))
            centroids = jnp.median(W_all, axis=0)
            cn = jnp.sqrt(jnp.sum(
                jnp.square(centroids.astype(jnp.float32)), axis=0) + eps)
            return W_all, H_all, centroids / cn.astype(centroids.dtype)

        return lax.fori_loop(0, n_iter, one_iter, (W_all, H_all, centroids))

    rng = np.random.default_rng(11)
    for seed in range(3):
        rng = np.random.default_rng(seed)
        W_all = jnp.asarray(rng.random((5, 30, 4)), jnp.float32)
        H_all = jnp.asarray(rng.random((5, 4, 20)), jnp.float32)
        eps = jnp.float32(1.19e-7)
        Wf, Hf, cf = jax.jit(fixed_loop)(W_all, H_all, eps)
        We, He, ce = jax.jit(_cluster_loop)(W_all, H_all, eps)
        np.testing.assert_array_equal(np.asarray(We), np.asarray(Wf))
        np.testing.assert_array_equal(np.asarray(He), np.asarray(Hf))
        np.testing.assert_array_equal(np.asarray(ce), np.asarray(cf))
