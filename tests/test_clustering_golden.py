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
