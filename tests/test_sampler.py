"""Perturbation sampler semantics (reference sample, pyDNMFk.py:8-67)."""
import numpy as np

import jax

from pydnmfk_tpu.models.sampler import sample_ensemble


def test_uniform_noise_range():
    A = np.ones((50, 40), np.float32)
    out = sample_ensemble(A, jax.random.key(0), 0.03, 8, "uniform")
    out = np.asarray(out)
    assert out.shape == (8, 50, 40)
    # reference randM: X * (2*nv*U + nv + 1) in [1+nv, 1+3nv)
    assert out.min() >= 1.03 - 1e-6
    assert out.max() <= 1.09 + 1e-6
    # members differ
    assert not np.allclose(out[0], out[1])


def test_uniform_deterministic():
    A = np.ones((10, 10), np.float32) * 2
    a = np.asarray(sample_ensemble(A, jax.random.key(5), 0.1, 3, "uniform"))
    b = np.asarray(sample_ensemble(A, jax.random.key(5), 0.1, 3, "uniform"))
    np.testing.assert_array_equal(a, b)


def test_poisson_mean():
    A = np.full((100, 100), 7.0, np.float32)
    out = np.asarray(sample_ensemble(A, jax.random.key(1), 0.0, 4, "poisson"))
    assert abs(out.mean() - 7.0) < 0.05
    assert np.all(out == np.round(out))


def test_zero_preserved():
    A = np.zeros((10, 10), np.float32)
    for method in ("uniform", "poisson"):
        out = np.asarray(sample_ensemble(A, jax.random.key(2), 0.05, 2, method))
        assert np.all(out == 0)
