"""Perturbation sampling for the NMFk ensemble.

Reference: ``sample`` (pyDNMFk/pyDNMFk.py:8-67).  Exact semantics kept:

  * uniform: X_per = X * M with M = 2*nv*U[0,1) + nv + 1, i.e. elementwise
    multiplicative noise in [1+nv, 1+3nv)  — note the reference docstring
    claims (1-nv, 1+nv) but the implementation is this (pyDNMFk.py:42-44);
    we match the implementation.
  * poisson: X_per[i,j] ~ Poisson(X[i,j])   (pyDNMFk.py:47-50)

The reference seeds numpy with ``perturbation * 1000`` per member and runs
members serially; here all members are generated (and later solved) as one
batched array using a folded JAX PRNG key, so the whole ensemble is a single
device computation.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("method", "n_pert"))
def sample_ensemble(A, key, noise_var, n_pert: int, method: str = "uniform"):
    """Generate the full (n_pert, m, n) perturbed ensemble in one shot."""
    keys = jax.random.split(key, n_pert)

    if method == "uniform":
        def one(k):
            u = jax.random.uniform(k, A.shape, dtype=jnp.float32)
            m = (2.0 * noise_var * u + noise_var + 1.0).astype(A.dtype)
            return A * m
    elif method == "poisson":
        def one(k):
            return jax.random.poisson(k, A.astype(jnp.float32)).astype(A.dtype)
    else:
        raise ValueError(f"unknown sampling method {method!r}")

    return jax.vmap(one)(keys)


def sample_one(A, key, noise_var, method: str = "uniform"):
    """Single perturbed copy (streaming path for memory-bound ensembles)."""
    return sample_ensemble(A, key, noise_var, 1, method)[0]
