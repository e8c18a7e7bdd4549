"""Perturbation sampling for the NMFk ensemble.

Reference: ``sample`` (pyDNMFk/pyDNMFk.py:8-67).  Exact semantics kept:

  * uniform: X_per = X * M with M = 2*nv*U[0,1) + nv + 1, i.e. elementwise
    multiplicative noise in [1+nv, 1+3nv)  — note the reference docstring
    claims (1-nv, 1+nv) but the implementation is this (pyDNMFk.py:42-44);
    we match the implementation.
  * poisson: X_per[i,j] ~ Poisson(X[i,j])   (pyDNMFk.py:47-50)

The reference seeds numpy with ``perturbation * 1000`` per member and runs
members serially; here member i draws from ``fold_in(key, i)`` — the same
"independent stream per member index" contract — and any contiguous batch of
members is generated as one vmapped computation.  Keys are derived from the
GLOBAL member index (``offset + arange(b)``), so the ensemble is bitwise
invariant to how it is split into batches (HBM-sized batching, restart
replay, and the all-at-once path all see identical noise).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


# per-member sub-streams derived from the member's base key
# (fold_in(key, global_member_index)); the NMFk pipeline uses the same
# constants for factor init (models/nmfk.py::_ensemble_program)
NOISE_STREAM, W0_STREAM, H0_STREAM = 0, 1, 2


def member_keys(key, offset, n: int):
    """Base PRNG keys for members [offset, offset+n) — global-index derived."""
    return member_keys_at(key, jnp.arange(n) + offset)


def member_keys_at(key, idx):
    """Base PRNG keys for EXPLICIT member indices — the merged multi-k
    ensemble batches members of several k values in one program, where
    each member's index is its per-k perturbation number (so the noise a
    member sees is identical across ks, exactly as the reference's
    seed=pert*1000 reuses perturbed copies across its k loop,
    pyDNMFk.py:228)."""
    return jax.vmap(lambda i: jax.random.fold_in(key, i))(idx)


def member_noise_key(base_key):
    """Noise sub-stream of one member's base key — the exact key the NMFk
    pipeline perturbs with, so sample_ensemble reproduces its copies."""
    return jax.random.fold_in(base_key, NOISE_STREAM)


def sample_member(A, key, noise_var, method: str = "uniform",
                  tile_grid=None):
    """One perturbed copy of A from one member key.

    ``tile_grid=(p_r, p_c)`` reproduces the reference's MPI seeding
    statistics: every rank seeds numpy identically (pyDNMFk.py:32 with
    seed=pert*1000 on all ranks), so on a p_r x p_c grid all ranks draw THE
    SAME noise block and the global noise field is p_r x p_c-tiled.  The
    executed reference's swim golden (nopt=16) depends on these correlated
    ensembles — see docs/PARITY.md.  Requires A's dims divisible by the
    grid (as the reference's identical-stream property implicitly does)."""
    from ..ops.linalg import is_sparse
    if is_sparse(A):
        # perturb only the stored nnz values: multiplicative uniform noise
        # and Poisson both map 0 -> 0, so this is exact vs the dense formula
        if tile_grid not in (None, (1, 1)):
            raise ValueError("seed-grid MPI compat is dense-only")
        from jax.experimental import sparse as jsparse
        data = sample_member(A.data, key, noise_var, method)
        return jsparse.BCOO((data, A.indices), shape=A.shape,
                            indices_sorted=A.indices_sorted,
                            unique_indices=A.unique_indices)
    if method == "uniform":
        shape = A.shape
        if tile_grid is not None and tile_grid != (1, 1):
            p_r, p_c = tile_grid
            if A.shape[0] % p_r or A.shape[1] % p_c:
                raise ValueError(
                    f"seed-grid compat needs dims {A.shape} divisible by "
                    f"{tile_grid}")
            shape = (A.shape[0] // p_r, A.shape[1] // p_c)
        u = jax.random.uniform(key, shape, dtype=jnp.float32)
        if shape != A.shape:
            u = jnp.tile(u, (tile_grid[0], tile_grid[1]))
        m = (2.0 * noise_var * u + noise_var + 1.0).astype(A.dtype)
        return A * m
    if method == "poisson":
        if tile_grid not in (None, (1, 1)):
            # Reference MPI seeding: every rank seeds numpy identically
            # (pyDNMFk.py:32 with seed=pert*1000) and draws
            # Poisson(local block) (pyDNMFk.py:47-50).  The load-bearing
            # property is that every block's draw starts from the SAME
            # stream state — so blocks with identical data get identical
            # noise (for uniform this degenerates to the tiled field
            # above).  Reproduced here by drawing every grid block with
            # the same key: JAX's counter-based Poisson gives equal-data
            # blocks bitwise-equal draws, each block marginally
            # Poisson(block values).
            p_r, p_c = tile_grid
            if A.shape[0] % p_r or A.shape[1] % p_c:
                raise ValueError(
                    f"seed-grid compat needs dims {A.shape} divisible by "
                    f"{tile_grid}")
            br, bc = A.shape[0] // p_r, A.shape[1] // p_c
            blocks = A.reshape(p_r, br, p_c, bc).transpose(0, 2, 1, 3)
            drawn = jax.vmap(lambda b: jax.random.poisson(
                key, b.astype(jnp.float32)))(blocks.reshape(-1, br, bc))
            return (drawn.reshape(p_r, p_c, br, bc).transpose(0, 2, 1, 3)
                    .reshape(A.shape).astype(A.dtype))
        return jax.random.poisson(key, A.astype(jnp.float32)).astype(A.dtype)
    raise ValueError(f"unknown sampling method {method!r}")


@partial(jax.jit, static_argnames=("method", "n_pert"))
def sample_ensemble(A, key, noise_var, n_pert: int, method: str = "uniform",
                    offset=0):
    """Generate perturbed copies for members [offset, offset+n_pert)."""
    keys = member_keys(key, offset, n_pert)
    return jax.vmap(
        lambda k: sample_member(A, member_noise_key(k), noise_var,
                                method))(keys)


def sample_one(A, key, noise_var, method: str = "uniform"):
    """Single perturbed copy == ensemble member 0 of `key`."""
    return sample_member(A, member_noise_key(jax.random.fold_in(key, 0)),
                         noise_var, method)
