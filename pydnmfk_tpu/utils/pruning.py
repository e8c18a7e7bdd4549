"""Zero-row/column pruning of the data matrix with matching factor prune and
post-fit unprune.

Reference: ``data_operations.zero_idx_prune / prune_all / unprune_factors``
(pyDNMFk/utils.py:117-217).  The reference computes per-rank nonzero counts
and allreduces them; here the counts are single global jnp reductions (psum
under the hood on a mesh) and the index selection happens at the host
boundary because pruning changes array *shapes*, which must be static for
XLA.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class PruneState:
    row_mask: np.ndarray      # bool (m,) True = kept
    col_mask: np.ndarray      # bool (n,) True = kept
    n_rows_full: int
    n_cols_full: int


def zero_masks(A) -> tuple[np.ndarray, np.ndarray]:
    """Boolean keep-masks for rows/columns with at least one nonzero
    (reference zero_idx_prune, utils.py:117-135)."""
    nz = jnp.asarray(A) != 0
    row = jnp.sum(nz, axis=1) > 0
    col = jnp.sum(nz, axis=0) > 0
    return np.asarray(jax.device_get(row)), np.asarray(jax.device_get(col))


def prune_all(A, W, H):
    """Prune A (rows+cols), W (rows), H (cols).  Returns pruned arrays and
    the PruneState needed to undo (reference prune_all, utils.py:158-176)."""
    row_mask, col_mask = zero_masks(A)
    m, n = A.shape
    state = PruneState(row_mask, col_mask, m, n)
    if row_mask.all() and col_mask.all():
        return A, W, H, state
    ridx = jnp.asarray(np.nonzero(row_mask)[0])
    cidx = jnp.asarray(np.nonzero(col_mask)[0])
    A = jnp.take(jnp.take(A, ridx, axis=0), cidx, axis=1)
    W = jnp.take(W, ridx, axis=0)
    H = jnp.take(H, cidx, axis=1)
    return A, W, H, state


def prune_A(A):
    """Prune only A (rows+cols); factors do not exist yet.  Used by the NMFk
    pipeline to prune ONCE before sampling: multiplicative uniform noise
    (X*(1+nv+2nv*U)) and Poisson(X) both map zeros to zeros, so the zero
    masks of every perturbed copy equal A's — pruning up front is exactly
    equivalent to the reference pruning inside each perturbation fit
    (pyDNMF.py:99-101)."""
    row_mask, col_mask = zero_masks(A)
    m, n = A.shape
    state = PruneState(row_mask, col_mask, m, n)
    if row_mask.all() and col_mask.all():
        return A, state
    A = jnp.take(jnp.take(A, jnp.asarray(np.nonzero(row_mask)[0]), axis=0),
                 jnp.asarray(np.nonzero(col_mask)[0]), axis=1)
    return A, state


def unprune_factors(W, H, state: PruneState):
    """Re-insert zero rows into W and zero columns into H
    (reference unprune_factors, utils.py:202-217)."""
    if state.row_mask.all() and state.col_mask.all():
        return W, H
    k = W.shape[1]
    Wf = jnp.zeros((state.n_rows_full, k), dtype=W.dtype)
    Wf = Wf.at[jnp.asarray(np.nonzero(state.row_mask)[0])].set(W)
    Hf = jnp.zeros((k, state.n_cols_full), dtype=H.dtype)
    Hf = Hf.at[:, jnp.asarray(np.nonzero(state.col_mask)[0])].set(H)
    return Wf, Hf
