"""Distributed SVD and NNDSVD (non-negative SVD) initialization.

Reference: ``DistSVD`` (pyDNMFk/dist_svd.py:9-267).  The reference computes k
singular triplets by *serial rank-0 power iteration with deflation* on the
replicated Gram matrix (svd1D :96-137: Bcast a random vector, allreduce the
Gram, iterate on rank 0 only, Bcast back — a per-triplet host bottleneck).

TPU-native re-design: one sharded Gram matmul (psum over the mesh) followed
by a single dense ``eigh`` of the (min_dim x min_dim) Gram — all k triplets
at once, no deflation loop, strictly better numerics — with a randomized
subspace-iteration path when min(m, n) is too large to replicate.  The
NNDSVD ±-part construction (:233-256) is kept semantically identical (it is
sign-invariant, so the eigenvector sign ambiguity is immaterial), except the
reference's ``UP_norm / p`` processor-count scaling (:250-251) is dropped:
it is a uniform column scale that the final L1 normalize-by-W (:68-78)
cancels exactly, so results match while staying grid-shape independent.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops import linalg
from ..parallel.mesh import GridContext


_EXACT_GRAM_LIMIT = 8192   # replicate the Gram and eigh below this min-dim


def _panel_qr(Y):
    """Tall-skinny orthonormalization.  Dense reduced QR: rank-deficient
    panels (exactly low-rank A) break Cholesky-QR, and this runs only a few
    times at init, so robustness wins over the matmul-only variant."""
    Q, _ = jnp.linalg.qr(Y.astype(linalg._acc_dtype(Y)), mode="reduced")
    return Q


@partial(jax.jit, static_argnames=("k",))
def _svd_gram(A, k: int):
    """Exact top-k SVD via eigh of the smaller Gram matrix."""
    m, n = A.shape
    Af = A.astype(linalg._acc_dtype(A))
    if m >= n:
        B = linalg.matmul(Af.T, Af)             # (n,n), psum over 'r'
        evals, evecs = jnp.linalg.eigh(B)       # ascending
        order = jnp.argsort(evals)[::-1][:k]
        V = jnp.take(evecs, order, axis=1)      # (n,k)
        S = jnp.sqrt(jnp.clip(jnp.take(evals, order), 0.0))
        U = linalg.matmul(Af, V) / jnp.maximum(S, 1e-30)[None, :]
    else:
        B = linalg.matmul(Af, Af.T)             # (m,m), psum over 'c'
        evals, evecs = jnp.linalg.eigh(B)
        order = jnp.argsort(evals)[::-1][:k]
        U = jnp.take(evecs, order, axis=1)      # (m,k)
        S = jnp.sqrt(jnp.clip(jnp.take(evals, order), 0.0))
        V = linalg.matmul(Af.T, U) / jnp.maximum(S, 1e-30)[None, :]
    return S, U, V.T                            # V^T is (k,n)


@partial(jax.jit, static_argnames=("k", "iters", "oversample"))
def _svd_randomized(A, key, k: int, iters: int = 8, oversample: int = 10):
    """Randomized subspace iteration for very large min(m, n)."""
    m, n = A.shape
    b = min(k + oversample, min(m, n))
    Af = A.astype(linalg._acc_dtype(A))
    tall = m >= n
    X = Af if tall else Af.T                    # (big, small)? no: (m,n) or (n,m)
    Y = linalg.matmul(X, jax.random.normal(key, (X.shape[1], b),
                                           linalg._acc_dtype(A)))
    Q = _panel_qr(Y)
    for _ in range(iters):
        Q = _panel_qr(linalg.matmul(X, linalg.matmul(X.T, Q)))
    B = linalg.matmul(Q.T, X)                   # (b, small)
    Bs, Bu, Bvt = _svd_gram(B, k)
    U_big = linalg.matmul(Q, Bu)                # (big, k)
    if tall:
        return Bs, U_big, Bvt
    return Bs, Bvt.T, U_big.T


def _nnsvd_from_svd(S, U, Vt, eps, flag=1):
    """NNDSVD ± construction from SVD factors (reference :233-256) followed
    by L1 normalize-by-W (reference :68-78).  Pure / vmappable."""
    if flag == 0:
        W = jnp.maximum(U, 0.0)
        H = jnp.maximum(S[:, None] * Vt, 0.0)
    else:
        V = Vt.T                             # (n,k)
        UP, UN = jnp.maximum(U, 0.0), jnp.maximum(-U, 0.0)
        VP, VN = jnp.maximum(V, 0.0), jnp.maximum(-V, 0.0)
        UP_n = jnp.sqrt(jnp.sum(jnp.square(UP), axis=0))   # global: psum 'r'
        UN_n = jnp.sqrt(jnp.sum(jnp.square(UN), axis=0))
        VP_n = jnp.sqrt(jnp.sum(jnp.square(VP), axis=0))
        VN_n = jnp.sqrt(jnp.sum(jnp.square(VN), axis=0))
        mp = jnp.sqrt(UP_n * VP_n * S)
        mn = jnp.sqrt(UN_n * VN_n * S)
        use_p = mp > mn
        W = jnp.where(use_p[None, :], mp * UP / (UP_n + eps),
                      mn * UN / (UN_n + eps))
        H = jnp.where(use_p[None, :], mp * VP / (VP_n + eps),
                      mn * VN / (VN_n + eps)).T
    s = jnp.sum(W, axis=0, keepdims=True) + eps
    return W / s, H * s.T


def nnsvd_factors(A, k: int, eps: float, flag: int = 1):
    """Pure-function NNDSVD init: (W, H) for one matrix.  vmap over a
    leading ensemble axis to initialize a whole perturbation batch."""
    S, U, Vt = _svd_gram(A, k)
    return _nnsvd_from_svd(S, U, Vt, eps, flag)


class DistSVD:
    """API mirror of reference DistSVD (svd / nnsvd / rel_error)."""

    def __init__(self, ctx: Optional[GridContext] = None, k: int = 4,
                 eps: float = float(jnp.finfo(jnp.float32).eps),
                 seed: int = 0):
        self.ctx = ctx
        self.k = k
        self.eps = eps
        self.seed = seed

    def svd(self, A):
        """Top-k singular triplets.  Returns (S (k,), U (m,k), Vt (k,n))."""
        A = jnp.asarray(A)
        if min(A.shape) <= _EXACT_GRAM_LIMIT:
            return _svd_gram(A, self.k)
        return _svd_randomized(A, jax.random.key(self.seed), self.k)

    def rel_error(self, A, U, S, Vt):
        """||A - U diag(S) Vt||_F / ||A||_F (reference :188-197)."""
        Aa = jnp.asarray(A)
        R = Aa.astype(linalg._acc_dtype(Aa)) - linalg.matmul(
            U * S[None, :], Vt)
        return float(jnp.sqrt(linalg.sqnorm(R) / linalg.sqnorm(A)))

    def nnsvd(self, A, flag: int = 1, verbose: int = 0):
        """Boutsidis-style NNDSVD factors (reference :199-267).

        Returns (W, H) L1-normalized by W; with verbose=1 also a dict of
        SVD/NNSVD reconstruction errors."""
        A = jnp.asarray(A)
        S, U, Vt = self.svd(A)
        errors = {}
        if verbose:
            errors["recon_err_svd"] = self.rel_error(A, U, S, Vt)
        W, H = _nnsvd_from_svd(S, U, Vt, self.eps, flag)
        if verbose:
            # error of the unnormalized factors == normalized (W scale
            # cancels against H), reference computes it pre-normalize
            errors["recon_err_nnsvd"] = self.rel_error(
                A, W, jnp.ones((self.k,), W.dtype), H)
            return (W, H), errors
        return W, H
