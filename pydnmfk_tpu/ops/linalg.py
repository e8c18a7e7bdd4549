"""Distributed linear-algebra primitives for NMF, written global-first.

Every function takes *global* (logically full-size) arrays.  Under ``jax.jit``
with the canonical shardings (parallel/mesh.py), XLA's SPMD partitioner
lowers these to exactly the hand-written collective patterns of the reference
(pyDNMFk/dist_nmf.py):

    gram(W)          == global_gram: local X^T X + Allreduce    (dist_nmf.py:94-116, 662-685)
    matmul_WTA(W, A) == ATW_glob: allgather + matmul + Reduce_scatter (dist_nmf.py:144-172)
    matmul_AHT(A, H) == AH_glob                                  (dist_nmf.py:174-205)
    fro_norm(X)      == utils.norm: sqrt(Allreduce(|X|^2))       (utils.py:367-391)
    sum_axis         == sum_along_axis with Allreduce            (dist_nmf.py:775-801)

The matmuls ask for f32 accumulation explicitly (``preferred_element_type``)
so bf16 inputs still ride the MXU with full-precision accumulation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _acc_dtype(x):
    """Accumulate low-precision inputs in f32; keep f64 when enabled.
    Accepts an array or a dtype."""
    dt = getattr(x, "dtype", x)
    if dt == jnp.float64:
        return jnp.float64
    return jnp.float32


def matmul(a: jax.Array, b: jax.Array) -> jax.Array:
    """MXU matmul with f32 (or f64) accumulation.

    Same-dtype inputs return that dtype.  Mixed-dtype inputs implement the
    standard TPU mixed-precision recipe: both operands are fed to the MXU in
    the *narrower* input dtype (so e.g. a bf16-stored A is read from HBM at
    half bandwidth and the small factor operand is rounded once, on-chip),
    accumulation stays f32/f64, and the result is returned in the *wider*
    dtype so factor updates keep full precision."""
    if a.dtype != b.dtype:
        a_bits = jnp.finfo(a.dtype).bits
        b_bits = jnp.finfo(b.dtype).bits
        narrow = a.dtype if a_bits <= b_bits else b.dtype
        wide = b.dtype if a_bits <= b_bits else a.dtype
        out = jnp.matmul(a.astype(narrow), b.astype(narrow),
                         preferred_element_type=_acc_dtype(wide))
        return out.astype(wide)
    out = jnp.matmul(a, b, preferred_element_type=_acc_dtype(a))
    return out.astype(a.dtype)


def gram(X: jax.Array) -> jax.Array:
    """X^T X -> (k, k), replicated.  psum over the sharded row axis."""
    return matmul(X.T, X)


def gram_t(X: jax.Array) -> jax.Array:
    """X X^T -> (k, k) for row-major factors H (k, n)."""
    return matmul(X, X.T)


def matmul_WTA(W: jax.Array, A: jax.Array) -> jax.Array:
    """W^T A -> (k, n), sharded like H.  psum over 'r'."""
    return matmul(W.T, A)


def matmul_AHT(A: jax.Array, H: jax.Array) -> jax.Array:
    """A H^T -> (m, k), sharded like W.  psum over 'c'."""
    return matmul(A, H.T)


def sqnorm(X: jax.Array) -> jax.Array:
    """Global squared Frobenius norm (f32/f64 accumulation)."""
    Xa = X.astype(_acc_dtype(X))
    return jnp.sum(Xa * Xa)


def fro_norm(X: jax.Array) -> jax.Array:
    return jnp.sqrt(sqnorm(X))


def sum_axis(X: jax.Array, axis: int) -> jax.Array:
    return jnp.sum(X.astype(_acc_dtype(X)), axis=axis).astype(X.dtype)


def col_sqnorms(X: jax.Array) -> jax.Array:
    """Per-column squared L2 norms (global over the sharded row axis)."""
    Xa = X.astype(_acc_dtype(X))
    return jnp.sum(Xa * Xa, axis=0)


def relative_error(A: jax.Array, W: jax.Array, H: jax.Array) -> jax.Array:
    """||A - W H||_F / ||A||_F  (reference pyDNMF.py:204-210)."""
    R = A - matmul(W, H)
    return fro_norm(R) / fro_norm(A)


def column_error(A: jax.Array, W: jax.Array, H: jax.Array) -> jax.Array:
    """Per-global-column relative L2 error, length-n vector
    (reference pyDNMF.py:220-239)."""
    R = A - matmul(W, H)
    num = col_sqnorms(R)
    den = col_sqnorms(A)
    return jnp.sqrt(num / den)


def kl_divergence(A: jax.Array, W: jax.Array, H: jax.Array,
                  eps: float) -> jax.Array:
    """Generalized KL divergence D(A || WH) = sum(A log(A/WH) - A + WH)."""
    WH = matmul(W, H).astype(_acc_dtype(A)) + eps
    Aa = A.astype(_acc_dtype(A))
    return jnp.sum(jnp.where(Aa > 0, Aa * jnp.log((Aa + eps) / WH), 0.0)
                   - Aa + WH)


def normalize_features(W: jax.Array, H: jax.Array, eps: float):
    """L1-normalize W columns, rescale H rows (reference pyDNMF.py:184-194)."""
    s = sum_axis(W, axis=0)[None, :]
    W = W / (s + eps)
    H = H * s.T
    return W, H
