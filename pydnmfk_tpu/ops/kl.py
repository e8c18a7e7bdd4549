"""KL-divergence inner products with bounded memory.

The KL MU update needs two products of the ratio matrix U = A / (W H + eps):

    UHT = U @ H^T     (m, k)   -- for the W update   (reference glob_UX axis=0,
                                  dist_nmf.py:803-811; 2D UHT_glob :320-343)
    WTU = W^T @ U     (k, n)   -- for the H update   (reference glob_UX axis=1;
                                  2D WTU_glob :293-318)

The reference materializes the full local m x n ratio block every iteration
(dist_nmf.py:806, :312, :338).  Here the default path also materializes U
(XLA fuses the divide into the surrounding ops, and U is the same size as the
dense A that is already resident), but a chunked path bounds the intermediate
to ``chunk`` rows at a time via ``lax.scan`` — the flash-attention-style
fix for very large m where 2x A-sized HBM traffic is the bottleneck.
A fused Pallas kernel (ops/pallas_kernels.py) replaces this on TPU when
enabled, keeping U entirely in VMEM tiles.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .linalg import matmul


def _ratio(A, W, H, eps):
    return A / (matmul(W, H) + eps)


def kl_uht(A: jax.Array, W: jax.Array, H: jax.Array, eps: float,
           chunk: int = 0, use_pallas: bool = False) -> jax.Array:
    """(A / (W H + eps)) @ H^T without materializing U when chunk > 0 or
    use_pallas (TPU fused kernel)."""
    if use_pallas:
        from .pallas_kernels import kl_uht_pallas
        return kl_uht_pallas(A, W, H, eps)
    if not chunk or chunk >= A.shape[0]:
        return matmul(_ratio(A, W, H, eps), H.T)
    return _chunked(A, W, H, eps, chunk, want="uht")


def kl_wtu(A: jax.Array, W: jax.Array, H: jax.Array, eps: float,
           chunk: int = 0, use_pallas: bool = False) -> jax.Array:
    """W^T @ (A / (W H + eps)) without materializing U when chunk > 0 or
    use_pallas (TPU fused kernel)."""
    if use_pallas:
        from .pallas_kernels import kl_wtu_pallas
        return kl_wtu_pallas(A, W, H, eps)
    if not chunk or chunk >= A.shape[0]:
        return matmul(W.T, _ratio(A, W, H, eps))
    return _chunked(A, W, H, eps, chunk, want="wtu")


def _chunked(A, W, H, eps, chunk, want):
    """Scan over row-blocks of A and W; only a (chunk, n) slab of U lives."""
    m, n = A.shape
    k = W.shape[1]
    nchunks = -(-m // chunk)
    pad = nchunks * chunk - m
    if pad:
        # zero rows of A and W contribute zero to both products
        A = jnp.pad(A, ((0, pad), (0, 0)))
        W = jnp.pad(W, ((0, pad), (0, 0)))
    Ab = A.reshape(nchunks, chunk, n)
    Wb = W.reshape(nchunks, chunk, k)

    if want == "uht":
        def body(_, blk):
            a, w = blk
            u = a / (matmul(w, H) + eps)
            return None, matmul(u, H.T)
        _, out = lax.scan(body, None, (Ab, Wb))
        out = out.reshape(nchunks * chunk, k)
        return out[:m] if pad else out
    else:
        def body(acc, blk):
            a, w = blk
            u = a / (matmul(w, H) + eps)
            return acc + matmul(w.T, u), None
        acc0 = jnp.zeros((k, n), dtype=jnp.result_type(A.dtype, W.dtype))
        acc, _ = lax.scan(body, acc0, (Ab, Wb))
        return acc
