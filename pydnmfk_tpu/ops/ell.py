"""ELL-packed sparse A: the TPU compute format for the VERY sparse regime.

Measured on the v5e (tools/sparse_probe.py): element-level sparse products
on TPU are gather-bound — XLA's row gather sustains ~0.25 Gnnz/s at k=32
while the dense MXU path streams A at HBM bandwidth, so the crossover is at
density ~0.3% (k=32; scales ~1/k).  Below that — and in the beyond-HBM
regime where even a bf16 densified A cannot fit — this module wins; above
it, ``densify_for_backend``'s dtype ladder keeps the MXU path (the policy
is measurement-driven, ops/sparse.py::densify_for_backend).

Format: classic ELLPACK in BOTH orientations (no scatter ever):

    rvals/rcols : (m, w_r)  per-row values / column indices (CSR-ELL)
    cvals/crows : (n, w_c)  per-column values / row indices (CSC-ELL)

padding slots carry (val=0, idx=0) — inert in every product since the
value multiplies the gathered vector.  Products are gather + dense einsum:

    A @ H^T  = einsum('rw,rwk->rk', rvals, Ht[rcols])
    W^T @ A  = einsum('cw,cwk->ck', cvals, W[crows]).T

and the KL ratio U = A/(WH+eps) is formed per orientation from the SAME
gathered blocks (U is zero wherever A is, exactly as in ops/sparse.py), so
each KL product costs one gather.  Row/column blocks are chunked through a
``fori_loop`` so the (block, w, k) gather intermediate stays bounded.

The reference is dense-only (its extreme-scale runs were dense matrices);
this is a capability extension with no reference analog.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .linalg import _acc_dtype


@jax.tree_util.register_pytree_node_class
class EllSparse:
    """Dual-orientation ELLPACK matrix (see module docstring)."""

    _pydnmfk_sparse = True            # recognized by linalg.is_sparse

    def __init__(self, rvals, rcols, cvals, crows, shape, nse):
        self.rvals = rvals
        self.rcols = rcols
        self.cvals = cvals
        self.crows = crows
        self.shape = tuple(shape)
        self.nse = nse

    def tree_flatten(self):
        return ((self.rvals, self.rcols, self.cvals, self.crows),
                (self.shape, self.nse))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def dtype(self):
        return self.rvals.dtype

    @property
    def data(self):
        """Values view (padding slots are zero — inert in sums/norms)."""
        return self.rvals

    def astype(self, dtype):
        return EllSparse(self.rvals.astype(dtype), self.rcols,
                         self.cvals.astype(dtype), self.crows,
                         self.shape, self.nse)


def ell_pack(A, max_blowup: float = 4.0, return_perms: bool = False):
    """BCOO -> EllSparse on the host.  Returns None when the row/column
    nnz distribution is too skewed (max width > max_blowup * mean + 8):
    the padded storage would defeat the point of sparsity — callers fall
    back to the densify ladder.

    ``return_perms=True`` additionally returns (rperm (m, w_r),
    cperm (n, w_c)): ELL slot -> ORIGINAL nnz index maps (padding slots =
    nnz).  The NMFk ensemble perturbs the flat COO data vector and
    gathers it into both orientations through these, keeping member noise
    streams identical to the BCOO path."""
    import numpy as np
    m, n = A.shape
    rows = np.asarray(A.indices[:, 0])
    cols = np.asarray(A.indices[:, 1])
    vals = np.asarray(A.data)
    nnz = vals.shape[0]
    if nnz == 0:
        return None

    def pack(keys, others, vals, dim):
        counts = np.bincount(keys, minlength=dim)
        w = max(int(counts.max()), 1)
        if w > max_blowup * max(nnz / dim, 1.0) + 8:
            return None
        order = np.argsort(keys, kind="stable")
        ks, os_, vs = keys[order], others[order], vals[order]
        starts = np.zeros(dim + 1, np.int64)
        starts[1:] = np.cumsum(counts)
        slot = np.arange(nnz) - starts[ks]
        v = np.zeros((dim, w), vals.dtype)
        i = np.zeros((dim, w), np.int32)
        p = np.full((dim, w), nnz, np.int32)
        v[ks, slot] = vs
        i[ks, slot] = os_
        p[ks, slot] = order
        return v, i, p

    r = pack(rows, cols, vals, m)
    c = pack(cols, rows, vals, n)
    if r is None or c is None:
        return None
    E = EllSparse(jnp.asarray(r[0]), jnp.asarray(r[1]),
                  jnp.asarray(c[0]), jnp.asarray(c[1]), (m, n), nnz)
    if return_perms:
        return E, jnp.asarray(r[2]), jnp.asarray(c[2])
    return E


# ---------------------------------------------------------------------------
# products (generic over orientation): out[b] = sum_s vals[b,s] * M[idx[b,s]]
# optionally through the sampled ratio u = vals / (<G, x_b> + eps)
# ---------------------------------------------------------------------------
def _block_rows(dim: int, w: int, k: int,
                budget_elems: int = 1 << 26) -> int:
    """Rows per chunk so the (block, w, k) gather stays under ~256 MB."""
    per_row = max(w * k, 1)
    if dim * per_row <= budget_elems:
        return dim
    return max(8, (budget_elems // per_row) // 8 * 8)


def _gather_product(vals, idx, M, ratio_with=None, eps=0.0):
    """sum_s vals[b,s] * M[idx[b,s]] -> (dim, k); with ``ratio_with`` (a
    (dim, k) matrix X) the coefficient becomes the KL ratio
    vals / (sum_k X[b,k] M[idx[b,s],k] + eps) * ... i.e. U-slot values."""
    acc = _acc_dtype(M)
    dim, w = vals.shape
    k = M.shape[1]
    Ma = M.astype(acc)

    def block(v, i, x):
        g = jnp.take(Ma, i.reshape(-1), axis=0).reshape(v.shape[0], w, k)
        coef = v.astype(acc)
        if x is not None:
            wh = jnp.einsum("bk,bwk->bw", x.astype(acc), g,
                            preferred_element_type=acc)
            coef = coef / (wh + eps)
        return jnp.einsum("bw,bwk->bk", coef, g,
                          preferred_element_type=acc)

    bm = _block_rows(dim, w, k)
    if bm >= dim:
        return block(vals, idx, ratio_with)
    n_full = dim // bm
    d1 = n_full * bm

    def body(t, out):
        v = lax.dynamic_slice_in_dim(vals, t * bm, bm, 0)
        i = lax.dynamic_slice_in_dim(idx, t * bm, bm, 0)
        x = (None if ratio_with is None
             else lax.dynamic_slice_in_dim(ratio_with, t * bm, bm, 0))
        return lax.dynamic_update_slice_in_dim(out, block(v, i, x),
                                               t * bm, 0)

    out = jnp.zeros((dim, k), acc)
    out = lax.fori_loop(0, n_full, body, out)
    if d1 < dim:
        x = None if ratio_with is None else ratio_with[d1:]
        out = out.at[d1:].set(block(vals[d1:], idx[d1:], x))
    return out


def ell_a_ht(A: EllSparse, H):
    """A @ H^T -> (m, k)."""
    out = _gather_product(A.rvals, A.rcols, H.T)
    return out.astype(jnp.result_type(A.dtype, H.dtype))


def ell_wt_a(A: EllSparse, W):
    """W^T @ A -> (k, n)."""
    out = _gather_product(A.cvals, A.crows, W)
    return out.T.astype(jnp.result_type(A.dtype, W.dtype))


def ell_kl_uht(A: EllSparse, W, H, eps):
    """(A / (WH + eps)) @ H^T -> (m, k); U shares A's sparsity pattern."""
    out = _gather_product(A.rvals, A.rcols, H.T, ratio_with=W, eps=eps)
    return out.astype(jnp.result_type(A.dtype, W.dtype))


def ell_kl_wtu(A: EllSparse, W, H, eps):
    """W^T @ (A / (WH + eps)) -> (k, n)."""
    out = _gather_product(A.cvals, A.crows, W, ratio_with=H.T, eps=eps)
    return out.T.astype(jnp.result_type(A.dtype, W.dtype))


def ell_col_sqsum(A: EllSparse):
    """Per-column sum of squares -> (n,)."""
    c = A.cvals.astype(_acc_dtype(A.cvals))
    return jnp.sum(c * c, axis=1)


def ell_time_model(m: int, n: int, nse: int, k: int,
                   a_bytes: int = 4) -> tuple:
    """(t_ell, t_dense) rough per-product seconds on one v5e, from
    measured rates (tools/sparse_probe.py + BENCH_r03): gather ~32 GB/s
    of (nnz x k) f32 traffic PLUS a ~3 ms per-product dispatch/fusion
    floor (measured: at 16384^2 d=5e-4 the ELL solve is overhead-bound
    and loses to dense), vs dense streaming A at ~700 GB/s.  Net: ELL
    wins for very sparse matrices with LARGE m*n (>~10^9 elements) and
    always in the beyond-HBM regime.  Used by the densify policy; coarse
    on purpose."""
    t_ell = 3e-3 + nse * max(k, 8) * 4 / 32e9
    t_dense = m * n * a_bytes / 700e9
    return t_ell, t_dense
