"""Sparse-A products as gather + segment-sum primitives.

The reference is dense-only (its extreme-scale runs, docs/scalability.png,
were dense matrices); sparse A is a capability extension.  Everything here
is written on the raw (data, rows, cols) triplet of a canonical BCOO
matrix (unique, de-duplicated indices) using plain ``lax`` gathers and
``segment_sum`` scatters rather than ``jax.experimental.sparse`` matmul
primitives, for two reasons:

* ``bcoo_dot_general_sampled``'s default lowering materializes the dense
  m x n product and extracts — exactly the allocation sparse storage is
  supposed to avoid.  The gather form is O(nnz * k) and chunkable.
* gathers/segment_sums are ordinary dense ops with trivial ``vmap``
  batching rules, so the NMFk ensemble can map a batch of perturbed
  ``data`` vectors over shared ``indices`` (models/nmfk.py) without
  relying on BCOO batching support.

KL on sparse data is *exact* relative to the dense formula: the ratio
U = A / (W H + eps) is identically zero wherever A is zero, so U shares
A's sparsity pattern and the two MU products only ever touch nnz entries
(reference dense formula: dist_nmf.py:803-811).

The (nnz, k) gather intermediates are bounded by an nnz-chunked
``fori_loop`` when they would exceed ~512 MB (mirrors
linalg.error_chunk_rows' policy for the dense residual).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .linalg import _acc_dtype


def nnz_chunk_size(nnz: int, k: int, budget_elems: int = 1 << 27) -> int:
    """0 (direct) while the (nnz, k) gather intermediate stays under
    ~budget_elems elements; otherwise an nnz block size inside the budget."""
    if nnz * max(k, 1) <= budget_elems:
        return 0
    return max(1024, (budget_elems // max(k, 1)) // 8 * 8)


def _rows_cols(indices):
    return indices[..., 0], indices[..., 1]


def sddmm(W, H, rows, cols, chunk: int = 0):
    """(W @ H) sampled at (rows, cols) -> (nnz,), f32/f64 accumulation;
    never forms the dense product."""
    acc = _acc_dtype(W)

    def block(r, c):
        wg = W.astype(acc)[r]                  # (b, k)
        hg = H.astype(acc)[:, c]               # (k, b)
        return jnp.sum(wg * hg.T, axis=1)

    nnz = rows.shape[0]
    if not chunk or chunk >= nnz:
        return block(rows, cols)
    n_full = nnz // chunk
    e1 = n_full * chunk

    def body(i, out):
        r = lax.dynamic_slice_in_dim(rows, i * chunk, chunk, 0)
        c = lax.dynamic_slice_in_dim(cols, i * chunk, chunk, 0)
        return lax.dynamic_update_slice_in_dim(out, block(r, c),
                                               i * chunk, 0)

    out = jnp.zeros((nnz,), acc)
    out = lax.fori_loop(0, n_full, body, out)
    if e1 < nnz:
        out = out.at[e1:].set(block(rows[e1:], cols[e1:]))
    return out


def a_ht(data, rows, cols, H, m: int, chunk: int = 0):
    """A @ H^T -> (m, k) from triplet A; segment-sum over rows."""
    acc = _acc_dtype(H)
    k = H.shape[0]

    def block(d, r, c):
        vals = d.astype(acc)[:, None] * H.astype(acc)[:, c].T   # (b, k)
        return jax.ops.segment_sum(vals, r, num_segments=m)

    nnz = data.shape[0]
    if not chunk or chunk >= nnz:
        return block(data, rows, cols)
    n_full = nnz // chunk
    e1 = n_full * chunk

    def body(i, out):
        d = lax.dynamic_slice_in_dim(data, i * chunk, chunk, 0)
        r = lax.dynamic_slice_in_dim(rows, i * chunk, chunk, 0)
        c = lax.dynamic_slice_in_dim(cols, i * chunk, chunk, 0)
        return out + block(d, r, c)

    out = lax.fori_loop(0, n_full, body, jnp.zeros((m, k), acc))
    if e1 < nnz:
        out = out + block(data[e1:], rows[e1:], cols[e1:])
    return out


def wt_a(data, rows, cols, W, n: int, chunk: int = 0):
    """W^T @ A -> (k, n) from triplet A; segment-sum over cols."""
    acc = _acc_dtype(W)
    k = W.shape[1]

    def block(d, r, c):
        vals = d.astype(acc)[:, None] * W.astype(acc)[r]        # (b, k)
        return jax.ops.segment_sum(vals, c, num_segments=n)

    nnz = data.shape[0]
    if not chunk or chunk >= nnz:
        return block(data, rows, cols).T
    n_full = nnz // chunk
    e1 = n_full * chunk

    def body(i, out):
        d = lax.dynamic_slice_in_dim(data, i * chunk, chunk, 0)
        r = lax.dynamic_slice_in_dim(rows, i * chunk, chunk, 0)
        c = lax.dynamic_slice_in_dim(cols, i * chunk, chunk, 0)
        return out + block(d, r, c)

    out = lax.fori_loop(0, n_full, body, jnp.zeros((n, k), acc))
    if e1 < nnz:
        out = out + block(data[e1:], rows[e1:], cols[e1:])
    return out.T


def col_sqsum(data, cols, n: int):
    """Per-column sum of squares -> (n,), f32/f64 accumulation."""
    d = data.astype(_acc_dtype(data))
    return jax.ops.segment_sum(d * d, cols, num_segments=n)


# ---------------------------------------------------------------------------
# Row-block-sharded triplets: multi-device sparse (1D row mesh).
#
# The reference's 1D row topology (p_c == 1: A and W row-split, H
# replicated — pyDNMF.py:83-87) applied to the triplet format: device d
# holds the nnz entries of row-block d with LOCAL row indices, blocks
# nnz-padded to equal length with zero-data entries (zero data contributes
# nothing to any product, so padding is exact).  Products run per block
# under shard_map; W^T A and the column reductions psum over 'r' — the
# same collective contract as the dense 1D path.
# ---------------------------------------------------------------------------
@jax.tree_util.register_pytree_node_class
class RowShardedSparse:
    """(data, lrows, cols) each (p * e_max,) sharded P('r'); `shape` is the
    padded global (m, n) with m == p * block_rows."""

    _pydnmfk_sparse = True            # recognized by linalg.is_sparse

    def __init__(self, data, lrows, cols, shape, block_rows, mesh):
        self.data = data
        self.lrows = lrows
        self.cols = cols
        self.shape = tuple(shape)
        self.block_rows = int(block_rows)
        self.mesh = mesh

    def tree_flatten(self):
        return ((self.data, self.lrows, self.cols),
                (self.shape, self.block_rows, self.mesh))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def nse(self):
        return self.data.shape[0]

    @property
    def dtype(self):
        return self.data.dtype


def shard_sparse_rows(A, ctx):
    """BCOO -> RowShardedSparse on ctx's (p, 1) mesh.  Returns
    (sharded, m_pad) — rows are zero-padded to tile evenly; slice factor
    rows back with [:m] at the API boundary (models/nmf.py does)."""
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..parallel.mesh import ROW_AXIS

    p_r, p_c = ctx.shape
    if p_c != 1 or ctx.p_e != 1:
        raise ValueError(
            "sharded sparse supports the 1D row topology (p_c == 1, "
            "p_e == 1); got grid " + str(ctx.shape))
    m, n = A.shape
    m_pad = -(-m // p_r) * p_r
    block = m_pad // p_r
    rows = np.asarray(A.indices[:, 0])
    cols = np.asarray(A.indices[:, 1])
    data = np.asarray(A.data)
    blk = rows // block
    counts = np.bincount(blk, minlength=p_r)
    e_max = max(int(counts.max()), 1)
    d_p = np.zeros((p_r, e_max), data.dtype)
    r_p = np.zeros((p_r, e_max), np.int32)
    c_p = np.zeros((p_r, e_max), np.int32)
    for b in range(p_r):
        sel = blk == b
        cnt = int(counts[b])
        d_p[b, :cnt] = data[sel]
        r_p[b, :cnt] = rows[sel] - b * block
        c_p[b, :cnt] = cols[sel]
    sh = NamedSharding(ctx.mesh, P(ROW_AXIS))
    put = lambda x: jax.device_put(jnp.asarray(x.reshape(-1)), sh)
    return RowShardedSparse(put(d_p), put(r_p), put(c_p),
                            (m_pad, n), block, ctx.mesh), m_pad


def _rs_shard_map(fn, A, in_extra, out_spec):
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:                      # older jax
        from jax.experimental.shard_map import shard_map
    from ..parallel.mesh import ROW_AXIS
    specs = (P(ROW_AXIS), P(ROW_AXIS), P(ROW_AXIS)) + tuple(
        s for _, s in in_extra)
    args = (A.data, A.lrows, A.cols) + tuple(a for a, _ in in_extra)
    return shard_map(fn, mesh=A.mesh, in_specs=specs, out_specs=out_spec,
                     check_vma=False)(*args)


def rs_a_ht(A, H):
    """A @ H^T -> (m, k) sharded P('r', None); purely local per block."""
    from jax.sharding import PartitionSpec as P
    from ..parallel.mesh import ROW_AXIS
    block = A.block_rows
    chunk = nnz_chunk_size(A.nse // A.mesh.shape[ROW_AXIS], H.shape[0])

    def local(d, r, c, h):
        return a_ht(d, r, c, h, block, chunk).astype(
            jnp.result_type(d.dtype, h.dtype))

    return _rs_shard_map(local, A, [(H, P(None, None))], P(ROW_AXIS, None))


def rs_wt_a(A, W):
    """W^T A -> (k, n) replicated; local partials psum over 'r' (the dense
    1D path's allreduce, reference dist_nmf.py:729-751)."""
    from jax import lax
    from jax.sharding import PartitionSpec as P
    from ..parallel.mesh import ROW_AXIS
    n = A.shape[1]
    chunk = nnz_chunk_size(A.nse // A.mesh.shape[ROW_AXIS], W.shape[1])

    def local(d, r, c, w):
        part = wt_a(d, r, c, w, n, chunk)
        return lax.psum(part, ROW_AXIS).astype(
            jnp.result_type(d.dtype, w.dtype))

    return _rs_shard_map(local, A, [(W, P(ROW_AXIS, None))], P(None, None))


def rs_kl_uht(A, W, H, eps):
    from jax.sharding import PartitionSpec as P
    from ..parallel.mesh import ROW_AXIS
    block = A.block_rows
    chunk = nnz_chunk_size(A.nse // A.mesh.shape[ROW_AXIS], W.shape[1])

    def local(d, r, c, w, h):
        wh = sddmm(w, h, r, c, chunk)
        u = d.astype(wh.dtype) / (wh + eps)
        return a_ht(u, r, c, h, block, chunk).astype(
            jnp.result_type(d.dtype, w.dtype))

    return _rs_shard_map(local, A, [(W, P(ROW_AXIS, None)),
                                    (H, P(None, None))], P(ROW_AXIS, None))


def rs_kl_wtu(A, W, H, eps):
    from jax import lax
    from jax.sharding import PartitionSpec as P
    from ..parallel.mesh import ROW_AXIS
    n = A.shape[1]
    chunk = nnz_chunk_size(A.nse // A.mesh.shape[ROW_AXIS], W.shape[1])

    def local(d, r, c, w, h):
        wh = sddmm(w, h, r, c, chunk)
        u = d.astype(wh.dtype) / (wh + eps)
        part = wt_a(u, r, c, w, n, chunk)
        return lax.psum(part, ROW_AXIS).astype(
            jnp.result_type(d.dtype, w.dtype))

    return _rs_shard_map(local, A, [(W, P(ROW_AXIS, None)),
                                    (H, P(None, None))], P(None, None))


def rs_col_sqsum(A, n: int):
    """Per-column sum of squared values -> (n,) replicated."""
    from jax import lax
    from jax.sharding import PartitionSpec as P
    from ..parallel.mesh import ROW_AXIS

    def local(d, r, c):
        return lax.psum(col_sqsum(d, c, n), ROW_AXIS)

    return _rs_shard_map(local, A, [], P(None))


# ---------------------------------------------------------------------------
# backend dispatch: sparse-as-compute only pays on CPU
# ---------------------------------------------------------------------------
def densify_for_backend(A, budget_frac: float = 0.45):
    """On non-CPU backends, convert a sparse A to dense on the host.

    Measured on the v5e: XLA's TPU scatter lowering executes the
    segment_sum products orders of magnitude slower than the MXU dense
    path (a 1024x256 KL solve that takes seconds dense did not finish in
    14 minutes sparse), so on TPU sparse input is treated as a *storage*
    format and the dense solver runs.  Guarded by the device memory
    budget: if the densified matrix cannot fit, the error tells the user
    to run the CPU backend, where the gather/segment triplet path is
    efficient.  A true TPU SpMM needs a Pallas kernel (docs/ROADMAP.md).
    """
    from .linalg import is_sparse
    if not is_sparse(A) or isinstance(A, RowShardedSparse):
        return A                      # already committed to the triplet path
    import jax
    if jax.default_backend() == "cpu":
        return A
    from ..utils.memory import device_memory_budget
    import numpy as np
    m, n = A.shape
    need = m * n * jnp.dtype(A.data.dtype).itemsize
    budget = device_memory_budget()
    if need > budget_frac * budget:
        raise ValueError(
            f"sparse A would densify to {need / 1e9:.2f} GB "
            f"(> {budget_frac:.0%} of the {budget / 1e9:.0f} GB device "
            "budget). The XLA TPU scatter lowering makes the sparse "
            "triplet path impractical on TPU; run on the CPU backend "
            "(jax.config.update('jax_platforms', 'cpu') / --cpu) where "
            "the gather/segment path is efficient.")
    dense = np.zeros(A.shape, A.data.dtype)
    dense[np.asarray(A.indices[:, 0]),
          np.asarray(A.indices[:, 1])] = np.asarray(A.data)
    return jnp.asarray(dense)


# ---------------------------------------------------------------------------
# BCOO-facing wrappers
# ---------------------------------------------------------------------------
def _triplet(A):
    if A.indices.ndim != 2 or A.data.ndim != 1:
        raise ValueError(
            "sparse A must be an unbatched 2-D BCOO (n_batch=0, n_dense=0) "
            f"with canonical indices; got data {A.data.shape}, "
            f"indices {A.indices.shape}")
    rows, cols = _rows_cols(A.indices)
    return A.data, rows, cols


def a_ht_bcoo(A, H, chunk: int = 0):
    data, rows, cols = _triplet(A)
    return a_ht(data, rows, cols, H, A.shape[0], chunk).astype(
        jnp.result_type(A.data.dtype, H.dtype))


def wt_a_bcoo(A, W, chunk: int = 0):
    data, rows, cols = _triplet(A)
    return wt_a(data, rows, cols, W, A.shape[1], chunk).astype(
        jnp.result_type(A.data.dtype, W.dtype))


def kl_uht_sparse(A, W, H, eps, chunk: int = 0):
    """(A / (W H + eps)) @ H^T for sparse A: the ratio U is zero wherever
    A is (0 / x == 0), so only nnz entries exist.  Exact vs the dense
    reference formula (dist_nmf.py:803-811)."""
    data, rows, cols = _triplet(A)
    wh = sddmm(W, H, rows, cols, chunk)
    u = data.astype(wh.dtype) / (wh + eps)
    return a_ht(u, rows, cols, H, A.shape[0], chunk).astype(
        jnp.result_type(A.data.dtype, W.dtype))


def kl_wtu_sparse(A, W, H, eps, chunk: int = 0):
    """W^T @ (A / (W H + eps)) for sparse A; see kl_uht_sparse."""
    data, rows, cols = _triplet(A)
    wh = sddmm(W, H, rows, cols, chunk)
    u = data.astype(wh.dtype) / (wh + eps)
    return wt_a(u, rows, cols, W, A.shape[1], chunk).astype(
        jnp.result_type(A.data.dtype, W.dtype))
