"""Pallas TPU kernels for the ELL sparse products (VERDICT r3 item 1).

Why the XLA path is slow: ``jnp.take(Ht, rcols)`` gathers k-float rows
(k=32 -> 128 bytes) at RANDOM offsets from an HBM-resident table — the
measured rate is ~32 GB/s of (nnz x k) traffic plus a ~3 ms dispatch
floor (ops/ell.py::ell_time_model), ~5% of the v5e's ~800 GB/s stream
bandwidth, because sub-512-byte random HBM reads cannot amortize the DMA
setup.

The kernel fixes the access pattern, not the arithmetic: the WHOLE factor
table (Ht (n, k) for A@Ht, W (m, k) for W^T A) is held in VMEM — at NMF
ranks (k <= 256) that is a few MB for flagship sparse shapes — while the
(dim, w) rvals/rcols tiles stream through the normal Pallas HBM->VMEM
pipeline.  Every gather is then a VMEM gather (orders of magnitude higher
random-access rate), and HBM sees only sequential traffic:
nnz*(val+idx) bytes + one table load + the output.  Roofline per product
drops from nnz*k*4 / 32e9 to ~(nnz*8 + (n+m)*k*4) / 800e9.

The KL ratio variants fuse the per-row W (resp. per-column Ht) tile and
compute u = vals / (<x_row, gathered> + eps) on the VPU before the same
multiply-accumulate — one gather per KL product, as in ops/ell.py.

Gating (ops/ell.py dispatches here): TPU backend, f32 compute, table
fits the VMEM budget, and no vmap batching (the NMFk ELL ensemble keeps
the XLA path — Pallas does not batch over the closed-over table).
Reference: dense-only (dist_nmf.py:118-140); no analog.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

# the factor table must leave room for the streamed tiles + accumulators
_TABLE_VMEM_BUDGET = 10 * 1024 * 1024
_BM = 512                 # rows of rvals/rcols per grid step


def table_fits_vmem(dim: int, k: int, bytes_per: int = 4) -> bool:
    return dim * max(k, 8) * bytes_per <= _TABLE_VMEM_BUDGET


def _pad_rows(x, bm: int, fill=0):
    r = x.shape[0] % bm
    if r:
        x = jnp.pad(x, ((0, bm - r), (0, 0)), constant_values=fill)
    return x


def _kernel(eps_ref, table_ref, vals_ref, idx_ref, x_ref, out_ref, *, w, k,
            ratio):
    """One (BM, w) tile: gather -> (optional KL ratio) -> accumulate."""
    table = table_ref[:]                       # (dim_t, k) VMEM-resident
    idx = idx_ref[:]                           # (BM, w) int32
    vals = vals_ref[:].astype(jnp.float32)     # (BM, w)
    g = jnp.take(table, idx.reshape(-1), axis=0).reshape(
        idx.shape[0], w, k)                    # VMEM gather
    if ratio:
        x = x_ref[:].astype(jnp.float32)       # (BM, k)
        wh = jnp.einsum("bk,bwk->bw", x, g,
                        preferred_element_type=jnp.float32)
        vals = vals / (wh + eps_ref[0])
    out_ref[:] = jnp.einsum("bw,bwk->bk", vals, g,
                            preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("w", "k", "ratio", "interpret"))
def _gather_product_pallas(table, vals, idx, x, eps, *, w: int, k: int,
                           ratio: bool, interpret: bool = False):
    """sum_s vals[b,s] * table[idx[b,s]] -> (dim, k) f32; with ``ratio``
    the coefficient becomes vals / (<x_b, table[idx[b,s]]> + eps)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dim = vals.shape[0]
    vals = _pad_rows(vals, _BM)
    idx = _pad_rows(idx, _BM)
    dim_pad = vals.shape[0]
    if x is None:
        x_in = jnp.zeros((dim_pad, 1), jnp.float32)   # placeholder
        x_spec = pl.BlockSpec((_BM, 1), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    else:
        x_in = _pad_rows(x.astype(jnp.float32), _BM)
        x_spec = pl.BlockSpec((_BM, k), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    dim_t = table.shape[0]
    kernel = functools.partial(_kernel, w=w, k=k, ratio=ratio)
    out = pl.pallas_call(
        kernel,
        grid=(dim_pad // _BM,),
        in_specs=[
            pl.BlockSpec((1,), lambda i: (0,),
                         memory_space=pltpu.SMEM),      # runtime KL eps
            pl.BlockSpec((dim_t, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),      # whole table
            pl.BlockSpec((_BM, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BM, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            x_spec,
        ],
        out_specs=pl.BlockSpec((_BM, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((dim_pad, k), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(eps, jnp.float32).reshape(1),
      table.astype(jnp.float32), vals, idx, x_in)
    return out[:dim]


def use_pallas_ell(A, k: int) -> bool:
    """Dispatch test used by ops/ell.py: single-chip TPU f32 compute with
    both orientation tables VMEM-resident."""
    if jax.default_backend() != "tpu":
        return False
    m, n = A.shape
    return table_fits_vmem(n, k) and table_fits_vmem(m, k)


def ell_gather_product(vals, idx, M, ratio_with=None, eps=None,
                       interpret=False):
    """Drop-in for ops/ell.py::_gather_product on the Pallas path.

    M is the (dim_t, k) table (already transposed for the row
    orientation); returns f32 like the XLA path's accumulator.  ``eps``
    is the solver's KL epsilon (finfo eps of the compute dtype)."""
    dim, w = vals.shape
    k = M.shape[1]
    if eps is None:
        eps = jnp.finfo(jnp.float32).eps
    return _gather_product_pallas(M, vals, idx, ratio_with, eps, w=w, k=k,
                                  ratio=ratio_with is not None,
                                  interpret=interpret)
