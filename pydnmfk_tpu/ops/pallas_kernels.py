"""Pallas TPU kernels for the NMF hot path.

The KL MU update needs UHT = U @ H^T and WTU = W^T @ U where
U = A / (W H + eps) is an m x n intermediate.  The reference materializes U
every iteration (dist_nmf.py:806,312,338) and so does plain XLA (U is a
matmul operand, so fusion cannot elide it).  These kernels compute the
products tile-by-tile with U living only in VMEM — flash-attention-style —
cutting HBM traffic from (3 reads + 1 write) of an A-sized buffer to one
read of A, and halving peak memory.

Grid layout: (row_tiles, col_tiles) with the column dimension innermost.
For each row-tile i the kernel accumulates sum_j U_ij @ H_j^T into the
(TM, k) output block (revisited across j — Pallas keeps it in VMEM);
the WTU kernel mirrors this with the row dimension innermost.
k is padded to the 128-lane boundary at the caller.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad_to(x, mult, axis):
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x, 0
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), pad


def matmul_compute_dtype(a_dtype):
    """In-kernel dot-OPERAND dtype for the fused kernels.

    Integer-quantized A computes in bf16 (exact for 8-bit values); floats
    keep their dtype EXCEPT f32 on TPU under the default matmul
    precision: XLA's standard path lowers f32 dots to bf16 operands with
    f32 accumulation there, so an in-kernel f32 dot pays multi-pass MXU
    time the two-pass XLA path never pays — exactly why the f32 fused
    rows used to lose (docs/PERFORMANCE.md).  A user-requested high
    precision (``jax.default_matmul_precision('highest'/'float32')`` /
    cfg.matmul_precision) keeps true-f32 operands, matching the standard
    path under the same setting."""
    import jax
    import numpy as np
    if jnp.issubdtype(jnp.dtype(a_dtype), jnp.integer):
        return jnp.bfloat16
    if (jnp.dtype(a_dtype) == jnp.float32
            and jax.default_backend() == "tpu"
            and jax.config.jax_default_matmul_precision in (
                None, "default", "fastest", "bfloat16")):
        return jnp.bfloat16
    return jnp.dtype(a_dtype)


def fit_tile(dim: int, target: int, mult: int = 8, floor: int = 64) -> int:
    """Largest tile <= target that divides dim (multiple of `mult`), so the
    grid needs no padding — jnp.pad would COPY the operand, which for the
    A matrix at flagship scale (8.8 GB) blows HBM on its own.  Falls back to
    `target` (pad path) only when dim is small+ragged or has no usable
    divisor >= floor (the pad copy is then either tiny or unavoidable)."""
    if dim <= target:
        return dim if dim % mult == 0 else target
    for t in range(target // mult * mult, floor - 1, -mult):
        if dim % t == 0:
            return t
    return target


# ---------------------------------------------------------------------------
# UHT = (A / (W H + eps)) @ H^T        A:(m,n)  W:(m,k)  H:(k,n) -> (m,k)
# ---------------------------------------------------------------------------
def _uht_kernel(a_ref, w_ref, h_ref, eps_ref, out_ref):
    j = pl.program_id(1)
    wh = jnp.dot(w_ref[:], h_ref[:], preferred_element_type=jnp.float32)
    u = a_ref[:].astype(jnp.float32) / (wh + eps_ref[0, 0])
    part = jnp.dot(u, h_ref[:].T, preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        out_ref[:] = part

    @pl.when(j != 0)
    def _():
        out_ref[:] = out_ref[:] + part


# ---------------------------------------------------------------------------
# WTU = W^T @ (A / (W H + eps))        -> (k, n)
# ---------------------------------------------------------------------------
def _wtu_kernel(a_ref, w_ref, h_ref, eps_ref, out_ref):
    i = pl.program_id(1)          # row dimension is innermost here
    wh = jnp.dot(w_ref[:], h_ref[:], preferred_element_type=jnp.float32)
    u = a_ref[:].astype(jnp.float32) / (wh + eps_ref[0, 0])
    part = jnp.dot(w_ref[:].T, u, preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _():
        out_ref[:] = part

    @pl.when(i != 0)
    def _():
        out_ref[:] = out_ref[:] + part


@functools.partial(jax.jit, static_argnames=("tm", "tn"))
def kl_uht_pallas(A, W, H, eps, tm: int = 512, tn: int = 512):
    """Fused (A/(WH+eps)) @ H^T without an HBM-resident U."""
    m, n = A.shape
    k = W.shape[1]
    tm = fit_tile(m, tm)
    tn = fit_tile(n, tn)
    A, pm = _pad_to(A, tm, 0)
    A, pn = _pad_to(A, tn, 1)
    W, _ = _pad_to(W, tm, 0)
    Wp, pk = _pad_to(W, 128, 1)          # pad k to lane width
    Hp, _ = _pad_to(H, 128, 0)
    Hp, _ = _pad_to(Hp, tn, 1)
    mp, np_ = A.shape
    kp = Wp.shape[1]
    # padded-A rows/cols are zero -> U rows 0 (0/(0+eps)); padded H cols are
    # zero so they contribute nothing to U @ H^T; padded k columns of W add
    # zero to WH.  All padding is inert.
    grid = (mp // tm, np_ // tn)
    out = pl.pallas_call(
        _uht_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, kp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tm, kp), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, kp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * mp * np_ * kp,
            bytes_accessed=mp * np_ * A.dtype.itemsize + mp * kp * 4,
            transcendentals=0),
    )(A, Wp, Hp, jnp.asarray([[eps]], jnp.float32))
    return out[:m, :k].astype(A.dtype)


@functools.partial(jax.jit, static_argnames=("tm", "tn"))
def kl_wtu_pallas(A, W, H, eps, tm: int = 512, tn: int = 512):
    """Fused W^T @ (A/(WH+eps)) without an HBM-resident U."""
    m, n = A.shape
    k = W.shape[1]
    tm = fit_tile(m, tm)
    tn = fit_tile(n, tn)
    A, pm = _pad_to(A, tm, 0)
    A, pn = _pad_to(A, tn, 1)
    W, _ = _pad_to(W, tm, 0)
    Wp, pk = _pad_to(W, 128, 1)
    Hp, _ = _pad_to(H, 128, 0)
    Hp, _ = _pad_to(Hp, tn, 1)
    mp, np_ = A.shape
    kp = Wp.shape[1]
    grid = (np_ // tn, mp // tm)         # rows innermost: output revisited
    out = pl.pallas_call(
        _wtu_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tn), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, kp), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, tn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((kp, tn), lambda j, i: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kp, np_), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * mp * np_ * kp,
            bytes_accessed=mp * np_ * A.dtype.itemsize + kp * np_ * 4,
            transcendentals=0),
    )(A, Wp, Hp, jnp.asarray([[eps]], jnp.float32))
    return out[:k, :n].astype(A.dtype)


def pallas_available() -> bool:
    return jax.default_backend() == "tpu"

# Mesh-sharded dispatch lives in ops/kl.py (kl_uht_sharded/kl_wtu_sharded):
# shard_map wraps these per-block kernels and psums over the reduced mesh
# axis, mirroring the reference's UHT_glob/WTU_glob collective structure
# (dist_nmf.py:293-343).  The solver routes through it via the `mesh`
# argument of models/updates.py::mu_kl_step.
