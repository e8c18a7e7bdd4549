"""One-pass fused KL-MU iteration (Pallas TPU).

A standard KL iteration reads A twice: once for UHT = U @ H^T (W update,
U = A/(WH+eps), reference UHT_glob dist_nmf.py:320-343) and once for
WTU = W'^T @ U' (H update, WTU_glob :293-318, with U' recomputed from the
UPDATED W').  At f32 on v5e the step is A-bandwidth-bound (two 8.8 GB reads
= 21.5 ms/iter floor at the flagship 57600x38400 shape; the MXU is mostly
idle at k=32), so the second sweep is pure waste.

Key observation: the updated W row-panel depends only on its own rows,

    W'_i = W_i * (U_i @ H^T) / (rowsum(H) + eps),

so a single pass over row-panels of A can produce W' AND accumulate
W'^T U' on the fly, recomputing the cheap W-panel x H products in VMEM:

    per panel i (A_i resident in VMEM once):
        U_i    = A_i / (W_i @ H + eps)
        W'_i   = W_i * (U_i @ H^T) / (hrs + eps)
        U'_i   = A_i / (W'_i @ H + eps)          (second product, same A_i)
        WTU   += W'_i^T @ U'_i

The H update (elementwise with WTU / colsum(W')) runs as plain XLA
afterwards — it touches only k-sized data.  Net: ONE A read per iteration;
floor 10.7 ms f32 / 5.4 ms bf16-A at the flagship shape.

Numerics match models/updates.mu_kl_step up to f32 accumulation order
(W' is computed from identical per-panel values; WTU accumulates over
panels instead of one big dot).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import linalg
from .pallas_kernels import fit_tile


def _fused_kl_kernel(a_ref, w_ref, h_ref, hrs_ref, eps_ref,
                     w_out_ref, wtu_ref):
    i = pl.program_id(0)
    eps = eps_ref[0, 0]
    # feed the MXU in the compute dtype = H block's dtype (the standard
    # TPU mixed-precision recipe, ops/linalg.py::matmul): bf16-A runs
    # single-pass bf16 dots with f32 accumulation; f32-A keeps everything
    # f32; integer-quantized A computes in bf16 (exact for 8-bit values)
    nd = h_ref.dtype
    a = a_ref[:]
    if jnp.issubdtype(a.dtype, jnp.integer):
        # mosaic lacks unsigned->float casts; route uint8 -> int32 first
        a = a.astype(jnp.int32)
    a = a.astype(jnp.float32)
    w = w_ref[:].astype(jnp.float32)
    h = h_ref[:]                                          # already nd

    wh = jax.lax.dot_general(
        w.astype(nd), h,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (tm, n)
    u = a / (wh + eps)
    uht = jax.lax.dot_general(
        u.astype(nd), h,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (tm, k)
    w_new = w * uht / (hrs_ref[0, :] + eps)
    w_out_ref[:] = w_new.astype(w_out_ref.dtype)

    wh2 = jax.lax.dot_general(
        w_new.astype(nd), h,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    u2 = a / (wh2 + eps)
    wtu_part = jax.lax.dot_general(
        w_new.astype(nd), u2.astype(nd),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (k, n)

    @pl.when(i == 0)
    def _():
        wtu_ref[:] = wtu_part

    @pl.when(i != 0)
    def _():
        wtu_ref[:] = wtu_ref[:] + wtu_part


@functools.partial(jax.jit, static_argnames=("tm",))
def _fused_kl_pass(A, W, H, hrs, eps, tm: int):
    m, n = A.shape
    k = W.shape[1]
    grid = (m // tm,)
    w_new, wtu = pl.pallas_call(
        _fused_kl_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((tm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, k), W.dtype),
            jax.ShapeDtypeStruct((k, n), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * m * n * k,
            bytes_accessed=m * n * A.dtype.itemsize + (m + n) * k * 4,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(A, W, H, hrs.reshape(1, k), jnp.asarray([[eps]], jnp.float32))
    return w_new, wtu


def _pick_tm(m, n, k, itemsize, budget=72 * 1024 * 1024):
    """Row-panel size: resident H + WTU accumulator + double-buffered A
    panels + two (tm, n) f32 scratch slabs (wh/u) must fit the VMEM budget."""
    resident = k * n * (4 + 4)
    per_row = 2 * n * itemsize + 2 * n * 4 + 4 * k * 4
    tm = max(8, (budget - resident) // max(per_row, 1))
    tm = min(int(tm) // 8 * 8, 1024, m)
    return max(tm, 8)


def fused_mu_kl_step(A, W, H, eps, W_update=True, tm=None):
    """One full KL-MU iteration with a single pass over A.

    Matches updates.mu_kl_step numerically (f32 accumulation); requires a
    single shard (wrap in shard_map for meshes)."""
    if not W_update:
        # regression refit touches A once anyway; use the standard path
        from ..models import updates
        return updates.mu_kl_step(A, W, H, eps, W_update=False)
    m, n = A.shape
    k = W.shape[1]
    hrs = linalg.sum_axis(H, axis=1).astype(jnp.float32)
    if tm is None:
        tm = fit_tile(m, _pick_tm(m, n, k, A.dtype.itemsize))
    pad = (-m) % tm
    if pad:
        A = jnp.pad(A, ((0, pad), (0, 0)))
        W = jnp.pad(W, ((0, pad), (0, 0)))
    from .pallas_kernels import matmul_compute_dtype
    cd = matmul_compute_dtype(A.dtype)
    H_k = H.astype(cd) if H.dtype != cd else H
    W_new, WTU = _fused_kl_pass(A, W, H_k, hrs, eps, tm)
    if pad:
        W_new = W_new[:m]
    w_colsum = linalg.sum_axis(W_new, axis=0).astype(jnp.float32)
    H_new = (H.astype(jnp.float32) * WTU /
             (w_colsum[:, None] + eps)).astype(H.dtype)
    return W_new, H_new
