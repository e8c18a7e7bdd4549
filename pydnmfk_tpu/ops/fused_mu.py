"""One-pass fused Frobenius-MU iteration (Pallas TPU).

A standard MU iteration sweeps A twice: once for A H^T (W update) and once
for W^T A (H update).  On TPU with bf16 storage the step is HBM-bound, so
the second sweep is pure waste.  Key observation: the updated W row-panel
depends only on *its own* rows of A H^T,

    W'_i = W_i * (A_i H^T) / (W_i (H H^T) + eps),

so a single pass over row-panels of A can produce W' AND accumulate
W'^T A and W'^T W' on the fly:

    per panel i (A_i resident in VMEM once):
        AHT_i  = A_i @ H^T
        W'_i   = W_i * AHT_i / (W_i @ HHT + eps)
        WTA   += W'_i^T @ A_i
        WTW   += W'_i^T @ W'_i

The H update (elementwise with WTA / WTW @ H) runs as plain XLA afterwards
— it touches only k-sized data.  Net effect: one A read per iteration
instead of two; the reference (and the XLA path here) reads twice
(dist_nmf.py:715-751).

Measured reality (v5e, 57600x38400, k=32): with the dot operands in the
compute dtype that XLA's DEFAULT matmul precision would use
(pallas_kernels.matmul_compute_dtype — bf16 operands for f32 A on TPU,
f32 accumulation), the fused pass wins in every storage precision:
1.7x at bf16-A, 2.3x at uint8, and 1.11x at f32 (0.154 vs 0.171 s /
10 iters; round-3's in-kernel f32 dots measured 0.28 s — multi-pass MXU
time the two-pass XLA path never paid).  Under a user-requested high
matmul precision the standard XLA path stays faster and the
auto-dispatch keeps it (models/nmf.py).

VMEM budget (defaults, n up to ~40k, k<=64): A panel (tm x n) bf16/f32 +
H (k x n) + WTA accumulator (k x n, f32) — choose tm so 2x-buffered panels
fit (see fused_mu_iteration's tm heuristic).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import linalg


def _fused_kernel(a_ref, w_ref, h_ref, hht_ref, eps_ref,
                  w_out_ref, wta_ref, wtw_ref):
    i = pl.program_id(0)
    # compute dtype = H block's dtype (the caller sets it to A's storage
    # dtype, or bf16 for integer-quantized A — uint8 -> bf16 is exact)
    cd = h_ref.dtype
    a = a_ref[:]
    if jnp.issubdtype(a.dtype, jnp.integer):
        # mosaic lacks unsigned->float casts; route uint8 -> int32 -> f32
        a = a.astype(jnp.int32).astype(jnp.float32)
    a = a.astype(cd)
    w = w_ref[:].astype(jnp.float32)
    h = h_ref[:]

    aht = jax.lax.dot_general(
        a, h, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (tm, k)
    denom = jnp.dot(w, hht_ref[:], preferred_element_type=jnp.float32)
    w_new = w * aht / (denom + eps_ref[0, 0])            # (tm, k)
    w_out_ref[:] = w_new.astype(w_out_ref.dtype)

    # feed the MXU in the compute dtype (for bf16-A mixed precision this
    # matches the XLA path's matmul_WTA, which rounds W' to bf16 on-chip)
    wta_part = jax.lax.dot_general(
        w_new.astype(cd), a,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (k, n)
    wtw_part = jnp.dot(w_new.T, w_new,
                       preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _():
        wta_ref[:] = wta_part
        wtw_ref[:] = wtw_part

    @pl.when(i != 0)
    def _():
        wta_ref[:] = wta_ref[:] + wta_part
        wtw_ref[:] = wtw_ref[:] + wtw_part


@functools.partial(jax.jit, static_argnames=("tm",))
def _fused_w_pass(A, W, H, HHT, eps, tm: int):
    m, n = A.shape
    k = W.shape[1]
    grid = (m // tm,)
    w_new, wta, wtw = pl.pallas_call(
        _fused_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((tm, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, k), W.dtype),
            jax.ShapeDtypeStruct((k, n), jnp.float32),
            jax.ShapeDtypeStruct((k, k), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * m * n * k,
            bytes_accessed=m * n * A.dtype.itemsize + (m + 2 * n) * k * 4,
            transcendentals=0),
        # the revisited (k, n) f32 WTA accumulator + wide A panels exceed
        # the default ~16 MB scoped-vmem stack budget; raise it (v5e has
        # 128 MB VMEM, _pick_tm budgets 64 MB of it)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(A, W, H, HHT, jnp.asarray([[eps]], jnp.float32))
    return w_new, wta, wtw


def _pick_tm(m, n, k, itemsize, budget=64 * 1024 * 1024):
    """Largest row-panel (multiple of 8) whose double-buffered A panels plus
    the resident H and WTA blocks fit the VMEM budget (default 64 MB of the
    v5e's 128 MB — measured best on the headline shape; see PERFORMANCE.md)."""
    resident = (k * n) * (4 + 4)          # H block (<=f32) + WTA accumulator
    per_row = 2 * n * itemsize + 2 * k * 4  # 2x-buffered A row + W/W' rows
    tm = max(8, (budget - resident) // max(per_row, 1))
    tm = min(int(tm) // 8 * 8, 512, m)
    return max(tm, 8)


def fused_mu_fro_step(A, W, H, eps, tm=None):
    """One full MU-Fro iteration with a single pass over A.

    Matches updates.mu_fro_step numerically (f32 accumulation); requires a
    single shard (wrap in shard_map for meshes) and m % tm == 0 after the
    internal pad."""
    m, n = A.shape
    k = W.shape[1]
    HHT = linalg.gram_t(H).astype(jnp.float32)
    if tm is None:
        from .pallas_kernels import fit_tile
        # prefer a divisor of m: the pad below COPIES A (8.8 GB at
        # flagship scale), which alone can exceed HBM
        tm = fit_tile(m, _pick_tm(m, n, k, A.dtype.itemsize))
    pad = (-m) % tm
    if pad:
        A = jnp.pad(A, ((0, pad), (0, 0)))
        W = jnp.pad(W, ((0, pad), (0, 0)))
    # mixed precision: the in-kernel A H^T rounds H to the compute dtype
    # once (same recipe as linalg.matmul's mixed path); integer-quantized
    # A computes in bf16, and f32 A on TPU matches XLA's default-precision
    # lowering (bf16 operands) — see pallas_kernels.matmul_compute_dtype
    from .pallas_kernels import matmul_compute_dtype
    cd = matmul_compute_dtype(A.dtype)
    H_k = H.astype(cd) if H.dtype != cd else H
    W_new, WTA, WTW = _fused_w_pass(A, W, H_k, HHT, eps, tm)
    if pad:
        W_new = W_new[:m]
    H_new = H * WTA.astype(H.dtype) / (
        jnp.dot(WTW, H.astype(jnp.float32),
                preferred_element_type=jnp.float32).astype(H.dtype) + eps)
    return W_new, H_new
