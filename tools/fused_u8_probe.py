"""Probe: is the fused-MU uint8 path VPU-cast-bound, and does a shifted
int8 storage (q - 128, cast int8->f32 directly) recover bandwidth?

Variants of the one-pass W kernel (ops/fused_mu.py) over dtype/cast:
  u8_chain : uint8 -> int32 -> f32 -> bf16   (current production path)
  i8_shift : int8 (pre-shifted by -128) -> f32 -> (+128) -> bf16
  bf16     : baseline (pure load)
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(mode):
    def kern(a_ref, w_ref, h_ref, hht_ref, eps_ref,
             w_out_ref, wta_ref, wtw_ref):
        i = pl.program_id(0)
        a = a_ref[:]
        if mode == "u8_chain":
            a = a.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
        elif mode == "i8_shift":
            a = (a.astype(jnp.float32) + 128.0).astype(jnp.bfloat16)
        w = w_ref[:].astype(jnp.float32)
        h = h_ref[:]
        aht = jax.lax.dot_general(
            a, h, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        denom = jnp.dot(w, hht_ref[:], preferred_element_type=jnp.float32)
        w_new = w * aht / (denom + eps_ref[0, 0])
        w_out_ref[:] = w_new.astype(w_out_ref.dtype)
        wta_part = jax.lax.dot_general(
            w_new.astype(jnp.bfloat16), a,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
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

    return kern


@functools.partial(jax.jit, static_argnames=("tm", "mode"))
def w_pass(A, W, H, HHT, eps, tm, mode):
    m, n = A.shape
    k = W.shape[1]
    return pl.pallas_call(
        make_kernel(mode),
        grid=(m // tm,),
        in_specs=[
            pl.BlockSpec((tm, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((tm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, k), jnp.float32),
            jax.ShapeDtypeStruct((k, n), jnp.float32),
            jax.ShapeDtypeStruct((k, k), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * m * n * k,
            bytes_accessed=m * n * A.dtype.itemsize + (m + 2 * n) * k * 4,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(A, W, H, HHT, jnp.asarray([[eps]], jnp.float32))


def bench(A, W, H, HHT, tm, mode, reps=10):
    eps = jnp.float32(1e-7)
    Wc = W
    out = w_pass(A, Wc, H, HHT, eps, tm, mode)
    float(jnp.sum(out[0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = w_pass(A, Wc, H, HHT, eps, tm, mode)
        Wc = jnp.abs(out[0][:, :W.shape[1]]) + 0.01   # chain
    s = float(jnp.sum(out[0]))
    return (time.perf_counter() - t0) / reps, s


def main():
    m, n, k = 28800, 38400, 32   # half-flagship: all 3 dtype copies fit
    key = jax.random.key(0)
    kA, kW, kH = jax.random.split(key, 3)
    Af = jax.random.uniform(kA, (m, n), jnp.float32) * 255.0
    Au8 = Af.astype(jnp.uint8)
    Ai8 = (Af.astype(jnp.int32) - 128).astype(jnp.int8)
    Ab = Af.astype(jnp.bfloat16)
    del Af
    W = jax.random.uniform(kW, (m, k), jnp.float32)
    H = jax.random.uniform(kH, (k, n), jnp.bfloat16)
    HHT = (H.astype(jnp.float32) @ H.astype(jnp.float32).T)

    for tm in (256, 384, 512):
        if m % tm:
            continue
        for name, A, mode in (("u8_chain", Au8, "u8_chain"),
                              ("i8_shift", Ai8, "i8_shift"),
                              ("bf16", Ab, "bf16")):
            try:
                dt, s = bench(A, W, H, HHT, tm, mode)
                gbs = m * n * A.dtype.itemsize / dt / 1e9
                print(f"tm={tm} {name}: {dt*1e3:.2f} ms  {gbs:.0f} GB/s "
                      f"(elem rate {m*n/dt/1e9:.0f} Ge/s)", flush=True)
            except Exception as e:
                print(f"tm={tm} {name}: FAILED {type(e).__name__}: "
                      f"{str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
