"""Measure sparse-product primitive candidates on the real TPU.

Decides the design of the TPU sparse compute path (VERDICT r3 item 2):
  * fixed per-dispatch relay overhead (noop), to de-bias everything else
  * dense matmul baseline (the densified path to beat) in f32 and bf16
  * ELL gather path: A.Ht via jnp.take + dense reduce (NO scatter)
  * the same ELL contraction as a Pallas kernel (does Mosaic lower takes?)
  * segment_sum path (the current ops/sparse kernels, known slow on TPU)

TPU relay protocol: chain outputs into inputs + force a scalar transfer
per rep so the relay cannot serve cached executions.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def bench(fn, *args, reps=5, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
        s = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        s = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        times.append(time.perf_counter() - t0)
        args = (args[0] + jnp.asarray(s * 1e-30, args[0].dtype),) + args[1:]
    return min(times), s


def make_ell(m, n, density, w, seed=0):
    rng = np.random.default_rng(seed)
    cols = np.stack([rng.choice(n, size=w, replace=False).astype(np.int32)
                     for _ in range(m)])
    cols.sort(axis=1)
    vals = rng.random((m, w), np.float32)
    return vals, cols


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    m = n = 16384
    print(f"backend={jax.default_backend()} m=n={m} k={k}", flush=True)

    key = jax.random.key(0)
    Ht = jax.random.uniform(key, (n, k), jnp.float32)

    # fixed dispatch overhead through the relay
    noop = jax.jit(lambda x: x * 1.0000001)
    t0_overhead, _ = bench(noop, jnp.ones((8, 8), jnp.float32))
    print(f"dispatch_overhead: {t0_overhead*1e3:.2f} ms", flush=True)

    A = jax.random.uniform(key, (m, n), jnp.float32)
    dense = jax.jit(lambda a, h: a @ h)
    t, _ = bench(dense, A, Ht)
    tt = t - t0_overhead
    print(f"dense_matmul_f32: {t*1e3:.2f} ms (net {tt*1e3:.2f})  "
          f"A read {m*n*4/tt/1e9:.0f} GB/s", flush=True)
    Ab = A.astype(jnp.bfloat16)
    t, _ = bench(jax.jit(lambda a, h: a @ h.astype(jnp.bfloat16)), Ab, Ht)
    tt = t - t0_overhead
    print(f"dense_matmul_bf16: {t*1e3:.2f} ms (net {tt*1e3:.2f})  "
          f"A read {m*n*2/tt/1e9:.0f} GB/s", flush=True)
    del A, Ab

    for density in (0.01, 0.05):
        w = int(density * n)
        vals_np, cols_np = make_ell(m, n, density, w)
        vals = jnp.asarray(vals_np)
        cols = jnp.asarray(cols_np)
        nnz = m * w

        @jax.jit
        def ell_aht(vals, cols, Ht):
            g = jnp.take(Ht, cols.reshape(-1), axis=0)
            g = g.reshape(vals.shape[0], -1, Ht.shape[1])
            return jnp.einsum("rw,rwk->rk", vals, g,
                              preferred_element_type=jnp.float32)

        t, _ = bench(ell_aht, vals, cols, Ht)
        tt = t - t0_overhead
        print(f"ell_take d={density}: {t*1e3:.2f} ms (net {tt*1e3:.2f})  "
              f"{nnz/tt/1e9:.3f} Gnnz/s", flush=True)

        # Pallas ELL kernel: gather inside the kernel (Mosaic dynamic
        # gather support probe), row-block grid, Ht fully VMEM-resident
        try:
            from jax.experimental import pallas as pl
            from jax.experimental.pallas import tpu as pltpu
            bm = 512
            assert m % bm == 0

            def kern(v_ref, c_ref, h_ref, o_ref):
                g = jnp.take(h_ref[:], c_ref[:].reshape(-1), axis=0,
                             fill_value=0.0)
                g = g.reshape(bm, w, k)
                o_ref[:] = jax.lax.dot_general(
                    v_ref[:][:, None, :], g,
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32).reshape(bm, k)

            ell_pallas = jax.jit(lambda v, c, h: pl.pallas_call(
                kern,
                grid=(m // bm,),
                in_specs=[
                    pl.BlockSpec((bm, w), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((bm, w), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((n, k), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((bm, k), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((m, k), jnp.float32),
            )(v, c, h))
            t, _ = bench(ell_pallas, vals, cols, Ht, reps=3, warmup=1)
            tt = t - t0_overhead
            print(f"ell_pallas d={density}: {t*1e3:.2f} ms "
                  f"(net {tt*1e3:.2f})  {nnz/tt/1e9:.3f} Gnnz/s",
                  flush=True)
        except Exception as e:
            print(f"ell_pallas d={density}: UNSUPPORTED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)

        if density <= 0.01:
            rows_np = np.repeat(np.arange(m, dtype=np.int32), w)
            from pydnmfk_tpu.ops import sparse as sp
            data = jnp.asarray(vals_np.reshape(-1))
            rows = jnp.asarray(rows_np)
            ccols = jnp.asarray(cols_np.reshape(-1))
            H = Ht.T
            seg = jax.jit(lambda d, r, c, h: sp.a_ht(d, r, c, h, m, 0))
            try:
                t, _ = bench(seg, data, rows, ccols, H, reps=2, warmup=1)
                tt = t - t0_overhead
                print(f"segment_sum d={density}: {t*1e3:.2f} ms  "
                      f"{nnz/tt/1e9:.4f} Gnnz/s", flush=True)
            except Exception as e:
                print(f"segment_sum d={density}: FAILED {e!r}", flush=True)


if __name__ == "__main__":
    main()
