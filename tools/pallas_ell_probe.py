"""Measure the Pallas VMEM-gather ELL kernel vs the XLA HBM-gather path
on the real chip (VERDICT r3 item 1's decision experiment).

Shapes mirror bench.py's sparse row: 40000^2, nnz=3.2e5, k=32 — plus a
width/k sweep to locate the crossover.  Methodology per CLAUDE.md: chain
outputs into inputs and force a scalar transfer per rep (the relay caches
identical executions), and measure slopes over rep counts so the ~30 ms
dispatch RTT cancels (memory: tpu-relay-measurement).

Run: nohup python tools/pallas_ell_probe.py > /tmp/pallas_ell_probe.log 2>&1 &
"""
import sys
import time

import numpy as np


def bench_slope(fn, x0, reps_lo=3, reps_hi=10):
    """Per-call seconds from the (reps_hi - reps_lo) slope; chained."""
    import jax.numpy as jnp

    def run(reps):
        x = x0
        t0 = time.perf_counter()
        for _ in range(reps):
            x = fn(x)
        float(jnp.sum(x[0] if isinstance(x, tuple) else x))
        return time.perf_counter() - t0

    run(2)                                   # warm
    t_lo = min(run(reps_lo) for _ in range(3))
    t_hi = min(run(reps_hi) for _ in range(3))
    return (t_hi - t_lo) / (reps_hi - reps_lo)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import sparse as jsparse

    sys.path.insert(0, "/root/repo")
    from pydnmfk_tpu.ops.ell import ell_pack, _gather_product
    from pydnmfk_tpu.ops.pallas_ell import ell_gather_product

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(3)

    for (m, n, nnz, k) in [(40_000, 40_000, 320_000, 32),
                           (40_000, 40_000, 320_000, 64),
                           (40_000, 40_000, 1_280_000, 32),
                           (100_000, 100_000, 2_000_000, 32)]:
        flat = rng.choice(m * n, size=nnz, replace=False)
        idx = np.stack([flat // n, flat % n], 1).astype(np.int32)
        vals = rng.random(nnz, np.float32) + 0.1
        A = jsparse.BCOO((jnp.asarray(vals), jnp.asarray(idx)),
                         shape=(m, n), unique_indices=True).sort_indices()
        E = ell_pack(A)
        if E is None:
            print(f"m={m} nnz={nnz}: ell_pack returned None", flush=True)
            continue
        w = E.rvals.shape[1]
        Ht = jnp.asarray(rng.random((n, k), np.float32))
        Wm = jnp.asarray(rng.random((m, k), np.float32))

        # chain: Ht' = normalize(out -> feeds back as table rows); keep
        # shapes fixed by re-projecting out (m,k) -> (n,k) via modulo rows
        take_rows = jnp.asarray((np.arange(n) % m).astype(np.int32))

        def xla_step(ht):
            out = _gather_product(E.rvals, E.rcols, ht)   # (m, k) f32
            return (out[take_rows] * 1e-3 + ht)

        def pl_step(ht):
            out = ell_gather_product(E.rvals, E.rcols, ht)
            return (out[take_rows] * 1e-3 + ht)

        def pl_kl_step(ht):
            out = ell_gather_product(E.rvals, E.rcols, ht, ratio_with=Wm)
            return (out[take_rows] * 1e-3 + ht)

        xla_j = jax.jit(xla_step)
        try:
            pl_j = jax.jit(pl_step)
            t_pl = bench_slope(pl_j, Ht)
            pl_kl_j = jax.jit(pl_kl_step)
            t_pl_kl = bench_slope(pl_kl_j, Ht)
        except Exception as e:
            print(f"PALLAS FAILED m={m} nnz={nnz} k={k} w={w}: {e!r}"[:500],
                  flush=True)
            t_pl = t_pl_kl = float("nan")
        t_xla = bench_slope(xla_j, Ht)
        slots = E.rvals.size
        print(f"m={m} nnz={nnz} k={k} w={w} slots={slots}: "
              f"xla={t_xla*1e3:.3f}ms pallas={t_pl*1e3:.3f}ms "
              f"pallas_kl={t_pl_kl*1e3:.3f}ms "
              f"speedup={t_xla/t_pl:.2f}x "
              f"(gnnz/s: xla={slots/t_xla/1e9:.2f} "
              f"pl={slots/t_pl/1e9:.2f})", flush=True)


if __name__ == "__main__":
    main()
