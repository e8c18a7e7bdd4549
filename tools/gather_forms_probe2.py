"""Round 2: same-shape take_along_axis (Mosaic dynamic_gather) + the
chunked masked-pass decomposition of a table gather, with timing vs the
XLA HBM gather.

Run: nohup python tools/gather_forms_probe2.py > /tmp/gather_forms2.log 2>&1 &
"""
import functools
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    # ---- form test: same-shape take_along_axis ----
    G, k = 1024, 32
    table = jnp.asarray(rng.random((G, k), np.float32))
    idx = jnp.asarray(rng.integers(0, G, (G,)).astype(np.int32))

    def k_same_shape(table_ref, idx_ref, out_ref):
        idx2 = jnp.broadcast_to(idx_ref[:].reshape(G, 1), (G, k))
        out_ref[:] = jnp.take_along_axis(table_ref[:], idx2, axis=0)

    try:
        out = pl.pallas_call(
            k_same_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G, k), jnp.float32),
        )(table, idx)
        want = np.asarray(table)[np.asarray(idx)]
        print("same_shape_taa: OK err=",
              float(np.abs(np.asarray(out) - want).max()), flush=True)
    except Exception as e:
        print(f"same_shape_taa: FAIL {e!r}"[:300], flush=True)
        return

    # ---- chunked table gather kernel, timed vs XLA ----
    m, n, w = 40_000, 40_000, 16
    BM = 512
    GCH = BM * w                      # gather rows per tile == chunk size
    n_pad = -(-n // GCH) * GCH
    passes = n_pad // GCH
    print(f"tile rows={BM} w={w} chunk={GCH} passes={passes}", flush=True)

    vals = (rng.random((m, w)).astype(np.float32))
    idxs = rng.integers(0, n, (m, w)).astype(np.int32)
    Ht = rng.random((n, k)).astype(np.float32)
    Ht_pad = np.zeros((n_pad, k), np.float32)
    Ht_pad[:n] = Ht

    def kern(table_ref, vals_ref, idx_ref, out_ref):
        fidx = idx_ref[:].reshape(GCH, 1)
        g = jnp.zeros((GCH, k), jnp.float32)
        for c in range(passes):
            local = fidx - c * GCH
            sel = jnp.logical_and(local >= 0, local < GCH)
            li = jnp.where(sel, local, 0)
            chunk = table_ref[pl.ds(c * GCH, GCH), :]
            gc = jnp.take_along_axis(
                chunk, jnp.broadcast_to(li, (GCH, k)), axis=0)
            g = g + jnp.where(jnp.broadcast_to(sel, (GCH, k)), gc, 0.0)
        gv = g.reshape(BM, w, k)
        out_ref[:] = jnp.einsum("bw,bwk->bk", vals_ref[:], gv,
                                preferred_element_type=jnp.float32)

    @jax.jit
    def pallas_prod(table, vals, idxs):
        return pl.pallas_call(
            kern,
            grid=(m // BM,),
            in_specs=[
                pl.BlockSpec((n_pad, k), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BM, w), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BM, w), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BM, k), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, k), jnp.float32),
        )(table, vals, idxs)

    vals_j = jnp.asarray(vals)
    idx_j = jnp.asarray(idxs)
    tab_j = jnp.asarray(Ht_pad)

    try:
        out = pallas_prod(tab_j, vals_j, idx_j)
        ref = np.einsum("rw,rwk->rk", vals, Ht[idxs])
        err = float(np.abs(np.asarray(out) - ref).max() /
                    (np.abs(ref).max() + 1e-9))
        print("chunked kernel: OK relerr=", err, flush=True)
    except Exception as e:
        print(f"chunked kernel: FAIL {e!r}"[:500], flush=True)
        return

    # timing: chain table through reps (relay caches identical execs)
    take_rows = jnp.asarray((np.arange(n_pad) % m).astype(np.int32))

    @jax.jit
    def step(tab):
        out = pallas_prod(tab, vals_j, idx_j)
        return tab + out[take_rows] * 1e-3

    def run(reps, fn, x):
        t0 = time.perf_counter()
        for _ in range(reps):
            x = fn(x)
        float(jnp.sum(x))
        return time.perf_counter() - t0

    step(tab_j)
    t3 = min(run(3, step, tab_j) for _ in range(3))
    t10 = min(run(10, step, tab_j) for _ in range(3))
    t_pl = (t10 - t3) / 7
    slots = m * w
    print(f"pallas: {t_pl*1e3:.3f} ms/product  "
          f"{slots/t_pl/1e9:.2f} Gslots/s", flush=True)

    sys.path.insert(0, "/root/repo")
    from pydnmfk_tpu.ops.ell import _gather_product

    @jax.jit
    def xstep(tab):
        out = _gather_product(vals_j, idx_j, tab)
        return tab + out[take_rows] * 1e-3

    xstep(tab_j)
    t3 = min(run(3, xstep, tab_j) for _ in range(3))
    t10 = min(run(10, xstep, tab_j) for _ in range(3))
    t_x = (t10 - t3) / 7
    print(f"xla:    {t_x*1e3:.3f} ms/product  "
          f"{slots/t_x/1e9:.2f} Gslots/s  speedup={t_x/t_pl:.2f}x",
          flush=True)


if __name__ == "__main__":
    main()
