"""Which gather forms does Mosaic accept inside a Pallas TPU kernel?

jnp.take(table, flat_idx, axis=0) fails ('Shape mismatch in input,
indices and output') — Mosaic's dynamic gather wants the take_along_axis
form where indices/output shapes match.  This probes the candidate forms
on a tiny kernel and prints compile ok + correctness for each.

Run: nohup python tools/gather_forms_probe.py > /tmp/gather_forms.log 2>&1 &
"""
import functools
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("backend:", jax.default_backend(), flush=True)
    n, k, bm = 1024, 32, 256
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((n, k), np.float32))
    idx = jnp.asarray(rng.integers(0, n, (bm,)).astype(np.int32))
    want = np.asarray(table)[np.asarray(idx)]

    def run(name, kernel):
        try:
            out = pl.pallas_call(
                kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((bm, k), jnp.float32),
            )(table, idx.reshape(bm, 1))
            err = float(np.abs(np.asarray(out) - want).max())
            print(f"{name}: OK err={err:.2e}", flush=True)
        except Exception as e:
            print(f"{name}: FAIL {e!r}"[:300], flush=True)

    def k_take_along(table_ref, idx_ref, out_ref):
        idx2 = jnp.broadcast_to(idx_ref[:], (bm, k))
        out_ref[:] = jnp.take_along_axis(table_ref[:], idx2, axis=0)

    def k_take_flat(table_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(table_ref[:], idx_ref[:].reshape(-1), axis=0)

    def k_loop_ds(table_ref, idx_ref, out_ref):
        def body(i, _):
            out_ref[i, :] = table_ref[pl.ds(idx_ref[i, 0], 1), :][0]
            return 0
        jax.lax.fori_loop(0, bm, body, 0)

    run("take_along_axis", k_take_along)
    run("take_flat", k_take_flat)
    run("loop_dynamic_slice", k_loop_ds)


if __name__ == "__main__":
    main()
