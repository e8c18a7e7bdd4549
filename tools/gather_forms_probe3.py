"""Round 3: which tpu.dynamic_gather configurations actually compile on
this v5e — sublane-gather (take_along_axis axis=0) and lane-gather
(axis=1) across lane widths.  Run alone on the chip.

Run: nohup python tools/gather_forms_probe3.py > /tmp/gather_forms3.log 2>&1 &
"""
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    def try_gather(name, S, L, axis):
        x = jnp.asarray(rng.random((S, L), np.float32))
        if axis == 0:
            idx_h = rng.integers(0, S, (S, L)).astype(np.int32)
        else:
            idx_h = rng.integers(0, L, (S, L)).astype(np.int32)
        idx = jnp.asarray(idx_h)

        def kern(x_ref, i_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=axis)

        try:
            out = pl.pallas_call(
                kern,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((S, L), jnp.float32),
            )(x, idx)
            want = np.take_along_axis(np.asarray(x), idx_h, axis=axis)
            err = float(np.abs(np.asarray(out) - want).max())
            print(f"{name} (S={S},L={L},axis={axis}): OK err={err:.1e}",
                  flush=True)
            return True
        except Exception as e:
            print(f"{name} (S={S},L={L},axis={axis}): FAIL {e!r}"[:200],
                  flush=True)
            return False

    try_gather("sublane_k128", 512, 128, 0)
    try_gather("sublane_k128_big", 4096, 128, 0)
    try_gather("sublane_k32", 512, 32, 0)
    try_gather("sublane_k256", 512, 256, 0)
    try_gather("lane_gather", 8, 128, 1)
    try_gather("lane_gather_wide", 8, 1024, 1)
    try_gather("lane_gather_tall", 256, 512, 1)


if __name__ == "__main__":
    main()
