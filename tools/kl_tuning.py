"""KL/MU kernel tuning sweep on the flagship shape (one v5e).

Times 10 production solve() iterations at 57600x38400 k=32 f32 for a range
of kl_chunk sizes and Pallas tile shapes; prints a table to pick defaults.
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from pydnmfk_tpu.config import NMFConfig
from pydnmfk_tpu.models import nmf as nmf_mod

M, N, K = 57600, 38400, 32


def time_solve(A, W, H, cfg, reps=3):
    eps = jnp.asarray(cfg.eps, cfg.dtype)
    W1, H1, err = nmf_mod.solve(A, W, H, eps, cfg)
    float(err)
    t0 = time.perf_counter()
    for _ in range(reps):
        W1, H1, err = nmf_mod.solve(A, W1, H1, eps, cfg)
    float(err)
    return (time.perf_counter() - t0) / reps


def main():
    key = jax.random.key(0)
    kA, kW, kH = jax.random.split(key, 3)
    A = jax.random.uniform(kA, (M, N), jnp.float32)
    W = jax.random.uniform(kW, (M, K), jnp.float32)
    H = jax.random.uniform(kH, (K, N), jnp.float32)
    base = NMFConfig(k=K, itr=10, norm="kl", method="mu",
                     precision="float32")

    for chunk in (2048, 4096, 8192, 14400):
        dt = time_solve(A, W, H, base.replace(kl_chunk=chunk))
        print(f"kl_chunk={chunk:>6}: {dt:.4f} s", flush=True)

    from pydnmfk_tpu.ops import pallas_kernels as pk
    orig_uht, orig_wtu = pk.kl_uht_pallas, pk.kl_wtu_pallas
    import functools
    for tm, tn in ((512, 512), (256, 1024), (512, 1024), (256, 2048),
                   (128, 4096)):
        pk_uht = functools.partial(orig_uht, tm=tm, tn=tn)
        pk_wtu = functools.partial(orig_wtu, tm=tm, tn=tn)
        pk.kl_uht_pallas, pk.kl_wtu_pallas = pk_uht, pk_wtu
        # the solver jit traced the previous tiles; force a fresh trace
        nmf_mod._jitted_solver.cache_clear()
        try:
            dt = time_solve(A, W, H, base.replace(use_pallas=True))
            print(f"pallas tm={tm:>4} tn={tn:>4}: {dt:.4f} s", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue sweep
            print(f"pallas tm={tm:>4} tn={tn:>4}: FAILED {type(e).__name__}",
                  flush=True)
    pk.kl_uht_pallas, pk.kl_wtu_pallas = orig_uht, orig_wtu


if __name__ == "__main__":
    main()
