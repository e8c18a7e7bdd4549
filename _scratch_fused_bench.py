"""Sweep fused one-pass MU row-panel size at bf16-A mixed precision (TPU)."""
import functools
import time
import jax
import jax.numpy as jnp

M, N, K = 57600, 38400, 32
ITERS = 10

from pydnmfk_tpu.models.updates import mu_fro_step
from pydnmfk_tpu.ops.fused_mu import fused_mu_fro_step

key = jax.random.key(0)
kA, kW, kH = jax.random.split(key, 3)
A = jax.random.uniform(kA, (M, N), jnp.float32).astype(jnp.bfloat16)
W = jax.random.uniform(kW, (M, K), jnp.float32)
H = jax.random.uniform(kH, (K, N), jnp.float32)
eps = jnp.float32(1.19e-7)


def bench(step, tag):
    @jax.jit
    def ten(A, W, H):
        def body(i, WH):
            W, H = WH
            return step(A, W, H, eps)
        W, H = jax.lax.fori_loop(0, ITERS, body, (W, H))
        return W, H, jnp.sum(H)

    try:
        Wl, Hl, s = ten(A, W, H)
        float(s)  # compile + force transfer
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        return
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        Wl, Hl, s = ten(A, Wl, Hl)
    float(s)
    dt = (time.perf_counter() - t0) / reps
    print(f"{tag}: {dt:.4f}s per {ITERS} iters "
          f"({4.0*M*N*K*ITERS/dt/1e12:.1f} TFLOP/s)", flush=True)


for tm in (64, 128, 192, 320, 576):
    bench(functools.partial(fused_mu_fro_step, tm=tm), f"fused tm={tm}")
bench(fused_mu_fro_step, "fused tm=auto(64MB)")
