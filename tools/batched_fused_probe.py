"""Probe: does vmapped fused FRO-MU (Pallas batching rule) work and win on
the real TPU?  Times a 4-member bf16-A ensemble solve, fused vs standard,
and checks numerics.  Decides whether _ensemble_program may enable fusion.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from pydnmfk_tpu.models.updates import mu_fro_step
from pydnmfk_tpu.ops.fused_mu import fused_mu_fro_step

B, M, N, K = 4, 8192, 8192, 32
ITERS = 20


def run(step):
    key = jax.random.key(0)
    kA, kW, kH = jax.random.split(key, 3)
    A = jax.random.uniform(kA, (B, M, N), jnp.float32).astype(jnp.bfloat16)
    W = jax.random.uniform(kW, (B, M, K), jnp.float32)
    H = jax.random.uniform(kH, (B, K, N), jnp.float32)
    eps = jnp.float32(1.19e-7)

    @jax.jit
    def solve(A, W, H):
        def body(i, WH):
            W, H = WH
            return jax.vmap(lambda a, w, h: step(a, w, h, eps))(A, W, H)
        W, H = jax.lax.fori_loop(0, ITERS, body, (W, H))
        return W, H, jnp.sum(H.astype(jnp.float32))

    W1, H1, s = solve(A, W, H)
    float(s)
    t0 = time.perf_counter()
    for _ in range(3):
        W1, H1, s = solve(A, W1, H1)
    float(s)
    return (time.perf_counter() - t0) / 3, np.asarray(W1), np.asarray(H1)


def main():
    dt_std, Ws, Hs = run(mu_fro_step)
    print(f"standard: {dt_std:.4f} s / {ITERS} iters x {B} members",
          flush=True)
    dt_fused, Wf, Hf = run(fused_mu_fro_step)
    print(f"fused:    {dt_fused:.4f} s  ({dt_std / dt_fused:.2f}x)",
          flush=True)
    err = np.max(np.abs(Wf - Ws) / (np.abs(Ws) + 1e-6))
    print(f"max rel W diff: {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
