"""Benchmark: the reference's headline strong-scaling workload.

Reference baseline (BASELINE.md / docs/benchmark.png): 10 FRO-MU iterations
on a dense 57600x38400 matrix take ~115 s on 2 MPI processes (and ~0.8 s on
256).  This bench times the same 10 iterations of the same update math on
the available TPU chip(s) and reports seconds, with vs_baseline = 115 /
measured (speedup over the reference's 2-process time on its own workload).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "s", "vs_baseline": N}
"""
import json
import os
import sys
import time

M, N, K = 57600, 38400, 32
ITERS = 10
BASELINE_2PROC_S = 115.0


def main():
    import jax
    import jax.numpy as jnp

    on_tpu = jax.default_backend() == "tpu"
    m, n, k = (M, N, K) if on_tpu else (M // 16, N // 16, K)
    # opt-in mixed precision (A stored bf16, factors/accumulation f32);
    # the default headline metric stays all-f32 for apples-to-apples
    mixed = "--mixed" in sys.argv

    from pydnmfk_tpu.models.updates import mu_fro_step

    key = jax.random.key(0)
    kA, kW, kH = jax.random.split(key, 3)
    # generate directly on device: no host->device transfer of 8.8 GB
    A = jax.random.uniform(kA, (m, n), jnp.float32)
    if mixed:
        A = A.astype(jnp.bfloat16)
    W = jax.random.uniform(kW, (m, k), jnp.float32)
    H = jax.random.uniform(kH, (k, n), jnp.float32)
    eps = jnp.float32(1.19e-7)

    @jax.jit
    def ten_iters(A, W, H):
        def body(i, WH):
            W, H = WH
            return mu_fro_step(A, W, H, eps)
        W, H = jax.lax.fori_loop(0, ITERS, body, (W, H))
        # the scalar forces the full chain to execute; float() below forces
        # the transfer (block_until_ready alone can be satisfied by the
        # backend's repeated-execution cache)
        return W, H, jnp.sum(H)

    # warmup/compile
    W, H, s = ten_iters(A, W, H)
    float(s)

    # chain outputs into inputs so every timed run computes fresh values
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        W, H, s = ten_iters(A, W, H)
    float(s)
    dt = (time.perf_counter() - t0) / reps

    # pro-rate the baseline if running a scaled-down (non-TPU) shape
    scale = (m * n * k) / (M * N * K)
    baseline = BASELINE_2PROC_S * scale
    flops = 4.0 * m * n * k * ITERS      # dominant matmul cost of MU
    gflops = flops / dt / 1e9

    metric = f"fro_mu_{ITERS}iter_{m}x{n}_k{k}_" + ("bf16A" if mixed
                                                    else "f32")
    print(json.dumps({
        "metric": metric,
        "value": round(dt, 4),
        "unit": "s",
        "vs_baseline": round(baseline / dt, 2),
    }))
    print(f"# {gflops:.0f} GFLOP/s sustained on {jax.devices()[0].platform}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
