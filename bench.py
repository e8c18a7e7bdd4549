"""Benchmark: the reference's headline strong-scaling workload, measured
through the PRODUCTION solver path (models/nmf.solve — auto-dispatch, tol
plumbing and all), plus mixed-precision / fused-kernel / KL / MFU rows.

Reference baseline (BASELINE.md / docs/benchmark.png): 10 FRO-MU iterations
on a dense 57600x38400 matrix take ~115 s on 2 MPI processes (~0.8 s on
256).  The headline row times the same 10 iterations (including the
solver's final normalize + relative-error pass — the production number) on
the available TPU chip and reports vs_baseline = 115 / measured.

Prints exactly ONE JSON line; secondary rows ride in its "rows" field:
  {"metric": ..., "value": N, "unit": "s", "vs_baseline": N, "rows": [...]}

Methodology notes (docs/PERFORMANCE.md): outputs chain into inputs across
reps and a scalar is pulled to the host each rep — the TPU relay caches
repeated identical executions, so block_until_ready alone reports fake
sub-ms times.
"""
import json
import sys
import time

M, N, K = 57600, 38400, 32
ITERS = 10
BASELINE_2PROC_S = 115.0
# v5e peak matmul throughput (bf16 MXU); f32 runs through the same MXU via
# multi-pass at ~1/4 rate.  Used only for the mfu_pct diagnostics.
PEAK_BF16 = 197e12
PEAK_F32 = PEAK_BF16 / 4


def time_solve(A, W, H, cfg, reps=3):
    """Median-free simple timing of the full production solve."""
    import jax
    import jax.numpy as jnp
    from pydnmfk_tpu.models import nmf as nmf_mod

    eps = jnp.asarray(cfg.eps, cfg.dtype)
    # warmup/compile
    W1, H1, err = nmf_mod.solve(A, W, H, eps, cfg)
    float(err)
    t0 = time.perf_counter()
    for _ in range(reps):
        # chain outputs into inputs: every rep computes fresh values
        W1, H1, err = nmf_mod.solve(A, W1, H1, eps, cfg)
    float(err)  # forces the whole chain + a real device->host transfer
    return (time.perf_counter() - t0) / reps


def make_row(name, dt, m, n, k, iters, peak, extra=None, flop_factor=4.0):
    # FRO-MU: two A-sized matmuls/iter = 4mnk; KL-MU: two WH products +
    # UHT + WTU = ~8mnk (matches ops/fused_kl.py's cost estimate)
    flops = flop_factor * m * n * k * iters
    row = {"metric": name, "value": round(dt, 4), "unit": "s",
           "gflops": round(flops / dt / 1e9, 1),
           "mfu_pct": round(100.0 * flops / dt / peak, 1)}
    if extra:
        row.update(extra)
    return row


def main():
    import jax
    if "--cpu" in sys.argv:      # local testing without touching the TPU
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from pydnmfk_tpu.config import NMFConfig

    on_tpu = jax.default_backend() == "tpu"
    m, n, k = (M, N, K) if on_tpu else (M // 16, N // 16, K)
    quick = "--quick" in sys.argv       # headline row only
    scale = (m * n * k) / (M * N * K)   # pro-rate baseline off-TPU

    key = jax.random.key(0)
    kA, kW, kH = jax.random.split(key, 3)
    # generate directly on device: no host->device transfer of 8.8 GB
    A = jax.random.uniform(kA, (m, n), jnp.float32)
    W0 = jax.random.uniform(kW, (m, k), jnp.float32)
    H0 = jax.random.uniform(kH, (k, n), jnp.float32)

    base = NMFConfig(k=k, itr=ITERS, norm="fro", method="mu",
                     precision="float32")
    rows = []

    # ---- headline: f32 FRO-MU through the production solve() ----
    dt = time_solve(A, W0, H0, base)
    headline = make_row(f"fro_mu_{ITERS}iter_{m}x{n}_k{k}_f32_solve",
                        dt, m, n, k, ITERS, PEAK_F32)
    headline["vs_baseline"] = round(BASELINE_2PROC_S * scale / dt, 2)

    if not quick:
        Ab = A.astype(jnp.bfloat16)

        # ---- bf16-A standard (two-pass XLA) ----
        cfg = base.replace(a_precision="bfloat16", use_fused=False)
        dt = time_solve(Ab, W0, H0, cfg)
        rows.append(make_row(f"fro_mu_bf16A_std_{m}x{n}_k{k}", dt, m, n, k,
                             ITERS, PEAK_BF16))

        # ---- bf16-A fused one-pass MU ----
        if on_tpu:
            cfg = base.replace(a_precision="bfloat16", use_fused=True)
            dt = time_solve(Ab, W0, H0, cfg)
            rows.append(make_row(f"fro_mu_bf16A_fused_{m}x{n}_k{k}", dt,
                                 m, n, k, ITERS, PEAK_BF16))

        # ---- KL/MU (the flagship swim objective): chunked + Pallas,
        # full size — the U intermediate stays bounded (kl_chunk slabs /
        # VMEM tiles), so A is the only HBM-resident big buffer ----
        cfg = base.replace(norm="kl", kl_chunk=4096)
        dt = time_solve(A, W0, H0, cfg)
        rows.append(make_row(f"kl_mu_chunked_{m}x{n}_k{k}_f32", dt, m,
                             n, k, ITERS, PEAK_F32, flop_factor=8.0))
        if on_tpu:
            cfg = base.replace(norm="kl", use_pallas=True, use_fused=False)
            dt = time_solve(A, W0, H0, cfg)
            rows.append(make_row(f"kl_mu_pallas_{m}x{n}_k{k}_f32", dt,
                                 m, n, k, ITERS, PEAK_F32, flop_factor=8.0))
            # one-pass fused KL (A read once per iteration)
            cfg = base.replace(norm="kl", use_fused=True)
            dt = time_solve(A, W0, H0, cfg)
            rows.append(make_row(f"kl_mu_fused_{m}x{n}_k{k}_f32", dt,
                                 m, n, k, ITERS, PEAK_F32, flop_factor=8.0))
            cfg = base.replace(norm="kl", use_fused=True,
                               a_precision="bfloat16")
            dt = time_solve(Ab, W0, H0, cfg)
            rows.append(make_row(f"kl_mu_fused_bf16A_{m}x{n}_k{k}", dt,
                                 m, n, k, ITERS, PEAK_BF16, flop_factor=8.0))

        # ---- uint8-A fused one-pass MU (quantized storage: the A read
        # is 1/4 the f32 bytes; exact for uint8-valued data like swim).
        # Placed after the bf16 rows so Ab can be dropped first — HBM
        # holds A (8.8 GB) + Aq (2.2 GB) but never a third big buffer ----
        if on_tpu:
            del Ab
            from pydnmfk_tpu.ops.linalg import quantize_uint8
            Aq, _ = quantize_uint8(A)
            cfg = base.replace(a_precision="uint8")
            dt = time_solve(Aq, W0, H0, cfg)
            rows.append(make_row(f"fro_mu_uint8A_fused_{m}x{n}_k{k}", dt,
                                 m, n, k, ITERS, PEAK_BF16))
            del Aq

        # ---- MFU rows: compute-bound shapes where the MXU can be fed.
        # 100 iterations per solve so per-call dispatch latency (the TPU
        # relay round trip is ~10 ms) cannot masquerade as low MFU ----
        mfu_iters = 100 if on_tpu else 10
        for mk, prec in ((256, "float32"), (256, "bfloat16"),
                         (512, "bfloat16")):
            mm = 8192 if on_tpu else 1024
            kA2, kW2, kH2 = jax.random.split(jax.random.fold_in(key, mk), 3)
            A2 = jax.random.uniform(kA2, (mm, mm),
                                    jnp.float32).astype(jnp.bfloat16)
            wdt = jnp.bfloat16 if prec == "bfloat16" else jnp.float32
            W2 = jax.random.uniform(kW2, (mm, mk), jnp.float32).astype(wdt)
            H2 = jax.random.uniform(kH2, (mk, mm), jnp.float32).astype(wdt)
            cfg = base.replace(k=mk, itr=mfu_iters, precision=prec,
                               a_precision="bfloat16", use_fused=False)
            dt = time_solve(A2, W2, H2, cfg)
            rows.append(make_row(
                f"fro_mu_bf16A_{prec[0]}{'32' if prec=='float32' else '16'}"
                f"WH_{mm}x{mm}_k{mk}_mfu",
                dt, mm, mm, mk, mfu_iters, PEAK_BF16))

    headline["rows"] = rows
    print(json.dumps(headline))
    for r in rows:
        print(f"# {r['metric']}: {r['value']}s  {r['gflops']} GFLOP/s  "
              f"mfu={r['mfu_pct']}%", file=sys.stderr)


if __name__ == "__main__":
    main()
