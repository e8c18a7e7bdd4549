"""One-off probe: does the one-pass fused KL kernel have a win regime at
k >= 128 (docs/ROADMAP.md item 2)?

Theory (docs/PERFORMANCE.md): the KL step needs four k-sized dots per
iteration (8mnk FLOP).  For k <= 128 the MXU runs at ~k/128 of peak, so
the dot time is ~constant (8mn*128/peak ≈ 11.5 ms at the flagship shape,
bf16) while the two-A-read HBM floor of the chunked path is 10.8 ms
(bf16-A) — the two bounds cross nowhere: KL stays MXU-bound at every k,
and the fused kernel's single A read cannot buy more than ~10%.  This
probe measures chunked vs fused at k = 32 / 128 / 256 (bf16-A) to confirm
or refute on hardware.

Run on the TPU (one process at a time): nohup python tools/kl_k128_probe.py
"""
import json
import sys
import time

sys.path.insert(0, ".")
from bench import time_solve  # noqa: E402  (chains outputs, forces transfer)


def main():
    import jax
    import jax.numpy as jnp
    from pydnmfk_tpu.config import NMFConfig

    m, n = 57600, 38400
    key = jax.random.key(0)
    kA, kW, kH = jax.random.split(key, 3)
    Ab = jax.random.uniform(kA, (m, n), jnp.float32).astype(jnp.bfloat16)

    out = []
    for k in (32, 128, 256):
        W0 = jax.random.uniform(kW, (m, k), jnp.float32)
        H0 = jax.random.uniform(kH, (k, n), jnp.float32)
        base = NMFConfig(k=k, itr=10, norm="kl", method="mu",
                         precision="float32", a_precision="bfloat16")
        for name, cfg in (
                ("chunked", base.replace(use_fused=False, kl_chunk=4096)),
                ("fused", base.replace(use_fused=True))):
            t0 = time.perf_counter()
            dt = time_solve(Ab, W0, H0, cfg)
            wall = time.perf_counter() - t0
            flops = 8 * m * n * k * 10
            row = {"k": k, "path": name, "s_per_10iter": round(dt, 4),
                   "gflops": round(flops / dt / 1e9, 1),
                   "wall_incl_compile": round(wall, 1)}
            out.append(row)
            print(json.dumps(row), flush=True)
    print(json.dumps({"rows": out}))


if __name__ == "__main__":
    main()
