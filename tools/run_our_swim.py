"""Run THIS framework's swim k-selection at the reference example's exact
parameters (examples/dist_pynmfk_2d_Swim.py:36-53), in both sampling modes:

  * compat: seed_grid=(2,2) — reproduces the reference's identical-per-rank
    MPI seeding statistics (tiled noise/init), the regime its executed
    golden nopt=16 comes from;
  * default: independent per-member sampling (this framework's native mode).

Prints one summary JSON per mode and writes per-k results.h5 dirs that
tools/ref_harness/compare.py can tabulate against the executed reference.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["compat", "default", "both"],
                    default="both")
    ap.add_argument("--out", default="/tmp/swim_ours")
    ap.add_argument("--itr", type=int, default=5000)
    ap.add_argument("--perturbations", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from pydnmfk_tpu import NMFConfig, NMFk, NMFkConfig
    from pydnmfk_tpu.utils.io import DataReader

    A = DataReader("/root/reference/data/", "swim", "mat",
                   precision="float32").read_global()
    modes = ["compat", "default"] if args.mode == "both" else [args.mode]
    for mode in modes:
        out = os.path.join(args.out, mode)
        cfg = NMFkConfig(
            nmf=NMFConfig(itr=args.itr, norm="kl", method="mu", init="rand",
                          precision="float32", verbose=True),
            start_k=14, end_k=18, step_k=1,
            perturbations=args.perturbations, noise_var=0.016,
            sampling="uniform", sill_thr=0.6, results_path=out,
            fname="swim", checkpoint=True,
            seed_grid=(2, 2) if mode == "compat" else None)
        t0 = time.perf_counter()
        model = NMFk(cfg)
        nopt = model.fit(A)
        wall = time.perf_counter() - t0
        rows = []
        for k in sorted(model.per_k_stats):
            st = model.per_k_stats[k]
            rows.append({
                "k": k,
                "min_sill": float(min(st["clusterSilhouetteCoefficients"])),
                "avg_sill": float(st["avgSilhouetteCoefficients"]),
                "avg_err": float(st["avgErr"]),
            })
        summary = {"mode": mode, "nopt": int(nopt),
                   "wall_s": round(wall, 1), "rows": rows}
        with open(os.path.join(out, "summary.json"), "w") as f:
            json.dump(summary, f, indent=1)
        print(json.dumps(summary))


if __name__ == "__main__":
    main()
