"""Side-by-side per-k statistics: executed reference (summary.json from
run_reference.py) vs this framework (a results dir of per-k results.h5).

Emits the markdown table for docs/PARITY.md.

Usage:
  python tools/ref_harness/compare.py \
      --reference tools/ref_harness/out/swim-full/summary.json \
      --ours /tmp/swim_ours/swim --start_k 14 --end_k 18 [--sill_thr 0.6]
"""
import argparse
import json
import os

import numpy as np


def ours_rows(results_root, ks, sill_thr):
    import h5py
    from scipy.stats import wilcoxon

    rows = []
    err_dists = {}
    for k in ks:
        with h5py.File(os.path.join(results_root, str(k),
                                    "results.h5"), "r") as f:
            sills = np.array(f["clusterSilhouetteCoefficients"])
            rows.append({"k": k, "min_sill": float(np.min(sills)),
                         "min_sill_rounded": float(round(np.min(sills), 2)),
                         "avg_err": float(np.array(f["avgErr"])),
                         "pvalue": None})
            err_dists[k] = np.array(f["L_err"])
    one = err_dists[ks[0]]
    nopt_idx = 1
    for i in range(1, len(ks)):
        if rows[i - 1]["min_sill_rounded"] > sill_thr:
            p = float(wilcoxon(one, err_dists[ks[i]])[1])
            rows[i]["pvalue"] = p
            if p < 0.05:
                nopt_idx = i
                one = np.copy(err_dists[ks[i]])
    return rows, ks[nopt_idx - 1]


def fmt(x, digits=4):
    if x is None:
        return "—"
    if isinstance(x, float) and (abs(x) < 1e-3 and x != 0):
        return f"{x:.2e}"
    return f"{x:.{digits}f}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", required=True)
    ap.add_argument("--ours", required=True)
    ap.add_argument("--start_k", type=int, required=True)
    ap.add_argument("--end_k", type=int, required=True)
    ap.add_argument("--step_k", type=int, default=1)
    ap.add_argument("--sill_thr", type=float, default=0.6)
    args = ap.parse_args()

    with open(args.reference) as f:
        ref = json.load(f)
    ref_rows = {r["k"]: r for r in ref["rows"]}
    ks = list(range(args.start_k, args.end_k + 1, args.step_k))
    our_rows, our_nopt = ours_rows(args.ours, ks, args.sill_thr)
    our_by_k = {r["k"]: r for r in our_rows}

    print("| k | ref min-sill | ours min-sill | ref p-value | ours p-value "
          "| ref avg-err | ours avg-err |")
    print("|---|---|---|---|---|---|---|")
    for k in ks:
        r = ref_rows.get(k, {})
        o = our_by_k.get(k, {})
        print(f"| {k} | {fmt(r.get('min_sill'))} | {fmt(o.get('min_sill'))} "
              f"| {fmt(r.get('pvalue'))} | {fmt(o.get('pvalue'))} "
              f"| {fmt(r.get('avg_err'), 5)} | {fmt(o.get('avg_err'), 5)} |")
    print(f"\nreference nopt = {ref['nopt']}   ours nopt = {our_nopt}")


if __name__ == "__main__":
    main()
