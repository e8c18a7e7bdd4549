"""Execute the UNMODIFIED reference package (lanl/pyDNMFk) end-to-end on its
own example configurations, without OpenMPI, using the in-repo thread-backed
mpi4py shim (tools/ref_harness/mpi4py/MPI.py).

This settles the swim golden question (reference asserts nopt==16 at
/root/reference/examples/dist_pynmfk_2d_Swim.py:53) with an actually-executed
4-rank reference run, and prints per-k min-silhouette + Wilcoxon p-value
tables for PARITY.md.

Rank isolation of numpy's global RNG — the reference seeds identically on
every rank (pyDNMFk.py:32 np.random.seed(perturbation*1000)) and then draws
rank-local shapes, so streams must be per-rank — is provided by patching the
numpy.random module functions to dispatch to a thread-local RandomState
(legacy MT19937, bit-identical to np.random.seed/rand per process).

Usage:
  python tools/ref_harness/run_reference.py --example swim \
      [--itr N] [--perturbations P] [--out DIR] [--tag NAME]
  python tools/ref_harness/run_reference.py --example wtsi   # known nopt=4

Driver configs are verbatim transcriptions of the reference examples
(examples/dist_pynmfk_2d_Swim.py:19-50, examples/dist_pynmfk_1d_wtsi.py:15-44)
— the pyDNMFk package itself runs unmodified from /root/reference.
"""

import argparse
import json
import os
import sys
import threading
import time
import traceback

HERE = os.path.dirname(os.path.abspath(__file__))
REFERENCE = "/root/reference"

os.environ.setdefault("MPLBACKEND", "Agg")
os.environ.setdefault("OMP_NUM_THREADS", "1")  # 4 rank-threads on few cores

sys.path.insert(0, HERE)        # shadow mpi4py with the shim
sys.path.insert(1, REFERENCE)   # import pyDNMFk unmodified

import numpy as np  # noqa: E402


# --------------------------------------------------------------------------
# Thread-local numpy.random patch (legacy RandomState semantics per rank).
# --------------------------------------------------------------------------
_RNG_TLS = threading.local()


def _rs():
    rs = getattr(_RNG_TLS, "rs", None)
    if rs is None:
        rs = _RNG_TLS.rs = np.random.RandomState()
    return rs


def _patch_numpy_legacy():
    """Restore numpy<2 aliases the reference uses (np.product at
    utils.py:33 etc.) — environment compatibility, not a package change."""
    for legacy, modern in (("product", np.prod), ("alltrue", np.all),
                           ("sometrue", np.any), ("cumproduct", np.cumprod),
                           ("round_", np.round), ("NaN", np.nan),
                           ("Inf", np.inf), ("float_", np.float64),
                           ("int_", np.int64)):
        if not hasattr(np, legacy):
            setattr(np, legacy, modern)


def _patch_numpy_random():
    def seed(s=None):
        _RNG_TLS.rs = np.random.RandomState(s)

    np.random.seed = seed
    for name in ("rand", "randn", "random_sample", "random", "poisson",
                 "uniform", "randint", "normal", "permutation", "choice"):
        def make(n):
            return lambda *a, **k: getattr(_rs(), n)(*a, **k)
        setattr(np.random, name, make(name))


# --------------------------------------------------------------------------
# Per-rank driver bodies (verbatim example configs).
# --------------------------------------------------------------------------

def _build_args(comm_world, p_r, p_c, out_dir, overrides):
    """Common arg assembly shared by both examples
    (dist_pynmfk_2d_Swim.py:25-31 / dist_pynmfk_1d_wtsi.py:19-26)."""
    from pyDNMFk.dist_comm import MPI_comm
    from pyDNMFk.utils import parse

    comms = MPI_comm(comm_world, p_r, p_c)
    args = parse()
    args.size, args.rank = comm_world.size, comm_world.rank
    args.comm, args.p_r, args.p_c = comms, p_r, p_c
    args.row_comm = comms.cart_1d_row()
    args.col_comm = comms.cart_1d_column()
    args.comm1 = comms.comm
    args.fpath = REFERENCE + "/data/"
    args.ftype = "mat"
    args.results_path = out_dir + "/"
    for key, val in overrides.items():
        setattr(args, key, val)
    return args


def run_rank_swim(comm_world, out_dir, overrides):
    """examples/dist_pynmfk_2d_Swim.py:19-50, package unmodified."""
    from pyDNMFk.pyDNMFk import PyNMFk
    from pyDNMFk.data_io import data_read

    cfg = dict(fname="swim", start_k=14, end_k=18, step_k=1, sill_thr=0.6,
               itr=5000, init="rand", noise_var=0.016, verbose=True,
               norm="kl", method="mu", checkpoint=True, precision=np.float32)
    cfg.update(overrides)
    args = _build_args(comm_world, 2, 2, out_dir, cfg)
    A_ij = data_read(args).read().astype(args.precision)
    return PyNMFk(A_ij, factors=None, params=args).fit()


def run_rank_wtsi(comm_world, out_dir, overrides):
    """examples/dist_pynmfk_1d_wtsi.py:15-44, package unmodified."""
    from pyDNMFk.pyDNMFk import PyNMFk
    from pyDNMFk.data_io import data_read

    cfg = dict(fname="wtsi", start_k=1, end_k=8, step_k=1, sill_thr=0.6,
               itr=1000, init="nnsvd", verbose=True, norm="fro",
               method="mu", checkpoint=False, precision=np.float32)
    cfg.update(overrides)
    args = _build_args(comm_world, 4, 1, out_dir, cfg)
    A_ij = data_read(args).read().astype(args.precision)
    return PyNMFk(A_ij, factors=None, params=args).fit()


EXAMPLES = {"swim": (run_rank_swim, 4), "wtsi": (run_rank_wtsi, 4)}


# --------------------------------------------------------------------------
# Post-processing: per-k stats table (mirrors pyDNMFk.pvalueAnalysis
# :260-300 so the walk's inputs are visible, not just its output).
# --------------------------------------------------------------------------

def per_k_table(results_root, fname, start_k, end_k, step_k, sill_thr):
    import h5py
    from scipy.stats import wilcoxon

    ks = list(range(start_k, end_k + 1, step_k))
    rows = []
    err_dists = {}
    for k in ks:
        with h5py.File(f"{results_root}/{fname}/{k}/results.h5", "r") as f:
            sills = np.array(f["clusterSilhouetteCoefficients"])
            rows.append({
                "k": k,
                "min_sill": float(np.min(sills)),
                "min_sill_rounded": float(round(np.min(sills), 2)),
                "avg_sill": float(np.array(f["avgSilhouetteCoefficients"])),
                "avg_err": float(np.array(f["avgErr"])),
                "reg_err": float(np.array(f["L_errDist"])),
            })
            err_dists[k] = np.array(f["L_err"])
    # Wilcoxon walk, decision-for-decision (pyDNMFk.py:281-299)
    one = err_dists[ks[0]]
    nopt_idx, i = 1, 1
    for i in range(1, len(ks)):
        rows[i]["pvalue"] = None
        if rows[i - 1]["min_sill_rounded"] > sill_thr:
            p = float(wilcoxon(one, err_dists[ks[i]])[1])
            rows[i]["pvalue"] = p
            if p < 0.05:
                nopt_idx = i
                one = np.copy(err_dists[ks[i]])
    return rows, ks[nopt_idx - 1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--example", choices=sorted(EXAMPLES), required=True)
    ap.add_argument("--itr", type=int, default=None)
    ap.add_argument("--perturbations", type=int, default=None)
    ap.add_argument("--start_k", type=int, default=None)
    ap.add_argument("--end_k", type=int, default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--tag", default="run")
    args = ap.parse_args()

    _patch_numpy_legacy()
    _patch_numpy_random()

    import pyDNMFk.config as config
    config.init(0)
    from mpi4py import MPI

    run_rank, n_ranks = EXAMPLES[args.example]
    comm_world = MPI._init_world(n_ranks)

    out_dir = args.out or os.path.join(HERE, "out", f"{args.example}-{args.tag}")
    os.makedirs(out_dir, exist_ok=True)

    overrides = {}
    for key in ("itr", "perturbations", "start_k", "end_k"):
        if getattr(args, key) is not None:
            overrides[key] = getattr(args, key)

    results = [None] * n_ranks
    errors = [None] * n_ranks

    def worker(rank):
        MPI._set_thread_rank(rank)
        try:
            results[rank] = run_rank(comm_world, out_dir, dict(overrides))
        except BaseException:  # noqa: BLE001 — must unblock peers on any failure
            errors[rank] = traceback.format_exc()
            MPI._world_ctx.barrier.abort()
            for child in _walk_ctxs(MPI._world_ctx):
                child.barrier.abort()

    def _walk_ctxs(ctx):
        for child in list(ctx.children.values()):
            yield child
            yield from _walk_ctxs(child)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker, args=(r,), name=f"rank{r}")
               for r in range(n_ranks)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    for r, err in enumerate(errors):
        if err:
            print(f"--- rank {r} FAILED ---\n{err}", file=sys.stderr)
    if any(errors):
        sys.exit(1)

    nopts = [results[r] for r in range(n_ranks)]
    assert len(set(nopts)) == 1, f"ranks disagree on nopt: {nopts}"

    ex_cfg = {"swim": (14, 18, 1, 0.6), "wtsi": (1, 8, 1, 0.6)}[args.example]
    start_k = overrides.get("start_k", ex_cfg[0])
    end_k = overrides.get("end_k", ex_cfg[1])
    fname = {"swim": "swim", "wtsi": "wtsi"}[args.example]
    rows, walked_nopt = per_k_table(out_dir, fname, start_k, end_k,
                                    ex_cfg[2], ex_cfg[3])

    print(f"\n=== reference {args.example} executed via MPI shim "
          f"({n_ranks} ranks, {wall:.1f}s) ===")
    print(f"{'k':>4} {'min_sill':>10} {'rounded':>8} {'avg_sill':>9} "
          f"{'avg_err':>10} {'reg_err':>10} {'pvalue':>12}")
    for row in rows:
        pv = row.get("pvalue")
        print(f"{row['k']:>4} {row['min_sill']:>10.4f} "
              f"{row['min_sill_rounded']:>8.2f} {row['avg_sill']:>9.4f} "
              f"{row['avg_err']:>10.6f} {row['reg_err']:>10.6f} "
              f"{'-' if pv is None else f'{pv:.3e}':>12}")
    summary = {"example": args.example, "nopt": int(nopts[0]),
               "walked_nopt": int(walked_nopt), "wall_s": round(wall, 1),
               "rows": rows, "overrides": overrides}
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(f"\nreference nopt = {nopts[0]} "
          f"(example asserts {16 if args.example == 'swim' else 4})")
    print(json.dumps({k: v for k, v in summary.items() if k != 'rows'}))


if __name__ == "__main__":
    main()
