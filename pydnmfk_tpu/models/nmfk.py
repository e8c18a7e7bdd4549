"""NMFk: automatic latent-dimension selection via perturbation ensembles.

Reference: ``PyNMFk`` (pyDNMFk/pyDNMFk.py:70-300).  For each k in
[start_k, end_k]: factorize ``perturbations`` noise-perturbed copies of A,
cluster the resulting W columns across the ensemble (models/clustering.py),
regress H against the median factors with W frozen, record per-column error
distributions + silhouettes + AIC to results.h5, then walk k ascending with
a Wilcoxon signed-rank test gated on minimum silhouette to select k
(pvalueAnalysis, pyDNMFk.py:260-300 — replicated decision-for-decision since
the published golden values nopt=16 (swim) / nopt=4 (wtsi) depend on it).

TPU-native re-design: the reference solves ensemble members *serially*
(pyDNMFk.py:226-231, its main scaling limitation).  Here the whole ensemble
is one batched computation — sampling is a vmapped PRNG draw and the NMF
iteration loop is vmapped over a leading perturbation axis (optionally
sharded over the mesh 'e' axis) — so one jit-compiled program factorizes all
perturbations at once on the MXU.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import NMFkConfig
from ..ops import linalg
from ..parallel.mesh import GridContext, grid_context
from ..utils.checkpoint import (Checkpoint, FLAG_CLUSTERED, FLAG_PERTS_DONE,
                                FLAG_RUNNING, FLAG_SAVED)
from ..utils.io import DataWriter
from ..utils import timing
from . import nmf as nmf_mod
from .clustering import cluster_ensemble
from .nmf import NMF
from .sampler import sample_ensemble
from .svd import DistSVD


class NMFk:
    def __init__(self, cfg: NMFkConfig, ctx: Optional[GridContext] = None):
        from ..config import ensure_precision_enabled, enable_compilation_cache
        ensure_precision_enabled(cfg.nmf.precision)
        enable_compilation_cache()
        self.cfg = cfg
        self.ctx = ctx if ctx is not None else grid_context(*cfg.nmf.grid)
        self.results_path = os.path.join(cfg.results_path, cfg.fname)
        self.checkpoint = Checkpoint(self.results_path,
                                     enabled=cfg.checkpoint)
        self.per_k_stats = {}

    # ------------------------------------------------------------------
    def fit(self, A) -> int:
        """Run the full sweep; returns the estimated k (reference
        PyNMFk.fit, pyDNMFk.py:168-215)."""
        cfg = self.cfg
        os.makedirs(self.results_path, exist_ok=True)
        A = jnp.asarray(A, dtype=cfg.nmf.dtype)
        self._orig_shape = A.shape
        if self.ctx.n_devices > 1:
            # pad-and-mask for XLA's even-tiling requirement; downstream
            # stats stay in original coordinates (padding is appended, so
            # A_padded[:m, :n] recovers the original for the regression)
            from ..parallel.partition import mesh_padding
            pm, pn = mesh_padding(A.shape, self.ctx.shape)
            if pm or pn:
                A = jnp.pad(A, ((0, pm), (0, pn)))
            A = jax.device_put(A, self.ctx.sharding_A)

        start_k = self.checkpoint.resume_k(cfg.start_k, cfg.step_k)
        for k in range(start_k, cfg.end_k + 1, cfg.step_k):
            self.pynmfk_per_k(A, k)

        nopt = self.pvalue_analysis()
        try:
            from ..utils.plotting import plot_results_fpath
            plot_results_fpath(self.results_path, list(cfg.k_range))
        except Exception:
            pass
        return nopt

    # ------------------------------------------------------------------
    def _init_ensemble(self, A_ens, k):
        """Batched W0/H0 for every perturbation (rand or nnsvd)."""
        cfg = self.cfg.nmf
        p, m, n = A_ens.shape
        if cfg.init == "rand":
            key = jax.random.key(cfg.seed)
            keys = jax.random.split(key, p)
            W0 = jax.vmap(lambda kk: jax.random.uniform(
                kk, (m, k), jnp.float32))(keys).astype(cfg.dtype)
            keys2 = jax.random.split(jax.random.fold_in(key, 1), p)
            H0 = jax.vmap(lambda kk: jax.random.uniform(
                kk, (k, n), jnp.float32))(keys2).astype(cfg.dtype)
            return W0, H0
        elif cfg.init == "nnsvd":
            from .svd import nnsvd_factors
            W0, H0 = jax.vmap(
                lambda a: nnsvd_factors(a, k, cfg.eps))(A_ens)
            return W0.astype(cfg.dtype), H0.astype(cfg.dtype)
        raise ValueError(f"unknown init {cfg.init!r}")

    def _solve_ensemble(self, A, k):
        """Sample + factorize all perturbations; returns
        (W_all (p,m,k), H_all (p,k,n), errs (p,))."""
        cfg = self.cfg
        ncfg = cfg.nmf.replace(k=k)
        eps = jnp.asarray(ncfg.eps, ncfg.dtype)
        n_pert = cfg.perturbations
        batch = cfg.ensemble_batch or n_pert
        key = jax.random.key(ncfg.seed)

        # ensemble parallelism: shard the perturbation axis over the mesh's
        # 'e' axis when present (the reference's serial loop, now a third
        # parallel dimension on top of the r x c grid).  Batches are padded
        # up to a multiple of p_e with extra members (discarded after the
        # solve) so the sharding never silently degrades to replication.
        p_e = self.ctx.p_e

        W_parts, H_parts, err_parts = [], [], []
        done = 0
        while done < n_pert:
            b = min(batch, n_pert - done)
            b_pad = -(-b // p_e) * p_e
            kb = jax.random.fold_in(key, done)
            A_ens = sample_ensemble(A, kb, cfg.noise_var, b_pad, cfg.sampling)
            # mixed precision: the p perturbed copies of A dominate HBM
            # footprint/traffic; store them at a_precision (noise is drawn
            # at full precision first, so sampling statistics are exact)
            if A_ens.dtype != jnp.dtype(ncfg.a_dtype):
                A_ens = A_ens.astype(ncfg.a_dtype)
            W0, H0 = self._init_ensemble(A_ens, k)
            if p_e > 1:
                A_ens = jax.device_put(A_ens,
                                       self.ctx.sharding(self.ctx.spec_A_batched))
                W0 = jax.device_put(W0,
                                    self.ctx.sharding(self.ctx.spec_W_batched))
                H0 = jax.device_put(H0,
                                    self.ctx.sharding(self.ctx.spec_H_batched))
            W, H, errs = nmf_mod.solve(A_ens, W0, H0, eps, ncfg,
                                       W_update=True, batched=True)
            W_parts.append(W[:b])
            H_parts.append(H[:b])
            err_parts.append(errs[:b])
            done += b
            self.checkpoint.save(FLAG_RUNNING, done, k, ncfg.seed)
        cat = (lambda xs: xs[0] if len(xs) == 1 else jnp.concatenate(xs, 0))
        return cat(W_parts), cat(H_parts), np.asarray(cat(err_parts))

    # ------------------------------------------------------------------
    def pynmfk_per_k(self, A, k):
        """One k: ensemble -> clustering -> regression -> stats
        (reference pynmfk_per_k, pyDNMFk.py:217-258)."""
        cfg = self.cfg
        k_path = os.path.join(self.results_path, str(k))
        os.makedirs(k_path, exist_ok=True)
        if cfg.nmf.verbose:
            print(f"*************Computing for k={k}************")

        # mid-k resume: a completed ensemble is cached on disk, so an
        # interrupted clustering/regression stage never recomputes the
        # perturbations (the reference records per-perturbation state but
        # always restarts the loop from 0, pyDNMFk.py:188-196,226)
        ens_cache = os.path.join(k_path, "ensemble.npz")
        st = self.checkpoint.state
        resume_ok = (cfg.checkpoint and st is not None and st.k == k
                     and st.flag >= FLAG_PERTS_DONE
                     and os.path.exists(ens_cache))
        if resume_ok:
            with np.load(ens_cache) as d:
                W_all = jnp.asarray(d["W"])
                H_all = jnp.asarray(d["H"])
                recon_errs = d["errs"]
        else:
            with timing.timed("ensemble_solve"):
                W_all, H_all, recon_errs = self._solve_ensemble(A, k)
            if cfg.checkpoint:
                np.savez(ens_cache, W=np.asarray(W_all),
                         H=np.asarray(H_all), errs=recon_errs)
        self.checkpoint.save(FLAG_PERTS_DONE, cfg.perturbations, k)

        with timing.timed("clustering"):
            (centroids, cent_std, H_all_c, cluster_sils, avg_sil,
             _sils) = cluster_ensemble(W_all, H_all, cfg.nmf.eps)
        self.checkpoint.save(FLAG_CLUSTERED, cfg.perturbations, k)

        m, n = self._orig_shape
        # slice off mesh padding before regression (it re-pads internally;
        # padding is appended so A[:m, :n] is the original matrix)
        AvgW = np.asarray(centroids)[:m]
        AvgH = np.asarray(jnp.median(H_all_c, axis=0))[:, :n]

        # regression re-fit of H with W frozen (pyDNMFk.py:245-248)
        reg_cfg = cfg.nmf.replace(k=k, W_update=False)
        reg = NMF(reg_cfg, self.ctx)
        A_reg = A[:m, :n] if A.shape != (m, n) else A
        AvgW, AvgH, L_errDist = reg.fit(A_reg, factors=(AvgW, AvgH))
        col_err = reg.column_err()
        avg_err = float(np.mean(recon_errs))
        aic = 2 * k + m * n * float(np.log(avg_err / (m * n)))

        stats = {
            "clusterSilhouetteCoefficients": np.asarray(cluster_sils),
            "avgSilhouetteCoefficients": float(avg_sil),
            "L_errDist": L_errDist,
            "L_err": col_err,
            "avgErr": avg_err,
            "recon_err": recon_errs,
            "AIC": aic,
        }
        writer = DataWriter(k_path, cfg.nmf.grid)
        writer.save_factors(AvgW, AvgH, reg=True)
        import dataclasses
        run_cfg = {**dataclasses.asdict(cfg.nmf), "k": k,
                   "perturbations": cfg.perturbations,
                   "noise_var": cfg.noise_var, "sampling": cfg.sampling}
        writer.save_cluster_results(stats, config=run_cfg)
        self.per_k_stats[k] = stats
        self.checkpoint.save(FLAG_SAVED, cfg.perturbations, k)
        return stats

    # ------------------------------------------------------------------
    def pvalue_analysis(self) -> int:
        """Wilcoxon walk over the recorded per-k column-error distributions
        (reference pvalueAnalysis, pyDNMFk.py:260-300 — exact replica of the
        decision logic, re-reading results.h5 so it works after restart)."""
        from scipy.stats import wilcoxon
        import h5py

        cfg = self.cfg
        ks = list(cfg.k_range)
        sill_min, err_dists = [], []
        for k in ks:
            with h5py.File(os.path.join(self.results_path, str(k),
                                        "results.h5"), "r") as f:
                err_dists.append(np.array(f["L_err"]))
                sill_min.append(round(float(
                    np.min(np.array(f["clusterSilhouetteCoefficients"]))), 2))

        pvalue = np.ones(len(ks))
        best_err = err_dists[0]
        nopt = 1
        i = 1
        while i < len(ks):
            if sill_min[i - 1] > cfg.sill_thr:
                try:
                    pvalue[i] = wilcoxon(best_err, err_dists[i])[1]
                except ValueError:
                    # identical distributions (all-zero differences):
                    # no evidence of change
                    pvalue[i] = 1.0
                if pvalue[i] < 0.05:
                    nopt = i
                    best_err = np.copy(err_dists[i])
            i += 1
        self.pvalues = pvalue
        return ks[nopt - 1]
