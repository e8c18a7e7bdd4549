"""Synthetic low-rank data generation for scaling tests.

Reference: pyDNMFk/data_generator.py — W columns are Gaussian bumps
N(i*m/k, 0.01*m^2) over the row index, H is seeded uniform noise, X = W H,
written as per-rank .npy chunks compatible with ftype='folder'.
"""
from __future__ import annotations

import os

import numpy as np

from ..parallel.partition import partition_slices


def gauss_matrix(m: int, k: int) -> np.ndarray:
    """W (m, k): column i is a Gaussian bump centered at i*m/k
    (reference gauss_matrix_generator, data_generator.py:60-81)."""
    rows = np.arange(m)[:, None]
    centers = (np.arange(k) * m / k)[None, :]
    var = 0.01 * m * m
    return np.exp(-((rows - centers) ** 2) / (2.0 * var)).astype(np.float64)


def generate_data(m: int, n: int, k: int, seed: int = 100):
    """Global (W, H, X = W @ H)."""
    W = gauss_matrix(m, k)
    rng = np.random.RandomState(seed)
    H = rng.rand(k, n)
    return W, H, W @ H


def generate_and_save(m: int, n: int, k: int, pgrid, fpath: str,
                      seed: int = 100, fname: str = "X_"):
    """Write per-rank chunks X_<rank>.npy (+ W_/H_ chunks) for
    ftype='folder' reads (reference fit, data_generator.py:140-150)."""
    os.makedirs(fpath, exist_ok=True)
    W, H, X = generate_data(m, n, k, seed)
    for rank, (rsl, csl) in enumerate(partition_slices(pgrid, X.shape)):
        np.save(os.path.join(fpath, f"{fname}{rank}.npy"), X[rsl, csl])
        np.save(os.path.join(fpath, f"W_{rank}.npy"), W[rsl, :])
        np.save(os.path.join(fpath, f"H_{rank}.npy"), H[:, csl])
    return X.shape


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser(description="synthetic NMF data generator")
    p.add_argument("--p_r", type=int, default=1)
    p.add_argument("--p_c", type=int, default=1)
    p.add_argument("--m", type=int, default=1024)
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--k", type=int, default=4)
    p.add_argument("--fpath", type=str, default="data/")
    args = p.parse_args(argv)
    generate_and_save(args.m, args.n, args.k, (args.p_r, args.p_c),
                      args.fpath)


if __name__ == "__main__":
    main()
