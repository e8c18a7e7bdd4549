"""Data and results IO.

Reference: pyDNMFk/data_io.py.  Formats kept: .mat (scipy, variable 'X'),
.npy, .csv/.txt, and 'folder' (pre-split per-rank ``<fname><i>.npy`` chunks,
reference data_io.py:44-47).  Results persistence (per-k factor chunks and
``results.h5`` statistics) keeps the reference's on-disk layout so existing
post-processing and the MLP k-predictor work unchanged.

TPU-native departures:
  * The reference has every rank load the FULL file then slice its block
    (data_io.py:92-105) — the documented IO hot spot.  Here .npy loads are
    memory-mapped and sharded arrays are assembled with
    ``jax.make_array_from_callback``, so each host only materializes the
    blocks its devices own.
  * 'folder' chunk layout follows the same remainder-balanced block formula
    (parallel/partition.py) for file-level compatibility.
"""
from __future__ import annotations

import glob
import os
from typing import Optional, Sequence

import jax
import numpy as np

from ..parallel.mesh import GridContext
from ..parallel.partition import BlockPartition, partition_slices, rank_to_block_order_H


# ---------------------------------------------------------------------------
# reading
# ---------------------------------------------------------------------------
def _read_full(path: str, ftype: str, mmap: bool = True) -> np.ndarray:
    if ftype == "npy":
        return np.load(path, mmap_mode="r" if mmap else None)
    if ftype in ("csv", "txt"):
        import pandas as pd
        return pd.read_csv(path, header=None).values
    if ftype == "mat":
        from scipy.io import loadmat
        return loadmat(path)["X"]
    raise ValueError(f"unknown ftype {ftype!r}")


class DataReader:
    """API mirror of reference ``data_read`` (data_io.py:12-105)."""

    def __init__(self, fpath: str, fname: str, ftype: str = "mat",
                 pgrid: Sequence[int] = (1, 1), precision: str = "float32"):
        self.fpath = fpath
        self.fname = fname
        self.ftype = ftype
        self.pgrid = tuple(pgrid)
        self.precision = precision

    def read_global(self) -> np.ndarray:
        """Full matrix on host (single-host path).  ftype='npz' loads a
        scipy.sparse matrix (save_npz layout) as a canonical jax BCOO —
        sparse input is a capability beyond the dense-only reference."""
        if self.ftype == "npz":
            return self._read_sparse()
        if self.ftype == "folder":
            # reassemble the pre-split per-rank chunks
            p_r, p_c = self.pgrid
            chunks = [np.load(os.path.join(
                self.fpath, f"{self.fname}{i}.npy"))
                for i in range(p_r * p_c)]
            rows = [np.hstack(chunks[r * p_c:(r + 1) * p_c])
                    for r in range(p_r)]
            data = np.vstack(rows)
        else:
            path = os.path.join(self.fpath, self.fname + "." + self.ftype)
            data = np.asarray(_read_full(path, self.ftype, mmap=False))
        return data.astype(self.precision)

    def _read_sparse(self):
        import jax.numpy as jnp
        from jax.experimental import sparse as jsparse
        from scipy import sparse as sp
        path = os.path.join(self.fpath, self.fname + ".npz")
        M = sp.load_npz(path).tocoo()
        M.sum_duplicates()
        idx = np.stack([M.row, M.col], axis=1).astype(np.int32)
        bcoo = jsparse.BCOO(
            (jnp.asarray(M.data.astype(self.precision)), jnp.asarray(idx)),
            shape=M.shape, unique_indices=True)
        return bcoo.sort_indices()

    def read_chunk(self, rank: int) -> np.ndarray:
        """One grid block (reference data_partition, data_io.py:70-83).
        .npy goes through the native C block reader (pydnmfk_tpu.native)
        when available, touching only the block's bytes."""
        if self.ftype == "folder":
            return np.load(os.path.join(
                self.fpath, f"{self.fname}{rank}.npy")).astype(self.precision)
        path = os.path.join(self.fpath, self.fname + "." + self.ftype)
        if self.ftype == "npy":
            from ..native import _parse_npy_header, read_npy_block
            info = _parse_npy_header(path)
            if info is not None and len(info[1]) == 2:
                sl = BlockPartition(rank, self.pgrid, info[1]).slices()
                blk = read_npy_block(path, sl[0].start, sl[0].stop,
                                     sl[1].start, sl[1].stop)
                if blk is not None:
                    return blk.astype(self.precision)
        full = _read_full(path, self.ftype)
        sl = BlockPartition(rank, self.pgrid, full.shape).slices()
        return np.asarray(full[sl]).astype(self.precision)

    def read(self, ctx: Optional[GridContext] = None) -> jax.Array | np.ndarray:
        """Read and (if a mesh context is given) place as a sharded global
        array, loading only locally-addressable blocks."""
        from . import timing
        with timing.timed("read"):
            return self._read_impl(ctx)

    def _read_impl(self, ctx):
        if self.ftype == "npz":
            # returned as BCOO; NMF shard-partitions the triplet itself
            # (ops/sparse.py::shard_sparse_grid) on multi-device grids
            return self.read_global()
        if ctx is None or ctx.n_devices == 1:
            return self.read_global()
        if self.ftype == "folder":
            data = self.read_global()
        else:
            path = os.path.join(self.fpath, self.fname + "." + self.ftype)
            data = _read_full(path, self.ftype)
        shape = data.shape
        sharding = ctx.sharding_A
        p_r, p_c = ctx.shape
        if shape[0] % p_r or shape[1] % p_c:
            # XLA's explicit shardings require even tiling; return the host
            # array — NMF/NMFk pad-and-mask before sharding (models/nmf.py
            # _mesh_pad)
            return np.asarray(data).astype(self.precision)

        if self.ftype == "npy":
            from ..native import read_npy_block
            path = os.path.join(self.fpath, self.fname + "." + self.ftype)

            def cb(index):
                rs, cs = index
                blk = read_npy_block(path, rs.start or 0, rs.stop or shape[0],
                                     cs.start or 0, cs.stop or shape[1])
                if blk is None:
                    blk = np.asarray(data[index])
                return blk.astype(self.precision)
        else:
            def cb(index):
                return np.asarray(data[index]).astype(self.precision)

        return jax.make_array_from_callback(shape, sharding, cb)


# ---------------------------------------------------------------------------
# writing
# ---------------------------------------------------------------------------
class DataWriter:
    """API mirror of reference ``data_write`` (data_io.py:143-209): per-grid
    factor chunks as .npy + rank-0-style results.h5."""

    def __init__(self, results_path: str, pgrid: Sequence[int] = (1, 1)):
        self.fpath = results_path
        self.pgrid = tuple(pgrid)
        os.makedirs(self.fpath, exist_ok=True)

    def save_factors(self, W, H, reg: bool = False):
        W = np.asarray(W)
        H = np.asarray(H)
        tag = "reg_" if reg else ""
        wdir = os.path.join(self.fpath, f"W_{tag}factors")
        hdir = os.path.join(self.fpath, f"H_{tag}factors")
        os.makedirs(wdir, exist_ok=True)
        os.makedirs(hdir, exist_ok=True)
        p_r, p_c = self.pgrid
        if p_r == 1 and p_c == 1:
            np.save(os.path.join(wdir, "W.npy"), W)
            np.save(os.path.join(hdir, "H.npy"), H)
        elif p_r == 1:
            np.save(os.path.join(wdir, "W.npy"), W)
            for j, (s, e) in enumerate(_splits(H.shape[1], p_c)):
                np.save(os.path.join(hdir, f"H_{j}.npy"), H[:, s:e])
        elif p_c == 1:
            np.save(os.path.join(hdir, "H.npy"), H)
            for i, (s, e) in enumerate(_splits(W.shape[0], p_r)):
                np.save(os.path.join(wdir, f"W_{i}.npy"), W[s:e])
        else:
            # 2D grid: reference layout splits W into m/p row-blocks in rank
            # order and H into n/p column-blocks placed column-major over the
            # grid (rank (i,j) holds column-block j*p_r+i; see
            # rank_to_block_order_H), matching reference pyNMF's 2D factor
            # distribution (utils.py:97-103) and read_factors' reorder.
            p = p_r * p_c
            order = rank_to_block_order_H(p_r, p_c)
            for b, (s, e) in enumerate(_splits(W.shape[0], p)):
                np.save(os.path.join(wdir, f"W_{b}.npy"), W[s:e])
            for b, (s, e) in enumerate(_splits(H.shape[1], p)):
                np.save(os.path.join(hdir, f"H_{order[b]}.npy"), H[:, s:e])

    def save_cluster_results(self, stats: dict, config: dict = None):
        """results.h5 with the reference's dataset names
        (data_io.py:198-209); run configuration stamped as attrs for
        reproducibility (no reference equivalent)."""
        import h5py
        with h5py.File(os.path.join(self.fpath, "results.h5"), "w") as hf:
            for key, val in (config or {}).items():
                try:
                    hf.attrs[key] = val
                except TypeError:
                    hf.attrs[key] = str(val)
            hf.create_dataset("clusterSilhouetteCoefficients",
                              data=np.asarray(stats["clusterSilhouetteCoefficients"]))
            hf.create_dataset("avgSilhouetteCoefficients",
                              data=np.asarray(stats["avgSilhouetteCoefficients"]))
            hf.create_dataset("L_err", data=np.asarray(stats["L_err"]))
            hf.create_dataset("L_errDist", data=np.asarray(stats["L_errDist"]))
            hf.create_dataset("avgErr", data=np.asarray(stats["avgErr"]))
            hf.create_dataset("ErrTol", data=np.asarray(stats["recon_err"]))
            hf.create_dataset("AIC", data=np.asarray(stats["AIC"]))


def _splits(dim, nblocks):
    from ..parallel.partition import block_range
    return [block_range(dim, nblocks, i) for i in range(nblocks)]


def read_factors(factors_path: str, pgrid: Sequence[int], reg: bool = True):
    """Reassemble saved factor chunks (reference read_factors,
    data_io.py:212-261) — with the corrected rank->block H ordering."""
    tag = "reg_" if reg else ""

    def numkey(p):
        stem = os.path.splitext(os.path.basename(p))[0]
        tail = stem.rsplit("_", 1)[-1]
        return (0, int(tail)) if tail.isdigit() else (1, 0)

    wfiles = sorted(glob.glob(os.path.join(factors_path, f"W_{tag}factors", "*")),
                    key=numkey)
    hfiles = sorted(glob.glob(os.path.join(factors_path, f"H_{tag}factors", "*")),
                    key=numkey)
    W_parts = [np.load(f) for f in wfiles]
    H_parts = [np.load(f) for f in hfiles]
    W = W_parts[0] if len(W_parts) == 1 else np.vstack(W_parts)
    if len(H_parts) == 1:
        H = H_parts[0]
    elif len(W_parts) > 1 and pgrid[0] > 1 and pgrid[1] > 1:
        order = rank_to_block_order_H(pgrid[0], pgrid[1])
        H = np.hstack([H_parts[i] for i in order])
    else:
        H = np.hstack(H_parts)
    return W, H
