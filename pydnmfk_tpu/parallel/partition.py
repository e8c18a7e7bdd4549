"""Block-partition index math, compatible with the reference layout.

The reference maps rank -> (start, end) index ranges per dimension with
remainder-balanced chunks (pyDNMFk/utils.py:36-46):

    start = i * (n // k) + min(i, n % k)
    end   = (i+1) * (n // k) + min(i+1, n % k) - 1   (inclusive)

We keep the exact same formula so that (a) per-rank 'folder' data files
written for the reference load identically, (b) saved factor chunks
round-trip, and (c) the reference's exact-index test values
(tests/test_dist_file_split.py) hold.

Note: XLA's NamedSharding pads the *last* shards instead; these helpers are
used at the host IO boundary (reading per-rank chunks, writing factor
chunks), where reference-compatible layout matters.  Global jax.Arrays are
assembled from these chunks with ``jax.make_array_from_callback`` when chunk
layouts match, or via host concatenation otherwise.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def block_range(dim: int, nblocks: int, index: int) -> Tuple[int, int]:
    """[start, end) range of block ``index`` out of ``nblocks`` over ``dim``."""
    q, r = divmod(dim, nblocks)
    start = index * q + min(index, r)
    end = (index + 1) * q + min(index + 1, r)
    return start, end


def block_shape(dim: int, nblocks: int, index: int) -> int:
    s, e = block_range(dim, nblocks, index)
    return e - s


class BlockPartition:
    """Rank -> block index ranges for a (p_r, p_c) grid over a 2D shape.

    API mirror of the reference ``determine_block_params`` (utils.py:15-46),
    with [start, end) half-open convention internally and inclusive-end
    accessors for parity tests.
    """

    def __init__(self, rank: int, pgrid: Sequence[int], shape: Sequence[int]):
        self.rank = rank if int(np.prod(pgrid)) > 1 else 0
        self.pgrid = tuple(pgrid)
        self.shape = tuple(shape)

    def ranges(self) -> List[Tuple[int, int]]:
        """Per-dimension [start, end) ranges for this rank's block."""
        coords = np.unravel_index(self.rank, self.pgrid)
        return [block_range(n, k, int(i))
                for n, k, i in zip(self.shape, self.pgrid, coords)]

    def index_range_inclusive(self):
        """(start_inds, end_inds) with inclusive ends — reference convention
        (utils.py:36-41)."""
        rng = self.ranges()
        return [s for s, _ in rng], [e - 1 for _, e in rng]

    def block_shape(self) -> List[int]:
        return [e - s for s, e in self.ranges()]

    def slices(self) -> Tuple[slice, ...]:
        return tuple(slice(s, e) for s, e in self.ranges())


def partition_slices(pgrid: Sequence[int], shape: Sequence[int]
                     ) -> List[Tuple[slice, ...]]:
    """Slices for every rank, in rank order (row-major over the grid)."""
    n = int(np.prod(pgrid))
    return [BlockPartition(r, pgrid, shape).slices() for r in range(n)]


def padded_dim(dim: int, nblocks: int) -> int:
    """Smallest multiple of nblocks >= dim."""
    return -(-dim // nblocks) * nblocks


def mesh_padding(shape: Sequence[int], pgrid: Sequence[int]):
    """Per-dim zero-padding needed to make ``shape`` explicitly shardable
    over ``pgrid`` (XLA's NamedSharding requires even tiling; the padded
    rows/cols are exact zeros, which every NMF update treats as inert —
    their W rows / H cols decay to ~eps and perturb global statistics at
    the eps^2 level)."""
    return tuple(padded_dim(d, p) - d for d, p in zip(shape, pgrid))


def rank_to_block_order_H(p_r: int, p_c: int) -> List[int]:
    """Reorder gathered H chunks from rank order to column-block order.

    Fixes the reference's ``transform_H_index.rankidx2blkidx`` which uses
    ``i * p_r + j`` (utils.py:357) — only correct for square grids; the
    correct stride over a row-major (p_r, p_c) rank layout is ``i * p_c + j``.
    """
    return [i * p_c + j for j in range(p_c) for i in range(p_r)]
