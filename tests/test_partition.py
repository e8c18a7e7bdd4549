"""Block-partition math: exact index values.

Mirrors reference tests/test_dist_file_split.py — wtsi-shaped 96x21 matrix
on a 2x1 grid must split into rank0 rows [0,47] and rank1 rows [48,95]."""
import numpy as np

from pydnmfk_tpu.parallel.partition import (BlockPartition, block_range,
                                            partition_slices,
                                            rank_to_block_order_H)


def test_wtsi_2x1_exact_indices():
    shape = (96, 21)
    b0 = BlockPartition(0, (2, 1), shape)
    s0, e0 = b0.index_range_inclusive()
    assert s0 == [0, 0] and e0 == [47, 20]
    assert b0.block_shape() == [48, 21]
    b1 = BlockPartition(1, (2, 1), shape)
    s1, e1 = b1.index_range_inclusive()
    assert s1 == [48, 0] and e1 == [95, 20]
    assert b1.block_shape() == [48, 21]


def test_remainder_balanced():
    # reference formula: start = i*(n//k) + min(i, n%k)
    sizes = [block_range(10, 3, i) for i in range(3)]
    assert sizes == [(0, 4), (4, 7), (7, 10)]


def test_partition_covers_matrix():
    shape = (17, 13)
    grid = (3, 2)
    seen = np.zeros(shape, dtype=int)
    for sl in partition_slices(grid, shape):
        seen[sl] += 1
    assert (seen == 1).all()


def test_single_rank_grid():
    b = BlockPartition(5, (1, 1), (7, 9))   # rank ignored when grid == 1
    assert b.block_shape() == [7, 9]


def test_h_block_order_nonsquare():
    # 2x3 grid: rank layout row-major; H chunks live on ranks in column-block
    # order [0, 3, 1, 4, 2, 5]
    assert rank_to_block_order_H(2, 3) == [0, 3, 1, 4, 2, 5]
    # square grid matches the reference formula too
    assert rank_to_block_order_H(2, 2) == [0, 2, 1, 3]
