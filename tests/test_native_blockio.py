"""Native C block reader: exact agreement with numpy slicing."""
import numpy as np
import pytest

from pydnmfk_tpu.native import get_lib, read_npy_block


def test_block_read_matches_numpy(tmp_path):
    if get_lib() is None:
        pytest.skip("no C toolchain")
    rng = np.random.default_rng(0)
    for dt in (np.float32, np.float64, np.uint8, np.int32):
        A = (rng.random((57, 43)) * 100).astype(dt)
        p = str(tmp_path / f"a_{np.dtype(dt).name}.npy")
        np.save(p, A)
        blk = read_npy_block(p, 11, 40, 7, 31)
        np.testing.assert_array_equal(blk, A[11:40, 7:31])
        # full matrix
        np.testing.assert_array_equal(read_npy_block(p, 0, 57, 0, 43), A)


def test_reader_uses_native_path(tmp_path):
    if get_lib() is None:
        pytest.skip("no C toolchain")
    from pydnmfk_tpu.utils.io import DataReader
    rng = np.random.default_rng(1)
    A = rng.random((30, 20)).astype(np.float64)
    np.save(str(tmp_path / "A.npy"), A)
    r = DataReader(str(tmp_path) + "/", "A", "npy", pgrid=(3, 2),
                   precision="float64")
    for rank in range(6):
        from pydnmfk_tpu.parallel.partition import BlockPartition
        sl = BlockPartition(rank, (3, 2), A.shape).slices()
        np.testing.assert_array_equal(r.read_chunk(rank), A[sl])


def test_fortran_order_falls_back(tmp_path):
    A = np.asfortranarray(np.arange(12.0).reshape(3, 4))
    p = str(tmp_path / "f.npy")
    np.save(p, A)
    assert read_npy_block(p, 0, 2, 0, 2) is None  # unsupported -> fallback
