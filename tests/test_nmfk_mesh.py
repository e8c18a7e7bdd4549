"""NMFk end-to-end on a real (virtual) device mesh: the full pipeline must
run sharded and agree with the single-device answer."""
import numpy as np

from pydnmfk_tpu import NMFConfig, NMFk, NMFkConfig


def _cfg(tmp_path, grid):
    return NMFkConfig(
        nmf=NMFConfig(itr=300, norm="fro", method="mu", init="rand",
                      precision="float64", grid=grid),
        start_k=1, end_k=5, perturbations=6, noise_var=0.015,
        sill_thr=0.6, results_path=str(tmp_path) + "/", fname=f"g{grid[0]}{grid[1]}",
        checkpoint=False)


def test_nmfk_sharded_matches_single(tmp_path):
    from pydnmfk_tpu.utils.data_generator import generate_data
    _, _, X = generate_data(m=64, n=48, k=3, seed=100)
    nopt_single = NMFk(_cfg(tmp_path, (1, 1))).fit(X)
    nopt_mesh = NMFk(_cfg(tmp_path, (2, 2))).fit(X)
    assert nopt_single == nopt_mesh == 3


def test_nmfk_row_mesh(tmp_path):
    from pydnmfk_tpu.utils.data_generator import generate_data
    _, _, X = generate_data(m=64, n=48, k=2, seed=7)
    cfg = _cfg(tmp_path, (4, 1)).replace(start_k=1, end_k=4)
    assert NMFk(cfg).fit(X) == 2


def test_nmfk_ensemble_axis_sharded(tmp_path):
    """Mesh (e=2, r=2, c=2): perturbations sharded over 'e' on top of the
    2D grid — three-way parallelism the reference cannot express."""
    from pydnmfk_tpu.parallel.mesh import GridContext, make_grid_mesh
    from pydnmfk_tpu.utils.data_generator import generate_data
    _, _, X = generate_data(m=64, n=48, k=3, seed=100)
    ctx = GridContext(make_grid_mesh(2, 2, p_e=2))
    cfg = _cfg(tmp_path, (2, 2)).replace(perturbations=8)
    assert NMFk(cfg, ctx).fit(X) == 3
