"""Property test: every sparse execution format computes the SAME model.

For random shapes / densities / (norm, method) combos, one MU solve must
agree across: dense array, BCOO triplet, capped-width ELL (with forced
tails), and the grid-sharded triplet on a (2, 2) mesh.  Guards the format
dispatchers (ops/linalg.py, models/updates.py) against drift — any new
format or policy change has to keep this invariant."""
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import sparse as jsparse

from pydnmfk_tpu.config import NMFConfig
from pydnmfk_tpu.models.nmf import NMF
from pydnmfk_tpu.ops.ell import ell_pack
from pydnmfk_tpu.parallel.mesh import grid_context


CASES = [
    # (seed, m, n, ktrue, density, norm, method)
    (0, 36, 28, 3, 0.30, "fro", "mu"),
    (1, 41, 22, 2, 0.20, "kl", "mu"),
    (2, 24, 40, 3, 0.40, "fro", "hals"),
    (3, 52, 36, 4, 0.15, "fro", "mu"),
    (4, 30, 30, 2, 0.25, "kl", "mu"),
]


@pytest.mark.parametrize("seed,m,n,ktrue,density,norm,method", CASES)
def test_formats_agree(seed, m, n, ktrue, density, norm, method):
    rng = np.random.default_rng(seed)
    dense = ((rng.random((m, ktrue)) @ rng.random((ktrue, n)))
             * (rng.random((m, n)) < density)).astype(np.float32)
    Asp = jsparse.BCOO.fromdense(jnp.asarray(dense))
    E = ell_pack(Asp, w_cap=max(2, int(density * n * 0.6)),
                 max_tail_frac=1.0)
    cfg = NMFConfig(k=ktrue, norm=norm, method=method, itr=150, seed=7)

    _, _, e_dense = NMF(cfg).fit(jnp.asarray(dense))
    _, _, e_bcoo = NMF(cfg).fit(Asp)
    _, _, e_ell = NMF(cfg).fit(E)
    _, _, e_grid = NMF(cfg.replace(grid=(2, 2)),
                       grid_context(2, 2)).fit(Asp)
    # per-block capped-ELL on the same mesh (VERDICT r4 item 3) —
    # forced, since the CPU auto-policy picks the triplet
    _, _, e_gell = NMF(cfg.replace(grid=(2, 2),
                                   sparse_grid_format="ell"),
                       grid_context(2, 2)).fit(Asp)

    # same init stream + same math, only summation order differs
    np.testing.assert_allclose(e_bcoo, e_dense, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(e_ell, e_bcoo, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(e_grid, e_bcoo, atol=5e-4, rtol=5e-3)
    np.testing.assert_allclose(e_gell, e_grid, atol=5e-4, rtol=5e-3)
