"""Pallas ELL VMEM-gather kernel (ops/pallas_ell.py, VERDICT r3 item 1):
interpret-mode parity with the XLA gather path on CPU.  The TPU dispatch
gate (ops/ell.py::_try_pallas) is exercised by bench.py's sparse rows and
tools/pallas_ell_probe.py on the chip."""
import jax.numpy as jnp
import numpy as np
import pytest

from pydnmfk_tpu.ops.ell import _gather_product
from pydnmfk_tpu.ops.pallas_ell import ell_gather_product, table_fits_vmem


@pytest.mark.parametrize("m,n,k,w,seed", [
    (700, 300, 32, 9, 0),       # ragged over the 512-row grid blocks
    (512, 128, 8, 3, 1),        # exact block multiple, tiny k/w
    (1030, 500, 64, 17, 2),
])
def test_pallas_matches_xla_gather(m, n, k, w, seed):
    rng = np.random.default_rng(seed)
    vals = (rng.random((m, w)) * (rng.random((m, w)) < 0.7)).astype(
        np.float32)
    idx = rng.integers(0, n, (m, w)).astype(np.int32)
    Ht = rng.random((n, k)).astype(np.float32)

    ref = np.asarray(_gather_product(jnp.asarray(vals), jnp.asarray(idx),
                                     jnp.asarray(Ht)))
    out = np.asarray(ell_gather_product(
        jnp.asarray(vals), jnp.asarray(idx), jnp.asarray(Ht),
        interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_pallas_kl_ratio_matches_xla():
    rng = np.random.default_rng(3)
    m, n, k, w = 700, 300, 16, 7
    vals = (rng.random((m, w)) + 0.1).astype(np.float32)
    idx = rng.integers(0, n, (m, w)).astype(np.int32)
    Ht = (rng.random((n, k)) + 0.1).astype(np.float32)
    W = (rng.random((m, k)) + 0.1).astype(np.float32)
    eps = float(np.finfo(np.float32).eps)

    ref = np.asarray(_gather_product(
        jnp.asarray(vals), jnp.asarray(idx), jnp.asarray(Ht),
        ratio_with=jnp.asarray(W), eps=eps))
    out = np.asarray(ell_gather_product(
        jnp.asarray(vals), jnp.asarray(idx), jnp.asarray(Ht),
        ratio_with=jnp.asarray(W), eps=eps, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_vmem_budget_gate():
    # flagship sparse shapes fit; a 1M-row table at k=256 does not
    assert table_fits_vmem(40_000, 32)
    assert table_fits_vmem(100_000, 8)
    assert not table_fits_vmem(1_000_000, 256)
