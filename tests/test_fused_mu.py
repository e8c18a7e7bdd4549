"""One-pass fused MU kernel: numerical equality with the standard step
(interpret mode on CPU)."""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))


@pytest.mark.parametrize("m,n,k", [(300, 200, 8), (64, 48, 3)])
def test_fused_matches_standard(m, n, k):
    from pydnmfk_tpu.ops.fused_mu import fused_mu_fro_step
    from pydnmfk_tpu.models.updates import mu_fro_step
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.random((m, n)), jnp.float32)
    W = jnp.asarray(rng.random((m, k)), jnp.float32)
    H = jnp.asarray(rng.random((k, n)), jnp.float32)
    W1, H1 = fused_mu_fro_step(A, W, H, 1e-7)
    W2, H2 = mu_fro_step(A, W, H, 1e-7)
    np.testing.assert_allclose(np.asarray(W1), np.asarray(W2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(H1), np.asarray(H2), rtol=1e-5)


def test_fused_mixed_precision_matches_standard():
    """bf16-A mixed precision: fused kernel tracks the standard mixed step."""
    from pydnmfk_tpu.ops.fused_mu import fused_mu_fro_step
    from pydnmfk_tpu.models.updates import mu_fro_step
    rng = np.random.default_rng(1)
    A = jnp.asarray(rng.random((128, 96)), jnp.bfloat16)
    W = jnp.asarray(rng.random((128, 8)), jnp.float32)
    H = jnp.asarray(rng.random((8, 96)), jnp.float32)
    W1, H1 = fused_mu_fro_step(A, W, H, 1e-7)
    W2, H2 = mu_fro_step(A, W, H, jnp.float32(1e-7))
    assert W1.dtype == jnp.float32 and H1.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(W1), np.asarray(W2),
                               rtol=5e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(H1), np.asarray(H2),
                               rtol=5e-3, atol=1e-4)


def test_fused_kl_sharded_wrappers():
    """shard_map wrappers for the KL kernels on a 2x2 mesh."""
    from pydnmfk_tpu.ops.pallas_kernels import (kl_uht_pallas_sharded,
                                                kl_wtu_pallas_sharded)
    from pydnmfk_tpu.parallel.mesh import GridContext, make_grid_mesh
    ctx = GridContext(make_grid_mesh(2, 2))
    rng = np.random.default_rng(0)
    A = jax.device_put(rng.random((256, 256)).astype(np.float32),
                       ctx.sharding_A)
    W = jax.device_put(rng.random((256, 5)).astype(np.float32),
                       ctx.sharding_W)
    H = jax.device_put(rng.random((5, 256)).astype(np.float32),
                       ctx.sharding_H)
    eps = 1e-7
    U = np.asarray(A) / (np.asarray(W) @ np.asarray(H) + eps)
    uht = kl_uht_pallas_sharded(A, W, H, eps, ctx)
    wtu = kl_wtu_pallas_sharded(A, W, H, eps, ctx)
    np.testing.assert_allclose(np.asarray(uht), U @ np.asarray(H).T,
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(wtu), np.asarray(W).T @ U,
                               rtol=1e-4, atol=1e-3)
    assert uht.sharding.spec == ctx.spec_W
    assert wtu.sharding.spec == ctx.spec_H
