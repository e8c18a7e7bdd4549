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


@pytest.mark.parametrize("chunk,use_pallas", [(0, True), (32, False),
                                              (32, True)])
def test_kl_sharded_wrappers(chunk, use_pallas):
    """Mesh-sharded memory-bounded KL products (chunked scan and per-block
    Pallas kernels under shard_map) match the dense global computation on a
    2x2 mesh — the multi-device contract of the reference's UHT_glob/
    WTU_glob (dist_nmf.py:293-343)."""
    from pydnmfk_tpu.ops.kl import kl_uht_sharded, kl_wtu_sharded
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
    uht = kl_uht_sharded(A, W, H, eps, ctx.mesh, chunk, use_pallas)
    wtu = kl_wtu_sharded(A, W, H, eps, ctx.mesh, chunk, use_pallas)
    np.testing.assert_allclose(np.asarray(uht), U @ np.asarray(H).T,
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(wtu), np.asarray(W).T @ U,
                               rtol=1e-4, atol=1e-3)
    assert uht.sharding.spec == ctx.spec_W
    assert wtu.sharding.spec == ctx.spec_H


def test_kl_solve_chunked_on_mesh_matches_single_device():
    """Full KL/MU solve with kl_chunk on a 2x2 mesh == unsharded solve:
    the sharded bounded-memory path changes memory behavior, not numerics
    (VERDICT r1 item 4)."""
    from pydnmfk_tpu.config import NMFConfig
    from pydnmfk_tpu.models import nmf as nmf_mod
    from pydnmfk_tpu.parallel.mesh import GridContext, make_grid_mesh
    rng = np.random.default_rng(3)
    m, n, k = 64, 48, 4
    A0 = (rng.random((m, k)) @ rng.random((k, n))).astype(np.float32)
    W0 = rng.random((m, k)).astype(np.float32)
    H0 = rng.random((k, n)).astype(np.float32)
    eps = jnp.float32(1.19e-7)

    cfg1 = NMFConfig(k=k, norm="kl", method="mu", itr=40)
    Wd, Hd, errd = nmf_mod.solve(jnp.asarray(A0), jnp.asarray(W0),
                                 jnp.asarray(H0), eps, cfg1)

    ctx = GridContext(make_grid_mesh(2, 2))
    cfgm = cfg1.replace(grid=(2, 2), kl_chunk=16)
    Ws, Hs, errs = nmf_mod.solve(ctx.put_A(jnp.asarray(A0)),
                                 ctx.put_W(jnp.asarray(W0)),
                                 ctx.put_H(jnp.asarray(H0)), eps, cfgm)
    np.testing.assert_allclose(np.asarray(Ws), np.asarray(Wd),
                               rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(Hs), np.asarray(Hd),
                               rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(float(errs), float(errd), rtol=1e-4)


@pytest.mark.parametrize("fn_name", ["relative_error", "column_error"])
def test_chunked_error_matches_direct(fn_name):
    """Memory-bounded error passes == direct computation (summation-order
    tolerance only)."""
    from pydnmfk_tpu.ops import linalg
    fn = getattr(linalg, fn_name)
    rng = np.random.default_rng(11)
    A = jnp.asarray(rng.random((70, 40)), jnp.float32)  # ragged vs chunk
    W = jnp.asarray(rng.random((70, 5)), jnp.float32)
    H = jnp.asarray(rng.random((5, 40)), jnp.float32)
    direct = np.asarray(fn(A, W, H))
    chunked = np.asarray(fn(A, W, H, 16))
    np.testing.assert_allclose(chunked, direct, rtol=1e-5)


def test_error_chunk_rows_policy():
    from pydnmfk_tpu.ops import linalg
    assert linalg.error_chunk_rows(100, 100) == 0          # small: direct
    assert linalg.error_chunk_rows(57600, 38400) > 0       # flagship: chunk
    assert linalg.error_chunk_rows(57600, 38400, sharded=True) == 0
    c = linalg.error_chunk_rows(57600, 38400)
    assert c * 38400 <= (1 << 27)


@pytest.mark.parametrize("m,n,k,mixed", [(300, 200, 8, False),
                                         (64, 48, 3, False),
                                         (128, 96, 8, True)])
def test_fused_kl_matches_standard(m, n, k, mixed):
    """One-pass fused KL iteration == standard mu_kl_step (interpret mode;
    f32-accumulation-order tolerance)."""
    from pydnmfk_tpu.ops.fused_kl import fused_mu_kl_step
    from pydnmfk_tpu.models.updates import mu_kl_step
    rng = np.random.default_rng(4)
    A = jnp.asarray(rng.random((m, n)),
                    jnp.bfloat16 if mixed else jnp.float32)
    W = jnp.asarray(rng.random((m, k)), jnp.float32)
    H = jnp.asarray(rng.random((k, n)), jnp.float32)
    eps = jnp.float32(1.19e-7)
    W1, H1 = fused_mu_kl_step(A, W, H, eps)
    W2, H2 = mu_kl_step(A, W, H, eps)
    tol = dict(rtol=5e-3, atol=1e-4) if mixed else dict(rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(W1), np.asarray(W2), **tol)
    np.testing.assert_allclose(np.asarray(H1), np.asarray(H2), **tol)


def test_fused_kl_solve_dispatch():
    """cfg.use_fused=True routes the KL solve through the fused step and
    converges identically to the standard path."""
    from pydnmfk_tpu.config import NMFConfig
    from pydnmfk_tpu.models import nmf as nmf_mod
    rng = np.random.default_rng(5)
    m, n, k = 72, 40, 3
    A = jnp.asarray(rng.random((m, k)) @ rng.random((k, n)), jnp.float32)
    W = jnp.asarray(rng.random((m, k)), jnp.float32)
    H = jnp.asarray(rng.random((k, n)), jnp.float32)
    eps = jnp.float32(1.19e-7)
    cfg_std = NMFConfig(k=k, norm="kl", method="mu", itr=30, use_fused=False)
    cfg_fused = cfg_std.replace(use_fused=True)
    W1, H1, e1 = nmf_mod.solve(A, W, H, eps, cfg_std)
    W2, H2, e2 = nmf_mod.solve(A, W, H, eps, cfg_fused)
    np.testing.assert_allclose(float(e1), float(e2), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(W1), np.asarray(W2), rtol=5e-3,
                               atol=1e-5)


def test_matmul_compute_dtype(monkeypatch):
    """Operand-dtype rule for the fused kernels: integer A -> bf16; f32 A
    -> bf16 ONLY on TPU under the default matmul precision; a requested
    high precision (or any non-TPU backend) keeps f32; bf16 stays bf16."""
    from pydnmfk_tpu.ops.pallas_kernels import matmul_compute_dtype

    assert matmul_compute_dtype(jnp.uint8) == jnp.bfloat16
    assert matmul_compute_dtype(jnp.bfloat16) == jnp.bfloat16
    # CPU backend: f32 stays f32 (XLA computes true-f32 dots there)
    assert matmul_compute_dtype(jnp.float32) == jnp.float32
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert matmul_compute_dtype(jnp.float32) == jnp.bfloat16
    with jax.default_matmul_precision("highest"):
        assert matmul_compute_dtype(jnp.float32) == jnp.float32
    assert matmul_compute_dtype(jnp.float64) == jnp.float64


def test_fused_auto_dispatch_policy(monkeypatch):
    """The measured dispatch policy (docs/PERFORMANCE.md): auto-fusion for
    FRO on a single TPU shard (bf16/uint8/f32-default-precision A); KL
    fused stays opt-in; KL auto-chunks large blocks."""
    from pydnmfk_tpu.config import NMFConfig
    from pydnmfk_tpu.models import nmf as nmf_mod

    captured = {}
    real = nmf_mod._jitted_solver

    def spy(norm, method, itr, W_update, chunk, batched, use_pallas=False,
            use_fused=False, *args, **kw):
        captured.update(norm=norm, chunk=chunk, use_fused=use_fused,
                        use_pallas=use_pallas,
                        err_chunk=(args[3] if len(args) > 3
                                   else kw.get("err_chunk", 0)))
        return real(norm, method, itr, W_update, chunk, batched,
                    use_pallas, use_fused, *args, **kw)

    monkeypatch.setattr(nmf_mod, "_jitted_solver", spy)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    A32 = jnp.ones((64, 48), jnp.float32)
    A16 = jnp.ones((64, 48), jnp.bfloat16)
    W = jnp.ones((64, 3), jnp.float32)
    H = jnp.ones((3, 48), jnp.float32)
    eps = jnp.float32(1e-7)

    nmf_mod.solve(A16, W, H, eps, NMFConfig(k=3, norm="fro", itr=1))
    assert captured["use_fused"] is True          # FRO + bf16-A: fused

    nmf_mod.solve(A32, W, H, eps, NMFConfig(k=3, norm="fro", itr=1))
    # FRO f32 under DEFAULT matmul precision: fused wins since round 4
    # (kernel dots use the same bf16 operands XLA's lowering would)
    assert captured["use_fused"] is True

    nmf_mod.solve(A32, W, H, eps,
                  NMFConfig(k=3, norm="fro", itr=1,
                            matmul_precision="highest"))
    # user-requested true-f32 dots: the two-pass XLA path stays faster
    assert captured["use_fused"] is False

    nmf_mod.solve(A32, W, H, eps, NMFConfig(k=3, norm="kl", itr=1))
    assert captured["use_fused"] is False         # KL: fused is opt-in
    assert captured["chunk"] == 0                 # small block: direct

    A_big = jnp.ones((8192, 38400), jnp.float32)
    Wb = jnp.ones((8192, 3), jnp.float32)
    Hb = jnp.ones((3, 38400), jnp.float32)
    nmf_mod.solve(A_big, Wb, Hb, eps, NMFConfig(k=3, norm="kl", itr=1))
    assert captured["chunk"] > 0                  # large block: auto-chunk
    assert captured["err_chunk"] > 0
