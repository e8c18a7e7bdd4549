"""Mid-solve checkpointing: chunked trajectory identical to a single solve;
an interrupted fit resumes from the last persisted chunk (the reference has
no recovery below whole-k granularity)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pydnmfk_tpu.config import NMFConfig
from pydnmfk_tpu.models import nmf as nmf_mod
from pydnmfk_tpu.models.nmf import NMF


def _data():
    rng = np.random.default_rng(0)
    return (rng.random((48, 5)) @ rng.random((5, 36))).astype(np.float32)


def test_chunked_equals_single(tmp_path):
    A = _data()
    cfg = NMFConfig(k=5, norm="fro", method="mu", itr=120, init="rand",
                    results_path=str(tmp_path / "a"))
    W1, H1, e1 = NMF(cfg).fit(A)
    cfg2 = cfg.replace(solve_checkpoint_every=40,
                       results_path=str(tmp_path / "b"))
    W2, H2, e2 = NMF(cfg2).fit(A)
    np.testing.assert_allclose(np.asarray(W2), np.asarray(W1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(H2), np.asarray(H1), rtol=1e-6)
    assert float(e1) == float(e2)
    # checkpoint file cleaned up after a completed fit
    assert not os.path.exists(tmp_path / "b" / "solve_ckpt_k5.npz")


def test_resume_after_crash(tmp_path, monkeypatch):
    A = _data()
    cfg = NMFConfig(k=5, norm="fro", method="mu", itr=120, init="rand",
                    solve_checkpoint_every=40,
                    results_path=str(tmp_path))
    golden_W, _, golden_e = NMF(cfg.replace(
        results_path=str(tmp_path / "g"))).fit(A)

    calls = []
    real = nmf_mod.solve

    def crashing(*a, **kw):
        if not kw.get("finalize", True):
            calls.append(1)
            if len(calls) > 2:
                raise RuntimeError("simulated preemption")
        return real(*a, **kw)

    monkeypatch.setattr(nmf_mod, "solve", crashing)
    with pytest.raises(RuntimeError):
        NMF(cfg).fit(A)
    assert os.path.exists(tmp_path / "solve_ckpt_k5.npz")
    monkeypatch.setattr(nmf_mod, "solve", real)

    calls2 = []

    def counting(*a, **kw):
        if not kw.get("finalize", True):
            calls2.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(nmf_mod, "solve", counting)
    W, H, e = NMF(cfg).fit(A)
    # 120/40 = 3 chunks total; 2 done before the crash -> only 1 recomputed
    assert len(calls2) == 1
    np.testing.assert_allclose(np.asarray(W), np.asarray(golden_W),
                               rtol=1e-6)
    assert float(e) == float(golden_e)


def test_checkpoint_rejects_incompatible(tmp_path):
    A = _data()
    with pytest.raises(ValueError, match="tol"):
        NMF(NMFConfig(k=3, norm="fro", itr=50, tol=1e-4,
                      solve_checkpoint_every=10,
                      results_path=str(tmp_path))).fit(A)
    with pytest.raises(ValueError, match="BCD"):
        NMF(NMFConfig(k=3, norm="fro", method="bcd", itr=50,
                      solve_checkpoint_every=10,
                      results_path=str(tmp_path))).fit(A)


def test_sharded_orbax_checkpoint_resume(tmp_path, monkeypatch):
    """Mesh-sharded factors checkpoint via orbax/tensorstore (no host
    gather) and resume bit-identically after a simulated preemption."""
    A = _data()
    cfg = NMFConfig(k=5, norm="fro", method="mu", itr=120, init="rand",
                    grid=(2, 2), solve_checkpoint_every=40,
                    results_path=str(tmp_path))
    golden_W, _, golden_e = NMF(cfg.replace(
        results_path=str(tmp_path / "g"))).fit(A)

    calls = []
    real = nmf_mod.solve

    def crashing(*a, **kw):
        if not kw.get("finalize", True):
            calls.append(1)
            if len(calls) > 2:
                raise RuntimeError("simulated preemption")
        return real(*a, **kw)

    monkeypatch.setattr(nmf_mod, "solve", crashing)
    with pytest.raises(RuntimeError):
        NMF(cfg).fit(A)
    assert os.path.exists(tmp_path / "solve_ckpt_k5.orbax.tag")
    monkeypatch.setattr(nmf_mod, "solve", real)

    calls2 = []

    def counting(*a, **kw):
        if not kw.get("finalize", True):
            calls2.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(nmf_mod, "solve", counting)
    W, H, e = NMF(cfg).fit(A)
    assert len(calls2) == 1          # 2 of 3 chunks replayed from disk
    np.testing.assert_allclose(np.asarray(W), np.asarray(golden_W),
                               rtol=1e-6)
    assert float(e) == float(golden_e)
    # cleaned up after the completed fit (both A/B slots + tag)
    assert not os.path.isdir(tmp_path / "solve_ckpt_k5.orbax.a")
    assert not os.path.isdir(tmp_path / "solve_ckpt_k5.orbax.b")
    assert not os.path.exists(tmp_path / "solve_ckpt_k5.orbax.tag")


def test_orbax_torn_save_keeps_previous_checkpoint(tmp_path):
    """A preemption in the MIDDLE of an orbax save must not lose the last
    good checkpoint: saves alternate A/B dirs and the tag file repoints
    only after a complete write (ADVICE r2: the in-place force=True
    overwrite left a torn dir behind a still-valid tag)."""
    import jax
    from pydnmfk_tpu.parallel.mesh import grid_context
    from pydnmfk_tpu.utils.checkpoint import _OrbaxSolveCheckpoint

    ctx = grid_context(2, 2)
    W = jax.device_put(np.ones((8, 4), np.float32), ctx.sharding_W)
    H = jax.device_put(np.ones((4, 8), np.float32), ctx.sharding_H)

    ck = _OrbaxSolveCheckpoint(str(tmp_path), 4, "tag1")
    ck.save(W * 1, H * 1, 40)
    # crash mid-second-save: the target slot dir is half-written garbage,
    # but the tag still points at the completed first save
    live = ck._live_slot()
    other = ".b" if live == ".a" else ".a"
    os.makedirs(ck.base + other, exist_ok=True)
    with open(os.path.join(ck.base + other, "garbage"), "w") as f:
        f.write("torn")

    ck2 = _OrbaxSolveCheckpoint(str(tmp_path), 4, "tag1")
    W0 = jax.device_put(np.zeros((8, 4), np.float32), ctx.sharding_W)
    H0 = jax.device_put(np.zeros((4, 8), np.float32), ctx.sharding_H)
    Wr, Hr, i = ck2.load(W0, H0)
    assert i == 40
    np.testing.assert_array_equal(np.asarray(Wr), np.asarray(W))

    # and the next save still lands cleanly (overwrites the torn slot)
    ck2.save(W * 2, H * 2, 80)
    _, _, i2 = ck2.load(W0, H0)
    assert i2 == 80
    ck2.cleanup()


def test_sharded_checkpoint_stale_tag_restarts(tmp_path):
    """A checkpoint written under a different config is ignored."""
    A = _data()
    cfg = NMFConfig(k=5, norm="fro", method="mu", itr=80, init="rand",
                    grid=(2, 2), solve_checkpoint_every=40,
                    results_path=str(tmp_path))
    golden_W, _, golden_e = NMF(cfg.replace(
        results_path=str(tmp_path / "g"))).fit(A)
    # leave a checkpoint from a DIFFERENT itr budget behind
    NMF(cfg.replace(itr=40)).fit(A)   # completes, cleans up
    tagfile = tmp_path / "solve_ckpt_k5.orbax.tag"
    assert not tagfile.exists()
    W, H, e = NMF(cfg).fit(A)
    np.testing.assert_allclose(np.asarray(W), np.asarray(golden_W),
                               rtol=1e-6)
