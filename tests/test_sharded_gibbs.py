"""Marker-sharded Bayesian-alphabet Gibbs on the 8-device virtual mesh.

Each device owns a marker shard; residual deltas psum over the mesh axis —
the multi-chip communication pattern from BASELINE's north star. Concurrent
(block-Jacobi) rounds for A/B/C/BRR; exact sequential device turns for BL.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    n, p = 130, 320
    X = rng.random((n, p)).astype(np.float32)
    b_true = np.zeros(p)
    b_true[[5, 120, 300]] = [1.5, -1.0, 1.2]
    y = X @ b_true + 0.3 * rng.normal(size=n)
    return X, y


@pytest.fixture(scope="module")
def mesh():
    from genomicbreedingmodels_tpu.parallel.mesh import make_mesh

    return make_mesh(shape=(1, 8), axis_names=("dp", "mp"))


@pytest.mark.parametrize("model", ["BayesA", "BayesC", "BL"])
def test_sharded_matches_single_chip_heldout(problem, mesh, model):
    from genomicbreedingmodels_tpu.models.bayesian import gibbs_regression
    from genomicbreedingmodels_tpu.parallel.sharded import sharded_gibbs_regression

    X, y = problem
    tr, va = np.arange(100), np.arange(100, 130)
    mu8, b8 = sharded_gibbs_regression(
        X[tr], y[tr], mesh, axis="mp", model=model, n_iter=400, n_burnin=150, seed=1
    )
    mu1, b1, _ = gibbs_regression(
        X[tr], y[tr], model=model, n_iter=400, n_burnin=150, seed=1
    )
    assert b8.shape == (320,)
    c8 = np.corrcoef(mu8 + X[va] @ b8, y[va])[0, 1]
    c1 = np.corrcoef(mu1 + X[va] @ b1, y[va])[0, 1]
    # Sharded chain must track the single-chip chain's predictive accuracy.
    assert c8 > 0.8 * c1 - 0.05, (model, c8, c1)


def test_sharded_effect_estimates_track_single_chip(problem, mesh):
    from genomicbreedingmodels_tpu.models.bayesian import gibbs_regression
    from genomicbreedingmodels_tpu.parallel.sharded import sharded_gibbs_regression

    X, y = problem
    mu8, b8 = sharded_gibbs_regression(
        X, y, mesh, axis="mp", model="BayesC", n_iter=400, n_burnin=150, seed=1
    )
    mu1, b1, _ = gibbs_regression(X, y, model="BayesC", n_iter=400, n_burnin=150, seed=1)
    assert np.corrcoef(b8, b1)[0, 1] > 0.9


def test_sharded_unknown_model(problem, mesh):
    from genomicbreedingmodels_tpu.parallel.sharded import sharded_gibbs_regression

    X, y = problem
    with pytest.raises(ValueError):
        sharded_gibbs_regression(X, y, mesh, model="nope")
    with pytest.raises(ValueError):
        sharded_gibbs_regression(X, y, mesh, model="BayesC", device_schedule="bogus")


def test_sharded_checkpoint_crash_resume(problem, mesh, tmp_path):
    """A chain killed mid-run resumes from its last segment snapshot and
    produces the bit-identical posterior means (VERDICT r2 item 7)."""
    from genomicbreedingmodels_tpu.parallel.sharded import sharded_gibbs_regression
    from genomicbreedingmodels_tpu.utils.checkpoint import load_state

    X, y = problem
    ckpt = str(tmp_path / "chain.npz")
    mu_ref, b_ref = sharded_gibbs_regression(
        X, y, mesh, axis="mp", model="BayesC", n_iter=200, n_burnin=80, seed=4,
        chunk_size=50,
    )
    # First attempt "crashes" after 100 of 200 sweeps (run only 100, but save
    # snapshots under the real run's parameters so the resume continues it).
    sharded_gibbs_regression(
        X, y, mesh, axis="mp", model="BayesC", n_iter=100, n_burnin=80, seed=4,
        chunk_size=50, checkpoint_path=ckpt,
    )
    snap = load_state(ckpt)
    assert snap is not None and int(snap["__done__"]) == 100
    # Resume picks up at sweep 100 and finishes the 200-sweep chain.
    mu2, b2 = sharded_gibbs_regression(
        X, y, mesh, axis="mp", model="BayesC", n_iter=200, n_burnin=80, seed=4,
        chunk_size=50, checkpoint_path=ckpt,
    )
    assert abs(mu_ref - mu2) < 1e-5
    np.testing.assert_allclose(b_ref, b2, atol=1e-5)
    # Resuming an already-complete run recovers the means from the snapshot.
    mu3, b3 = sharded_gibbs_regression(
        X, y, mesh, axis="mp", model="BayesC", n_iter=200, n_burnin=80, seed=4,
        chunk_size=50, checkpoint_path=ckpt,
    )
    assert abs(mu_ref - mu3) < 1e-4
    np.testing.assert_allclose(b_ref, b3, atol=1e-4)


def test_sharded_chunked_equals_single_call(problem, mesh):
    from genomicbreedingmodels_tpu.parallel.sharded import sharded_gibbs_regression

    X, y = problem
    mu1, b1 = sharded_gibbs_regression(
        X, y, mesh, axis="mp", model="BayesC", n_iter=200, n_burnin=80, seed=4
    )
    mu2, b2 = sharded_gibbs_regression(
        X, y, mesh, axis="mp", model="BayesC", n_iter=200, n_burnin=80, seed=4,
        chunk_size=60,
    )
    assert abs(mu1 - mu2) < 1e-5
    np.testing.assert_allclose(b1, b2, atol=1e-5)
