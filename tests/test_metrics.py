"""Metrics parity with reference src/metrics.jl semantics."""

import numpy as np

from genomicbreedingmodels_tpu import metrics


def test_metric_values_match_closed_form():
    rng = np.random.default_rng(0)
    y = rng.normal(size=200)
    yhat = y + rng.normal(scale=0.5, size=200)
    m = metrics(y, yhat)
    d = y - yhat
    assert np.isclose(m["cor"], np.corrcoef(y, yhat)[0, 1], atol=1e-5)
    assert np.isclose(m["mad"], np.mean(np.abs(d)), atol=1e-5)
    assert np.isclose(m["msd"], np.mean(d**2), atol=1e-5)
    assert np.isclose(m["rmsd"], np.sqrt(np.mean(d**2)), atol=1e-5)
    assert np.isclose(m["nrmsd"], np.sqrt(np.mean(d**2)) / (y.max() - y.min()), atol=1e-5)
    assert np.isclose(m["euc"], np.linalg.norm(d), atol=1e-4)
    jac = 1.0 - np.minimum(y, yhat).sum() / np.maximum(y, yhat).sum()
    assert np.isclose(m["jac"], jac, atol=1e-5)
    assert np.isclose(m["tvar"], 0.5 * np.abs(d).sum(), atol=1e-4)
    va, ve = np.var(yhat, ddof=1), np.var(d, ddof=1)
    assert np.isclose(m["h²"], np.clip(va / (va + ve), 0, 1), atol=1e-5)
    assert np.isclose(m["r²"], 1 - ve / np.var(y, ddof=1), atol=1e-5)
    assert m["h2"] == m["h²"] and m["r2"] == m["r²"]


def test_metrics_f64_precision():
    """Host metrics run in f64: exact agreement with numpy's f64 formulas
    (reference CV invariant needs 1e-10, unreachable in f32)."""
    rng = np.random.default_rng(3)
    y = rng.normal(size=500)
    yhat = y + rng.normal(scale=1e-3, size=500)
    m = metrics(y, yhat)
    assert abs(m["cor"] - np.corrcoef(y, yhat)[0, 1]) < 1e-12
    assert abs(m["msd"] - np.mean((y - yhat) ** 2)) < 1e-15


def test_cv_self_consistency_1e10(sim_small):
    """Reference src/cross_validation.jl:259-264: the across-entry cor of each
    CV job equals the cor recomputed from the per-entry table to 1e-10."""
    import genomicbreedingmodels_tpu as gbm

    genomes, phenomes, _ = sim_small
    cvs, _ = gbm.cvbulk(genomes, phenomes, models=("ridge",), n_replications=1, n_folds=3)
    df_across, df_per = gbm.tabularise(cvs)
    assert len(df_across) > 0
    for _, row in df_across.iterrows():
        sub = df_per[
            (df_per.replication == row.replication)
            & (df_per.fold == row.fold)
            & (df_per.trait == row.trait)
            & (df_per.model == row.model)
        ]
        c = np.corrcoef(sub.y_true.to_numpy(), sub.y_pred.to_numpy())[0, 1]
        assert abs(c - row.cor) < 1e-10


def test_zero_variance_guards():
    y = np.ones(10)
    yhat = np.arange(10.0)
    m = metrics(y, yhat)
    assert m["cor"] == 0.0
    assert m["h²"] == 0.0
    assert m["r²"] == 0.0


def test_perfect_prediction():
    y = np.arange(20.0)
    m = metrics(y, y)
    assert np.isclose(m["cor"], 1.0, atol=1e-6)
    assert np.isclose(m["rmsd"], 0.0, atol=1e-6)
    assert np.isclose(m["h²"], 1.0, atol=1e-6)
