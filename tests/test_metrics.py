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
