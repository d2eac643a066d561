"""GBLUP: REML variance components + BLUP (BASELINE config 2)."""

import numpy as np
import pytest

import genomicbreedingmodels_tpu as gbm


@pytest.fixture(scope="module")
def h2_half():
    genomes = gbm.simulate_genomes(n=150, l=600, seed=21)
    pv = np.zeros((9, 1))
    pv[0, 0] = 0.5
    trials, effects = gbm.simulate_trials(
        genomes, f_add_dom_epi=np.array([[0.5, 0.0, 0.0]]),
        proportion_of_variance=pv, n_qtl=200, seed=21,
    )
    phenomes = gbm.extract_phenomes(trials)
    return genomes, phenomes, effects


def test_gblup_fit_and_h2(h2_half):
    genomes, phenomes, effects = h2_half
    fit = gbm.gblup(genomes=genomes, phenomes=phenomes)
    assert fit.model == "gblup"
    assert fit.metrics["cor"] > 0.5
    # h² simulated at 0.5; REML estimate should be in a sane band
    assert 0.2 < fit.extras["h2"] < 0.85
    assert fit.extras["sigma2_u"] > 0
    assert fit.extras["sigma2_e"] > 0
    # GEBVs correlate with true genetic values
    gebv = fit.y_pred
    r = np.corrcoef(effects[0].genetic_values, gebv)[0, 1]
    assert r > 0.6


def test_gblup_holdout_prediction():
    """Sparse architecture (15 QTL, h²=0.7): holdout GEBVs must carry signal.

    (With hundreds of QTL and ~100 unrelated training entries, holdout
    accuracy is theoretically near zero for ANY model — so the easy
    architecture is the correct test of the solver, not a concession.)"""
    genomes = gbm.simulate_genomes(n=150, l=600, seed=33)
    pv = np.zeros((9, 1))
    pv[0, 0] = 0.7
    trials, effects = gbm.simulate_trials(
        genomes, f_add_dom_epi=np.array([[0.7, 0.0, 0.0]]),
        proportion_of_variance=pv, n_qtl=15, seed=33,
    )
    phenomes = gbm.extract_phenomes(trials)
    fit = gbm.gblup(genomes=genomes, phenomes=phenomes, idx_entries=list(range(120)))
    y_hat = gbm.predict(fit, genomes, idx_entries=list(range(120, 150)))
    r = np.corrcoef(effects[0].genetic_values[120:], y_hat)[0, 1]
    assert r > 0.3


def test_gblup_in_cv_harness(h2_half):
    genomes, phenomes, _ = h2_half
    cvs, notes = gbm.cvbulk(genomes=genomes, phenomes=phenomes, models=["gblup"],
                            n_replications=1, n_folds=2, seed=3)
    assert len(cvs) == 2
    assert all(cv.fit.model == "gblup" for cv in cvs)


def test_reml_variance_components_additive_share(h2_half):
    genomes, phenomes, _ = h2_half
    K = gbm.grm_simple(genomes).genomic_relationship_matrix
    y = phenomes.phenotypes[:, 0]
    s2e, s2u = gbm.reml_variance_components(y, K)
    kd = float(np.mean(np.diag(K)))
    h2 = s2u * kd / (s2u * kd + s2e)
    assert 0.15 < h2 < 0.9


def test_gblup_marker_effects_match_rrblup_equivalence(h2_half):
    """GEBV from kinship solve == Z @ b_hat (up to float noise)."""
    genomes, phenomes, _ = h2_half
    fit = gbm.gblup(genomes=genomes, phenomes=phenomes)
    X = genomes.allele_frequencies
    yc = phenomes.phenotypes[:, 0] - phenomes.phenotypes[:, 0].mean()
    K = gbm.grm_simple(genomes).genomic_relationship_matrix.astype(np.float64)
    s2e, s2u = fit.extras["sigma2_e"], fit.extras["sigma2_u"]
    gebv_kinship = s2u * K @ np.linalg.solve(s2u * K + s2e * np.eye(len(yc)), yc)
    gebv_markers = fit.y_pred - fit.y_pred.mean()
    assert np.corrcoef(gebv_kinship, gebv_markers)[0, 1] > 0.999


def test_gblup_multitrait_matches_single_trait():
    """One GRM + one eigh shared across traits must reproduce per-trait fits
    exactly; traits with missing records fall back to the per-trait path."""
    import genomicbreedingmodels_tpu as gbm

    genomes = gbm.simulate_genomes(n=100, l=600, seed=1)
    trials, _ = gbm.simulate_trials(
        genomes,
        f_add_dom_epi=np.array([[0.5, 0.05, 0.05], [0.3, 0.0, 0.0], [0.6, 0.1, 0.1]]),
        seed=1,
    )
    ph = gbm.extract_phenomes(trials)
    ph.phenotypes[5:9, 2] = np.nan  # exercise the incomplete-trait path
    fits = gbm.gblup_multitrait(genomes, ph)
    assert [f.trait for f in fits] == [str(t) for t in ph.traits]
    for idx, fit in enumerate(fits):
        single = gbm.gblup(genomes, ph, idx_trait=idx)
        assert abs(fit.metrics["cor"] - single.metrics["cor"]) < 1e-3
        assert abs(fit.extras["h2"] - single.extras["h2"]) < 1e-3
    import pytest

    with pytest.raises(ValueError):
        gbm.gblup_multitrait(genomes, ph, GRM_type="nope")
