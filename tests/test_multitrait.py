"""Multi-trait GBLUP with genetic covariance + multi-env GBLUP (VERDICT r1
item 4): borrowing strength across correlated traits must beat independent
single-trait GBLUP; env variance must be recovered from trial records."""

import numpy as np
import pytest

import genomicbreedingmodels_tpu as gbm


@pytest.fixture(scope="module")
def correlated_traits():
    """Two traits sharing one genetic signal: trait_1 h²≈0.6, trait_2 the
    SAME genetic values but h²≈0.15 (noisy) — genetic correlation 1.0."""
    genomes = gbm.simulate_genomes(n=150, l=800, seed=21)
    trials, effects = gbm.simulate_trials(
        genomes, f_add_dom_epi=np.array([[0.6, 0.0, 0.0]]), seed=21
    )
    g = effects[0].genetic_values  # standardized genetic signal
    rng = np.random.default_rng(77)
    y1 = np.sqrt(0.6) * g + np.sqrt(0.4) * rng.normal(size=len(g))
    y2 = np.sqrt(0.15) * g + np.sqrt(0.85) * rng.normal(size=len(g))
    phenomes = gbm.Phenomes(
        entries=genomes.entries,
        populations=genomes.populations,
        traits=np.asarray(["trait_1", "trait_2"], dtype=object),
        phenotypes=np.stack([y1, y2], axis=1),
    )
    return genomes, phenomes, g


def test_em_recovers_genetic_correlation(correlated_traits):
    genomes, phenomes, _ = correlated_traits
    fits = gbm.gblup_multitrait_cov(genomes, phenomes)
    assert len(fits) == 2
    gcor = fits[0].extras["genetic_correlations"]
    # the two traits share identical genetic values: r_g should be high
    assert gcor[0, 1] > 0.6
    # h2 ordering matches the simulation (trait_1 heritable, trait_2 noisy)
    assert fits[0].extras["h2"] > fits[1].extras["h2"]


def test_multitrait_beats_single_trait_on_noisy_trait(correlated_traits):
    """The VERDICT 'done' criterion: higher holdout accuracy than independent
    single-trait GBLUP for the low-h² trait."""
    genomes, phenomes, g = correlated_traits
    idx_tr = np.arange(110)
    idx_va = np.arange(110, 150)
    fits_mt = gbm.gblup_multitrait_cov(genomes, phenomes, idx_entries=idx_tr)
    fit_st = gbm.gblup(genomes=genomes, phenomes=phenomes, idx_entries=idx_tr, idx_trait=1)
    pred_mt = gbm.predict(fits_mt[1], genomes, idx_entries=idx_va)
    pred_st = gbm.predict(fit_st, genomes, idx_entries=idx_va)
    y_va = phenomes.phenotypes[idx_va, 1]
    cor_mt = np.corrcoef(pred_mt, y_va)[0, 1]
    cor_st = np.corrcoef(pred_st, y_va)[0, 1]
    # also against the latent genetic truth (less noisy comparison)
    g_va = g[idx_va]
    gcor_mt = np.corrcoef(pred_mt, g_va)[0, 1]
    gcor_st = np.corrcoef(pred_st, g_va)[0, 1]
    assert gcor_mt > gcor_st, (gcor_mt, gcor_st)
    assert cor_mt > cor_st - 0.02, (cor_mt, cor_st)


def test_multitrait_fit_is_cv_compatible(correlated_traits):
    genomes, phenomes, _ = correlated_traits
    fits = gbm.gblup_multitrait_cov(genomes, phenomes, idx_entries=np.arange(100))
    cv = gbm.validate(fits[0], genomes, phenomes, idx_validation=np.arange(100, 150))
    assert np.isfinite(cv.metrics["cor"])


def test_multitrait_complete_case_policy_requires_complete_rows(correlated_traits):
    genomes, phenomes, _ = correlated_traits
    pheno = phenomes.phenotypes.copy()
    pheno[:149, 1] = np.nan  # < 2 complete rows
    p2 = gbm.Phenomes(
        entries=phenomes.entries, populations=phenomes.populations,
        traits=phenomes.traits, phenotypes=pheno,
    )
    with pytest.raises(ValueError, match="complete multi-trait"):
        gbm.gblup_multitrait_cov(genomes, p2, missing_policy="complete-case")
    with pytest.raises(ValueError, match="missing_policy"):
        gbm.gblup_multitrait_cov(genomes, p2, missing_policy="bogus")


def test_multitrait_em_handles_missing_records(correlated_traits):
    """VERDICT r2 item 5 'done' criterion: with 30% of trait_2 missing, the
    EM multi-trait GEBV for trait_2 beats BOTH complete-case multi-trait AND
    single-trait GBLUP (fit on trait_2's observed rows), evaluated against
    the latent genetic values on the MASKED entries."""
    genomes, phenomes, g = correlated_traits
    rng = np.random.default_rng(3)
    n = len(genomes.entries)
    masked = np.sort(rng.choice(n, size=int(0.3 * n), replace=False))
    observed = np.setdiff1d(np.arange(n), masked)
    pheno = phenomes.phenotypes.copy()
    pheno[masked, 1] = np.nan
    p2 = gbm.Phenomes(
        entries=phenomes.entries, populations=phenomes.populations,
        traits=phenomes.traits, phenotypes=pheno,
    )
    fits_em = gbm.gblup_multitrait_cov(genomes, p2)  # default: EM
    fits_cc = gbm.gblup_multitrait_cov(genomes, p2, missing_policy="complete-case")
    fit_st = gbm.gblup(genomes=genomes, phenomes=p2, idx_entries=observed, idx_trait=1)
    pred_em = gbm.predict(fits_em[1], genomes, idx_entries=masked)
    pred_cc = gbm.predict(fits_cc[1], genomes, idx_entries=masked)
    pred_st = gbm.predict(fit_st, genomes, idx_entries=masked)
    g_m = g[masked]
    cor_em = np.corrcoef(pred_em, g_m)[0, 1]
    cor_cc = np.corrcoef(pred_cc, g_m)[0, 1]
    cor_st = np.corrcoef(pred_st, g_m)[0, 1]
    assert cor_em > cor_cc, (cor_em, cor_cc)
    assert cor_em > cor_st, (cor_em, cor_st)
    # EM's trait_2 Fit reports metrics on the observed entries only
    assert len(fits_em[1].y_true) == len(observed)
    assert np.all(np.isfinite(fits_em[1].y_true))


def test_multitrait_em_matches_complete_case_when_no_missing(correlated_traits):
    """With a fully observed panel the EM policy must reduce to the
    complete-case path exactly (same branch)."""
    genomes, phenomes, _ = correlated_traits
    fits_a = gbm.gblup_multitrait_cov(genomes, phenomes, missing_policy="em")
    fits_b = gbm.gblup_multitrait_cov(genomes, phenomes, missing_policy="complete-case")
    np.testing.assert_allclose(fits_a[0].b_hat, fits_b[0].b_hat)
    np.testing.assert_allclose(fits_a[1].b_hat, fits_b[1].b_hat)


def test_multienv_recovers_env_variance():
    genomes = gbm.simulate_genomes(n=100, l=500, seed=5)
    pv = np.array([[0.5], [0.2], [0.0], [0.1], [0.0], [0.0], [0.0], [0.0]])
    trials, effects = gbm.simulate_trials(
        genomes, n_years=3, n_sites=2, n_replications=2,
        f_add_dom_epi=np.array([[0.5, 0.0, 0.0]]),
        proportion_of_variance=pv, seed=5,
    )
    fit = gbm.gblup_multienv(genomes, trials)
    assert fit.extras["n_environments"] == 6
    # env variance (years 0.2 + sites 0.1 of total ~1) must be detected
    assert fit.extras["sigma2_env"] > 0.05
    # GEBVs track the latent genetic values
    g = effects[0].genetic_values
    cor = np.corrcoef(fit.y_pred, g)[0, 1]
    assert cor > 0.5, cor


def test_multienv_beats_naive_mean_collapse():
    """Correcting env effects before the entry solve should not hurt (and
    usually helps) GEBV accuracy vs phenome-mean GBLUP."""
    genomes = gbm.simulate_genomes(n=100, l=500, seed=6)
    pv = np.array([[0.4], [0.3], [0.0], [0.1], [0.0], [0.0], [0.0], [0.0]])
    trials, effects = gbm.simulate_trials(
        genomes, n_years=4, n_sites=2,
        f_add_dom_epi=np.array([[0.4, 0.0, 0.0]]),
        proportion_of_variance=pv, seed=6,
    )
    fit_me = gbm.gblup_multienv(genomes, trials)
    phenomes = gbm.extract_phenomes(trials)
    fit_mean = gbm.gblup(genomes=genomes, phenomes=phenomes, idx_trait=0)
    g = effects[0].genetic_values
    cor_me = np.corrcoef(fit_me.y_pred, g)[0, 1]
    cor_mean = np.corrcoef(fit_mean.y_pred, g)[0, 1]
    assert cor_me > cor_mean - 0.03, (cor_me, cor_mean)
