"""NaN-panel guards: a sparse (missing-data) panel must error loudly or be
imputed explicitly — never silently poison a fit (VERDICT r1 weak #7)."""

import numpy as np
import pytest

import genomicbreedingmodels_tpu as gbm


@pytest.fixture(scope="module")
def sparse_data():
    dense = gbm.simulate_genomes(n=60, l=300, seed=11)
    trials, _ = gbm.simulate_trials(
        dense, f_add_dom_epi=np.array([[0.4, 0.05, 0.05]]), seed=11
    )
    phenomes = gbm.extract_phenomes(trials)
    # Inject missingness the way simulate_genomes(sparsity=0.1) does, but
    # keep the phenotypes clean so only the PANEL guard fires.
    sparse = gbm.simulate_genomes(n=60, l=300, sparsity=0.1, seed=11)
    assert np.isnan(sparse.allele_frequencies).any()
    return sparse, phenomes


def test_extractxyetc_rejects_nan_panel(sparse_data):
    genomes, phenomes = sparse_data
    with pytest.raises(ValueError, match="missing/non-finite"):
        gbm.extractxyetc(genomes, phenomes)


def test_model_fit_rejects_nan_panel(sparse_data):
    genomes, phenomes = sparse_data
    with pytest.raises(ValueError, match="missing/non-finite"):
        gbm.ridge(genomes=genomes, phenomes=phenomes)


def test_extractxyetc_mean_impute(sparse_data):
    genomes, phenomes = sparse_data
    X, y, *_ = gbm.extractxyetc(genomes, phenomes, impute_missing="mean")
    assert np.all(np.isfinite(X))
    assert np.all(np.isfinite(y))


def test_grm_rejects_nan_panel(sparse_data):
    genomes, _ = sparse_data
    with pytest.raises(ValueError, match="missing/non-finite"):
        gbm.grm_simple(genomes)


def test_mean_impute_roundtrip(sparse_data):
    genomes, _ = sparse_data
    G = gbm.mean_impute(genomes.allele_frequencies)
    assert np.all(np.isfinite(G))
    # observed values untouched
    obs = np.isfinite(genomes.allele_frequencies)
    assert np.array_equal(G[obs], genomes.allele_frequencies[obs])
    # imputed panel flows through the GRM
    g2 = gbm.Genomes(
        entries=genomes.entries,
        populations=genomes.populations,
        loci_alleles=genomes.loci_alleles,
        allele_frequencies=G,
    )
    K = gbm.grm_simple(g2).genomic_relationship_matrix
    assert np.all(np.isfinite(K))


def test_all_missing_column_gets_midpoint():
    G = np.array([[0.1, np.nan], [0.3, np.nan]])
    out = gbm.mean_impute(G)
    assert np.allclose(out[:, 1], 0.5)
