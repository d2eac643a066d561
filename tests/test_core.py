"""Core data layer: structs, simulator, GRM."""

import numpy as np
import pytest

import genomicbreedingmodels_tpu as gbm


def test_simulate_genomes_shapes():
    g = gbm.simulate_genomes(n=50, l=200, n_alleles=3, n_populations=2, seed=1)
    assert g.n == 50
    assert g.p == 400  # l * (n_alleles - 1)
    assert g.checkdims()
    assert np.all((g.allele_frequencies >= 0) & (g.allele_frequencies <= 1))
    assert len(np.unique(g.populations)) == 2
    # locus names are unique and tab-structured: chrom, pos, alleles, allele
    parts = str(g.loci_alleles[0]).split("\t")
    assert len(parts) == 4


def test_simulate_trials_and_extract_phenomes(sim_small):
    genomes, phenomes, effects = sim_small
    assert phenomes.checkdims()
    assert np.array_equal(phenomes.entries, genomes.entries)
    assert phenomes.traits[0] == "trait_1"
    # genetic signal present: phenotype correlates with true genetic values
    g = effects[0].genetic_values
    y = phenomes.phenotypes[:, 0]
    r = np.corrcoef(g, y)[0, 1]
    assert r > 0.4


def test_trials_replication_averaging():
    genomes = gbm.simulate_genomes(n=20, l=50, seed=3)
    trials, _ = gbm.simulate_trials(genomes, n_years=2, n_replications=3, seed=3)
    assert trials.phenotypes.shape[0] == 20 * 2 * 3
    ph = gbm.extract_phenomes(trials)
    assert ph.n == 20
    # manual average for entry 0
    rows = trials.entries == genomes.entries[0]
    assert np.allclose(ph.phenotypes[0], trials.phenotypes[rows].mean(axis=0))


def test_slice_and_clone(sim_small):
    genomes, phenomes, _ = sim_small
    sub = genomes.slice(idx_entries=np.arange(10), idx_loci_alleles=np.arange(20))
    assert sub.n == 10 and sub.p == 20
    assert sub.checkdims()
    c = gbm.clone(genomes)
    assert c == genomes
    c.allele_frequencies[0, 0] += 0.5
    assert not (c == genomes)


def test_checkdims_catches_corruption(sim_small):
    genomes, _, _ = sim_small
    bad = gbm.clone(genomes)
    bad.entries = bad.entries[:-1]
    assert not bad.checkdims()


def test_grm_simple_and_ploidy_aware(sim_small):
    genomes, _, _ = sim_small
    grm1 = gbm.grm_simple(genomes)
    K1 = grm1.genomic_relationship_matrix
    assert K1.shape == (genomes.n, genomes.n)
    assert np.allclose(K1, K1.T, atol=1e-5)
    # PSD up to float32 noise
    evals = np.linalg.eigvalsh(K1.astype(np.float64))
    assert evals.min() > -1e-3 * max(1.0, evals.max())
    grm4 = gbm.grm_ploidy_aware(genomes, ploidy=4)
    K4 = grm4.genomic_relationship_matrix
    # ploidy-aware differs only by scalar denominator
    ratio = K4[0, 1] / K1[0, 1]
    assert np.allclose(K4, K1 * ratio, atol=1e-4)


def test_infer_ploidy():
    f = np.array([[0.25, 0.5], [0.75, 1.0]])
    assert gbm.infer_ploidy(f) == 4


def test_entry_and_locus_index_lookup(sim_small):
    genomes, _, _ = sim_small
    names = genomes.entries[[5, 2, 9]].tolist()
    assert gbm.Genomes.entry_indices(genomes, names).tolist() == [5, 2, 9]
    with pytest.raises(KeyError):
        genomes.entry_indices(["nope"])


def test_extractxyetc_nocopy_view_semantics():
    """copy=False returns a read-only-contract VIEW for full-panel
    selections (no intercept), an independent copy otherwise, and never
    imputes into the caller's panel."""
    import genomicbreedingmodels_tpu as gbm

    genomes = gbm.simulate_genomes(n=30, l=50, seed=8)
    trials, _ = gbm.simulate_trials(
        genomes, f_add_dom_epi=np.array([[0.5, 0.0, 0.0]]), seed=8
    )
    phen = gbm.extract_phenomes(trials)
    X_v, y, *_ = gbm.extractxyetc(genomes, phen, add_intercept=False, copy=False)
    assert np.shares_memory(X_v, genomes.allele_frequencies)
    X_c, y2, *_ = gbm.extractxyetc(genomes, phen, add_intercept=False)
    assert not np.shares_memory(X_c, genomes.allele_frequencies)
    np.testing.assert_array_equal(X_v, X_c)
    np.testing.assert_array_equal(y, y2)
    # subset selection always copies, even with copy=False
    X_s, *_ = gbm.extractxyetc(
        genomes, phen, idx_entries=list(range(10)), add_intercept=False, copy=False
    )
    assert not np.shares_memory(X_s, genomes.allele_frequencies)
    # imputation with copy=False must NOT write into the caller's panel
    genomes.allele_frequencies[3, 7] = np.nan
    X_i, *_ = gbm.extractxyetc(
        genomes, phen, add_intercept=False, copy=False, impute_missing="mean"
    )
    assert np.isnan(genomes.allele_frequencies[3, 7])  # untouched
    assert np.isfinite(X_i).all()
