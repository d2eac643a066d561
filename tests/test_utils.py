"""Aux subsystems: config, logging timers, checkpoint/resume."""

import os

import numpy as np
import pytest

import genomicbreedingmodels_tpu as gbm
from genomicbreedingmodels_tpu.utils.checkpoint import (
    CVCheckpoint,
    job_signature,
    load_state,
    save_state,
)
from genomicbreedingmodels_tpu.utils.config import GBMConfig
from genomicbreedingmodels_tpu.utils.logging import StageTimer


def test_config_env_override(monkeypatch):
    monkeypatch.setenv("GBM_MCMC_BLOCK_SIZE", "64")
    monkeypatch.setenv("GBM_LAMBDA_MIN_RATIO", "0.05")
    cfg = GBMConfig.from_env()
    assert cfg.mcmc_block_size == 64
    assert cfg.lambda_min_ratio == 0.05


def test_config_flows_into_lambda_path(monkeypatch):
    """GBMConfig defaults are actually READ by library code: an env override
    changes the ridge λ-path length."""
    from genomicbreedingmodels_tpu.ops.linalg import ridge_cv_path
    from genomicbreedingmodels_tpu.utils.config import reset_config

    rng = np.random.default_rng(0)
    X = rng.uniform(size=(40, 60))
    y = rng.normal(size=40)
    monkeypatch.setenv("GBM_N_LAMBDA", "17")
    reset_config()
    try:
        _, _, info = ridge_cv_path(X, y, n_folds=4)
        assert len(info["lambdas"]) == 17
    finally:
        monkeypatch.delenv("GBM_N_LAMBDA")
        reset_config()


def test_config_flows_into_mcmc(monkeypatch):
    """GBM_MCMC_N_ITER override shortens the sampler's trace."""
    from genomicbreedingmodels_tpu.utils.config import reset_config

    rng = np.random.default_rng(1)
    X = rng.uniform(size=(30, 20))
    y = rng.normal(size=30)
    monkeypatch.setenv("GBM_MCMC_N_ITER", "60")
    monkeypatch.setenv("GBM_MCMC_N_BURNIN", "20")
    reset_config()
    try:
        _, _, diag = gbm.gibbs_regression(X, y, model="BRR", seed=3)
        assert len(diag["sigma_e2_trace"]) == 60
    finally:
        monkeypatch.delenv("GBM_MCMC_N_ITER")
        monkeypatch.delenv("GBM_MCMC_N_BURNIN")
        reset_config()


def test_mcmc_diagnostics_well_posed_vs_short():
    """R̂ < 1.05 on a well-posed multi-chain run; a deliberately short
    unburned chain is flagged as unconverged."""
    rng = np.random.default_rng(5)
    n, p = 60, 30
    X = rng.uniform(size=(n, p))
    b = rng.normal(size=p)
    y = X @ b * 0.3 + rng.normal(size=n)
    _, _, diag = gbm.gibbs_regression(
        X, y, model="BRR", n_iter=600, n_burnin=200, n_chains=4, seed=7
    )
    assert diag["rhat_sigma_e2"] < 1.05
    assert diag["ess_sigma_e2"] >= 100
    assert diag["converged"]
    _, _, diag_short = gbm.gibbs_regression(
        X, y, model="BRR", n_iter=25, n_burnin=0, n_chains=4, seed=7
    )
    assert not diag_short["converged"]


def test_split_rhat_detects_disagreeing_chains():
    from genomicbreedingmodels_tpu.utils.diagnostics import ess, split_rhat

    rng = np.random.default_rng(2)
    good = rng.normal(size=(4, 400))
    assert split_rhat(good) < 1.02
    assert ess(good) > 400
    bad = good + np.arange(4)[:, None] * 3.0  # chains at different levels
    assert split_rhat(bad) > 1.5


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2
    assert s["a"]["total_s"] >= 0


def test_save_load_state(tmp_path):
    path = str(tmp_path / "state.npz")
    state = {"b": np.arange(5.0), "key": np.asarray([1, 2], dtype=np.uint32)}
    save_state(path, state)
    back = load_state(path)
    assert np.array_equal(back["b"], state["b"])
    assert load_state(str(tmp_path / "missing.npz")) is None


def test_cv_checkpoint_resume(tmp_path, sim_small):
    genomes, phenomes, _ = sim_small
    path = str(tmp_path / "cv.ckpt")
    jobs = [
        dict(model="ols", idx_trait=0, idx_training=np.arange(60),
             idx_validation=np.arange(60, 80), replication="r1", fold="f1"),
        dict(model="ols", idx_trait=0, idx_training=np.arange(40),
             idx_validation=np.arange(80, 100), replication="r1", fold="f2"),
    ]
    cvs1 = gbm.cvdispatch(jobs, genomes, phenomes, checkpoint_path=path)
    assert len(cvs1) == 2
    ck = CVCheckpoint(path)
    assert len(ck) == 2
    # resume: results come from the ledger (same values, no recompute)
    cvs2 = gbm.cvdispatch(jobs, genomes, phenomes, checkpoint_path=path)
    assert len(cvs2) == 2
    assert np.allclose(cvs1[0].y_pred, cvs2[0].y_pred)
    # signatures are order-stable and distinct
    assert job_signature(jobs[0]) != job_signature(jobs[1])


def test_devcache_fingerprint_and_single_slot():
    """utils/devcache: content fingerprints change on mutation/rebind; the
    single-slot cache returns hits only for the exact key."""
    import numpy as np
    from genomicbreedingmodels_tpu.utils.devcache import (
        SingleSlotCache, host_fingerprint,
    )

    a = np.arange(10_000, dtype=np.float64).reshape(100, 100)
    f1 = host_fingerprint(a)
    assert f1 == host_fingerprint(a)  # deterministic
    b = a.copy()
    assert host_fingerprint(b) == f1  # content-keyed, not identity-keyed
    b[0, 0] += 1.0
    assert host_fingerprint(b) != f1  # sampled element changed
    assert host_fingerprint(a.astype(np.float32)) != f1  # dtype in the key

    c = SingleSlotCache()
    assert c.get(("k1",)) is None
    c.put(("k1",), "v1")
    assert c.get(("k1",)) == "v1"
    c.put(("k2",), "v2")  # single slot: k1 evicted
    assert c.get(("k1",)) is None and c.get(("k2",)) == "v2"
    c.clear()
    assert c.get(("k2",)) is None


def test_gwas_prep_cache_same_results_and_trait_separation():
    """The _prep_device cache must return identical scan results on a repeat
    call and MISS when the trait changes (same panel, different y)."""
    import numpy as np
    import genomicbreedingmodels_tpu as gbm
    from genomicbreedingmodels_tpu.models import gwas as gwas_mod

    genomes = gbm.simulate_genomes(n=48, l=120, seed=3)
    ploidy = 2
    genomes.allele_frequencies = np.round(genomes.allele_frequencies * ploidy) / ploidy
    trials, _ = gbm.simulate_trials(
        genomes, f_add_dom_epi=np.array([[0.5, 0.0, 0.0], [0.3, 0.0, 0.0]]), seed=3
    )
    phen = gbm.extract_phenomes(trials)
    gwas_mod._PREP_CACHE.clear()
    calls = []
    orig = gwas_mod._prep_onchip

    def counting_prep(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    gwas_mod._prep_onchip = counting_prep
    try:
        f1 = gbm.gwasols(genomes=genomes, phenomes=phen, idx_trait=0)
        f2 = gbm.gwasols(genomes=genomes, phenomes=phen, idx_trait=0)
        assert len(calls) == 1  # second call HIT the cache (no device prep)
        np.testing.assert_array_equal(f1.b_hat, f2.b_hat)
        np.testing.assert_array_equal(f1.b_hat_labels, f2.b_hat_labels)
        f3 = gbm.gwasols(genomes=genomes, phenomes=phen, idx_trait=1)
        assert len(calls) == 2  # different trait y -> MISS
        assert not np.array_equal(f3.b_hat, f1.b_hat)
    finally:
        gwas_mod._prep_onchip = orig


def test_gwas_prep_cache_misses_on_renamed_entries():
    """Identical numeric panel with renamed entries must MISS the prep cache
    (the cached value carries entry/label metadata)."""
    import numpy as np
    import genomicbreedingmodels_tpu as gbm
    from genomicbreedingmodels_tpu.models import gwas as gwas_mod

    genomes = gbm.simulate_genomes(n=40, l=80, seed=5)
    genomes.allele_frequencies = np.round(genomes.allele_frequencies * 2) / 2
    trials, _ = gbm.simulate_trials(
        genomes, f_add_dom_epi=np.array([[0.5, 0.0, 0.0]]), seed=5
    )
    phen = gbm.extract_phenomes(trials)
    gwas_mod._PREP_CACHE.clear()
    f1 = gbm.gwasols(genomes=genomes, phenomes=phen)
    renamed = gbm.Genomes(
        entries=np.asarray([f"renamed_{e}" for e in genomes.entries], dtype=object),
        populations=genomes.populations,
        loci_alleles=genomes.loci_alleles,
        allele_frequencies=genomes.allele_frequencies,
    )
    phen2 = gbm.Phenomes(
        entries=renamed.entries, populations=phen.populations,
        traits=phen.traits, phenotypes=phen.phenotypes,
    )
    f2 = gbm.gwasols(genomes=renamed, phenomes=phen2)
    assert f2.entries[0].startswith("renamed_")  # fresh metadata, not stale
    np.testing.assert_allclose(f2.b_hat, f1.b_hat, rtol=1e-6)  # same numerics


def test_clear_device_caches_empties_all_slots():
    import numpy as np
    import genomicbreedingmodels_tpu as gbm
    from genomicbreedingmodels_tpu.models import gwas as gwas_mod
    from genomicbreedingmodels_tpu.utils.devcache import SingleSlotCache

    c = SingleSlotCache()  # auto-registered
    c.put(("k",), "v")
    genomes = gbm.simulate_genomes(n=30, l=40, seed=2)
    genomes.allele_frequencies = np.round(genomes.allele_frequencies * 2) / 2
    trials, _ = gbm.simulate_trials(
        genomes, f_add_dom_epi=np.array([[0.5, 0.0, 0.0]]), seed=2
    )
    phen = gbm.extract_phenomes(trials)
    gbm.gwasols(genomes=genomes, phenomes=phen)  # populates the prep cache
    n_cleared = gbm.clear_device_caches()
    assert n_cleared >= 2  # the local slot + the gwas prep slot at minimum
    assert c.get(("k",)) is None
    assert gwas_mod._PREP_CACHE.get(("anything",)) is None
