"""Batched CV engine (all folds x lambda as one XLA program, GCV selection)."""

import numpy as np
import pytest


def test_batched_matches_serial_structure_and_accuracy(sim_small):
    import genomicbreedingmodels_tpu as gbm

    genomes, phenomes, _ = sim_small
    cvs_b, notes_b = gbm.cvbulk_batched(genomes, phenomes, n_replications=2, n_folds=3, seed=42)
    cvs_s, notes_s = gbm.cvbulk(genomes, phenomes, models=["ridge"], n_replications=2, n_folds=3, seed=42)
    assert len(cvs_b) == len(cvs_s)
    # identical fold composition for the same seed
    for b, s in zip(cvs_b, cvs_s):
        assert b.replication == s.replication and b.fold == s.fold
        assert np.array_equal(np.sort(b.validation_entries), np.sort(s.validation_entries))
    mb = np.mean([c.metrics["cor"] for c in cvs_b])
    ms = np.mean([c.metrics["cor"] for c in cvs_s])
    assert mb > 0.5
    assert abs(mb - ms) < 0.15


def test_batched_fit_predicts_through_generic_path(sim_small):
    import genomicbreedingmodels_tpu as gbm

    genomes, phenomes, _ = sim_small
    cvs, _ = gbm.cvbulk_batched(genomes, phenomes, n_replications=1, n_folds=3, seed=1)
    fit = cvs[0].fit
    assert fit.extras["engine"] == "batched"
    yp = gbm.predict(fit, genomes, idx_entries=list(range(10)))
    assert yp.shape == (10,)
    # fold-level predictions must agree with the generic GEMV path
    rows = [int(np.flatnonzero(genomes.entries == e)[0]) for e in cvs[0].validation_entries]
    yp2 = gbm.predict(fit, genomes, idx_entries=rows)
    np.testing.assert_allclose(yp2, cvs[0].y_pred, rtol=1e-3, atol=1e-3)


def test_batched_argument_validation(sim_small):
    import genomicbreedingmodels_tpu as gbm

    genomes, phenomes, _ = sim_small
    with pytest.raises(ValueError):
        gbm.cvbulk_batched(genomes, phenomes, n_folds=0)
    with pytest.raises(ValueError):
        gbm.cvbulk_batched(genomes, phenomes, n_replications=0)
