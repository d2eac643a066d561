"""Manhattan/CV plotting parity (reference plot(fit, dist) usage at
src/gwas.jl:252, :394)."""

import numpy as np


def test_manhattan_data_and_png(tmp_path, sim_small):
    import genomicbreedingmodels_tpu as gbm

    genomes, phenomes, effects = sim_small
    fit = gbm.gwasols(genomes, phenomes)
    df = gbm.plot_manhattan(fit, dist="t", save_path=str(tmp_path / "man.png"))
    assert len(df) == len(fit.b_hat)
    assert np.isfinite(df["neg_log10_p"]).all()
    assert (df["neg_log10_p"] >= 0).all()
    assert (tmp_path / "man.png").stat().st_size > 1000


def test_plot_cv(tmp_path, sim_small):
    import genomicbreedingmodels_tpu as gbm

    genomes, phenomes, _ = sim_small
    cvs, _ = gbm.cvbulk(genomes, phenomes, models=["ridge"], n_replications=1, n_folds=2, seed=42)
    df = gbm.plot_cv(cvs, save_path=str(tmp_path / "cv.png"))
    assert len(df) == 2
    assert (tmp_path / "cv.png").stat().st_size > 1000
