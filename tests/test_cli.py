"""CLI (`python -m genomicbreedingmodels_tpu`): fit/predict/cv/gwas/grm."""

import json

import numpy as np
import pytest

import genomicbreedingmodels_tpu as gbm
from genomicbreedingmodels_tpu.__main__ import main


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    genomes = gbm.simulate_genomes(n=60, l=150, seed=9)
    # snap to .bed-encodable dosages so the file round-trips exactly
    genomes.allele_frequencies = np.round(genomes.allele_frequencies * 2) / 2
    trials, _ = gbm.simulate_trials(
        genomes, f_add_dom_epi=np.array([[0.5, 0.0, 0.0]]), seed=9
    )
    phenomes = gbm.extract_phenomes(trials)
    gbm.write_bed(genomes, d / "panel")
    gbm.write_genomes_tsv(genomes, d / "panel.tsv")
    gbm.write_phenomes_tsv(phenomes, d / "pheno.tsv")
    return d


def test_cli_fit_and_predict_roundtrip(data_dir, capsys):
    fitp = data_dir / "fit.npz"
    rc = main(["fit", "--geno", str(data_dir / "panel.bed"),
               "--pheno", str(data_dir / "pheno.tsv"),
               "--model", "ridge", "--out", str(fitp)])
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["model"] == "ridge" and info["cor"] > 0.5

    outp = data_dir / "gebv.tsv"
    rc = main(["predict", "--geno", str(data_dir / "panel.bed"),
               "--fit", str(fitp), "--out", str(outp)])
    assert rc == 0
    rows = outp.read_text().strip().splitlines()
    assert rows[0] == "entry\tpopulation\tgebv"
    assert len(rows) == 61
    vals = np.array([float(r.split("\t")[2]) for r in rows[1:]])
    assert np.isfinite(vals).all()


def test_cli_cv_writes_tables(data_dir, capsys):
    out = data_dir / "cvout"
    rc = main(["cv", "--geno", str(data_dir / "panel.tsv"),
               "--pheno", str(data_dir / "pheno.tsv"),
               "--models", "ridge,ols", "--replications", "1", "--folds", "2",
               "--out", str(out)])
    assert rc == 0
    for f in ("cv_across.tsv", "cv_per_entry.tsv", "cv_summary.tsv", "notes.txt"):
        assert (out / f).exists()
    header = (out / "cv_across.tsv").read_text().splitlines()[0]
    assert "cor" in header


def test_cli_gwas(data_dir, capsys):
    out = data_dir / "hits.tsv"
    rc = main(["gwas", "--geno", str(data_dir / "panel.bed"),
               "--pheno", str(data_dir / "pheno.tsv"),
               "--method", "ols", "--out", str(out)])
    assert rc == 0
    lines = out.read_text().strip().splitlines()
    assert lines[0].split("\t") == ["locus", "chrom", "pos", "stat", "neg_log10_p"]
    assert len(lines) > 100


def test_cli_grm_streaming_matches_in_memory(data_dir):
    out1 = data_dir / "grm_mem.npy"
    out2 = data_dir / "grm_stream.npy"
    assert main(["grm", "--geno", str(data_dir / "panel.bed"), "--out", str(out1)]) == 0
    assert main(["grm", "--geno", str(data_dir / "panel.bed"), "--streaming",
                 "--block-cols", "64", "--out", str(out2)]) == 0
    K1 = np.load(out1)
    K2 = np.load(out2)
    assert K1.shape == (60, 60) and K2.shape == (60, 60)
    # grm command writes the VanRaden-scaled GRM in-memory but the raw
    # centered Gram when streaming; compare up to that scale factor
    s = np.trace(K1) / np.trace(K2)
    np.testing.assert_allclose(K1, K2 * s, atol=1e-4)


def test_cli_unknown_model_errors(data_dir):
    with pytest.raises(ValueError):
        main(["fit", "--geno", str(data_dir / "panel.tsv"),
              "--pheno", str(data_dir / "pheno.tsv"),
              "--model", "nope", "--out", str(data_dir / "x.npz")])
