"""Native IO layer: TSV genomes/phenomes + PLINK .bed trios (C++ gbmio with
numpy fallback)."""

import numpy as np
import pytest


def test_native_library_builds():
    from genomicbreedingmodels_tpu.native.lib import native_available

    # g++ is part of the supported environment; the build must succeed here.
    assert native_available()


def test_genomes_tsv_roundtrip(tmp_path, sim_small):
    import genomicbreedingmodels_tpu as gbm
    from genomicbreedingmodels_tpu.io import read_genomes_tsv, write_genomes_tsv

    genomes, _, _ = sim_small
    sub = genomes.slice(idx_entries=list(range(30)), idx_loci_alleles=list(range(200)))
    path = tmp_path / "g.tsv"
    write_genomes_tsv(sub, path)
    back = read_genomes_tsv(path)
    assert np.array_equal(back.entries, sub.entries)
    assert np.array_equal(back.populations, sub.populations)
    assert np.array_equal(back.loci_alleles, sub.loci_alleles)
    np.testing.assert_array_equal(back.allele_frequencies, sub.allele_frequencies)


def test_genomes_tsv_roundtrip_with_missing(tmp_path):
    import genomicbreedingmodels_tpu as gbm
    from genomicbreedingmodels_tpu.io import read_genomes_tsv, write_genomes_tsv

    genomes = gbm.simulate_genomes(n=20, l=50, seed=2, sparsity=0.1)
    path = tmp_path / "g.tsv"
    write_genomes_tsv(genomes, path)
    back = read_genomes_tsv(path)
    np.testing.assert_array_equal(back.allele_frequencies, genomes.allele_frequencies)
    assert np.isnan(back.allele_frequencies).sum() == np.isnan(genomes.allele_frequencies).sum() > 0


def test_phenomes_tsv_roundtrip(tmp_path, sim_small):
    from genomicbreedingmodels_tpu.io import read_phenomes_tsv, write_phenomes_tsv

    _, phenomes, _ = sim_small
    path = tmp_path / "p.tsv"
    write_phenomes_tsv(phenomes, path)
    back = read_phenomes_tsv(path)
    assert np.array_equal(back.traits, phenomes.traits)
    np.testing.assert_array_equal(back.phenotypes, phenomes.phenotypes)


def test_tsv_malformed_field(tmp_path):
    from genomicbreedingmodels_tpu.io import read_genomes_tsv

    path = tmp_path / "bad.tsv"
    path.write_text("entry\tpopulation\tl1\tl2\ne1\tp1\t0.5\toops\n")
    with pytest.raises(ValueError):
        read_genomes_tsv(path)


def test_bed_roundtrip(tmp_path, sim_small):
    import genomicbreedingmodels_tpu as gbm
    from genomicbreedingmodels_tpu.io import read_bed, write_bed

    genomes, _, _ = sim_small
    sub = genomes.slice(idx_entries=list(range(37)), idx_loci_alleles=list(range(100)))
    # Quantize to the .bed alphabet (incl. missing) so the round-trip is exact.
    q = np.round(np.asarray(sub.allele_frequencies) * 2) / 2
    q[:3, :2] = np.nan
    sub.allele_frequencies = q
    write_bed(sub, tmp_path / "panel")
    back = read_bed(tmp_path / "panel")
    assert np.array_equal(back.entries, sub.entries)
    assert np.array_equal(back.populations, sub.populations)
    assert np.array_equal(back.loci_alleles, sub.loci_alleles)
    np.testing.assert_array_equal(back.allele_frequencies, q)


def test_bed_decode_matches_fallback(tmp_path, sim_small):
    """Native decode and the pure-numpy fallback must agree bit-for-bit."""
    import genomicbreedingmodels_tpu.io as gio
    from genomicbreedingmodels_tpu.io import read_bed, write_bed

    genomes, _, _ = sim_small
    sub = genomes.slice(idx_entries=list(range(10)), idx_loci_alleles=list(range(33)))
    sub.allele_frequencies = np.round(np.asarray(sub.allele_frequencies) * 2) / 2
    write_bed(sub, tmp_path / "x")
    native = read_bed(tmp_path / "x")

    real_load = gio.load_native
    gio.load_native = lambda: None
    try:
        fallback = read_bed(tmp_path / "x")
    finally:
        gio.load_native = real_load
    np.testing.assert_array_equal(
        native.allele_frequencies, fallback.allele_frequencies
    )


def test_io_feeds_models(tmp_path):
    """Files written by the IO layer drive a fit end-to-end."""
    import genomicbreedingmodels_tpu as gbm
    from genomicbreedingmodels_tpu.io import (
        read_genomes_tsv, read_phenomes_tsv, write_genomes_tsv, write_phenomes_tsv,
    )

    genomes = gbm.simulate_genomes(n=60, l=300, seed=4)
    trials, _ = gbm.simulate_trials(genomes, f_add_dom_epi=np.array([[0.5, 0.05, 0.05]]), seed=4)
    phenomes = gbm.extract_phenomes(trials)
    write_genomes_tsv(genomes, tmp_path / "g.tsv")
    write_phenomes_tsv(phenomes, tmp_path / "p.tsv")
    g2 = read_genomes_tsv(tmp_path / "g.tsv")
    p2 = read_phenomes_tsv(tmp_path / "p.tsv")
    fit = gbm.ridge(g2, p2, idx_trait=0)
    assert fit.metrics["cor"] > 0.5


def _write_test_vcf(path, n_samples=5, n_records=8, seed=0):
    rng = np.random.default_rng(seed)
    gts = ["0/0", "0/1", "1/1", "./.", "0|1", "1|1"]
    with open(path, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write("##source=test\n")
        names = [f"s{i}" for i in range(n_samples)]
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t" + "\t".join(names) + "\n")
        expect = np.zeros((n_samples, n_records))
        for r in range(n_records):
            row = [gts[rng.integers(0, len(gts))] for _ in range(n_samples)]
            for s, g in enumerate(row):
                gg = g.replace("|", "/")
                expect[s, r] = np.nan if "." in gg else sum(int(a) > 0 for a in gg.split("/")) * 0.5
            fh.write(f"chr{1 + r % 2}\t{1000 + r}\trs{r}\tA\tG\t50\tPASS\t.\tGT:DP\t"
                     + "\t".join(f"{g}:{rng.integers(5, 40)}" for g in row) + "\n")
    return expect


def test_read_vcf_native_and_fallback(tmp_path):
    import genomicbreedingmodels_tpu.io as gio

    path = tmp_path / "panel.vcf"
    expect = _write_test_vcf(path)
    g = gio.read_vcf(path, population="popA")
    assert g.n == 5 and g.p == 8
    np.testing.assert_array_equal(g.allele_frequencies, expect)
    assert g.loci_alleles[0].startswith("chr1\t1000\tA|G\tG")
    assert set(g.populations) == {"popA"}

    real = gio.load_native
    gio.load_native = lambda: None
    try:
        g2 = gio.read_vcf(path)
    finally:
        gio.load_native = real
    np.testing.assert_array_equal(g2.allele_frequencies, expect)


def test_read_vcf_feeds_models(tmp_path):
    """A VCF panel drives a fit end-to-end (GWAS plot coordinates included)."""
    import genomicbreedingmodels_tpu as gbm

    rng = np.random.default_rng(1)
    n, p = 60, 120
    gts = np.asarray(["0/0", "0/1", "1/1"])
    codes = rng.integers(0, 3, size=(n, p))
    path = tmp_path / "big.vcf"
    with open(path, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                 + "\t".join(f"e{i}" for i in range(n)) + "\n")
        for r in range(p):
            fh.write(f"chr1\t{r + 1}\t.\tA\tT\t.\t.\t.\tGT\t"
                     + "\t".join(gts[codes[i, r]] for i in range(n)) + "\n")
    g = gbm.read_vcf(path)
    y = g.allele_frequencies[:, :3] @ [2.0, -1.5, 1.0] + 0.2 * rng.normal(size=n)
    ph = gbm.Phenomes(entries=g.entries, populations=g.populations,
                      traits=np.asarray(["t"], dtype=object), phenotypes=y[:, None])
    fit = gbm.ridge(g, ph)
    assert fit.metrics["cor"] > 0.8


def test_read_bed_marker_range(tmp_path, sim_small):
    import genomicbreedingmodels_tpu as gbm
    from genomicbreedingmodels_tpu.io import read_bed, write_bed

    genomes, _, _ = sim_small
    sub = genomes.slice(idx_entries=list(range(21)), idx_loci_alleles=list(range(50)))
    sub.allele_frequencies = np.round(np.asarray(sub.allele_frequencies) * 2) / 2
    write_bed(sub, tmp_path / "rng")
    full = read_bed(tmp_path / "rng")
    part = read_bed(tmp_path / "rng", marker_range=(10, 35))
    assert part.p == 25
    np.testing.assert_array_equal(
        part.allele_frequencies, full.allele_frequencies[:, 10:35]
    )
    np.testing.assert_array_equal(part.loci_alleles, full.loci_alleles[10:35])
    import pytest

    with pytest.raises(ValueError):
        read_bed(tmp_path / "rng", marker_range=(40, 60))


def test_native_quantize_grid_matches_numpy_and_rejects_offgrid():
    """gbmio_quantize_grid: fused on-grid check + uint8 quantization must
    agree with the numpy reference on called panels and reject off-grid
    (continuous) panels."""
    import ctypes
    import numpy as np
    from genomicbreedingmodels_tpu.native.lib import load_native

    lib = load_native()
    if lib is None:
        import pytest

        pytest.skip("native gbmio unavailable")
    rng = np.random.default_rng(0)
    for ploidy in (2, 4, 6, 10):
        G = rng.integers(0, ploidy + 1, size=(64, 257)).astype(np.float64) / ploidy
        out = np.empty(G.shape, np.uint8)
        ok = lib.gbmio_quantize_grid(
            G.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), G.size,
            240.0, 2e-7, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), 0,
        )
        assert ok == 1, ploidy
        np.testing.assert_array_equal(out, np.rint(G * 240.0).astype(np.uint8))
        # dequantized panel reproduces the f32 panel to < 2e-7
        assert np.max(np.abs(G.astype(np.float32)
                             - out.astype(np.float32) * np.float32(1 / 240.0))) < 2e-7
    G = rng.uniform(size=(64, 257))  # continuous: off-grid
    out = np.empty(G.shape, np.uint8)
    ok = lib.gbmio_quantize_grid(
        G.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), G.size,
        240.0, 2e-7, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), 0,
    )
    assert ok == 0
