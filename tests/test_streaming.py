"""Out-of-core streaming pipeline (streaming.py): prefetched .bed shards,
shard-additive GRM accumulation, out-of-core GBLUP."""

import numpy as np
import pytest

import genomicbreedingmodels_tpu as gbm
from genomicbreedingmodels_tpu.streaming import (
    BedShardStreamer,
    gblup_from_bed,
    grm_from_bed,
)


@pytest.fixture(scope="module")
def bed_trio(tmp_path_factory):
    """A .bed trio with 2-bit-exact frequencies {0, 0.5, 1} and one missing."""
    rng = np.random.default_rng(0)
    n, p = 60, 500
    F = rng.choice([0.0, 0.5, 1.0], size=(n, p), p=[0.4, 0.3, 0.3])
    genomes = gbm.Genomes(
        entries=np.array([f"e{i}" for i in range(n)], dtype=object),
        populations=np.array(["pop1"] * n, dtype=object),
        loci_alleles=np.array([f"chr1\t{j+1}\tA|T\tA" for j in range(p)], dtype=object),
        allele_frequencies=F,
    )
    prefix = tmp_path_factory.mktemp("bed") / "panel"
    gbm.write_bed(genomes, prefix)
    return prefix, genomes


def test_streamer_shards_cover_panel_exactly(bed_trio):
    prefix, genomes = bed_trio
    st = BedShardStreamer(prefix, block_cols=128, prefetch=2)
    assert st.n == 60 and st.p == 500
    assert len(st) == 4
    got = np.empty((st.n, st.p), dtype=np.float32)
    seen = []
    for a, b, F in st:
        seen.append((a, b))
        got[:, a:b] = F
    assert seen == [(0, 128), (128, 256), (256, 384), (384, 500)]
    np.testing.assert_allclose(got, genomes.allele_frequencies, atol=0)


def test_grm_from_bed_matches_in_memory(bed_trio):
    prefix, genomes = bed_trio
    K_stream = np.asarray(grm_from_bed(prefix, block_cols=96))
    from genomicbreedingmodels_tpu.ops.grm import gram_panel

    K_mem = np.asarray(gram_panel(genomes.allele_frequencies.astype(np.float32)))
    np.testing.assert_allclose(K_stream, K_mem, atol=1e-3)


def test_grm_from_bed_single_shard_equivalence(bed_trio):
    prefix, _ = bed_trio
    K1 = np.asarray(grm_from_bed(prefix, block_cols=500))
    K2 = np.asarray(grm_from_bed(prefix, block_cols=64))
    np.testing.assert_allclose(K1, K2, atol=1e-3)


def test_gblup_from_bed_end_to_end(bed_trio):
    prefix, genomes = bed_trio
    rng = np.random.default_rng(1)
    X = genomes.allele_frequencies
    b = rng.normal(size=X.shape[1]) * (rng.random(X.shape[1]) < 0.05)
    y = X @ b + 0.5 * rng.normal(size=X.shape[0])
    gebv, K = gblup_from_bed(prefix, y, lam=0.2, block_cols=128)
    gebv = np.asarray(gebv)
    assert gebv.shape == (60,)
    assert np.isfinite(gebv).all()
    assert np.corrcoef(gebv, y)[0, 1] > 0.5
    # kinship scaling: mean diagonal ~ 1
    assert abs(float(np.mean(np.diag(np.asarray(K)))) - 1.0) < 1e-3


def test_streamer_imputes_missing_to_column_mean(tmp_path):
    n, p = 8, 4
    F = np.full((n, p), 0.5)
    F[0, 0] = np.nan  # write_bed encodes NaN as the PLINK missing code
    genomes = gbm.Genomes(
        entries=np.array([f"e{i}" for i in range(n)], dtype=object),
        populations=np.array(["pop1"] * n, dtype=object),
        loci_alleles=np.array([f"chr1\t{j+1}\tA|T\tA" for j in range(p)], dtype=object),
        allele_frequencies=F,
    )
    prefix = tmp_path / "m"
    gbm.write_bed(genomes, prefix)
    st = BedShardStreamer(prefix, block_cols=4)
    _, _, dec = next(iter(st))
    assert np.isfinite(dec).all()
    assert dec[0, 0] == pytest.approx(0.5)


def test_iter_dosage_exact_int8_shards(bed_trio):
    """Complete shards come back int8 dosage = 2x frequency; the dosage-path
    GRM matches the float-path GRM to float tolerance."""
    prefix, genomes = bed_trio
    st = BedShardStreamer(prefix, block_cols=128)
    F = genomes.allele_frequencies
    for a, b, S in st.iter_dosage():
        if S.dtype == np.int8:
            assert np.array_equal(S, (F[:, a:b] * 2).astype(np.int8))
        else:  # shard containing missing: falls back to imputed float32
            assert S.dtype == np.float32
    K_auto = np.asarray(grm_from_bed(prefix, block_cols=128))
    K_f32 = np.asarray(grm_from_bed(prefix, block_cols=128, dtype="float32"))
    assert np.abs(K_auto - K_f32).max() < 1e-2 * max(1.0, np.abs(K_f32).max())


def test_dosage_shard_with_missing_falls_back(tmp_path):
    rng = np.random.default_rng(3)
    n, p = 20, 40
    F = rng.choice([0.0, 0.5, 1.0], size=(n, p))
    F[rng.random((n, p)) < 0.05] = np.nan  # write_bed encodes NaN as missing
    genomes = gbm.Genomes(
        entries=np.array([f"e{i}" for i in range(n)], dtype=object),
        populations=np.array(["pop1"] * n, dtype=object),
        loci_alleles=np.array([f"chr1\t{j+1}\tA|T\tA" for j in range(p)], dtype=object),
        allele_frequencies=F,
    )
    prefix = tmp_path / "miss"
    gbm.write_bed(genomes, prefix)
    st = BedShardStreamer(prefix, block_cols=p)
    shards = list(st.iter_dosage())
    assert len(shards) == 1
    _, _, S = shards[0]
    assert S.dtype == np.float32  # missing present → imputed float path
    assert np.isfinite(S).all()


def test_iter_dosage_snp_major_layout(bed_trio):
    """snp_major=True yields (cols, n) int8 shards in the .bed native order
    — identical content, zero host transpose."""
    prefix, genomes = bed_trio
    st = BedShardStreamer(prefix, block_cols=128)
    F = genomes.allele_frequencies
    for a, b, S in st.iter_dosage(snp_major=True):
        assert S.dtype == np.int8
        assert S.shape == (b - a, st.n)
        assert np.array_equal(S.T, (F[:, a:b] * 2).astype(np.int8))


def test_gblup_from_bed_pieces_matches_dense(bed_trio):
    """The trapezoid-pieces CG path (north-star machinery, ops/pieces.py)
    must reproduce the dense Cholesky gblup_from_bed on a panel that fits."""
    from genomicbreedingmodels_tpu.streaming import gblup_from_bed_pieces

    prefix, genomes = bed_trio
    rng = np.random.default_rng(9)
    n = len(genomes.entries)
    y = rng.normal(size=n)
    gebv_dense, _ = gblup_from_bed(prefix, y, lam=0.1, block_cols=128, dtype="float32")
    gebv_pieces, resid = gblup_from_bed_pieces(
        prefix, y, lam=0.1, block_cols=128, block_rows=16, cg_iters=300
    )
    assert resid < 1e-3
    np.testing.assert_allclose(np.asarray(gebv_dense), gebv_pieces, atol=2e-3)


def test_gblup_from_bed_pieces_rejects_missing(tmp_path):
    from genomicbreedingmodels_tpu.streaming import gblup_from_bed_pieces

    rng = np.random.default_rng(3)
    n, p = 20, 40
    F = rng.choice([0.0, 0.5, 1.0], size=(n, p))
    F[0, 0] = np.nan
    genomes = gbm.Genomes(
        entries=np.array([f"e{i}" for i in range(n)], dtype=object),
        populations=np.array(["pop1"] * n, dtype=object),
        loci_alleles=np.array([f"chr1\t{j+1}\tA|T\tA" for j in range(p)], dtype=object),
        allele_frequencies=F,
    )
    prefix = tmp_path / "miss"
    gbm.write_bed(genomes, prefix)
    with pytest.raises(ValueError, match="missing"):
        gblup_from_bed_pieces(prefix, rng.normal(size=n))


def test_unpack_bed_payload_matches_host_decode(bed_trio):
    """Device-side 2-bit unpack (ops/pieces.py) must agree bit-for-bit with
    the host int8 decode, including the ragged last byte (n=60 ≡ 0 mod 4
    here, so also check an n=13 panel with byte padding)."""
    import jax.numpy as jnp

    from genomicbreedingmodels_tpu.ops.pieces import unpack_bed_payload

    prefix, genomes = bed_trio
    st = BedShardStreamer(prefix, block_cols=128)
    for (a, b, payload), (_, _, D) in zip(st.iter_payload(), st.iter_dosage(snp_major=True)):
        got, miss = unpack_bed_payload(jnp.asarray(payload), st.n)
        assert int(miss) == 0
        assert np.array_equal(np.asarray(got), D)


def test_unpack_bed_payload_ragged_and_missing(tmp_path):
    import jax.numpy as jnp

    from genomicbreedingmodels_tpu.ops.pieces import unpack_bed_payload

    rng = np.random.default_rng(5)
    n, p = 13, 9  # n % 4 != 0: last byte padded
    F = rng.choice([0.0, 0.5, 1.0], size=(n, p))
    F[2, 3] = np.nan
    F[7, 0] = np.nan
    genomes = gbm.Genomes(
        entries=np.array([f"e{i}" for i in range(n)], dtype=object),
        populations=np.array(["pop1"] * n, dtype=object),
        loci_alleles=np.array([f"chr1\t{j+1}\tA|T\tA" for j in range(p)], dtype=object),
        allele_frequencies=F,
    )
    prefix = tmp_path / "ragged"
    gbm.write_bed(genomes, prefix)
    st = BedShardStreamer(prefix, block_cols=p)
    _, _, payload = next(iter(st.iter_payload()))
    assert payload.shape == (p, (n + 3) // 4)
    got, miss = unpack_bed_payload(jnp.asarray(payload), n)
    assert int(miss) == 2
    expect = np.nan_to_num(F.T * 2, nan=0.0).astype(np.int8)
    assert np.array_equal(np.asarray(got), expect)


def test_iter_device_ahead_order_content_and_inline_equivalence():
    """The double-buffered h2d stage must preserve shard order and content,
    and the GBM_STREAM_H2D_AHEAD=0 inline escape hatch must yield the same
    stream."""
    import os

    import numpy as np
    from genomicbreedingmodels_tpu.streaming import _iter_device_ahead

    rng = np.random.default_rng(1)
    shards = [(i * 4, i * 4 + 4, rng.integers(0, 255, size=(4, 7), dtype=np.uint8))
              for i in range(5)]
    out = list(_iter_device_ahead(iter(shards)))
    assert [(a, b) for a, b, _ in out] == [(a, b) for a, b, _ in shards]
    for (_, _, host), (_, _, dev) in zip(shards, out):
        np.testing.assert_array_equal(np.asarray(dev), host)
    os.environ["GBM_STREAM_H2D_AHEAD"] = "0"
    try:
        out2 = list(_iter_device_ahead(iter(shards)))
    finally:
        os.environ.pop("GBM_STREAM_H2D_AHEAD", None)
    for (_, _, d1), (_, _, d2) in zip(out, out2):
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    # Empty stream: no yields, no hang.
    assert list(_iter_device_ahead(iter([]))) == []
