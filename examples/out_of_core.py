"""Out-of-core workflow: write a PLINK .bed panel, then go disk → GRM → GEBV
without ever materializing the panel in memory (streaming.py).

Run: python examples/out_of_core.py
"""

import tempfile
from pathlib import Path

import numpy as np

import genomicbreedingmodels_tpu as gbm


def main() -> None:
    rng = np.random.default_rng(0)
    n, p = 500, 20_000
    # .bed stores 2-bit dosages: simulate diploid allele frequencies {0, .5, 1}
    F = rng.choice([0.0, 0.5, 1.0], size=(n, p), p=[0.3, 0.4, 0.3])
    genomes = gbm.Genomes(
        entries=np.array([f"e{i}" for i in range(n)], dtype=object),
        populations=np.array(["pop1"] * n, dtype=object),
        loci_alleles=np.array([f"chr1\t{j+1}\tA|T\tA" for j in range(p)], dtype=object),
        allele_frequencies=F,
    )
    b = rng.normal(size=p) * (rng.random(p) < 0.01)
    y = F @ b + 0.5 * rng.normal(size=n)

    d = Path(tempfile.mkdtemp())
    gbm.write_bed(genomes, d / "panel")
    print(f"wrote {d/'panel'}.bed ({(d/'panel.bed').stat().st_size/1e6:.1f} MB)")

    # Stream shards with background prefetch; GRM accumulates shard-by-shard.
    streamer = gbm.BedShardStreamer(d / "panel", block_cols=4096, prefetch=2)
    print(f"{len(streamer)} shards of <=4096 markers, n={streamer.n}")

    gebv, K = gbm.gblup_from_bed(d / "panel", y, lam=0.2, block_cols=4096)
    gebv = np.asarray(gebv)
    print(f"GRM {np.asarray(K).shape}, mean diag {float(np.mean(np.diag(np.asarray(K)))):.3f}")
    print(f"GEBV vs y correlation: {np.corrcoef(gebv, y)[0, 1]:.3f}")


if __name__ == "__main__":
    main()
