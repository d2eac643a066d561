"""GWAS workflow: prep, three scan flavors, Manhattan plot.

Run: python examples/gwas_workflow.py
"""

import numpy as np

import genomicbreedingmodels_tpu as gbm


def main():
    genomes = gbm.simulate_genomes(n=200, l=1_500, n_founders=24, seed=7)
    trials, effects = gbm.simulate_trials(
        genomes, f_add_dom_epi=np.array([[0.7, 0.0, 0.0]]), n_qtl=10, seed=7
    )
    phenomes = gbm.extract_phenomes(trials)
    causal = set(effects[0].idx_additive.tolist())

    X = np.asarray(genomes.allele_frequencies)
    causal_idx = effects[0].idx_additive
    for name, scan, dist in [
        ("gwasols", gbm.gwasols, "t"),
        ("gwaslmm", gbm.gwaslmm, "normal"),
        ("gwasreml", gbm.gwasreml, "normal"),
    ]:
        fit = scan(genomes=genomes, phenomes=phenomes)
        top = np.argsort(-np.abs(fit.b_hat))[:20]
        direct = len(set(top.tolist()) & causal)
        # GWAS on an LD panel tags causal loci through correlated proxies.
        R = np.corrcoef(X[:, top].T, X[:, causal_idx].T)[: len(top), len(top):]
        tagged = int((np.abs(R).max(axis=1) > 0.5).sum())
        print(f"{name:9s} top-20: {direct} direct causal, {tagged} tagging (|r|>0.5)")
        gbm.plot_manhattan(fit, dist=dist, save_path=f"/tmp/{name}_manhattan.png")
        print(f"          Manhattan plot -> /tmp/{name}_manhattan.png")


if __name__ == "__main__":
    main()
