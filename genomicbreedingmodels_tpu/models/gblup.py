"""GBLUP: GRM-based mixed-model genomic prediction with REML variance
components.

The reference has no standalone GBLUP model function (its GWAS code embeds the
same 2-variance-component REML per marker, src/gwas.jl:450-483); BASELINE.json
names "GBLUP mixed-model solves (REML variance components + BLUP)" as a
headline capability, so it is first-class here.

TPU design: eigendecompose the GRM once (K = U S Uᵀ); the REML objective is
then O(n) per evaluation, optimized with the same grid-seeded projected Newton
used by the GWAS REML scan. Marker effects are recovered by the RR-BLUP
equivalence b = (σ²ᵤ/c) Zᵀ (σ²ᵤK + σ²ₑI)⁻¹ y_c (c = GRM denominator), so the
returned Fit predicts new entries through the ordinary `predict` GEMV path and
plugs into the CV harness unchanged.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.grm import grm_ploidy_aware, grm_simple, infer_ploidy
from ..core.structs import Fit, Genomes, Phenomes
from ..ops.metrics import metrics
from ..prediction import extractxyetc
from .gwas import _reml_scan

__all__ = ["gblup", "reml_variance_components"]


def reml_variance_components(y: np.ndarray, K: np.ndarray) -> Tuple[float, float]:
    """REML (σ²_e, σ²_u) for y = 1μ + u + e, u ~ N(0, σ²_u K).

    y is standardized internally so the reference bounds [eps, 1]² apply; the
    components are returned on the original scale of y.
    """
    y = np.asarray(y, dtype=np.float64)
    sd = y.std(ddof=1)
    ys = (y - y.mean()) / sd
    Ksym = (K + K.T) / 2.0
    s, U = np.linalg.eigh(Ksym)
    s = np.maximum(s, 0.0)
    # Normalize K scale so σ²_u is per unit diagonal.
    kscale = float(np.mean(np.diag(Ksym)))
    kscale = kscale if kscale > 1e-12 else 1.0
    yt = jnp.asarray(U.T @ ys, jnp.float32)
    ones_t = jnp.asarray((U.T @ np.ones(len(y)))[:, None], jnp.float32)
    z, theta = _reml_scan(yt, ones_t[None, :, :], jnp.asarray(s / kscale, jnp.float32))
    th = np.asarray(theta[0], dtype=np.float64)
    var = sd**2
    return float(th[0] * var), float(th[1] * var / kscale)


def gblup(
    genomes: Genomes,
    phenomes: Phenomes,
    idx_entries: Optional[Sequence[int]] = None,
    idx_loci_alleles: Optional[Sequence[int]] = None,
    idx_trait: int = 0,
    GRM_type: str = "simple",
    verbose: bool = False,
) -> Fit:
    """Fit GBLUP; returns a Fit whose b_hat are RR-BLUP-equivalent marker
    effects (so `predict` and the CV harness work unchanged), with REML
    variance components and h² in `fit.extras`."""
    X, y, entries, populations, loci_alleles = extractxyetc(
        genomes, phenomes, idx_entries=idx_entries, idx_loci_alleles=idx_loci_alleles,
        idx_trait=idx_trait, add_intercept=False,
    )
    sub = Genomes(
        entries=entries, populations=populations, loci_alleles=loci_alleles,
        allele_frequencies=X,
    )
    if GRM_type == "ploidy-aware":
        grm = grm_ploidy_aware(sub, ploidy=infer_ploidy(X))
    elif GRM_type == "simple":
        grm = grm_simple(sub)
    else:
        raise ValueError(f"unrecognised GRM_type {GRM_type!r}")
    K = grm.genomic_relationship_matrix.astype(np.float64)
    denom = grm.denominator

    sigma2_e, sigma2_u = reml_variance_components(y, K)
    kdiag = float(np.mean(np.diag(K)))
    h2 = sigma2_u * kdiag / (sigma2_u * kdiag + sigma2_e) if (sigma2_u + sigma2_e) > 0 else 0.0

    # Marker effects via the eigenbasis: alpha = (σ²ᵤK + σ²ₑI)⁻¹ y_c.
    s, U = np.linalg.eigh((K + K.T) / 2.0)
    s = np.maximum(s, 0.0)
    yc = y - y.mean()
    d = sigma2_u * s + sigma2_e
    d[d < 1e-12] = 1e-12
    alpha = U @ ((U.T @ yc) / d)
    Z = X - X.mean(axis=0, keepdims=True)
    b = (sigma2_u / denom) * (Z.T @ alpha)
    b0 = float(y.mean() - X.mean(axis=0) @ b)
    b_hat = np.concatenate([[b0], b])
    y_pred = b0 + X @ b

    fit = Fit(
        model="gblup",
        b_hat=b_hat,
        b_hat_labels=np.concatenate([np.asarray(["intercept"], dtype=object), loci_alleles]),
        trait=str(phenomes.traits[idx_trait]),
        entries=entries,
        populations=populations,
        y_true=y,
        y_pred=y_pred,
        metrics=metrics(y, y_pred),
        extras={
            "sigma2_e": sigma2_e,
            "sigma2_u": sigma2_u,
            "h2": h2,
            "grm_type": GRM_type,
        },
    )
    if not fit.checkdims():
        raise RuntimeError("error fitting gblup")
    return fit
