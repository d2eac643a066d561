"""Batched cross-validation engine: every (trait, replication, fold, λ) as
one XLA program.

The reference's CV loop refits glmnet per fold in a Julia thread pool
(src/cross_validation.jl:159-185 + src/linear.jl:193). The TPU-native engine
exploits that RR-BLUP/ridge folds share one Gram matrix:

1. K = Z Zᵀ is built ONCE on the MXU (the O(n²p) term).
2. A fold is a {0,1} training mask w. The masked dual system
       A_w = (w wᵀ) ⊙ K + diag(λ n_w w + (1 - w))
   has identity rows on held-out entries, so its Cholesky solve equals the
   fold's exact training-only dual ridge — no gather/scatter, static shapes.
3. Each fold's masked Gram is eigendecomposed once; the whole λ path comes
   from that basis, and per-fold λ is chosen by training-only GCV (never the
   validation rows — matching glmnet's inside-the-training-set selection).

Fold-label RNG matches `cvbulk` (uniform with replacement, seeded), so the
fold composition of the two engines is identical for a given seed.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.structs import CV, Fit, Genomes, Phenomes
from ..ops.metrics import metrics
from .harness import _common_checks

__all__ = ["cvbulk_batched"]


@partial(jax.jit, static_argnames=())
def _gram(X):
    Z = X - jnp.mean(X, axis=0, keepdims=True)
    return jnp.dot(Z, Z.T, preferred_element_type=jnp.float32), Z


@jax.jit
def _fold_solve(K, y, w, lambdas):
    """One fold, all λ from one eigendecomposition of the masked Gram.

    Returns (preds (L, n), gammas (L, n), gcv (L,)). λ selection uses
    training-only GCV — MSE_train / (1 - edf/n_w)² — NEVER the validation
    rows (the reference's glmnet likewise selects λ inside the training set).
    """
    n_w = jnp.sum(w)
    mean_y = jnp.sum(w * y) / n_w
    yc = (y - mean_y) * w
    Kw = K * w[:, None] * w[None, :]
    s, U = jnp.linalg.eigh(Kw)
    s = jnp.maximum(s, 0.0)
    Ut_y = U.T @ yc

    def per_lam(lam):
        d = s + lam * n_w
        gamma = U @ (Ut_y / d)
        gamma = w * gamma  # zero-eigenvalue val coordinates carry yc=0 anyway
        pred = mean_y + K @ gamma
        edf = jnp.sum(s / d)
        res_tr = ((y - pred) * w) ** 2
        gcv = (jnp.sum(res_tr) / n_w) / jnp.maximum((1.0 - edf / n_w) ** 2, 1e-6)
        return pred, gamma, gcv

    preds, gammas, gcv = jax.vmap(per_lam)(lambdas)
    return preds, gammas, gcv


def cvbulk_batched(
    genomes: Genomes,
    phenomes: Phenomes,
    n_replications: int = 5,
    n_folds: int = 5,
    seed: int = 42,
    lambdas: Optional[Sequence[float]] = None,
    store_effects: bool = True,
    verbose: bool = False,
) -> Tuple[List[CV], List[str]]:
    """Replicated k-fold ridge/RR-BLUP CV, fully batched on device.

    Returns the same (cvs, notes) surface as `cvbulk(models=["ridge"])`; each
    CV's fit carries the fold's chosen λ in `extras` and (with
    `store_effects`) RR-BLUP marker effects in `b_hat` so `predict` works.
    """
    _common_checks(genomes, phenomes, ["ridge"])
    n, p = genomes.allele_frequencies.shape
    if not (1 <= n_folds <= n):
        raise ValueError(f"n_folds={n_folds} out of bounds (1..{n})")
    if not (1 <= n_replications <= 100):
        raise ValueError(f"n_replications={n_replications} out of bounds (1..100)")
    if lambdas is None:
        lambdas = np.logspace(-4, 1, 12)
    lambdas_j = jnp.asarray(np.asarray(lambdas, dtype=np.float32))

    X = jnp.asarray(genomes.allele_frequencies, jnp.float32)
    K, Z = _gram(X)

    rng = np.random.default_rng(seed)
    cvs: List[CV] = []
    notes: List[str] = []
    solve_batch = jax.jit(jax.vmap(_fold_solve, in_axes=(None, None, 0, None)))

    for idx_trait, trait in enumerate(phenomes.traits.tolist()):
        phi = np.asarray(phenomes.phenotypes[:, idx_trait], dtype=np.float64)
        finite = np.isfinite(phi)
        y = jnp.asarray(np.where(finite, phi, 0.0), jnp.float32)
        for i in range(1, n_replications + 1):
            fold_labels = rng.integers(1, n_folds + 1, size=n)
            w_list, v_list, fold_ids = [], [], []
            for j in range(1, n_folds + 1):
                tr_mask = (fold_labels != j) & finite
                va_mask = (fold_labels == j) & finite
                if tr_mask.sum() < 2 or va_mask.sum() < 1:
                    notes.append(";".join(["too_many_missing", trait, f"replication_{i}", f"fold_{j}"]))
                    continue
                if np.var(phi[tr_mask], ddof=1) < 1e-20:
                    notes.append(";".join(["zero_variance", trait, f"replication_{i}", f"fold_{j}"]))
                    continue
                w_list.append(tr_mask.astype(np.float32))
                v_list.append(va_mask.astype(np.float32))
                fold_ids.append(j)
            if not w_list:
                continue
            W = jnp.asarray(np.stack(w_list))
            V = np.stack(v_list)
            preds, gammas, gcv = solve_batch(K, y, W, lambdas_j)  # (F, L, ...)
            # λ per fold by training-only GCV (no validation leakage).
            best = np.argmin(np.asarray(gcv), axis=1)
            for f, j in enumerate(fold_ids):
                lam = float(lambdas[best[f]])
                pred_f = np.asarray(preds[f, best[f]], dtype=np.float64)
                rows = np.flatnonzero(V[f] > 0)
                tr_rows = np.flatnonzero(np.asarray(W[f]) > 0)
                y_true = phi[rows]
                y_pred = pred_f[rows]
                if store_effects:
                    gamma = np.asarray(gammas[f, best[f]], dtype=np.float64)
                    wf = np.asarray(W[f], dtype=np.float64)
                    Zn = np.asarray(Z, dtype=np.float64)
                    beta = Zn.T @ (wf * gamma)
                    mean_y = float((wf * phi).sum() / wf.sum())
                    b0 = mean_y - float(
                        np.asarray(genomes.allele_frequencies, dtype=np.float64).mean(axis=0) @ beta
                    )
                    b_hat = np.concatenate([[b0], beta])
                    labels = np.concatenate(
                        [np.asarray(["intercept"], dtype=object), genomes.loci_alleles]
                    )
                else:
                    b_hat = np.zeros(1)
                    labels = np.asarray(["intercept"], dtype=object)
                fit = Fit(
                    model="ridge",
                    b_hat=b_hat,
                    b_hat_labels=labels,
                    trait=str(trait),
                    entries=genomes.entries[tr_rows],
                    populations=genomes.populations[tr_rows],
                    y_true=phi[tr_rows],
                    y_pred=pred_f[tr_rows],
                    metrics=metrics(phi[tr_rows], pred_f[tr_rows]),
                    extras={"lambda": lam, "engine": "batched"},
                )
                cv = CV(
                    replication=f"replication_{i}",
                    fold=f"fold_{j}",
                    fit=fit,
                    validation_populations=genomes.populations[rows],
                    validation_entries=genomes.entries[rows],
                    y_true=y_true,
                    y_pred=y_pred,
                    metrics=metrics(y_true, y_pred),
                )
                cvs.append(cv)
    return cvs, notes
