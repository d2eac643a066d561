"""Batched cross-validation engine: every (trait, replication, fold, λ) as
one XLA program, with the fold axis dispatched over a device mesh.

The reference's CV loop refits glmnet per fold in a Julia thread pool
(src/cross_validation.jl:159-185 + src/linear.jl:193). The TPU-native engine
exploits that RR-BLUP/ridge/GBLUP folds share one Gram matrix:

1. K = Z Zᵀ is built ONCE on the MXU (the O(n²p) term).
2. A fold is a {0,1} training mask w. The masked dual system
       A_w = (w wᵀ) ⊙ K + diag(λ n_w w + (1 - w))
   has identity rows on held-out entries, so its Cholesky solve equals the
   fold's exact training-only dual ridge — no gather/scatter, static shapes.
3. Each fold's masked Gram is eigendecomposed once; the whole λ path comes
   from that basis. Per-fold λ selection never touches validation rows:
   - ridge: training-only GCV (glmnet-equivalent inside-the-training-set
     selection);
   - gblup: the REML profile criterion over a variance-ratio grid — GBLUP
     IS ridge with the REML-chosen ratio, so this is the batched analogue
     of models/gblup.py;
   - lasso: batched pathwise FISTA per fold with training GCV using the
     active-set size as degrees of freedom.
4. **Mesh dispatch** (SURVEY §7 step 7: "fold×model axis over the device
   mesh"): the fold batch is sharded P('dp') through shard_map — each device
   eigendecomposes and solves its own folds; K/y ride along replicated. On a
   pod slice the (reps × folds) sweep therefore runs D-wide; the same code
   runs on the 8-device virtual CPU mesh in tests.

Fold-label RNG matches `cvbulk` (uniform with replacement, seeded), so the
fold composition of the two engines is identical for a given seed.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core.structs import CV, Fit, Genomes, Phenomes
from ..ops.metrics import metrics
from ..utils.devcache import SingleSlotCache, host_fingerprint
from ..utils.logging import StageTimer
from .harness import _common_checks

# Stage-timing of the most recent cvbulk_batched call (bench attribution).
LAST_TIMER: Optional[StageTimer] = None
# Device panel/Gram of the most recent host panel (see utils/devcache.py).
_PANEL_CACHE = SingleSlotCache()

__all__ = ["cvbulk_batched"]

BATCHED_MODELS = (
    "ridge", "gblup", "lasso",
    # Bayesian zoo (ALL eight priors): F independent row-masked Gibbs
    # chains vmapped into one XLA program
    # (models/bayesian.py:gibbs_cv_folds) — the sampler CV path is batched
    # like the closed-form models instead of dispatched as executor jobs.
    "bayesa", "bayesb", "bayesc", "bayesian_ridge", "bayesian_lasso",
    "bayesian_lasso_pi", "bayest", "bayestpi",
)

_GIBBS_MODEL_KEYS = {
    "bayesa": "BayesA",
    "bayesb": "BayesB",
    "bayesc": "BayesC",
    "bayesian_ridge": "BRR",
    "bayesian_lasso": "BL",
    "bayesian_lasso_pi": "BLPi",
    "bayest": "BayesT",
    "bayestpi": "BayesTPi",
}


@partial(jax.jit, static_argnames=())
def _gram(X):
    Z = X - jnp.mean(X, axis=0, keepdims=True)
    return jnp.dot(Z, Z.T, preferred_element_type=jnp.float32), Z


def _fold_solve(K, y, w, lambdas):
    """One ridge fold, all λ from one eigendecomposition of the masked Gram.

    Returns (preds (L, n), gammas (L, n), crit (L,)). λ selection uses
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


def _fold_solve_gblup(K, y, w, ratios):
    """One GBLUP fold: same masked-Gram eigenbasis, variance ratio chosen by
    the REML profile criterion (models/gblup.py's semantics, batched).

    The masked Gram's spectrum is {training-submatrix spectrum} ∪ {0 per
    validation row} (validation rows/cols are exactly zero); eigenpairs are
    weighted by their training support Σⱼ wⱼ U²ⱼᵢ ∈ {0,1} so the log-det term
    counts only training dimensions. crit(r) = Σᵢ ωᵢ log(sᵢ+r) +
    (Σω) log Σᵢ ỹᵢ²/(sᵢ+r) — the profile (σ²ᵤ-concentrated) likelihood.
    """
    n_w = jnp.sum(w)
    mean_y = jnp.sum(w * y) / n_w
    yc = (y - mean_y) * w
    Kw = K * w[:, None] * w[None, :]
    s, U = jnp.linalg.eigh(Kw)
    s = jnp.maximum(s, 0.0)
    Ut_y = U.T @ yc
    wU = jnp.dot(w, U * U)  # per-eigenpair training support, (n,)

    def per_r(r):
        d = s + r
        gamma = U @ (Ut_y / d)
        gamma = w * gamma
        pred = mean_y + K @ gamma
        m = jnp.sum(wU)
        quad = jnp.maximum(jnp.sum(Ut_y * Ut_y / d), 1e-30)
        crit = jnp.sum(wU * jnp.log(jnp.maximum(d, 1e-30))) + m * jnp.log(quad)
        return pred, gamma, crit

    preds, gammas, crit = jax.vmap(per_r)(ratios)
    return preds, gammas, crit


@partial(jax.jit, static_argnames=("kind",))
def _solve_folds_single(K, y, W, grid, kind: str):
    solver = _fold_solve if kind == "ridge" else _fold_solve_gblup
    return jax.vmap(lambda w: solver(K, y, w, grid))(W)


@partial(jax.jit, static_argnames=("kind", "mesh", "axis"))
def _solve_folds_meshed(K, y, W, grid, kind: str, mesh: Mesh, axis: str):
    solver = _fold_solve if kind == "ridge" else _fold_solve_gblup

    def kernel(K, y, Wl, grid):
        return jax.vmap(lambda w: solver(K, y, w, grid))(Wl)

    fn = shard_map(
        kernel, mesh=mesh,
        in_specs=(P(None, None), P(None), P(axis, None), P(None)),
        out_specs=(P(axis), P(axis), P(axis)),
    )
    return fn(K, y, W, grid)


def _solve_folds(K, y, W, grid, mesh: Optional[Mesh], kind: str):
    """Dispatch the fold batch: vmap on one device, or shard_map over the
    mesh's 'dp' axis with folds partitioned across devices.

    Both paths go through module-level jitted entry points so repeat calls
    hit the compile cache — a fresh `jax.jit(lambda ...)` closure per call
    recompiled the entire fold sweep every time (the first cvbulk_batched
    'warm' run at 2048 x 32768 spent ~200 s of its 209 s re-tracing)."""
    F, n = W.shape
    if mesh is None or np.prod(list(mesh.shape.values())) <= 1:
        preds, gammas, crit = _solve_folds_single(K, y, jnp.asarray(W), grid, kind)
        return np.asarray(preds), np.asarray(gammas), np.asarray(crit)
    # Shard folds over the LARGEST mesh axis: a ('dp','mp') mesh with dp=1
    # must still spread folds (ties break to mesh order).
    axis = max(mesh.shape, key=lambda a: mesh.shape[a])
    D = mesh.shape[axis]
    Fp = ((F + D - 1) // D) * D
    if Fp != F:  # pad with all-training dummy folds; results discarded
        W = np.concatenate([W, np.ones((Fp - F, n), dtype=W.dtype)], axis=0)
    preds, gammas, crit = _solve_folds_meshed(K, y, jnp.asarray(W), grid, kind, mesh, axis)
    return np.asarray(preds[:F]), np.asarray(gammas[:F]), np.asarray(crit[:F])


@jax.jit
def _lambda_max_device(X, y, w):
    """max_j |⟨x_j − x̄_j, y − ȳ⟩| over rows with w=1, plus the row count."""
    n_f = jnp.sum(w)
    mean_y = jnp.sum(w * y) / jnp.maximum(n_f, 1.0)
    ywc = w * (y - mean_y)  # Σ ywc = 0 ⇒ the x̄_j term vanishes
    return jnp.max(jnp.abs(jnp.dot(ywc, X, preferred_element_type=jnp.float32))), n_f


def _lasso_fold(X, y, w, lambdas, n_iter=300):
    """One LASSO fold: batched pathwise FISTA (ops/linalg) on the fold's
    training rows; GCV with active-set df for training-only λ selection.

    Returns (preds (L, n), B (p, L), crit (L,), b0 (L,))."""
    from ..ops import linalg as L

    n_tr = jnp.sum(w)
    mean_y = jnp.sum(w * y) / n_tr
    mean_x = jnp.sum(w[:, None] * X, axis=0) / n_tr
    Z = X - mean_x[None, :]
    yc = y - mean_y
    step = jnp.float32(1.0) / jnp.maximum(L._power_iter_lmax(w[:, None] * Z) / n_tr, 1e-12)
    B = L._lasso_fista_batch(Z, yc, w, lambdas, step, n_iter)  # (p, L)
    preds = mean_y + jnp.dot(Z, B, preferred_element_type=jnp.float32)  # (n, L)
    res_tr = ((y[:, None] - preds) * w[:, None]) ** 2
    mse = jnp.sum(res_tr, axis=0) / n_tr
    df = jnp.sum(jnp.abs(B) > 1e-8, axis=0).astype(jnp.float32)
    gcv = mse / jnp.maximum((1.0 - jnp.minimum(df, n_tr - 1.0) / n_tr) ** 2, 1e-6)
    b0 = mean_y - jnp.dot(mean_x, B)
    return preds.T, B, gcv, b0


@partial(jax.jit, static_argnames=("n_iter",))
def _lasso_folds_single(X, y, W, lambdas, n_iter: int = 300):
    return jax.vmap(lambda w: _lasso_fold(X, y, w, lambdas, n_iter=n_iter))(W)


@partial(jax.jit, static_argnames=("n_iter", "mesh", "axis"))
def _lasso_folds_meshed(X, y, W, lambdas, mesh: Mesh, axis: str, n_iter: int = 300):
    def kernel(X, y, Wl, lambdas):
        return jax.vmap(lambda w: _lasso_fold(X, y, w, lambdas, n_iter=n_iter))(Wl)

    fn = shard_map(
        kernel, mesh=mesh,
        in_specs=(P(None, None), P(None), P(axis, None), P(None)),
        out_specs=(P(axis), P(axis), P(axis), P(axis)),
    )
    return fn(X, y, W, lambdas)


def _lasso_folds(X, y, W, lambdas, mesh: Optional[Mesh]):
    """Dispatch the whole lasso fold batch: vmapped FISTA in ONE program on a
    single device, or folds partitioned over the mesh's 'dp' axis — the same
    shape as `_solve_folds` (ridge/gblup), so lasso folds now cross the mesh
    too instead of looping per fold on one device."""
    F, n = W.shape
    if mesh is None or np.prod(list(mesh.shape.values())) <= 1:
        preds, B, crit, b0 = _lasso_folds_single(X, y, jnp.asarray(W), lambdas)
        return np.asarray(preds), np.asarray(B), np.asarray(crit), np.asarray(b0)
    # Shard folds over the LARGEST mesh axis: a ('dp','mp') mesh with dp=1
    # must still spread folds (ties break to mesh order).
    axis = max(mesh.shape, key=lambda a: mesh.shape[a])
    D = mesh.shape[axis]
    Fp = ((F + D - 1) // D) * D
    if Fp != F:  # pad with all-training dummy folds; results discarded
        W = np.concatenate([W, np.ones((Fp - F, n), dtype=W.dtype)], axis=0)
    preds, B, crit, b0 = _lasso_folds_meshed(X, y, jnp.asarray(W), lambdas, mesh, axis)
    return np.asarray(preds[:F]), np.asarray(B[:F]), np.asarray(crit[:F]), np.asarray(b0[:F])


def cvbulk_batched(
    genomes: Genomes,
    phenomes: Phenomes,
    models: Sequence[str] = ("ridge",),
    n_replications: int = 5,
    n_folds: int = 5,
    seed: int = 42,
    lambdas: Optional[Sequence[float]] = None,
    store_effects: bool = True,
    mesh: Optional[Mesh] = None,
    mcmc_n_iter: Optional[int] = None,
    mcmc_n_burnin: Optional[int] = None,
    verbose: bool = False,
) -> Tuple[List[CV], List[str]]:
    """Replicated k-fold CV, fully batched on device, fold axis over the mesh.

    `models` ⊆ BATCHED_MODELS. Returns the same (cvs, notes) surface as
    `cvbulk`; each CV's fit carries the fold's chosen λ (or variance ratio)
    in `extras` and (with `store_effects`) marker effects in `b_hat` so
    `predict` works. Pass `mesh=Mesh(jax.devices(), ('dp',))` to spread
    folds across devices (ridge, gblup, AND lasso dispatch the fold batch
    the same way). Bayesian models run as vmapped row-masked Gibbs chains —
    one XLA program per (trait, model) covering every (replication, fold) —
    currently on a single device (`mcmc_n_iter`/`mcmc_n_burnin` override the
    config chain length for CV sweeps).
    """
    for m in models:
        if m not in BATCHED_MODELS:
            raise ValueError(
                f"{m!r} is not a batched CV model; choose from {BATCHED_MODELS} "
                "(use cvbulk for the full model zoo)"
            )
    _common_checks(genomes, phenomes, ["ridge"])
    n, p = genomes.allele_frequencies.shape
    if not (1 <= n_folds <= n):
        raise ValueError(f"n_folds={n_folds} out of bounds (1..{n})")
    if not (1 <= n_replications <= 100):
        raise ValueError(f"n_replications={n_replications} out of bounds (1..100)")
    if lambdas is None:
        lambdas = np.logspace(-4, 1, 12)
    lambdas_j = jnp.asarray(np.asarray(lambdas, dtype=np.float32))

    # Per-stage wall-clock attribution (VERDICT r04 weak-item 1: the cv
    # bench number regressed with nothing inside it attributable). The last
    # run's timer is exposed module-level for the bench's `# cv stages` note.
    global LAST_TIMER
    timer = LAST_TIMER = StageTimer()

    with timer.stage("h2d+gram"):
        # Device panel + Gram cached across calls on the same host panel
        # (single slot, fingerprint-keyed): the upload was the warm-run's
        # dominant cost through the tunnel (7.1 s of 15.2 s measured).
        fp = host_fingerprint(genomes.allele_frequencies)
        hit = _PANEL_CACHE.get(fp)
        if hit is None:
            X = jnp.asarray(genomes.allele_frequencies, jnp.float32)
            K, Z = _gram(X)
            tr_scale = float(jnp.trace(K)) / n  # gblup ratio grid scale
            hit = _PANEL_CACHE.put(fp, (X, K, Z, tr_scale))
        X, K, Z, tr_scale = hit
    ratio_grid = jnp.asarray(tr_scale * np.logspace(-3.0, 3.0, 13), jnp.float32)

    cvs: List[CV] = []
    notes: List[str] = []
    rng = np.random.default_rng(seed)  # one stream: fold labels match cvbulk

    for idx_trait, trait in enumerate(phenomes.traits.tolist()):
        phi = np.asarray(phenomes.phenotypes[:, idx_trait], dtype=np.float64)
        finite = np.isfinite(phi)
        # Build ALL (replication, fold) masks for this trait up front: the
        # whole sweep is then F = reps × folds device problems in one batch.
        w_list, v_list, tags = [], [], []
        for i in range(1, n_replications + 1):
            fold_labels = rng.integers(1, n_folds + 1, size=n)
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
                tags.append((f"replication_{i}", f"fold_{j}"))
        if not w_list:
            continue
        cvs.extend(
            _run_models_on_masks(
                genomes, phi, str(trait), np.stack(w_list), np.stack(v_list),
                tags, models, X=X, K=K, Z=Z, lambdas=lambdas,
                lambdas_j=lambdas_j, ratio_grid=ratio_grid, mesh=mesh,
                store_effects=store_effects, seed=seed,
                mcmc_n_iter=mcmc_n_iter, mcmc_n_burnin=mcmc_n_burnin,
                timer=timer,
            )
        )
    return cvs, notes


def _run_models_on_masks(
    genomes, phi, trait, W, V, tags, models, *, X, K, Z, lambdas, lambdas_j,
    ratio_grid, mesh, store_effects, seed, mcmc_n_iter, mcmc_n_burnin,
    timer=None,
) -> List[CV]:
    """Run every model over one batch of (train, val) mask pairs.

    The shared engine behind `cvbulk_batched` and the batched population CV
    modes: a "fold" is ANY {0,1} training/validation mask pair, so the same
    masked-Gram / FISTA / row-masked-Gibbs machinery serves replicated
    k-fold, pairwise-population, and leave-one-population-out sweeps. `tags`
    carries the (replication, fold) strings verbatim into the CV structs.
    """
    finite = np.isfinite(phi)
    y = jnp.asarray(np.where(finite, phi, 0.0), jnp.float32)
    cvs: List[CV] = []
    lasso_lams = None
    timer = timer if timer is not None else StageTimer()
    for model in models:
        if model in _GIBBS_MODEL_KEYS:
            from ..models.bayesian import gibbs_cv_folds

            with timer.stage(f"{model}_solve"):
                mus, betas = gibbs_cv_folds(
                    np.asarray(genomes.allele_frequencies, dtype=np.float32),
                    np.asarray(y), W, model=_GIBBS_MODEL_KEYS[model],
                    n_iter=mcmc_n_iter, n_burnin=mcmc_n_burnin, seed=seed,
                    mesh=mesh,
                )
            with timer.stage(f"{model}_emit"):
                preds_g = mus[None, :] + np.asarray(
                    genomes.allele_frequencies, dtype=np.float64
                ) @ betas.T.astype(np.float64)  # (n, F) -> below indexed [:, f]
                for f, (rep, fold) in enumerate(tags):
                    cvs.append(
                        _emit_gibbs(
                            genomes, phi, W[f], V[f], preds_g[:, f],
                            float(mus[f]), betas[f], model, trait, rep, fold,
                            store_effects,
                        )
                    )
        elif model in ("ridge", "gblup"):
            grid = lambdas_j if model == "ridge" else ratio_grid
            grid_np = np.asarray(lambdas) if model == "ridge" else np.asarray(ratio_grid, dtype=np.float64)
            # _solve_folds returns np arrays, so the stage includes the
            # device solve AND its d2h readback.
            with timer.stage(f"{model}_solve"):
                preds, gammas, crit = _solve_folds(K, y, W, grid, mesh, model)
            with timer.stage(f"{model}_emit"):
                best = np.argmin(crit, axis=1)
                for f, (rep, fold) in enumerate(tags):
                    cvs.append(
                        _emit_dual(
                            genomes, phi, W[f], V[f], preds[f, best[f]],
                            gammas[f, best[f]], Z, model, trait, rep, fold,
                            float(grid_np[best[f]]), store_effects,
                        )
                    )
        else:  # lasso
            if lasso_lams is None:
                # glmnet-style λ grid computed ON DEVICE from the already-
                # resident panel: λ_max = max_j |⟨x_j − x̄_j, y − ȳ⟩| / n
                # over the finite rows (identical semantics to
                # ops.linalg.make_lambda_grid — the weighted-centered GEMV
                # makes the x̄_j term vanish). The old host path re-sliced
                # and upcast the panel to f64 for one GEMV on 2 cores.
                with timer.stage("lasso_grid"):
                    w_fin = jnp.asarray(finite.astype(np.float32))
                    lam_max, n_f = _lambda_max_device(X, y, w_fin)
                    lm = max(float(lam_max) / max(float(n_f), 1.0), 1e-12)
                    lasso_lams = jnp.asarray(
                        np.logspace(np.log10(lm), np.log10(lm * 0.01), 16),
                        jnp.float32,
                    )
            with timer.stage("lasso_solve"):
                preds_l, B_l, crit_l, b0_l = _lasso_folds(X, y, W, lasso_lams, mesh)
            with timer.stage("lasso_emit"):
                best_l = np.argmin(crit_l, axis=1)
                for f, (rep, fold) in enumerate(tags):
                    bidx = int(best_l[f])
                    cvs.append(
                        _emit_lasso(
                            genomes, phi, W[f], V[f],
                            np.asarray(preds_l[f, bidx], dtype=np.float64),
                            np.asarray(B_l[f, :, bidx], dtype=np.float64),
                            float(b0_l[f, bidx]), trait, rep, fold,
                            float(np.asarray(lasso_lams)[bidx]), store_effects,
                        )
                    )
    return cvs


def _emit_dual(genomes, phi, w, v, pred, gamma, Z, model, trait, rep, fold, lam, store_effects):
    """Assemble Fit+CV for a dual-form (ridge/gblup) fold solution."""
    pred = np.asarray(pred, dtype=np.float64)
    rows = np.flatnonzero(v > 0)
    tr_rows = np.flatnonzero(w > 0)
    if store_effects:
        gamma = np.asarray(gamma, dtype=np.float64)
        wf = np.asarray(w, dtype=np.float64)
        Zn = np.asarray(Z, dtype=np.float64)
        beta = Zn.T @ (wf * gamma)
        mean_y = float((wf * phi).sum() / wf.sum())
        b0 = mean_y - float(
            np.asarray(genomes.allele_frequencies, dtype=np.float64).mean(axis=0) @ beta
        )
        b_hat = np.concatenate([[b0], beta])
        labels = np.concatenate([np.asarray(["intercept"], dtype=object), genomes.loci_alleles])
    else:
        b_hat = np.zeros(1)
        labels = np.asarray(["intercept"], dtype=object)
    fit = Fit(
        model=model,
        b_hat=b_hat,
        b_hat_labels=labels,
        trait=trait,
        entries=genomes.entries[tr_rows],
        populations=genomes.populations[tr_rows],
        y_true=phi[tr_rows],
        y_pred=pred[tr_rows],
        metrics=metrics(phi[tr_rows], pred[tr_rows]),
        extras={"lambda": lam, "engine": "batched" if model == "ridge" else "batched-reml"},
    )
    return CV(
        replication=rep,
        fold=fold,
        fit=fit,
        validation_populations=genomes.populations[rows],
        validation_entries=genomes.entries[rows],
        y_true=phi[rows],
        y_pred=pred[rows],
        metrics=metrics(phi[rows], pred[rows]),
    )


def _emit_gibbs(genomes, phi, w, v, pred, mu, beta, model, trait, rep, fold, store_effects):
    """Assemble Fit+CV for a fold-batched Gibbs posterior-mean solution."""
    pred = np.asarray(pred, dtype=np.float64)
    rows = np.flatnonzero(v > 0)
    tr_rows = np.flatnonzero(w > 0)
    if store_effects:
        b_hat = np.concatenate([[mu], np.asarray(beta, dtype=np.float64)])
        labels = np.concatenate([np.asarray(["intercept"], dtype=object), genomes.loci_alleles])
    else:
        b_hat = np.zeros(1)
        labels = np.asarray(["intercept"], dtype=object)
    fit = Fit(
        model=model,
        b_hat=b_hat,
        b_hat_labels=labels,
        trait=trait,
        entries=genomes.entries[tr_rows],
        populations=genomes.populations[tr_rows],
        y_true=phi[tr_rows],
        y_pred=pred[tr_rows],
        metrics=metrics(phi[tr_rows], pred[tr_rows]),
        extras={"engine": "batched-gibbs"},
    )
    return CV(
        replication=rep,
        fold=fold,
        fit=fit,
        validation_populations=genomes.populations[rows],
        validation_entries=genomes.entries[rows],
        y_true=phi[rows],
        y_pred=pred[rows],
        metrics=metrics(phi[rows], pred[rows]),
    )


def _emit_lasso(genomes, phi, w, v, pred, beta, b0, trait, rep, fold, lam, store_effects):
    rows = np.flatnonzero(v > 0)
    tr_rows = np.flatnonzero(w > 0)
    if store_effects:
        b_hat = np.concatenate([[b0], beta])
        labels = np.concatenate([np.asarray(["intercept"], dtype=object), genomes.loci_alleles])
    else:
        b_hat = np.zeros(1)
        labels = np.asarray(["intercept"], dtype=object)
    fit = Fit(
        model="lasso",
        b_hat=b_hat,
        b_hat_labels=labels,
        trait=trait,
        entries=genomes.entries[tr_rows],
        populations=genomes.populations[tr_rows],
        y_true=phi[tr_rows],
        y_pred=pred[tr_rows],
        metrics=metrics(phi[tr_rows], pred[tr_rows]),
        extras={"lambda": lam, "engine": "batched"},
    )
    return CV(
        replication=rep,
        fold=fold,
        fit=fit,
        validation_populations=genomes.populations[rows],
        validation_entries=genomes.entries[rows],
        y_true=phi[rows],
        y_pred=pred[rows],
        metrics=metrics(phi[rows], pred[rows]),
    )
