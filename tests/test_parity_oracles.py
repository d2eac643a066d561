"""f64 host-oracle parity suite (the BASELINE north star: GEBV cor >= 0.999
vs exact references).

Each oracle is an independent plain-numpy f64 implementation of the
reference backend's math:

- ridge: closed-form (ZᵀZ + nλI)⁻¹Zᵀy_c per λ — what glmnet(alpha=0)
  converges to (reference src/linear.jl:193-221 semantics, unpenalized
  intercept, no standardization);
- lasso: cyclic coordinate descent on (1/2n)‖y_c − Zb‖² + λ‖b‖₁ to 1e-10 —
  glmnet's own algorithm (reference src/linear.jl:333-360);
- BRR with pinned variances: the marker-effect posterior is exactly
  N((ZᵀZ/σ²ₑ + I/σ²_b)⁻¹Zᵀy/σ²ₑ, ·), so the sampler's posterior mean must
  converge at the 1/√T Monte-Carlo rate;
- gwasreml: dense-pinv evaluation of the reference REML objective
  (reference src/gwas.jl:464-482) with a shared θ-grid + per-marker pattern
  search — no GRM eigen-rotation anywhere in the oracle.
"""

import numpy as np
import pytest

import genomicbreedingmodels_tpu as gbm
from genomicbreedingmodels_tpu.ops import linalg as L


def _sim_xy(n, p, seed=5, h2=0.6, k=20):
    rng = np.random.default_rng(seed)
    X = rng.uniform(0.0, 1.0, size=(n, p))
    idx = rng.choice(p, min(k, p), replace=False)
    b = rng.normal(size=len(idx))
    g = X[:, idx] @ b
    g = (g - g.mean()) / g.std()
    y = np.sqrt(h2) * g + np.sqrt(1 - h2) * rng.normal(size=n)
    return X, y


# ---------------------------------------------------------------------------
# Ridge: closed-form f64 oracle
# ---------------------------------------------------------------------------


def _ridge_oracle(X, y, lam):
    """f64 closed-form ridge with unpenalized intercept (glmnet alpha=0)."""
    n, p = X.shape
    mx = X.mean(axis=0)
    Z = X - mx
    yc = y - y.mean()
    b = np.linalg.solve(Z.T @ Z + n * lam * np.eye(p), Z.T @ yc)
    b0 = y.mean() - mx @ b
    return b0, b


def test_ridge_beta_matches_f64_closed_form():
    X, y = _sim_xy(n=80, p=120, seed=5)
    b0_d, beta_d, info = L.ridge_cv_path(X, y, n_lambda=25, n_folds=5)
    lam = info["lambdas"][info["chosen"]]
    b0_o, beta_o = _ridge_oracle(X, y, lam)
    # Same λ ⇒ same solution up to the device's f32/bf16-Gram precision.
    assert np.corrcoef(beta_d, beta_o)[0, 1] > 0.999
    # GEBV parity — the BASELINE north-star invariant.
    yhat_d = b0_d + X @ beta_d
    yhat_o = b0_o + X @ beta_o
    assert np.corrcoef(yhat_d, yhat_o)[0, 1] >= 0.999
    assert abs(b0_d - b0_o) < 0.05 * max(1.0, abs(b0_o))


def test_ridge_lambda_choice_matches_f64_cv():
    """Replicate the fold masks and the reference's selection rule with the
    f64 oracle; the chosen λ must agree with the device path (±1 grid step
    for f32 loss ties)."""
    X, y = _sim_xy(n=80, p=120, seed=5)
    n_lambda, n_folds, seed = 25, 5, 42
    _, _, info = L.ridge_cv_path(X, y, n_lambda=n_lambda, n_folds=n_folds, seed=seed)
    lambdas = info["lambdas"]
    masks = L.make_fold_masks(len(y), n_folds, seed)

    sums = np.zeros(n_lambda)
    count = 0.0
    for f in range(n_folds):
        tr = masks[f].astype(bool)
        va = ~tr
        for i, lam in enumerate(lambdas):
            b0, b = _ridge_oracle(X[tr], y[tr], lam)
            pred = b0 + X[va] @ b
            sums[i] += np.sum((y[va] - pred) ** 2)
        count += va.sum()
    meanloss_o = sums / count
    order = np.argsort(meanloss_o, kind="stable")
    chosen_o = int(order[0])
    for i in order:
        _, b = _ridge_oracle(X, y, lambdas[i])
        if np.var(b, ddof=1) > 1e-10:
            chosen_o = int(i)
            break
    assert abs(info["chosen"] - chosen_o) <= 1
    # and the two loss curves agree closely
    rel = np.max(np.abs(info["meanloss"] - meanloss_o)) / np.max(meanloss_o)
    assert rel < 5e-3


# ---------------------------------------------------------------------------
# LASSO: f64 cyclic coordinate descent oracle (glmnet's algorithm)
# ---------------------------------------------------------------------------


def _cd_lasso_path(Z, yc, lambdas, tol=1e-10, max_sweeps=20_000):
    """Pathwise cyclic CD on (1/2n)‖yc − Zb‖² + λ‖b‖₁, warm starts, f64."""
    n, p = Z.shape
    col_sq = (Z * Z).sum(axis=0) / n
    B = np.zeros((p, len(lambdas)))
    b = np.zeros(p)
    r = yc.copy()
    for li, lam in enumerate(lambdas):
        for _ in range(max_sweeps):
            max_delta = 0.0
            for j in range(p):
                if col_sq[j] <= 0:
                    continue
                rho = Z[:, j] @ r / n + col_sq[j] * b[j]
                bj = np.sign(rho) * max(abs(rho) - lam, 0.0) / col_sq[j]
                d = bj - b[j]
                if d != 0.0:
                    r -= Z[:, j] * d
                    b[j] = bj
                    max_delta = max(max_delta, abs(d))
            if max_delta < tol:
                break
        B[:, li] = b
    return B


def test_lasso_path_matches_f64_cd():
    X, y = _sim_xy(n=60, p=150, seed=9)
    n_lambda = 20
    lambdas = L.make_lambda_grid(X, y, n_lambda=n_lambda, alpha=1.0)
    mx = X.mean(axis=0)
    Z = X - mx
    yc = y - y.mean()
    B_oracle = _cd_lasso_path(Z, yc, lambdas)

    import jax.numpy as jnp

    ones = jnp.ones(len(y), jnp.float32)
    step = 1.0 / float(
        np.linalg.eigvalsh(Z.T @ Z / len(y))[-1]
    )
    B_dev = np.asarray(
        L._lasso_fista_batch(
            jnp.asarray(Z, jnp.float32),
            jnp.asarray(yc, jnp.float32),
            ones,
            jnp.asarray(lambdas, jnp.float32),
            jnp.float32(step),
            400,
        ),
        dtype=np.float64,
    )
    scale = np.abs(B_oracle).max()
    assert np.abs(B_dev - B_oracle).max() < 2e-2 * scale
    # prediction parity at every λ on the path
    P_o = Z @ B_oracle
    P_d = Z @ B_dev
    for i in range(n_lambda):
        if P_o[:, i].std() < 1e-8:
            continue
        assert np.corrcoef(P_o[:, i], P_d[:, i])[0, 1] >= 0.999


def test_lasso_cv_choice_and_gebv_vs_oracle():
    X, y = _sim_xy(n=60, p=150, seed=9)
    n_lambda, n_folds, seed = 20, 5, 42
    b0_d, beta_d, info = L.lasso_cv_path(
        X, y, n_lambda=n_lambda, n_folds=n_folds, seed=seed, screen_factor=0
    )
    lambdas = info["lambdas"]
    masks = L.make_fold_masks(len(y), n_folds, seed)
    sums = np.zeros(n_lambda)
    count = 0.0
    for f in range(n_folds):
        tr = masks[f].astype(bool)
        va = ~tr
        mx = X[tr].mean(axis=0)
        my = y[tr].mean()
        B = _cd_lasso_path(X[tr] - mx, y[tr] - my, lambdas)
        pred = my + (X[va] - mx) @ B
        sums += np.sum((y[va][:, None] - pred) ** 2, axis=0)
        count += va.sum()
    meanloss_o = sums / count
    order = np.argsort(meanloss_o, kind="stable")
    mx = X.mean(axis=0)
    B_full = _cd_lasso_path(X - mx, y - y.mean(), lambdas)
    chosen_o = int(order[-1])
    for i in order:
        if np.var(B_full[:, i], ddof=1) > 1e-10:
            chosen_o = int(i)
            break
    assert abs(info["chosen"] - chosen_o) <= 1
    beta_o = B_full[:, chosen_o]
    b0_o = y.mean() - mx @ beta_o
    yhat_d = b0_d + X @ beta_d
    yhat_o = b0_o + X @ beta_o
    assert np.corrcoef(yhat_d, yhat_o)[0, 1] >= 0.999


# ---------------------------------------------------------------------------
# BRR with pinned variances: conjugate Gaussian posterior oracle
# ---------------------------------------------------------------------------


def test_brr_pinned_posterior_mean_converges():
    n, p = 60, 40
    X, y = _sim_xy(n=n, p=p, seed=13, k=10)
    sig_e2, sig_b2 = 0.5, 0.05
    Z = X - X.mean(axis=0)
    A = Z.T @ Z / sig_e2 + np.eye(p) / sig_b2
    b_star = np.linalg.solve(A, Z.T @ y / sig_e2)

    errs = {}
    for T in (250, 4000):
        mu_hat, b_hat, _ = gbm.gibbs_regression(
            X, y, model="BRR", n_iter=200 + T, n_burnin=200, seed=17,
            fix_sigma_e2=sig_e2, fix_sigma_b2=sig_b2,
        )
        errs[T] = np.linalg.norm(b_hat - b_star)
    # Monte-Carlo 1/√T rate: 4x the samples ⇒ ~2x smaller error.
    assert errs[4000] < errs[250]
    assert errs[4000] < 0.1 * np.linalg.norm(b_star)
    # GEBV parity at the long chain.
    mu_hat, b_hat, _ = gbm.gibbs_regression(
        X, y, model="BRR", n_iter=4200, n_burnin=200, seed=17,
        fix_sigma_e2=sig_e2, fix_sigma_b2=sig_b2,
    )
    yhat_s = mu_hat + X @ b_hat
    yhat_o = (y.mean() - X.mean(axis=0) @ b_star) + X @ b_star
    assert np.corrcoef(yhat_s, yhat_o)[0, 1] >= 0.999


# ---------------------------------------------------------------------------
# gwasreml: dense-pinv f64 oracle of the reference objective
# ---------------------------------------------------------------------------


def _ref_reml_neg_loglik(theta, y, Xf, K):
    """Reference objective via dense pinv (src/gwas.jl:464-482) — NO
    eigen-rotation."""
    n = len(y)
    V = theta[1] * K + theta[0] * np.eye(n)
    Vinv = np.linalg.pinv(V)
    XtVX = Xf.T @ Vinv @ Xf
    sign, logdet_x = np.linalg.slogdet(XtVX)
    if sign <= 0:
        return np.inf
    signv, logdet_v = np.linalg.slogdet(V)
    if signv <= 0:
        return np.inf
    XtVy = Xf.T @ Vinv @ y
    sol = np.linalg.solve(XtVX, XtVy)
    yPy = y @ Vinv @ y - XtVy @ sol
    return 0.5 * logdet_v + yPy + logdet_x


def _pattern_search(f, x0, lo, hi, scale0=0.5, n_scales=10):
    """Local 2-D pattern search in log10-θ (bounds-clipped)."""
    x = np.array(x0, dtype=np.float64)
    fx = f(x)
    step = scale0
    for _ in range(n_scales):
        improved = True
        while improved:
            improved = False
            for d in ((step, 0), (-step, 0), (0, step), (0, -step)):
                cand = np.clip(x + d, lo, hi)
                fc = f(cand)
                if fc < fx:
                    x, fx = cand, fc
                    improved = True
        step *= 0.5
    return x, fx


def _oracle_reml_z(y, G, K, marker_idx, grid_pts=20):
    """Per-marker REML z via shared dense-pinv θ grid + per-marker pattern
    search, all f64."""
    n = len(y)
    lg = np.linspace(-5.0, 0.0, grid_pts)
    thetas = [(10.0 ** a, 10.0 ** b) for a in lg for b in lg]
    # Shared-V trick (V is marker-independent): factor each V once.
    ones = np.ones(n)
    grid_vals = np.full((len(thetas), len(marker_idx)), np.inf)
    for ti, th in enumerate(thetas):
        V = th[1] * K + th[0] * np.eye(n)
        Vinv = np.linalg.pinv(V)
        signv, logdet_v = np.linalg.slogdet(V)
        if signv <= 0:
            continue
        Vy = Vinv @ y
        V1 = Vinv @ ones
        VG = Vinv @ G[:, marker_idx]
        for mi, j in enumerate(marker_idx):
            g = G[:, j]
            XtVX = np.array(
                [[ones @ V1, ones @ VG[:, mi]], [g @ V1, g @ VG[:, mi]]]
            )
            sign, logdet_x = np.linalg.slogdet(XtVX)
            if sign <= 0:
                continue
            XtVy = np.array([ones @ Vy, g @ Vy])
            sol = np.linalg.solve(XtVX, XtVy)
            yPy = y @ Vy - XtVy @ sol
            grid_vals[ti, mi] = 0.5 * logdet_v + yPy + logdet_x

    z_out = np.zeros(len(marker_idx))
    for mi, j in enumerate(marker_idx):
        Xf = np.stack([ones, G[:, j]], axis=1)
        t0 = thetas[int(np.argmin(grid_vals[:, mi]))]
        x0 = np.log10(np.asarray(t0))
        xopt, _ = _pattern_search(
            lambda x: _ref_reml_neg_loglik(10.0 ** x, y, Xf, K),
            x0, lo=-6.0, hi=0.0,
        )
        th = 10.0 ** xopt
        V = th[1] * K + th[0] * np.eye(n)
        Vinv = np.linalg.pinv(V)
        XtVX = Xf.T @ Vinv @ Xf
        cov_b = np.linalg.pinv(XtVX)
        b = cov_b @ (Xf.T @ Vinv @ y)
        z_out[mi] = b[-1] / np.sqrt(max(cov_b[-1, -1], 1e-30))
    return z_out


@pytest.mark.slow
def test_gwasreml_z_matches_f64_pinv_oracle(sim_small):
    genomes, phenomes, effects = sim_small
    sub = genomes.slice(idx_loci_alleles=np.arange(300))
    fit = gbm.gwasreml(genomes=sub, phenomes=phenomes)
    # f64 host prep (the public contract) feeds the oracle — this also pins
    # the device-prep/host-prep concordance (same standardization semantics).
    G, y, K, _ = gbm.gwasprep(sub, phenomes)
    # The reference's column-standardized K is (slightly) ASYMMETRIC; its V is
    # therefore not a proper covariance. Our REML path symmetrizes K before
    # the eigen-rotation (documented divergence, models/gwas.py) — the oracle
    # must optimize the same symmetric-V objective to be apples-to-apples.
    K = (K + K.T) / 2.0
    # markers: the 12 strongest device hits + 12 spread across the panel
    top = np.argsort(-np.abs(fit.b_hat))[:12]
    rest = np.linspace(0, G.shape[1] - 1, 12).astype(int)
    marker_idx = np.unique(np.concatenate([top, rest]))
    z_o = _oracle_reml_z(y, G, K, marker_idx)
    z_d = fit.b_hat[marker_idx]
    assert np.corrcoef(z_d, z_o)[0, 1] >= 0.999
    # the strongest oracle hit is the strongest device hit among the subset
    assert np.argmax(np.abs(z_d)) == np.argmax(np.abs(z_o))
