"""Prediction-accuracy metrics (reference src/metrics.jl:115-128).

The public `metrics` dict is computed in f64 on the host: these are O(n)
reductions (negligible next to any model fit) and the reference's CV
self-consistency invariant — across-entry cor equals per-entry-table cor to
1e-10 (src/cross_validation.jl:263-264) — is unreachable in f32. The fused
f32 `metrics_vector` jit remains for device-resident callers that fold the
metrics into a larger XLA program. Dict keys mirror the reference ("cor",
"mad", "msd", "rmsd", "nrmsd", "euc", "jac", "tvar", "h²", "r²") plus ASCII
aliases ("h2", "r2"). Zero-variance guards return 0.0 exactly as the
reference does (src/metrics.jl:25-27, :43-45, :75-77).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["metrics", "metrics_vector", "METRIC_NAMES", "pearson_correlation"]

METRIC_NAMES = ("cor", "mad", "msd", "rmsd", "nrmsd", "euc", "jac", "tvar", "h²", "r²")


def _var(x):
    # Sample variance (ddof=1) to match Julia's Statistics.var.
    n = x.shape[0]
    m = jnp.mean(x)
    return jnp.sum((x - m) ** 2) / jnp.maximum(n - 1, 1)


@jax.jit
def metrics_vector(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
    y_true = y_true.astype(jnp.float32)
    y_pred = y_pred.astype(jnp.float32)
    d = y_true - y_pred
    var_t = _var(y_true)
    var_p = _var(y_pred)
    var_d = _var(d)
    low_var = (var_t < 1e-10) | (var_p < 1e-10)

    mt, mp = jnp.mean(y_true), jnp.mean(y_pred)
    cov = jnp.sum((y_true - mt) * (y_pred - mp))
    denom = jnp.sqrt(jnp.sum((y_true - mt) ** 2) * jnp.sum((y_pred - mp) ** 2))
    cor = jnp.where(low_var, 0.0, cov / jnp.where(denom == 0, 1.0, denom))

    mad = jnp.mean(jnp.abs(d))
    msd = jnp.mean(d**2)
    rmsd = jnp.sqrt(msd)
    rng = jnp.max(y_true) - jnp.min(y_true)
    nrmsd = rmsd / jnp.where(rng == 0, 1.0, rng)
    euc = jnp.sqrt(jnp.sum(d**2))
    jac_den = jnp.sum(jnp.maximum(y_true, y_pred))
    jac = 1.0 - jnp.sum(jnp.minimum(y_true, y_pred)) / jnp.where(jac_den == 0, 1.0, jac_den)
    tvar = 0.5 * jnp.sum(jnp.abs(d))

    h2_den = var_p + var_d
    h2 = jnp.where(h2_den >= 1e-20, var_p / jnp.where(h2_den == 0, 1.0, h2_den), 0.0)
    h2 = jnp.clip(jnp.where(low_var, 0.0, h2), 0.0, 1.0)
    r2 = jnp.where(low_var, 0.0, 1.0 - var_d / jnp.where(var_t == 0, 1.0, var_t))
    return jnp.stack([cor, mad, msd, rmsd, nrmsd, euc, jac, tvar, h2, r2])


def metrics(y_true, y_pred) -> Dict[str, float]:
    """Dict of all metrics; mirrors reference `metrics` (src/metrics.jl:115).

    Computed in f64 on the host so the CV self-consistency invariant
    (src/cross_validation.jl:263-264, 1e-10) holds exactly.
    """
    y_true = np.asarray(y_true, dtype=np.float64)
    y_pred = np.asarray(y_pred, dtype=np.float64)
    if y_true.shape != y_pred.shape:
        raise ValueError("y_true and y_pred must have the same shape")
    n = y_true.shape[0]
    d = y_true - y_pred
    ddof = 1 if n > 1 else 0
    var_t = float(np.var(y_true, ddof=ddof))
    var_p = float(np.var(y_pred, ddof=ddof))
    var_d = float(np.var(d, ddof=ddof))
    low_var = (var_t < 1e-10) or (var_p < 1e-10)

    mt, mp = y_true.mean(), y_pred.mean()
    cov = float(np.sum((y_true - mt) * (y_pred - mp)))
    denom = float(np.sqrt(np.sum((y_true - mt) ** 2) * np.sum((y_pred - mp) ** 2)))
    cor = 0.0 if low_var else cov / (denom if denom != 0 else 1.0)

    mad = float(np.mean(np.abs(d)))
    msd = float(np.mean(d**2))
    rmsd = float(np.sqrt(msd))
    rng = float(y_true.max() - y_true.min()) if n else 0.0
    nrmsd = rmsd / (rng if rng != 0 else 1.0)
    euc = float(np.sqrt(np.sum(d**2)))
    jac_den = float(np.sum(np.maximum(y_true, y_pred)))
    jac = 1.0 - float(np.sum(np.minimum(y_true, y_pred))) / (jac_den if jac_den != 0 else 1.0)
    tvar = 0.5 * float(np.sum(np.abs(d)))

    h2_den = var_p + var_d
    h2 = var_p / (h2_den if h2_den != 0 else 1.0) if h2_den >= 1e-20 else 0.0
    h2 = min(max(0.0 if low_var else h2, 0.0), 1.0)
    r2 = 0.0 if low_var else 1.0 - var_d / (var_t if var_t != 0 else 1.0)
    out = dict(zip(METRIC_NAMES, (cor, mad, msd, rmsd, nrmsd, euc, jac, tvar, h2, r2)))
    out["h2"] = out["h²"]
    out["r2"] = out["r²"]
    return out


def pearson_correlation(y_true, y_pred) -> float:
    return metrics(y_true, y_pred)["cor"]
