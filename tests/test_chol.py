"""Blocked Cholesky / blocked substitution (ops/chol.py) vs native XLA, and
the lower-triangle Gram composition (ops/grm.py:gram_dosage_lower)."""

import jax.numpy as jnp
import numpy as np
import pytest

from genomicbreedingmodels_tpu.ops.chol import (
    blocked_cho_solve,
    blocked_cholesky,
    gblup_solve_lower,
)
from genomicbreedingmodels_tpu.ops.grm import (
    center_gram,
    center_gram_lower,
    gram_dosage,
    gram_dosage_lower,
)


def _psd(n, seed=0):
    rng = np.random.default_rng(seed)
    B = rng.normal(size=(n, n + 8)).astype(np.float32)
    return (B @ B.T / n + np.eye(n, dtype=np.float32)).astype(np.float32)


@pytest.mark.parametrize("n,nb", [(256, 4), (100, 16), (128, 1), (96, 7)])
def test_blocked_cholesky_matches_native(n, nb):
    A = _psd(n)
    L = np.asarray(blocked_cholesky(jnp.asarray(A), nb=nb))
    L_ref = np.linalg.cholesky(A.astype(np.float64))
    assert np.allclose(L, L_ref, atol=5e-4 * np.abs(L_ref).max())
    assert np.allclose(np.tril(L), L)  # strictly lower-triangular output


def test_blocked_cholesky_reads_lower_triangle_only():
    A = _psd(192, seed=1)
    A_junk = A.copy()
    A_junk[np.triu_indices(192, 1)] = 777.0  # garbage upper triangle
    L1 = np.asarray(blocked_cholesky(jnp.asarray(A), nb=6))
    L2 = np.asarray(blocked_cholesky(jnp.asarray(A_junk), nb=6))
    assert np.array_equal(L1, L2)


@pytest.mark.parametrize("n,nb", [(256, 4), (100, 16)])
def test_blocked_cho_solve(n, nb):
    A = _psd(n, seed=2)
    rng = np.random.default_rng(3)
    y = rng.normal(size=n).astype(np.float32)
    x = np.asarray(blocked_cho_solve(jnp.asarray(A), jnp.asarray(y), nb=nb))
    x_ref = np.linalg.solve(A.astype(np.float64), y.astype(np.float64))
    assert np.allclose(x, x_ref, rtol=0, atol=2e-3 * np.abs(x_ref).max())


def test_gram_dosage_lower_matches_full():
    rng = np.random.default_rng(4)
    D = rng.integers(0, 3, size=(64, 512)).astype(np.int8)
    K = np.asarray(gram_dosage(jnp.asarray(D), ploidy=2))
    K_lo = np.asarray(gram_dosage_lower(jnp.asarray(D), ploidy=2))
    assert np.allclose(np.tril(K_lo), np.tril(K), atol=1e-5)


def test_center_gram_lower_matches_center_gram():
    rng = np.random.default_rng(5)
    X = rng.normal(size=(48, 96)).astype(np.float32)
    G = X @ X.T
    full = np.asarray(center_gram(jnp.asarray(G)))
    lo = np.asarray(center_gram_lower(jnp.asarray(np.tril(G))))
    assert np.allclose(np.tril(lo), np.tril(full), atol=1e-4 * np.abs(full).max())


def test_gblup_solve_lower_matches_dense():
    rng = np.random.default_rng(6)
    D = rng.integers(0, 3, size=(96, 1024)).astype(np.int8)
    y = rng.normal(size=96).astype(np.float32)
    lam = np.float32(0.1)
    K = np.asarray(gram_dosage(jnp.asarray(D), ploidy=2), dtype=np.float64)
    alpha = np.linalg.solve(K + lam * np.eye(96), y - y.mean())
    gebv_ref = K @ alpha + y.mean()
    K_lo = gram_dosage_lower(jnp.asarray(D), ploidy=2)
    gebv = np.asarray(gblup_solve_lower(K_lo, jnp.asarray(y), jnp.float32(lam), nb=6))
    assert np.allclose(gebv, gebv_ref, atol=2e-3 * np.abs(gebv_ref).max())
