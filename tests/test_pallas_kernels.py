"""Triangular Pallas GRM kernel (interpret mode on CPU; compiled on TPU)."""

import numpy as np
import pytest


@pytest.mark.parametrize(
    "n,p", [(64, 512), (100, 300), (300, 100), (129, 257)]
)
def test_grm_pallas_matches_dense(n, p):
    from genomicbreedingmodels_tpu.ops.pallas_kernels import grm_pallas

    rng = np.random.default_rng(0)
    X = rng.random((n, p)).astype(np.float32)
    Kp = np.asarray(grm_pallas(X))
    Z = X - X.mean(axis=0, keepdims=True)
    Kd = Z @ Z.T
    assert np.abs(Kp - Kd).max() < 1e-3
    # symmetric to a few ulps (XLA's excess-precision rewrites can leave the
    # mirrored triangles marginally apart; see ops/grm.py:center_gram)
    assert np.abs(Kp - Kp.T).max() < 1e-4


def test_tri_decode_bijection():
    from genomicbreedingmodels_tpu.ops.pallas_kernels import _tri_decode
    import jax.numpy as jnp

    nt = 64
    T = nt * (nt + 1) // 2
    t = jnp.arange(T)
    i, j = _tri_decode(t)
    i, j = np.asarray(i), np.asarray(j)
    assert ((0 <= j) & (j <= i) & (i < nt)).all()
    # bijective: every (i, j) pair hit exactly once
    assert len({(a, b) for a, b in zip(i.tolist(), j.tolist())}) == T


@pytest.mark.parametrize("n,p", [(64, 512), (100, 300), (129, 257)])
def test_grm_pallas_int8_matches_gram_dosage(n, p):
    """Exact int8 triangular kernel vs the XLA dosage path (both exact)."""
    from genomicbreedingmodels_tpu.ops.grm import gram_dosage
    from genomicbreedingmodels_tpu.ops.pallas_kernels import grm_pallas_int8

    rng = np.random.default_rng(1)
    D = rng.integers(0, 3, size=(n, p)).astype(np.int8)
    Kp = np.asarray(grm_pallas_int8(D, ploidy=2, tm=32, tk=128))
    Kd = np.asarray(gram_dosage(D, ploidy=2))
    assert np.abs(Kp - Kd).max() < 1e-4
