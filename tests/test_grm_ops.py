"""Triangular-blocked XLA GRM (ops/grm.py) vs dense reference."""

import numpy as np
import pytest


@pytest.mark.parametrize("n,nb", [(64, 4), (100, 3), (128, 8), (257, 4)])
def test_gram_triangular_matches_dense(n, nb):
    from genomicbreedingmodels_tpu.ops.grm import gram_triangular

    rng = np.random.default_rng(1)
    X = rng.random((n, 37)).astype(np.float32)
    K = np.asarray(gram_triangular(X, nb=nb))
    Z = X - X.mean(axis=0, keepdims=True)
    Kd = Z @ Z.T
    assert K.shape == (n, n)
    assert np.abs(K - Kd).max() < 1e-4


def test_gram_triangular_uncentered_and_default_nb():
    from genomicbreedingmodels_tpu.ops.grm import gram_triangular

    rng = np.random.default_rng(2)
    X = rng.random((96, 17)).astype(np.float32)
    K = np.asarray(gram_triangular(X, center=False))
    assert np.abs(K - X @ X.T).max() < 1e-4


def test_gram_centered_device_default_is_triangular():
    from genomicbreedingmodels_tpu.ops.grm import gram_centered_device

    rng = np.random.default_rng(3)
    X = rng.random((50, 20)).astype(np.float32)
    K = np.asarray(gram_centered_device(X))
    Z = X - X.mean(axis=0, keepdims=True)
    assert np.abs(K - Z @ Z.T).max() < 1e-4
