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


def test_grouped_block_update_matches_f64_oracle():
    """ops/pallas_gibbs.py grouped kernel (interpret mode) vs a from-scratch
    f64 numpy implementation of the exact same partially-collapsed update
    law: identical pattern selections and draws to f32 rounding, invalid
    markers pinned to zero."""
    import jax.numpy as jnp

    from genomicbreedingmodels_tpu.ops.pallas_gibbs import grouped_block_update

    rng = np.random.default_rng(0)
    K, bs, n = 8, 64, 40
    G = bs // K
    X = rng.normal(size=(n, bs)).astype(np.float32)
    Cb = (X.T @ X).astype(np.float32)
    u = rng.normal(size=bs).astype(np.float32) * 3
    b = (rng.normal(size=bs) * (rng.random(bs) < 0.3)).astype(np.float32)
    s2 = np.full(bs, 0.4, np.float32)
    val = np.ones(bs, np.float32)
    val[-3:] = 0.0
    eta = rng.normal(size=bs).astype(np.float32)
    gum = -np.log(-np.log(rng.random((G, 1 << K)).astype(np.float32) + 1e-12))
    sig_e2, pi_in = np.float32(0.8), np.float32(0.3)

    d, bn, incl = grouped_block_update(
        jnp.asarray(Cb), jnp.asarray(u), jnp.asarray(b), jnp.asarray(s2),
        jnp.asarray(val), jnp.asarray(eta), jnp.asarray(gum),
        jnp.float32(sig_e2), jnp.float32(pi_in), K=K, interpret=True,
    )
    d, bn, incl = np.asarray(d), np.asarray(bn), np.asarray(incl)
    assert np.all(bn[-3:] == 0)

    patterns = ((np.arange(1 << K)[:, None] >> np.arange(K)[None, :]) & 1).astype(np.float64)
    b_ref = b.astype(np.float64).copy()
    cdelta = np.zeros(bs)
    d_ref = np.zeros(bs)
    incl_ref = np.zeros(bs)
    Cb64, u64 = Cb.astype(np.float64), u.astype(np.float64)
    for g in range(G):
        r0 = g * K
        C_gg = Cb64[r0:r0 + K, r0:r0 + K]
        v = (u64[r0:r0 + K] - cdelta[r0:r0 + K] + C_gg @ b_ref[r0:r0 + K]) / sig_e2
        val_g, s2_g = val[r0:r0 + K].astype(np.float64), s2[r0:r0 + K].astype(np.float64)
        logws = np.zeros(1 << K)
        cand = []
        for m in range(1 << K):
            Mg = patterns[m] * val_g
            P = (C_gg / sig_e2) * np.outer(Mg, Mg) + np.diag(np.where(Mg > 0, 1 / s2_g, 1.0))
            L = np.linalg.cholesky(P)
            w = np.linalg.solve(L, np.where(Mg > 0, v, 0.0))
            logws[m] = (
                Mg.sum() * np.log(pi_in)
                + (val_g * (1 - patterns[m])).sum() * np.log1p(-pi_in)
                - 0.5 * np.sum(np.where(Mg > 0, np.log(s2_g), 0.0))
                - np.sum(np.log(np.diag(L))) + 0.5 * w @ w
                - 1e30 * np.sum(patterns[m] * (1 - val_g))
            )
            cand.append((L, w, Mg))
        L, w, Mg = cand[np.argmax(logws + gum[g])]
        b_new = np.where(Mg > 0, np.linalg.solve(L.T, w + eta[r0:r0 + K]), 0.0)
        dd = b_new - b_ref[r0:r0 + K]
        cdelta += dd @ Cb64[r0:r0 + K, :]
        d_ref[r0:r0 + K] = dd
        b_ref[r0:r0 + K] = b_new
        incl_ref[r0:r0 + K] = Mg > 0
    np.testing.assert_allclose(d, d_ref, atol=5e-6)
    np.testing.assert_allclose(bn, b_ref, atol=5e-6)
    assert np.all(incl_ref == incl)


def test_grouped_block_update_rejects_sub_lane_K_on_hardware():
    """2^K below one 128-lane tile (K<7) cannot be Mosaic-lowered (the
    lane-major pattern collapse is an unsupported shape cast); the kernel
    raises an actionable ValueError instead of a remote-compile HTTP 500.
    Interpret mode (the CPU test path) accepts any K."""
    import jax.numpy as jnp
    import pytest

    from genomicbreedingmodels_tpu.ops.pallas_gibbs import grouped_block_update

    K, bs = 6, 24
    G = bs // K
    args = (
        jnp.eye(bs), jnp.zeros(bs), jnp.zeros(bs), jnp.ones(bs),
        jnp.ones(bs), jnp.zeros(bs), jnp.zeros((G, 1 << K)),
        jnp.float32(1.0), jnp.float32(0.3),
    )
    with pytest.raises(ValueError, match="multiple of 128"):
        grouped_block_update(*args, K=K, interpret=False)
    # interpret mode still works at K=6 (exercised fully by the oracle test)
    d, bn, incl = grouped_block_update(*args, K=K, interpret=True)
    assert d.shape == (bs,)
