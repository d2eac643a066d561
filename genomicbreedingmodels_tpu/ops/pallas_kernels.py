"""Pallas TPU kernels for the Gram-matrix (GRM) hot path.

Why a custom kernel when XLA's GEMM already runs ~80% of MXU peak:
1. **Symmetry**: K = Z Zᵀ is symmetric; XLA computes all n² tile products.
   This kernel runs the MXU only on lower-triangular tiles (`pl.when`),
   cutting the dominant flop cost ~2x, then mirrors the result.
2. **Fused centering**: the column means are subtracted inside the kernel as
   blocks stream HBM→VMEM, so no centered copy of the panel is ever
   materialized (the naive formulation needs a second panel-sized buffer —
   which is what OOM-thrashed the 16 GB chip in bench v1).

Grid: (i, j, k) over row-tile x row-tile x marker-block, k innermost so each
(i, j) output tile accumulates across marker blocks in VMEM. Tiles are MXU
aligned (128 multiples); f32 accumulation via preferred_element_type.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["grm_pallas", "gram_lower_kernel"]


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def gram_lower_kernel(mu_ref, xi_ref, xj_ref, out_ref):
    """One (TM, TN) output tile of the centered Gram, lower triangle only."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    i, j, k = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(k == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    @pl.when(i >= j)
    def _():
        mu = mu_ref[0, :]
        zi = xi_ref[:, :].astype(jnp.float32) - mu[None, :]
        zj = xj_ref[:, :].astype(jnp.float32) - mu[None, :]
        out_ref[:, :] += jax.lax.dot_general(
            zi, zj,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


@functools.partial(jax.jit, static_argnames=("tm", "tk", "interpret"))
def _grm_pallas_padded(X, mu, tm: int, tk: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, p = X.shape
    grid = (_cdiv(n, tm), _cdiv(n, tm), _cdiv(p, tk))
    mem = pltpu.ANY if interpret else pltpu.VMEM
    lower = pl.pallas_call(
        gram_lower_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tk), lambda i, j, k: (0, k)),
            pl.BlockSpec((tm, tk), lambda i, j, k: (i, k)),
            pl.BlockSpec((tm, tk), lambda i, j, k: (j, k)),
        ],
        out_specs=pl.BlockSpec((tm, tm), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        interpret=interpret,
    )(mu, X, X)
    # Mirror the strict lower triangle onto the upper.
    return jnp.tril(lower) + jnp.tril(lower, -1).T


def grm_pallas(X, tm: int = 256, tk: int = 512, interpret: bool | None = None) -> jnp.ndarray:
    """Centered Gram matrix (X - colmean)(X - colmean)ᵀ via the Pallas kernel.

    Pads n to the row-tile and p to the marker-block (zero columns contribute
    zero after centering-by-their-own-mean, which is 0 for constant columns).
    `interpret=None` auto-selects interpreter mode off-TPU so tests run on CPU.
    """
    X = jnp.asarray(X)
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    n, p = X.shape
    tm = min(tm, max(128, 1 << (n - 1).bit_length()))
    n_pad = _cdiv(n, tm) * tm
    p_pad = _cdiv(p, tk) * tk
    mu = jnp.mean(X, axis=0, keepdims=True, dtype=jnp.float32)
    if n_pad != n or p_pad != p:
        X = jnp.pad(X, ((0, n_pad - n), (0, p_pad - p)))
        # Padded rows must not perturb the Gram: give them exactly the column
        # mean so they center to zero.
        if n_pad != n:
            X = X.at[n:, :].set(jnp.broadcast_to(mu.astype(X.dtype), (n_pad - n, p_pad)))
        mu = jnp.pad(mu, ((0, 0), (0, p_pad - p)))
    K = _grm_pallas_padded(X, mu, tm, tk, bool(interpret))
    return K[:n, :n]
