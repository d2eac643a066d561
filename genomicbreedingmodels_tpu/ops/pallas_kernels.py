"""Pallas TPU kernels for the Gram-matrix (GRM) hot path.

Why a custom kernel when XLA's GEMM already runs near MXU peak:
1. **Symmetry**: K = Z Zᵀ is symmetric. A naive (i, j) grid with `pl.when`
   on the lower triangle skips the *compute* of upper tiles but still DMAs
   their operand blocks, and the op is HBM-bandwidth-bound — measured on
   TPU it ties plain XLA. This kernel instead enumerates ONLY the
   nt(nt+1)/2 lower-triangular tiles with a 1-D triangular grid whose
   index maps decode (i, j) from the linear tile id, so both the FLOPs
   and the HBM traffic are ~halved.
2. **Fused centering**: column means are subtracted as blocks stream
   HBM→VMEM, so no centered copy of the panel is ever materialized (the
   naive formulation needs a second panel-sized HBM buffer).

Grid: (t, k) with k (marker block) innermost, so each lower tile
accumulates across marker blocks in VMEM; (i, j) = tri⁻¹(t). Tiles are MXU
aligned; f32 accumulation via preferred_element_type.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["grm_pallas", "gram_tri_kernel"]


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _tri_decode(t):
    """Map linear lower-triangle tile id t -> (i, j), row-major within the
    triangle: t = i(i+1)/2 + j, 0 <= j <= i."""
    tf = t.astype(jnp.float32)
    i = ((jnp.sqrt(8.0 * tf + 1.0) - 1.0) * 0.5).astype(jnp.int32)
    # Guard float-sqrt rounding at tile-id boundaries.
    i = jnp.where((i + 1) * (i + 2) // 2 <= t, i + 1, i)
    i = jnp.where(i * (i + 1) // 2 > t, i - 1, i)
    j = t - i * (i + 1) // 2
    return i, j


def gram_tri_kernel(mu_ref, xi_ref, xj_ref, out_ref):
    """One lower-triangular (TM, TM) output tile of the centered Gram."""
    from jax.experimental import pallas as pl

    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

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

    n, p = X.shape
    nt = _cdiv(n, tm)
    grid = (nt * (nt + 1) // 2, _cdiv(p, tk))

    def mu_map(t, k):
        return (0, k)

    def xi_map(t, k):
        i, _ = _tri_decode(t)
        return (i, k)

    def xj_map(t, k):
        _, j = _tri_decode(t)
        return (j, k)

    def out_map(t, k):
        i, j = _tri_decode(t)
        return (i, j)

    lower = pl.pallas_call(
        gram_tri_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tk), mu_map),
            pl.BlockSpec((tm, tk), xi_map),
            pl.BlockSpec((tm, tk), xj_map),
        ],
        out_specs=pl.BlockSpec((tm, tm), out_map),
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        interpret=interpret,
    )(mu, X, X)
    # Upper-triangle tiles were never visited (their memory is undefined):
    # keep the lower triangle, mirror the strict part. lax.select inside
    # tril/triu masks out any garbage in unvisited tiles.
    lo = jnp.tril(lower)
    return lo + jnp.tril(lower, -1).T


def grm_pallas(X, tm: int = 512, tk: int = 2048, interpret: bool | None = None) -> jnp.ndarray:
    """Centered Gram matrix (X - colmean)(X - colmean)ᵀ via the triangular
    Pallas kernel.

    Pads n to the row-tile and p to the marker-block. Padded rows are set to
    the column mean so they center to exactly zero; padded columns are zero
    with zero mean. `interpret=None` auto-selects interpreter mode off-TPU so
    tests run on CPU.
    """
    X = jnp.asarray(X)
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    n, p = X.shape
    tm = min(tm, max(128, 1 << (n - 1).bit_length()))
    tk = min(tk, max(128, 1 << (p - 1).bit_length()))
    n_pad = _cdiv(n, tm) * tm
    p_pad = _cdiv(p, tk) * tk
    mu = jnp.mean(X, axis=0, keepdims=True, dtype=jnp.float32)
    if n_pad != n or p_pad != p:
        X = jnp.pad(X, ((0, n_pad - n), (0, p_pad - p)))
        mu = jnp.pad(mu, ((0, 0), (0, p_pad - p)))
        if n_pad != n:
            X = X.at[n:, :].set(jnp.broadcast_to(mu.astype(X.dtype), (n_pad - n, p_pad)))
    K = _grm_pallas_padded(X, mu, tm, tk, bool(interpret))
    return K[:n, :n]
