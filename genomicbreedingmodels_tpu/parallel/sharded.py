"""Multi-device sharded compute paths: GRM, RR-BLUP/GBLUP training step.

Design (BASELINE.json north star): the n x p SNP matrix is column-sharded
(markers) across devices; Gram partial products G_d = Z_d Z_dᵀ are formed
locally on each device's MXU and summed with `psum` over ICI; the n x n
mixed-model solve is replicated (it is tiny relative to the Gram work); marker
effects come back column-sharded with one local GEMM per device. The 'dp'
axis batches independent problems (traits / CV folds / MCMC chains).

All functions are shard_map'ed over an explicit Mesh so they run identically
on a real pod slice and on the 8-device virtual CPU mesh used in tests.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

__all__ = ["sharded_grm", "sharded_ridge_step", "gblup_train_step", "multitrait_gblup_step"]


def _local_centered(Xl: jnp.ndarray) -> jnp.ndarray:
    # Columns live wholly on one device, so centering is local.
    return Xl - jnp.mean(Xl, axis=0, keepdims=True)


def sharded_grm(X, mesh: Mesh) -> jnp.ndarray:
    """GRM numerator (centered Gram matrix) with marker sharding + psum.

    X: (n, p) sharded P(None, 'mp'). Returns replicated (n, n).
    """

    def kernel(Xl):
        Zl = _local_centered(Xl.astype(jnp.float32))
        Gl = jnp.dot(Zl, Zl.T, preferred_element_type=jnp.float32)
        return jax.lax.psum(Gl, axis_name="mp")

    fn = shard_map(
        kernel, mesh=mesh, in_specs=(P(None, "mp"),), out_specs=P()
    )
    return jax.jit(fn)(X)


def sharded_ridge_step(X, y, lam: float, mesh: Mesh) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One RR-BLUP training step over the mesh.

    Returns (b0 replicated, beta column-sharded over 'mp'). The dual system
    (K + nλI)γ = y_c is replicated; each device recovers its marker block with
    β_d = Z_dᵀ γ.
    """

    def kernel(Xl, y):
        n = y.shape[0]
        Zl = _local_centered(Xl.astype(jnp.float32))
        yc = y - jnp.mean(y)
        K = jax.lax.psum(jnp.dot(Zl, Zl.T, preferred_element_type=jnp.float32), "mp")
        gamma = jnp.linalg.solve(K + n * lam * jnp.eye(n, dtype=K.dtype), yc)
        beta_l = jnp.dot(Zl.T, gamma, preferred_element_type=jnp.float32)
        mean_xl = jnp.mean(Xl, axis=0)
        b0 = jnp.mean(y) - jax.lax.psum(jnp.dot(mean_xl, beta_l), "mp")
        return b0, beta_l

    fn = shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(None, "mp"), P()),
        out_specs=(P(), P("mp")),
        
    )
    return jax.jit(fn)(X, jnp.asarray(y, jnp.float32))


def gblup_train_step(X, y, lam: float, mesh: Mesh) -> jnp.ndarray:
    """Full GBLUP step: sharded GRM + replicated mixed-model solve + GEBV.

    GEBV = K (K/ p̄ + λI)⁻¹ y_c + ȳ with K the centered Gram (up to the GRM
    denominator, which cancels in the λ re-parameterization).
    """

    def kernel(Xl, y):
        n = y.shape[0]
        Zl = _local_centered(Xl.astype(jnp.float32))
        K = jax.lax.psum(jnp.dot(Zl, Zl.T, preferred_element_type=jnp.float32), "mp")
        p_total = jax.lax.psum(jnp.asarray(Xl.shape[1], jnp.float32), "mp")
        Kn = K / p_total
        yc = y - jnp.mean(y)
        alpha = jnp.linalg.solve(Kn + lam * jnp.eye(n, dtype=Kn.dtype), yc)
        gebv = Kn @ alpha + jnp.mean(y)
        return gebv

    fn = shard_map(
        kernel, mesh=mesh, in_specs=(P(None, "mp"), P()), out_specs=P()
    )
    return jax.jit(fn)(X, jnp.asarray(y, jnp.float32))


def multitrait_gblup_step(X, Y, lam: float, mesh: Mesh) -> jnp.ndarray:
    """Multi-trait GBLUP over the full ('dp', 'mp') mesh.

    X: (n, p) column-sharded over 'mp' (replicated over 'dp').
    Y: (t, n) trait-batch row-sharded over 'dp'.
    Each dp slice solves its traits against the shared (psum'd) GRM: this is
    the dryrun-validated multi-chip training step (dp x mp = data-parallel
    traits x marker-parallel Gram).
    """

    def kernel(Xl, Yl):
        n = Yl.shape[1]
        Zl = _local_centered(Xl.astype(jnp.float32))
        K = jax.lax.psum(jnp.dot(Zl, Zl.T, preferred_element_type=jnp.float32), "mp")
        p_total = jax.lax.psum(jnp.asarray(Xl.shape[1], jnp.float32), "mp")
        Kn = K / p_total
        A = Kn + lam * jnp.eye(n, dtype=Kn.dtype)
        Yc = Yl - jnp.mean(Yl, axis=1, keepdims=True)
        alpha = jnp.linalg.solve(A, Yc.T)  # (n, t_local)
        gebv = (Kn @ alpha).T + jnp.mean(Yl, axis=1, keepdims=True)
        return gebv

    fn = shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(None, "mp"), P("dp", None)),
        out_specs=P("dp", None),
        
    )
    return jax.jit(fn)(X, jnp.asarray(Y, jnp.float32))
