"""Device Gram-matrix ops (GRM hot path).

The (n x p) @ (p x n) Gram product is the single biggest dense-compute item in
the GWAS/GBLUP stack (reference hot spot: GRM build at src/gwas.jl:117-126,
O(n²p)). Here it is a blocked, jit-compiled matmul that streams marker blocks
from HBM so arbitrarily wide panels fit on one chip; f32 accumulation on the
MXU. A Pallas kernel variant and the multi-device column-sharded (psum over
ICI) build live in ops.pallas_kernels / parallel.sharded.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["gram_centered", "gram_centered_blocked", "gram_centered_device"]


@partial(jax.jit, static_argnames=("center",))
def _gram_full(X: jnp.ndarray, center: bool = True) -> jnp.ndarray:
    Xf = X.astype(jnp.float32)
    if center:
        Xf = Xf - jnp.mean(Xf, axis=0, keepdims=True)
    return jnp.dot(Xf, Xf.T, preferred_element_type=jnp.float32)


def gram_centered(X: np.ndarray, block_cols: int = 262_144) -> np.ndarray:
    """(X - colmean) @ (X - colmean)ᵀ, streamed over column blocks.

    Keeps at most `n x block_cols` floats resident; each block is one MXU
    matmul accumulated into the n x n output.
    """
    X = np.asarray(X)
    n, p = X.shape
    if p <= block_cols:
        return np.asarray(_gram_full(jnp.asarray(X)))
    out = np.zeros((n, n), dtype=np.float32)
    for start in range(0, p, block_cols):
        blk = jnp.asarray(X[:, start : start + block_cols])
        out += np.asarray(_gram_full(blk))
    return out


def gram_centered_blocked(X: np.ndarray, block_cols: int = 262_144) -> np.ndarray:
    return gram_centered(X, block_cols=block_cols)


def gram_centered_device(X, use_pallas: bool | None = None) -> jnp.ndarray:
    """Device-resident centered Gram: returns a jnp (n, n) f32 array.

    On TPU this dispatches to the triangular Pallas kernel (~1.4x the XLA
    GEMM — only lower tiles are computed or streamed); elsewhere it uses the
    fused XLA path. Input may be any float dtype; bf16 inputs keep the MXU at
    full rate.
    """
    X = jnp.asarray(X)
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"
    if use_pallas:
        from .pallas_kernels import grm_pallas

        return grm_pallas(X, interpret=False)
    return _gram_full(X)
