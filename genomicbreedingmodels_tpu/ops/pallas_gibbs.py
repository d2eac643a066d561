"""Pallas TPU kernel for the grouped BayesB/C indicator block update.

The XLA formulation of the grouped 2^K-pattern draw (models/bayesian.py) is
bound by per-op dispatch latency: the within-block scan over marker groups is
inherently sequential, and each tiny group step (a few K-sized contractions,
an argmax over 2^K patterns, a K-dim Gaussian draw) costs ~50-60 us of
serialized HLO dispatch on TPU regardless of its ~16 kFLOP body. Measured at
n=2048, p=32768: 95k marker-updates/s for the scalar scan, 121-133k for the
XLA grouped scan — far from the hardware's ability.

This kernel runs ONE BLOCK's entire update in a single Pallas launch:

1. **Hoisted pattern factorizations, lane-parallel.** P(gamma) =
   (C_gg ∘ γγᵀ)/σ²ₑ + diag(γ/s² + (1−γ)) depends only on the Gram diagonal
   blocks, σ²ₑ, s², and validity — all fixed within a sweep. All
   G × 2^K K×K Cholesky factors, their explicit inverses L⁻¹, and every
   residual-independent term of the pattern log-weight are computed in a
   LANE-MAJOR (K, K, G·2^K) layout: the tiny-matrix algebra runs as
   fully-populated (8, lanes) VPU ops instead of tile-padded (m, K, K)
   batches, and the K-step elimination is hand-unrolled (static K).
2. **Sequential group loop in VMEM.** A fori_loop over the G groups does,
   per group: the masked GLS vector v from the running correction, the
   pattern weights logw0 + 0.5‖L⁻¹v‖², an exact Gumbel-max pattern draw,
   the joint K-dim effect draw b = L⁻ᵀ(L⁻¹v + η), and the rank-K running
   correction update cdelta += dᵀC_rows — ~20 small VMEM-resident ops with
   no per-step dispatch or HBM traffic on the critical path.

Exactness: identical update law to the XLA grouped path (the pair
(γ_g, b_g) is drawn from its exact full conditional given everything outside
the group — partially-collapsed blocked Gibbs), hence the same stationary
distribution as the one-marker-at-a-time scalar oracle. The kernel is tested
against a from-scratch f64 numpy oracle of the same update law in
tests/test_pallas_kernels.py (interpret mode: identical pattern selections,
draws match to f32 rounding).

**Deployment note (this environment):** through the axon remote-TPU tunnel
every pallas_call carries ~2.3 ms of FIXED launch overhead even when invoked
from inside a compiled lax.scan (measured: a 3-elementwise-op kernel costs
2.49 ms/call; 30 ops cost 4.1 ms), and in-kernel VPU throughput measures
~100x below the hardware's ability — so this kernel is 2-3x slower end-to-end
than the XLA grouped scan HERE, and is opt-in (indicator_update="pallas").
On a direct-attached TPU the same kernel replaces ~40 dispatch-bound HLO ops
per group step (~60 us each on the serialized scan path) with VMEM-resident
arithmetic, which is the speed-of-light design for this inherently
sequential sampler.

Replaces the per-marker loop of reference src/bayes.jl's BGLR delegation
(R's BGLR samples markers one at a time in C); the blocked/grouped design is
original to this TPU port.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["grouped_block_update"]


def _kernel(scal_ref, gum_ref, Cb_ref, u_ref, b_ref, s2_ref, val_ref, eta_ref,
            d_ref, bnew_ref, incl_ref,
            Linv_s, logw0_s, Mpos_s, cdelta_s, acc_s, Cgg_s, *, K: int, G: int, bs: int):
    import jax.experimental.pallas as pl

    n_pat = 1 << K
    lanes = G * n_pat
    sig_e2 = scal_ref[0, 0]
    log_pi = scal_ref[0, 1]
    log_1mpi = scal_ref[0, 2]
    inv_sig_e2 = 1.0 / sig_e2

    # ---- lane world: L = g * n_pat + m ------------------------------------
    Lm = jax.lax.broadcasted_iota(jnp.int32, (K, lanes), 1)
    km = jax.lax.broadcasted_iota(jnp.int32, (K, lanes), 0)
    # bit k of the pattern index m = L % n_pat; since n_pat = 2^K and k < K,
    # (L % n_pat >> k) & 1 == (L >> k) & 1.
    pat = ((Lm >> km) & 1).astype(jnp.float32)  # (K, lanes)
    # (G, K) marker vectors -> (K, lanes) with value[k, g*n_pat + m] = x[g, k]
    vt = val_ref[:].T  # (K, G)
    st = s2_ref[:].T
    val_lane = jnp.broadcast_to(vt[:, :, None], (K, G, n_pat)).reshape(K, lanes)
    s2_lane = jnp.broadcast_to(st[:, :, None], (K, G, n_pat)).reshape(K, lanes)
    Mpos = pat * val_lane
    Mpos_s[:, :] = Mpos

    # Gram diagonal blocks, broadcast per pattern lane: (K, K, lanes); also
    # staged per-group in Cgg_s for the sequential loop (Mosaic forbids
    # unaligned lane-dimension dynamic slices of Cb_ref, so the loop reads
    # the leading-dim-indexed copy instead).
    for g in range(G):
        blk = Cb_ref[g * K:(g + 1) * K, g * K:(g + 1) * K]  # (K, K) static
        Cgg_s[g, :, :] = blk
        acc_s[:, :, g * n_pat:(g + 1) * n_pat] = jnp.broadcast_to(
            blk[:, :, None], (K, K, n_pat)
        )
    # P(gamma) in acc; excluded coords are identity rows/cols.
    eye3 = (jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)).astype(jnp.float32)
    diag_term = jnp.where(Mpos > 0, 1.0 / s2_lane, 1.0)  # (K, lanes)
    acc_s[:, :, :] = (
        acc_s[:, :, :] * inv_sig_e2 * (Mpos[:, None, :] * Mpos[None, :, :])
        + eye3[:, :, None] * diag_term[:, None, :]
    )

    # ---- unrolled batched Cholesky + logdet (K static steps) --------------
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (K, lanes), 0)
    half_logdet = jnp.zeros((1, lanes), jnp.float32)
    cols = [None] * K
    for j in range(K):
        dj = jnp.maximum(acc_s[j, j:j + 1, :], 1e-30)  # (1, lanes)
        half_logdet = half_logdet + 0.5 * jnp.log(dj)
        rinv = jax.lax.rsqrt(dj)
        col = acc_s[:, j, :] * rinv  # (K, lanes); rows < j are stale
        # zero rows < j (they are not part of the remaining submatrix)
        col = jnp.where(row_ids >= j, col, 0.0)
        acc_s[:, :, :] = acc_s[:, :, :] - col[:, None, :] * col[None, :, :]
        cols[j] = col
    # L lower-triangular, column j = cols[j]

    # ---- unrolled forward substitution: Linv = L^-1 ------------------------
    # Linv[i, :] = (e_i - L[i, :i] @ Linv[:i, :]) / L[i, i]
    # L[i, j] = cols[j][i]; store rows into Linv_s.
    for i in range(K):
        contrib = jnp.zeros((K, lanes), jnp.float32)
        for j in range(i):
            # L[i, j] scalar per lane: cols[j][i:i+1, :] -> (1, lanes)
            contrib = contrib + cols[j][i:i + 1, :] * Linv_s[j, :, :]
        ei = (jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0) == i).astype(jnp.float32)
        Linv_s[i, :, :] = (ei - contrib) / cols[i][i:i + 1, :]
    # Linv_s[i, j, L] = (L^-1)[i, j] for lane L.

    # ---- residual-independent pattern log-weight (+ Gumbel) ----------------
    logw0_s[:, :] = (
        jnp.sum(Mpos, axis=0, keepdims=True) * log_pi
        + jnp.sum(val_lane * (1.0 - pat), axis=0, keepdims=True) * log_1mpi
        - 0.5 * jnp.sum(jnp.where(Mpos > 0, jnp.log(s2_lane), 0.0), axis=0, keepdims=True)
        - half_logdet
        - 1e30 * jnp.sum(pat * (1.0 - val_lane), axis=0, keepdims=True)
        + gum_ref[:, :]
    )

    # ---- sequential scan over groups ---------------------------------------
    # Mosaic forbids lane<->sublane reshapes, so the loop works entirely in
    # ROW space: per-group vectors are (1, K) rows, lane-axis selections use
    # dot_general contractions over the lane dimension, and the (1, bs) ->
    # (G, K) relayout of the running-correction update is a masked matmul
    # with constant selection matrices (M1 ⊙ upd) @ M2.
    cdelta_s[:, :] = jnp.zeros((G, K), jnp.float32)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, n_pat), 1)
    Lbs = jax.lax.broadcasted_iota(jnp.int32, (G, bs), 1)
    gsel = (Lbs // K == jax.lax.broadcasted_iota(jnp.int32, (G, bs), 0)
            ).astype(jnp.float32)  # (G, bs): M1[i, L] = [L//K == i]
    ksel = (jax.lax.broadcasted_iota(jnp.int32, (bs, K), 0) % K
            == jax.lax.broadcasted_iota(jnp.int32, (bs, K), 1)
            ).astype(jnp.float32)  # (bs, K): M2[L, j] = [L%K == j]

    def group_step(g, _):
        l0 = pl.multiple_of(g * n_pat, n_pat)
        u_g = u_ref[pl.ds(g, 1), :]  # (1, K)
        cd_g = cdelta_s[pl.ds(g, 1), :]
        b_cur = b_ref[pl.ds(g, 1), :]
        C_gg = Cgg_s[g, :, :]  # (K, K), symmetric
        # v = (u - cdelta + C_gg b_cur)/sig_e2; C_gg symmetric so the row-form
        # b_cur @ C_gg equals (C_gg b_cur)^T.
        v_row = (
            u_g - cd_g
            + jnp.dot(b_cur, C_gg, preferred_element_type=jnp.float32)
        ) * inv_sig_e2  # (1, K)
        M_g = Mpos_s[:, pl.ds(l0, n_pat)]  # (K, n_pat)
        w = jnp.zeros((K, n_pat), jnp.float32)
        for j in range(K):
            # vm_j = v_j * [gamma_j active]; v_j broadcast as a (1,1) scalar.
            w = w + Linv_s[:, j, pl.ds(l0, n_pat)] * (
                v_row[0:1, j:j + 1] * M_g[j:j + 1, :]
            )
        quad = jnp.sum(w * w, axis=0, keepdims=True)  # (1, n_pat)
        logw = logw0_s[:, pl.ds(l0, n_pat)] + 0.5 * quad
        m_star = jnp.argmax(logw)  # flat argmax over (1, n_pat)
        onehot = (lane_iota == m_star).astype(jnp.float32)  # (1, n_pat)
        lane_contract = (((1,), (1,)), ((), ()))
        gam = jax.lax.dot_general(  # (1, K)
            onehot, M_g, lane_contract, preferred_element_type=jnp.float32)
        w_sel = jax.lax.dot_general(  # (1, K)
            onehot, w, lane_contract, preferred_element_type=jnp.float32)
        Linv_sel = jnp.sum(
            Linv_s[:, :, pl.ds(l0, n_pat)] * onehot[None, :, :], axis=2
        )  # (K, K)
        rhs = w_sel + eta_ref[pl.ds(g, 1), :]  # (1, K)
        # b = L^-T rhs  =>  b_j = sum_i rhs_i Linv[i, j]  (row @ matrix)
        b_acc = jnp.dot(rhs, Linv_sel, preferred_element_type=jnp.float32)
        b_new = jnp.where(gam > 0, b_acc, 0.0)  # (1, K)
        d_row = b_new - b_cur  # (1, K)
        # running correction for the groups AFTER g (and harmlessly before):
        # cdelta[g', k'] += sum_k d_k * Cb[g*K+k, g'*K+k']
        Cb_rows = Cb_ref[pl.ds(pl.multiple_of(g * K, K), K), :]  # (K, bs)
        upd = jnp.dot(d_row, Cb_rows, preferred_element_type=jnp.float32)  # (1, bs)
        cdelta_s[:, :] = cdelta_s[:, :] + jnp.dot(
            gsel * upd, ksel, preferred_element_type=jnp.float32
        )
        d_ref[pl.ds(g, 1), :] = d_row
        bnew_ref[pl.ds(g, 1), :] = b_new
        incl_ref[pl.ds(g, 1), :] = (gam > 0).astype(jnp.float32)
        return 0

    jax.lax.fori_loop(0, G, group_step, 0)


@partial(jax.jit, static_argnames=("K", "interpret"))
def grouped_block_update(Cb, u, b_blk, s2_blk, val_blk, normals, gum,
                         sig_e2, pi_in, K: int = 8, interpret: bool = False):
    """One grouped BayesB/C block update as a single Pallas TPU kernel.

    Args:
      Cb: (bs, bs) block Gram X_bT X_b. u: (bs,) X_bT r at block start.
      b_blk/s2_blk/val_blk/normals: (bs,) current effects, per-marker prior
        variances, validity mask, pre-drawn N(0,1).
      gum: (G, 2^K) pre-drawn Gumbel noise (G = bs // K).
      sig_e2, pi_in: scalars (residual variance, inclusion probability).

    Returns (delta, b_new, incl), each (bs,) f32 — same contract as the XLA
    grouped scan in models/bayesian.py:_gibbs_chain.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bs = Cb.shape[0]
    G = bs // K
    n_pat = 1 << K
    if n_pat % 128 != 0 and not interpret:
        # The lane-major (K, G, 2^K) -> (K, G*2^K) collapse requires whole
        # lane tiles per group: Mosaic rejects the shape cast when 2^K < 128
        # ("infer-vector-layout: unsupported shape cast", measured at K=6).
        # Callers (models/bayesian.py) round group_size to 8 on the pallas
        # path; direct users get the actionable error here.
        raise ValueError(
            f"grouped_block_update requires 2^K to be a multiple of 128 lanes "
            f"on TPU (K=7 or K=8); got K={K}. Use K=8 or the XLA grouped path."
        )
    lanes = G * n_pat
    # Scoped-VMEM budget: the two (K, K, lanes) scratch tables dominate and
    # the compiler's stack temporaries run ~2-3x past them — the default
    # 16 MB scope overflows beyond bs=448 at K=8 (measured 20.7 MB at
    # bs=512, and even bs=256 needs >10 MB with temporaries). Request a flat
    # generous scope: the kernel runs alone in its program region, and the
    # chip has 128 MB VMEM.
    vmem_limit = 96 * (1 << 20)
    scal = jnp.stack([sig_e2, jnp.log(pi_in), jnp.log1p(-pi_in), jnp.float32(0)]
                     ).astype(jnp.float32).reshape(1, 4)
    shp = jax.ShapeDtypeStruct((G, K), jnp.float32)
    kern = partial(_kernel, K=K, G=G, bs=bs)
    d, b_new, incl = pl.pallas_call(
        kern,
        out_shape=(shp, shp, shp),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # scal
            pl.BlockSpec(memory_space=pltpu.VMEM),   # gum (1, lanes)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # Cb
            pl.BlockSpec(memory_space=pltpu.VMEM),   # u (G, K)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b
            pl.BlockSpec(memory_space=pltpu.VMEM),   # s2
            pl.BlockSpec(memory_space=pltpu.VMEM),   # val
            pl.BlockSpec(memory_space=pltpu.VMEM),   # eta
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((K, K, lanes), jnp.float32),  # Linv
            pltpu.VMEM((1, lanes), jnp.float32),     # logw0
            pltpu.VMEM((K, lanes), jnp.float32),     # Mpos
            pltpu.VMEM((G, K), jnp.float32),         # cdelta
            pltpu.VMEM((K, K, lanes), jnp.float32),  # acc (Pm -> Schur)
            pltpu.VMEM((G, K, K), jnp.float32),      # Cgg blocks
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(lanes) * K * K * 12 + G * (n_pat * K * K * 2 + 2 * K * bs),
            bytes_accessed=(2 * K * K * lanes + bs * bs + 10 * bs) * 4,
            transcendentals=2 * int(lanes),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(
        scal,
        gum.reshape(1, lanes).astype(jnp.float32),
        Cb.astype(jnp.float32),
        u.reshape(G, K).astype(jnp.float32),
        b_blk.reshape(G, K).astype(jnp.float32),
        s2_blk.reshape(G, K).astype(jnp.float32),
        val_blk.reshape(G, K).astype(jnp.float32),
        normals.reshape(G, K).astype(jnp.float32),
    )
    return d.reshape(bs), b_new.reshape(bs), incl.reshape(bs)
