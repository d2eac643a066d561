"""Benchmark suite: GRM+GBLUP throughput plus the BASELINE.md target table.

Emits one JSON line per metric ({"metric", "value", "unit", "vs_baseline"}).
The HEADLINE metric — the driver parses the LAST line — is the fused
GRM+GBLUP step at 8192 x 262144 (same config as round 1, so vs_baseline is
the ratio to round 1's 21.8 GSNP/s). The supporting metrics cover the rest
of BASELINE.md's target table:

- north star: GRM+GBLUP at n=50_000 x p=500_000 (BASELINE.md "SNPs/s/chip
  ... at 50k x 500k"). The panel never exists whole anywhere: int8 dosage
  column shards are generated on device and accumulated into a donated f32
  (n x n) Gram via the panel-syrk schedule (exact: int32 panel products are
  integers < 2^24, losslessly representable in f32), then GBLUP solves by
  matrix-free CG — Cholesky would need a second 10 GB buffer the 16 GB chip
  does not have.
- Gibbs sampler marker-updates/s (BayesC, the BGLR replacement).
- GWAS-REML markers/s (the reference's O(p n^3) hot spot, rotated).
- cvbulk wall-clock: replicated k-fold CV via the batched fold-sharded
  engine (reference scheduler: src/cross_validation.jl:151-206).

Kernel notes for the 8192 headline: called-genotype diploid panels (dosages
{0,1,2} — what PLINK .bed decodes to) run the int8 dosage path
(ops/grm.py:gram_dosage): column-panel syrk with int8 operands and EXACT
int32 MXU accumulation. GBM_BENCH_BF16=1 switches to the continuous-panel
bf16 syrk (ops/grm.py:gram_panel); GBM_BENCH_PALLAS=1 to the triangular
Pallas kernel (ops/pallas_kernels.py).

Environment notes: under the axon TPU tunnel block_until_ready does not
synchronize — timing uses scalar readbacks; medians over repeats absorb the
tunnel's multi-10ms latency spikes.
"""

import json
import os
import time

R1_HEADLINE = 21_797_153_163.4  # round-1 BENCH value, same 8192x262144 config


def _sync(x) -> float:
    return float(x.reshape(-1)[0])


def _median_time(step, reps=5):
    step()  # warmup / compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        step()
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def emit(metric: str, value: float, unit: str, vs_baseline: float = 1.0) -> None:
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(float(value), 1),
                "unit": unit,
                "vs_baseline": round(float(vs_baseline), 3),
            }
        ),
        flush=True,
    )


# ---------------------------------------------------------------------------
# North star: 50k x 500k GRM + GBLUP, streamed int8 shards + CG
# ---------------------------------------------------------------------------


def bench_northstar(on_tpu: bool) -> None:
    import jax
    import jax.numpy as jnp
    from functools import partial

    if on_tpu:
        n, p_shard, n_shards, rng_chunks = 50_000, 31_250, 16, 5
    else:
        n, p_shard, n_shards, rng_chunks = 1_024, 2_048, 2, 2
    p = p_shard * n_shards
    nb = max(1, n // 2048)  # ~2048-row panels
    b = -(-n // nb)

    # Memory plan for the 16 GB chip: the Gram is stored as nb BLOCK-COLUMN
    # TRAPEZOID PIECES (piece j = rows j*b.., cols j*b..(j+1)*b — the lower
    # triangle only, ~5.4 GB at n=50k vs 10 GB square, 20 GB with the
    # defensive copy XLA inserts for an in-place slice-update of a donated
    # square buffer). Each shard update is then a pure elementwise add per
    # piece, which donation aliases cleanly. The int8 shard is 1.6 GB; its
    # RNG runs in chunks because jax.random materializes 4-byte random bits
    # per element (an unchunked 50k x 31k draw needs a 6.25 GB uint32 temp).
    bounds = []
    lo = 0
    while lo < n:
        bounds.append((lo, min(lo + b, n)))
        lo = min(lo + b, n)

    @partial(jax.jit, donate_argnums=(0,))
    def accumulate_shard(pieces, key):
        ck = jax.random.split(key, rng_chunks)
        cw = p_shard // rng_chunks
        D = jnp.concatenate(
            [jax.random.randint(ck[c], (n, cw), 0, 3, dtype=jnp.int8) for c in range(rng_chunks)],
            axis=1,
        )
        # Panel products are int32-exact and < 2^24, so the f32 accumulation
        # across shards is lossless.
        out = []
        for (lo, hi), piece in zip(bounds, pieces):
            panel = jnp.dot(D[lo:], D[lo:hi].T, preferred_element_type=jnp.int32)
            out.append(piece + panel.astype(jnp.float32))
        return out

    @partial(jax.jit, donate_argnums=(0,))
    def center_scale_pieces(pieces):
        # Double-centering from the trapezoid pieces: full row means =
        # rowsum + colsum - diag of the lower triangle (see ops/grm.py:
        # center_gram_lower). Each piece's diagonal block is masked to its
        # lower half first (the panel GEMM computed the full block).
        pieces = [
            jnp.concatenate(
                [jnp.tril(piece[: hi - lo]), piece[hi - lo :]], axis=0
            )
            / jnp.float32(4.0)  # ploidy^2
            for (lo, hi), piece in zip(bounds, pieces)
        ]
        rs = jnp.zeros(n, jnp.float32)
        cs = jnp.zeros(n, jnp.float32)
        dg = jnp.zeros(n, jnp.float32)
        for (lo, hi), piece in zip(bounds, pieces):
            rs = rs.at[lo:].add(jnp.sum(piece, axis=1))
            cs = cs.at[lo:hi].add(jnp.sum(piece, axis=0))
            dg = dg.at[lo:hi].set(jnp.diagonal(piece[: hi - lo]))
        rm = (rs + cs - dg) / n
        gm = jnp.mean(rm)
        out = []
        for (lo, hi), piece in zip(bounds, pieces):
            # The upper half of the diagonal block must STAY exactly zero
            # (the CG matvec multiplies the full piece), so the centering
            # correction is masked to the lower trapezoid.
            corr = rm[lo:, None] + rm[None, lo:hi] - gm
            w = hi - lo
            mask = jnp.concatenate(
                [jnp.tril(jnp.ones((w, w), jnp.float32)), jnp.ones((n - hi, w), jnp.float32)],
                axis=0,
            )
            out.append(piece - corr * mask)
        return out

    @partial(jax.jit, static_argnames=("iters",))
    def gblup_cg_pieces(pieces, y, iters=30):
        # CG on K = L + L^T - diag(L) straight from the pieces: per matvec,
        # piece j contributes its block-column (lower, incl. diagonal block)
        # and the mirror of its strictly-below-diagonal part.
        yc = y - jnp.mean(y)
        dg = jnp.concatenate(
            [jnp.diagonal(piece[: hi - lo]) for (lo, hi), piece in zip(bounds, pieces)]
        )
        lam = 1e-3 * jnp.sum(dg) / n

        def mv(v):
            # K v with K = L + L^T - diag(L): piece j contributes its block
            # column of L (rows lo..n) and, transposed, its block row of L^T
            # (covering both the within-diagonal-block upper entries and the
            # cross-block mirror); the diagonal, counted twice, is removed.
            out = lam * v - dg * v
            for (lo, hi), piece in zip(bounds, pieces):
                out = out.at[lo:].add(piece @ v[lo:hi])
                out = out.at[lo:hi].add(piece.T @ v[lo:])
            return out

        def loop_body(i, st):
            x, r, pvec, rs = st
            Ap = mv(pvec)
            alpha = rs / (pvec @ Ap)
            x = x + alpha * pvec
            r = r - alpha * Ap
            rs_new = r @ r
            pvec = r + (rs_new / rs) * pvec
            return (x, r, pvec, rs_new)

        x, r, _, _ = jax.lax.fori_loop(
            0, iters, loop_body, (jnp.zeros_like(yc), yc, yc, yc @ yc)
        )
        # GEBV = K alpha; K alpha = (A - lam I) alpha = yc - lam x
        return yc - lam * x + jnp.mean(y), jnp.sqrt(r @ r)

    keys = jax.random.split(jax.random.PRNGKey(7), n_shards + 1)
    y = jax.random.normal(keys[-1], (n,), dtype=jnp.float32)

    def run():
        t0 = time.perf_counter()
        pieces = [jnp.zeros((n - lo, hi - lo), jnp.float32) for lo, hi in bounds]
        for s in range(n_shards):
            pieces = accumulate_shard(pieces, keys[s])
        pieces = center_scale_pieces(pieces)
        gebv, resid = gblup_cg_pieces(pieces, y, iters=30)
        res = _sync(resid)
        _sync(gebv)
        return time.perf_counter() - t0, res

    run()  # compile warmup (donated buffers are rebuilt fresh each run)
    dt, res = run()
    snps_per_s = n * p / dt
    emit(
        f"north-star GRM+GBLUP SNPs/s/chip (n={n}, p={p}, streamed int8 shards + CG"
        f", resid={res:.1e})",
        snps_per_s,
        "SNPs/s",
    )


# ---------------------------------------------------------------------------
# Gibbs sampler throughput (the BGLR replacement)
# ---------------------------------------------------------------------------


def bench_sampler(on_tpu: bool) -> None:
    import numpy as np
    from genomicbreedingmodels_tpu.models.bayesian import gibbs_regression

    if on_tpu:
        n, p, n_iter, n_burnin = 2_048, 32_768, 250, 50
    else:
        n, p, n_iter, n_burnin = 128, 1_024, 60, 10
    rng = np.random.default_rng(0)
    X = rng.uniform(size=(n, p)).astype(np.float32)
    y = rng.normal(size=n).astype(np.float32)
    for model, label in (
        ("BayesC", "scalar-scan"),  # indicator prior: exact sequential scan
        ("BRR", "joint block draw"),  # continuous prior: one Cholesky per block
    ):
        # warmup/compile on a short chain with identical shapes
        gibbs_regression(X, y, model=model, n_iter=2, n_burnin=1, seed=1)
        t0 = time.perf_counter()
        gibbs_regression(X, y, model=model, n_iter=n_iter, n_burnin=n_burnin, seed=1)
        dt = time.perf_counter() - t0
        emit(
            f"{model} Gibbs marker-updates/s (n={n}, p={p}, {n_iter} sweeps, {label})",
            n_iter * p / dt,
            "updates/s",
        )


# ---------------------------------------------------------------------------
# GWAS-REML scan rate
# ---------------------------------------------------------------------------


def bench_gwas(on_tpu: bool) -> None:
    import numpy as np
    import genomicbreedingmodels_tpu as gbm

    if on_tpu:
        n, p = 2_048, 32_768
    else:
        n, p = 128, 512
    rng = np.random.default_rng(3)
    freq = rng.integers(0, 3, size=(n, p)).astype(np.float64) / 2.0
    genomes = gbm.Genomes(
        entries=np.array([f"e{i:05d}" for i in range(n)]),
        populations=np.array(["pop_1"] * n),
        loci_alleles=np.array([f"chr1\t{i}\tA|T\tA" for i in range(p)]),
        allele_frequencies=freq,
    )
    phen = rng.normal(size=(n, 1))
    phenomes = gbm.Phenomes(
        entries=genomes.entries,
        populations=genomes.populations,
        traits=np.array(["t"]),
        phenotypes=phen,
    )
    gbm.gwasreml(genomes=genomes, phenomes=phenomes)  # compile warmup
    t0 = time.perf_counter()
    fit = gbm.gwasreml(genomes=genomes, phenomes=phenomes)
    dt = time.perf_counter() - t0
    assert np.all(np.isfinite(fit.b_hat))
    emit(
        f"GWAS-REML markers/s incl. GRM+eigh (n={n}, p={p}, per-marker 2-VC REML, warm)",
        len(fit.b_hat) / dt,
        "markers/s",
    )


# ---------------------------------------------------------------------------
# CV wall-clock (replicated k-fold, batched fold-sharded engine)
# ---------------------------------------------------------------------------


def bench_cv(on_tpu: bool) -> None:
    import numpy as np
    import genomicbreedingmodels_tpu as gbm
    from genomicbreedingmodels_tpu.cv.batched import cvbulk_batched

    if on_tpu:
        n, p, n_replications, n_folds = 2_048, 32_768, 5, 5
    else:
        n, p, n_replications, n_folds = 128, 1_024, 2, 3
    rng = np.random.default_rng(11)
    freq = rng.uniform(size=(n, p))
    genomes = gbm.Genomes(
        entries=np.array([f"e{i:05d}" for i in range(n)]),
        populations=np.array(["pop_1"] * n),
        loci_alleles=np.array([f"chr1\t{i}\tA|T\tA" for i in range(p)]),
        allele_frequencies=freq,
    )
    beta = rng.normal(size=p) * (rng.uniform(size=p) < 0.01)
    yy = freq @ beta
    yy = yy + rng.normal(size=n) * yy.std()
    phenomes = gbm.Phenomes(
        entries=genomes.entries,
        populations=genomes.populations,
        traits=np.array(["t"]),
        phenotypes=yy[:, None],
    )
    cvbulk_batched(  # compile warmup (fold-mask shapes match the timed run)
        genomes, phenomes, models=("ridge", "gblup"),
        n_replications=n_replications, n_folds=n_folds, store_effects=False,
    )
    t0 = time.perf_counter()
    cvs, notes = cvbulk_batched(
        genomes, phenomes, models=("ridge", "gblup"),
        n_replications=n_replications, n_folds=n_folds, store_effects=False,
    )
    dt = time.perf_counter() - t0
    assert len(cvs) >= n_replications * n_folds
    emit(
        f"cvbulk wall-clock (n={n}, p={p}, {n_replications}x{n_folds} folds x "
        f"2 models = {len(cvs)} fits, batched, warm)",
        dt,
        "s",
    )


# ---------------------------------------------------------------------------
# Headline: fused GRM+GBLUP step at 8192 x 262144 (round-1 config)
# ---------------------------------------------------------------------------


def bench_headline(on_tpu: bool) -> None:
    import jax
    import jax.numpy as jnp

    use_pallas = on_tpu and os.environ.get("GBM_BENCH_PALLAS", "0") == "1"
    use_bf16 = os.environ.get("GBM_BENCH_BF16", "0") == "1"
    if on_tpu:
        n, p = 8192, 262_144
    else:
        n, p = 512, 4_096

    key = jax.random.PRNGKey(0)
    kx, ky = jax.random.split(key)
    y = jax.random.normal(ky, (n,), dtype=jnp.float32)

    if use_pallas:
        from genomicbreedingmodels_tpu.ops.pallas_kernels import grm_pallas_int8

        X = jax.random.randint(kx, (n, p), 0, 3, dtype=jnp.int8)

        def grm(D):
            return grm_pallas_int8(D, ploidy=2, interpret=False)
    elif use_bf16:
        from genomicbreedingmodels_tpu.ops.grm import gram_panel as grm

        X = jax.random.uniform(kx, (n, p), dtype=jnp.bfloat16)
    else:
        # Default: called-genotype diploid dosages {0, 1, 2} on the exact
        # int8 path — int8 operands run the MXU at ~1.6x the bf16 rate with
        # EXACT int32 accumulation, the centered Gram is built LOWER
        # TRIANGLE ONLY (no mirror pass), and the mixed-model solve is the
        # blocked Cholesky + blocked substitution of ops/chol.py (GEMM
        # panels instead of XLA's ~25 ms sequential trsv pair).
        from genomicbreedingmodels_tpu.ops.chol import gblup_solve_lower
        from genomicbreedingmodels_tpu.ops.grm import gram_dosage_lower

        X = jax.random.randint(kx, (n, p), 0, 3, dtype=jnp.int8)

        @jax.jit
        def fused_step(D, y):
            K_lower = gram_dosage_lower(D, ploidy=2)
            return gblup_solve_lower(K_lower, y, jnp.float32(0.1))

        dt = _median_time(lambda: _sync(fused_step(X, y)))
        snps_per_s = n * p / dt
        emit(
            f"GRM+GBLUP SNPs/s/chip (n={n}, p={p}, int8 dosage, "
            "lower-tri gram + blocked cholesky)",
            snps_per_s,
            "SNPs/s",
            vs_baseline=(snps_per_s / R1_HEADLINE) if on_tpu else 1.0,
        )
        return

    @jax.jit
    def fused_step(X, y):
        K = grm(X)
        yc = y - jnp.mean(y)
        lam = jnp.float32(0.1)
        A = K + lam * jnp.eye(K.shape[0], dtype=K.dtype)
        L = jnp.linalg.cholesky(A)
        alpha = jax.scipy.linalg.cho_solve((L, True), yc)
        # GEBV = K alpha + mean; K alpha = (A - lam I) alpha = yc - lam*alpha,
        # so the n x n matvec is algebraically free.
        return yc - lam * alpha + jnp.mean(y)

    dt = _median_time(lambda: _sync(fused_step(X, y)))
    snps_per_s = n * p / dt
    emit(
        f"GRM+GBLUP SNPs/s/chip (n={n}, p={p}, "
        + ("pallas int8" if use_pallas else ("bf16" if use_bf16 else "int8 dosage"))
        + ")",
        snps_per_s,
        "SNPs/s",
        vs_baseline=(snps_per_s / R1_HEADLINE) if on_tpu else 1.0,
    )


SECTIONS = {
    "northstar": bench_northstar,
    "sampler": bench_sampler,
    "gwas": bench_gwas,
    "cv": bench_cv,
    "headline": bench_headline,
}


def _run_section(name: str) -> None:
    import jax

    if os.environ.get("GBM_BENCH_FORCE_CPU", "0") == "1":
        # The site config pins jax_platforms=axon,cpu; the env var alone
        # does not override it (see tests/conftest.py).
        jax.config.update("jax_platforms", "cpu")
    on_tpu = jax.devices()[0].platform == "tpu"
    SECTIONS[name](on_tpu)


def main() -> None:
    import subprocess
    import sys

    # Each section runs in its OWN subprocess: an OOM (or a wedged tunnel
    # device) in one section must not poison the others' HBM — observed: a
    # single RESOURCE_EXHAUSTED left the device allocator unusable for every
    # subsequent call in the same process, down to a scalar PRNGKey.
    #
    # The HEADLINE runs FIRST (so it survives any outer wall-clock kill of
    # the full ~30 min suite) and its line is RE-EMITTED after every section
    # so the LAST printed JSON line is always the headline metric.
    names = ["headline"] if os.environ.get("GBM_BENCH_HEADLINE_ONLY", "0") == "1" else list(SECTIONS)
    names = ["headline"] + [n for n in names if n != "headline"]
    headline_line = None
    for name in names:
        try:
            r = subprocess.run(
                [sys.executable, __file__, "--section", name],
                timeout=3000,
                stdout=subprocess.PIPE,
                stderr=subprocess.DEVNULL,
                text=True,
            )
            out = (r.stdout or "").strip()
            if out:
                print(out, flush=True)
            if name == "headline" and out:
                headline_line = out.splitlines()[-1]
            if r.returncode != 0:
                print(f"# bench section {name} failed: exit {r.returncode}", flush=True)
        except subprocess.TimeoutExpired:
            print(f"# bench section {name} timed out", flush=True)
        if name != "headline" and headline_line:
            print(headline_line, flush=True)


if __name__ == "__main__":
    import sys

    if len(sys.argv) >= 3 and sys.argv[1] == "--section":
        _run_section(sys.argv[2])
    else:
        main()
