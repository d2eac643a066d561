"""Headline benchmark: GRM + GBLUP solve throughput (SNPs/s/chip).

BASELINE.md: the reference publishes no benchmarks; the driver-written north
star is SNPs/s/chip for the GRM+GBLUP solve. One chip processes an n x p SNP
panel: centered Gram matrix (bf16 operands, f32 accumulation on the MXU),
Cholesky mixed-model solve, GEBV prediction. Prints ONE JSON line.

Kernel selection: the default panel is a called-genotype diploid panel
(dosages {0,1,2} — what PLINK .bed files decode to) on the int8 dosage path
(ops/grm.py:gram_dosage): the column-panel syrk schedule with int8 operands
and EXACT int32 MXU accumulation, 27.3 GSNP/s at 8192 x 262144 on TPU v5e.
GBM_BENCH_BF16=1 switches to a continuous (imputed) allele-frequency panel
on the bf16 panel syrk (ops/grm.py:gram_panel) — panel j is one tall
((n-j·b) x b x p) GEMM, strict upper triangle filled by transpose, centering
as the O(n²) double-centering projection of the raw Gram: 16.5 GSNP/s vs
10.1 for the single fused GEMM, 13.6 for square-tile triangular blocking,
and 15.3 for the Pallas kernel (ops/pallas_kernels.py, opt-in via
GBM_BENCH_PALLAS=1).

Notes for this environment:
- under the axon TPU tunnel `block_until_ready` does not synchronize, so
  timing uses scalar readbacks;
- the raw-Gram + double-centering path keeps peak HBM at ~1 x panel bytes
  (the panel is never copied) and is ~100x more accurate than a bf16
  mean-subtract (2.0e-6 vs 1.9e-4 max rel err vs f64 at 512 x 8192).
"""

import json
import os
import time


def main() -> None:
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    use_pallas = on_tpu and os.environ.get("GBM_BENCH_PALLAS", "0") == "1"
    if on_tpu:
        n, p = 8192, 262_144
    else:
        n, p = 512, 4_096

    use_bf16 = os.environ.get("GBM_BENCH_BF16", "0") == "1"

    key = jax.random.PRNGKey(0)
    kx, ky = jax.random.split(key)
    y = jax.random.normal(ky, (n,), dtype=jnp.float32)

    if use_pallas:
        from genomicbreedingmodels_tpu.ops.pallas_kernels import grm_pallas

        X = jax.random.uniform(kx, (n, p), dtype=jnp.bfloat16)

        def grm(X):
            return grm_pallas(X, interpret=False)
    elif use_bf16:
        # Continuous (imputed) allele-frequency panel: bf16 panel syrk.
        from genomicbreedingmodels_tpu.ops.grm import gram_panel as grm

        X = jax.random.uniform(kx, (n, p), dtype=jnp.bfloat16)
    else:
        # Default: a called-genotype diploid panel — dosages {0, 1, 2} — the
        # realistic production input (PLINK .bed decodes to exactly this).
        # int8 operands run the MXU at 2x the bf16 rate and the int32-
        # accumulated Gram is EXACT (ops/grm.py:gram_dosage): measured
        # 27.3 GSNP/s at 8192 x 262144 on TPU v5e vs 16.5 bf16.
        from genomicbreedingmodels_tpu.ops.grm import gram_dosage

        X = jax.random.randint(kx, (n, p), 0, 3, dtype=jnp.int8)

        def grm(D):
            return gram_dosage(D, ploidy=2)

    @jax.jit
    def fused_step(X, y):
        K = grm(X)
        yc = y - jnp.mean(y)
        lam = jnp.float32(0.1)
        A = K + lam * jnp.eye(K.shape[0], dtype=K.dtype)
        L = jnp.linalg.cholesky(A)
        alpha = jax.scipy.linalg.cho_solve((L, True), yc)
        # GEBV = K alpha + mean; since K alpha = (A - lam I) alpha = yc -
        # lam*alpha, the n x n matvec is algebraically free.
        return yc - lam * alpha + jnp.mean(y)

    def step():
        gebv = fused_step(X, y)
        return float(gebv[0])  # scalar readback = sync under the axon tunnel

    step()  # warmup / compile
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        step()
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]  # median: the axon tunnel adds
    # occasional multi-10ms latency spikes unrelated to device time

    snps_per_s = n * p / dt
    print(
        json.dumps(
            {
                "metric": f"GRM+GBLUP SNPs/s/chip (n={n}, p={p}, {dev.platform}"
                + (", pallas" if use_pallas else ("" if use_bf16 else ", int8 dosage"))
                + ")",
                "value": round(snps_per_s, 1),
                "unit": "SNPs/s",
                "vs_baseline": 1.0,
            }
        )
    )


if __name__ == "__main__":
    main()
