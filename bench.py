"""Headline benchmark: GRM + GBLUP solve throughput (SNPs/s/chip).

BASELINE.md: the reference publishes no benchmarks; the driver-written north
star is SNPs/s/chip for the GRM+GBLUP solve. One chip processes an n x p SNP
panel: centered Gram matrix (bf16 operands, f32 accumulation on the MXU),
Cholesky mixed-model solve, GEBV prediction. Prints ONE JSON line.

Kernel selection: the default is the triangular-blocked XLA GRM
(ops/grm.py:gram_triangular) — only lower row-block tiles are computed,
upper filled by transpose. Measured at 8192 x 262144 bf16: 13.6 GSNP/s vs
8.9 for the single fused GEMM and 12.0 for the Pallas kernel
(ops/pallas_kernels.py), and it compiles in seconds. The Pallas kernel
stays opt-in via GBM_BENCH_PALLAS=1 (first-time compilation through this
environment's axon tunnel takes ~6 minutes).

Notes for this environment:
- under the axon TPU tunnel `block_until_ready` does not synchronize, so
  timing uses scalar readbacks;
- the column means use a float32 accumulation dtype (no f32 panel copy), so
  peak HBM stays at ~2 x panel bytes.
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

    key = jax.random.PRNGKey(0)
    kx, ky = jax.random.split(key)
    X = jax.random.uniform(kx, (n, p), dtype=jnp.bfloat16)
    y = jax.random.normal(ky, (n,), dtype=jnp.float32)

    if use_pallas:
        from genomicbreedingmodels_tpu.ops.pallas_kernels import grm_pallas

        def grm(X):
            return grm_pallas(X, interpret=False)
    else:
        from genomicbreedingmodels_tpu.ops.grm import gram_triangular as grm

    @jax.jit
    def gblup_solve(K, y):
        yc = y - jnp.mean(y)
        lam = jnp.float32(0.1)
        A = K + lam * jnp.eye(K.shape[0], dtype=K.dtype)
        L = jnp.linalg.cholesky(A)
        alpha = jax.scipy.linalg.cho_solve((L, True), yc)
        return K @ alpha + jnp.mean(y)

    def step():
        K = grm(X)
        gebv = gblup_solve(K, y)
        return float(gebv[0])  # scalar readback = sync under the axon tunnel

    step()  # warmup / compile
    n_rep = 3
    t0 = time.perf_counter()
    for _ in range(n_rep):
        step()
    dt = (time.perf_counter() - t0) / n_rep

    snps_per_s = n * p / dt
    print(
        json.dumps(
            {
                "metric": f"GRM+GBLUP SNPs/s/chip (n={n}, p={p}, {dev.platform}"
                + (", pallas" if use_pallas else "")
                + ")",
                "value": round(snps_per_s, 1),
                "unit": "SNPs/s",
                "vs_baseline": 1.0,
            }
        )
    )


if __name__ == "__main__":
    main()
