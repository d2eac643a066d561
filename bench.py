"""Headline benchmark: GRM + GBLUP solve throughput (SNPs/s/chip).

BASELINE.md: the reference publishes no benchmarks; the driver-written north
star is SNPs/s/chip for the GRM+GBLUP solve. One chip processes an n x p SNP
panel: centered Gram matrix on the MXU (bf16 inputs, f32 accumulation),
Cholesky mixed-model solve, GEBV prediction. Prints ONE JSON line.

Notes for this environment:
- under the axon TPU tunnel `block_until_ready` does not synchronize, so
  timing uses scalar readbacks;
- the column means are computed with a float32 accumulation dtype (never
  materializing a float32 copy of the panel), keeping peak HBM at
  ~2 x panel bytes.
"""

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    if on_tpu:
        n, p = 8192, 262_144
    else:
        n, p = 512, 4_096

    key = jax.random.PRNGKey(0)
    kx, ky = jax.random.split(key)
    X = jax.random.uniform(kx, (n, p), dtype=jnp.bfloat16)
    y = jax.random.normal(ky, (n,), dtype=jnp.float32)

    @jax.jit
    def grm(X):
        mean = jnp.mean(X, axis=0, keepdims=True, dtype=jnp.float32)
        Z = X - mean.astype(X.dtype)
        return jnp.dot(Z, Z.T, preferred_element_type=jnp.float32) / X.shape[1]

    @jax.jit
    def gblup_solve(K, y):
        yc = y - jnp.mean(y)
        lam = jnp.float32(0.1)
        A = K + lam * jnp.eye(K.shape[0], dtype=K.dtype)
        L = jnp.linalg.cholesky(A)
        alpha = jax.scipy.linalg.cho_solve((L, True), yc)
        return K @ alpha + jnp.mean(y)

    # Warmup / compile.
    K = grm(X)
    float(K[0, 0])
    gebv = gblup_solve(K, y)
    float(gebv[0])

    n_rep = 3
    t0 = time.perf_counter()
    for _ in range(n_rep):
        K = grm(X)
        gebv = gblup_solve(K, y)
        float(gebv[0])
    dt = (time.perf_counter() - t0) / n_rep

    snps_per_s = n * p / dt
    print(
        json.dumps(
            {
                "metric": f"GRM+GBLUP SNPs/s/chip (n={n}, p={p}, {dev.platform})",
                "value": round(snps_per_s, 1),
                "unit": "SNPs/s",
                "vs_baseline": 1.0,
            }
        )
    )


if __name__ == "__main__":
    main()
