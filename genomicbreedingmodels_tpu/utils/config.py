"""Framework configuration (the reference has none — pure kwargs everywhere,
SURVEY §5). A single dataclass with env-var overrides so production runs can
be tuned without code changes."""

from __future__ import annotations

import os
from dataclasses import dataclass, fields


@dataclass
class GBMConfig:
    # numerics
    compute_dtype: str = "float32"  # device compute dtype for model solves
    gram_block_cols: int = 262_144  # GRM column-block streaming width
    # MCMC
    mcmc_block_size: int = 256
    mcmc_n_iter: int = 1_500
    mcmc_n_burnin: int = 500
    # Grouped within-block kernel (BayesB/C, BLπ, BayesTπ — and BL, which
    # rides the same machinery degenerated to the single all-ones pattern):
    # "grouped" runs the exact collapsed 2^K-pattern draw
    # (K=mcmc_group_size) as an XLA scan — the fastest path through the
    # axon TPU tunnel. When the per-sweep pattern table fits
    # (p/K · 2^K · K² ≤ 3.6e8 floats) the pattern Choleskys are HOISTED out
    # of the sequential scan and factorized once per sweep (s2/σ²ₑ/π are
    # sweep-constant) into ONE masked-L⁻¹ table, shrinking each group step
    # to Z = W̃v + Gumbel-argmax + one K-vector matvec — measured 341-360k
    # updates/s at 2048×32768 on v5e (K∈{4..8}; round-3's two-table variant
    # hit 213-226k, the scalar scan 56-93k). "pallas" runs the same update
    # as one Pallas kernel per block (ops/pallas_gibbs.py): the whole
    # within-block group scan is VMEM-resident in one launch — measured
    # 2.0M updates/s at 2048×32768 and 1.52M at 10k×102k on v5e (round 5;
    # per-launch overhead through the current tunnel runtime is ~9 us, not
    # the ~2.3 ms round 3 measured). "scalar" is the one-marker-at-a-time
    # oracle. "auto" (default) = pallas on TPU for indicator models with
    # block_size <= 1024 (K rounded to 8 — the kernel needs 2^K lanes),
    # grouped everywhere else.
    mcmc_indicator_update: str = "auto"
    # K=6 measured fastest on v5e (360k vs 338k at K=8, 341k at K=4: the
    # per-step pattern batch 2^K·K² stays VPU-cheap while the sequential
    # step count p/K drops); K=10's 1024-pattern unrolled build fails
    # remote compile, so the curve ends at 8-9.
    mcmc_group_size: int = 6
    # λ paths
    n_lambda: int = 100
    lambda_min_ratio: float = 0.01
    path_cv_folds: int = 10
    # CV harness
    cv_workers: int = 1
    # REML: 8x8 log-lattice seed + 12 projected-Newton steps. Validated
    # against the f64 dense-pinv oracle (cor >= 0.999,
    # tests/test_parity_oracles.py) and 1.4x faster than the original 16x16
    # grid (1403 -> 1972 markers/s at 2048 x 32768 on TPU v5e).
    reml_grid: int = 8
    reml_newton: int = 12

    @classmethod
    def from_env(cls) -> "GBMConfig":
        """Override any field via GBM_<UPPER_NAME> environment variables."""
        kwargs = {}
        for f in fields(cls):
            env = os.environ.get(f"GBM_{f.name.upper()}")
            if env is not None:
                typ = type(f.default)
                kwargs[f.name] = typ(env)
        return cls(**kwargs)


_config: GBMConfig | None = None


def get_config() -> GBMConfig:
    global _config
    if _config is None:
        _config = GBMConfig.from_env()
    return _config


def set_config(cfg: GBMConfig) -> None:
    global _config
    _config = cfg


def reset_config() -> None:
    """Drop the cached config so the next get_config() re-reads the env."""
    global _config
    _config = None
