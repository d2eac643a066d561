"""Weak-scaling harness on the virtual CPU mesh (VERDICT r03 item 4a).

Fixed per-device marker shard, growing device count: D = 1/2/4/8 virtual
devices run the sharded GRM, one marker-sharded Gibbs segment, and the
matrix-free CG GBLUP, and the harness reports wall-clock + parallel
efficiency T(1)/T(D) per stage (weak-scaling ideal: constant time,
efficiency 1.0).

IMPORTANT CAVEAT (by design, stated in docs/design.md): with
`--xla_force_host_platform_device_count` the D "devices" are threads on the
2 physical host cores and the collectives are CPU-emulated shared-memory
copies, so the numbers here are a CORRECTNESS-SHAPED TREND — they validate
that the sharded programs compile, execute, and keep per-device work
constant as D grows — not a hardware-scaling claim. The quantitative
ICI/DCN claim lives in docs/design.md ("Host scaling: the communication
model"), which this harness complements. Efficiencies are therefore also
reported normalized by the compute oversubscription factor
max(1, D/cores): on 2 cores, 8 virtual devices necessarily run >=4x slower
even with zero communication cost.

Usage: python scripts/weak_scaling.py            # D=1,2,4,8; JSON lines
       (imported by tests/test_parallel.py for a small smoke run)
"""

from __future__ import annotations

import json
import os
import sys
import time

if __name__ == "__main__":
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np


def run_weak_scaling(
    device_counts=(1, 2, 4, 8),
    n: int = 256,
    p_per_device: int = 2048,
    gibbs_iters: int = 4,
    cg_iters: int = 10,
    emit=print,
):
    """Run the three sharded stages at each D with p = p_per_device * D.

    Returns {D: {stage: seconds}}; `emit` receives one JSON line per (D,
    stage) plus a final efficiency summary line.
    """
    import jax
    from jax.sharding import Mesh

    from genomicbreedingmodels_tpu.parallel.sharded import (
        sharded_gblup_cg,
        sharded_gibbs_regression,
        sharded_grm,
    )

    devs = jax.devices()
    if len(devs) < max(device_counts):
        raise RuntimeError(
            f"need {max(device_counts)} devices, have {len(devs)} — run with "
            "XLA_FLAGS=--xla_force_host_platform_device_count=8 on CPU"
        )
    n_cores = os.cpu_count() or 1
    rng = np.random.default_rng(0)
    results = {}
    for D in device_counts:
        mesh = Mesh(np.asarray(devs[:D]).reshape(1, D), ("dp", "mp"))
        p = p_per_device * D
        X = rng.uniform(size=(n, p)).astype(np.float32)
        y = rng.normal(size=n).astype(np.float32)
        times = {}

        # GRM: per-device syrk of the local shard + one n x n psum.
        sharded_grm(X, mesh)  # compile
        t0 = time.perf_counter()
        K = sharded_grm(X, mesh)
        float(np.asarray(K)[0, 0])
        times["grm"] = time.perf_counter() - t0

        # Marker-sharded Gibbs: per-device block scans + per-round psum of
        # the residual delta.
        kw = dict(mesh=mesh, axis="mp", model="BayesC", n_iter=gibbs_iters,
                  n_burnin=0, block_size=64)
        sharded_gibbs_regression(X, y, **kw)  # compile
        t0 = time.perf_counter()
        sharded_gibbs_regression(X, y, **kw)
        times["gibbs"] = time.perf_counter() - t0

        # Matrix-free CG GBLUP: two local GEMVs + one n-vector psum per iter.
        sharded_gblup_cg(X, y, 0.1, mesh, axis="mp", n_iter=cg_iters)  # compile
        t0 = time.perf_counter()
        _, gebv = sharded_gblup_cg(X, y, 0.1, mesh, axis="mp", n_iter=cg_iters)
        float(np.asarray(gebv)[0])
        times["cg"] = time.perf_counter() - t0

        results[D] = times
        for stage, dt in times.items():
            emit(json.dumps({
                "harness": "weak_scaling", "devices": D, "stage": stage,
                "p_total": p, "seconds": round(dt, 4),
            }))
    base = results[device_counts[0]]
    summary = {
        "harness": "weak_scaling", "summary": True,
        "note": "CPU-emulated collectives; correctness-shaped trend only",
        "cores": n_cores,
    }
    for stage in base:
        summary[f"efficiency_{stage}"] = {
            D: round(base[stage] / results[D][stage], 3) for D in device_counts
        }
        summary[f"efficiency_{stage}_core_normalized"] = {
            D: round(
                base[stage] / results[D][stage] * max(1, D / n_cores), 3
            )
            for D in device_counts
        }
    emit(json.dumps(summary))
    return results


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    run_weak_scaling()
    sys.exit(0)
