"""Benchmark suite: GRM+GBLUP throughput plus the BASELINE.md target table.

Emits one JSON line per metric ({"metric", "value", "unit", "vs_baseline"}).
The HEADLINE metric — the driver parses the LAST line — is the fused
GRM+GBLUP step at 8192 x 262144 (same config as round 1, so vs_baseline is
the ratio to round 1's 21.8 GSNP/s). The headline runs FIRST and its line is
re-emitted after every section so the last stdout line is ALWAYS the headline
JSON (failure/timeout/skip notes go to stderr, never stdout). Supporting
metrics cover the rest of BASELINE.md's target table:

- north star: GRM+GBLUP at n=50_000 x p=500_000 (BASELINE.md "SNPs/s/chip
  ... at 50k x 500k"). The panel never exists whole anywhere: int8 dosage
  column shards are generated on device (rbg bits — data synthesis, not
  compute) and folded into donated lower-trapezoid int32 pieces by the
  MXU-tile-aligned syrk of ops/pieces.py (exact int32 accumulation), then
  GBLUP solves by matrix-free CG — Cholesky would need a second 10 GB
  buffer the 16 GB chip does not have. Per-stage timings print to stderr.
- raw host->device link probe: a bare 256 MB device_put in GB/s — measures
  the tunnel tax that the gwas/diskstream/cv stage notes attribute.
- Gibbs sampler marker-updates/s: BayesC on the 2^K-pattern collapsed
  draw — the pallas per-block kernel on TPU, the XLA grouped scan
  elsewhere (the shipped "auto" default, models/bayesian.py) — + BRR
  joint block draws, plus effect-ESS/s over honest
  1000-post-burnin-sweep windows on a signal panel, plus BASELINE
  config-3 AT SIZE (10k x 102k, device-synthesized panel — see
  bench_sampler_big).
- GWAS-REML markers/s (the reference's O(p n^3) hot spot, rotated).
- cvbulk wall-clock: replicated k-fold CV via the batched fold-sharded
  engine (reference scheduler: src/cross_validation.jl:151-206), now
  including lasso folds.
- disk-streamed GBLUP (DEFAULT-ON; GBM_BENCH_DISK=0 disables):
  gblup_from_bed_pieces on a 25k x 250k auto-generated .bed (cached in
  /tmp), or the panel at $GBM_BENCH_BED (e.g. the 50k x 500k trio from
  scripts/make_big_bed.py) when set. Stage notes split host IO from
  h2d+syrk.

Budgeting: the whole suite must finish inside the driver's wall-clock.
GBM_BENCH_BUDGET (seconds, default 540) is enforced between sections: a
section whose floor estimate exceeds the remaining budget is SKIPPED with a
stderr note, lowest-priority first (priority order = list order below).

Environment notes: under the axon TPU tunnel block_until_ready does not
synchronize — timing uses scalar readbacks; medians over repeats absorb the
tunnel's multi-10ms latency spikes.
"""

import json
import os
import sys
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


def note(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# Raw host->device link probe
# ---------------------------------------------------------------------------


def bench_linkprobe(on_tpu: bool) -> None:
    """Measure the raw host→device link with a bare device_put: the number
    that attributes the 'h2d tax' in the gwas/diskstream/cv stage notes by
    measurement instead of inference (VERDICT r04 missing-item 3). Through
    the axon tunnel this is expected ~30 MB/s; direct-attached PCIe/ICI
    hosts measure GB/s."""
    import jax
    import numpy as np

    mb = 256 if on_tpu else 16
    buf = np.empty(mb * 1024 * 1024, dtype=np.uint8)
    dev = jax.devices()[0]

    def put():
        x = jax.device_put(buf, dev)
        x.block_until_ready()
        # tunnel caveat: block_until_ready does not synchronize there —
        # force a scalar readback so the transfer provably completed.
        return int(x[-1])

    put()  # warm the path (allocator, any lazy tunnel setup)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        put()
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[1]
    emit(
        f"raw host->device link MB/s (bare device_put of a {mb} MB buffer, "
        "median-of-3, scalar-readback synced)",
        mb / dt,
        "MB/s",
    )


# ---------------------------------------------------------------------------
# North star: 50k x 500k GRM + GBLUP, streamed int8 shards + pieces CG
# ---------------------------------------------------------------------------


def bench_northstar(on_tpu: bool) -> None:
    import jax
    import jax.numpy as jnp
    from functools import partial

    from genomicbreedingmodels_tpu.ops.pieces import (
        accumulate_dosage_shard, center_scale_pieces, cg_solve_pieces,
        make_bounds, zero_pieces,
    )

    if on_tpu:
        n, p_shard, n_shards, rng_chunks = 50_000, 62_500, 8, 10
    else:
        n, p_shard, n_shards, rng_chunks = 1_024, 2_048, 2, 2
    p = p_shard * n_shards
    bounds = make_bounds(n, 4096)

    # Shard synthesis: rbg random bits (cheap on TPU; threefry costs ~1.6 s
    # of pure RNG at this size — measured, see docs/design.md). The shard is
    # drawn in chunks because jax.random materializes 4-byte random bits per
    # element. Data values do not affect syrk timing.
    @partial(jax.jit, donate_argnums=(0,))
    def add_shard(pieces, key):
        ck = jax.random.split(key, rng_chunks)
        cw = p_shard // rng_chunks
        D = jnp.concatenate(
            [jax.random.randint(ck[c], (n, cw), 0, 3, dtype=jnp.int8)
             for c in range(rng_chunks)],
            axis=1,
        )
        return accumulate_dosage_shard(pieces, D, bounds=bounds, snp_major=False)

    keys = jax.random.split(jax.random.key(7, impl="rbg"), n_shards + 1)
    y = jax.random.normal(jax.random.PRNGKey(3), (n,), dtype=jnp.float32)

    def run(report_stages=False):
        t0 = time.perf_counter()
        pieces = zero_pieces(n, bounds)
        for s in range(n_shards):
            pieces = add_shard(pieces, keys[s])
        if report_stages:
            _sync(pieces[0])
            t1 = time.perf_counter()
        pieces = center_scale_pieces(pieces, jnp.float32(4.0), bounds=bounds)
        if report_stages:
            _sync(pieces[0])
            t2 = time.perf_counter()
        gebv, resid = cg_solve_pieces(
            pieces, y, jnp.float32(1e-3), bounds=bounds, iters=30
        )
        res = _sync(resid)
        _sync(gebv)
        t3 = time.perf_counter()
        if report_stages:
            note(
                f"# northstar stages: rng+syrk={t1 - t0:.2f}s "
                f"center={t2 - t1:.2f}s cg={t3 - t2:.2f}s"
            )
        return t3 - t0, res

    run()  # compile warmup (donated buffers are rebuilt fresh each run)
    run(report_stages=True)  # stage breakdown (syncs between stages)
    dt, res = run()
    snps_per_s = n * p / dt
    if on_tpu:
        # VERDICT r04 item 8: why this line synthesizes shards on device
        # instead of reading the 50k x 500k trio from disk — the full-size
        # .bed payload is 6.25 GB packed; at the measured link rate (see the
        # raw link-probe line, ~30 MB/s through the axon tunnel) its h2d
        # alone is ~3.5 min, which cannot fit the bench budget. REAL-disk
        # streaming is measured at 25k x 250k in the diskstream section
        # (same code path, gblup_from_bed_pieces); on direct-attached hosts
        # set GBM_BENCH_BED to the make_big_bed.py trio to run this at size
        # from disk.
        note(
            "# northstar note: shards synthesized on-device; real-disk "
            "variant = diskstream section (tunnel h2d of the 6.25 GB .bed "
            "payload alone would be ~3.5 min at the link-probe rate)"
        )
    emit(
        f"north-star GRM+GBLUP SNPs/s/chip (n={n}, p={p}, streamed int8 "
        f"shards, pieces syrk + CG, resid={res:.1e})",
        snps_per_s,
        "SNPs/s",
    )


# ---------------------------------------------------------------------------
# Optional: at-size disk-streamed GBLUP (GBM_BENCH_DISK=1)
# ---------------------------------------------------------------------------


def bench_diskstream(on_tpu: bool) -> None:
    """At-size disk-streamed GBLUP — runs by DEFAULT (GBM_BENCH_DISK=0 to
    disable). If $GBM_BENCH_BED names an existing trio (e.g. the 50k x 500k
    panel of scripts/make_big_bed.py) it is used; otherwise a 25k x 250k
    panel (1.56 GB packed payload; chosen so generation + one streamed pass
    fit the 540 s budget alongside the other sections — 50k x 500k is 4x
    the h2d bytes and does not) is generated once to /tmp and cached."""
    import numpy as np

    from genomicbreedingmodels_tpu.streaming import BedShardStreamer, gblup_from_bed_pieces

    prefix = os.environ.get("GBM_BENCH_BED", "")
    if not (prefix and os.path.exists(prefix + ".bed")):
        n_gen, p_gen = (25_000, 250_000) if on_tpu else (512, 4_096)
        prefix = f"/tmp/gbm_disk_panel_{n_gen}x{p_gen}"
        t0 = time.perf_counter()
        expect = 3 + ((n_gen + 3) // 4) * p_gen
        if not (os.path.exists(prefix + ".bed")
                and os.path.getsize(prefix + ".bed") == expect):
            from genomicbreedingmodels_tpu.io import write_random_bed

            write_random_bed(prefix, n_gen, p_gen)
            note(f"# diskstream: generated {prefix}.bed "
                 f"({expect / 1e9:.2f} GB) in {time.perf_counter() - t0:.1f}s")
    block_cols = 31_250 if on_tpu else 1_024
    st = BedShardStreamer(prefix, block_cols=block_cols)
    n, p = st.n, st.p
    # Host-side-only sweep (disk read + prefetch thread, no device work):
    # isolates the disk/decode stage so the full-pipeline number can be
    # attributed between host IO and h2d+syrk below.
    t0 = time.perf_counter()
    host_bytes = 0
    for _, _, payload in st.iter_payload():
        host_bytes += payload.nbytes
    t_host = time.perf_counter() - t0
    y = np.random.default_rng(0).normal(size=n).astype(np.float32)
    t0 = time.perf_counter()
    gebv, resid = gblup_from_bed_pieces(
        prefix, y, lam=0.1, block_cols=block_cols, cg_iters=30
    )
    dt = time.perf_counter() - t0
    assert np.all(np.isfinite(gebv))
    note(
        f"# diskstream stages: disk+prefetch-only pass={t_host:.1f}s "
        f"({host_bytes / 1e9:.2f} GB packed @ {host_bytes / 1e9 / t_host:.2f} GB/s); "
        f"full pipeline={dt:.1f}s ⇒ h2d+unpack+syrk+cg ≈ {dt - t_host:.1f}s "
        f"(effective h2d {host_bytes / 1e9 / max(dt - t_host, 1e-9) * 1e3:.0f} MB/s; "
        "read/decode overlap device work via the prefetch thread)"
    )
    emit(
        f"disk-streamed GRM+GBLUP SNPs/s/chip (n={n}, p={p}, .bed packed 2-bit "
        f"h2d -> on-device unpack -> pieces CG, resid={resid:.1e})",
        n * p / dt,
        "SNPs/s",
    )


# ---------------------------------------------------------------------------
# Gibbs sampler throughput (the BGLR replacement)
# ---------------------------------------------------------------------------


def bench_sampler(on_tpu: bool) -> None:
    import numpy as np
    from genomicbreedingmodels_tpu.models.bayesian import gibbs_regression

    if on_tpu:
        n, p, n_iter, n_burnin = 2_048, 32_768, 150, 30
        n_e, p_e, iter_e, burn_e = 512, 4_096, 1_100, 100
    else:
        n, p, n_iter, n_burnin = 128, 1_024, 60, 10
        n_e, p_e, iter_e, burn_e = 64, 256, 220, 20
    rng = np.random.default_rng(0)
    X = rng.uniform(size=(n, p)).astype(np.float32)
    y = rng.normal(size=n).astype(np.float32)
    bayesc_label = (
        "2^K collapsed draw, pallas block kernel" if on_tpu
        else "grouped 2^K-pattern collapsed draw"
    )  # shipped default resolves per backend (models/bayesian.py auto)
    for model, label in (
        ("BayesC", bayesc_label),
        ("BRR", "joint block draw"),  # continuous prior: one Cholesky per block
    ):
        # n_iter is a jit static: the warmup must run the EXACT config or the
        # timed call pays the compile (round-2 numbers did — understated).
        # Median of 3 timed runs: single-run tunnel variance was ±30%
        # (round-3's driver capture landed 7% under the repo's own numbers).
        gibbs_regression(X, y, model=model, n_iter=n_iter, n_burnin=n_burnin, seed=1)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            gibbs_regression(
                X, y, model=model, n_iter=n_iter, n_burnin=n_burnin, seed=1
            )
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[1]
        emit(
            f"{model} Gibbs marker-updates/s (n={n}, p={p}, {n_iter} sweeps, "
            f"{label}, warm median-of-3, panel device-cached across runs "
            "since r5)",
            n_iter * p / dt,
            "updates/s",
        )
    # Statistical efficiency with an HONEST window (VERDICT r04 item 3: the
    # old 120-sweep windows were below the Geyer estimator's resolution
    # floor for σ²ₑ): 1000 post-burnin sweeps — short of nothing BGLR does
    # (its own default is 1500 TOTAL incl. 500 burn-in, src/linear.jl:
    # 446-447) — on a smaller panel WITH genetic signal (h²≈0.5, 1% causal)
    # so σ²ₑ is identified and its chain actually mixes rather than drifts.
    rng_e = np.random.default_rng(7)
    X_e = (rng_e.integers(0, 3, size=(n_e, p_e)) / 2.0).astype(np.float32)
    beta_e = (rng_e.normal(size=p_e) * (rng_e.uniform(size=p_e) < 0.01)).astype(np.float32)
    g_e = X_e @ beta_e
    y_e = (g_e + rng_e.normal(size=n_e) * max(g_e.std(), 1e-3)).astype(np.float32)
    for model, label in (
        ("BayesC", bayesc_label),
        ("BRR", "joint block draw"),
    ):
        gibbs_regression(X_e, y_e, model=model, n_iter=iter_e, n_burnin=burn_e, seed=2)
        t0 = time.perf_counter()
        _, _, diag = gibbs_regression(
            X_e, y_e, model=model, n_iter=iter_e, n_burnin=burn_e, seed=2
        )
        dt_e = time.perf_counter() - t0
        emit(
            f"{model} Gibbs effect-ESS/s (n={n_e}, p={p_e}, {label}, signal panel "
            f"h2=0.5; mean effect ESS={diag['ess_effects_mean']:.0f}, "
            f"sigma_e2 ESS={diag['ess_sigma_e2']:.0f}, window={iter_e - burn_e} "
            "post-burnin sweeps)",
            diag["ess_effects_mean"] / dt_e,
            "ESS/s",
        )


# ---------------------------------------------------------------------------
# Bayesian alphabet at BASELINE config-3 size (10k x ~100k)
# ---------------------------------------------------------------------------


def bench_sampler_big(on_tpu: bool) -> None:
    """BASELINE config 3 at size: BayesC (grouped) + BRR (joint block) on a
    10_000 x 102_400 panel — the headline BGLR replacement
    (/root/reference/src/bayes.jl:92-93) had never been measured at its own
    config size (VERDICT r04 missing-item 1).

    The panel is SYNTHESIZED ON DEVICE (diploid dosages/2 + 1%-causal
    signal, h²≈0.5): a 4.1 GB f32 panel over the tunnel link (see the
    link-probe line) would be minutes of pure h2d, so the sampler consumes a
    device-resident panel through gibbs_regression's jax-array path — the
    exact production shape for a panel already on-chip from the streaming
    loaders. Stage note attributes prep (center+block Grams, re-paid per
    segment) vs the sweep scan; h2d is zero by construction.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from genomicbreedingmodels_tpu.models.bayesian import gibbs_regression

    # p and block_size are chosen so the panel tiles EXACTLY: bs=600 is a
    # multiple of the pallas grouped draw's K=8 (and of K=6) and divides p,
    # so p_pad == p and the sampler aliases the device panel instead of
    # materializing a padded 4.1 GB copy (input + pad + centered panel =
    # 12.3 GB was the RESOURCE_EXHAUSTED the first at-size attempt hit).
    # bs=600 measured fastest for the pallas kernel at this size (1.52M
    # updates/s vs 1.47M at bs=400; bs=1200 falls off a VMEM cliff).
    if on_tpu:
        n, p, bs, sweeps, burn = 10_000, 102_000, 600, 60, 10
    else:
        n, p, bs, sweeps, burn = 256, 2_400, 600, 30, 5

    @jax.jit
    def synth(key):
        kx, kb, ke = jax.random.split(key, 3)
        X = (
            jax.random.randint(kx, (n, p), 0, 3, dtype=jnp.int8).astype(jnp.float32)
            * jnp.float32(0.5)
        )
        beta = jax.random.normal(kb, (p,), dtype=jnp.float32) * (
            jax.random.uniform(jax.random.fold_in(kb, 1), (p,)) < 0.01
        )
        g = jnp.dot(X, beta, preferred_element_type=jnp.float32)
        y = g + jax.random.normal(ke, (n,), dtype=jnp.float32) * jnp.std(g)
        return X, y

    X, y_dev = synth(jax.random.key(11, impl="rbg"))
    _sync(X)
    y = np.asarray(y_dev)  # 40 KB readback; the panel never crosses the link
    for model, label in (
        ("BayesC", ("2^K collapsed draw, pallas block kernel" if on_tpu
                    else "grouped 2^K-pattern collapsed draw")),
        ("BRR", "joint block draw"),
    ):
        kw = dict(model=model, n_burnin=burn, seed=4, block_size=bs)
        # Prep probe: a 1-sweep run ≈ center + block-Gram precompute + one
        # sweep — attributes the fixed per-segment cost.
        gibbs_regression(X, y, n_iter=2, **kw)  # compile (prep probe shape)
        t0 = time.perf_counter()
        gibbs_regression(X, y, n_iter=2, **kw)
        t_prep = time.perf_counter() - t0
        gibbs_regression(X, y, n_iter=sweeps, **kw)  # compile full shape
        t0 = time.perf_counter()
        _, _, diag = gibbs_regression(X, y, n_iter=sweeps, **kw)
        dt = time.perf_counter() - t0
        note(
            f"# samplerbig {model} stages: prep+2sweeps={t_prep:.1f}s; "
            f"{sweeps}-sweep run={dt:.1f}s ⇒ sweep scan ≈ "
            f"{(dt - t_prep) / max(sweeps - 2, 1) * 1e3:.0f} ms/sweep; h2d=0 "
            "(device-synthesized panel)"
        )
        emit(
            f"{model} Gibbs marker-updates/s AT SIZE (n={n}, p={p}, {sweeps} "
            f"sweeps, {label}, warm; effect ESS={diag['ess_effects_mean']:.0f} "
            f"of {sweeps - burn}-sweep window — honest mixing windows are the "
            "ESS/s lines)",
            sweeps * p / dt,
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
    from genomicbreedingmodels_tpu.models import gwas as gwas_mod

    gbm.gwasreml(genomes=genomes, phenomes=phenomes)  # compile warmup
    # COLD timed run (cache cleared): pays the full prep — panel upload
    # (uint8 dosage codes since r5: 67 MB here, 4x under the old f32 bytes;
    # see models/gwas.py:_prep_device and the raw link-probe line) + GRM.
    gwas_mod._PREP_CACHE.clear()
    t0 = time.perf_counter()
    fit = gbm.gwasreml(genomes=genomes, phenomes=phenomes)
    dt = time.perf_counter() - t0
    assert np.all(np.isfinite(fit.b_hat))
    tm = fit.extras.get("timings", {})
    if tm:
        note(
            "# gwas stages (cold prep, uint8 panel upload): "
            + " ".join(f"{k}={v['total_s']:.1f}s" for k, v in tm.items())
        )
    emit(
        f"GWAS-REML markers/s incl. GRM+eigh (n={n}, p={p}, per-marker 2-VC "
        "REML, warm compile, cold device prep)",
        len(fit.b_hat) / dt,
        "markers/s",
    )
    # WARM repeat on the same panel: the single-slot device-prep cache
    # (utils/devcache.py) skips upload + GRM — the repeated-scan pattern
    # (gwasols + gwaslmm + gwasreml on one panel, or parameter sweeps).
    t0 = time.perf_counter()
    fit = gbm.gwasreml(genomes=genomes, phenomes=phenomes)
    dt_w = time.perf_counter() - t0
    emit(
        f"GWAS-REML markers/s, prep-cached repeat (n={n}, p={p}, device prep "
        "reused via the single-slot panel cache)",
        len(fit.b_hat) / dt_w,
        "markers/s",
    )
    # The other two scans ride the same cached device prep: the whole
    # three-scan sweep (ols t-stats, EMMAX-LMM z-stats, per-marker REML)
    # pays ONE upload+GRM. The reference threads each scan over markers
    # with per-marker pinv / MixedModels fits (src/gwas.jl:238-249,
    # :363-385).
    for fn, name in ((gbm.gwasols, "GWAS-OLS"), (gbm.gwaslmm, "GWAS-LMM")):
        fn(genomes=genomes, phenomes=phenomes)  # compile warmup
        t0 = time.perf_counter()
        fit2 = fn(genomes=genomes, phenomes=phenomes)
        dt2 = time.perf_counter() - t0
        assert np.all(np.isfinite(fit2.b_hat))
        emit(
            f"{name} markers/s, prep-cached (n={n}, p={p}, closed-form "
            "Schur-complement scan)",
            len(fit2.b_hat) / dt2,
            "markers/s",
        )


# ---------------------------------------------------------------------------
# Epistasis pair scan (transform2 — the reference's #4 hot loop)
# ---------------------------------------------------------------------------


def bench_epistasis(on_tpu: bool) -> None:
    """All-ordered-pairs simple-regression scan for t = x_a * x_b (mult
    kernel): l² pair slopes as three GEMMs per block row + on-device
    running top-k (the reference's O(l²·n) hottest feature loop,
    src/transformation.jl:319-468, executed column-at-a-time there)."""
    import numpy as np
    import genomicbreedingmodels_tpu as gbm
    from genomicbreedingmodels_tpu.features.endofunctions import mult
    from genomicbreedingmodels_tpu.features.transform import transform2

    if on_tpu:
        n, l = 512, 16_384
    else:
        n, l = 64, 512
    rng = np.random.default_rng(5)
    freq = rng.uniform(size=(n, l))
    genomes = gbm.Genomes(
        entries=np.array([f"e{i:05d}" for i in range(n)]),
        populations=np.array(["pop_1"] * n),
        loci_alleles=np.array([f"chr1\t{i}\tA|T\tA" for i in range(l)]),
        allele_frequencies=freq,
    )
    y = freq[:, :32] @ rng.normal(size=32) + rng.normal(size=n)
    phenomes = gbm.Phenomes(
        entries=genomes.entries, populations=genomes.populations,
        traits=np.array(["t"]), phenotypes=y[:, None],
    )
    kw = dict(n_new_features_per_transformation=1_000)
    transform2(mult, genomes, phenomes, **kw)  # compile warmup
    t0 = time.perf_counter()
    out = transform2(mult, genomes, phenomes, **kw)
    dt = time.perf_counter() - t0
    assert out.allele_frequencies.shape[1] > 0
    # Attribute the end-to-end number: time the device scan alone (the
    # remainder is host prep + the panel h2d, which through the tunnel's
    # ~30 MB/s link is the larger share; on direct-attached hardware the
    # 33 MB upload is ~3 ms).
    import jax.numpy as jnp
    from genomicbreedingmodels_tpu.features.transform import _pairs_topk_single

    Xd = jnp.asarray(freq.astype(np.float32))
    ymd = jnp.asarray((y - y.mean()).astype(np.float32))
    okd = jnp.asarray(np.ones(l, bool))
    args = (Xd, ymd, okd, "mult", False, 1_000, 128)
    float(_pairs_topk_single(*args)[0][0])  # compile + warm
    t0 = time.perf_counter()
    float(_pairs_topk_single(*args)[0][0])
    dt_scan = time.perf_counter() - t0
    note(
        f"# epistasis stages: device scan={dt_scan:.2f}s "
        f"({l * l / dt_scan / 1e6:.0f}M pairs/s scan-only); end-to-end={dt:.2f}s "
        f"(rest = host prep + {n * l * 4 / 1e6:.0f} MB panel h2d over the tunnel)"
    )
    emit(
        f"epistasis pair-scan pairs/s (transform2 mult, n={n}, l={l}, "
        f"l^2={l * l / 1e6:.0f}M ordered pairs, 3-GEMM slopes + device top-k, "
        f"end-to-end warm incl. h2d; scan-only {l * l / dt_scan / 1e9:.2f}G pairs/s)",
        l * l / dt,
        "pairs/s",
    )


# ---------------------------------------------------------------------------
# CV wall-clock (replicated k-fold, batched fold-sharded engine)
# ---------------------------------------------------------------------------


def _format_cv_stages(timer) -> str:
    if timer is None:
        return "n/a"
    return " ".join(
        f"{k}={v['total_s']:.1f}s" for k, v in timer.summary().items()
    )


def bench_cv(on_tpu: bool) -> None:
    import numpy as np
    import genomicbreedingmodels_tpu as gbm
    from genomicbreedingmodels_tpu.cv.batched import cvbulk_batched

    if on_tpu:
        n, p, n_replications, n_folds = 2_048, 32_768, 3, 5
    else:
        n, p, n_replications, n_folds = 128, 1_024, 2, 3
    models = ("ridge", "gblup", "lasso")
    t_gen = time.perf_counter()
    rng = np.random.default_rng(11)
    # f32 from the start: halves host RAM AND the ~34 MB/s tunnel h2d cost.
    freq = rng.uniform(size=(n, p)).astype(np.float32)
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
    # Persistent-cache state BEFORE the warmup: attributes the warmup time
    # between XLA compiles (cold cache) and pure h2d+execute (warm cache) —
    # r4's unexplained 108.9 s warmup had no such evidence either way.
    cache_dir = os.environ.get("GBM_JAX_CACHE", "/tmp/gbm_jax_cache")
    try:
        cache_n = len(os.listdir(cache_dir))
    except OSError:
        cache_n = 0
    t_warm = time.perf_counter()
    cvbulk_batched(  # compile warmup (fold-mask shapes match the timed run)
        genomes, phenomes, models=models,
        n_replications=n_replications, n_folds=n_folds, store_effects=False,
    )
    t0 = time.perf_counter()
    from genomicbreedingmodels_tpu.cv import batched as _batched

    warm_stages = _format_cv_stages(_batched.LAST_TIMER)
    note(
        f"# cv stages: datagen={t_warm - t_gen:.1f}s warmup={t0 - t_warm:.1f}s "
        f"(persistent-cache entries before warmup: {cache_n}; warmup split: "
        f"{warm_stages})"
    )
    cvs, notes = cvbulk_batched(
        genomes, phenomes, models=models,
        n_replications=n_replications, n_folds=n_folds, store_effects=False,
    )
    dt = time.perf_counter() - t0
    note(f"# cv warm-run split: {_format_cv_stages(_batched.LAST_TIMER)}")
    assert len(cvs) >= n_replications * n_folds * len(models)
    emit(
        f"cvbulk wall-clock (n={n}, p={p}, {n_replications}x{n_folds} folds x "
        f"{len(models)} models = {len(cvs)} fits, batched, warm; panel+gram "
        "device-cached across calls since r5 — cold split in the stage note)",
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
    # Non-default kernel variants (pallas / bf16) have no round-1 number on
    # the same kernel: vs_baseline stays 1.0 rather than mixing kernels.
    emit(
        f"GRM+GBLUP SNPs/s/chip (n={n}, p={p}, "
        + ("pallas int8" if use_pallas else "bf16")
        + ")",
        snps_per_s,
        "SNPs/s",
        vs_baseline=1.0,
    )


SECTIONS = {
    "headline": bench_headline,
    "linkprobe": bench_linkprobe,
    "northstar": bench_northstar,
    "sampler": bench_sampler,
    "samplerbig": bench_sampler_big,
    "gwas": bench_gwas,
    "cv": bench_cv,
    "diskstream": bench_diskstream,
    "epistasis": bench_epistasis,
}

# Minimum seconds a section realistically needs (compile + run through the
# tunnel); used by the budget guard to decide skips. Priority = dict order of
# SECTIONS (headline always runs; cv sits before diskstream/epistasis so a
# congested run sheds the sections whose story the link probe already tells).
SECTION_FLOOR = {
    "headline": 0,
    "linkprobe": 15,
    "northstar": 90,
    "sampler": 150,
    "samplerbig": 90,
    "gwas": 70,
    "cv": 100,
    "diskstream": 130,
    "epistasis": 60,
}
SECTION_CAP = 600  # hard per-section subprocess timeout ceiling


def _run_section(names: str) -> None:
    """Run one or more (comma-separated) sections in THIS process.

    Sections are grouped so the suite pays jax/tunnel backend init as few
    times as possible — observed init is bimodal through the axon tunnel
    (~15 s normally, 100-500 s under congestion), and with one subprocess
    per section a congested evening spent the whole 540 s budget on inits
    alone. Between sections the group honors the parent's absolute deadline
    (GBM_BENCH_DEADLINE, epoch seconds) minus each section's floor. A
    failure in one section is caught and the group moves on (the reason the
    groups are still separate processes at all is HBM poisoning: a
    RESOURCE_EXHAUSTED once wedged every subsequent device call in-process).
    """
    import jax

    # Persistent compilation cache: the big sampler/CV programs take minutes
    # to compile through the tunnel but hit this cache across processes
    # (measured 23.8 s -> 1.2 s on a 4-GEMM probe), so a bench run on a
    # machine that has compiled these shapes before pays none of it.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("GBM_JAX_CACHE", "/tmp/gbm_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    if os.environ.get("GBM_BENCH_FORCE_CPU", "0") == "1":
        # The site config pins jax_platforms=axon,cpu; the env var alone
        # does not override it (see tests/conftest.py).
        jax.config.update("jax_platforms", "cpu")
    on_tpu = jax.devices()[0].platform == "tpu"
    deadline = float(os.environ.get("GBM_BENCH_DEADLINE", "0") or 0)
    for name in names.split(","):
        if deadline and name != "headline":
            remaining = deadline - time.time()
            if remaining < SECTION_FLOOR[name]:
                note(
                    f"# bench section {name} SKIPPED in-group: {remaining:.0f}s "
                    f"left < floor {SECTION_FLOOR[name]}s"
                )
                continue
        try:
            SECTIONS[name](on_tpu)
        except Exception as err:  # keep the rest of the group alive
            note(f"# bench section {name} failed in-group: {err!r:.300}")


def main() -> None:
    import subprocess

    # 720 s default: round 5 added the link probe, the at-size sampler, and
    # the honest 1000-sweep ESS windows (~+180 s of measured work); the
    # in-group deadline checks still shed tail sections first if the tunnel
    # is congested.
    budget = float(os.environ.get("GBM_BENCH_BUDGET", "720"))
    t_start = time.perf_counter()

    # Sections run in GROUPED subprocesses: groups isolate HBM poisoning (a
    # RESOURCE_EXHAUSTED once left the device allocator unusable for every
    # subsequent call in the same process) while paying the tunnel's jax
    # backend init — bimodal, ~15 s normal but 100-500 s under congestion —
    # only once per group instead of once per section.
    #
    # The HEADLINE runs FIRST in its own subprocess (so it survives any
    # outer wall-clock kill of the full suite) and its line is RE-EMITTED
    # after every group so the LAST printed JSON line is always the
    # headline metric.
    if os.environ.get("GBM_BENCH_HEADLINE_ONLY", "0") == "1":
        groups = [["headline"]]
    else:
        # TWO processes total: the guaranteed headline, then every other
        # section sharing ONE backend init (the dominant cost under tunnel
        # congestion). A section that wedges the device allocator only
        # costs the sections after it — each is try/except'd in-group —
        # which is no worse than the timeout it would otherwise cause.
        groups = [
            ["headline"],
            ["linkprobe", "northstar", "sampler", "samplerbig", "gwas", "cv",
             "diskstream", "epistasis"],
        ]
        if os.environ.get("GBM_BENCH_DISK", "1") == "0":
            groups[1].remove("diskstream")
    headline_line = None
    for gi, group in enumerate(groups):
        remaining = budget - (time.perf_counter() - t_start)
        group = [
            nm for nm in group
            if nm == "headline" or remaining >= SECTION_FLOOR[nm]
        ] or None
        if group is None:
            note(
                f"# bench group SKIPPED: {remaining:.0f}s left of "
                f"GBM_BENCH_BUDGET={budget:.0f}s under every section floor"
            )
            continue
        is_headline = group == ["headline"]
        if is_headline:
            timeout_s = SECTION_CAP
        else:
            # Split what's left across this and the LATER non-headline
            # groups, weighted by their floor sums, so an early group cannot
            # starve the rest of the suite.
            my_floor = sum(SECTION_FLOOR[nm] for nm in group)
            later_floor = sum(
                SECTION_FLOOR[nm] for g in groups[gi + 1:] for nm in g
            )
            share = remaining * my_floor / max(my_floor + later_floor, 1)
            # Clamp to the documented hard per-section ceiling: with a raised
            # GBM_BENCH_BUDGET an unclamped share would let one wedged group
            # run arbitrarily long past SECTION_CAP x its section count.
            timeout_s = max(60, min(share, SECTION_CAP * len(group)))
        env = dict(os.environ)
        env["GBM_BENCH_DEADLINE"] = str(time.time() + timeout_s)
        try:
            r = subprocess.run(
                [sys.executable, __file__, "--section", ",".join(group)],
                timeout=timeout_s,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
                env=env,
            )
            out = (r.stdout or "").strip()
            if out:
                print(out, flush=True)
            for ln in (r.stderr or "").splitlines():
                if ln.startswith("#"):  # stage/skip notes only, not tracebacks
                    note(ln)
            if is_headline and out:
                headline_line = out.splitlines()[-1]
            if r.returncode != 0:
                note(f"# bench group {group} failed: exit {r.returncode}")
        except subprocess.TimeoutExpired as e:
            # Salvage whatever the group printed before the deadline —
            # sections emit (flushed) as they finish, so finished sections'
            # metrics survive the kill.
            out = e.stdout or b""
            if isinstance(out, bytes):
                out = out.decode(errors="replace")
            out = out.strip()
            if out:
                print(out, flush=True)
            note(f"# bench group {group} timed out after {timeout_s:.0f}s")
        if not is_headline and headline_line:
            print(headline_line, flush=True)
    if headline_line is None:
        # The parse contract promises the last stdout line is the headline
        # JSON; if the headline subprocess itself died, say so in-band with a
        # sentinel metric rather than leaving a section metric last.
        emit("GRM+GBLUP SNPs/s/chip (headline FAILED; see stderr)", 0.0, "SNPs/s", 0.0)


def _run_parity() -> None:
    # Accuracy ledger, not throughput: force CPU (deterministic, no tunnel)
    # and emit one JSON row per model-vs-f64-oracle measurement. Feeds
    # PARITY.md via scripts/update_parity_md.py.
    import jax

    jax.config.update("jax_platforms", "cpu")
    from genomicbreedingmodels_tpu.parity import run_parity_ledger

    rows = run_parity_ledger()
    bad = [r for r in rows if not r["pass"]]
    if bad:
        note(f"# parity FAILURES: {[r['model'] for r in bad]}")
        sys.exit(1)


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "--parity":
        _run_parity()
    elif len(sys.argv) >= 3 and sys.argv[1] == "--section":
        _run_section(sys.argv[2])
    else:
        main()
