"""Aux subsystems: config, logging timers, checkpoint/resume."""

import os

import numpy as np
import pytest

import genomicbreedingmodels_tpu as gbm
from genomicbreedingmodels_tpu.utils.checkpoint import (
    CVCheckpoint,
    job_signature,
    load_state,
    save_state,
)
from genomicbreedingmodels_tpu.utils.config import GBMConfig
from genomicbreedingmodels_tpu.utils.logging import StageTimer


def test_config_env_override(monkeypatch):
    monkeypatch.setenv("GBM_MCMC_BLOCK_SIZE", "64")
    monkeypatch.setenv("GBM_LAMBDA_MIN_RATIO", "0.05")
    cfg = GBMConfig.from_env()
    assert cfg.mcmc_block_size == 64
    assert cfg.lambda_min_ratio == 0.05


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2
    assert s["a"]["total_s"] >= 0


def test_save_load_state(tmp_path):
    path = str(tmp_path / "state.npz")
    state = {"b": np.arange(5.0), "key": np.asarray([1, 2], dtype=np.uint32)}
    save_state(path, state)
    back = load_state(path)
    assert np.array_equal(back["b"], state["b"])
    assert load_state(str(tmp_path / "missing.npz")) is None


def test_cv_checkpoint_resume(tmp_path, sim_small):
    genomes, phenomes, _ = sim_small
    path = str(tmp_path / "cv.ckpt")
    jobs = [
        dict(model="ols", idx_trait=0, idx_training=np.arange(60),
             idx_validation=np.arange(60, 80), replication="r1", fold="f1"),
        dict(model="ols", idx_trait=0, idx_training=np.arange(40),
             idx_validation=np.arange(80, 100), replication="r1", fold="f2"),
    ]
    cvs1 = gbm.cvdispatch(jobs, genomes, phenomes, checkpoint_path=path)
    assert len(cvs1) == 2
    ck = CVCheckpoint(path)
    assert len(ck) == 2
    # resume: results come from the ledger (same values, no recompute)
    cvs2 = gbm.cvdispatch(jobs, genomes, phenomes, checkpoint_path=path)
    assert len(cvs2) == 2
    assert np.allclose(cvs1[0].y_pred, cvs2[0].y_pred)
    # signatures are order-stable and distinct
    assert job_signature(jobs[0]) != job_signature(jobs[1])
