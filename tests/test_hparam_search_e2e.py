"""End-to-end hyperparameter sweep (reference train.py:249-305,364): local
Bayesian controller, trial persistence + resume, results CSV, GP landscape
plot."""

import glob
import json
import os

import numpy as np
import pytest

from ab_line_classifier_tpu.config import Config
from ab_line_classifier_tpu.data.synthetic import generate_dataset

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def sweep_cfg(tmp_path_factory):
    ws = str(tmp_path_factory.mktemp("sweep_ws"))
    fcsv, ccsv, fdir = generate_dataset(ws, n_patients=10,
                                        clips_per_patient=2,
                                        frames_per_clip=3, hw=(32, 32),
                                        seed=9)
    from conftest import derive_workspace_config

    d = derive_workspace_config(ws, fcsv, ccsv, fdir)
    d["TRAIN"].update({"MODEL_DEF": "cnn0", "EPOCHS": 1, "BATCH_SIZE": 16,
                       "PATIENCE": 3, "MIXED_PRECISION": False})
    d["TRAIN"]["HPARAM_SEARCH"].update({"N_EVALS": 3, "METHOD": "bayes"})
    d["HPARAMS"]["CNN0"].update({"BLOCKS": 1, "INIT_FILTERS": 4,
                                 "NODES_DENSE0": 8})
    d["HPARAM_SEARCH"]["CNN0"] = {
        "LR": {"TYPE": "float_log", "RANGE": [1e-4, 1e-2]},
        "DROPOUT": {"TYPE": "float_uniform", "RANGE": [0.0, 0.5]}}
    return ws, Config(d)


@pytest.fixture(scope="module")
def completed_sweep(sweep_cfg):
    """The initial 3-trial sweep, run once — resume tests depend on this
    fixture (not on sibling-test ordering) so every test passes in
    isolation."""
    ws, cfg = sweep_cfg
    from ab_line_classifier_tpu.train.experiment import hparam_search

    out = hparam_search(cfg, verbose=False, sweep_id="sweep-test")
    return ws, cfg, out


def test_hparam_search_end_to_end(completed_sweep):
    ws, cfg, out = completed_sweep
    assert len(out["trials"]) == 3
    assert "LR" in out["best_params"] and "DROPOUT" in out["best_params"]
    # trial persistence (resumable sweeps)
    trials_path = ws + "/results/experiments/sweep-test.jsonl"
    assert os.path.isfile(trials_path)
    recs = [json.loads(l) for l in open(trials_path)]
    assert len(recs) == 3
    # results CSV + GP landscape plot
    assert glob.glob(ws + "/results/experiments/hparam_search_*.csv")
    assert glob.glob(ws + "/img/experiments/bayes_opt_*.png")


def test_hparam_search_resume_skips_done_trials(completed_sweep):
    ws, cfg, _ = completed_sweep
    from ab_line_classifier_tpu.train.experiment import hparam_search

    # same sweep_id: all 3 trials already recorded -> no new runs
    before = len(glob.glob(ws + "/results/runs/*"))
    out = hparam_search(cfg, verbose=False, sweep_id="sweep-test")
    after = len(glob.glob(ws + "/results/runs/*"))
    assert len(out["trials"]) == 3
    assert after == before


def test_hparam_search_resume_without_id_picks_latest(completed_sweep):
    """``--resume`` with no --sweep-id resumes the most recent sweep —
    previously a silent restart-from-trial-0."""
    ws, cfg, _ = completed_sweep
    from ab_line_classifier_tpu.train.experiment import hparam_search

    before = len(glob.glob(ws + "/results/runs/*"))
    out = hparam_search(cfg, verbose=False, resume=True)
    after = len(glob.glob(ws + "/results/runs/*"))
    assert len(out["trials"]) == 3
    assert after == before  # completed trials were reused, none re-ran


def test_cross_validation_resume_skips_done_folds(sweep_cfg, monkeypatch):
    """Serial cross_validation persists per-fold results and --resume picks
    up the most recent run, skipping completed folds (fold-granular resume,
    matching the sweep semantics)."""
    import pandas as pd

    from ab_line_classifier_tpu.train import experiment as E

    ws, cfg = sweep_cfg
    d = cfg.to_dict()
    d["TRAIN"]["N_FOLDS"] = 3
    cfg3 = Config(d)

    calls = []
    die_on_fold = [1]

    class _Interrupted(Exception):
        pass

    def fake_run(cfg_, fold_id=None, **kw):
        calls.append(fold_id)
        if fold_id in die_on_fold:
            raise _Interrupted  # die mid-run in fold 1 (first pass only)
        return E.RunResult(test_metrics={"accuracy": 0.5 + 0.1 * fold_id},
                           history=[], model_dir=None, best_val={})

    monkeypatch.setattr(E, "perform_single_run", fake_run)
    with pytest.raises(_Interrupted):
        E.cross_validation(cfg3, verbose=False, group="kfold-resume-test")
    assert calls == [0, 1]  # fold 0 completed + persisted, fold 1 died

    calls.clear()
    die_on_fold.clear()
    summary = E.cross_validation(cfg3, verbose=False, resume=True)
    assert calls == [1, 2]  # fold 0 skipped; latest run auto-selected
    folds = summary[summary["fold"].isin([0, 1, 2])]
    assert len(folds) == 3
    assert pd.notna(folds["accuracy"]).all()


def test_serial_cross_validation_resolves_fold_source_once(sweep_cfg,
                                                           monkeypatch):
    """The fold source is resolved ONCE per cross_validation run and
    threaded into every fold (kfold_tables): per-fold re-resolution of a
    'latest' W&B pin would re-fetch n_folds+1 times and could source the
    fold count and the per-fold tables from different artifact versions
    if 'latest' moved upstream mid-run."""
    from ab_line_classifier_tpu.train import experiment as E

    ws, cfg = sweep_cfg
    d = cfg.to_dict()
    d["TRAIN"]["N_FOLDS"] = 3
    cfg3 = Config(d)

    resolve_calls = []
    real_resolve = E.resolve_kfold_tables

    def counting_resolve(cfg_):
        resolve_calls.append(1)
        return real_resolve(cfg_)

    monkeypatch.setattr(E, "resolve_kfold_tables", counting_resolve)
    run_tables = []

    def fake_run(cfg_, fold_id=None, kfold_tables=None, **kw):
        run_tables.append(kfold_tables)
        return E.RunResult(test_metrics={"accuracy": 0.5}, history=[],
                           model_dir=None, best_val={})

    monkeypatch.setattr(E, "perform_single_run", fake_run)
    E.cross_validation(cfg3, verbose=False, group="kfold-once-test")
    assert len(resolve_calls) == 1
    # every fold received the SAME resolved tables object
    assert len(run_tables) == 3
    assert all(t is run_tables[0] and t is not None for t in run_tables)
