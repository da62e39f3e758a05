"""W&B sweep-service backend (mocked wandb module).

Successor to reference ``src/train.py:249-305`` (sweep-config translation)
and ``:364`` (``wandb.agent`` as the trial scheduler)."""

import numpy as np
import pytest

from ab_line_classifier_tpu.train.wandb_sweep import (run_wandb_sweep,
                                                      wandb_sweep_config)
from tests.conftest import REPO_ROOT


def test_sweep_config_translation_matches_reference():
    """Exact reference mapping (train.py:281-295): set -> categorical,
    int_uniform, float_log -> log_uniform_values, float_uniform ->
    uniform; RANGE: null entries dropped."""
    search = {
        "LR": {"TYPE": "float_log", "RANGE": [1e-5, 1e-3]},
        "DROPOUT": {"TYPE": "float_uniform", "RANGE": [0.2, 0.5]},
        "BLOCKS": {"TYPE": "int_uniform", "RANGE": [1, 4]},
        "NODES_DENSE0": {"TYPE": "set", "RANGE": [16, 32, 64]},
        "UNUSED": {"TYPE": "set", "RANGE": None},
    }
    out = wandb_sweep_config("bayes", "maximize", "epoch/val_auc", search)
    assert out["method"] == "bayes"
    assert out["metric"] == {"goal": "maximize", "name": "epoch/val_auc"}
    p = out["parameters"]
    assert p["LR"] == {"distribution": "log_uniform_values",
                       "min": 1e-5, "max": 1e-3}
    assert p["DROPOUT"] == {"distribution": "uniform",
                            "min": 0.2, "max": 0.5}
    assert p["BLOCKS"] == {"distribution": "int_uniform", "min": 1, "max": 4}
    assert p["NODES_DENSE0"] == {"distribution": "categorical",
                                 "values": [16, 32, 64]}
    assert "UNUSED" not in p

    with pytest.raises(ValueError):
        wandb_sweep_config("bayes", "maximize", "m",
                           {"X": {"TYPE": "bogus", "RANGE": [0, 1]}})


class FakeRun:
    def __init__(self, config):
        self.config = config

    def finish(self):
        pass


class FakeWandb:
    """The sweep/agent/init/log surface the adapter touches. The agent
    samples LR from the registered space like the real service would."""

    def __init__(self):
        self.sweep_cfg = None
        self.logged = []
        self._next_config = None
        self.sweep_kwargs = None

    def sweep(self, sweep, project=None, entity=None):
        self.sweep_cfg = sweep
        self.sweep_kwargs = {"project": project, "entity": entity}
        return "sweep-xyz"

    def init(self, *a, **k):
        return FakeRun(self._next_config)

    def log(self, payload):
        self.logged.append(payload)

    def agent(self, sweep_id, function, count=None):
        self.agent_sweep_id = sweep_id
        rng = np.random.RandomState(0)
        if self.sweep_cfg is not None:
            lo = self.sweep_cfg["parameters"]["LR"]["min"]
            hi = self.sweep_cfg["parameters"]["LR"]["max"]
        else:  # attached to an existing sweep: the service owns the space
            lo, hi = 1e-5, 1e-3
        for _ in range(count):
            self._next_config = {
                "LR": float(np.exp(rng.uniform(np.log(lo), np.log(hi))))}
            function()


def test_run_wandb_sweep_drives_trials(tmp_path):
    """The agent's chosen params reach the trial runner; objectives are
    logged back under METRIC_NAME for the service to steer on."""
    from ab_line_classifier_tpu.config import Config, load_config
    import os

    d = load_config(os.path.join(REPO_ROOT, "config.yml")).to_dict()
    d["TRAIN"]["MODEL_DEF"] = "mobilenetv2"
    d["TRAIN"]["HPARAM_SEARCH"].update({"N_EVALS": 3, "METHOD": "bayes",
                                        "METRIC_GOAL": "maximize",
                                        "METRIC_NAME": "epoch/val_auc",
                                        "BACKEND": "wandb"})
    cfg = Config(d)

    seen = []

    class R:  # minimal RunResult stand-in
        def __init__(self, auc):
            self.best_val = {"val_auc": auc}
            self.test_metrics = {}

    def fake_run(cfg_, hparam_overrides=None, save_weights=False,
                 group=None, verbose=True):
        seen.append((dict(hparam_overrides), group))
        return R(auc=0.5 + hparam_overrides["LR"] * 100)

    fw = FakeWandb()
    out = run_wandb_sweep(cfg, wandb_module=fw, run_fn=fake_run,
                          verbose=False)
    assert out["sweep_id"] == "sweep-xyz"
    assert len(out["trials"]) == 3 and len(seen) == 3
    assert all(g == "sweep-xyz" for _, g in seen)
    assert fw.sweep_kwargs["project"] == d["WANDB"]["PROJECT_NAME"]
    # objective = the raw metric, logged under METRIC_NAME
    assert len(fw.logged) == 3
    for (params, _), logged, trial in zip(seen, fw.logged, out["trials"]):
        assert logged["epoch/val_auc"] == pytest.approx(
            0.5 + params["LR"] * 100)
        assert trial["objective"] == pytest.approx(0.5 + params["LR"] * 100)
    assert out["best"]["objective"] == max(t["objective"]
                                           for t in out["trials"])
    assert fw.agent_sweep_id == "sweep-xyz"
    # Unified result shape: the native hparam_search keys are present too,
    # so callers read one contract regardless of BACKEND.
    assert out["best_objective"] == out["best"]["objective"]
    assert out["best_params"] == {"LR": out["best"]["LR"]}


def test_run_wandb_sweep_attaches_to_existing_sweep():
    """sweep_id= attaches the agent to an existing service sweep (the W&B
    resume contract) instead of registering a new one."""
    from ab_line_classifier_tpu.config import Config, load_config
    import os

    d = load_config(os.path.join(REPO_ROOT, "config.yml")).to_dict()
    d["TRAIN"]["MODEL_DEF"] = "mobilenetv2"
    d["TRAIN"]["HPARAM_SEARCH"].update({"N_EVALS": 2, "METHOD": "bayes",
                                        "METRIC_GOAL": "maximize",
                                        "METRIC_NAME": "epoch/val_auc",
                                        "BACKEND": "wandb"})

    class R:
        best_val = {"val_auc": 0.7}
        test_metrics = {}

    fw = FakeWandb()
    out = run_wandb_sweep(Config(d), wandb_module=fw,
                          run_fn=lambda *a, **k: R(), verbose=False,
                          sweep_id="pre-existing-sweep")
    assert fw.sweep_cfg is None            # no new sweep registered
    assert fw.agent_sweep_id == "pre-existing-sweep"
    assert out["sweep_id"] == "pre-existing-sweep"
    assert len(out["trials"]) == 2


def test_attach_warns_when_local_config_disagrees_with_service():
    """Attaching to an existing sweep cross-checks the LOCAL METRIC_NAME /
    METHOD against the service sweep's registered config (via wandb.Api
    when available): a drifted local config.yml would otherwise log a
    metric the service optimizer is not steering on — silently."""
    from ab_line_classifier_tpu.config import Config, load_config
    import os

    d = load_config(os.path.join(REPO_ROOT, "config.yml")).to_dict()
    d["TRAIN"]["MODEL_DEF"] = "mobilenetv2"
    d["TRAIN"]["HPARAM_SEARCH"].update({"N_EVALS": 1, "METHOD": "bayes",
                                        "METRIC_GOAL": "maximize",
                                        "METRIC_NAME": "epoch/val_auc",
                                        "BACKEND": "wandb"})

    class R:
        best_val = {"val_auc": 0.7}
        test_metrics = {}

    class FakeApiSweep:
        config = {"metric": {"name": "epoch/val_loss", "goal": "minimize"},
                  "method": "grid"}

    class FakeApi:
        def sweep(self, sweep_id):
            assert sweep_id == "svc-sweep"
            return FakeApiSweep()

    fw = FakeWandb()
    fw.Api = FakeApi
    with pytest.warns(UserWarning) as rec:
        run_wandb_sweep(Config(d), wandb_module=fw,
                        run_fn=lambda *a, **k: R(), verbose=False,
                        sweep_id="svc-sweep")
    msgs = " | ".join(str(w.message) for w in rec)
    assert "epoch/val_loss" in msgs       # metric mismatch surfaced
    assert "grid" in msgs                 # method mismatch surfaced


def test_run_wandb_sweep_missing_metric_logs_fallback_under_own_name():
    """A minimize-goal sweep whose run produced no configured metric must
    NOT log the val_auc fallback (a maximize quantity) under METRIC_NAME
    with a flipped sign — the service would steer its bayes optimizer on a
    foreign quantity. The fallback is logged under its own name."""
    from ab_line_classifier_tpu.config import Config, load_config
    import os

    d = load_config(os.path.join(REPO_ROOT, "config.yml")).to_dict()
    d["TRAIN"]["MODEL_DEF"] = "mobilenetv2"
    d["TRAIN"]["HPARAM_SEARCH"].update({"N_EVALS": 1, "METHOD": "bayes",
                                        "METRIC_GOAL": "minimize",
                                        "METRIC_NAME": "epoch/val_loss",
                                        "BACKEND": "wandb"})

    class R:  # run that produced NO val_loss history
        best_val = {"val_auc": 0.8}
        test_metrics = {}

    fw = FakeWandb()
    out = run_wandb_sweep(Config(d), wandb_module=fw,
                          run_fn=lambda *a, **k: R(), verbose=False)
    assert fw.logged == [{"val_auc": 0.8}]
    # Local best-selection still uses the (maximize) fallback objective.
    assert out["best_objective"] == pytest.approx(0.8)

    # And with the metric PRESENT, the raw (unsigned) value goes to the
    # service under METRIC_NAME while the local objective is sign-flipped.
    class R2:
        best_val = {"val_loss": 0.31, "val_auc": 0.8}
        test_metrics = {}

    fw2 = FakeWandb()
    out2 = run_wandb_sweep(Config(d), wandb_module=fw2,
                           run_fn=lambda *a, **k: R2(), verbose=False)
    assert fw2.logged == [{"epoch/val_loss": pytest.approx(0.31)}]
    assert out2["best_objective"] == pytest.approx(-0.31)


def test_hparam_search_passes_sweep_id_to_wandb_backend(monkeypatch):
    """The dispatch in experiment.hparam_search must forward --sweep-id to
    the wandb backend (the service-side resume contract) instead of
    silently registering a fresh sweep."""
    import sys
    import types

    from ab_line_classifier_tpu.config import Config, load_config
    from ab_line_classifier_tpu.train.experiment import hparam_search
    import os

    fake = types.ModuleType("wandb")
    calls = {}

    def sweep(sweep, project=None, entity=None):
        calls["registered"] = True
        return "fresh-sweep"

    def agent(sweep_id, function, count=None):
        calls["agent_id"] = sweep_id  # run no trials: plumbing-only test

    fake.sweep, fake.agent = sweep, agent
    fake.init = lambda *a, **k: FakeRun({})
    fake.log = lambda payload: None
    monkeypatch.setitem(sys.modules, "wandb", fake)

    d = load_config(os.path.join(REPO_ROOT, "config.yml")).to_dict()
    d["TRAIN"]["MODEL_DEF"] = "mobilenetv2"
    d["TRAIN"]["HPARAM_SEARCH"].update({"N_EVALS": 0, "METHOD": "bayes",
                                        "BACKEND": "wandb"})
    out = hparam_search(Config(d), verbose=False, sweep_id="resume-me",
                        resume=True)
    assert calls == {"agent_id": "resume-me"}  # attached, nothing registered
    assert out["sweep_id"] == "resume-me"
    assert out["best_params"] is None  # unified shape even with no trials

    # --resume WITHOUT --sweep-id must fail fast: the service owns the
    # trial history, and silently registering a fresh sweep would re-run
    # every trial against the user's resume request.
    with pytest.raises(ValueError, match="sweep-id"):
        hparam_search(Config(d), verbose=False, resume=True)
    assert "registered" not in calls


def test_hparam_search_falls_back_without_wandb(tmp_path):
    """BACKEND: wandb with no wandb installed must fall back to the native
    controller, not crash (wandb is NOT a dependency)."""
    import os

    from ab_line_classifier_tpu.data.synthetic import generate_dataset
    from ab_line_classifier_tpu.train.experiment import hparam_search
    from ab_line_classifier_tpu.config import Config
    from conftest import derive_workspace_config

    ws = str(tmp_path)
    fcsv, ccsv, fdir = generate_dataset(ws, n_patients=12,
                                        clips_per_patient=2,
                                        frames_per_clip=2, hw=(32, 32),
                                        seed=4)
    d = derive_workspace_config(ws, fcsv, ccsv, fdir)
    d["TRAIN"].update({"MODEL_DEF": "cnn0", "EPOCHS": 1, "BATCH_SIZE": 16,
                       "PATIENCE": 2, "MIXED_PRECISION": False})
    d["HPARAMS"]["CNN0"].update({"BLOCKS": 1, "INIT_FILTERS": 4,
                                 "NODES_DENSE0": 8})
    d["TRAIN"]["HPARAM_SEARCH"].update({"N_EVALS": 1, "METHOD": "random",
                                        "BACKEND": "wandb"})
    d["HPARAM_SEARCH"]["CNN0"] = {
        "LR": {"TYPE": "float_log", "RANGE": [1e-4, 1e-3]}}
    out = hparam_search(Config(d), verbose=False)
    # Native-controller result shape (the fallback ran a real trial).
    assert out["best_params"] is not None
