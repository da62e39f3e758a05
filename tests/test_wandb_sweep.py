"""W&B sweep-service backend (mocked wandb module).

Successor to reference ``src/train.py:249-305`` (sweep-config translation)
and ``:364`` (``wandb.agent`` as the trial scheduler)."""

import numpy as np
import pytest

from ab_line_classifier_tpu.train.wandb_sweep import (run_wandb_sweep,
                                                      wandb_sweep_config)


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
        assert sweep_id == "sweep-xyz"
        rng = np.random.RandomState(0)
        lo = self.sweep_cfg["parameters"]["LR"]["min"]
        hi = self.sweep_cfg["parameters"]["LR"]["max"]
        for _ in range(count):
            self._next_config = {
                "LR": float(np.exp(rng.uniform(np.log(lo), np.log(hi))))}
            function()


def test_run_wandb_sweep_drives_trials(tmp_path):
    """The agent's chosen params reach the trial runner; objectives are
    logged back under METRIC_NAME for the service to steer on."""
    from ab_line_classifier_tpu.config import Config, load_config
    import os

    REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
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
