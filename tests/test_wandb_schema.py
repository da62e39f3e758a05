"""Structural validation of the W&B sweep-config translation — no wandb.

wandb is not installed here (see docs/OPTIONAL_DEPS.md), so
``wandb_sweep_config``'s output can only be validated structurally: this
module vendors the published sweep-configuration schema constants (from
docs.wandb.ai/guides/sweeps/define-sweep-configuration and wandb's
``sweep-config-jsonschema``) and checks every translated config against
them. A drifted distribution name or a missing required field fails here
in CI instead of at ``wandb.sweep()`` time on the user's machine.

Reference mapping under test: ``configure_hyperparameter_sweep``
(reference ``src/train.py:268-296``).
"""

import os

import pytest

from ab_line_classifier_tpu.config import load_config
from ab_line_classifier_tpu.train.wandb_sweep import wandb_sweep_config
from conftest import REPO_ROOT

# ---- vendored W&B sweep-configuration schema constants ----------------
SWEEP_METHODS = {"grid", "random", "bayes"}
METRIC_GOALS = {"minimize", "maximize"}
TOP_LEVEL_KEYS = {"program", "method", "metric", "parameters", "name",
                  "description", "early_terminate", "command", "project",
                  "entity", "run_cap"}
DISTRIBUTIONS = {
    "constant", "categorical", "int_uniform", "uniform", "q_uniform",
    "log_uniform", "log_uniform_values", "q_log_uniform",
    "q_log_uniform_values", "inv_log_uniform", "inv_log_uniform_values",
    "normal", "q_normal", "log_normal", "q_log_normal", "beta", "q_beta",
}
#: required keys per distribution family (min/max for the uniform family,
#: values for categorical, value for constant, mu/sigma for normals).
REQUIRED_KEYS = {
    "categorical": {"values"},
    "constant": {"value"},
    "int_uniform": {"min", "max"},
    "uniform": {"min", "max"},
    "q_uniform": {"min", "max"},
    "log_uniform": {"min", "max"},
    "log_uniform_values": {"min", "max"},
    "q_log_uniform": {"min", "max"},
    "q_log_uniform_values": {"min", "max"},
    "inv_log_uniform": {"min", "max"},
    "inv_log_uniform_values": {"min", "max"},
    "normal": {"mu", "sigma"},
    "q_normal": {"mu", "sigma"},
    "log_normal": {"mu", "sigma"},
    "q_log_normal": {"mu", "sigma"},
}
#: distributions whose min/max must satisfy numeric constraints.
POSITIVE_MIN = {"log_uniform_values", "q_log_uniform_values",
                "inv_log_uniform_values"}


def assert_schema_valid(config: dict) -> None:
    """The vendored subset of wandb's sweep-config jsonschema."""
    assert set(config) <= TOP_LEVEL_KEYS, set(config) - TOP_LEVEL_KEYS
    assert config["method"] in SWEEP_METHODS, config["method"]
    metric = config["metric"]
    assert metric["goal"] in METRIC_GOALS, metric
    assert isinstance(metric["name"], str) and metric["name"]
    params = config["parameters"]
    assert isinstance(params, dict) and params
    for name, pcfg in params.items():
        dist = pcfg.get("distribution")
        assert dist in DISTRIBUTIONS, (name, dist)
        missing = REQUIRED_KEYS[dist] - set(pcfg)
        assert not missing, (name, dist, missing)
        if "min" in REQUIRED_KEYS[dist]:
            lo, hi = pcfg["min"], pcfg["max"]
            assert lo < hi, (name, lo, hi)
            if dist.startswith("int_"):
                assert isinstance(lo, int) and isinstance(hi, int), (name,
                                                                     pcfg)
            if dist in POSITIVE_MIN:
                assert lo > 0, (name, lo)  # log-space needs positive bounds
        if dist == "categorical":
            assert isinstance(pcfg["values"], list) and pcfg["values"]


def test_every_type_translates_schema_valid():
    cfg = wandb_sweep_config(
        "bayes", "maximize", "epoch/val_auc",
        {"LR": {"TYPE": "float_log", "RANGE": [1e-5, 1e-2]},
         "DROPOUT": {"TYPE": "float_uniform", "RANGE": [0.1, 0.6]},
         "NODES_DENSE0": {"TYPE": "set", "RANGE": [16, 32, 64]},
         "BLOCKS": {"TYPE": "int_uniform", "RANGE": [1, 4]}})
    assert_schema_valid(cfg)
    assert cfg["parameters"]["LR"]["distribution"] == "log_uniform_values"
    assert cfg["parameters"]["NODES_DENSE0"]["distribution"] == "categorical"


@pytest.mark.parametrize("model", ["MOBILENETV2", "CUTOFFVGG16", "XCEPTION",
                                   "VGG16", "EFFICIENTNETB7", "CNN0",
                                   "CUSTOM_RESNETV2"])
def test_real_config_search_sections_translate_schema_valid(model):
    """Every HPARAM_SEARCH section shipped in config.yml must produce a
    schema-valid sweep config (skipping models without a section, like the
    reference's vestigial ones)."""
    d = load_config(os.path.join(REPO_ROOT, "config.yml")).to_dict()
    section = d.get("HPARAM_SEARCH", {}).get(model)
    if not section:
        pytest.skip(f"no HPARAM_SEARCH section for {model}")
    search = d["TRAIN"]["HPARAM_SEARCH"]
    cfg = wandb_sweep_config(search["METHOD"]
                             if search.get("METHOD") in SWEEP_METHODS
                             else "bayes",
                             search.get("METRIC_GOAL", "maximize"),
                             search.get("METRIC_NAME", "epoch/val_auc"),
                             section)
    if not cfg["parameters"]:
        pytest.skip(f"{model} section has no RANGE'd variables")
    assert_schema_valid(cfg)
