import os

import pytest

from ab_line_classifier_tpu.config import (
    Config, ConfigError, load_config, validate_config)

from tests.conftest import REPO_ROOT

CONFIG_PATH = os.path.join(REPO_ROOT, "config.yml")


def test_load_repo_config():
    cfg = load_config(CONFIG_PATH)
    assert cfg.model_name in ("cutoffvgg16", "vgg16", "mobilenetv2",
                              "xception", "efficientnetb7", "cnn0",
                              "custom_resnetv2")
    assert cfg.img_dim == (128, 128)
    assert cfg.n_classes == 2
    assert cfg.classes == ["a_lines", "b_lines"]
    assert cfg.batch_size > 0


REFERENCE_CONFIG = "/root/reference/config.yml"


@pytest.mark.skipif(not os.path.isfile(REFERENCE_CONFIG),
                    reason="reference checkout not present")
def test_reference_config_loads_unchanged():
    """Drop-in config compatibility: the REFERENCE project's own config.yml
    (reference config.yml:1-197) loads, validates, and resolves through the
    same accessors a migrating user's scripts rely on — no edits needed."""
    cfg = load_config(REFERENCE_CONFIG)
    assert cfg.model_name == "cutoffvgg16"
    assert cfg["TRAIN"]["EXPERIMENT_TYPE"] == "single_train"
    assert cfg.img_dim == (128, 128)
    assert cfg.n_classes == 2
    assert cfg.classes == ["a_lines", "b_lines"]
    # Per-model hparams and search spaces resolve for the configured model.
    assert {"LR_EXTRACT", "LR_FINETUNE", "CUTOFF_LAYER",
            "FINETUNE_LAYER"} <= set(cfg.model_hparams())
    assert {"LR_EXTRACT", "LR_FINETUNE"} <= set(cfg.hparam_search_space())
    # Every model in the reference zoo has an hparam block we can resolve.
    for name in ("cutoffvgg16", "vgg16", "mobilenetv2", "xception",
                 "efficientnetb7", "cnn0", "custom_resnetv2"):
        assert cfg.model_hparams(name), name


def test_schema_sections_present():
    cfg = load_config(CONFIG_PATH)
    for section in ("PATHS", "WANDB", "DATA", "TRAIN", "CLIP_PREDICTION",
                    "HPARAMS", "HPARAM_SEARCH", "EXPLAINABILITY"):
        assert section in cfg, section


def test_model_hparams():
    cfg = load_config(CONFIG_PATH)
    hp = cfg.model_hparams("cutoffvgg16")
    assert hp["CUTOFF_LAYER"] == 10
    assert hp["FINETUNE_LAYER"] == 7


def test_invalid_model_rejected():
    cfg = load_config(CONFIG_PATH)
    bad = cfg.replace_path("TRAIN.MODEL_DEF", "nope")
    with pytest.raises(ConfigError):
        validate_config(bad.to_dict())


def test_missing_wandb_section_rejected():
    """Every experiment path dereferences WANDB.ARTIFACT_SEED (the split
    seed); validation must reject what runtime rejects instead of blessing
    a config that raises KeyError at resolve_datasets."""
    cfg = load_config(CONFIG_PATH)
    d = cfg.to_dict()
    del d["WANDB"]
    with pytest.raises(ConfigError, match="WANDB"):
        validate_config(d)
    d = cfg.to_dict()
    del d["WANDB"]["ARTIFACT_SEED"]
    with pytest.raises(ConfigError, match="ARTIFACT_SEED"):
        validate_config(d)


def test_invalid_clip_algorithm_rejected():
    cfg = load_config(CONFIG_PATH)
    bad = cfg.replace_path("CLIP_PREDICTION.ALGORITHM", "median")
    with pytest.raises(ConfigError):
        validate_config(bad.to_dict())


def test_config_read_only():
    cfg = load_config(CONFIG_PATH)
    with pytest.raises(TypeError):
        cfg.TRAIN = {}


def test_replace_derives_new_config():
    cfg = load_config(CONFIG_PATH)
    original = cfg.batch_size
    assert original != 8  # the derived value must be distinguishable
    cfg2 = cfg.replace_path("TRAIN.BATCH_SIZE", 8)
    assert cfg2.batch_size == 8
    assert cfg.batch_size == original  # original untouched
    assert cfg["TRAIN"]["BATCH_SIZE"] == cfg.TRAIN.BATCH_SIZE


def test_n_classes_mismatch_rejected():
    cfg = load_config(CONFIG_PATH)
    bad = cfg.replace_path("TRAIN.N_CLASSES", 5)
    with pytest.raises(ConfigError):
        validate_config(bad.to_dict())


def test_model_names_match_registry():
    """config.MODEL_NAMES (used by validate_config) is a hand-kept copy of
    the model registry's names (config.py stays import-light, so it cannot
    import the registry): this pin keeps the two from drifting — a name in
    only one list either rejects a valid MODEL_DEF or lets an invalid one
    silently fall back to cnn0 (registry.py:41)."""
    from ab_line_classifier_tpu.config import MODEL_NAMES as CONFIG_NAMES
    from ab_line_classifier_tpu.models.registry import (
        MODEL_NAMES as REGISTRY_NAMES)

    assert set(CONFIG_NAMES) == set(REGISTRY_NAMES)
