import os

import pandas as pd
import pytest

from ab_line_classifier_tpu.config import load_config
from ab_line_classifier_tpu.data.artifacts import ArtifactStore
from ab_line_classifier_tpu.data.splits import leakage_check
from ab_line_classifier_tpu.data.synthetic import generate_dataset

from tests.conftest import REPO_ROOT


@pytest.fixture(scope="module")
def lineage(tmp_path_factory):
    ws = str(tmp_path_factory.mktemp("artifacts_ws"))
    fcsv, ccsv, fdir = generate_dataset(ws, n_patients=25,
                                        clips_per_patient=2,
                                        frames_per_clip=3, hw=(32, 32))
    cfg = load_config(os.path.join(REPO_ROOT, "config.yml"))
    store = ArtifactStore(os.path.join(ws, "artifacts"))
    store.log_images(fcsv, ccsv, frames_dir=fdir)
    store.log_model_dev_holdout(cfg)
    store.log_train_val_test(cfg)
    store.log_k_fold_cross_val(cfg)
    return store, cfg, fdir


def test_lineage_versions(lineage):
    store, _, _ = lineage
    for name in ("Images", "ModelDev", "Holdout", "TrainValTest",
                 "KFoldCrossValidation"):
        assert store.versions(name) == ["v0"], name


def test_provenance_chain(lineage):
    store, _, _ = lineage
    tvt_meta = store.metadata("TrainValTest")
    assert tvt_meta["model_dev_artifact_version"] == "v0"
    md_meta = store.metadata("ModelDev")
    assert md_meta["images_artifact_version"] == "v0"


def test_train_val_test_fetch(lineage):
    store, _, fdir = lineage
    train, val, test, frames_dir = store.get_train_val_test_artifact()
    assert frames_dir == os.path.abspath(fdir)
    assert leakage_check(train, val, test)
    assert len(train) > 0 and len(val) > 0 and len(test) > 0


def test_holdout_never_in_model_dev(lineage):
    store, _, _ = lineage
    dev = pd.read_csv(os.path.join(store.resolve("ModelDev"), "frames.csv"))
    hold = pd.read_csv(os.path.join(store.resolve("Holdout"), "frames.csv"))
    assert leakage_check(dev, hold)


def test_fold_fetch(lineage):
    store, _, _ = lineage
    n = store.get_n_folds()
    assert n == 5
    train, val, test, _ = store.get_fold_artifact(1)
    assert leakage_check(train, val, test)
    # fold fetch is deterministic
    train2, _, test2, _ = store.get_fold_artifact(1)
    pd.testing.assert_frame_equal(train, train2)
    pd.testing.assert_frame_equal(test, test2)


def test_version_increment(lineage, tmp_path):
    # Own store: mutating the shared `lineage` fixture would couple
    # sibling tests to execution order (test_lineage_versions asserts the
    # shared store's exact version list).
    shared, _, _ = lineage
    src = shared.resolve("Images")
    store = ArtifactStore(str(tmp_path / "artifacts"))
    for _ in range(2):
        store.log_images(os.path.join(src, "frames.csv"),
                         os.path.join(src, "clips_table.csv"))
    assert store.versions("Images") == ["v0", "v1"]
    assert store.resolve("Images").endswith("v1")


def test_missing_artifact_raises(tmp_path):
    store = ArtifactStore(str(tmp_path))
    with pytest.raises(FileNotFoundError):
        store.resolve("TrainValTest")


def test_crashed_log_never_resolves_as_latest(tmp_path):
    """A version dir without metadata.json is a log that crashed mid-write
    (every logger commits metadata LAST): it must be invisible to
    resolution, and the next log must reclaim the slot WITHOUT inheriting
    the crashed attempt's leftover files."""
    ws = str(tmp_path)
    fcsv, ccsv, fdir = generate_dataset(ws, n_patients=6,
                                        clips_per_patient=1,
                                        frames_per_clip=2, hw=(16, 16))
    store = ArtifactStore(os.path.join(ws, "artifacts"))
    good = store.log_images(fcsv, ccsv, frames_dir=fdir)
    assert good.endswith("v0")

    # Simulate a crash: v1 exists with data but no metadata commit marker.
    partial = os.path.join(store.root, "Images", "v1")
    os.makedirs(partial)
    with open(os.path.join(partial, "stale_leftover.csv"), "w") as f:
        f.write("junk")

    assert store.versions("Images") == ["v0"]
    assert store.resolve("Images") == good

    relog = store.log_images(fcsv, ccsv, frames_dir=fdir)
    assert relog.endswith("v1")
    assert not os.path.exists(os.path.join(relog, "stale_leftover.csv"))
    assert store.resolve("Images") == relog
    assert store.metadata("Images")["artifact_version"] == "v1"
    assert not os.path.exists(os.path.join(relog, "metadata.json.tmp"))


def test_pinned_version_requires_commit_marker(tmp_path):
    """resolve(name, 'vN') honors the metadata.json commit marker exactly
    like 'latest' — naming a torn version explicitly must not admit it."""
    ws = str(tmp_path)
    fcsv, ccsv, fdir = generate_dataset(ws, n_patients=6,
                                        clips_per_patient=1,
                                        frames_per_clip=2, hw=(16, 16))
    store = ArtifactStore(os.path.join(ws, "artifacts"))
    store.log_images(fcsv, ccsv, frames_dir=fdir)
    partial = os.path.join(store.root, "Images", "v1")
    os.makedirs(partial)
    assert store.resolve("Images", "v0")  # committed: pinned fetch works
    with pytest.raises(FileNotFoundError):
        store.resolve("Images", "v1")


def test_fold_artifact_metadata_beats_config(tmp_path):
    """A pre-materialized fold artifact is read with ITS OWN n_folds /
    val_split / seed (log_k_fold_cross_val metadata), not the current
    config's — a config later edited to fewer folds must not silently drop
    the artifact's remaining folds from every split."""
    import yaml

    from ab_line_classifier_tpu.config import Config
    from ab_line_classifier_tpu.train.experiment import resolve_datasets
    from tests.conftest import REPO_ROOT, derive_workspace_config

    ws = str(tmp_path)
    fcsv, ccsv, fdir = generate_dataset(ws, n_patients=16,
                                        clips_per_patient=1,
                                        frames_per_clip=2, hw=(16, 16))
    d = derive_workspace_config(ws, fcsv, ccsv, fdir)
    d["TRAIN"]["N_FOLDS"] = 4
    store = ArtifactStore(os.path.join(ws, "artifacts"))
    store.log_images(fcsv, ccsv, frames_dir=fdir)
    store.log_model_dev_holdout(Config(d))
    kfold_path = store.log_k_fold_cross_val(Config(d))

    # Config drifts to 2 folds; the artifact says 4.
    d["TRAIN"]["N_FOLDS"] = 2
    d["PATHS"]["K_FOLDS_SPLIT_PATH"] = kfold_path
    tr, va, te, _ = resolve_datasets(Config(d), fold_id=0)

    total = sum(len(pd.read_csv(os.path.join(kfold_path, f"fold_{i}",
                                             "frames.csv")))
                for i in range(4))
    assert len(tr) + len(va) + len(te) == total  # all 4 folds partitioned
