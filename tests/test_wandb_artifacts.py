"""W&B artifact-fetch adapter (mocked Api) -> local ArtifactStore layout.

Successor to reference ``src/train_utils.py:18-46`` (TrainValTest lineage
walk) and ``:162-235`` (k-fold artifact)."""

import os

import numpy as np
import pandas as pd
import pytest

from ab_line_classifier_tpu.data.artifacts import ArtifactStore
from ab_line_classifier_tpu.data.splits import k_fold_splits
from ab_line_classifier_tpu.data.synthetic import generate_dataset
from ab_line_classifier_tpu.data.wandb_artifacts import WandbArtifactFetcher


class FakeArtifact:
    def __init__(self, path, metadata):
        self._path = path
        self.metadata = metadata

    def download(self):
        return self._path


class FakeApi:
    def __init__(self, artifacts):
        self._artifacts = artifacts
        self.requested = []

    def artifact(self, name):
        self.requested.append(name)
        return self._artifacts[name]


@pytest.fixture()
def wandb_world(tmp_path):
    """A fake W&B artifact universe built from the synthetic dataset."""
    ws = str(tmp_path / "wandb_cache")
    fcsv, ccsv, fdir = generate_dataset(ws, n_patients=12,
                                        clips_per_patient=2,
                                        frames_per_clip=2, hw=(16, 16),
                                        seed=3)
    df = pd.read_csv(fcsv)

    images_dir = str(tmp_path / "dl_images")
    os.makedirs(os.path.join(images_dir, "frames"), exist_ok=True)
    df.to_csv(os.path.join(images_dir, "frames.csv"), index=False)
    pd.read_csv(ccsv).to_csv(os.path.join(images_dir, "clips_table.csv"),
                             index=False)
    # frame files live in the download cache's frames/ dir
    for f in os.listdir(fdir):
        os.link(os.path.join(fdir, f),
                os.path.join(images_dir, "frames", f))

    tvt_dir = str(tmp_path / "dl_tvt")
    os.makedirs(os.path.join(tvt_dir, "frames"), exist_ok=True)
    n = len(df)
    df.iloc[: n // 2].to_csv(os.path.join(tvt_dir, "frames", "train.csv"),
                             index=False)
    df.iloc[n // 2: 3 * n // 4].to_csv(
        os.path.join(tvt_dir, "frames", "val.csv"), index=False)
    df.iloc[3 * n // 4:].to_csv(os.path.join(tvt_dir, "frames", "test.csv"),
                                index=False)

    kf_dir = str(tmp_path / "dl_kfold")
    folds = k_fold_splits(df, 2, random_seed=42)
    for i, fold in enumerate(folds):
        os.makedirs(os.path.join(kf_dir, f"fold_{i}"), exist_ok=True)
        fold.to_csv(os.path.join(kf_dir, f"fold_{i}", "frames.csv"),
                    index=False)

    api = FakeApi({
        "Images:latest": FakeArtifact(images_dir, {}),
        "Images:v3": FakeArtifact(images_dir, {}),
        "TrainValTest:latest": FakeArtifact(
            tvt_dir, {"model_dev_artifact_version": "v1"}),
        "ModelDev:v1": FakeArtifact("", {"images_artifact_version": "v3"}),
        "KFoldCrossValidation:latest": FakeArtifact(
            kf_dir, {"n_folds": 2, "val_split": 0.34, "random_seed": 42,
                     # reference-logged lineage: the KFold artifact only
                     # names its PARENT ModelDev; the Images version comes
                     # from the ModelDev hop (like TrainValTest).
                     "model_dev_artifact_version": "v1"}),
    })
    return api, df


def test_fetch_train_val_test_walks_lineage(tmp_path, wandb_world):
    api, df = wandb_world
    store = ArtifactStore(str(tmp_path / "store"))
    fetcher = WandbArtifactFetcher(store, api=api)
    path = fetcher.fetch_train_val_test()
    assert os.path.isdir(path)
    # the lineage walk requested TrainValTest -> ModelDev -> Images:v3
    assert "ModelDev:v1" in api.requested
    assert "Images:v3" in api.requested

    # the local fetcher now serves it with no wandb in sight
    train, val, test, frames_dir = store.get_train_val_test_artifact()
    assert len(train) + len(val) + len(test) == len(df)
    assert frames_dir and os.path.isdir(frames_dir)
    assert os.path.isfile(os.path.join(
        frames_dir, os.path.basename(train["Frame Path"].iloc[0])))


def test_fetch_k_fold_serves_fold_artifacts(tmp_path, wandb_world):
    api, df = wandb_world
    store = ArtifactStore(str(tmp_path / "store"))
    fetcher = WandbArtifactFetcher(store, api=api)
    fetcher.fetch_k_fold()
    # Lineage walked KFold -> ModelDev:v1 -> Images:v3 (reference-logged
    # KFold artifacts carry only their parent ModelDev version; reading
    # Images 'latest' instead could pair fold tables with re-logged
    # frames).
    assert "ModelDev:v1" in api.requested
    assert "Images:v3" in api.requested
    assert store.get_n_folds() == 2
    train, val, test, frames_dir = store.get_fold_artifact(0)
    assert len(train) and len(val) and len(test)
    # fold 0's test set is disjoint from its train/val
    assert not set(test["Frame Path"]) & set(train["Frame Path"])
    assert frames_dir and os.path.isdir(frames_dir)


def test_fetch_k_fold_override_precedence(tmp_path, wandb_world):
    """val_split and random_seed resolve symmetrically: explicit caller
    value > artifact metadata > default."""
    import json

    api, _ = wandb_world
    store = ArtifactStore(str(tmp_path / "store"))
    fetcher = WandbArtifactFetcher(store, api=api)

    # artifact metadata: val_split=0.34, random_seed=42 (fixture)
    path = fetcher.fetch_k_fold(val_split=0.2, random_seed=7)
    with open(os.path.join(path, "metadata.json")) as f:
        meta = json.load(f)
    assert meta["val_split"] == 0.2 and meta["random_seed"] == 7

    path = fetcher.fetch_k_fold()
    with open(os.path.join(path, "metadata.json")) as f:
        meta = json.load(f)
    assert meta["val_split"] == 0.34 and meta["random_seed"] == 42


def test_pinned_images_fetch_is_memoized(tmp_path, wandb_world):
    """Re-walking a lineage whose Images version is pinned must serve the
    already-materialized local version instead of re-downloading and
    proliferating duplicate store versions; 'latest' always re-checks."""
    api, _ = wandb_world
    store = ArtifactStore(str(tmp_path / "store"))
    fetcher = WandbArtifactFetcher(store, api=api)

    fetcher.fetch_train_val_test()  # pins Images:v3 via the lineage walk
    n_before = len(store.versions("Images"))
    assert api.requested.count("Images:v3") == 1

    fetcher.fetch_train_val_test()  # same lineage again
    assert api.requested.count("Images:v3") == 1       # not re-downloaded
    assert len(store.versions("Images")) == n_before   # no duplicate version

    # unpinned 'latest' is never memoized (it can move upstream)
    fetcher.fetch_images("latest")
    fetcher.fetch_images("latest")
    assert api.requested.count("Images:latest") == 2


def test_latest_refetch_dedupes_identical_content(tmp_path, wandb_world):
    """'latest' always re-checks wandb (the alias can move upstream), but
    an unmoved upstream must not grow the store with identical copies —
    repeated sweeps/CV runs would otherwise accumulate one duplicate
    version per run. Changed upstream content still lands a NEW version."""
    api, df = wandb_world
    store = ArtifactStore(str(tmp_path / "store"))
    fetcher = WandbArtifactFetcher(store, api=api)

    p1, _ = fetcher.fetch_images("latest")
    p2, _ = fetcher.fetch_images("latest")
    assert api.requested.count("Images:latest") == 2  # re-checked upstream
    assert p2 == p1                                   # served the same version
    assert store.versions("Images") == ["v0"]         # no duplicate commit

    fetcher.fetch_train_val_test()
    fetcher.fetch_train_val_test()
    assert store.versions("TrainValTest") == ["v0"]
    # the lineage walk pinned Images:v3 — a DIFFERENT source, so it gets
    # its own version (pin materialization is not a duplicate of 'latest')
    assert store.versions("Images") == ["v0", "v1"]

    # upstream content moved: the next 'latest' fetch commits a new version
    # (compared against the newest version of the SAME source, not against
    # the interleaved v3 pin)
    images_dir = api._artifacts["Images:latest"].download()
    df.iloc[: len(df) - 1].to_csv(os.path.join(images_dir, "frames.csv"),
                                  index=False)
    p3, _ = fetcher.fetch_images("latest")
    assert p3 != p1
    assert store.versions("Images") == ["v0", "v1", "v2"]
    # and the moved content, re-fetched unchanged, dedupes again
    fetcher.fetch_images("latest")
    assert store.versions("Images") == ["v0", "v1", "v2"]


def test_project_prefix_and_missing_wandb(tmp_path, wandb_world):
    api, _ = wandb_world

    class PrefixApi(FakeApi):
        def artifact(self, name):
            assert name.startswith("team/proj/")
            return super().artifact(name.replace("team/proj/", "", 1))

    store = ArtifactStore(str(tmp_path / "store"))
    fetcher = WandbArtifactFetcher(store, project="team/proj",
                                   api=PrefixApi(api._artifacts))
    fetcher.fetch_images()

    with pytest.raises(ImportError, match="wandb is not installed"):
        WandbArtifactFetcher(store)
