"""W&B artifact *publish* side (mocked wandb module) + produce/consume loop.

Successor to reference ``src/data/artifact_logging.py``: ``log_images``
(:54-84), ``log_dev_and_holdout`` (:87-148), ``log_train_val_test``
(:186-263), ``log_k_fold_cross_val`` (:266-332), and the flag-gated
``__main__`` (:394-412). The round-trip tests close the loop offline:
what :class:`WandbArtifactLogger` publishes is exactly what the existing
:class:`WandbArtifactFetcher` (mock-tested in ``test_wandb_artifacts.py``)
materializes back into a fresh local store.
"""

import os
import shutil

import pandas as pd
import pytest

from ab_line_classifier_tpu.config import load_config
from ab_line_classifier_tpu.data.artifacts import (
    ArtifactStore, HOLDOUT, IMAGES, K_FOLD, MODEL_DEV, TRAIN_VAL_TEST)
from ab_line_classifier_tpu.data.synthetic import generate_dataset
from ab_line_classifier_tpu.data.wandb_artifacts import (
    WandbArtifactFetcher, WandbArtifactLogger, publish_all)

from tests.conftest import REPO_ROOT


# ---------------------------------------------------------------------------
# Fake wandb module: a tiny in-memory artifact server with real file
# materialization, so the fetch side can download what the publish side
# staged. API surface = exactly what the logger/fetcher touch.
# ---------------------------------------------------------------------------

class _ServerArtifact:
    """A committed server-side artifact version."""

    def __init__(self, name, type_, description, metadata, files_dir,
                 version):
        self.name = name
        self.type = type_
        self.description = description
        self.metadata = metadata
        self.version = version
        self._dir = files_dir

    def download(self):
        return self._dir

    def get_path(self, name):
        art = self

        class _Path:
            def download(self):
                return os.path.join(art._dir, name)

        return _Path()

    def wait(self):
        return self


class _StagedArtifact:
    """Client-side wandb.Artifact: stages add_file/add_dir calls."""

    def __init__(self, name, type=None, description=None, metadata=None):
        self.name = name
        self.type = type
        self.description = description
        self.metadata = dict(metadata or {})
        self.adds = []  # (kind, local_path, artifact_path)

    def add_file(self, local_path, name=None):
        assert os.path.isfile(local_path), local_path
        self.adds.append(("file", local_path,
                          name or os.path.basename(local_path)))

    def add_dir(self, local_path, name=None):
        assert os.path.isdir(local_path), local_path
        self.adds.append(("dir", local_path, name or ""))


class _Run:
    def __init__(self, server, project, entity, job_type):
        self.server = server
        self.project = project
        self.entity = entity
        self.job_type = job_type
        self.used = []

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def use_artifact(self, spec):
        self.used.append(spec)
        return self.server.resolve(spec)

    def log_artifact(self, artifact):
        return self.server.commit(artifact)


class FakeWandbModule:
    """Module-like object: ``init``/``Artifact`` plus a queryable server."""

    Artifact = _StagedArtifact

    def __init__(self, root):
        self.root = root
        self.artifacts = {}   # name -> [ _ServerArtifact, ... ]
        self.runs = []

    def init(self, project=None, entity=None, job_type=None):
        run = _Run(self, project, entity, job_type)
        self.runs.append(run)
        return run

    def resolve(self, spec):
        name, _, version = spec.partition(":")
        versions = self.artifacts[name]
        if version in ("", "latest"):
            return versions[-1]
        return next(a for a in versions if a.version == version)

    def commit(self, staged):
        versions = self.artifacts.setdefault(staged.name, [])
        vid = f"v{len(versions)}"
        files_dir = os.path.join(self.root, staged.name, vid)
        os.makedirs(files_dir, exist_ok=True)
        for kind, local, artpath in staged.adds:
            dest = os.path.join(files_dir, artpath.rstrip("/"))
            if kind == "file":
                os.makedirs(os.path.dirname(dest), exist_ok=True)
                shutil.copy(local, dest)
            else:
                shutil.copytree(local, dest, dirs_exist_ok=True)
        art = _ServerArtifact(staged.name, staged.type, staged.description,
                              staged.metadata, files_dir, vid)
        versions.append(art)
        return art

    # fetch-side Api view over the same universe
    def as_api(self):
        server = self

        class _Api:
            def artifact(self, spec):
                return server.resolve(spec)

        return _Api()


# ---------------------------------------------------------------------------
# Fixtures
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def local_lineage(tmp_path_factory):
    """A committed local lineage (the publish source of truth)."""
    ws = str(tmp_path_factory.mktemp("pub_ws"))
    fcsv, ccsv, fdir = generate_dataset(ws, n_patients=25,
                                        clips_per_patient=2,
                                        frames_per_clip=2, hw=(16, 16),
                                        seed=11)
    cfg = load_config(os.path.join(REPO_ROOT, "config.yml"))
    store = ArtifactStore(os.path.join(ws, "artifacts"))
    store.log_images(fcsv, ccsv, frames_dir=fdir)
    store.log_model_dev_holdout(cfg)
    store.log_train_val_test(cfg)
    store.log_k_fold_cross_val(cfg)
    return store, cfg


@pytest.fixture()
def published(tmp_path, local_lineage):
    """The local lineage published through the logger into a fake server."""
    store, cfg = local_lineage
    wandb = FakeWandbModule(str(tmp_path / "wandb_server"))
    logger = WandbArtifactLogger(store, project="ab_line", entity="team",
                                 wandb_module=wandb)
    logger.log_images()
    logger.log_model_dev_holdout()
    logger.log_train_val_test()
    logger.log_k_fold_cross_val()
    return store, cfg, wandb


# ---------------------------------------------------------------------------
# Publish-surface parity with the reference artifact hub
# ---------------------------------------------------------------------------

def test_published_names_types_and_metadata_keys(published):
    """Artifact names, type='dataset', and metadata keys match the
    reference's hub surface (artifact_logging.py:66-76, 355-363, 248-258,
    292-302) — what a reference-side consumer queries by."""
    _, _, wandb = published
    expected_meta_keys = {
        IMAGES: {"automask_version", "automask_output_format",
                 "automask_edge_preserve", "automask_save_cropped_roi"},
        MODEL_DEV: {"images_artifact_version", "holdout_split",
                    "random_seed"},
        HOLDOUT: {"images_artifact_version", "holdout_split", "random_seed"},
        TRAIN_VAL_TEST: {"model_dev_artifact_version", "random_seed",
                         "val_split", "test_split"},
        K_FOLD: {"model_dev_artifact_version", "n_folds", "random_seed",
                 "val_split"},
    }
    for name, keys in expected_meta_keys.items():
        assert name in wandb.artifacts, name
        art = wandb.artifacts[name][-1]
        assert art.type == "dataset"
        assert art.description
        if name == IMAGES:
            # automask context comes from the config; the direct logger
            # call publishes without it (publish_all threads it through)
            continue
        assert set(art.metadata) == keys, name


def test_published_lineage_edges_are_exact_versions(published):
    """Child metadata pins the exact W&B version of the just-published
    parent (not 'latest'), and every logging run declared its parent via
    use_artifact — the reference's provenance mechanism
    (artifact_logging.py:105,131,201,253,282,297)."""
    _, _, wandb = published
    images_v = wandb.artifacts[IMAGES][-1].version
    dev = wandb.artifacts[MODEL_DEV][-1]
    assert dev.metadata["images_artifact_version"] == images_v
    assert wandb.artifacts[HOLDOUT][-1].metadata[
        "images_artifact_version"] == images_v
    dev_v = dev.version
    assert wandb.artifacts[TRAIN_VAL_TEST][-1].metadata[
        "model_dev_artifact_version"] == dev_v
    assert wandb.artifacts[K_FOLD][-1].metadata[
        "model_dev_artifact_version"] == dev_v
    used = [spec for run in wandb.runs for spec in run.used]
    assert f"{IMAGES}:{images_v}" in used
    assert used.count(f"{MODEL_DEV}:{dev_v}") == 2  # TVT and KFold runs


def test_published_file_layout(published):
    """Server-side file layout matches what the reference logs (and what
    train_utils.py-style consumers download by path)."""
    store, _, wandb = published
    images = wandb.artifacts[IMAGES][-1].download()
    assert os.path.isfile(os.path.join(images, "frames.csv"))
    assert os.path.isfile(os.path.join(images, "clips_table.csv"))
    assert os.path.isdir(os.path.join(images, "frames"))
    # frames dir content = the store's referenced frames_dir
    src_frames = store.metadata(IMAGES).get("frames_dir")
    assert (sorted(os.listdir(os.path.join(images, "frames")))
            == sorted(os.listdir(src_frames)))

    for name in (MODEL_DEV, HOLDOUT):
        d = wandb.artifacts[name][-1].download()
        assert os.path.isfile(os.path.join(d, "frames.csv"))
        assert os.path.isfile(os.path.join(d, "clips_table.csv"))

    tvt = wandb.artifacts[TRAIN_VAL_TEST][-1].download()
    for split in ("train", "val", "test"):
        assert os.path.isfile(os.path.join(tvt, "frames", f"{split}.csv"))
        assert os.path.isfile(os.path.join(tvt, "clips", f"{split}.csv"))

    kf = wandb.artifacts[K_FOLD][-1]
    for i in range(int(kf.metadata["n_folds"])):
        assert os.path.isfile(os.path.join(kf.download(), f"fold_{i}",
                                           "frames.csv"))


# ---------------------------------------------------------------------------
# Produce/consume round trip: logger -> fake server -> fetcher -> new store
# ---------------------------------------------------------------------------

def test_round_trip_train_val_test(tmp_path, published):
    store, _, wandb = published
    store2 = ArtifactStore(str(tmp_path / "store2"))
    fetcher = WandbArtifactFetcher(store2, api=wandb.as_api())
    fetcher.fetch_train_val_test()

    got = store2.get_train_val_test_artifact()
    want = store.get_train_val_test_artifact()
    for g, w in zip(got[:3], want[:3]):
        pd.testing.assert_frame_equal(g.reset_index(drop=True),
                                      w.reset_index(drop=True))
    # frames land in the server download dir but name-for-name match
    assert got[3] and os.path.isdir(got[3])
    assert sorted(os.listdir(got[3])) == sorted(os.listdir(want[3]))


def test_round_trip_k_fold(tmp_path, published):
    store, _, wandb = published
    store2 = ArtifactStore(str(tmp_path / "store2"))
    fetcher = WandbArtifactFetcher(store2, api=wandb.as_api())
    fetcher.fetch_k_fold()

    assert store2.get_n_folds() == store.get_n_folds()
    for fold in range(store.get_n_folds()):
        got = store2.get_fold_artifact(fold)
        want = store.get_fold_artifact(fold)
        for g, w in zip(got[:3], want[:3]):
            pd.testing.assert_frame_equal(g.reset_index(drop=True),
                                          w.reset_index(drop=True))


# ---------------------------------------------------------------------------
# publish_all: WANDB.LOGGING flag semantics (reference __main__, :394-412)
# ---------------------------------------------------------------------------

def test_publish_all_honors_logging_flags(tmp_path, local_lineage):
    store, cfg = local_lineage
    cfg = cfg.to_dict()
    cfg["WANDB"]["LOGGING"] = {"IMAGES": True, "MODEL_DEV_HOLDOUT": True,
                               "K_FOLD_CROSS_VAL": False,
                               "TRAIN_VAL_TEST": True}
    wandb = FakeWandbModule(str(tmp_path / "server"))
    published = publish_all(cfg, store=store, wandb_module=wandb)

    assert set(published) == {IMAGES, MODEL_DEV, HOLDOUT, TRAIN_VAL_TEST}
    assert K_FOLD not in wandb.artifacts
    # Images carries the automask config metadata (reference :71-75)
    img_meta = wandb.artifacts[IMAGES][-1].metadata
    assert img_meta["automask_version"] == cfg["DATA"]["AUTOMASK"]["VERSION"]
    assert (img_meta["automask_output_format"]
            == cfg["DATA"]["AUTOMASK"]["OUTPUT_FORMAT"])
    # runs all declare the project/entity from config
    assert all(r.project == cfg["WANDB"]["PROJECT_NAME"]
               for r in wandb.runs)


def test_publish_all_no_flags_publishes_nothing(tmp_path, local_lineage):
    store, cfg = local_lineage
    cfg = cfg.to_dict()
    cfg["WANDB"]["LOGGING"] = {k: False for k in cfg["WANDB"]["LOGGING"]}
    wandb = FakeWandbModule(str(tmp_path / "server"))
    assert publish_all(cfg, store=store, wandb_module=wandb) == {}
    assert wandb.artifacts == {} and wandb.runs == []


def test_publish_unpublished_parent_falls_back_to_latest(tmp_path,
                                                         local_lineage):
    """Publishing a child in a fresh session (parent uploaded earlier by
    someone else) pins the server's current parent version via
    use_artifact('...:latest'), not a dangling local version id."""
    store, _ = local_lineage
    wandb = FakeWandbModule(str(tmp_path / "server"))
    # session 1: publish Images only
    WandbArtifactLogger(store, project="p",
                        wandb_module=wandb).log_images()
    # session 2 (fresh logger, empty _published map): publish the pair
    logger2 = WandbArtifactLogger(store, project="p", wandb_module=wandb)
    logger2.log_model_dev_holdout()
    dev = wandb.artifacts[MODEL_DEV][-1]
    assert dev.metadata["images_artifact_version"] == \
        wandb.artifacts[IMAGES][-1].version


# ---------------------------------------------------------------------------
# Module entry (reference artifact_logging.py __main__, :394-412): the real
# `python -m ab_line_classifier_tpu.data.wandb_artifacts` subprocess, with a
# stub wandb module injected on PYTHONPATH and a file-materializing server.
# ---------------------------------------------------------------------------

_STUB_WANDB = '''
import json, os, shutil

_ROOT = os.environ["FAKE_WANDB_ROOT"]
_ARTS = {}

class Artifact:
    def __init__(self, name, type=None, description=None, metadata=None):
        self.name, self.type, self.description = name, type, description
        self.metadata = dict(metadata or {}); self.adds = []
    def add_file(self, p, name=None):
        assert os.path.isfile(p), p
        self.adds.append(("file", p, name or os.path.basename(p)))
    def add_dir(self, p, name=None):
        assert os.path.isdir(p), p
        self.adds.append(("dir", p, name or ""))

class _Run:
    def __enter__(self): return self
    def __exit__(self, *e): return False
    def use_artifact(self, spec):
        name, _, v = spec.partition(":")
        vs = _ARTS[name]
        return (vs[-1] if v in ("", "latest")
                else next(a for a in vs if a.version == v))
    def log_artifact(self, art):
        vs = _ARTS.setdefault(art.name, [])
        art.version = "v%d" % len(vs)
        d = os.path.join(_ROOT, art.name, art.version)
        os.makedirs(d, exist_ok=True)
        for kind, local, ap in art.adds:
            dest = os.path.join(d, ap.rstrip("/"))
            if kind == "file":
                os.makedirs(os.path.dirname(dest), exist_ok=True)
                shutil.copy(local, dest)
            else:
                shutil.copytree(local, dest, dirs_exist_ok=True)
        vs.append(art)
        with open(os.path.join(d, "_published.json"), "w") as f:
            json.dump({"type": art.type, "metadata": art.metadata}, f)
        return art

def init(**kw):
    return _Run()
'''


@pytest.mark.slow
def test_module_entry_publishes_flagged_stages(tmp_path, local_lineage):
    import json
    import subprocess
    import sys

    from tests.conftest import cli_env

    store, cfg = local_lineage
    stub_dir = tmp_path / "stublib"
    stub_dir.mkdir()
    (stub_dir / "wandb.py").write_text(_STUB_WANDB)
    server = tmp_path / "server"

    d = cfg.to_dict()
    d["TRACKER"]["ARTIFACTS_DIR"] = store.root
    d["WANDB"]["LOGGING"] = {"IMAGES": True, "MODEL_DEV_HOLDOUT": True,
                             "K_FOLD_CROSS_VAL": True,
                             "TRAIN_VAL_TEST": False}
    cfg_path = str(tmp_path / "config.yml")
    import yaml

    with open(cfg_path, "w") as f:
        yaml.safe_dump(d, f)

    env = cli_env(cfg_path)
    env["PYTHONPATH"] = str(stub_dir) + os.pathsep + env["PYTHONPATH"]
    env["FAKE_WANDB_ROOT"] = str(server)
    r = subprocess.run(
        [sys.executable, "-m", "ab_line_classifier_tpu.data.wandb_artifacts"],
        capture_output=True, text=True, timeout=300, env=env,
        cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]

    published = sorted(os.listdir(server))
    assert published == ["Holdout", "Images", "KFoldCrossValidation",
                         "ModelDev"]  # TRAIN_VAL_TEST flag was off
    # lineage edge recorded against the just-published parent version
    with open(server / "ModelDev" / "v0" / "_published.json") as f:
        meta = json.load(f)["metadata"]
    assert meta["images_artifact_version"] == "v0"
    # k-fold payload has every fold dir
    n_folds = store.get_n_folds()
    for i in range(n_folds):
        assert (server / "KFoldCrossValidation" / "v0" / f"fold_{i}"
                / "frames.csv").is_file()


@pytest.mark.slow
def test_module_entry_no_flags_without_wandb(tmp_path, local_lineage):
    """With every WANDB.LOGGING flag off the entry is a no-op that never
    imports wandb (local-first rule) — no stub on PYTHONPATH here."""
    import subprocess
    import sys

    import yaml

    from tests.conftest import cli_env

    store, cfg = local_lineage
    d = cfg.to_dict()
    d["TRACKER"]["ARTIFACTS_DIR"] = store.root
    d["WANDB"]["LOGGING"] = {k: False for k in d["WANDB"]["LOGGING"]}
    cfg_path = str(tmp_path / "config.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(d, f)

    r = subprocess.run(
        [sys.executable, "-m", "ab_line_classifier_tpu.data.wandb_artifacts"],
        capture_output=True, text=True, timeout=300,
        env=cli_env(cfg_path), cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
