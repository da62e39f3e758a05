"""Read-only W&B artifact fetch into the local :class:`ArtifactStore`.

The reference pulls its dataset splits from the W&B artifact service at
training time (reference ``src/train_utils.py:18-46``: walk
TrainValTest -> ModelDev -> Images lineage, download, read the split CSVs;
``:162-235`` for the k-fold artifact). This framework's lineage is
local-first (``data/artifacts.py``), so for users with an *existing* W&B
lineage this adapter fetches those artifacts once into the local layout —
after which every trainer/fetcher works unchanged and no W&B dependency
remains on the hot path.

``wandb`` is not a dependency: it is imported lazily and the W&B Api object
can be injected (which is also how the tests mock it).
"""

from __future__ import annotations

import os
import shutil
from typing import Optional, Tuple

from ab_line_classifier_tpu.data.artifacts import (
    ArtifactStore, IMAGES, K_FOLD, MODEL_DEV, TRAIN_VAL_TEST)


def _default_api():
    try:
        import wandb
    except ImportError as e:  # pragma: no cover - wandb not installed here
        raise ImportError(
            "wandb is not installed; pass an api= object or use the "
            "local-first ArtifactStore lineage instead") from e
    return wandb.Api()


class WandbArtifactFetcher:
    """Fetch reference-logged W&B artifacts into a local ArtifactStore.

    :param store: destination local store.
    :param project: ``entity/project`` prefix for artifact names
        (e.g. ``"myteam/ab-line"``); empty uses the api default.
    :param api: a ``wandb.Api()``-like object exposing
        ``artifact(name) -> obj`` with ``.metadata`` (dict) and
        ``.download() -> local dir``. Injected in tests.
    """

    def __init__(self, store: ArtifactStore, *, project: str = "",
                 api=None):
        self.store = store
        self.prefix = f"{project}/" if project else ""
        self.api = api if api is not None else _default_api()

    def _get(self, name: str, version: str):
        v = version if version else "latest"
        return self.api.artifact(f"{self.prefix}{name}:{v}")

    def _materialized_images(self, version: str) -> Optional[Tuple[str, str]]:
        """Local Images version already fetched for this wandb version, if
        any — so lineage walks (TrainValTest then KFold, or a re-run) don't
        re-download and re-materialize the same Images artifact."""
        if version in ("", "latest", None):
            return None  # "latest" can move upstream; always re-check
        want = f"wandb:{IMAGES}:{version}"
        for v in reversed(self.store.versions(IMAGES)):
            meta = self.store.metadata(IMAGES, v)
            if meta.get("source") == want and meta.get("frames_dir"):
                # The frame files live in the W&B download cache, which can
                # be cleared independently of the store — a stale hit here
                # would permanently skip the only re-download path.
                if os.path.isdir(meta["frames_dir"]):
                    return self.store.resolve(IMAGES, v), meta["frames_dir"]
        return None

    # ------------------------------------------------------------------
    def fetch_images(self, version: str = "latest") -> Tuple[str, str]:
        """Download the Images artifact; returns (store path, frames dir).

        The frame files stay in the W&B download cache (referenced by the
        metadata ``frames_dir``, exactly like locally-logged Images).
        A pinned version that is already materialized in the local store is
        served from it without touching wandb."""
        cached = self._materialized_images(version)
        if cached is not None:
            return cached
        art = self._get(IMAGES, version)
        src = art.download()
        frames_dir = os.path.join(src, "frames")
        path = self.store.new_version_dir(IMAGES)
        for fname in ("frames.csv", "clips_table.csv"):
            if os.path.isfile(os.path.join(src, fname)):
                shutil.copy(os.path.join(src, fname),
                            os.path.join(path, fname))
        self.store._write_meta(path, {
            "type": "dataset", "source": f"wandb:{IMAGES}:{version}",
            "frames_dir": os.path.abspath(frames_dir)
            if os.path.isdir(frames_dir) else None})
        return path, frames_dir

    def fetch_train_val_test(self, version: str = "latest") -> str:
        """Reference ``get_train_val_test_artifact`` (train_utils.py:18-46):
        walk the TrainValTest -> ModelDev -> Images lineage, download the
        split tables + frames, and materialize a local TrainValTest version.
        Returns the local artifact path; after this,
        ``store.get_train_val_test_artifact()`` serves it with no wandb."""
        tvt = self._get(TRAIN_VAL_TEST, version)
        model_dev_v = tvt.metadata.get("model_dev_artifact_version")
        images_v = None
        if model_dev_v:
            model_dev = self._get(MODEL_DEV, model_dev_v)
            images_v = model_dev.metadata.get("images_artifact_version")
        _, frames_dir = self.fetch_images(images_v or "latest")

        src = os.path.join(tvt.download(), "frames")
        path = self.store.new_version_dir(TRAIN_VAL_TEST)
        os.makedirs(os.path.join(path, "frames"), exist_ok=True)
        for split in ("train", "val", "test"):
            shutil.copy(os.path.join(src, f"{split}.csv"),
                        os.path.join(path, "frames", f"{split}.csv"))
        self.store._write_meta(path, {
            "type": "dataset",
            "source": f"wandb:{TRAIN_VAL_TEST}:{version}",
            "frames_dir": os.path.abspath(frames_dir)
            if os.path.isdir(frames_dir) else None})
        return path

    def fetch_k_fold(self, version: str = "latest",
                     val_split: Optional[float] = None,
                     random_seed: Optional[int] = None) -> str:
        """Reference ``get_fold_artifact`` lineage (train_utils.py:162-235):
        download the k-fold artifact's per-fold frame tables into the local
        KFoldCrossValidation layout. ``val_split``/``random_seed`` fill the
        metadata the local fetcher needs to rebuild fold train/val splits —
        both resolve the same way: an explicitly-passed value wins over the
        artifact's metadata, which wins over the defaults (0.1 / 42)."""
        art = self._get(K_FOLD, version)
        n_folds = int(art.metadata["n_folds"])
        # Walk the same lineage as fetch_train_val_test: KFold artifacts
        # record their PARENT ModelDev version ('model_dev_artifact_
        # version', reference artifact_logging.py:266-332 and our
        # log_k_fold_cross_val), and the ModelDev hop yields the Images
        # version. Reading 'images_artifact_version' off the KFold
        # metadata directly would always miss (the key only exists on
        # ModelDev) and silently pair the fold tables with whatever
        # Images version is currently 'latest' — wrong pixels for the
        # fold labels if Images was re-logged since.
        images_v = art.metadata.get("images_artifact_version")
        if not images_v:
            model_dev_v = art.metadata.get("model_dev_artifact_version")
            if model_dev_v:
                model_dev = self._get(MODEL_DEV, model_dev_v)
                images_v = model_dev.metadata.get("images_artifact_version")
        _, frames_dir = self.fetch_images(images_v or "latest")
        src = art.download()
        path = self.store.new_version_dir(K_FOLD)
        for i in range(n_folds):
            os.makedirs(os.path.join(path, f"fold_{i}"), exist_ok=True)
            shutil.copy(os.path.join(src, f"fold_{i}", "frames.csv"),
                        os.path.join(path, f"fold_{i}", "frames.csv"))
        self.store._write_meta(path, {
            "type": "dataset", "source": f"wandb:{K_FOLD}:{version}",
            "n_folds": n_folds,
            "val_split": float(val_split
                               if val_split is not None
                               else art.metadata.get("val_split", 0.1)),
            "random_seed": int(random_seed
                               if random_seed is not None
                               else art.metadata.get("random_seed", 42)),
            "frames_dir": os.path.abspath(frames_dir)
            if os.path.isdir(frames_dir) else None})
        return path
