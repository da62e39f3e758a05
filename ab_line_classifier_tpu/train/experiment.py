"""Experiment orchestration: single_train / cross_validation / hparam_search.

The reference's ``train_experiment`` (``src/train.py:343-371``) dispatches to
``perform_single_run`` either directly or through a W&B sweep agent (grid over
FOLD_ID for cross-validation, bayes/grid over HPARAM_SEARCH for tuning), with
datasets fetched as W&B artifacts (``src/train_utils.py:18-46,192-235``).

Here the same experiment types run against local data and the local sweep
controllers (``train.sweep``): hyperparameters resolve as config defaults
overridden by sweep values (reference train.py:198-200), fold assembly
matches ``get_fold_artifact`` (test = fold k, val = grouped split of the
rest), and every run logs through the pluggable tracker. Cross-validation
additionally writes the legacy-style mean/std summary CSV (reference
``src/train_legacy.py:417-509``).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ab_line_classifier_tpu.config import Config, ensure_output_dirs
from ab_line_classifier_tpu.data.pipeline import FrameDataset
from ab_line_classifier_tpu.data import splits as S
from ab_line_classifier_tpu.models import build_model
from ab_line_classifier_tpu.predict.metrics import compute_metrics
from ab_line_classifier_tpu.predict.predict import Predictor
from ab_line_classifier_tpu.train.class_balance import (
    class_weight_array, compute_class_weight, compute_output_bias,
    output_bias_array)
from ab_line_classifier_tpu.train.loop import Trainer
from ab_line_classifier_tpu.train.sweep import (SweepExhausted,
                                                make_controller,
                                                replay_trials,
                                                space_from_config)
from ab_line_classifier_tpu.train.tracker import make_tracker
from ab_line_classifier_tpu.utils import checkpoint as ckpt


@dataclasses.dataclass
class RunResult:
    test_metrics: Dict[str, Any]
    history: List
    model_dir: Optional[str]
    best_val: Dict[str, float]


def load_pretrained_variables(path: str, spec, *, rng=None,
                              verbose: bool = True
                              ) -> Tuple[Dict[str, Any],
                                         Optional[List[str]]]:
    """Warm-start variables for training (``USE_PRETRAINED`` +
    ``PATHS.PRETRAINED_WEIGHTS``).

    The reference warm-starts by name-matched layer copy from a saved Keras
    model (reference ``src/train.py:236-238`` ->
    ``src/models/model_utils.py:6-23``) and, implicitly, every transfer
    model bootstraps its backbone from the ImageNet ``keras.applications``
    weights (reference ``src/models/models.py:59,110,161,206,398``). Both
    workflows route through here:

    * a native Orbax checkpoint directory (this framework's own format);
    * a full-model Keras ``.h5`` (what the reference's ``save_model``
      produces and ``USE_PRETRAINED`` consumes);
    * a ``keras.applications`` weights-only ``*_notop.h5`` — the standard
      ImageNet backbone file (download it once, point
      ``PATHS.PRETRAINED_WEIGHTS`` at it; backbone layer names match the
      graph IR, head layers keep their fresh init with a notice);
    * a Keras 3 ``.weights.h5``.

    Returns ``(variables, copied_layer_names)``; ``copied_layer_names`` is
    None for native checkpoints (every layer restored). Layers present in
    only one side are skipped with a notice, exactly like the reference's
    try/except copy loop; a file that matches NO layer raises (silently
    training from scratch after a config typo is a footgun), and a missing
    path raises like the reference's assert (model_utils.py:13). Native
    paths go straight to ``ckpt.load_model`` so the ``.../latest`` alias
    and dir-of-checkpoints forms keep working (utils/checkpoint.py:75-90,
    which raises FileNotFoundError itself when nothing resolves).
    """
    if path.endswith(".h5"):
        from ab_line_classifier_tpu.models.weights import import_h5_weights

        if not os.path.exists(path):
            raise FileNotFoundError(
                f"Could not find pretrained weights at: {path!r} "
                f"(PATHS.PRETRAINED_WEIGHTS with TRAIN.USE_PRETRAINED set)")

        if rng is None:
            rng = jax.random.PRNGKey(0)
        variables = spec.init_variables(rng)
        copied_names: List[str] = []
        variables, copied = import_h5_weights(
            path, variables, verbose=verbose, graph=spec.graph,
            copied_names=copied_names)
        if copied == 0:
            raise ValueError(
                f"no layers matched while importing pretrained weights "
                f"{path!r} — wrong architecture for TRAIN.MODEL_DEF?")
        if verbose:
            print(f"warm start: {copied} layers from {path}")
        return variables, copied_names
    variables, _ = ckpt.load_model(path)
    return variables, None


def configured_cache_budget(cfg: Config) -> int:
    """Device pixel-cache budget, capped by the config's memory limit.

    The reference's ``TRAIN.USE_MEMORY_LIMIT`` + ``MEMORY_LIMIT`` (MB) cap
    its GPU's virtual-device memory (reference ``train.py:184-189``). The
    TPU-native analogue caps the one device-memory consumer this framework
    sizes itself — the HBM frame cache (``TRAIN.CACHE_DATASET``): datasets
    that would exceed the limit fall to the sharded or streaming tiers
    instead of committing HBM past it. Without the flag, the measured
    free-HBM budget applies unchanged (data/pipeline.device_cache_budget).
    """
    from ab_line_classifier_tpu.data.pipeline import device_cache_budget

    budget = device_cache_budget()
    if cfg["TRAIN"].get("USE_MEMORY_LIMIT", False):
        cap = int(cfg["TRAIN"]["MEMORY_LIMIT"]) << 20  # MB, like the ref
        budget = min(budget, cap)
    return budget


def resolve_datasets(cfg: Config, fold_id: Optional[int] = None,
                     kfold_tables=None
                     ) -> Tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame, str]:
    """Produce (train_df, val_df, test_df, frames_dir).

    ``kfold_tables`` (a :func:`resolve_kfold_tables` result) lets serial
    cross-validation resolve the fold source ONCE and thread it through
    every fold's run — without it, each fold re-resolves, and a pinned
    ``'latest'`` W&B version re-fetches per fold AND can move upstream
    mid-run, sourcing the fold count and per-fold tables from different
    artifact versions.

    Resolution order (first match wins), mirroring the reference where the
    artifact IS training's source of truth (reference train.py:217-225 →
    train_utils.py:18-46,192-235):

    1. a PINNED W&B artifact version
       (``WANDB.TRAIN_VAL_TEST_ARTIFACT_VERSION`` /
       ``K_FOLD_CROSS_VAL_ARTIFACT_VERSION``) — fetched into the local
       store via ``data/wandb_artifacts``; pinning a version with wandb
       missing raises instead of silently training on something else;
    2. pre-materialized partition CSVs under ``PATHS.PARTITIONS`` /
       ``PATHS.K_FOLDS_SPLIT_PATH`` (the on-disk TrainValTest / KFold
       contract, reference artifact_logging.py:240-246);
    3. the local artifact store's TrainValTest / KFold artifact
       (``data/artifacts.ArtifactStore``, latest committed version);
    4. an on-the-fly split of ``PATHS.FRAME_TABLE`` with ``ARTIFACT_SEED``
       — same split function, same seed, same folds.
    """
    paths = cfg["PATHS"]
    frames_dir = paths["FRAMES"]
    seed = int(cfg["WANDB"]["ARTIFACT_SEED"])

    if fold_id is not None:
        folds, val_split, kf_seed, kf_dir = (
            kfold_tables if kfold_tables is not None
            else resolve_kfold_tables(cfg))
        if fold_id >= len(folds):
            raise ValueError(
                f"fold_id {fold_id} out of range: the resolved fold source "
                f"has {len(folds)} folds (an artifact's own n_folds is the "
                f"authority, not TRAIN.N_FOLDS)")
        train_df, val_df, test_df = S.fold_train_val_test(
            folds, fold_id, val_split, random_seed=kf_seed)
        return train_df, val_df, test_df, kf_dir

    from ab_line_classifier_tpu.data.artifacts import (TRAIN_VAL_TEST,
                                                       store_from_config)
    store = store_from_config(cfg)

    # --- 1. pinned W&B artifact version -------------------------------
    ver = str(cfg["WANDB"].get("TRAIN_VAL_TEST_ARTIFACT_VERSION", "") or "")
    if ver:
        v = _fetch_pinned(cfg, store, TRAIN_VAL_TEST, ver,
                          "TRAIN_VAL_TEST_ARTIFACT_VERSION")
        tr, va, te, fdir = store.get_train_val_test_artifact(version=v)
        return tr, va, te, _live_dir(fdir, frames_dir)

    # --- 2. pre-materialized partition CSVs ---------------------------
    part_frames = os.path.join(paths.get("PARTITIONS", ""), "frames")
    train_csv = os.path.join(part_frames, "train.csv")
    if os.path.isfile(train_csv):
        return (pd.read_csv(train_csv),
                pd.read_csv(os.path.join(part_frames, "val.csv")),
                pd.read_csv(os.path.join(part_frames, "test.csv")),
                frames_dir)

    # --- 3. local artifact store --------------------------------------
    try:
        tr, va, te, fdir = store.get_train_val_test_artifact()
        return tr, va, te, _live_dir(fdir, frames_dir)
    except FileNotFoundError:
        pass

    # --- 4. on-the-fly split ------------------------------------------
    frames_df = pd.read_csv(paths["FRAME_TABLE"])
    train_df, val_df, test_df = S.train_val_test_split(
        frames_df, float(cfg["DATA"]["VAL_SPLIT"]),
        float(cfg["DATA"]["TEST_SPLIT"]), random_seed=seed)
    return train_df, val_df, test_df, frames_dir


def resolve_kfold_tables(cfg: Config) -> Tuple[List[pd.DataFrame], float,
                                               int, str]:
    """Fold tables for k-fold runs via the same resolution chain as
    :func:`resolve_datasets` (pinned W&B version → ``K_FOLDS_SPLIT_PATH``
    CSVs → local store KFold artifact → on-the-fly split). Returns
    ``(folds, val_split, random_seed, frames_dir)`` — the fold COUNT is
    always ``len(folds)`` from the source: an artifact's own metadata is
    the authority (reference train_utils.py:162-235), trusting config
    ``TRAIN.N_FOLDS`` against it would silently drop or overrun folds."""
    from ab_line_classifier_tpu.data.artifacts import (K_FOLD,
                                                       store_from_config)

    paths = cfg["PATHS"]
    frames_dir = paths["FRAMES"]
    seed = int(cfg["WANDB"]["ARTIFACT_SEED"])
    val_split = float(cfg["DATA"]["K_FOLD_VALIDATION_SPLIT"])
    store = store_from_config(cfg)

    ver = str(cfg["WANDB"].get("K_FOLD_CROSS_VAL_ARTIFACT_VERSION", "")
              or "")
    if ver:
        # The config val_split/seed are passed only as FALLBACKS: the
        # ARTIFACT's recorded values take precedence (meta.get in
        # _kfold_from_store), exactly like the reference's
        # get_fold_artifact (train_utils.py:218-219 reads both from
        # artifact metadata).
        v = _fetch_pinned(cfg, store, K_FOLD, ver,
                          "K_FOLD_CROSS_VAL_ARTIFACT_VERSION")
        return _kfold_from_store(store, v, val_split, seed, frames_dir)

    folds_root = paths.get("K_FOLDS_SPLIT_PATH", "")
    if os.path.isfile(os.path.join(folds_root, "fold_0", "frames.csv")):
        # Pre-materialized fold CSVs: their OWN metadata (n_folds,
        # val_split, random_seed — written by log_k_fold_cross_val, same
        # as the reference's artifact metadata, artifact_logging.py:
        # 312-318) wins over the current config.
        n_folds = int(cfg["TRAIN"]["N_FOLDS"])
        meta_path = os.path.join(folds_root, "metadata.json")
        if os.path.isfile(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            n_folds = int(meta.get("n_folds", n_folds))
            val_split = float(meta.get("val_split", val_split))
            seed = int(meta.get("random_seed", seed))
        folds = [pd.read_csv(os.path.join(folds_root, f"fold_{i}",
                                          "frames.csv"))
                 for i in range(n_folds)]
        return folds, val_split, seed, frames_dir

    try:
        store.resolve(K_FOLD)
    except FileNotFoundError:
        pass
    else:
        return _kfold_from_store(store, "latest", val_split, seed,
                                 frames_dir)

    frames_df = pd.read_csv(paths["FRAME_TABLE"])
    folds = S.k_fold_splits(frames_df, int(cfg["TRAIN"]["N_FOLDS"]),
                            random_seed=seed)
    return folds, val_split, seed, frames_dir


def _kfold_from_store(store, version, default_val_split: float,
                      default_seed: int, default_frames_dir: str):
    """Read a store KFold artifact's fold tables + split metadata."""
    path = store.resolve("KFoldCrossValidation", version)
    meta = store.metadata("KFoldCrossValidation", version)
    n_folds = int(meta["n_folds"])
    folds = [pd.read_csv(os.path.join(path, f"fold_{i}", "frames.csv"))
             for i in range(n_folds)]
    return (folds, float(meta.get("val_split", default_val_split)),
            int(meta.get("random_seed", default_seed)),
            _live_dir(meta.get("frames_dir"), default_frames_dir))


def _live_dir(fdir: Optional[str], default: str) -> str:
    """An artifact's frames_dir metadata wins only while it still exists —
    the W&B download cache it may point into can be cleared independently
    of the store (same staleness guard as wandb_artifacts.py:68-71)."""
    return fdir if fdir and os.path.isdir(fdir) else default


def _wandb_prefix(cfg: Config) -> str:
    """``entity/project``, ``project`` alone when ENTITY is blank (the
    shipped config shape — the api default entity then applies), or empty
    when neither is set."""
    entity = str(cfg["WANDB"].get("ENTITY", "") or "")
    project = str(cfg["WANDB"].get("PROJECT_NAME", "") or "")
    if entity and project:
        return f"{entity}/{project}"
    return project


def _fetch_pinned(cfg: Config, store, name: str, ver: str,
                  ver_key: str) -> str:
    """Materialize the pinned W&B artifact version locally; returns the
    local store version id. A pinned non-latest version already in the
    store (``source == wandb:{name}:{ver}``) is served without touching
    wandb — sweeps/serial CV would otherwise re-download per run."""
    if ver not in ("latest",):  # 'latest' can move upstream; always fetch
        want = f"wandb:{name}:{ver}"
        for v in reversed(store.versions(name)):
            if store.metadata(name, v).get("source") == want:
                return v
    from ab_line_classifier_tpu.data.wandb_artifacts import (
        WandbArtifactFetcher)
    try:
        fetcher = WandbArtifactFetcher(store, project=_wandb_prefix(cfg))
        if name == "KFoldCrossValidation":
            path = fetcher.fetch_k_fold(ver)
        else:
            path = fetcher.fetch_train_val_test(ver)
    except ImportError as e:
        raise ImportError(
            f"WANDB.{ver_key} pins artifact version {ver!r} but wandb "
            f"is not importable — install wandb or clear the pin "
            f"(training on a different split than the one pinned "
            f"would be silent data corruption)") from e
    return os.path.basename(path.rstrip(os.sep))


def generate_classification_test_results(predictor: Predictor,
                                         test_df: pd.DataFrame,
                                         frames_dir: str, cfg: Config,
                                         tracker=None) -> Dict[str, Any]:
    """Test-set evaluation (reference train_utils.py:92-122): exact sklearn
    metrics + ROC / confusion-matrix plots, logged via the tracker."""
    ds = FrameDataset(test_df, frames_dir, img_dim=cfg.img_dim)
    probs = predictor.predict_dataset(ds)
    labels = test_df["Class"].to_numpy()
    preds = (probs[:, 1] >= 0.5).astype(int)
    metrics = compute_metrics(cfg.classes, labels, preds, probs)
    if tracker is not None:
        tracker.log_metrics("test", metrics)
    try:
        import matplotlib.pyplot as plt

        from ab_line_classifier_tpu.viz.visualization import (
            plot_confusion_matrix, plot_roc)
        os.makedirs(cfg["PATHS"]["IMAGES"], exist_ok=True)
        roc_fig = plot_roc("test", labels, probs, cfg.classes)
        cm_fig = plot_confusion_matrix(labels, preds, cfg.classes)
        for fname, fig in (("test_roc", roc_fig), ("test_cm", cm_fig)):
            fig.savefig(os.path.join(cfg["PATHS"]["IMAGES"],
                                     f"{fname}_{time.strftime('%Y%m%d-%H%M%S')}.png"),
                        dpi=120)
            if tracker is not None:
                tracker.log_image(fname, fig)
            plt.close(fig)
    except Exception as e:  # plots must never fail a run
        print(f"(plotting skipped: {e})")
    return metrics


def perform_single_run(cfg: Config, *, hparam_overrides: Optional[Dict] = None,
                       fold_id: Optional[int] = None,
                       kfold_tables=None,
                       save_weights: bool = False, tracker=None,
                       group: Optional[str] = None,
                       verbose: bool = True,
                       checkpoint_dir: Optional[str] = None,
                       resume: bool = False) -> RunResult:
    """One training run (reference ``perform_single_run``, train.py:171-246):
    resolve data -> class weights + output bias -> build model -> fit through
    the phase plan -> checkpoint -> test-set evaluation."""
    ensure_output_dirs(cfg)
    model_name = cfg.model_name
    experiment = cfg["TRAIN"]["EXPERIMENT_TYPE"]
    own_tracker = tracker is None
    if own_tracker:
        tracker = make_tracker(cfg, group=group, job_type=experiment)
        try:
            return _perform_single_run_body(
                cfg, tracker, hparam_overrides=hparam_overrides,
                fold_id=fold_id, kfold_tables=kfold_tables,
                save_weights=save_weights,
                verbose=verbose, checkpoint_dir=checkpoint_dir,
                resume=resume, finish_tracker=True)
        except BaseException as e:
            # A crashed trial must still close its run: without this the
            # run dir has an open events.jsonl and no summary.json, so
            # failed runs are indistinguishable from in-progress ones to
            # sweep resume/indexing, and fds leak across failed trials.
            # Best-effort only — a finish() that itself fails (disk full,
            # run dir unwritable) must not mask the root-cause exception.
            try:
                tracker.finish({"status": "failed",
                                "error": f"{type(e).__name__}: {e}"})
            except Exception as fin_err:
                print(f"(tracker.finish failed on crashed run: {fin_err})")
            raise
    return _perform_single_run_body(
        cfg, tracker, hparam_overrides=hparam_overrides, fold_id=fold_id,
        kfold_tables=kfold_tables,
        save_weights=save_weights, verbose=verbose,
        checkpoint_dir=checkpoint_dir, resume=resume, finish_tracker=False)


def _perform_single_run_body(cfg, tracker, *, hparam_overrides, fold_id,
                             kfold_tables=None,
                             save_weights, verbose, checkpoint_dir, resume,
                             finish_tracker) -> "RunResult":
    model_name = cfg.model_name

    # Config-default hparams overridden by sweep values (train.py:198-200).
    hparams = cfg.model_hparams()
    if hparam_overrides:
        hparams.update(hparam_overrides)
    tracker.log_config({"HPARAMS": hparams, "TRAIN": dict(cfg["TRAIN"]),
                        "DATA": {"IMG_DIM": list(cfg.img_dim)},
                        "FOLD_ID": fold_id})

    train_df, val_df, test_df, frames_dir = resolve_datasets(
        cfg, fold_id, kfold_tables=kfold_tables)
    class_weight = compute_class_weight(train_df)
    output_bias = compute_output_bias(train_df)

    mixed = bool(cfg["TRAIN"].get("MIXED_PRECISION", False))
    build_kwargs: Dict[str, Any] = {}
    if model_name == "cutoffvgg16":
        build_kwargs["total_epochs"] = int(cfg["TRAIN"]["EPOCHS"])
    spec = build_model(model_name, hparams, cfg.img_dim + (3,),
                       cfg.n_classes, mixed_precision=mixed,
                       output_bias=output_bias, **build_kwargs)

    pretrained = None
    if cfg["TRAIN"].get("USE_PRETRAINED", False):
        # Same RNG stream the Trainer would use for a fresh init
        # (loop.py:150-152): layers the h5 does not cover keep the exact
        # init an unpretrained run would have started from.
        pretrained, _ = load_pretrained_variables(
            cfg["PATHS"]["PRETRAINED_WEIGHTS"], spec,
            rng=jax.random.fold_in(
                jax.random.PRNGKey(int(cfg["TRAIN"]["SEED"])), 0),
            verbose=verbose)

    # Mesh from PARALLEL.MESH config (data-parallel batch sharding; no-op on
    # a single device).
    mesh = _mesh_from_config(cfg)

    trainer = Trainer(
        spec, class_weight=class_weight, class_names=cfg.classes,
        aug_config=dict(cfg["TRAIN"]["DATA_AUG"]),
        seed=int(cfg["TRAIN"]["SEED"]), mesh=mesh,
        compute_dtype=jnp.bfloat16 if mixed else jnp.float32)
    train_ds = FrameDataset(train_df, frames_dir, img_dim=cfg.img_dim)
    val_ds = FrameDataset(val_df, frames_dir, img_dim=cfg.img_dim)
    # Device-resident dataset cache (TRAIN.CACHE_DATASET: auto|true|false):
    # decode once, keep uint8 frames in HBM, gather batches on device — the
    # host decode + tunnel transfer disappear after the first epoch. The
    # auto budget is shared across train+val so the pair cannot commit 2x.
    from ab_line_classifier_tpu.data.pipeline import maybe_device_cache
    cache_mode = cfg["TRAIN"].get("CACHE_DATASET", "auto")
    if isinstance(cache_mode, str):
        lowered = cache_mode.lower()
        valid = {"auto": "auto", "true": True, "false": False,
                 "on": True, "off": False}
        if lowered not in valid:
            raise ValueError(
                f"TRAIN.CACHE_DATASET {cache_mode!r} is not one of "
                f"auto/true/false")
        cache_mode = valid[lowered]
    frac = len(train_ds) / max(len(train_ds) + len(val_ds), 1)
    budget = configured_cache_budget(cfg)
    train_ds = maybe_device_cache(train_ds, cache_mode, mesh=mesh,
                                  budget=int(budget * frac))
    val_ds = maybe_device_cache(val_ds, cache_mode, mesh=mesh,
                                budget=int(budget * (1 - frac)))

    # Per-epoch validation prediction tables (the reference's
    # WandbGradcamEvalCallback capability, train_utils.py:238-293).
    from ab_line_classifier_tpu.train.callbacks import PredictionTableLogger
    callbacks = [PredictionTableLogger(
        spec, val_ds, tracker=tracker,
        compute_dtype=jnp.bfloat16 if mixed else jnp.float32)]

    best_vars, history = trainer.fit(
        train_ds, val_ds, batch_size=cfg.batch_size,
        epochs=int(cfg["TRAIN"]["EPOCHS"]),
        patience=int(cfg["TRAIN"]["PATIENCE"]),
        variables=pretrained, tracker=tracker, verbose=verbose,
        callbacks=callbacks,
        checkpoint_dir=checkpoint_dir, resume=resume)

    model_dir = None
    if save_weights:
        ts = time.strftime("%Y%m%d-%H%M%S")
        model_dir = os.path.join(cfg["PATHS"]["MODEL_WEIGHTS"], f"model{ts}")
        ckpt.save_model(model_dir, best_vars, meta={
            "model_name": model_name, "hparams": hparams,
            "input_shape": list(cfg.img_dim) + [3],
            "n_classes": cfg.n_classes, "classes": cfg.classes,
            "preprocess_mode": spec.preprocess_mode,
            "mixed_precision": mixed,
        })

    predictor = Predictor(spec, {"params": best_vars["params"],
                                 **({"batch_stats": best_vars["batch_stats"]}
                                    if best_vars.get("batch_stats") else {})},
                          batch_size=cfg.batch_size,
                          compute_dtype=jnp.bfloat16 if mixed else jnp.float32)
    test_metrics: Dict[str, Any] = {}
    if test_df is not None and len(test_df):
        test_metrics = generate_classification_test_results(
            predictor, test_df, frames_dir, cfg, tracker)

    best_val = {}
    if history:
        with_val = [h for h in history if h.val]
        if with_val:
            best = min(with_val, key=lambda h: h.val["loss"])
            best_val = {f"val_{k}": v for k, v in best.val.items()}
    if finish_tracker:
        tracker.finish({**{f"test/{k}": v for k, v in test_metrics.items()
                           if not isinstance(v, list)}, **best_val})
    return RunResult(test_metrics=test_metrics, history=history,
                     model_dir=model_dir, best_val=best_val)


def _extract_raw_metric(result: RunResult,
                        metric_name: str) -> Optional[float]:
    """The run's RAW value for a sweep metric ('epoch/val_auc' ->
    best-epoch val_auc; test-metric names -> test_metrics), or None if the
    run produced no such metric. Shared by the native sweep objective and
    the W&B sweep backend (which must report the unsigned raw value to the
    service)."""
    key = metric_name.split("/")[-1]
    if key.startswith("val_"):
        value = result.best_val.get(key)
    else:
        value = result.test_metrics.get(key)
    return None if value is None else float(value)


def _sweep_objective(result: RunResult, metric_name: str, goal: str) -> float:
    """Extract the sweep objective (METRIC_NAME, e.g. 'epoch/val_auc')."""
    value = _extract_raw_metric(result, metric_name)
    if value is None:
        # Configured metric absent from the run's results: fall back to
        # val AUC — a maximize quantity REGARDLESS of the configured goal
        # (applying a 'minimize' sign-flip here would make the sweep
        # select the worst trial; the trial-parallel twin
        # lr_search_parallel forces maximize on this same substitution).
        # Say so: a typo'd METRIC_NAME would otherwise silently optimize
        # a different objective for the whole sweep.
        print(f"sweep: metric {metric_name!r} absent from run results "
              f"(val metrics: {sorted(result.best_val)}; test metrics: "
              f"{sorted(result.test_metrics)}); scoring this trial by "
              f"val_auc (maximize) instead")
        return float(result.best_val.get("val_auc", 0.0))
    return float(value) if goal == "maximize" else -float(value)


def _latest_trials_file(cfg: Config, prefix: str) -> Optional[str]:
    """Most recently modified ``EXPERIMENTS/{prefix}-*.jsonl`` group id, or
    None. Lets ``--resume`` pick up an interrupted serial sweep/k-fold run
    without the caller having to remember the generated id."""
    import glob
    paths = glob.glob(os.path.join(cfg["PATHS"]["EXPERIMENTS"],
                                   f"{prefix}-*.jsonl"))
    if not paths:
        return None
    latest = max(paths, key=os.path.getmtime)
    return os.path.splitext(os.path.basename(latest))[0]


def _read_trial_records(path: str, verbose: bool) -> list:
    """Load a ``{group}.jsonl`` trial/fold log, tolerating a torn tail.

    Records are appended as trials complete, so a hard kill (or disk-full)
    can tear the FINAL line mid-write; that tail is dropped AND truncated
    off the file — the trial reruns and its record appends at a clean
    line boundary (otherwise the rerun's append would glue onto the torn
    fragment, corrupting the file mid-line for the next resume). A
    malformed line anywhere earlier is real corruption — the file is not
    trustworthy as a skip-list — so that still raises.
    """
    if not os.path.isfile(path):
        return []
    records = []
    with open(path, "rb") as f:
        lines = f.readlines()
    good_bytes = 0
    for i, line in enumerate(lines):
        try:
            records.append(json.loads(line))
            good_bytes += len(line)
        except json.JSONDecodeError:
            if i != len(lines) - 1:
                raise
            if verbose:
                print(f"dropping torn trailing record in {path} "
                      f"(interrupted mid-write); rerunning that trial")
            with open(path, "rb+") as f:
                f.truncate(good_bytes)
    if (lines and len(records) == len(lines)
            and not lines[-1].endswith(b"\n")):
        # Tear dropped only the newline: the record is intact but the next
        # append would glue onto it — restore the line boundary.
        with open(path, "ab") as f:
            f.write(b"\n")
    return records


def hparam_search(cfg: Config, save_weights: bool = False,
                  verbose: bool = True,
                  sweep_id: Optional[str] = None,
                  resume: bool = False) -> Dict[str, Any]:
    """Reference ``hparam_search`` (train.py:353-364) with a local controller.

    Trials persist to ``EXPERIMENTS/{sweep_id}.jsonl`` as they complete, so
    an interrupted sweep resumes by rerunning with the same ``sweep_id`` —
    completed trials feed the controller as observations and are skipped.
    ``resume=True`` without an id resumes the most recent sweep, if any.
    """

    search = cfg["TRAIN"]["HPARAM_SEARCH"]
    # Optional W&B sweep-service backend (the reference's scheduler,
    # train.py:249-305): opt in with TRAIN.HPARAM_SEARCH.BACKEND: wandb;
    # without wandb installed this falls straight back to the native
    # controllers below.
    if str(search.get("BACKEND", "native")).lower() == "wandb":
        # Availability check ONLY inside the try: an ImportError raised
        # mid-sweep (a broken optional import deep in a trial) must
        # propagate, not silently discard completed W&B trials and rerun
        # the whole search natively.
        try:
            from ab_line_classifier_tpu.train.wandb_sweep import (
                _default_wandb, run_wandb_sweep)
            _default_wandb()
        except ImportError as e:
            print(f"wandb sweep backend unavailable ({e}); "
                  f"using the native controller")
        else:
            if resume and sweep_id is None:
                # The W&B service owns a sweep's trial history — there is
                # no local trials file to glob for "the most recent one",
                # and silently registering a NEW sweep would re-run every
                # trial from scratch against the user's resume request.
                raise ValueError(
                    "hparam_search --resume with the wandb backend needs "
                    "an explicit --sweep-id (the service owns the trial "
                    "history); pass the sweep id printed when the sweep "
                    "was registered, or drop --resume to start a new one")
            return run_wandb_sweep(cfg, save_weights=save_weights,
                                   verbose=verbose, sweep_id=sweep_id)
    space = space_from_config(cfg.hparam_search_space())
    controller = make_controller(search["METHOD"], space,
                                 seed=int(cfg["TRAIN"]["SEED"]))
    n_evals = int(search["N_EVALS"])
    if sweep_id is None and resume:
        sweep_id = _latest_trials_file(cfg, "sweep")
        if sweep_id is None:
            print("hparam_search --resume: no previous sweep trials file "
                  "found; starting a new sweep")
    group = sweep_id or f"sweep-{time.strftime('%Y%m%d-%H%M%S')}"
    os.makedirs(cfg["PATHS"]["EXPERIMENTS"], exist_ok=True)
    trials_path = os.path.join(cfg["PATHS"]["EXPERIMENTS"],
                               f"{group}.jsonl")
    results = _read_trial_records(trials_path, verbose)
    replay_trials(controller, results)
    if verbose and results:
        print(f"resuming sweep {group}: {len(results)} trials done")

    for trial in range(len(results), n_evals):
        try:
            params = controller.suggest()
        except SweepExhausted as e:
            # W&B grid agents stop at exhaustion instead of re-running
            # duplicate configurations (reference train.py:364-368).
            print(f"stopping sweep early: {e} "
                  f"(N_EVALS={n_evals} > grid size)")
            break
        if verbose:
            print(f"--- sweep trial {trial}/{n_evals}: {params}")
        result = perform_single_run(cfg, hparam_overrides=params,
                                    save_weights=save_weights, group=group,
                                    verbose=verbose)
        obj = _sweep_objective(result, search["METRIC_NAME"],
                               search["METRIC_GOAL"])
        controller.observe(params, obj)
        rec = {"trial": trial, **params, "objective": obj}
        results.append(rec)
        with open(trials_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
    if controller.best is None:
        raise ValueError(
            "hparam search observed no trials (N_EVALS set to 0, or a "
            "resumed sweep with an empty trials file) — nothing to select "
            "a best from")
    best_params, best_obj = controller.best
    out_dir = cfg["PATHS"]["EXPERIMENTS"]
    os.makedirs(out_dir, exist_ok=True)
    pd.DataFrame(results).to_csv(
        os.path.join(out_dir,
                     f"hparam_search_{time.strftime('%Y%m%d-%H%M%S')}.csv"),
        index=False)
    plot_dir = cfg["PATHS"].get("EXPERIMENT_VISUALIZATIONS",
                                cfg["PATHS"]["IMAGES"])
    if len(results) >= 2:
        try:  # sweep plots (reference visualization.py:142-178)
            if hasattr(controller, "partial_dependence"):
                from ab_line_classifier_tpu.viz.visualization import (
                    plot_bayesian_hparam_opt)
                plot_bayesian_hparam_opt(controller, dir_path=plot_dir)
            else:  # grid/random: progress plot (objectives are maximized)
                from ab_line_classifier_tpu.viz.visualization import (
                    plot_hparam_search)
                plot_hparam_search(results, dir_path=plot_dir)
        except Exception as e:
            print(f"(sweep plot skipped: {e})")
    if verbose:
        print(f"best: {best_params} (objective {best_obj:.4f})")
    return {"best_params": best_params, "best_objective": best_obj,
            "trials": results}


def lr_search_parallel(cfg: Config, n_trials: Optional[int] = None,
                       mesh=None, verbose: bool = True,
                       checkpoint_dir: Optional[str] = None,
                       resume: bool = False) -> Dict[str, Any]:
    """Trial-parallel learning-rate search: every candidate LR trains
    SIMULTANEOUSLY as one SPMD program.

    The reference's hparam sweep runs trials serially through a W&B agent
    (reference ``src/train.py:364``). For learning-rate-only spaces the
    trials differ by a scalar that enters the update rule *linearly*
    (Adam/RMSprop/SGD updates are ``lr * f(moments)`` where the moments
    depend only on gradients), so T trials are exactly one stacked model
    trained with per-trial update scaling — ``ParallelFoldTrainer`` with
    identical data per "fold" and ``lr_factors = lr_i / base_lr``. On a
    T-slice mesh the whole sweep costs one trial's wall clock.

    Candidate LRs are a deterministic log-space grid over the configured
    ``HPARAM_SEARCH`` range (TYPE ``float_log``, reference
    config.yml:157-193), which for a 1-D space dominates sequential
    Bayesian search at equal trial count. For cutoffvgg16's two-phase plan
    the space is the (LR_EXTRACT, LR_FINETUNE) log box (reference
    config.yml:164-170): each trial draws a seeded random pair and the
    per-trial factors switch at the phase boundary.
    """
    from ab_line_classifier_tpu.parallel.trial_parallel import (
        ParallelFoldTrainer)

    ensure_output_dirs(cfg)
    search = cfg["TRAIN"]["HPARAM_SEARCH"]
    space = {v.name: v for v in space_from_config(cfg.hparam_search_space())}
    T = int(n_trials or search["N_EVALS"])

    def grid(var, n):
        lo, hi = float(var.range[0]), float(var.range[1])
        if var.type == "float_log":
            return np.exp(np.linspace(np.log(lo), np.log(hi), n))
        return np.linspace(lo, hi, n)

    def log_samples(var, n, rng):
        lo, hi = float(var.range[0]), float(var.range[1])
        if var.type == "float_log":
            return np.exp(rng.uniform(np.log(lo), np.log(hi), n))
        return rng.uniform(lo, hi, n)

    hparams = cfg.model_hparams()
    rng = np.random.RandomState(int(cfg["TRAIN"]["SEED"]))
    lr_names = {"LR", "LR_EXTRACT", "LR_FINETUNE"}
    ignored = sorted(set(space) - lr_names)
    if ignored:
        print(f"lr_search_parallel: only learning rates can be update-scaled"
              f" trial-parallel; ignoring search variables {ignored} "
              f"(they stay at their HPARAMS defaults — use the serial "
              f"hparam_search to sweep them)")
    if "LR" in space and ({"LR_EXTRACT", "LR_FINETUNE"} & set(space)):
        raise ValueError(
            "HPARAM_SEARCH defines both LR and LR_EXTRACT/LR_FINETUNE — "
            "ambiguous for the trial-parallel sweep (the phase LRs would "
            "silently stay at their HPARAMS defaults); keep one style")
    if "LR" in space:
        # 1-D LR space: a deterministic log grid dominates sequential search.
        trial_lrs = {"LR": grid(space["LR"], T)}
        phase_vars = None  # same factor in every phase
    elif "LR_EXTRACT" in space or "LR_FINETUNE" in space:
        # cutoffvgg16's two-phase pair: each trial draws both LRs (seeded
        # random search over the 2-D log box); factors apply per phase.
        trial_lrs = {}
        for name in ("LR_EXTRACT", "LR_FINETUNE"):
            trial_lrs[name] = (log_samples(space[name], T, rng)
                               if name in space
                               else np.full(T, float(hparams[name])))
        phase_vars = {"extract": "LR_EXTRACT", "finetune": "LR_FINETUNE"}
    else:
        raise ValueError(
            "lr_search_parallel needs LR (or LR_EXTRACT/LR_FINETUNE) in "
            "HPARAM_SEARCH (other variables cannot be update-scaled)")

    # Only train+val frames go to the device — no trial indexes the test
    # split, and the full array replicates into HBM over a slow tunnel.
    train_df, val_df, _, frames_dir = resolve_datasets(cfg)
    full_df = pd.concat([train_df, val_df], ignore_index=True)
    ds = FrameDataset(full_df, frames_dir, img_dim=cfg.img_dim)
    frames, labels = ds.load_all()
    n_tr, n_va = len(train_df), len(val_df)
    train_idx = [np.arange(n_tr)] * T
    val_idx = [np.arange(n_tr, n_tr + n_va)] * T

    mixed = bool(cfg["TRAIN"].get("MIXED_PRECISION", False))
    build_kwargs: Dict[str, Any] = {}
    if cfg.model_name == "cutoffvgg16":
        build_kwargs["total_epochs"] = int(cfg["TRAIN"]["EPOCHS"])
    spec = build_model(cfg.model_name, hparams, cfg.img_dim + (3,),
                       cfg.n_classes, mixed_precision=mixed, **build_kwargs)

    cls_w = class_weight_array(train_df, cfg.n_classes)
    # Same log-odds head-bias init as every serial run (reference
    # train.py:71-81,233-234) — all trials share the train split, so the
    # prior is identical per trial but must not be omitted: without it each
    # trial spends early epochs relearning the class prior and the sweep
    # selects an LR for a different init than the final run will use.
    bias = output_bias_array(train_df, cfg.n_classes)

    if phase_vars is None:
        lr_factors = trial_lrs["LR"] / float(hparams["LR"])
    else:
        lr_factors = {
            phase: trial_lrs[var] / float(hparams[var])
            for phase, var in phase_vars.items()}

    trainer = ParallelFoldTrainer(
        spec, T, class_weights=np.tile(cls_w, (T, 1)),
        output_biases=np.tile(bias, (T, 1)),
        aug_config=dict(cfg["TRAIN"]["DATA_AUG"]), mesh=mesh,
        seed=int(cfg["TRAIN"]["SEED"]),
        compute_dtype=jnp.bfloat16 if mixed else jnp.float32,
        progress_label="trials")
    warm = None
    if cfg["TRAIN"].get("USE_PRETRAINED", False):
        warm = load_pretrained_variables(
            cfg["PATHS"]["PRETRAINED_WEIGHTS"], spec, verbose=verbose)
    best_vars, history = trainer.fit(
        frames, labels, train_idx, val_idx,
        batch_size=cfg.batch_size, epochs=int(cfg["TRAIN"]["EPOCHS"]),
        patience=int(cfg["TRAIN"]["PATIENCE"]),
        lr_factors=lr_factors, verbose=verbose,
        checkpoint_dir=checkpoint_dir, resume=resume, warm_start=warm)

    if not history:
        raise RuntimeError(
            "lr_search_parallel: no epoch history (EPOCHS=0, or a resume "
            "from a pre-history checkpoint format) — no per-trial objective "
            "to select from")

    # Per-trial objective = the metric at that trial's best-val-loss epoch,
    # the SAME semantics as the serial sweep (_sweep_objective reads the
    # metric out of best_val, the min-val-loss epoch's metrics) — scoring
    # max-over-epochs here instead would make the two backends crown
    # different winners on identical trajectories, and would score a trial
    # by an epoch whose weights EarlyStopping never restores.
    key = search["METRIC_NAME"].split("/")[-1]
    goal = search["METRIC_GOAL"]
    if key in history[0]:
        col = key
    else:
        # The configured metric isn't tracked per epoch here; fall back to
        # val_auc and force the matching goal (keeping 'minimize' against
        # a substituted AUC would select the WORST trial).
        print(f"lr_search_parallel: metric {key!r} not in per-epoch history "
              f"({sorted(k for k in history[0] if k.startswith('val_'))}); "
              f"selecting by val_auc (maximize) instead")
        col, goal = "val_auc", "maximize"
    stacked = np.stack([h[col] for h in history])          # [epochs, T]
    val_loss_mat = np.stack([h["val_loss"] for h in history])
    best_epoch = val_loss_mat.argmin(axis=0)               # [T]
    per_trial = stacked[best_epoch, np.arange(stacked.shape[1])]
    best_t = int(np.argmax(per_trial) if goal == "maximize"
                 else np.argmin(per_trial))

    swept = {k: v for k, v in trial_lrs.items()
             if phase_vars is None or k in space}
    rows = [{"trial": t, **{k: float(v[t]) for k, v in swept.items()},
             "objective": float(per_trial[t])} for t in range(T)]
    out_dir = cfg["PATHS"]["EXPERIMENTS"]
    os.makedirs(out_dir, exist_ok=True)
    pd.DataFrame(rows).to_csv(os.path.join(
        out_dir, f"lr_sweep_parallel_{time.strftime('%Y%m%d-%H%M%S')}.csv"),
        index=False)
    try:  # sweep progress plot over the raw (direction-aware) metric
        from ab_line_classifier_tpu.viz.visualization import (
            plot_hparam_search)
        plot_hparam_search(rows, goal=goal,
                           dir_path=cfg["PATHS"].get(
                               "EXPERIMENT_VISUALIZATIONS",
                               cfg["PATHS"]["IMAGES"]))
    except Exception as e:
        print(f"(sweep plot skipped: {e})")
    best_params = {k: float(v[best_t]) for k, v in swept.items()}
    if verbose:
        print(f"best {best_params} ({col}={per_trial[best_t]:.4f})")
    return {"best_params": best_params,
            "best_objective": float(per_trial[best_t]), "trials": rows,
            "best_vars": jax.tree.map(lambda a: np.asarray(a[best_t]),
                                      best_vars)}


def cross_validation_parallel(cfg: Config, mesh=None, verbose: bool = True,
                              checkpoint_dir: Optional[str] = None,
                              resume: bool = False) -> pd.DataFrame:
    """All k folds trained simultaneously as one SPMD program (fold axis
    vmapped and sharded over the mesh's ``trial`` axis) — the TPU-native
    replacement for the reference's serial sweep-agent folds. Returns the
    per-fold test metrics summary."""
    from ab_line_classifier_tpu.parallel.trial_parallel import (
        ParallelFoldTrainer)

    ensure_output_dirs(cfg)
    # Same resolution chain as the serial path (pinned W&B version /
    # fold CSVs / local store / on-the-fly): fold tables re-indexed onto
    # one concatenated frames table so per-fold row indexes address the
    # device-resident frame store.
    folds, val_split, seed, frames_dir = resolve_kfold_tables(cfg)
    n_folds = len(folds)
    frames_df = pd.concat(folds, ignore_index=True)
    bounds = np.cumsum([0] + [len(f) for f in folds])
    folds = [frames_df.iloc[bounds[i]:bounds[i + 1]]
             for i in range(n_folds)]

    ds = FrameDataset(frames_df, frames_dir, img_dim=cfg.img_dim)
    frames, labels = ds.load_all()

    train_idx, val_idx, test_idx, cls_w, biases = [], [], [], [], []
    for f in range(n_folds):
        tr, va, te = S.fold_train_val_test(
            folds, f, val_split, random_seed=seed)
        train_idx.append(tr.index.to_numpy())
        val_idx.append(va.index.to_numpy())
        test_idx.append(te.index.to_numpy())
        cls_w.append(class_weight_array(tr, cfg.n_classes))
        biases.append(output_bias_array(tr, cfg.n_classes))

    mixed = bool(cfg["TRAIN"].get("MIXED_PRECISION", False))
    hparams = cfg.model_hparams()
    build_kwargs: Dict[str, Any] = {}
    if cfg.model_name == "cutoffvgg16":
        build_kwargs["total_epochs"] = int(cfg["TRAIN"]["EPOCHS"])
    spec = build_model(cfg.model_name, hparams, cfg.img_dim + (3,),
                       cfg.n_classes, mixed_precision=mixed, **build_kwargs)

    trainer = ParallelFoldTrainer(
        spec, n_folds, class_weights=np.stack(cls_w),
        output_biases=np.stack(biases),
        aug_config=dict(cfg["TRAIN"]["DATA_AUG"]), mesh=mesh,
        seed=int(cfg["TRAIN"]["SEED"]),
        compute_dtype=jnp.bfloat16 if mixed else jnp.float32)
    warm = None
    if cfg["TRAIN"].get("USE_PRETRAINED", False):
        warm = load_pretrained_variables(
            cfg["PATHS"]["PRETRAINED_WEIGHTS"], spec, verbose=verbose)
    best, history = trainer.fit(
        frames, labels, train_idx, val_idx,
        batch_size=cfg.batch_size, epochs=int(cfg["TRAIN"]["EPOCHS"]),
        patience=int(cfg["TRAIN"]["PATIENCE"]), verbose=verbose,
        checkpoint_dir=checkpoint_dir, resume=resume, warm_start=warm)

    # Per-fold test evaluation with each fold's best weights.
    rows = []
    for f in range(n_folds):
        fold_vars = jax.tree.map(lambda a: np.asarray(a[f]), best)
        predictor = Predictor(spec, fold_vars, batch_size=cfg.batch_size,
                              compute_dtype=jnp.bfloat16 if mixed
                              else jnp.float32)
        te_df = frames_df.iloc[test_idx[f]]
        probs = predictor.predict_probs(frames[test_idx[f]])
        lab = te_df["Class"].to_numpy()
        preds = (probs[:, 1] >= 0.5).astype(int)
        m = compute_metrics(cfg.classes, lab, preds, probs)
        rows.append({"fold": f, **{k: v for k, v in m.items()
                                   if not isinstance(v, list)}})
    df = pd.DataFrame(rows)
    stats = df.drop(columns=["fold"]).agg(["mean", "std"])
    summary = pd.concat([df, stats.reset_index().rename(
        columns={"index": "fold"})], ignore_index=True)
    out_dir = cfg["PATHS"]["EXPERIMENTS"]
    os.makedirs(out_dir, exist_ok=True)
    summary.to_csv(os.path.join(
        out_dir, f"kfold_parallel_{time.strftime('%Y%m%d-%H%M%S')}.csv"),
        index=False)
    return summary


def cross_validation(cfg: Config, save_weights: bool = False,
                     verbose: bool = True, group: Optional[str] = None,
                     resume: bool = False) -> pd.DataFrame:
    """Reference ``cross_validation`` (train.py:365-368): one run per fold,
    plus the legacy mean/std metrics summary CSV (train_legacy.py:417-509).

    Fold results persist to ``EXPERIMENTS/{group}.jsonl`` as they complete;
    ``resume=True`` picks up the most recent interrupted run (or the named
    ``group``) and skips the folds already done."""
    # Resolve the fold source ONCE and thread the tables through every
    # fold's run: the artifact's n_folds is the authority (config
    # TRAIN.N_FOLDS only governs the on-the-fly split inside
    # resolve_kfold_tables), and a per-fold re-resolve of a 'latest' W&B
    # pin would re-fetch n_folds times and could source different folds
    # from different artifact versions if 'latest' moved mid-run.
    kfold_tables = resolve_kfold_tables(cfg)
    n_folds = len(kfold_tables[0])
    if group is None and resume:
        group = _latest_trials_file(cfg, "kfold")
        if group is None:
            print("cross_validation --resume: no previous fold results file "
                  "found; starting a new run")
    group = group or f"kfold-{time.strftime('%Y%m%d-%H%M%S')}"
    os.makedirs(cfg["PATHS"]["EXPERIMENTS"], exist_ok=True)
    folds_path = os.path.join(cfg["PATHS"]["EXPERIMENTS"], f"{group}.jsonl")
    rows = _read_trial_records(folds_path, verbose)
    if verbose and rows:
        print(f"resuming k-fold run {group}: {len(rows)} folds done")
    for fold_id in range(len(rows), n_folds):
        if verbose:
            print(f"=== fold {fold_id}/{n_folds}")
        result = perform_single_run(cfg, fold_id=fold_id,
                                    kfold_tables=kfold_tables,
                                    save_weights=save_weights, group=group,
                                    verbose=verbose)
        row = {"fold": fold_id}
        row.update({k: v for k, v in result.test_metrics.items()
                    if not isinstance(v, list)})
        rows.append(row)
        with open(folds_path, "a") as f:
            f.write(json.dumps(row) + "\n")
    df = pd.DataFrame(rows)
    stats = df.drop(columns=["fold"]).agg(["mean", "std"])
    summary = pd.concat([df, stats.reset_index().rename(
        columns={"index": "fold"})], ignore_index=True)
    out_dir = cfg["PATHS"]["EXPERIMENTS"]
    os.makedirs(out_dir, exist_ok=True)
    summary.to_csv(os.path.join(
        out_dir, f"kfold_{time.strftime('%Y%m%d-%H%M%S')}.csv"), index=False)
    return summary


def _mesh_from_config(cfg: Config):
    """Build the PARALLEL.MESH mesh, or None on a single device."""
    from ab_line_classifier_tpu.parallel.mesh import mesh_from_config
    return mesh_from_config(cfg)


def default_checkpoint_dir(cfg: Config, experiment: str) -> str:
    """Where per-epoch resume checkpoints live when the caller enables them
    without naming a directory (``--resume`` with no ``--checkpoint-dir``)."""
    return os.path.join(cfg["PATHS"]["MODEL_WEIGHTS"], "_resume", experiment)


def train_experiment(cfg: Config, experiment: Optional[str] = None,
                     save_weights: bool = False, verbose: bool = True,
                     trial_parallel: bool = False,
                     checkpoint_dir: Optional[str] = None,
                     resume: bool = False, sweep_id: Optional[str] = None):
    """The dispatcher (reference train.py:343-371).

    ``trial_parallel=True`` selects the SPMD variants: all folds (or all LR
    trials) train simultaneously, sharded over the mesh's ``trial`` axis.

    ``checkpoint_dir`` enables per-epoch mid-training checkpoints for the
    experiment types that train one (possibly stacked) model —
    single_train and both trial-parallel variants; ``resume=True`` restores
    from it and continues exactly. The serial sweep types resume at trial/
    fold granularity: ``resume=True`` picks up the most recent interrupted
    sweep or k-fold run (``sweep_id`` names a specific one).
    """
    experiment = experiment or cfg["TRAIN"]["EXPERIMENT_TYPE"]
    if resume and checkpoint_dir is None:
        checkpoint_dir = default_checkpoint_dir(cfg, experiment)
    if experiment == "single_train":
        return perform_single_run(cfg, save_weights=save_weights,
                                  verbose=verbose,
                                  checkpoint_dir=checkpoint_dir,
                                  resume=resume)
    if experiment == "hparam_search":
        if trial_parallel:
            return lr_search_parallel(cfg, mesh=_mesh_from_config(cfg),
                                      verbose=verbose,
                                      checkpoint_dir=checkpoint_dir,
                                      resume=resume)
        return hparam_search(cfg, save_weights=save_weights, verbose=verbose,
                             sweep_id=sweep_id, resume=resume)
    if experiment == "cross_validation":
        if trial_parallel:
            return cross_validation_parallel(cfg, mesh=_mesh_from_config(cfg),
                                             verbose=verbose,
                                             checkpoint_dir=checkpoint_dir,
                                             resume=resume)
        return cross_validation(cfg, save_weights=save_weights,
                                verbose=verbose, group=sweep_id,
                                resume=resume)
    raise ValueError(
        "Invalid entry in TRAIN > EXPERIMENT_TYPE field of config.yml.")
