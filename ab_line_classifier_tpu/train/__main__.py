"""CLI entry point: ``python -m ab_line_classifier_tpu.train``.

Mirrors ``python src/train.py`` in the reference (``src/train.py:374-375``):
runs TRAIN.EXPERIMENT_TYPE from ``config.yml`` and saves weights.
"""

import argparse

from ab_line_classifier_tpu.config import load_config
from ab_line_classifier_tpu.train.experiment import train_experiment


def main():
    p = argparse.ArgumentParser(description="Train the A/B-line classifier")
    p.add_argument("--config", default=None, help="path to config.yml")
    p.add_argument("--experiment", default=None,
                   choices=["single_train", "cross_validation",
                            "hparam_search"],
                   help="override TRAIN.EXPERIMENT_TYPE")
    p.add_argument("--no-save-weights", action="store_true")
    p.add_argument("--trial-parallel", action="store_true",
                   help="SPMD variants: train all folds / LR trials "
                        "simultaneously, sharded over the mesh trial axis")
    p.add_argument("--checkpoint-dir", default=None,
                   help="checkpoint the full train state here every epoch "
                        "(single_train and the trial-parallel variants)")
    p.add_argument("--resume", action="store_true",
                   help="continue an interrupted run: restore the per-epoch "
                        "checkpoint (single_train / trial-parallel; from "
                        "--checkpoint-dir, default <MODEL_WEIGHTS>/_resume/"
                        "<experiment>) or skip completed trials/folds "
                        "(serial hparam_search / cross_validation)")
    p.add_argument("--sweep-id", default=None,
                   help="name of the serial sweep / k-fold run to create or "
                        "resume (default on --resume: the most recent one)")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler device trace of the whole "
                        "experiment to <PATHS.LOGS>/profiles (TensorBoard-"
                        "viewable XLA op timeline)")
    args = p.parse_args()

    cfg = load_config(args.config)

    def run():
        train_experiment(cfg, experiment=args.experiment,
                         save_weights=not args.no_save_weights,
                         trial_parallel=args.trial_parallel,
                         checkpoint_dir=args.checkpoint_dir,
                         resume=args.resume, sweep_id=args.sweep_id)

    from ab_line_classifier_tpu.utils.profiling import run_maybe_traced

    run_maybe_traced(run, args.profile, cfg)


if __name__ == "__main__":
    main()
