"""The training loop: jitted train/eval steps, phase plans, callbacks.

Reference semantics being preserved (``src/train.py:84-168``):

* weighted categorical cross-entropy with per-class weights
  (``model.fit(..., class_weight=...)``, train.py:135);
* metrics: accuracy, AUC, per-class precision/recall @ 1/n_classes
  (train.py:108-115) — streamed by ``ops.metrics`` inside the step;
* callbacks: EarlyStopping(val_loss, PATIENCE, restore_best_weights) and
  ReduceLROnPlateau(x0.5, PATIENCE//2, min_delta 1e-4, min_lr 1e-8)
  (train.py:149-168) — host-side logic around the compiled step;
* CutoffVGG16's two-phase plan: each phase gets a fresh optimizer and
  trainability mask, callback state resets per phase like Keras's two
  ``fit()`` calls (reference models.py:423-434).

TPU-native design: the *entire* per-batch computation — augmentation,
normalization, forward, loss (+ activity regularization), backward, optimizer
update, BN stats, metric accumulation — is ONE jitted program with static
shapes (partial batches are masked, not reshaped). The reference trains its
production model eagerly (``run_eagerly=True``, models.py:426,431); here
everything is compiled. With a mesh, batches shard over the ``data`` axis and
XLA inserts the gradient psum; the step code is identical.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ab_line_classifier_tpu.data.augment import affine_params_from_config
from ab_line_classifier_tpu.train import objective
from ab_line_classifier_tpu.data.pipeline import Batch, FrameDataset
from ab_line_classifier_tpu.models.common import (
    ModelSpec, TrainPhase, get_learning_rate, scale_learning_rate)
from ab_line_classifier_tpu.models.preprocess import get_preprocess_fn
from ab_line_classifier_tpu.ops import metrics as M
from ab_line_classifier_tpu.parallel import mesh as mesh_lib


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


@dataclasses.dataclass
class EpochLog:
    epoch: int
    phase: str
    train: Dict[str, float]
    val: Dict[str, float]
    lr: Optional[float]
    seconds: float


@dataclasses.dataclass
class CallbackState:
    """Keras EarlyStopping + ReduceLROnPlateau decision logic as pure state
    (reference train.py:149-168): EarlyStopping(val_loss, patience,
    min_delta=0, restore_best_weights) and ReduceLROnPlateau(factor=0.5,
    patience=patience//2, min_delta=1e-4, min_lr=1e-8). The two callbacks
    track improvement INDEPENDENTLY, exactly like the Keras classes.
    Fuzz-verified against the real Keras callbacks in
    tests/test_keras_parity.py."""

    patience: int
    plateau_patience: int
    factor: float = 0.5
    min_lr: float = 1e-8
    plateau_min_delta: float = 1e-4

    best_val: float = np.inf
    best_plateau: float = np.inf
    wait: int = 0
    plateau_wait: int = 0

    def update(self, monitored: float, lr: float):
        """One epoch's val_loss -> (improved, stop, new_lr or None)."""
        improved = monitored < self.best_val
        if improved:
            self.best_val = monitored
            self.wait = 0
        else:
            self.wait += 1
        new_lr = None
        if monitored < self.best_plateau - self.plateau_min_delta:
            self.best_plateau = monitored
            self.plateau_wait = 0
        else:
            self.plateau_wait += 1
            if self.plateau_wait >= self.plateau_patience:
                reduced = max(lr * self.factor, self.min_lr)
                if reduced < lr:
                    new_lr = reduced
                self.plateau_wait = 0
        stop = self.wait >= self.patience
        return improved, stop, new_lr


class Trainer:
    """Drives a :class:`ModelSpec` through its phase plan."""

    def __init__(self, spec: ModelSpec, *,
                 class_weight: Optional[Dict[int, float]] = None,
                 class_names: Optional[List[str]] = None,
                 aug_config: Optional[Dict] = None,
                 seed: int = 0,
                 mesh=None,
                 compute_dtype=jnp.float32):
        self.spec = spec
        self.class_names = class_names or [str(i) for i in range(spec.n_classes)]
        self.mesh = mesh
        self.compute_dtype = compute_dtype
        self.base_rng = jax.random.PRNGKey(seed)
        self.preprocess_fn = get_preprocess_fn(spec.preprocess_mode)
        self.aug_params = (affine_params_from_config(aug_config)
                          if aug_config else None)
        w = np.ones((spec.n_classes,), np.float32)
        if class_weight:
            for i, v in class_weight.items():
                w[int(i)] = v
        self.class_weight = jnp.asarray(w)

        # Capture activity-regularized layer outputs in the same pass.
        self.reg_layers = tuple(spec.activity_regularizers)
        self.reg_lambdas = [spec.activity_regularizers[n] for n in self.reg_layers]
        self.module = spec.logits_module(capture=self.reg_layers)

    def _set_phase_module(self, phase: TrainPhase) -> None:
        """Rebuild the module for a phase: its frozen BN layers run in
        inference mode and keep their moving statistics (Keras
        trainable=False BN semantics; reference model_utils.py:26-41)."""
        self.module = self.spec.logits_module(
            capture=self.reg_layers,
            inference_bn=self.spec.frozen_bn_layers(phase))

    # ------------------------------------------------------------------
    def init_state(self, phase: TrainPhase,
                   variables: Optional[Dict] = None) -> Tuple[TrainState, Any]:
        tx = phase.make_tx()
        if variables is None:
            variables = self.spec.init_variables(
                jax.random.fold_in(self.base_rng, 0))
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = tx.init(params)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           batch_stats=batch_stats, opt_state=opt_state)
        if self.mesh is not None:
            state = jax.device_put(state, mesh_lib.replicated(self.mesh))
        return state, tx

    # ------------------------------------------------------------------
    def _forward_loss(self, params, batch_stats, x, labels_oh, mask, rng,
                      train: bool):
        # Keras loss semantics (reference train.py:135) live in the shared
        # objective so the serial and trial-parallel trainers can't drift.
        return objective.forward_loss(
            self.module, self.reg_layers, self.reg_lambdas, params,
            batch_stats, x, labels_oh, mask, self.class_weight, rng, train)

    def _prepare_images(self, images, rng, train: bool):
        return objective.prepare_images(
            self.preprocess_fn, self.aug_params, self.compute_dtype,
            images, rng, train)

    # ------------------------------------------------------------------
    def _train_step_core(self, phase_idx: int, tx) -> Callable:
        """The per-batch training computation (un-jitted): jitted directly
        for the host-streaming path, scanned over the whole epoch for the
        device-cached path."""
        def train_step(state: TrainState, metrics: M.MetricsState, images,
                       labels, mask):
            # Fold in the phase index too: step counters reset per phase, and
            # without it each phase would replay the identical augmentation /
            # dropout stream (Keras draws fresh randomness per fit() call).
            rng = jax.random.fold_in(
                jax.random.fold_in(self.base_rng, phase_idx), state.step)
            rng_aug, rng_drop = jax.random.split(rng)
            labels_oh = jax.nn.one_hot(labels, self.spec.n_classes,
                                       dtype=jnp.float32)
            x = self._prepare_images(images, rng_aug, train=True)

            grad_fn = jax.value_and_grad(
                lambda p: self._forward_loss(p, state.batch_stats, x,
                                             labels_oh, mask, rng_drop,
                                             train=True), has_aux=True)
            (loss, (probs, per_ex, new_model_state)), grads = grad_fn(state.params)
            updates, new_opt_state = tx.update(grads, state.opt_state,
                                               state.params)
            new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
            new_bs = new_model_state.get("batch_stats", state.batch_stats)
            new_state = TrainState(step=state.step + 1, params=new_params,
                                   batch_stats=new_bs,
                                   opt_state=new_opt_state)
            metrics = M.update_metrics(metrics, probs, labels_oh,
                                       loss=per_ex, sample_mask=mask)
            return new_state, metrics

        return train_step

    def make_train_step(self, phase: TrainPhase, tx,
                        phase_idx: int = 0) -> Callable:
        # No buffer donation: the axon TPU backend rejects donated buffers
        # (INVALID_ARGUMENT at compile); state sizes here are small.
        return jax.jit(self._train_step_core(phase_idx, tx))

    def _eval_step_core(self) -> Callable:
        def eval_step(state: TrainState, metrics: M.MetricsState, images,
                      labels, mask):
            labels_oh = jax.nn.one_hot(labels, self.spec.n_classes,
                                       dtype=jnp.float32)
            x = self._prepare_images(images, None, train=False)
            loss, (probs, per_ex, _) = self._forward_loss(
                state.params, state.batch_stats, x, labels_oh, mask,
                None, train=False)
            return M.update_metrics(metrics, probs, labels_oh, loss=per_ex,
                                    sample_mask=mask)

        return eval_step

    def make_eval_step(self) -> Callable:
        return jax.jit(self._eval_step_core())

    def make_epoch_fns(self, phase: TrainPhase, tx, phase_idx: int = 0,
                       train_ds=None, val_ds=None):
        """The WHOLE epoch as one compiled program for device-cached
        datasets: ``lax.scan`` of the train/eval step over a device-side
        gathered batch sequence. One dispatch per epoch instead of one per
        batch — on this tunneled backend that removes the dominant
        steady-state cost (docs/PERFORMANCE.md).

        The per-batch gather comes from the dataset (replicated caches use a
        plain take; :class:`ShardedDeviceCachedDataset` reconstructs batches
        from its HBM shards with one all-reduce) so the scan body adapts to
        the cache's memory layout without touching the step code."""
        from ab_line_classifier_tpu.data.pipeline import (
            DeviceCachedDataset, replicated_scan_gather)

        train_core = self._train_step_core(phase_idx, tx)
        eval_core = self._eval_step_core()
        batch_sh = (mesh_lib.batch_sharding(self.mesh)
                    if self.mesh is not None else None)

        def gather_for(ds):
            if isinstance(ds, DeviceCachedDataset):
                return ds.make_scan_gather(batch_sh)
            # Fallback (dataset unknown at build time): replicated-cache
            # semantics — padded index positions hold wraparound duplicates
            # of real frames (DeviceCachedDataset.epoch_index_table).
            return replicated_scan_gather(batch_sh)

        train_gather = gather_for(train_ds)
        eval_gather = gather_for(val_ds)

        @jax.jit
        def train_epoch(state, metrics0, frames, labels_all, idx_tab,
                        mask_tab):
            def body(carry, xs):
                st, m = carry
                idx, mask = xs
                images, labels = train_gather(frames, labels_all, idx, mask)
                return train_core(st, m, images, labels, mask), None

            (state, metrics), _ = jax.lax.scan(
                body, (state, metrics0), (idx_tab, mask_tab))
            return state, metrics

        @jax.jit
        def eval_epoch(state, metrics0, frames, labels_all, idx_tab,
                       mask_tab):
            def body(m, xs):
                idx, mask = xs
                images, labels = eval_gather(frames, labels_all, idx, mask)
                return eval_core(state, m, images, labels, mask), None

            metrics, _ = jax.lax.scan(body, metrics0, (idx_tab, mask_tab))
            return metrics

        return train_epoch, eval_epoch

    # ------------------------------------------------------------------
    def _run_epoch(self, state, metrics_init, step_fn, dataset: FrameDataset,
                   batch_size: int, *, train: bool, shuffle_seed: int = 0,
                   epoch_fn: Optional[Callable] = None):
        # Device-cached datasets run the whole epoch as ONE compiled scan.
        from ab_line_classifier_tpu.data.pipeline import DeviceCachedDataset

        if epoch_fn is not None and isinstance(dataset, DeviceCachedDataset):
            idx_tab, mask_tab = dataset.epoch_index_table(
                batch_size, shuffle=train, seed=shuffle_seed)
            if train:
                state, metrics = epoch_fn(state, metrics_init,
                                          dataset.frames, dataset.labels_dev,
                                          idx_tab, mask_tab)
            else:
                metrics = epoch_fn(state, metrics_init, dataset.frames,
                                   dataset.labels_dev, idx_tab, mask_tab)
        else:
            metrics = metrics_init
            # Streaming tier, double-buffered via pipeline.drain_behind:
            # batch k+1's host->device transfer is ISSUED (async
            # device_put) before step k dispatches, so the tunnel copy
            # overlaps both the producer thread's decode and the device
            # compute — measured 3.56→3.20 s/epoch on the real chip
            # (docs/PERFORMANCE.md "End-to-end training from JPEGs";
            # ABLC_DEVICE_PREFETCH=0 is the serial kill-switch).
            from ab_line_classifier_tpu.data.pipeline import drain_behind

            def to_device(b):
                if self.mesh is not None:
                    return mesh_lib.shard_batch(self.mesh, b.images,
                                                b.labels, b.mask)
                return (jax.device_put(b.images), jax.device_put(b.labels),
                        jax.device_put(b.mask))

            def dispatch(dev_batch):
                nonlocal state, metrics
                images, labels, mask = dev_batch
                if train:
                    state, metrics = step_fn(state, metrics, images, labels,
                                             mask)
                else:
                    metrics = step_fn(state, metrics, images, labels, mask)

            drain_behind(
                (to_device(b) for b in dataset.batches(
                    batch_size, shuffle=train, seed=shuffle_seed)),
                dispatch)
        out = {k: float(v) for k, v in
               M.compute_metrics(metrics, self.class_names).items()}
        return state, out

    # ------------------------------------------------------------------
    RESUME_FILE = "train_state.msgpack"

    def _save_resume(self, path: str, state: TrainState, *, epoch: int,
                     phase_idx: int, epoch_in_phase: int, best_val: float,
                     wait: int, plateau_wait: int, best_vars,
                     best_plateau: Optional[float] = None,
                     phase_done: bool = False) -> None:
        """Mid-training checkpoint: full optimizer/callback state so an
        interrupted run (or a preempted sweep trial) resumes exactly.
        The reference has no mid-training checkpointing (final .h5 only,
        train.py:139-144). One atomic file — see utils/resume.py.

        Multi-host: the serial trainer's state is fully replicated (batch
        shards, params don't), so no gather is needed — but only process 0
        writes, or hosts sharing a filesystem would race on the file."""
        from flax import serialization

        from ab_line_classifier_tpu.utils.resume import save_resume

        if jax.process_index() != 0:
            return
        save_resume(
            path, self.RESUME_FILE,
            {"state": serialization.to_state_dict(state),
             "best_vars": best_vars},
            {"epoch": epoch, "phase_idx": phase_idx,
             "epoch_in_phase": int(epoch_in_phase),
             "best_val": float(best_val),
             "best_plateau": float(best_plateau
                                   if best_plateau is not None
                                   else best_val),
             "wait": int(wait),
             "plateau_wait": int(plateau_wait),
             "phase_done": bool(phase_done)})

    # ------------------------------------------------------------------
    def fit(self, train_ds: FrameDataset, val_ds: Optional[FrameDataset], *,
            batch_size: int, epochs: int, patience: int = 15,
            variables: Optional[Dict] = None,
            verbose: bool = True,
            tracker=None,
            callbacks: Optional[List] = None,
            checkpoint_dir: Optional[str] = None,
            resume: bool = False) -> Tuple[Dict, List[EpochLog]]:
        """Run the full phase plan. Returns (best variables, history).

        :param checkpoint_dir: if set, full train state (params, optimizer,
            callback counters, best weights) is checkpointed every epoch.
        :param resume: restore from ``checkpoint_dir`` and continue.
        """
        history: List[EpochLog] = []
        epoch = 0
        state = None
        n_classes = self.spec.n_classes

        resume_progress = None
        resume_payload = None
        if resume and checkpoint_dir:
            from ab_line_classifier_tpu.utils.resume import load_resume
            loaded = load_resume(checkpoint_dir, self.RESUME_FILE)
            if loaded is not None:
                # One file, read once: arrays and progress can never come
                # from different checkpoints (utils/resume.py).
                resume_payload, resume_progress = loaded
                epoch = resume_progress["epoch"] + 1

        for phase_idx, phase in enumerate(self.spec.phases):
            if resume_progress and phase_idx < resume_progress["phase_idx"]:
                continue  # phase fully covered by the checkpoint

            # Per-phase callback state (Keras resets callbacks per fit()).
            ctl = CallbackState(patience=patience,
                                plateau_patience=max(1, patience // 2))
            best_vars = None
            epoch_in_phase = 0
            phase_done = False

            restoring = (resume_progress
                         and phase_idx == resume_progress["phase_idx"])
            if restoring:
                epoch_in_phase = resume_progress.get("epoch_in_phase", 0) + 1
                phase_done = resume_progress.get("phase_done", False)

            self._set_phase_module(phase)
            state, tx = self.init_state(phase, variables)
            train_fn = self.make_train_step(phase, tx, phase_idx)
            eval_fn = self.make_eval_step()
            # Scan-based single-program epochs for device-cached datasets
            # (jit is lazy: nothing compiles unless the cached path runs).
            train_epoch_fn, eval_epoch_fn = self.make_epoch_fns(
                phase, tx, phase_idx, train_ds=train_ds, val_ds=val_ds)

            if restoring:
                from flax import serialization
                state = serialization.from_state_dict(
                    state, resume_payload["state"])
                if self.mesh is not None:
                    # from_state_dict replaced init_state's mesh-replicated
                    # leaves with host numpy; re-establish the placement
                    # (same reason as ParallelFoldTrainer.fit's resume
                    # re-device_put) — on a multi-host mesh the first jitted
                    # step would otherwise see process-local arrays.
                    state = jax.device_put(
                        state, mesh_lib.replicated(self.mesh))
                best_vars = resume_payload["best_vars"]
                ctl.best_val = resume_progress["best_val"]
                ctl.best_plateau = resume_progress.get(
                    "best_plateau", resume_progress["best_val"])
                ctl.wait = resume_progress["wait"]
                ctl.plateau_wait = resume_progress["plateau_wait"]
                resume_progress = None  # later phases run normally

            # Remaining epochs for this phase: fixed-length phases subtract
            # the epochs already completed (resume); open-ended phases budget
            # from the global epoch counter, which resume fast-forwards. A
            # phase checkpointed as done (early-stopped) never re-enters.
            if phase.epochs is not None:
                remaining = phase.epochs - epoch_in_phase
            else:
                remaining = max(0, epochs - epoch)
            if phase_done:
                remaining = 0
            if remaining <= 0:
                # No training left in this phase, but its (restored) weights
                # must still carry into the next phase / the return value.
                # Best weights apply only if the phase early-stopped (Keras
                # restore_best_weights semantics, see phase end below).
                if phase_done and best_vars is not None:
                    variables = jax.tree.map(np.asarray, best_vars)
                elif restoring:
                    variables = {
                        "params": jax.tree.map(np.asarray, state.params),
                        "batch_stats": jax.tree.map(np.asarray,
                                                    state.batch_stats),
                    }
                elif best_vars is not None:
                    variables = jax.tree.map(np.asarray, best_vars)
                continue

            stopped = False
            for _ in range(remaining):
                t0 = time.time()
                state, train_m = self._run_epoch(
                    state, M.init_metrics(n_classes), train_fn, train_ds,
                    batch_size, train=True, shuffle_seed=epoch,
                    epoch_fn=train_epoch_fn)
                val_m: Dict[str, float] = {}
                if val_ds is not None and len(val_ds):
                    _, val_m = self._run_epoch(
                        state, M.init_metrics(n_classes), eval_fn, val_ds,
                        batch_size, train=False, epoch_fn=eval_epoch_fn)
                lr = get_learning_rate(state.opt_state)
                log = EpochLog(epoch=epoch, phase=phase.name, train=train_m,
                               val=val_m, lr=lr, seconds=time.time() - t0)
                history.append(log)
                if tracker is not None:
                    tracker.log_epoch(log)
                for cb in (callbacks or []):
                    cb.on_epoch_end(epoch, {
                        "params": state.params,
                        "batch_stats": state.batch_stats})
                if verbose:
                    vm = {f"val_{k}": round(v, 4) for k, v in val_m.items()}
                    print(f"[{phase.name}] epoch {epoch}: "
                          f"loss={train_m['loss']:.4f} "
                          f"acc={train_m['accuracy']:.4f} "
                          f"auc={train_m['auc']:.4f} {vm} "
                          f"({log.seconds:.1f}s)")
                epoch += 1

                # EarlyStopping + ReduceLROnPlateau on val_loss
                # (reference train.py:155-159) — CallbackState implements
                # the Keras decision logic, fuzz-verified against the real
                # callbacks.
                monitored = val_m.get("loss")
                stopped = False
                if monitored is not None:
                    cur = get_learning_rate(state.opt_state) or 0.0
                    improved, stopped, new_lr = ctl.update(monitored, cur)
                    if improved:
                        # Keep device references only — materializing the
                        # whole param tree to host every improved epoch
                        # pays the O(100 MB/s) tunnel for nothing; hosts
                        # copies happen at checkpoint save / phase end.
                        best_vars = {"params": state.params,
                                     "batch_stats": state.batch_stats}
                    if new_lr is not None:
                        state = dataclasses.replace(
                            state,
                            opt_state=scale_learning_rate(
                                state.opt_state, new_lr / cur))
                        if verbose:
                            print(f"  ReduceLROnPlateau: lr -> {new_lr:.2e}")
                    if stopped and verbose:
                        print(f"  EarlyStopping at epoch {epoch-1} "
                              f"(best val_loss {ctl.best_val:.4f})")
                if checkpoint_dir:
                    self._save_resume(
                        checkpoint_dir, state, epoch=epoch - 1,
                        phase_idx=phase_idx, epoch_in_phase=epoch_in_phase,
                        best_val=ctl.best_val,
                        best_plateau=ctl.best_plateau,
                        wait=ctl.wait, plateau_wait=ctl.plateau_wait,
                        best_vars=best_vars, phase_done=stopped)
                if stopped:
                    break
                epoch_in_phase += 1

            # Keras EarlyStopping(restore_best_weights=True) restores the
            # best weights ONLY when early stopping actually triggers
            # (tf.keras EarlyStopping.on_epoch_end restores inside the
            # wait>=patience branch; reference train.py:155-156). A phase
            # that runs its full epoch budget keeps its FINAL weights —
            # e.g. cutoffvgg16's extract phase hands its last epoch, not
            # its best epoch, to the finetune phase.
            if stopped and best_vars is not None:
                end_vars = best_vars
            else:
                end_vars = {"params": state.params,
                            "batch_stats": state.batch_stats}
            variables = jax.tree.map(np.asarray, end_vars)

        return variables, history
