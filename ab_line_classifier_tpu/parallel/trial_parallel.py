"""Fold/trial-parallel training: k-fold cross-validation as ONE SPMD program.

The reference runs cross-validation folds *serially* through a W&B sweep
agent (reference ``src/train.py:365-368``) — k sequential full training runs.
Here all k folds train **simultaneously**: model state is stacked along a
leading fold axis, the train step is ``vmap``-ed over it, and the fold axis
shards across the mesh's ``trial`` axis while each fold's batch shards over
``data``. On a k-slice mesh, cross-validation costs one fold's wall clock.

Design notes (all standard TPU discipline):

* The frames array lives once in HBM (replicated); per-fold batches are
  device-side gathers by precomputed index tables — no k-fold host pipelines.
* Per-fold early stopping and ReduceLROnPlateau are *vectorized* host logic:
  a per-fold ``active`` flag masks parameter updates (a stopped fold keeps
  training FLOPs but frozen state — lock-step SPMD with no ragged control
  flow), per-fold LR factors scale the (lr-linear) optimizer updates, and
  best-so-far parameters update under a per-fold improvement mask.
* Per-fold class weights are a ``[F, C]`` argument, not a closure constant.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ab_line_classifier_tpu.data.augment import affine_params_from_config
from ab_line_classifier_tpu.train import objective
from ab_line_classifier_tpu.models.common import ModelSpec, TrainPhase
from ab_line_classifier_tpu.models.preprocess import get_preprocess_fn
from ab_line_classifier_tpu.ops import metrics as M
from ab_line_classifier_tpu.parallel import mesh as mesh_lib


def pad_index_table(index_lists: List[np.ndarray],
                    pad_to: Optional[int] = None
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Ragged per-fold index lists -> padded [F, N] table + validity mask.

    Padding positions cycle each fold's OWN indices (wraparound) instead of
    a zero sentinel: padded rows are masked out of loss/metrics either way,
    but they do enter trainable-BatchNorm batch statistics — a short fold
    padded to the longest fold with zero images would drift its BN moving
    stats toward all-zero statistics (serial training never sees more than
    one batch's worth of padding). Duplicated real frames keep the
    statistics honest and fold-local."""
    for f, ix in enumerate(index_lists):
        if len(ix) == 0:
            # An all-zeros pad row would gather frame 0 — possibly another
            # fold's data — into this fold's BN batch statistics, exactly
            # the cross-fold contamination wraparound exists to prevent.
            raise ValueError(
                f"fold/trial {f} has an empty index list; every fold needs "
                f"at least one frame (dataset too small for this split?)")
    n = pad_to or max(len(ix) for ix in index_lists)
    table = np.zeros((len(index_lists), n), np.int32)
    mask = np.zeros((len(index_lists), n), np.float32)
    for f, ix in enumerate(index_lists):
        table[f, :len(ix)] = ix
        if len(ix) < n:
            reps = np.tile(ix, -(-(n - len(ix)) // len(ix)))
            table[f, len(ix):] = reps[:n - len(ix)]
        mask[f, :len(ix)] = 1.0
    return table, mask


class ParallelFoldTrainer:
    """Train F same-architecture models on F different data folds at once."""

    def __init__(self, spec: ModelSpec, n_folds: int, *,
                 class_weights: np.ndarray,  # [F, C]
                 output_biases: Optional[np.ndarray] = None,  # [F, C]
                 aug_config: Optional[Dict] = None,
                 mesh=None, seed: int = 0, compute_dtype=jnp.float32,
                 progress_label: str = "folds"):
        self.spec = spec
        self.n_folds = n_folds
        # What the trial axis means in progress lines: "folds" for k-fold
        # cross-validation, "trials" for LR sweeps.
        self.progress_label = progress_label
        self.mesh = mesh
        self.compute_dtype = compute_dtype
        self.base_rng = jax.random.PRNGKey(seed)
        self.preprocess_fn = get_preprocess_fn(spec.preprocess_mode)
        self.aug_params = (affine_params_from_config(aug_config)
                          if aug_config else None)
        self.class_weights = jnp.asarray(class_weights, jnp.float32)
        # Per-fold log-odds prior for the head Dense bias (reference
        # train.py:71-81,233-234 initializes it on EVERY run; folds have
        # different class histograms, so each fold needs its own).
        self.output_biases = (None if output_biases is None
                              else jnp.asarray(output_biases, jnp.float32))
        self.module = spec.logits_module(capture=tuple(
            spec.activity_regularizers))
        self.reg_layers = tuple(spec.activity_regularizers)
        self.reg_lambdas = [spec.activity_regularizers[n]
                            for n in self.reg_layers]

    # ------------------------------------------------------------------
    def _loss(self, params, batch_stats, x, labels_oh, mask, class_w, rng,
              train: bool):
        # Keras loss semantics shared with the serial Trainer
        # (train/objective.py) — per-fold class_w is an argument here
        # instead of loop.py's closure constant.
        return objective.forward_loss(
            self.module, self.reg_layers, self.reg_lambdas, params,
            batch_stats, x, labels_oh, mask, class_w, rng, train)

    def _prepare(self, images_u8, rng, train: bool):
        return objective.prepare_images(
            self.preprocess_fn, self.aug_params, self.compute_dtype,
            images_u8, rng, train)

    # ------------------------------------------------------------------
    def init_stacked(self, phase: TrainPhase, warm_start=None):
        """Stacked per-fold init. ``warm_start`` is an optional
        ``(variables, layer_names)`` pair from
        ``train.experiment.load_pretrained_variables``: the named layers
        (all, if names is None) are broadcast identically into every fold,
        exactly like the reference handing the same ``pretrained_path`` to
        each fold's ``train_classifier`` (reference train.py:236-238);
        uncovered layers keep their per-fold fresh init. Applied AFTER the
        output-bias init so a checkpointed head wins over the log-odds
        prior, matching the reference's copy-after-build order
        (train.py:233-238)."""
        tx = phase.make_tx()

        def init_one(key):
            variables = self.spec.init_variables(key)
            params = variables["params"]
            return params, variables.get("batch_stats", {}), tx.init(params)

        keys = jax.random.split(self.base_rng, self.n_folds)
        params, batch_stats, opt_state = jax.vmap(init_one)(keys)
        if self.output_biases is not None:
            head = self.spec.logits_layer
            bias = self.output_biases.astype(params[head]["bias"].dtype)
            params = {**params,
                      head: {**params[head], "bias": bias}}
        if warm_start is not None:
            wvars, names = warm_start
            wp = wvars.get("params", {})
            wbs = wvars.get("batch_stats", {})
            if names is None:
                names = sorted(set(wp) | set(wbs))

            def bcast(w, stacked):
                w = jnp.asarray(w).astype(stacked.dtype)
                return jnp.broadcast_to(w[None], stacked.shape)

            for name in names:
                if name in wp and name in params:
                    params = {**params, name: jax.tree.map(
                        bcast, dict(wp[name]), dict(params[name]))}
                if name in wbs and name in batch_stats:
                    batch_stats = {**batch_stats, name: jax.tree.map(
                        bcast, dict(wbs[name]), dict(batch_stats[name]))}
        sh = self._stacked_sharding(verbose=True)
        if sh is not None:
            params = jax.device_put(params, sh)
            opt_state = jax.device_put(opt_state, sh)
            if batch_stats:
                batch_stats = jax.device_put(batch_stats, sh)
        return params, batch_stats, opt_state, tx

    def _stacked_sharding(self, verbose: bool = False):
        """Sharding of the leading F (fold/trial) axis, or None off-mesh."""
        if self.mesh is None:
            return None
        n_trial = self.mesh.shape[mesh_lib.TRIAL_AXIS]
        if self.n_folds % n_trial:
            # The stacked fold axis can only shard over 'trial' when
            # divisible; otherwise replicate the stacked state (the vmap
            # still runs all folds; batches still shard over 'data').
            if verbose:
                print(f"trial axis ({n_trial}) does not divide "
                      f"{self.n_folds} folds/trials; replicating fold state "
                      f"across the mesh")
            return mesh_lib.replicated(self.mesh)
        return mesh_lib.trial_replicated(self.mesh)

    def _train_step_core(self, tx):
        """Un-jitted vmapped step over the fold axis (jitted directly, or
        scanned over the whole epoch by :meth:`make_epoch_fns`).

        Args (leading F axis): params, batch_stats, opt_state, images
        [F,B,H,W,3] u8, labels [F,B], mask [F,B], lr_factor [F], active [F].
        """
        def one_fold(params, batch_stats, opt_state, images, labels, mask,
                     class_w, lr_factor, active, rng):
            rng_aug, rng_drop = jax.random.split(rng)
            labels_oh = jax.nn.one_hot(labels, self.spec.n_classes,
                                       dtype=jnp.float32)
            x = self._prepare(images, rng_aug, train=True)
            grad_fn = jax.value_and_grad(
                lambda p: self._loss(p, batch_stats, x, labels_oh, mask,
                                     class_w, rng_drop, train=True),
                has_aux=True)
            (loss, (probs, per_ex, new_ms)), grads = grad_fn(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            # Per-fold LR plateau factor (optimizer updates are lr-linear)
            # and the early-stop freeze mask.
            gate = lr_factor * active
            updates = jax.tree.map(lambda u: u * gate, updates)
            new_params = jax.tree.map(lambda p, u: p + u, params, updates)
            new_opt = jax.tree.map(
                lambda new, old: jnp.where(active > 0, new, old),
                new_opt, opt_state)
            new_bs = new_ms.get("batch_stats", batch_stats)
            if batch_stats:
                new_bs = jax.tree.map(
                    lambda new, old: jnp.where(active > 0, new, old),
                    new_bs, batch_stats)
            st = M.update_metrics(M.init_metrics(self.spec.n_classes), probs,
                                  labels_oh, loss=per_ex, sample_mask=mask)
            return new_params, new_bs, new_opt, st

        vstep = jax.vmap(one_fold, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, 0))

        def step(params, batch_stats, opt_state, images, labels, mask,
                 lr_factor, active, step_rng):
            # step_rng: a PRNG key already folded with (epoch, batch) —
            # folding the two indices separately (make_epoch_fns) instead
            # of a magic epoch*K+batch base keeps streams collision-free
            # for any epoch length (same reasoning as train/loop.py's
            # monotonic state.step fold).
            rngs = jax.vmap(
                lambda f: jax.random.fold_in(step_rng, f)
            )(jnp.arange(self.n_folds))
            return vstep(params, batch_stats, opt_state, images, labels,
                         mask, self.class_weights, lr_factor, active, rngs)

        return step

    def make_train_step(self, tx):
        return jax.jit(self._train_step_core(tx))

    def _eval_step_core(self):
        def one_fold(params, batch_stats, images, labels, mask, metrics):
            labels_oh = jax.nn.one_hot(labels, self.spec.n_classes,
                                       dtype=jnp.float32)
            x = self._prepare(images, None, train=False)
            _, (probs, per_ex, _) = self._loss(params, batch_stats, x,
                                               labels_oh, mask,
                                               None, rng=None, train=False)
            return M.update_metrics(metrics, probs, labels_oh, loss=per_ex,
                                    sample_mask=mask)

        return jax.vmap(one_fold)

    def make_eval_step(self):
        return jax.jit(self._eval_step_core())

    _frames_sharded = False  # set by fit() when the frame store is sharded

    def _gather(self, frames, labels, idx):
        # Padded index positions carry real wraparound-duplicated frames
        # from the SAME fold (pad_index_table): the mask removes them from
        # loss/metrics, while trainable-BN batch statistics see genuine
        # images instead of zeros.
        lbs = jax.vmap(lambda ix: jnp.take(labels, ix, axis=0))(idx)
        # Layout dispatch by rank, not mutable state: a replicated store is
        # [N, H, W, C] (4-D); a data-axis-sharded store is [D, S, H, W, C]
        # (5-D; see fit's shard_dataset). Rank is carried by the array
        # itself, so epoch fns built in any order trace correctly.
        if frames.ndim == 5:
            # One all-reduce per gather reconstructs [F, B, ...]
            # bit-identically (data/pipeline.sharded_gather) — the mesh
            # holds D× the dataset while folds still shard over 'trial'.
            from ab_line_classifier_tpu.data.pipeline import sharded_gather
            return sharded_gather(frames, idx), lbs
        ims = jax.vmap(lambda ix: jnp.take(frames, ix, axis=0))(idx)
        return ims, lbs

    def make_epoch_fns(self, tx):
        """The whole F-fold epoch as ONE compiled program: ``lax.scan`` of
        the vmapped fold step over a device-side gathered batch sequence
        (one dispatch per epoch instead of one per batch; same motivation
        as train/loop.py make_epoch_fns)."""
        train_core = self._train_step_core(tx)
        eval_core = self._eval_step_core()
        F = self.n_folds

        @jax.jit
        def train_epoch(params, batch_stats, opt_state, frames, labels_d,
                        idx_tab, mask_tab, lr_factor, active, epoch_idx):
            # idx_tab/mask_tab: [nb, F, B]
            nb = idx_tab.shape[0]
            epoch_rng = jax.random.fold_in(self.base_rng, epoch_idx)
            metrics0 = jax.vmap(
                lambda _: M.init_metrics(self.spec.n_classes)
            )(jnp.arange(F))

            def body(carry, xs):
                params, bs, opt, metrics = carry
                idx, msk, b = xs
                ims, lbs = self._gather(frames, labels_d, idx)
                params, bs, opt, st = train_core(
                    params, bs, opt, ims, lbs, msk, lr_factor, active,
                    jax.random.fold_in(epoch_rng, b))
                metrics = jax.tree.map(lambda a, s: a + s, metrics, st)
                return (params, bs, opt, metrics), None

            (params, batch_stats, opt_state, metrics), _ = jax.lax.scan(
                body, (params, batch_stats, opt_state, metrics0),
                (idx_tab, mask_tab, jnp.arange(nb)))
            return params, batch_stats, opt_state, metrics

        @jax.jit
        def eval_epoch(params, batch_stats, frames, labels_d, idx_tab,
                       mask_tab):
            metrics0 = jax.vmap(
                lambda _: M.init_metrics(self.spec.n_classes)
            )(jnp.arange(F))

            def body(metrics, xs):
                idx, msk = xs
                ims, lbs = self._gather(frames, labels_d, idx)
                st = eval_core(params, batch_stats, ims, lbs, msk,
                               jax.vmap(lambda _: M.init_metrics(
                                   self.spec.n_classes))(jnp.arange(F)))
                return jax.tree.map(lambda a, s: a + s, metrics, st), None

            metrics, _ = jax.lax.scan(body, metrics0, (idx_tab, mask_tab))
            return metrics

        return train_epoch, eval_epoch

    # ------------------------------------------------------------------
    RESUME_FILE = "trial_state.msgpack"

    @staticmethod
    def _history_to_host(history):
        """Per-epoch history records as JSON-able host state. Checkpointing
        the history matters beyond bookkeeping: lr_search_parallel selects
        the best trial from the per-epoch metric matrix, so a resumed sweep
        scored only on post-resume epochs would pick a different winner
        than the uninterrupted run (a trial peaking before the crash would
        lose its peak)."""
        return [{k: (np.asarray(v).tolist() if isinstance(v, np.ndarray)
                     else v) for k, v in h.items()} for h in history]

    @staticmethod
    def _history_from_host(records):
        return [{k: (np.asarray(v) if isinstance(v, list) else v)
                 for k, v in h.items()} for h in records]

    def _save_resume(self, path: str, payload_arrays: Dict, *,
                     host_state: Dict) -> None:
        """Mid-training checkpoint of the stacked F-fold state (params,
        batch_stats, optimizer, best weights, per-fold callback vectors), so
        an interrupted trial-parallel run resumes exactly — the SPMD
        counterpart of the serial Trainer's resume (train/loop.py). One
        atomic file — see utils/resume.py.

        On a multi-host mesh the stacked leaves are trial-sharded across
        processes: every process gathers (serialization materializes to
        host anyway, and the gather is collective so all must join), but
        only process 0 writes the file."""
        import jax
        from flax import serialization

        from ab_line_classifier_tpu.utils.resume import save_resume

        payload_arrays = jax.tree.map(mesh_lib.fetch, payload_arrays)
        if jax.process_index() == 0:
            save_resume(path, self.RESUME_FILE,
                        serialization.to_state_dict(payload_arrays),
                        host_state)

    def fit(self, frames_u8: np.ndarray, labels: np.ndarray,
            train_idx: List[np.ndarray], val_idx: List[np.ndarray], *,
            batch_size: int, epochs: int, patience: int = 15,
            lr_factors=None, verbose: bool = True,
            checkpoint_dir: Optional[str] = None, resume: bool = False,
            shard_dataset="auto", warm_start=None):
        """Train all folds. Returns (best stacked variables, history: list of
        per-epoch dicts of per-fold arrays). On resume the history includes
        the checkpointed pre-interruption epochs, so it always describes
        the run from epoch 0.

        :param lr_factors: optional per-fold learning-rate multipliers —
            either one ``[F]`` array applied in every phase, or a dict
            ``{phase_name: [F]}`` for multi-phase plans (cutoffvgg16 sweeps
            LR_EXTRACT and LR_FINETUNE independently). Optimizer updates are
            lr-linear (Adam/RMSprop/SGD updates scale linearly with lr given
            the same moment trajectory), so scaling each fold's updates is
            exactly training it at ``lr * factor`` — this is how LR
            hyperparameter sweeps run trial-parallel.
        :param checkpoint_dir: if set, the full stacked state checkpoints
            every epoch; ``resume=True`` restores and continues exactly.
        :param shard_dataset: frame-store placement on a mesh — ``"auto"``
            shards the uint8 frames over the ``data`` axis only when they
            exceed one device's cache budget (the mesh then holds D× the
            dataset), ``True`` forces sharding, ``False`` replicates.
            Gathers are bit-identical either way (data/pipeline.sharded_gather).
        :param warm_start: optional ``(variables, layer_names)`` pretrained
            overlay broadcast into every fold's init (see ``init_stacked``).
        """
        F = self.n_folds
        labels_d = jnp.asarray(labels.astype(np.int32))
        self._frames_sharded = False
        n_data = (self.mesh.shape[mesh_lib.DATA_AXIS]
                  if self.mesh is not None else 1)
        if self.mesh is not None and n_data > 1 and shard_dataset is not False:
            from ab_line_classifier_tpu.data.pipeline import (
                device_cache_budget, shard_frames_over_data)
            nbytes = np.asarray(frames_u8).nbytes
            if shard_dataset is True or nbytes > device_cache_budget():
                frames = shard_frames_over_data(np.asarray(frames_u8),
                                                self.mesh)
                self._frames_sharded = True
        if not self._frames_sharded:
            frames = jnp.asarray(frames_u8)
        if self.mesh is not None:
            rep = mesh_lib.replicated(self.mesh)
            if not self._frames_sharded:
                frames = jax.device_put(frames, rep)
            labels_d = jax.device_put(labels_d, rep)

        def batch_tables(index_lists):
            """Ragged per-fold index lists -> [nb, F, B] scan tables. ALL
            padding (to the longest fold AND to the batch multiple) goes
            through pad_index_table's wraparound so padded rows always
            gather real same-fold frames — a zero sentinel here would feed
            frame 0 (possibly another fold's data) into BN batch stats."""
            n = max(len(ix) for ix in index_lists)
            nb = -(-n // batch_size)
            table, tmask = pad_index_table(index_lists,
                                           pad_to=nb * batch_size)
            idx_tab = table.reshape(F, nb, batch_size).transpose(1, 0, 2)
            mask_tab = tmask.reshape(F, nb, batch_size).transpose(1, 0, 2)
            return jnp.asarray(idx_tab), jnp.asarray(mask_tab)

        v_idx_tab, v_mask_tab = batch_tables(val_idx)

        history = []
        best_val = np.full(F, np.inf)       # EarlyStopping best (min_delta 0)
        best_plateau = np.full(F, np.inf)   # plateau best (min_delta 1e-4)
        wait = np.zeros(F, int)
        plateau_wait = np.zeros(F, int)
        plateau_patience = max(1, patience // 2)
        lr_factor = jnp.ones((F,), jnp.float32)
        active = jnp.ones((F,), jnp.float32)
        best_params = None
        best_bs = None
        carry_params = None   # per-fold end-of-phase weights (see _end_vars)
        carry_bs = None
        epoch = 0

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
                # Pre-crash epochs re-enter the returned history so metric
                # selection over it (lr_search_parallel) sees the full run.
                history = self._history_from_host(
                    resume_progress.get("history", []))

        for phase_idx, phase in enumerate(self.spec.phases):
            if resume_progress and phase_idx < resume_progress["phase_idx"]:
                continue  # phase fully covered by the checkpoint
            restoring = (resume_progress
                         and phase_idx == resume_progress["phase_idx"])
            epoch_in_phase = 0
            phase_done = False
            if restoring:
                epoch_in_phase = resume_progress.get("epoch_in_phase", 0) + 1
                phase_done = resume_progress.get("phase_done", False)
            if phase.epochs is not None:
                phase_epochs = phase.epochs - epoch_in_phase
            else:
                phase_epochs = max(0, epochs - epoch)
            if phase_done:
                phase_epochs = 0
            if phase_epochs <= 0 and not restoring:
                continue
            # Frozen BN runs in inference mode during training (Keras
            # trainable=False BN; see train/loop.py and models/common.py).
            self.module = self.spec.logits_module(
                capture=tuple(self.spec.activity_regularizers),
                inference_bn=self.spec.frozen_bn_layers(phase))
            # The warm-start overlay only matters for the first live
            # phase's fresh init — later phases take carry_params and a
            # resume restore overwrites params, so skip the broadcast +
            # device_put work it would immediately discard.
            overlay = (warm_start if carry_params is None and not restoring
                       else None)
            params, batch_stats, opt_state, tx = self.init_stacked(
                phase, warm_start=overlay)
            if carry_params is not None:
                params = carry_params         # phase hand-off (cutoffvgg16)
                if carry_bs is not None:
                    batch_stats = carry_bs
            best_params = None                # per-phase, like Keras fit()
            best_bs = None
            train_epoch, eval_epoch = self.make_epoch_fns(tx)
            # callback state resets per phase, like Keras fit() calls
            best_val[:] = np.inf
            best_plateau[:] = np.inf
            wait[:] = 0
            plateau_wait[:] = 0
            if isinstance(lr_factors, dict):
                if phase.name not in lr_factors:
                    raise ValueError(
                        f"lr_factors dict is missing phase {phase.name!r} "
                        f"(has {sorted(lr_factors)}); keys must be phase "
                        f"names, not hyperparameter names")
                phase_factors = lr_factors[phase.name]
            else:
                phase_factors = lr_factors
            base_factors = (np.asarray(phase_factors, np.float32)
                            if phase_factors is not None
                            else np.ones(F, np.float32))
            lr_factor = jnp.asarray(base_factors)
            active = jnp.ones((F,), jnp.float32)

            if restoring:
                from flax import serialization
                template = {"params": params, "batch_stats": batch_stats,
                            "opt_state": opt_state,
                            "best_params": params,
                            "best_bs": batch_stats,
                            "lr_factor": lr_factor, "active": active}
                arrays = serialization.from_state_dict(template,
                                                       resume_payload)
                # Re-establish the trial-axis sharding: the restored leaves
                # are host numpy; without this the resumed run would carry
                # the F-stacked state replicated/default-placed (up to F x
                # HBM per device) instead of sharded like init_stacked.
                sh = self._stacked_sharding()
                if sh is not None:
                    for key in ("params", "batch_stats", "opt_state",
                                "best_params", "best_bs"):
                        if arrays[key]:
                            arrays[key] = jax.device_put(arrays[key], sh)
                params = arrays["params"]
                batch_stats = arrays["batch_stats"]
                opt_state = arrays["opt_state"]
                best_params = arrays["best_params"]
                best_bs = arrays["best_bs"] or None
                lr_factor = jnp.asarray(arrays["lr_factor"])
                active = jnp.asarray(arrays["active"])
                host = resume_progress
                best_val = np.asarray(host["best_val"], np.float64)
                best_plateau = np.asarray(host["best_plateau"], np.float64)
                wait = np.asarray(host["wait"], int)
                plateau_wait = np.asarray(host["plateau_wait"], int)
                resume_progress = None  # later phases run normally
            if phase_epochs <= 0:
                carry_params, carry_bs = self._end_vars(
                    params, batch_stats, best_params, best_bs, wait, patience)
                continue

            for _ in range(phase_epochs):
                t0 = time.time()
                rng = np.random.RandomState(epoch)
                shuffled = [rng.permutation(ix) for ix in train_idx]
                idx_tab, mask_tab = batch_tables(shuffled)

                # Whole train epoch + validation sweep: two compiled
                # programs per epoch (scan over batches on device).
                params, batch_stats, opt_state, train_metrics = train_epoch(
                    params, batch_stats, opt_state, frames, labels_d,
                    idx_tab, mask_tab, lr_factor, active, epoch)
                val_metrics = eval_epoch(params, batch_stats, frames,
                                         labels_d, v_idx_tab, v_mask_tab)

                # host-side vectorized callbacks; fetch() gathers the
                # trial-sharded [F] vectors to every process on a
                # multi-host mesh so the callback decisions stay lockstep.
                val_final = jax.vmap(M.compute_metrics)(val_metrics)
                val_loss = mesh_lib.fetch(val_final["loss"])
                val_auc = mesh_lib.fetch(val_final["auc"])
                # EarlyStopping and ReduceLROnPlateau track improvement
                # independently with Keras's min_deltas (0 strict vs 1e-4),
                # matching train/loop.py.
                improved = val_loss < best_val
                if best_params is None:
                    best_params = params
                    best_bs = batch_stats
                else:
                    imp = jnp.asarray(improved)

                    def sel(new, old):
                        ex = imp.reshape((F,) + (1,) * (new.ndim - 1))
                        return jnp.where(ex, new, old)
                    best_params = jax.tree.map(sel, params, best_params)
                    if batch_stats:
                        best_bs = jax.tree.map(sel, batch_stats, best_bs)
                best_val = np.where(improved, val_loss, best_val)
                wait = np.where(improved, 0, wait + 1)
                plateau_improved = val_loss < best_plateau - 1e-4
                best_plateau = np.where(plateau_improved, val_loss,
                                        best_plateau)
                plateau_wait = np.where(plateau_improved, 0,
                                        plateau_wait + 1)
                reduce = plateau_wait >= plateau_patience
                # Keras min_lr=1e-8 is absolute; the factor multiplies
                # phase.lr, so the factor floor is 1e-8 / phase.lr.
                min_factor = 1e-8 / max(float(phase.lr), 1e-30)
                lr_factor = jnp.asarray(np.where(
                    reduce,
                    np.maximum(np.asarray(lr_factor) * 0.5, min_factor),
                    np.asarray(lr_factor)), jnp.float32)
                plateau_wait = np.where(reduce, 0, plateau_wait)
                active = jnp.asarray((wait < patience).astype(np.float32))

                tr_final = jax.vmap(M.compute_metrics)(train_metrics)
                history.append({
                    "epoch": epoch, "phase": phase.name,
                    "train_loss": mesh_lib.fetch(tr_final["loss"]),
                    "train_auc": mesh_lib.fetch(tr_final["auc"]),
                    "val_loss": val_loss, "val_auc": val_auc,
                    "active": np.asarray(active).copy(),
                    "seconds": time.time() - t0,
                })
                if verbose:
                    print(f"[{self.progress_label} x{F}|{phase.name}] "
                          f"epoch {epoch}: "
                          f"val_loss={np.round(val_loss, 3)} "
                          f"val_auc={np.round(val_auc, 3)} "
                          f"active={int(np.asarray(active).sum())} "
                          f"({history[-1]['seconds']:.1f}s)")
                stopped = np.asarray(active).sum() == 0
                if checkpoint_dir:
                    self._save_resume(
                        checkpoint_dir,
                        {"params": params, "batch_stats": batch_stats,
                         "opt_state": opt_state, "best_params": best_params,
                         "best_bs": best_bs if best_bs else {},
                         "lr_factor": lr_factor, "active": active},
                        host_state={
                            "epoch": epoch, "phase_idx": phase_idx,
                            "epoch_in_phase": int(epoch_in_phase),
                            "history": self._history_to_host(history),
                            "best_val": [float(v) for v in best_val],
                            "best_plateau": [float(v)
                                             for v in best_plateau],
                            "wait": [int(v) for v in wait],
                            "plateau_wait": [int(v) for v in plateau_wait],
                            "phase_done": bool(stopped)})
                epoch += 1
                epoch_in_phase += 1
                if stopped:
                    break

            carry_params, carry_bs = self._end_vars(
                params, batch_stats, best_params, best_bs, wait, patience)

        best = {"params": carry_params}
        if carry_bs:
            best["batch_stats"] = carry_bs
        return best, history

    def _end_vars(self, params, batch_stats, best_params, best_bs,
                  wait, patience):
        """Per-fold end-of-phase weights, Keras semantics: EarlyStopping
        (restore_best_weights=True) restores the best-val weights ONLY for
        folds whose patience ran out (tf.keras EarlyStopping restores
        inside the wait>=patience branch; reference train.py:155-156);
        folds that exhausted the epoch budget keep their FINAL weights —
        matching the serial Trainer phase-end rule (train/loop.py)."""
        if best_params is None:
            return params, (batch_stats if batch_stats else None)
        F = self.n_folds
        early = jnp.asarray(
            (np.asarray(wait) >= patience).astype(np.float32))

        def sel(b, p):
            ex = early.reshape((F,) + (1,) * (p.ndim - 1))
            return jnp.where(ex > 0, b, p)

        carry_p = jax.tree.map(sel, best_params, params)
        if best_bs and batch_stats:
            carry_b = jax.tree.map(sel, best_bs, batch_stats)
        else:
            carry_b = batch_stats if batch_stats else None
        return carry_p, carry_b
