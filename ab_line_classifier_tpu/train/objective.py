"""Shared training objective: forward pass + Keras-semantics loss.

ONE implementation serves both the serial :class:`~ab_line_classifier_tpu.
train.loop.Trainer` and the SPMD :class:`~ab_line_classifier_tpu.parallel.
trial_parallel.ParallelFoldTrainer`, so loss-semantics subtleties (the
logged loss is the optimized total: class-weighted CE during training with
UNWEIGHTED validation loss, activity-regularization penalties in both,
masked-batch denominators — reference ``src/train.py:135``) can never drift
between the two trainers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ab_line_classifier_tpu.data.augment import augment_batch


def forward_loss(module, reg_layers, reg_lambdas, params, batch_stats, x,
                 labels_oh, mask, class_w, rng, train: bool):
    """Masked, class-weighted categorical cross-entropy + activity
    regularization through one module apply.

    Returns ``(loss, (probs, per_example_total, new_model_state))``;
    ``class_w`` is a ``[C]`` weight vector (training only — validation loss
    is unweighted, like Keras ``fit(class_weight=...)``).
    """
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    if train:
        if batch_stats:
            out, new_state = module.apply(
                variables, x, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng})
        else:
            out = module.apply(variables, x, train=True,
                               rngs={"dropout": rng})
            new_state = {}
    else:
        out = module.apply(variables, x, train=False)
        new_state = {}
    logits, caps = (out if reg_layers else (out, {}))
    logits = logits.astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    per_ex = -jnp.sum(labels_oh * log_probs, axis=-1)
    w = jnp.sum(labels_oh * class_w, axis=-1) if train else 1.0
    per_ex_total = per_ex * w
    for name, lam in zip(reg_layers, reg_lambdas):
        a = caps[name].astype(jnp.float32)
        per_ex_total = per_ex_total + lam * jnp.sum(
            a * a, axis=tuple(range(1, a.ndim)))
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    loss = jnp.sum(per_ex_total * mask) / denom
    return loss, (jax.nn.softmax(logits, axis=-1), per_ex_total, new_state)


def prepare_images(preprocess_fn, aug_params, compute_dtype, images, rng,
                   train: bool):
    """uint8 batch -> augmented (training) + normalized model input in the
    compute dtype (the reference's augment-then-scale order,
    ``src/data/preprocessor.py:50-63``)."""
    x = images.astype(jnp.float32)
    if train and aug_params:
        x = augment_batch(x, rng, **aug_params)
    return preprocess_fn(x).astype(compute_dtype)
