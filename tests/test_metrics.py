import jax.numpy as jnp
import numpy as np
from sklearn.metrics import accuracy_score, roc_auc_score

from ab_line_classifier_tpu.ops import metrics as M


def _stream(probs, yoh, batch=64):
    n, c = probs.shape
    st = M.init_metrics(c)
    for i in range(0, n, batch):
        pb, yb = probs[i:i + batch], yoh[i:i + batch]
        pad = batch - len(pb)
        mask = np.concatenate([np.ones(len(pb)), np.zeros(pad)])
        pb = np.concatenate([pb, np.zeros((pad, c), np.float32)])
        yb = np.concatenate([yb, np.zeros((pad, c), np.float32)])
        st = M.update_metrics(st, jnp.asarray(pb), jnp.asarray(yb),
                              sample_mask=jnp.asarray(mask))
    return st


def test_streaming_vs_sklearn():
    rng = np.random.RandomState(1)
    n, c = 500, 2
    logits = rng.randn(n, c).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    y = rng.randint(0, c, n)
    yoh = np.eye(c)[y].astype(np.float32)

    out = {k: float(v) for k, v in
           M.compute_metrics(_stream(probs, yoh),
                             ["a_lines", "b_lines"]).items()}
    # Keras AUC semantics: micro over all class columns.
    sk_auc = roc_auc_score(np.concatenate([1 - y, y]),
                           np.concatenate([probs[:, 0], probs[:, 1]]))
    assert abs(out["accuracy"] - accuracy_score(y, probs.argmax(1))) < 1e-6
    assert abs(out["auc"] - sk_auc) < 0.01  # 200-bin Riemann approximation

    pred_pos = probs[:, 1] > 0.5
    tp = (pred_pos & (y == 1)).sum()
    fp = (pred_pos & (y == 0)).sum()
    fn = (~pred_pos & (y == 1)).sum()
    assert abs(out["precision_b_lines"] - tp / (tp + fp)) < 1e-5
    assert abs(out["recall_b_lines"] - tp / (tp + fn)) < 1e-5


def test_perfect_classifier_auc_one():
    y = np.array([0, 0, 1, 1])
    probs = np.array([[0.9, 0.1], [0.8, 0.2], [0.1, 0.9], [0.2, 0.8]],
                     np.float32)
    yoh = np.eye(2)[y].astype(np.float32)
    st = M.update_metrics(M.init_metrics(2), jnp.asarray(probs),
                          jnp.asarray(yoh))
    out = M.compute_metrics(st)
    assert float(out["accuracy"]) == 1.0
    assert float(out["auc"]) > 0.99


def test_loss_accumulation():
    st = M.init_metrics(2)
    probs = jnp.asarray([[0.5, 0.5]] * 4, jnp.float32)
    yoh = jnp.asarray([[1.0, 0.0]] * 4, jnp.float32)
    st = M.update_metrics(st, probs, yoh, loss=jnp.asarray([1.0, 2.0, 3.0, 4.0]))
    out = M.compute_metrics(st)
    assert abs(float(out["loss"]) - 2.5) < 1e-6


def test_integer_labels_accepted():
    st = M.init_metrics(2)
    probs = jnp.asarray([[0.9, 0.1], [0.1, 0.9]], jnp.float32)
    st = M.update_metrics(st, probs, jnp.asarray([0, 1]))
    out = M.compute_metrics(st)
    assert float(out["accuracy"]) == 1.0
