"""Mid-training checkpoint/resume: interrupted training continues exactly."""

import numpy as np
import pandas as pd
import pytest

from ab_line_classifier_tpu.data.pipeline import FrameDataset
from ab_line_classifier_tpu.data.splits import train_val_test_split
from ab_line_classifier_tpu.data.synthetic import generate_dataset
from ab_line_classifier_tpu.models import build_model
from ab_line_classifier_tpu.train.loop import Trainer

HP = {"LR": 1e-3, "DROPOUT": 0.1, "L2_LAMBDA": 0.0, "NODES_DENSE0": 8,
      "KERNEL_SIZE": 3, "STRIDES": 2, "MAXPOOL_SIZE": 2, "BLOCKS": 1,
      "INIT_FILTERS": 4, "FILTER_EXP_BASE": 2}


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    ws = str(tmp_path_factory.mktemp("resume_ws"))
    fcsv, _, fdir = generate_dataset(ws, n_patients=10, clips_per_patient=2,
                                     frames_per_clip=3, hw=(32, 32), seed=7)
    df = pd.read_csv(fcsv)
    tr, va, _ = train_val_test_split(df, 0.15, 0.15, random_seed=42)
    return (FrameDataset(tr, fdir, img_dim=(32, 32)),
            FrameDataset(va, fdir, img_dim=(32, 32)))


def test_resume_matches_uninterrupted(data, tmp_path):
    tds, vds = data
    spec = build_model("cnn0", HP, (32, 32, 3), 2)
    ckdir = str(tmp_path / "ckpt")

    full, hist_full = Trainer(spec, seed=9).fit(
        tds, vds, batch_size=16, epochs=4, patience=10, verbose=False)
    Trainer(spec, seed=9).fit(
        tds, vds, batch_size=16, epochs=2, patience=10, verbose=False,
        checkpoint_dir=ckdir)
    resumed, h2 = Trainer(spec, seed=9).fit(
        tds, vds, batch_size=16, epochs=4, patience=10, verbose=False,
        checkpoint_dir=ckdir, resume=True)

    assert [h.epoch for h in hist_full] == [0, 1, 2, 3]
    assert [h.epoch for h in h2] == [2, 3]
    np.testing.assert_allclose(
        np.asarray(full["params"]["conv2d_block0_0"]["kernel"]),
        np.asarray(resumed["params"]["conv2d_block0_0"]["kernel"]),
        atol=1e-6)


def test_resume_after_full_completion_returns_trained_weights(data, tmp_path):
    """Resuming a run whose epoch budget is already exhausted must return
    the checkpointed weights, not retrain or lose them."""
    tds, vds = data
    spec = build_model("cnn0", HP, (32, 32, 3), 2)
    ckdir = str(tmp_path / "ckpt_done")
    done, h1 = Trainer(spec, seed=3).fit(
        tds, vds, batch_size=16, epochs=2, patience=10, verbose=False,
        checkpoint_dir=ckdir)
    resumed, h2 = Trainer(spec, seed=3).fit(
        tds, vds, batch_size=16, epochs=2, patience=10, verbose=False,
        checkpoint_dir=ckdir, resume=True)
    assert h2 == []  # nothing left to train
    assert resumed is not None
    np.testing.assert_allclose(
        np.asarray(done["params"]["conv2d_block0_0"]["kernel"]),
        np.asarray(resumed["params"]["conv2d_block0_0"]["kernel"]),
        atol=1e-6)


def test_resume_after_early_stop_does_not_retrain(data, tmp_path):
    """An early-stopped phase is checkpointed as done: resume must not
    re-enter it and train extra epochs past the deliberate stop."""
    tds, vds = data
    # LR=0.5 + no dropout diverges from epoch 1 on this fixture, so
    # patience=2 stops the run after 3 of 30 epochs.
    spec = build_model("cnn0", dict(HP, LR=0.5, DROPOUT=0.0), (32, 32, 3), 2)
    ckdir = str(tmp_path / "ckpt_es")
    stopped, h1 = Trainer(spec, seed=4).fit(
        tds, vds, batch_size=16, epochs=30, patience=2, verbose=False,
        checkpoint_dir=ckdir)
    assert len(h1) < 30  # early stopping fired
    resumed, h2 = Trainer(spec, seed=4).fit(
        tds, vds, batch_size=16, epochs=30, patience=2, verbose=False,
        checkpoint_dir=ckdir, resume=True)
    assert h2 == []
    np.testing.assert_allclose(
        np.asarray(stopped["params"]["conv2d_block0_0"]["kernel"]),
        np.asarray(resumed["params"]["conv2d_block0_0"]["kernel"]),
        atol=1e-6)


def test_resume_without_checkpoint_trains_fresh(data, tmp_path):
    tds, vds = data
    spec = build_model("cnn0", HP, (32, 32, 3), 2)
    # resume=True with an empty dir: trains from scratch, no crash
    best, hist = Trainer(spec, seed=1).fit(
        tds, vds, batch_size=16, epochs=1, patience=5, verbose=False,
        checkpoint_dir=str(tmp_path / "empty"), resume=True)
    assert len(hist) == 1


def test_device_cached_epoch_matches_streaming(data):
    """The scan-based single-program epoch (device-cached path) trains
    numerically identically to the streaming per-batch path: same shuffles,
    same RNG stream, same padding. (Exact bit equality is not expected —
    scanned vs unrolled programs fuse differently in XLA.)"""
    from ab_line_classifier_tpu.data.pipeline import DeviceCachedDataset

    tds, vds = data
    spec = build_model("cnn0", HP, (32, 32, 3), 2)
    stream_vars, h1 = Trainer(spec, seed=11).fit(
        tds, vds, batch_size=16, epochs=2, patience=10, verbose=False)
    cached_vars, h2 = Trainer(spec, seed=11).fit(
        DeviceCachedDataset(tds), DeviceCachedDataset(vds),
        batch_size=16, epochs=2, patience=10, verbose=False)
    np.testing.assert_allclose([h.val["loss"] for h in h1],
                               [h.val["loss"] for h in h2], rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(stream_vars["params"]["conv2d_block0_0"]["kernel"]),
        np.asarray(cached_vars["params"]["conv2d_block0_0"]["kernel"]),
        atol=1e-4)


def test_resume_file_atomic_single_blob(tmp_path):
    """utils/resume: one file, temp+rename write (no .tmp survivors), arrays
    + progress round-trip together so a kill can never desynchronize them."""
    import os

    from ab_line_classifier_tpu.utils.resume import load_resume, save_resume

    payload = {"a": np.arange(3, dtype=np.int32),
               "nested": {"b": np.ones((2, 2), np.float32)},
               "absent": None}
    save_resume(str(tmp_path), "ck.msgpack", payload, {"epoch": 3, "w": [1]})
    assert sorted(os.listdir(tmp_path)) == ["ck.msgpack"]

    loaded = load_resume(str(tmp_path), "ck.msgpack")
    assert loaded is not None
    arrays, progress = loaded
    assert progress == {"epoch": 3, "w": [1]}
    np.testing.assert_array_equal(arrays["a"], payload["a"])
    np.testing.assert_array_equal(arrays["nested"]["b"],
                                  payload["nested"]["b"])
    assert arrays["absent"] is None

    # overwrite keeps a single complete file
    save_resume(str(tmp_path), "ck.msgpack", payload, {"epoch": 4})
    assert load_resume(str(tmp_path), "ck.msgpack")[1]["epoch"] == 4
    assert load_resume(str(tmp_path), "nothere.msgpack") is None
    assert load_resume(None, "ck.msgpack") is None


def test_train_experiment_plumbs_resume(tmp_path, monkeypatch):
    """--resume/--checkpoint-dir reach the trainers from the dispatcher (the
    CLI's path): single_train -> perform_single_run, trial-parallel variants
    -> their fit()s, with a derived default checkpoint dir."""
    import os

    from ab_line_classifier_tpu.config import Config, load_config
    from ab_line_classifier_tpu.train import experiment as E

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    d = load_config(os.path.join(repo, "config.yml")).to_dict()
    d["PATHS"]["MODEL_WEIGHTS"] = str(tmp_path / "models")
    cfg = Config(d)

    seen = {}
    monkeypatch.setattr(E, "perform_single_run",
                        lambda cfg, **kw: seen.update(kw))
    E.train_experiment(cfg, experiment="single_train", resume=True)
    assert seen["resume"] is True
    assert seen["checkpoint_dir"] == os.path.join(
        str(tmp_path / "models"), "_resume", "single_train")

    seen.clear()
    E.train_experiment(cfg, experiment="single_train",
                       checkpoint_dir=str(tmp_path / "ck"))
    assert seen["checkpoint_dir"] == str(tmp_path / "ck")
    assert seen["resume"] is False


def test_resume_restores_mesh_replicated_placement(data, tmp_path):
    """After a resume under a mesh, from_state_dict leaves host numpy in
    the TrainState; Trainer.fit must re-apply the replicated NamedSharding
    init_state establishes (a multi-host mesh would otherwise fail on
    process-local arrays; same re-device_put ParallelFoldTrainer does)."""
    import jax
    from jax.sharding import NamedSharding

    from ab_line_classifier_tpu.parallel.mesh import make_mesh

    tds, vds = data
    spec = build_model("cnn0", HP, (32, 32, 3), 2)
    mesh = make_mesh(n_data=-1, n_trial=1)
    ckdir = str(tmp_path / "ckpt_mesh")

    Trainer(spec, seed=5, mesh=mesh).fit(
        tds, vds, batch_size=16, epochs=1, patience=10, verbose=False,
        checkpoint_dir=ckdir)
    resumed, h2 = Trainer(spec, seed=5, mesh=mesh).fit(
        tds, vds, batch_size=16, epochs=2, patience=10, verbose=False,
        checkpoint_dir=ckdir, resume=True)
    assert [h.epoch for h in h2] == [1]

    # Resumed run matches the uninterrupted mesh run bit-for-bit.
    full, _ = Trainer(spec, seed=5, mesh=mesh).fit(
        tds, vds, batch_size=16, epochs=2, patience=10, verbose=False)
    np.testing.assert_allclose(
        np.asarray(full["params"]["conv2d_block0_0"]["kernel"]),
        np.asarray(resumed["params"]["conv2d_block0_0"]["kernel"]),
        atol=1e-6)
