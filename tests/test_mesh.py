"""Mesh sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ab_line_classifier_tpu.parallel import mesh as mesh_lib

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_make_mesh_shapes():
    mesh = mesh_lib.make_mesh(n_data=-1, n_trial=2)
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("trial", "data")
    mesh1 = mesh_lib.make_mesh(n_data=8, n_trial=1)
    assert mesh1.devices.shape == (1, 8)


def test_mesh_overcommit_rejected():
    with pytest.raises(ValueError):
        mesh_lib.make_mesh(n_data=8, n_trial=2)
    with pytest.raises(ValueError):
        mesh_lib.make_mesh(n_data=-1, n_trial=3)  # 8 % 3 != 0


def test_batch_sharding_layout():
    mesh = mesh_lib.make_mesh(n_data=8)
    x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    xs = mesh_lib.shard_batch(mesh, x)
    assert len(xs.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(xs), x)


def test_data_parallel_grad_matches_single_device():
    """psum-reduced data-parallel gradients == single-device gradients."""
    mesh = mesh_lib.make_mesh(n_data=8, n_trial=1)
    w = jnp.asarray(np.random.RandomState(0).randn(4, 2), jnp.float32)
    x = jnp.asarray(np.random.RandomState(1).randn(16, 4), jnp.float32)
    y = jnp.asarray(np.random.RandomState(2).randint(0, 2, 16))

    def loss(w, x, y):
        logits = x @ w
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(logp, y[:, None], 1))

    g_single = jax.grad(loss)(w, x, y)
    xs = mesh_lib.shard_batch(mesh, np.asarray(x))
    ys = mesh_lib.shard_batch(mesh, np.asarray(y))
    wr = jax.device_put(w, mesh_lib.replicated(mesh))
    g_sharded = jax.jit(jax.grad(loss))(wr, xs, ys)
    np.testing.assert_allclose(np.asarray(g_single), np.asarray(g_sharded),
                               atol=1e-5)


def test_metrics_psum_reduction():
    """Metric accumulators reduce across the data axis with one psum."""
    from functools import partial

    from ab_line_classifier_tpu.ops import metrics as M

    mesh = mesh_lib.make_mesh(n_data=8, n_trial=1)
    probs = np.random.RandomState(0).rand(16, 2).astype(np.float32)
    probs /= probs.sum(-1, keepdims=True)
    labels = np.eye(2)[np.random.RandomState(1).randint(0, 2, 16)].astype(
        np.float32)

    # single-device truth
    ref = M.compute_metrics(M.update_metrics(M.init_metrics(2),
                                             jnp.asarray(probs),
                                             jnp.asarray(labels)))

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(jax.sharding.PartitionSpec("data"),
                       jax.sharding.PartitionSpec("data")),
             out_specs=jax.sharding.PartitionSpec())
    def sharded_update(p_shard, l_shard):
        st = M.update_metrics(M.init_metrics(2), p_shard, l_shard)
        return M.reduce_metrics(st, "data")

    st = sharded_update(jnp.asarray(probs), jnp.asarray(labels))
    got = M.compute_metrics(st)
    for k in ("accuracy", "auc"):
        np.testing.assert_allclose(float(got[k]), float(ref[k]), atol=1e-5)


def test_host_local_batch_single_process():
    """host_local_batch degrades to a sharded device_put single-process and
    preserves values + the P('data') sharding."""
    mesh = mesh_lib.make_mesh(n_data=4, n_trial=2)
    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    y = np.arange(8, dtype=np.int32)
    gx, gy = mesh_lib.host_local_batch(mesh, x, y)
    np.testing.assert_array_equal(np.asarray(gx), x)
    np.testing.assert_array_equal(np.asarray(gy), y)
    assert gx.sharding.spec == jax.sharding.PartitionSpec(
        mesh_lib.DATA_AXIS)


def test_mesh_sharded_predictor_matches_single_device():
    """Data-parallel serving over the full (trial x data) mesh == the
    single-device Predictor, and the chunk size rounds up to the device
    count (distributed inference the reference has none of)."""
    from ab_line_classifier_tpu.models import build_model
    from ab_line_classifier_tpu.predict.predict import Predictor

    hp = {"LR": 1e-3, "DROPOUT": 0.1, "L2_LAMBDA": 0.0, "NODES_DENSE0": 8,
          "KERNEL_SIZE": 3, "STRIDES": 2, "MAXPOOL_SIZE": 2, "BLOCKS": 1,
          "INIT_FILTERS": 4, "FILTER_EXP_BASE": 2}
    spec = build_model("cnn0", hp, (32, 32, 3), 2)
    variables = spec.init_variables(jax.random.PRNGKey(0))
    frames = np.random.RandomState(0).randint(
        0, 256, (21, 32, 32, 3)).astype(np.uint8)  # ragged tail

    single = Predictor(spec, variables, batch_size=6,
                       compute_dtype=jnp.float32)
    mesh = mesh_lib.make_mesh(n_data=4, n_trial=2)
    sharded = Predictor(spec, variables, batch_size=6,
                        compute_dtype=jnp.float32, mesh=mesh)
    assert sharded.batch_size == 8  # rounded up to 8 devices

    p0 = single.predict_probs(frames)
    p1 = sharded.predict_probs(frames)
    np.testing.assert_allclose(p0, p1, atol=1e-6)


def test_mesh_from_config():
    from ab_line_classifier_tpu.config import Config

    cfg = Config({"PARALLEL": {"MESH": {"DATA": 4, "TRIAL": 2}}})
    mesh = mesh_lib.mesh_from_config(cfg)
    assert mesh is not None and mesh.devices.shape == (2, 4)
    assert mesh_lib.mesh_from_config(Config({})) is None
    # invalid shape degrades to single-device, not an exception
    bad = Config({"PARALLEL": {"MESH": {"DATA": 5, "TRIAL": 3}}})
    assert mesh_lib.mesh_from_config(bad) is None


def test_double_buffered_streaming_matches_serial_under_mesh(tmp_path):
    """The streaming tier's double-buffered transfer (batch k+1's
    device_put issued before step k dispatches, train/loop._run_epoch)
    must be a pure scheduling change: one epoch under the mesh with
    ABLC_DEVICE_PREFETCH=1 produces bit-identical params to the serial
    path (=0). Measured on the real chip too (docs/PERFORMANCE.md #4)."""
    import os

    import pandas as pd
    from PIL import Image

    from ab_line_classifier_tpu.data.pipeline import FrameDataset
    from ab_line_classifier_tpu.models import build_model
    from ab_line_classifier_tpu.train.loop import Trainer

    fdir = str(tmp_path / "frames")
    os.makedirs(fdir)
    rng = np.random.RandomState(0)
    rows = []
    for i in range(32):
        name = f"c{i % 4}_{i // 4}.jpg"
        Image.fromarray(rng.randint(0, 256, (32, 32, 3), np.uint8)).save(
            os.path.join(fdir, name), quality=95)
        rows.append({"Frame Path": name, "Class": i % 2,
                     "patient_id": f"p{i % 4}", "id": f"c{i % 4}"})
    df = pd.DataFrame(rows)
    tds = FrameDataset(df.iloc[:24], fdir, img_dim=(32, 32))
    vds = FrameDataset(df.iloc[24:], fdir, img_dim=(32, 32))

    hp = {"LR": 1e-3, "DROPOUT": 0.0, "L2_LAMBDA": 0.0, "NODES_DENSE0": 8,
          "KERNEL_SIZE": 3, "STRIDES": 1, "MAXPOOL_SIZE": 2, "BLOCKS": 1,
          "INIT_FILTERS": 4, "FILTER_EXP_BASE": 2}
    spec = build_model("cnn0", hp, (32, 32, 3), 2)
    mesh = mesh_lib.make_mesh(n_data=8, n_trial=1)

    results = {}
    prev = os.environ.get("ABLC_DEVICE_PREFETCH")
    for mode in ("0", "1"):
        os.environ["ABLC_DEVICE_PREFETCH"] = mode
        try:
            best, _ = Trainer(spec, seed=3, mesh=mesh).fit(
                tds, vds, batch_size=8, epochs=2, patience=10,
                verbose=False)
        finally:
            # Restore, don't delete: a developer's exported =0 (the
            # documented serial-debug mode) must survive this test.
            if prev is None:
                os.environ.pop("ABLC_DEVICE_PREFETCH", None)
            else:
                os.environ["ABLC_DEVICE_PREFETCH"] = prev
        results[mode] = jax.tree.map(np.asarray, best["params"])
    for a, b in zip(jax.tree_util.tree_leaves(results["0"]),
                    jax.tree_util.tree_leaves(results["1"])):
        np.testing.assert_array_equal(a, b)
