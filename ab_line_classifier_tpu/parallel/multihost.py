"""Multi-host (multi-process) execution path: distributed init + one
data-parallel train step, runnable as a subprocess-per-host dryrun.

The reference has no distributed code at all (SURVEY §5: no communication
backend anywhere in ``/root/reference/src``); this is the TPU-native
multi-host story — ``jax.distributed.initialize`` (DCN coordination),
one global ``(trial, data)`` mesh spanning every process's devices,
``host_local_batch`` feeding each process's shard of the global batch, and
the SAME jitted train step as single-host (XLA inserts cross-host
collectives; on CPU they run over gloo, on a pod over DCN/ICI).

Two surfaces:

* :func:`dryrun_multihost` — library call: init, build the mesh, run ONE
  real train step on a tiny cnn0, optionally dump the updated parameters.
* ``python -m ab_line_classifier_tpu.parallel.multihost`` — the same as a
  CLI, spawned once per simulated host by ``tests/test_multihost.py``
  (2 processes × 4 virtual CPU devices), which asserts the result equals
  the single-process 8-device run.
"""

from __future__ import annotations

import argparse
from typing import Optional

import numpy as np

# Tiny but real: conv + BN + dense, the full train-step machinery.
_HP = {"LR": 1e-3, "DROPOUT": 0.1, "L2_LAMBDA": 1e-4, "NODES_DENSE0": 8,
       "KERNEL_SIZE": 3, "STRIDES": 2, "MAXPOOL_SIZE": 2, "BLOCKS": 1,
       "INIT_FILTERS": 4, "FILTER_EXP_BASE": 2}
_IMG = (16, 16)
_BATCH = 16  # global batch, sharded over the data axis


def global_batch(n_classes: int = 2):
    """The deterministic global batch every process agrees on."""
    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, (_BATCH, *_IMG, 3)).astype(np.uint8)
    labels = rng.randint(0, n_classes, _BATCH).astype(np.int32)
    mask = np.ones((_BATCH,), np.float32)
    return images, labels, mask


def one_step_params(mesh) -> list:
    """Init a tiny model and run ONE data-parallel train step over ``mesh``
    (which may span processes); returns the updated parameter leaves, host-
    materialized. Every process must call this with the same global mesh."""
    import jax

    from ab_line_classifier_tpu.models import build_model
    from ab_line_classifier_tpu.ops import metrics as M
    from ab_line_classifier_tpu.parallel import mesh as mesh_lib
    from ab_line_classifier_tpu.train.loop import Trainer

    spec = build_model("cnn0", _HP, _IMG + (3,), 2)
    trainer = Trainer(spec, seed=0, mesh=mesh)
    phase = spec.phases[0]
    state, tx = trainer.init_state(phase)
    step = trainer.make_train_step(phase, tx)

    images, labels, mask = global_batch()
    n_proc = jax.process_count()
    pid = jax.process_index()
    if _BATCH % n_proc or _BATCH % len(jax.devices()):
        raise ValueError(
            f"global batch {_BATCH} must divide evenly across "
            f"{n_proc} processes and {len(jax.devices())} devices")
    # Each process loads ONLY its host-local slice of the global batch
    # (a real pipeline reads different files per host); host_local_batch
    # stitches the slices into one global P('data') array.
    rows = _BATCH // n_proc
    sl = slice(pid * rows, (pid + 1) * rows)
    images_g, labels_g, mask_g = mesh_lib.host_local_batch(
        mesh, images[sl], labels[sl], mask[sl])

    state, _ = step(state, M.init_metrics(2), images_g, labels_g, mask_g)
    return [np.asarray(leaf) for leaf in jax.tree.leaves(state.params)]


def one_epoch_trial_parallel(mesh) -> np.ndarray:
    """One trial-parallel training epoch over ``mesh`` (which may span
    processes) in the recommended pod topology (docs/SCALING.md): the
    ``trial`` axis on the OUTER, DCN-crossing dimension — trials exchange
    no tensors, so the slow links carry nothing — while each trial's batch
    shards over the intra-host ``data`` axis. Returns the per-trial val
    losses, host-materialized on every process."""
    from ab_line_classifier_tpu.models import build_model
    from ab_line_classifier_tpu.parallel import mesh as mesh_lib
    from ab_line_classifier_tpu.parallel.trial_parallel import (
        ParallelFoldTrainer)

    n_trial = mesh.shape[mesh_lib.TRIAL_AXIS]
    spec = build_model("cnn0", _HP, _IMG + (3,), 2)
    pt = ParallelFoldTrainer(
        spec, n_trial, class_weights=np.ones((n_trial, 2), np.float32),
        mesh=mesh, seed=0)
    images, labels, mask = global_batch()
    idx = [np.arange(_BATCH) for _ in range(n_trial)]
    _, hist = pt.fit(images, labels, idx, idx, batch_size=_BATCH,
                     epochs=1, verbose=False)
    return np.asarray(hist[-1]["val_loss"])


def dryrun_multihost(process_id: int, num_processes: int,
                     coordinator: str, out_path: Optional[str] = None,
                     local_device_count: int = 4) -> None:
    """Initialize the distributed runtime and execute one cross-host
    data-parallel train step. Must run in a FRESH process per host (before
    any other jax use) — see tests/test_multihost.py."""
    import os

    os.environ.setdefault("ABLC_PLATFORM", "cpu")
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "").replace(
            "--xla_force_host_platform_device_count=8", "").strip()
        + f" --xla_force_host_platform_device_count={local_device_count}"
    ).strip()

    import ab_line_classifier_tpu  # noqa: F401  (platform + cache setup)
    import jax

    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    from ab_line_classifier_tpu.parallel import mesh as mesh_lib

    assert jax.process_count() == num_processes
    assert len(jax.devices()) == num_processes * local_device_count
    mesh = mesh_lib.make_mesh(n_data=len(jax.devices()), n_trial=1)
    leaves = one_step_params(mesh)

    # The recommended pod topology: trial = the process (DCN) axis,
    # data = the intra-host axis.
    mesh_t = mesh_lib.make_mesh(n_data=local_device_count,
                                n_trial=num_processes)
    val_loss = one_epoch_trial_parallel(mesh_t)

    # Resume sync across hosts: write a checkpoint into a dir that exists
    # ONLY on process 0 (host-local checkpoint dirs, the non-shared-FS
    # case) and load it from every process — load_resume must broadcast
    # process 0's bytes so all hosts take the same resume decision.
    import tempfile

    from ab_line_classifier_tpu.utils.resume import load_resume, save_resume

    ckpt_dir = tempfile.mkdtemp(prefix="mh_resume_") if process_id == 0 \
        else "/nonexistent/mh_resume"
    if process_id == 0:
        save_resume(ckpt_dir, "probe.msgpack",
                    {"w": np.arange(4, dtype=np.float32)}, {"epoch": 7})
    loaded = load_resume(ckpt_dir, "probe.msgpack")
    assert loaded is not None, "resume sync lost process 0's checkpoint"
    payload, progress = loaded
    assert progress["epoch"] == 7
    np.testing.assert_array_equal(payload["w"],
                                  np.arange(4, dtype=np.float32))

    if out_path and process_id == 0:
        np.savez(out_path, *leaves, trial_val_loss=val_loss)
    jax.distributed.shutdown()


def spawn_dryrun_pair(out_path: str, *, local_device_count: int = 4,
                      timeout: int = 600):
    """Spawn the 2-process distributed dryrun (one subprocess per simulated
    host) and return the loaded ``.npz`` result written by process 0.

    One definition of the whole recipe — coordinator port pick, env setup
    (PYTHONPATH PREPENDED, never overwritten: the default carries the TPU
    plugin path), arg list, and failure handling — shared by
    ``tests/test_multihost.py`` and the driver contract
    (``__graft_entry__.dryrun_multichip``) so the two cannot drift.

    Robust against a wedged pair: a stalled process (e.g. its peer died
    mid-collective) is KILLED after ``timeout`` and both stderr tails are
    raised, instead of leaking children and dying with a bare
    TimeoutExpired."""
    import os
    import socket
    import subprocess
    import sys
    import time

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu", "ABLC_PLATFORM": "cpu", "XLA_FLAGS": "",
        "PYTHONPATH": repo_root + os.pathsep + env.get("PYTHONPATH", ""),
    })
    procs = [subprocess.Popen(
        [sys.executable, "-m",
         "ab_line_classifier_tpu.parallel.multihost",
         "--process-id", str(pid), "--num-processes", "2",
         "--coordinator", f"127.0.0.1:{port}", "--out", out_path,
         "--local-devices", str(local_device_count)],
        env=env, cwd=repo_root,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for pid in range(2)]
    outs = []
    # One shared deadline for the PAIR: sequential communicate(timeout=)
    # calls would let a process-0 that finishes just under the limit grant
    # process 1 a fresh budget — up to ~2x the documented timeout before
    # the kill path runs.
    deadline = time.monotonic() + timeout
    try:
        for p in procs:
            outs.append(p.communicate(
                timeout=max(0.0, deadline - time.monotonic())))
    except subprocess.TimeoutExpired:
        tails = []
        for p in procs:
            if p.poll() is None:
                p.kill()
            _, se = p.communicate()
            tails.append((se or b"").decode(errors="replace")[-2000:])
        raise RuntimeError(
            "multihost dryrun pair timed out after "
            f"{timeout}s; stderr tails:\n" + "\n---\n".join(tails))
    for p, (_, se) in zip(procs, outs):
        if p.returncode != 0:
            raise RuntimeError(
                f"multihost process {p.args[4]} failed (rc={p.returncode}):"
                f"\n{se.decode(errors='replace')[-3000:]}")
    return np.load(out_path)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--local-devices", type=int, default=4)
    args = ap.parse_args()
    dryrun_multihost(args.process_id, args.num_processes, args.coordinator,
                     out_path=args.out,
                     local_device_count=args.local_devices)


if __name__ == "__main__":
    main()
