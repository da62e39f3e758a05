"""The README's first runnable artifact — ``examples/quickstart_synthetic.py``
— driven exactly as a new user would run it (a fresh subprocess from the
repo root), asserting the full artifact contract it promises: a trained
checkpoint, frame/clip prediction CSVs, and Grad-CAM heatmap PNGs.

The example is the successor to the reference's README walk-through
(reference ``README.md:40-120``), which was never executable without
proprietary data; guarding it here keeps the one-command onboarding path
from bitrotting as the library evolves.
"""

import glob
import os
import subprocess
import sys

import pytest

from tests.conftest import REPO_ROOT, cli_env


@pytest.mark.slow
def test_quickstart_runs_end_to_end(tmp_path):
    ws = str(tmp_path / "qs_ws")
    env = cli_env()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "examples",
                                      "quickstart_synthetic.py"),
         "--workspace", ws, "--epochs", "2"],
        env=env, cwd=REPO_ROOT, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "Done." in proc.stdout

    # Workspace config the follow-up CLIs are told to use.
    assert os.path.isfile(os.path.join(ws, "config.yml"))
    # Checkpoint directory contract (utils/checkpoint.py).
    ckpts = glob.glob(os.path.join(ws, "results", "models", "model*"))
    assert ckpts and any(
        os.path.isfile(os.path.join(c, "meta.json")) for c in ckpts)
    # Frame + clip prediction CSVs and metrics JSONs.
    assert glob.glob(os.path.join(ws, "results", "predictions", "*.csv"))
    assert glob.glob(os.path.join(ws, "results", "metrics", "*.json"))
    # Grad-CAM heatmap PNGs for the 3 requested frames.
    assert len(glob.glob(os.path.join(ws, "img", "heatmaps", "*.png"))) == 3
