import math

import numpy as np
import pytest

from ab_line_classifier_tpu.train.sweep import (
    BayesController, GridController, RandomController, SweepVar,
    make_controller, space_from_config)


SPACE = [
    SweepVar("LR", "float_log", (1e-5, 1e-2)),
    SweepVar("DROPOUT", "float_uniform", (0.0, 0.5)),
    SweepVar("BLOCKS", "int_uniform", (1, 3)),
    SweepVar("INIT_FILTERS", "set", (16, 32)),
]


def test_space_from_config():
    cfg = {"LR": {"TYPE": "float_log", "RANGE": [1e-5, 1e-3]},
           "DROPOUT": {"TYPE": "float_uniform", "RANGE": [0.0, 0.5]},
           "SKIPPED": {"TYPE": "set", "RANGE": None}}
    space = space_from_config(cfg)
    assert [v.name for v in space] == ["LR", "DROPOUT"]


def test_unknown_type_rejected():
    with pytest.raises(ValueError):
        SweepVar("X", "gaussian", (0, 1))


def test_samples_respect_ranges():
    c = RandomController(SPACE, seed=0)
    for _ in range(50):
        p = c.suggest()
        assert 1e-5 <= p["LR"] <= 1e-2
        assert 0.0 <= p["DROPOUT"] <= 0.5
        assert p["BLOCKS"] in (1, 2, 3)
        assert p["INIT_FILTERS"] in (16, 32)


def test_encode_decode_roundtrip():
    c = RandomController(SPACE, seed=1)
    for _ in range(20):
        p = c.suggest()
        u = c._encode(p)
        q = c._decode(u)
        assert q["BLOCKS"] == p["BLOCKS"]
        assert q["INIT_FILTERS"] == p["INIT_FILTERS"]
        assert math.isclose(q["LR"], p["LR"], rel_tol=1e-6)
        assert math.isclose(q["DROPOUT"], p["DROPOUT"], abs_tol=1e-9)


def test_grid_enumerates_discrete():
    space = [SweepVar("BLOCKS", "int_uniform", (1, 2)),
             SweepVar("INIT_FILTERS", "set", (16, 32))]
    c = GridController(space, seed=0)
    assert len(c) == 4
    seen = {tuple(c.suggest().values()) for _ in range(4)}
    assert len(seen) == 4


@pytest.mark.slow
def test_bayes_improves_on_quadratic():
    """GP-EI should find a better optimum than pure random on a smooth
    objective with the same budget."""
    space = [SweepVar("x", "float_uniform", (0.0, 1.0)),
             SweepVar("y", "float_uniform", (0.0, 1.0))]

    def objective(p):  # max at (0.3, 0.7)
        return -((p["x"] - 0.3) ** 2 + (p["y"] - 0.7) ** 2)

    def run(ctrl):
        for _ in range(25):
            p = ctrl.suggest()
            ctrl.observe(p, objective(p))
        return ctrl.best[1]

    bayes_scores = [run(BayesController(space, seed=s)) for s in range(3)]
    rand_scores = [run(RandomController(space, seed=s)) for s in range(3)]
    assert np.mean(bayes_scores) >= np.mean(rand_scores) - 1e-3
    assert max(bayes_scores) > -0.01  # close to the optimum


def test_partial_dependence_recovers_optimum():
    """The GP's 1-D partial dependence on a smooth objective should peak
    near the true optimum (the data behind plot_bayesian_hparam_opt)."""
    space = [SweepVar("x", "float_uniform", (0.0, 1.0)),
             SweepVar("LR", "float_log", (1e-5, 1e-1))]
    c = BayesController(space, seed=0)
    rng = np.random.RandomState(0)
    for _ in range(30):
        p = {"x": float(rng.uniform(0, 1)),
             "LR": float(np.exp(rng.uniform(np.log(1e-5), np.log(1e-1))))}
        obj = -((p["x"] - 0.4) ** 2) - (np.log10(p["LR"]) + 3) ** 2 * 0.1
        c.observe(p, obj)
    xs, pd = c.partial_dependence("x")
    assert abs(xs[int(np.argmax(pd))] - 0.4) < 0.15
    lrs, pd_lr = c.partial_dependence("LR")
    assert abs(np.log10(lrs[int(np.argmax(pd_lr))]) + 3) < 1.0


def test_partial_dependence_set_variable():
    space = [SweepVar("INIT_FILTERS", "set", (16, 32))]
    c = BayesController(space, seed=0)
    for v, obj in ((16, 0.1), (32, 0.9), (16, 0.2), (32, 0.8)):
        c.observe({"INIT_FILTERS": v}, obj)
    values, pd = c.partial_dependence("INIT_FILTERS")
    assert list(values) == [16, 32]
    assert pd[1] > pd[0]


def test_best_tracking():
    c = RandomController(SPACE, seed=0)
    c.observe({"LR": 1e-3, "DROPOUT": 0.1, "BLOCKS": 1, "INIT_FILTERS": 16},
              0.5)
    c.observe({"LR": 1e-4, "DROPOUT": 0.2, "BLOCKS": 2, "INIT_FILTERS": 32},
              0.9)
    best_params, best_obj = c.best
    assert best_obj == 0.9
    assert best_params["BLOCKS"] == 2


def test_make_controller_dispatch():
    assert isinstance(make_controller("bayes", SPACE), BayesController)
    assert isinstance(make_controller("grid", SPACE), GridController)
    assert isinstance(make_controller("random", SPACE), RandomController)
    with pytest.raises(ValueError):
        make_controller("annealing", SPACE)


def test_grid_exhaustion_raises():
    """W&B grid agents stop at exhaustion; suggest() past the grid raises
    instead of silently re-running duplicates (reference train.py:364-368)."""
    from ab_line_classifier_tpu.train.sweep import SweepExhausted

    space = [SweepVar("INIT_FILTERS", "set", (16, 32))]
    c = GridController(space, seed=0)
    assert len(c) == 2
    c.suggest()
    c.suggest()
    with pytest.raises(SweepExhausted):
        c.suggest()


def test_grid_resume_skips_completed():
    """Replaying completed trials through observe() (sweep resume) advances
    the grid cursor past them."""
    space = [SweepVar("BLOCKS", "int_uniform", (1, 3))]
    c = GridController(space, seed=0)
    c.observe({"BLOCKS": 1}, 0.1)
    c.observe({"BLOCKS": 2}, 0.2)
    assert c.suggest() == {"BLOCKS": 3}


def test_sweep_objective_fallback_ignores_minimize_sign():
    """When METRIC_NAME is absent from the run's results the objective
    falls back to val AUC — a maximize quantity; a configured 'minimize'
    goal must NOT flip its sign (that would make the sweep select the
    worst trial)."""
    from ab_line_classifier_tpu.train.experiment import (RunResult,
                                                         _sweep_objective)

    r = RunResult(test_metrics={}, history=[], model_dir=None,
                  best_val={"val_auc": 0.9, "val_loss": 0.3})
    # Present metric: minimize flips the sign (controller maximizes).
    assert _sweep_objective(r, "epoch/val_loss", "minimize") == -0.3
    # Absent metric: the AUC fallback keeps maximize semantics either way.
    assert _sweep_objective(r, "test/loss", "minimize") == 0.9
    assert _sweep_objective(r, "test/loss", "maximize") == 0.9


def test_sweep_objective_substitution_is_loud(capsys):
    """The val_auc substitution must announce itself (matching the
    trial-parallel twin's notice, experiment.py lr_search_parallel): a
    typo'd METRIC_NAME otherwise silently optimizes a different objective
    for the whole serial sweep."""
    from ab_line_classifier_tpu.train.experiment import (RunResult,
                                                         _sweep_objective)

    r = RunResult(test_metrics={"auc": 0.8}, history=[], model_dir=None,
                  best_val={"val_auc": 0.9, "val_loss": 0.3})
    _sweep_objective(r, "epoch/val_acu", "maximize")  # typo'd metric
    out = capsys.readouterr().out
    assert "'epoch/val_acu'" in out and "val_auc" in out
    assert "maximize" in out

    # a present metric stays silent
    _sweep_objective(r, "epoch/val_loss", "minimize")
    assert capsys.readouterr().out == ""


def test_read_trial_records_tolerates_torn_tail(tmp_path, capsys):
    """A hard kill can tear the FINAL appended record mid-write; resume
    must drop it (rerunning that trial) rather than crash. Corruption
    anywhere earlier means the skip-list is untrustworthy and still
    raises."""
    import json

    from ab_line_classifier_tpu.train.experiment import _read_trial_records

    assert _read_trial_records(str(tmp_path / "absent.jsonl"), False) == []

    good = [{"trial": 0, "objective": 0.7}, {"trial": 1, "objective": 0.8}]
    clean = "".join(json.dumps(r) + "\n" for r in good)
    torn = tmp_path / "torn.jsonl"
    torn.write_text(clean + '{"trial": 2, "obj')
    assert _read_trial_records(str(torn), True) == good
    assert "torn trailing record" in capsys.readouterr().out
    # ...and the torn fragment is truncated off, so the rerun trial's
    # append lands on a clean line boundary (not glued onto the fragment).
    assert torn.read_text() == clean

    # Tear that dropped only the final newline: record kept, boundary
    # restored so the next append cannot glue onto it.
    noeol = tmp_path / "noeol.jsonl"
    noeol.write_text(clean.rstrip("\n"))
    assert _read_trial_records(str(noeol), False) == good
    assert noeol.read_text() == clean

    corrupt = tmp_path / "corrupt.jsonl"
    corrupt.write_text('{"trial": 0, "obj\n'
                       + json.dumps(good[1]) + "\n")
    with pytest.raises(json.JSONDecodeError):
        _read_trial_records(str(corrupt), False)


def test_replay_trials_continues_the_original_trajectory():
    """A resumed sweep must propose what the uninterrupted run would have
    proposed next — NOT re-propose the original run's first params (the
    failure mode of observing records without replaying the suggests)."""
    from ab_line_classifier_tpu.train.sweep import replay_trials

    space = SPACE[:2]  # LR (float_log), DROPOUT (float_uniform)
    full = RandomController(space, seed=7)
    full_params = [full.suggest() for _ in range(5)]

    # Interrupted after 2 trials; records as hparam_search persists them.
    records = [dict(p, trial=i, objective=0.5 + 0.1 * i)
               for i, p in enumerate(full_params[:2])]
    resumed = RandomController(space, seed=7)
    replay_trials(resumed, records)
    continuation = [resumed.suggest() for _ in range(3)]
    assert continuation == full_params[2:]

    # Bayes in its random-initial phase has the same failure mode.
    full_b = BayesController(space, seed=7)
    first = full_b.suggest()
    full_b.observe(first, 0.9)
    second_full = full_b.suggest()
    resumed_b = BayesController(space, seed=7)
    replay_trials(resumed_b, [dict(first, trial=0, objective=0.9)])
    assert resumed_b.suggest() == second_full

    # Grid resume still works through its cursor + the replayed suggests.
    full_g = GridController(space, seed=0, grid_points=3)
    g_params = [full_g.suggest() for _ in range(4)]
    resumed_g = GridController(space, seed=0, grid_points=3)
    replay_trials(resumed_g, [dict(p, trial=i, objective=0.0)
                              for i, p in enumerate(g_params[:2])])
    assert [resumed_g.suggest() for _ in range(2)] == g_params[2:]
