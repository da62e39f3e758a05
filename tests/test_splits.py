import numpy as np
import pandas as pd
import pytest

from ab_line_classifier_tpu.data import splits as S


def _frames_df(n_patients=20, frames_per_patient=6, seed=0):
    rng = np.random.RandomState(seed)
    rows = []
    for p in range(n_patients):
        label = int(rng.rand() < 0.4)
        for f in range(frames_per_patient):
            rows.append({"Frame Path": f"clip{p:03d}_{f}.jpg",
                         "patient_id": f"pat{p:03d}", "Class": label,
                         "id": p})
    return pd.DataFrame(rows)


def test_group_split_no_patient_leakage():
    df = _frames_df()
    train, test = S.group_train_test_split(df, 0.2, random_seed=42)
    assert S.leakage_check(train, test)
    assert len(train) + len(test) == len(df)


def test_split_deterministic_given_seed():
    df = _frames_df()
    a1, b1 = S.group_train_test_split(df, 0.2, random_seed=7)
    a2, b2 = S.group_train_test_split(df, 0.2, random_seed=7)
    pd.testing.assert_frame_equal(a1, a2)
    a3, _ = S.group_train_test_split(df, 0.2, random_seed=8)
    assert not a1.equals(a3)


def test_train_val_test_split_topology():
    df = _frames_df(n_patients=30)
    train, val, test = S.train_val_test_split(df, 0.1, 0.1, random_seed=42)
    assert S.leakage_check(train, val, test)
    assert len(train) + len(val) + len(test) == len(df)
    assert len(train) > len(val) and len(train) > len(test)


def test_k_fold_partition():
    df = _frames_df(n_patients=25)
    folds = S.k_fold_splits(df, 5, random_seed=42)
    assert len(folds) == 5
    assert sum(len(f) for f in folds) == len(df)
    assert S.leakage_check(*folds)


def test_fold_train_val_test():
    df = _frames_df(n_patients=25)
    folds = S.k_fold_splits(df, 5, random_seed=42)
    train, val, test = S.fold_train_val_test(folds, 2, 0.1, random_seed=42)
    pd.testing.assert_frame_equal(test, folds[2])
    assert S.leakage_check(train, val, test)


def test_clips_table_subset():
    frames = _frames_df(n_patients=6)
    clips = pd.DataFrame({"id": range(10), "filename": [f"c{i}" for i in range(10)]})
    sub = S.generate_clips_table_subset(clips, frames[frames["id"] < 3])
    assert set(sub["id"]) == {0, 1, 2}


def test_partition_dataset_legacy(tmp_path):
    """Legacy per-patient random partitioner (reference
    train_legacy.py:209-236): grouped by patient, relative val arithmetic,
    train/val/test_set.csv contract under PARTITIONS."""
    import os

    df = _frames_df()
    tr, va, te = S.partition_dataset(df, val_split=0.2, test_split=0.2,
                                     partitions_dir=str(tmp_path),
                                     random_seed=7)
    assert len(tr) + len(va) + len(te) == len(df)
    assert S.leakage_check(tr, va, te)
    for name in ("train_set", "val_set", "test_set"):
        assert os.path.isfile(tmp_path / f"{name}.csv")
    # ~20% of 20 patients in test, ~20% in val (patient-count split)
    assert te["patient_id"].nunique() == 4
    assert va["patient_id"].nunique() == 4
    # deterministic given seed
    tr2, va2, te2 = S.partition_dataset(df, 0.2, 0.2, save_dfs=False,
                                        random_seed=7)
    assert list(te2["Frame Path"]) == list(te["Frame Path"])
    with pytest.raises(ValueError, match="partitions_dir"):
        S.partition_dataset(df, 0.2, 0.2, save_dfs=True)


def test_fold_train_val_test_preserves_positions():
    """Index labels survive the fold assembly: for folds built from a
    RangeIndex frames_df, train/val/test .index are valid row positions in
    frames_df — the contract cross_validation_parallel gathers with. The
    old ignore_index=True concat renumbered train/val against the 'rest'
    frame, making every parallel fold train on the wrong rows (incl. its
    own test fold: patient leakage)."""
    df = _frames_df(n_patients=25)
    folds = S.k_fold_splits(df, 5, random_seed=42)
    for fold_id in range(5):
        tr, va, te = S.fold_train_val_test(folds, fold_id, 0.1,
                                           random_seed=42)
        for part in (tr, va, te):
            pd.testing.assert_frame_equal(df.iloc[part.index.to_numpy()],
                                          part)
        # Leakage check by POSITION (what the parallel trainer gathers).
        pts = lambda p: set(df.iloc[p.index.to_numpy()][S.PATIENT_ID])
        assert not (pts(tr) & pts(te))
        assert not (pts(va) & pts(te))
        assert not (pts(tr) & pts(va))
