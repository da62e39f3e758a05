"""Patient-grouped stratified dataset splitting.

Patient-level leakage prevention is a hard behavioral requirement of the
reference (reference ``src/data/artifact_logging.py:151-183``): frames of one
patient must never straddle a split boundary. The split primitive is
``StratifiedGroupKFold`` keyed on ``patient_id`` — the same sklearn
implementation the reference uses, so **identical seeds produce identical
fold assignments** (split parity by construction).

Split topology (reference artifact_logging.py:87-148, 186-263, 266-332):

* ModelDev / Holdout: grouped (1 - HOLDOUT_SPLIT)/HOLDOUT_SPLIT split.
* TrainValTest: test split first, then a *relative* val split of the rest
  (``val_split / (1 - test_split)``).
* KFoldCrossValidation: k grouped stratified folds; fold i's frames are the
  i-th fold's test indices; at training time fold i is the test set and the
  val set is a grouped split of the remaining folds.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import numpy as np
import pandas as pd
from sklearn.model_selection import StratifiedGroupKFold

FRAME_PATH = "Frame Path"
CLASS = "Class"
PATIENT_ID = "patient_id"


def group_train_test_split(data_df: pd.DataFrame, test_size: float,
                           group_key: str = PATIENT_ID,
                           target_key: str = CLASS,
                           random_seed: int = 42
                           ) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """Grouped stratified two-way split — same algorithm as the reference
    (``artifact_logging.py:151-183``): k = floor(1/test_size) folds, take the
    first fold as the test set. The realized test fraction therefore depends
    on group sizes, exactly as in the reference."""
    n_splits = math.floor(1.0 / test_size)
    groups = np.asarray(data_df[group_key].values)
    y = data_df[target_key].values
    sgkf = StratifiedGroupKFold(n_splits=n_splits, shuffle=True,
                                random_state=random_seed)
    train_index, test_index = next(sgkf.split(data_df, y, groups=groups))
    return data_df.iloc[train_index], data_df.iloc[test_index]


def train_val_test_split(frames_df: pd.DataFrame, val_split: float,
                         test_split: float, random_seed: int = 42
                         ) -> Tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """TrainValTest topology (reference artifact_logging.py:210-224):
    test first, then relative val split of the remainder."""
    relative_val_split = val_split / (1.0 - test_split)
    train_val_df, test_df = group_train_test_split(
        frames_df, test_split, random_seed=random_seed)
    train_df, val_df = group_train_test_split(
        train_val_df, relative_val_split, random_seed=random_seed)
    return train_df, val_df, test_df


def k_fold_splits(frames_df: pd.DataFrame, n_folds: int,
                  random_seed: int = 42) -> List[pd.DataFrame]:
    """The k fold frame tables (reference artifact_logging.py:305-325): fold i
    is the i-th StratifiedGroupKFold test subset."""
    groups = np.asarray(frames_df[PATIENT_ID].values)
    y = frames_df[CLASS].values
    sgkf = StratifiedGroupKFold(n_splits=n_folds, shuffle=True,
                                random_state=random_seed)
    return [frames_df.iloc[test_index]
            for _, test_index in sgkf.split(frames_df, y, groups=groups)]


def fold_train_val_test(folds: List[pd.DataFrame], fold_id: int,
                        val_split: float, random_seed: int = 42
                        ) -> Tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """Assemble fold ``fold_id``'s train/val/test tables (reference
    ``src/train_utils.py:192-235``): test = fold i; train/val = grouped split
    of the concatenated remaining folds.

    Row INDEX LABELS are preserved end-to-end (``group_train_test_split``
    slices positionally with ``iloc``, so labels pass through): when
    ``folds`` came from :func:`k_fold_splits` of a RangeIndex ``frames_df``,
    ``train_df.index`` etc. are valid row positions into that ``frames_df``
    — the contract ``cross_validation_parallel`` relies on to gather each
    fold's frames from the full device-resident array. Concatenating with
    ``ignore_index=True`` here would silently renumber train/val rows
    against the *rest* frame (a patient-leakage bug, caught by
    ``tests/test_splits.py::test_fold_train_val_test_preserves_positions``).
    """
    test_df = folds[fold_id]
    rest = pd.concat([f for i, f in enumerate(folds) if i != fold_id])
    train_df, val_df = group_train_test_split(rest, val_split,
                                              random_seed=random_seed)
    return train_df, val_df, test_df


def partition_dataset(frames_df: pd.DataFrame, val_split: float,
                      test_split: float, partitions_dir: str = None,
                      save_dfs: bool = True, random_seed: int = None
                      ) -> Tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """Legacy local partitioner (reference ``train_legacy.py:209-236``):
    plain random split of the unique patient_id list — grouped but NOT
    stratified, unlike :func:`train_val_test_split` — with the same
    relative-val arithmetic and the ``train_set.csv`` / ``val_set.csv`` /
    ``test_set.csv`` file contract under PATHS.PARTITIONS."""
    from sklearn.model_selection import train_test_split

    all_pts = np.asarray(frames_df[PATIENT_ID].unique())
    relative_val_split = val_split / (1.0 - test_split)
    trainval_pts, test_pts = train_test_split(
        all_pts, test_size=test_split, random_state=random_seed)
    train_pts, val_pts = train_test_split(
        trainval_pts, test_size=relative_val_split, random_state=random_seed)

    train_df = frames_df[frames_df[PATIENT_ID].isin(train_pts)]
    val_df = frames_df[frames_df[PATIENT_ID].isin(val_pts)]
    test_df = frames_df[frames_df[PATIENT_ID].isin(test_pts)]

    if save_dfs:
        if not partitions_dir:
            raise ValueError("save_dfs=True needs partitions_dir "
                             "(PATHS.PARTITIONS)")
        import os
        os.makedirs(partitions_dir, exist_ok=True)
        for name, df in (("train_set", train_df), ("val_set", val_df),
                         ("test_set", test_df)):
            df.to_csv(os.path.join(partitions_dir, f"{name}.csv"))
    return train_df, val_df, test_df


def generate_clips_table_subset(clips_df: pd.DataFrame,
                                frames_df: pd.DataFrame) -> pd.DataFrame:
    """Subset the clips table to clips whose id appears in a frames subset
    (reference artifact_logging.py:373-391)."""
    ids = frames_df["id"].unique() if "id" in frames_df.columns else []
    return clips_df[clips_df["id"].isin(ids)]


def leakage_check(*dfs: pd.DataFrame, group_key: str = PATIENT_ID) -> bool:
    """True iff no group appears in more than one of the given tables."""
    seen: set = set()
    for df in dfs:
        groups = set(df[group_key].unique())
        if groups & seen:
            return False
        seen |= groups
    return True
