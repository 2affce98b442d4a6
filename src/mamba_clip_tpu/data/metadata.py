"""Metadata loading, stratified splitting, undersampling.

Host-side tabular layer mirroring the reference
(reference: src/mamba_clip/data.py — ``train_test_split`` :389-442,
``get_metadata`` :445-465, ``undersample_data`` :468-515). Pandas in,
pandas out; all downstream consumers work on positional indices into these
frames so device-side shapes stay static.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np
import pandas as pd

from ..utils.logging import get_logger

logger = get_logger(__name__)


def train_test_split(
    data: pd.DataFrame,
    test_size=0.2,
    random_state: Optional[int] = None,
    stratify=None,
) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """Per-class shuffled split (reference: data.py:389-442)."""
    rng = np.random.default_rng(random_state)
    if stratify is not None:
        y = np.asarray(stratify)
        train_idx, test_idx = [], []
        for cls in np.unique(y):
            cls_pos = np.where(y == cls)[0]
            rng.shuffle(cls_pos)
            n_test = (
                int(len(cls_pos) * test_size)
                if isinstance(test_size, float)
                else int(test_size)
            )
            test_idx.extend(cls_pos[:n_test])
            train_idx.extend(cls_pos[n_test:])
    else:
        idx = rng.permutation(len(data))
        n_test = (
            int(len(data) * test_size)
            if isinstance(test_size, float)
            else int(test_size)
        )
        test_idx, train_idx = idx[:n_test], idx[n_test:]
    return data.iloc[np.asarray(train_idx)], data.iloc[np.asarray(test_idx)]


def get_metadata(args):
    """(train, val, test) metadata frames (reference: data.py:445-465).

    Train CSV is split 80/20 stratified by ``target`` with the run seed.
    """
    train_metadata = val_metadata = test_metadata = None
    if args.is_test:
        test_metadata = pd.read_csv(os.path.join(args.data_path, "test-metadata.csv"))
    else:
        train_metadata = pd.read_csv(
            os.path.join(args.data_path, "train-metadata.csv")
        )
        targets = train_metadata["target"]
        logger.info(f"Stratifying by target: {dict(targets.value_counts())}")
        train_metadata, val_metadata = train_test_split(
            train_metadata, test_size=0.2, stratify=targets, random_state=args.seed
        )
    return train_metadata, val_metadata, test_metadata


def undersample_data(args, train_metadata, val_metadata):
    """Per-class cap at --undersample samples, with ordering strategies
    (reference: data.py:468-515): random (default), asc/desc by a column,
    head/tail "n/m" split, or uniform striding; --add-remaining-samples
    moves the dropped rows into validation."""
    n_cap = args.undersample
    col = args.undersample_by
    sort_by = args.undersample_sort_by
    rng = np.random.default_rng(args.seed)

    def select(tbl: pd.DataFrame) -> pd.DataFrame:
        if n_cap is None or n_cap >= len(tbl):
            return tbl
        if sort_by is not None and col is not None:
            if sort_by == "asc":
                return tbl.sort_values(col).head(n_cap)
            if sort_by == "desc":
                return tbl.sort_values(col, ascending=False).head(n_cap)
            if "/" in str(sort_by):
                lo_p, hi_p = map(int, str(sort_by).split("/"))
                n_lo = int(n_cap * lo_p / (lo_p + hi_p))
                n_hi = n_cap - n_lo
                s = tbl.sort_values(col)
                return pd.concat([s.head(n_lo), s.tail(n_hi)])
            if sort_by == "uniform":
                s = tbl.sort_values(col)
                step = max(len(s) // n_cap, 1)
                return s.iloc[::step]
            raise ValueError(f"Unknown undersample-sort-by: {sort_by}")
        return tbl.sample(n=n_cap, replace=False, random_state=int(rng.integers(2**31)))

    kept = []
    for cls in train_metadata["target"].unique():
        kept.append(select(train_metadata[train_metadata["target"] == cls]))
    new_train = pd.concat(kept)
    if args.add_remaining_samples and val_metadata is not None:
        dropped = train_metadata.index.difference(new_train.index)
        val_metadata = pd.concat([val_metadata, train_metadata.loc[dropped]])
    return new_train, val_metadata


def class_counts(targets: np.ndarray) -> np.ndarray:
    return np.unique(np.asarray(targets), return_counts=True)[1]


def balanced_class_weights(targets: np.ndarray) -> np.ndarray:
    """sklearn 'balanced' weights for --class-weighted-loss
    (reference: data.py:559-562 via sklearn compute_class_weight)."""
    t = np.asarray(targets)
    counts = class_counts(t)
    return len(t) / (len(counts) * counts.astype(np.float64))
