"""pAUC tests (ISIC-2024 competition metric, reference: eval.py:21-44)."""

import numpy as np
import pytest

from mamba_clip_tpu.eval import partial_auc


def test_perfect_classifier():
    y = np.array([0, 0, 0, 0, 1, 1, 1, 1])
    p = np.array([0.1, 0.2, 0.3, 0.4, 0.6, 0.7, 0.8, 0.9])
    # perfect ranking: pAUC over the top 20% FPR band is the full band area
    assert np.isclose(partial_auc(y, p, min_tpr=0.8), 0.2, atol=1e-6)


def test_random_classifier_half_band():
    rng = np.random.default_rng(0)
    y = rng.integers(0, 2, 20000)
    p = rng.random(20000)
    # random scores: ROC is the diagonal; area under it in the band
    # [tpr>=0.8] is 0.2*0.2/2 + 0.8*0.2 ≈ wait  — with the complement flip
    # the metric integrates fpr in [0, 0.2]: area ≈ 0.02
    assert abs(partial_auc(y, p, min_tpr=0.8) - 0.02) < 0.01


def test_invalid_min_tpr():
    y = np.array([0, 1]); p = np.array([0.2, 0.8])
    with pytest.raises(ValueError):
        partial_auc(y, p, min_tpr=-1.0)


def test_monotone_in_quality():
    rng = np.random.default_rng(1)
    n = 2000
    y = rng.integers(0, 2, n)
    noise = rng.normal(0, 1, n)
    good = y + 0.5 * noise
    bad = y + 3.0 * noise
    assert partial_auc(y, good) > partial_auc(y, bad)
