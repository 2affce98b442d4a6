"""The parity harness itself is part of the deliverable (BASELINE.md §4):
pin that both of its modes keep passing."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import parity_harness


def test_optimizer_math_parity():
    r = parity_harness.run(steps=10)
    assert r["max_loss_dev"] < 1e-4
    assert r["final_w1_dev"] < 1e-3


def test_stage2_end_to_end_parity():
    r = parity_harness.run_stage2(epochs=1)
    assert r["max_loss_dev"] < 1e-3
    # identical math on identical data must give the identical metric
    assert r["pauc_dev"] < 1e-4
    assert 0.0 <= r["pauc_ours"] <= 0.2  # raw pAUC above 80% TPR
