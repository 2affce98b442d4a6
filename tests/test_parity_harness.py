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


def test_quant_stage1_two_stage_experiment():
    """--quant-stage1 (PARITY.md round 5): the two-stage experiment runs
    end to end at mini scale — three stage-1 numerics modes train from
    identical init, graft into the identical stage-2 head training, and
    produce comparable held-out pAUCs. (The committed full-scale result
    lives in perf/quant_stage1_r5.json; this pins the machinery.)"""
    r = parity_harness.run_quant_stage1(
        steps=12, n_train=256, n_s2=384, head_epochs=1, seed_jitter=False)
    assert set(r["modes"]) == {"fp32", "amp", "int8_delayed"}
    for mode, rec in r["modes"].items():
        assert rec["stage1_final_loss"] < rec["stage1_first_loss"], mode
        assert 0.0 <= rec["pauc"] <= 0.2, mode
    # deviations are defined relative to the fp32 anchor
    assert r["dev_amp"] >= 0.0 and r["dev_int8_delayed"] >= 0.0
