"""End-to-end smoke: stage-1 contrastive → checkpoint → stage-2 classifier
on synthetic ISIC-shaped data with tiny towers (SURVEY §4: e2e smoke on
synthetic data). Slowest test in the suite — everything compiles on CPU.
"""

import os

import numpy as np
import pytest

from mamba_clip_tpu.config import Args
from mamba_clip_tpu.data.tokenizer import HashTokenizer


@pytest.fixture()
def tiny_build(monkeypatch):
    import mamba_clip_tpu.pipeline as P

    def small(**kw):
        from mamba_clip_tpu.models.clip import ClipModel
        from mamba_clip_tpu.models.text_bert import TextBert
        from mamba_clip_tpu.models.vit import VisionTransformer

        visual = VisionTransformer(
            image_size=32, patch_size=16, width=32, depth=1, num_heads=2,
            embed_dim=16, name="visual",
        )
        text = TextBert(
            vocab_size=512, context_length=32, width=32, depth=1,
            num_heads=2, embed_dim=16, name="text",
        )
        return ClipModel(visual=visual, text=text)

    monkeypatch.setattr(P, "build_clip", small)
    monkeypatch.setattr(
        P, "get_tokenizer",
        lambda name, context_length=32, **kw: HashTokenizer(32, 512),
    )
    return P


def _args(tmp_path, **kw):
    base = dict(
        synthetic_data=True,
        model_stage_1="tiny",
        batch_size=8,
        epochs=1,
        train_num_samples=32,
        val_num_samples=16,
        lr=1e-3,
        warmup=1,
        precision="fp32",
        logs=str(tmp_path),
        workers=1,
        log_every_n_steps=10,
        force_image_size=[32],
        save_most_recent=True,
        num_classes=2,
    )
    base.update(kw)
    return Args(**base)


def test_two_stage_pipeline(tiny_build, tmp_path):
    P = tiny_build
    args1 = _args(tmp_path, name="e2e-s1", stage=1)
    m1 = P.pipeline(args1)
    assert m1 and np.isfinite(m1["val_loss"])
    ckpt = os.path.join(tmp_path, "e2e-s1", "checkpoints", "stage_1_epoch_latest")
    assert os.path.isdir(ckpt)

    # stage 2 consumes stage_1_epoch_latest via the latest-run convention
    args2 = _args(
        tmp_path, name="e2e-s2", stage=2, model=args1.model_stage_1,
        model_stage_1=args1.model_stage_1,
    )
    # point the latest-run lookup at stage-1's run dir
    import mamba_clip_tpu.pipeline as PP

    orig_clp = PP.create_log_path
    PP.create_log_path = (
        lambda a, latest=False, **kw: "e2e-s1" if latest else orig_clp(a)
    )
    try:
        m2 = P.pipeline(args2)
    finally:
        PP.create_log_path = orig_clp
    assert m2 and np.isfinite(m2["val_loss"])
    assert "partial_auc" in m2
    assert 0.0 <= m2["partial_auc"] <= 0.2


def test_accum_schedule_horizon(tiny_build, tmp_path, monkeypatch):
    """With --accum-freq N the schedule horizon must equal actual optimizer
    steps (one per loader batch; accumulation splits micro-batches inside
    the step), NOT num_batches // N — otherwise the cosine decays N× too
    early and rises again (round-1 VERDICT weak #1 / ADVICE medium)."""
    import mamba_clip_tpu.pipeline as PP

    P = tiny_build
    seen = {}
    orig = PP.create_schedule

    def spy(args, total_steps):
        seen["total"] = total_steps
        return orig(args, total_steps)

    monkeypatch.setattr(PP, "create_schedule", spy)
    args = _args(tmp_path, name="e2e-accum", stage=1, accum_freq=2,
                 lr_scheduler="cosine")
    m = P.pipeline(args)
    assert np.isfinite(m["val_loss"])
    # 32 samples / bs 8 = 4 optimizer steps — not divided by accum_freq
    assert seen["total"] == 4
    # final-step LR sits at the end of the decay, far below the peak
    sch = orig(args, seen["total"])
    assert float(sch(seen["total"] - 1)) < 0.3 * float(sch(1))


def test_real_isic_files_pipeline(tiny_build, tmp_path):
    """Full pipeline over on-disk ISIC-format data: train-metadata.csv +
    train-image.hdf5 of JPEG blobs, with --undersample — the intended
    get_metadata → undersample_data → get_data path (SURVEY §2.12.1)."""
    import io

    import numpy as np
    import pytest as _pytest

    h5py = _pytest.importorskip("h5py")
    from PIL import Image

    from mamba_clip_tpu.data import synthetic_metadata

    P = tiny_build
    data_dir = tmp_path / "isic"
    data_dir.mkdir()
    meta = synthetic_metadata(48, seed=5)
    meta.to_csv(data_dir / "train-metadata.csv", index=False)
    rng = np.random.default_rng(0)
    with h5py.File(data_dir / "train-image.hdf5", "w") as f:
        for isic_id in meta["isic_id"]:
            arr = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, "JPEG")
            f[isic_id] = np.void(buf.getvalue())

    args = _args(
        tmp_path, name="e2e-files", stage=1, synthetic_data=False,
        data_path=str(data_dir) + "/", undersample=30, batch_size=8,
        cache_staging=str(tmp_path / "stage_cache"),
    )
    m = P.pipeline(args)
    assert m and np.isfinite(m["val_loss"])


def test_is_test_eval_only(tiny_build, tmp_path):
    """--is-test: test-metadata.csv only → no training, eval on the test
    split (reference: data.py:449-451, pipeline eval-only branch)."""
    import io

    import numpy as np
    import pytest as _pytest

    h5py = _pytest.importorskip("h5py")
    from PIL import Image

    from mamba_clip_tpu.data import synthetic_metadata

    P = tiny_build
    data_dir = tmp_path / "isic_test"
    data_dir.mkdir()
    meta = synthetic_metadata(16, seed=9)
    meta.to_csv(data_dir / "test-metadata.csv", index=False)
    rng = np.random.default_rng(0)
    with h5py.File(data_dir / "test-image.hdf5", "w") as f:
        for isic_id in meta["isic_id"]:
            arr = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, "JPEG")
            f[isic_id] = np.void(buf.getvalue())

    args = _args(
        tmp_path, name="e2e-istest", stage=1, synthetic_data=False,
        data_path=str(data_dir) + "/", is_test=True, batch_size=8,
    )
    m = P.pipeline(args)
    assert m and np.isfinite(m["val_loss"])
    assert m["num_samples"] == 16  # two full batches of 8

    # stage-2 inference mode: CE metrics + pAUC + submission.csv
    args2 = _args(
        tmp_path, name="e2e-istest-s2", stage=2, synthetic_data=False,
        data_path=str(data_dir) + "/", is_test=True, batch_size=8,
        use_original_model=True, num_classes=2,
    )
    m2 = P.pipeline(args2)
    assert m2 and np.isfinite(m2["val_loss"])
    sub = os.path.join(tmp_path, "e2e-istest-s2", "checkpoints", "submission.csv")
    assert os.path.exists(sub)
    import pandas as pd

    df = pd.read_csv(sub)
    assert len(df) == 16 and set(df.columns) == {"isic_id", "target"}
    assert df["target"].between(0, 1).all()


def test_trained_stage2_submission_flow(tiny_build, tmp_path):
    """The real submission flow: stage-1 → stage-2 (auto-named runs) →
    --is-test --resume latest reusing the stage-2 run name. Regression for
    the latest-run shadowing bug: the newer stage-2 dir matches the same
    name pattern as the stage-1 dir but holds no stage_1 checkpoint; the
    lookup must skip it (create_log_path(containing=...)) instead of
    crashing with FileNotFoundError."""
    import io

    import pandas as pd
    import pytest as _pytest

    h5py = _pytest.importorskip("h5py")
    from PIL import Image

    from mamba_clip_tpu.data import synthetic_metadata

    P = tiny_build
    # ragged test split: 12 % 8 != 0; no target column, like the real
    # challenge test metadata (reference data.py:279-282 → targets=None)
    data_dir = tmp_path / "isic_sub"
    data_dir.mkdir()
    meta = synthetic_metadata(12, seed=3).drop(columns=["target"])
    meta.to_csv(data_dir / "test-metadata.csv", index=False)
    rng = np.random.default_rng(0)
    with h5py.File(data_dir / "test-image.hdf5", "w") as f:
        for isic_id in meta["isic_id"]:
            arr = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, "JPEG")
            f[isic_id] = np.void(buf.getvalue())

    m1 = P.pipeline(_args(tmp_path, name=None, stage=1))
    assert np.isfinite(m1["val_loss"])
    m2 = P.pipeline(_args(
        tmp_path, name=None, stage=2, num_classes=2,
        model="tiny", model_stage_1="tiny",
    ))
    assert np.isfinite(m2["val_loss"])

    runs = sorted(os.listdir(tmp_path), key=lambda d: os.path.getmtime(
        os.path.join(tmp_path, d)))
    s2_run = runs[-1]
    m3 = P.pipeline(_args(
        tmp_path, name=s2_run, stage=2, num_classes=2, is_test=True,
        synthetic_data=False, data_path=str(data_dir) + "/",
        resume="latest", model="tiny", model_stage_1="tiny",
    ))
    # label-free test split: no CE/pAUC, but every sample predicted
    assert "val_loss" not in m3 and "partial_auc" not in m3
    assert m3["num_samples"] == 12
    sub = os.path.join(tmp_path, s2_run, "checkpoints", "submission.csv")
    df = pd.read_csv(sub)
    assert len(df) == 12  # every ragged test row predicted


def test_stage2_with_nothing_to_start_from_raises(tiny_build, tmp_path):
    """--stage 2 --resume latest in an empty logs dir must hard-error, not
    silently train a randomly initialized CLIP (the missing-stage-1
    fallback is only legitimate when the resume actually resolves)."""
    import pytest as _pytest

    P = tiny_build
    args = _args(tmp_path, name="e2e-s2-orphan", stage=2, num_classes=2,
                 resume="latest", model="tiny", model_stage_1="tiny")
    with _pytest.raises(FileNotFoundError, match="nothing to start from"):
        P.pipeline(args)


def test_results_jsonl_written(tiny_build, tmp_path):
    P = tiny_build
    args = _args(tmp_path, name="e2e-jsonl", stage=1)
    P.pipeline(args)
    path = os.path.join(tmp_path, "e2e-jsonl", "checkpoints", "results.jsonl")
    assert os.path.exists(path)
    import json

    rows = [json.loads(l) for l in open(path)]
    assert rows and "val_loss" in rows[0]


def test_stage1_fsdp_mesh_cli(tiny_build, tmp_path):
    """--mesh-fsdp 2 trains end-to-end with params/optimizer sharded over
    the fsdp axis (VERDICT #10: fsdp reachable from the CLI)."""
    from mamba_clip_tpu.config import parse_args

    P = tiny_build
    args = _args(tmp_path, mesh_fsdp=2)
    # the flag must also parse from the CLI surface
    parsed = parse_args(["--mesh-fsdp", "2", "--mesh-model", "1"])
    assert parsed.mesh_fsdp == 2 and parsed.mesh_model == 1
    metrics = P.pipeline(args)
    assert metrics and np.isfinite(metrics["val_loss"])
