"""Config/CLI tests: flag parity with the reference CLI."""

import pytest

from mamba_clip_tpu.config import Args, arg_parser, parse_args

# Reference flags (reference: src/mamba_clip/cli/main.py) that must parse.
REFERENCE_FLAGS = [
    "--accum-freq", "--add-remaining-samples", "--balanced-mixup",
    "--batch-size", "--beta1", "--beta2", "--class-weighted-loss",
    "--data-path", "--debug", "--delete-previous-checkpoint", "--device",
    "--dist-backend", "--dist-url", "--distributed", "--epochs",
    "--epochs-cooldown", "--eps", "--eval-loss", "--gather-with-grad",
    "--grad-checkpointing", "--grad-clip-norm", "--hyperparameter-strategy",
    "--hyperparameter-tuning", "--is-test", "--local-loss", "--lock-image",
    "--lock-image-unlocked-groups", "--lock-text", "--lock-text-unlocked-layers",
    "--log-every-n-steps", "--log-local", "--logs", "--lr", "--lr-cooldown-end",
    "--lr-cooldown-power", "--lr-restart-interval", "--lr-scheduler", "--model",
    "--model-stage-1", "--model-stage-2", "--name", "--num-classes",
    "--optuna-storage", "--optuna-study-name", "--precision", "--remote-sync",
    "--remote-sync-frequency", "--remote-sync-protocol", "--report-to",
    "--resume", "--sampling", "--save-frequency", "--save-most-recent",
    "--seed", "--siglip", "--skip-scheduler", "--small-test", "--stage",
    "--study-name", "--tokenizer", "--torchcompile", "--torchscript", "--trace",
    "--train-num-samples", "--training-iterations", "--undersample",
    "--undersample-by", "--undersample-sort-by", "--use-bn-sync",
    "--use-inner-prod", "--use-original-model", "--use-text-only",
    "--use-visual-only", "--val-data-path", "--val-frequency",
    "--val-num-samples", "--wandb-notes", "--wandb-project-name", "--warmup",
    "--wd", "--workers", "--zero-shot",
]


def test_all_reference_flags_exist():
    parser = arg_parser()
    known = set()
    for action in parser._actions:
        known.update(action.option_strings)
    missing = [f for f in REFERENCE_FLAGS if f not in known]
    assert not missing, f"missing reference flags: {missing}"


def test_defaults_match_reference_argparse():
    """The argparse defaults win (SURVEY §5): seed 0, wd 0.05, warmup 1,
    epochs 1."""
    a = parse_args([])
    assert a.seed == 0
    assert a.wd == 0.05
    assert a.warmup == 1
    assert a.epochs == 1
    assert a.batch_size == 64
    assert a.lr == 1e-4
    assert a.precision == "amp"


def test_parse_types():
    a = parse_args([
        "--data-path", "/x", "--batch-size", "32", "--lr", "3e-4",
        "--balanced-mixup", "0.2", "--lock-image", "--image-mean",
        "0.5", "0.5", "0.5",
    ])
    assert a.data_path == "/x"
    assert a.batch_size == 32
    assert a.lr == pytest.approx(3e-4)
    assert a.balanced_mixup == pytest.approx(0.2)
    assert a.lock_image is True
    assert a.image_mean == [0.5, 0.5, 0.5]


def test_reference_readme_commands_parse_verbatim():
    """The reference README's published invocations (reference:
    README.md:32 quick-start, README.md:63 flagship recipe) must parse
    unchanged — a user switching frameworks reuses their command line."""
    a = parse_args([
        "--data-path", "<path_to_data>", "--logs", "./logs/",
        "--batch-size", "64", "--epochs", "10",
    ])
    assert a.data_path == "<path_to_data>"
    assert (a.logs, a.batch_size, a.epochs) == ("./logs/", 64, 10)

    a = parse_args([
        "--data-path", "./data/isic-2024-challenge/", "--logs", "./logs/",
        "--batch-size", "64", "--epochs", "10", "--lr", "1e-4",
        "--precision", "amp",
        "--model-stage-1",
        "microsoft/BiomedCLIP-PubMedBERT_256-vit_base_patch16_224",
        "--model-stage-2", "ClipClassifier",
        "--tokenizer",
        "hf-hub:microsoft/BiomedCLIP-PubMedBERT_256-vit_base_patch16_224",
    ])
    assert a.data_path == "./data/isic-2024-challenge/"
    assert a.lr == pytest.approx(1e-4)
    assert a.precision == "amp"
    assert a.model_stage_1 == (
        "microsoft/BiomedCLIP-PubMedBERT_256-vit_base_patch16_224")
    assert a.model_stage_2 == "ClipClassifier"
    assert a.tokenizer == (
        "hf-hub:microsoft/BiomedCLIP-PubMedBERT_256-vit_base_patch16_224")


def test_dump_and_replace(tmp_path):
    a = Args(seed=3)
    b = a.replace(seed=5)
    assert a.seed == 3 and b.seed == 5
    p = tmp_path / "params.txt"
    a.dump(str(p))
    assert "seed: 3" in p.read_text()


class TestIgnoredFlags:
    def test_ignored_names_are_real_flags(self):
        from mamba_clip_tpu.config import IGNORED_FLAGS

        import dataclasses
        names = {f.name for f in dataclasses.fields(Args)}
        assert set(IGNORED_FLAGS) <= names

    def test_warn_ignored_flags(self):
        import logging

        from mamba_clip_tpu.config import warn_ignored_flags

        logger = logging.getLogger("test-ignored")
        with_flag = Args(horovod=True, torchcompile=True)
        hit = warn_ignored_flags(with_flag, logger)
        assert set(hit) == {"horovod", "torchcompile"}
        assert warn_ignored_flags(Args(), logger) == []


def test_transform_config_interpolation_wiring():
    from mamba_clip_tpu.data.preprocess_cfg import get_transform_config

    t = get_transform_config(None, 224, interpolation="bicubic")
    assert t.interpolation == "bicubic"
    # aug_cfg entry wins over the flag (timm precedence)
    t = get_transform_config({"interpolation": "nearest"}, 224,
                             interpolation="bicubic")
    assert t.interpolation == "nearest"
    assert get_transform_config(None, 224).interpolation == "bilinear"
