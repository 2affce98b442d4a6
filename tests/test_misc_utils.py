"""Small utility coverage: aug-cfg parsing, wandb no-op gating,
experiment-name scheme + latest lookup, precision policy mapping."""

import os
import time

import jax.numpy as jnp
import pytest

from mamba_clip_tpu.config import Args
from mamba_clip_tpu.pipeline import parse_aug_cfg
from mamba_clip_tpu.utils.logging import create_log_path
from mamba_clip_tpu.utils.precision import get_input_dtype, get_policy


def test_parse_aug_cfg():
    out = parse_aug_cfg(["scale=0.4,1.0", "hflip=0.3", "re_prob=0.25",
                         "interpolation=bicubic"])
    assert out["scale"] == (0.4, 1.0)
    assert out["hflip"] == 0.3
    assert out["re_prob"] == 0.25
    assert out["interpolation"] == "bicubic"
    assert parse_aug_cfg(None) == {}
    assert parse_aug_cfg(["junk"]) == {}


def test_wandb_noop_when_missing():
    from mamba_clip_tpu.utils import wandb_utils

    if wandb_utils.available():
        pytest.skip("wandb installed in this env")
    # all calls are safe no-ops
    assert wandb_utils.init_wandb(Args(), object()) is None
    wandb_utils.log({"x": 1})
    wandb_utils.finish()


def test_create_log_path_scheme_and_latest(tmp_path):
    args = Args(model="biomedclip", lr=1e-4, batch_size=64, workers=4,
                precision="amp", logs=str(tmp_path))
    name = create_log_path(args)
    assert "model_biomedclip" in name and "lr_0.0001" in name
    assert "b_64" in name and "p_amp" in name

    os.makedirs(tmp_path / name)
    time.sleep(0.01)
    name2 = create_log_path(args)
    if name2 != name:
        os.makedirs(tmp_path / name2)
    latest = create_log_path(args, latest=True)
    assert latest in (name, name2)
    with pytest.raises(FileNotFoundError):
        create_log_path(args.replace(model="other"), latest=True)


def test_precision_mapping():
    assert get_policy("amp").compute_dtype == jnp.bfloat16
    assert get_policy("amp").param_dtype == jnp.float32
    assert get_policy("pure_bf16").param_dtype == jnp.bfloat16
    assert get_policy("fp16").loss_scale > 1.0
    assert get_input_dtype("fp32") == jnp.float32
    with pytest.raises(ValueError):
        get_policy("nope")


def test_bench_choose_secondary():
    """bench.py's one JSON line always carries both the quantized recipe
    and reference-numerics bf16 (round-4 flagship contract): a quantized
    primary gets a bf16 secondary, an unquantized primary gets the
    int8_delayed flagship. An explicit BENCH_SECONDARY (incl. "") wins."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    assert bench.choose_secondary(None, None) == "int8_delayed"
    assert bench.choose_secondary(None, "int8_fast") == "bf16"
    assert bench.choose_secondary(None, "int8_delayed") == "bf16"
    assert bench.choose_secondary("", None) == ""  # explicit disable
    assert bench.choose_secondary("int8", None) == "int8"
