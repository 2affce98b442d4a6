"""Full-split evaluation + schedule-horizon regression tests.

Round-1 issues (VERDICT Missing #4, Weak #1):
- eval loaders dropped the tail batch, truncating val metrics and the
  Kaggle submission (reference eval.py:47-178 evaluates every sample);
- with --accum-freq N the cosine horizon was N× too short (optimizer
  steps == loader batches in this design).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from mamba_clip_tpu.config import Args, RunState
from mamba_clip_tpu.data.loader import BatchLoader, DataInfo
from mamba_clip_tpu.data.dataset import SyntheticIsicDataset
from mamba_clip_tpu.data.preprocess_cfg import get_transform_config
from mamba_clip_tpu.eval import evaluate, make_eval_step
from mamba_clip_tpu.models.clip import ClipModel
from mamba_clip_tpu.models.heads import ClipClassifier
from mamba_clip_tpu.models.text_bert import TextBert
from mamba_clip_tpu.models.vit import VisionTransformer
from mamba_clip_tpu.schedules import create_schedule
from mamba_clip_tpu.utils.precision import get_policy


def _loader(n, bs, drop_last):
    ds = SyntheticIsicDataset(n=n, staging_size=32, is_train=False, seed=0)
    return BatchLoader(ds, batch_size=bs, shuffle=False, drop_last=drop_last)


def test_eval_loader_keeps_tail():
    loader = _loader(10, 4, drop_last=False)
    assert loader.num_batches == 3
    assert loader.num_samples == 10
    sizes = [b["image"].shape[0] for b in loader]
    assert sizes == [4, 4, 2]


def test_train_loader_still_drops_tail():
    loader = _loader(10, 4, drop_last=True)
    assert loader.num_batches == 2
    assert loader.num_samples == 8
    sizes = [b["image"].shape[0] for b in loader]
    assert sizes == [4, 4]


def _tiny_classifier(rng):
    visual = VisionTransformer(image_size=32, patch_size=16, width=32,
                               depth=1, num_heads=2, embed_dim=16,
                               name="visual")
    text = TextBert(vocab_size=40000, context_length=16, width=32, depth=1,
                    num_heads=2, embed_dim=16, name="text")
    clip = ClipModel(visual=visual, text=text)
    model = ClipClassifier(clip=clip, num_classes=2)
    variables = model.init({"params": rng}, jnp.zeros((2, 32, 32, 3)),
                           jnp.zeros((2, 16), jnp.int32))
    return model, variables


def test_evaluate_covers_every_sample(tmp_path):
    """n % batch_size != 0 → num_samples == n and submission has n rows."""
    n, bs = 10, 4
    rng = jax.random.PRNGKey(0)
    model, variables = _tiny_classifier(rng)

    from mamba_clip_tpu.data.tokenizer import HashTokenizer

    ds = SyntheticIsicDataset(n=n, staging_size=32, is_train=False, seed=0,
                              tokenizer=HashTokenizer(context_length=16))
    loader = BatchLoader(ds, batch_size=bs, shuffle=False, drop_last=False)
    data = {"test": DataInfo(loader=loader)}

    args = Args(batch_size=bs, epochs=0, val_frequency=0, is_test=True,
                precision="fp32", log_every_n_steps=100)
    policy = get_policy("fp32")
    tcfg = get_transform_config(None, 32, is_train=False)
    run = RunState(rank=0, world_size=1)
    run.checkpoint_path = str(tmp_path)

    metrics = evaluate(model, variables, data, epoch=0, args=args,
                       policy=policy, tcfg=tcfg, run_state=run, stage=2,
                       takes_text=True)
    assert metrics["num_samples"] == n
    sub = os.path.join(str(tmp_path), "submission.csv")
    assert os.path.exists(sub)
    with open(sub) as f:
        rows = f.read().strip().splitlines()
    assert len(rows) == n + 1  # header + one prediction per sample


class _LabelFree:
    """Dataset adapter: same items minus 'target' (the real challenge test
    metadata has no target column — reference data.py:279-282)."""

    def __init__(self, ds):
        self._ds = ds
        self.ids = list(getattr(ds, "ids", ds.meta.index))
        self.targets = None

    def __len__(self):
        return len(self._ds)

    def __getitem__(self, i):
        item = dict(self._ds[i])
        item.pop("target", None)
        return item


def test_evaluate_label_free_multihost_combine(tmp_path):
    """Label-free test split through the world_size>1 combine path
    (process_allgather over one real process): no val_loss/pAUC, full
    submission, padded-allgather branch must not touch absent targets."""
    n, bs = 10, 4
    rng = jax.random.PRNGKey(0)
    model, variables = _tiny_classifier(rng)

    from mamba_clip_tpu.data.tokenizer import HashTokenizer

    ds = _LabelFree(
        SyntheticIsicDataset(n=n, staging_size=32, is_train=False, seed=0,
                             tokenizer=HashTokenizer(context_length=16))
    )
    loader = BatchLoader(ds, batch_size=bs, shuffle=False, drop_last=False)
    data = {"test": DataInfo(loader=loader)}

    args = Args(batch_size=bs, epochs=0, val_frequency=0, is_test=True,
                precision="fp32", log_every_n_steps=100)
    policy = get_policy("fp32")
    tcfg = get_transform_config(None, 32, is_train=False)
    run = RunState(rank=0, world_size=2)  # exercises the combine branch
    run.checkpoint_path = str(tmp_path)

    metrics = evaluate(model, variables, data, epoch=0, args=args,
                       policy=policy, tcfg=tcfg, run_state=run, stage=2,
                       takes_text=True)
    assert "val_loss" not in metrics and "partial_auc" not in metrics
    assert metrics["num_samples"] == n
    sub = os.path.join(str(tmp_path), "submission.csv")
    with open(sub) as f:
        rows = f.read().strip().splitlines()
    assert len(rows) == n + 1


def test_bf16_precision_casts_params():
    """--precision bf16/pure_bf16 must actually cast the param pytree
    (round-1: the flag silently behaved like amp; VERDICT Weak #4)."""
    from mamba_clip_tpu.pipeline import prepare_params
    from mamba_clip_tpu.parallel.mesh import create_mesh

    rng = jax.random.PRNGKey(0)
    visual = VisionTransformer(image_size=32, patch_size=16, width=32,
                               depth=1, num_heads=2, embed_dim=16,
                               name="visual")
    text = TextBert(vocab_size=128, context_length=16, width=32, depth=1,
                    num_heads=2, embed_dim=16, name="text")
    model = ClipModel(visual=visual, text=text)

    class StubLoader:
        num_batches = 4

    data = {"train": StubLoader(),
            "tcfg_train": get_transform_config(None, 32, is_train=True)}
    args = Args(batch_size=4, epochs=1, lr=1e-3, warmup=1, precision="bf16")
    run = RunState(rank=0, world_size=1)
    params = prepare_params(args, model, data, create_mesh(), run, stage=1,
                            rng=rng)
    dtypes = {
        x.dtype for x in jax.tree_util.tree_leaves(params["state"].params)
        if jnp.issubdtype(x.dtype, jnp.floating)
    }
    assert dtypes == {jnp.dtype(jnp.bfloat16)}


def test_accum_schedule_horizon():
    """steps_per_epoch must equal loader batches (one optimizer step per
    batch), NOT batches//accum_freq — otherwise the cosine decays N× early
    and rises again (ADVICE #2)."""
    from mamba_clip_tpu.pipeline import prepare_params
    from mamba_clip_tpu.parallel.mesh import create_mesh

    rng = jax.random.PRNGKey(0)
    visual = VisionTransformer(image_size=32, patch_size=16, width=32,
                               depth=1, num_heads=2, embed_dim=16,
                               name="visual")
    text = TextBert(vocab_size=128, context_length=16, width=32, depth=1,
                    num_heads=2, embed_dim=16, name="text")
    model = ClipModel(visual=visual, text=text)

    class StubLoader:
        num_batches = 10

    data = {"train": StubLoader(),
            "tcfg_train": get_transform_config(None, 32, is_train=True)}
    args = Args(batch_size=4, epochs=2, lr=1e-3, warmup=2, accum_freq=2,
                precision="fp32", lr_scheduler="cosine")
    run = RunState(rank=0, world_size=1)
    mesh = create_mesh()
    params = prepare_params(args, model, data, mesh, run, stage=1, rng=rng)
    sched = params["schedule"]
    expected = create_schedule(args, 10 * 2)  # num_batches * epochs
    for s in (0, 5, 10, 19):
        assert np.isclose(float(sched(s)), float(expected(s)), rtol=1e-6), s
    # the horizon end is the cosine tail, monotically below mid-train LR
    assert float(sched(19)) < float(sched(10)) < float(sched(4))
