"""Data layer tests: report generator, tokenizer, sampling, metadata,
loader batch shapes."""

import numpy as np
import pandas as pd
import pytest

from mamba_clip_tpu.config import Args
from mamba_clip_tpu.data import (
    BatchLoader,
    HashTokenizer,
    SyntheticIsicDataset,
    combo_epoch_indices,
    epoch_indices,
    generate_report,
    sample_weights,
    sampling_probabilities,
    synthetic_metadata,
    train_test_split,
    undersample_data,
)


def _row():
    md = synthetic_metadata(4, seed=1)
    return md.iloc[0]


class TestReportGen:
    def test_eval_deterministic(self):
        row = _row()
        r1 = generate_report(row, is_eval=True)
        r2 = generate_report(row, is_eval=True)
        assert r1 == r2 and len(r1) > 20

    def test_train_randomized(self):
        row = _row()
        rngs = [np.random.default_rng(i) for i in range(8)]
        reports = {generate_report(row, shuffle=True, dropout=0.3, rng=r) for r in rngs}
        assert len(reports) > 1

    def test_dropout_shortens(self):
        row = _row()
        rng = np.random.default_rng(0)
        full = generate_report(row, is_eval=True)
        dropped = [
            generate_report(row, dropout=0.9, rng=np.random.default_rng(i))
            for i in range(5)
        ]
        assert min(len(d) for d in dropped) < len(full)

    def test_include_target(self):
        row = _row()
        with_t = generate_report(row, is_eval=True, include_target=True)
        without = generate_report(row, is_eval=True, include_target=False)
        assert len(with_t) > len(without)


class TestTokenizer:
    def test_shapes_and_determinism(self):
        tok = HashTokenizer(context_length=32, vocab_size=1000)
        out = tok(["hello world", "a lesion on the torso"])
        assert out.shape == (2, 32) and out.dtype == np.int32
        assert (out == tok(["hello world", "a lesion on the torso"])).all()
        assert out[0, 0] == HashTokenizer.CLS
        assert (out < 1000).all() and (out >= 0).all()

    def test_truncation(self):
        tok = HashTokenizer(context_length=8, vocab_size=100)
        out = tok("word " * 50)
        assert out.shape == (1, 8)
        assert out[0, -1] == HashTokenizer.SEP

    def test_real_wordpiece_from_local_path(self, tmp_path):
        """A local HF vocab loads the REAL WordPiece tokenizer (the path
        converted-BiomedCLIP runs must use; reference builds it via
        open_clip get_tokenizer, model.py:1279)."""
        pytest.importorskip("transformers")
        from mamba_clip_tpu.data.tokenizer import (
            HFTokenizerAdapter,
            get_tokenizer,
        )

        vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
                 "a", "lesion", "on", "the", "torso", "##s"]
        (tmp_path / "vocab.txt").write_text("\n".join(vocab) + "\n")
        (tmp_path / "tokenizer_config.json").write_text(
            '{"tokenizer_class": "BertTokenizer", "do_lower_case": true}'
        )
        tok = get_tokenizer(str(tmp_path), context_length=12,
                            require_real=True)
        assert isinstance(tok, HFTokenizerAdapter)
        out = tok(["a lesion on the torso", "lesions"])
        assert out.shape == (2, 12) and out.dtype == np.int32
        cls_id, sep_id, pad_id = 2, 3, 0
        assert out[0, 0] == cls_id
        # known vocab words map to their vocab indices
        assert list(out[0, 1:6]) == [5, 6, 7, 8, 9]
        assert out[0, 6] == sep_id and out[0, 7] == pad_id
        # wordpiece continuation: "lesions" -> "lesion" + "##s"
        assert list(out[1, 1:3]) == [6, 10]

    def test_hub_name_requires_real_raises(self):
        from mamba_clip_tpu.data.tokenizer import get_tokenizer

        with pytest.raises(RuntimeError, match="WordPiece|real"):
            get_tokenizer("some-hub/name", context_length=8,
                          require_real=True)


class TestSampling:
    def test_probability_modes(self):
        counts = np.array([90, 10])
        inst = sampling_probabilities(counts, "instance")
        assert np.allclose(inst, [2.0, 2.0])  # uniform over classes
        cls = sampling_probabilities(counts, "class")
        assert cls[1] / cls[0] == pytest.approx(9.0)
        sqrt = sampling_probabilities(counts, "sqrt")
        assert 1 < sqrt[1] / sqrt[0] < 9

    def test_prog_interpolates(self):
        counts = np.array([90, 10])
        p0 = sampling_probabilities(counts, "prog", ep=0, n_eps=10)
        p9 = sampling_probabilities(counts, "prog", ep=9, n_eps=10)
        assert np.allclose(p0, sampling_probabilities(counts, "instance"))
        assert np.allclose(p9, sampling_probabilities(counts, "class"))

    def test_class_balancing_effect(self):
        targets = np.array([0] * 900 + [1] * 100)
        w = sample_weights(targets, "class")
        idx = epoch_indices(targets, "class", seed=0, epoch=0, n_eps=2)
        frac_pos = (targets[idx] == 1).mean()
        assert 0.4 < frac_pos < 0.6

    def test_per_host_shards_disjoint(self):
        targets = np.zeros(64, np.int64)
        a = epoch_indices(targets, None, seed=0, epoch=0, rank=0, world_size=2)
        b = epoch_indices(targets, None, seed=0, epoch=0, rank=1, world_size=2)
        assert len(a) == len(b) == 32
        assert set(a).isdisjoint(set(b))

    def test_combo_streams(self):
        targets = np.array([0] * 90 + [1] * 10)
        imbal, bal = combo_epoch_indices(targets, seed=0, epoch=0)
        assert len(imbal) == len(bal) == 100
        assert (targets[bal] == 1).mean() > (targets[imbal] == 1).mean()


class TestMetadata:
    def test_stratified_split(self):
        md = synthetic_metadata(500, seed=0)
        tr, va = train_test_split(md, 0.2, random_state=0, stratify=md["target"])
        assert len(tr) + len(va) == 500
        assert abs(len(va) - 100) <= 2
        # class 1 present in both when possible
        assert (tr["target"] == 1).sum() >= 1

    def test_undersample_cap(self):
        md = synthetic_metadata(500, seed=0)
        args = Args(undersample=50, seed=0)
        tr, va = undersample_data(args, md, md.iloc[:0])
        per_class = tr.groupby("target").size()
        assert per_class.max() <= 50

    def test_undersample_add_remaining(self):
        md = synthetic_metadata(300, seed=0)
        args = Args(undersample=20, add_remaining_samples=True, seed=0)
        tr, va = undersample_data(args, md, md.iloc[:0])
        assert len(tr) + len(va) == 300


class TestLoader:
    def test_batch_shapes(self):
        tok = HashTokenizer(context_length=16, vocab_size=500)
        ds = SyntheticIsicDataset(64, tokenizer=tok, staging_size=32, is_train=True)
        loader = BatchLoader(ds, batch_size=8, seed=0, workers=2)
        batches = list(loader)
        assert len(batches) == 8
        b = batches[0]
        assert b["image"].shape == (8, 32, 32, 3) and b["image"].dtype == np.uint8
        assert b["tokens"].shape == (8, 16)
        assert b["target"].shape == (8,)

    def test_balanced_mixup_batches(self):
        tok = HashTokenizer(context_length=16, vocab_size=500)
        ds = SyntheticIsicDataset(64, tokenizer=tok, staging_size=32, is_train=True)
        loader = BatchLoader(ds, batch_size=8, seed=0, balanced_mixup=True, workers=2)
        b = next(iter(loader))
        assert "mix_image" in b and b["mix_image"].shape == b["image"].shape
        assert "mix_target" in b

    def test_zero_batches_raises(self):
        ds = SyntheticIsicDataset(4, staging_size=8)
        loader = BatchLoader(ds, batch_size=8, seed=0, workers=1)
        with pytest.raises(ValueError, match="0 batches"):
            next(iter(loader))

    def test_epochs_differ(self):
        ds = SyntheticIsicDataset(32, staging_size=8, is_train=True)
        loader = BatchLoader(ds, batch_size=8, seed=0, workers=1)
        loader.set_epoch(0)
        e0 = [b["target"] for b in loader]
        loader.set_epoch(1)
        e1 = [b["target"] for b in loader]
        assert not all((a == b).all() for a, b in zip(e0, e1))

    def test_abandoned_iterator_releases_producer(self):
        # a consumer that stops early (e.g. a crashed train loop) must not
        # leave the producer thread blocked on a full queue forever
        import threading
        import time

        ds = SyntheticIsicDataset(256, staging_size=8, is_train=True)
        loader = BatchLoader(
            ds, batch_size=8, seed=0, workers=2, prefetch_batches=1
        )
        before = set(threading.enumerate())
        it = iter(loader)
        next(it)
        it.close()  # generator finally → stop event
        deadline = time.time() + 10.0
        while time.time() < deadline:
            extra = [
                t for t in threading.enumerate()
                if t not in before and t.is_alive()
            ]
            if not extra:
                break
            time.sleep(0.05)
        assert not extra, f"producer threads leaked: {extra}"


class _CaptureTokenizer:
    """Records every text it tokenizes; returns fixed-shape tokens."""

    def __init__(self):
        self.texts = []

    def __call__(self, text):
        self.texts.append(text)
        return np.zeros((1, 8), np.int32)


class TestGetDataWiring:
    """get_data must wire include_target=(stage==1) to train/val and never
    to the test split (reference: data.py:570,600 and the test dataset's
    False default), and honor --train/val-num-samples caps."""

    def _texts(self, stage, split="train", is_test=False):
        from mamba_clip_tpu.data import get_data

        tok = _CaptureTokenizer()
        args = Args(
            synthetic_data=True, stage=stage, is_test=is_test, seed=0,
            batch_size=4, train_num_samples=16, val_num_samples=16,
            workers=1, epochs=1,
        )
        kw = {}
        if is_test:
            kw["test_metadata"] = synthetic_metadata(16, seed=3)
        data = get_data(args, tokenizer=tok, staging_size=8, **kw)
        loader = data[split].loader
        for _ in loader:
            pass
        return loader.dataset, tok.texts

    def _has_dx(self, ds, texts):
        dxs = set(ds.meta["iddx_1"])
        return [any(dx in t for dx in dxs) for t in texts]

    def test_stage1_train_val_carry_diagnosis(self):
        for split in ("train", "val"):
            ds, texts = self._texts(stage=1, split=split)
            assert texts and all(self._has_dx(ds, texts)), split

    def test_stage2_drops_diagnosis(self):
        for split in ("train", "val"):
            ds, texts = self._texts(stage=2, split=split)
            assert texts and not any(self._has_dx(ds, texts)), split

    def test_test_split_never_has_diagnosis(self):
        ds, texts = self._texts(stage=1, split="test", is_test=True)
        assert texts and not any(self._has_dx(ds, texts))

    def test_num_samples_caps(self):
        from mamba_clip_tpu.data import get_data

        args = Args(
            synthetic_data=True, stage=1, seed=0, batch_size=4,
            train_num_samples=12, val_num_samples=8, workers=1, epochs=1,
        )
        data = get_data(args, staging_size=8)
        assert len(data["train"].loader.dataset) == 12
        assert len(data["val"].loader.dataset) == 8

    def test_num_samples_caps_real_metadata(self):
        # the real-data path trims the metadata frame before dataset build
        # (dataset init never touches the disk, so a fake path suffices)
        from mamba_clip_tpu.data import get_data

        meta = synthetic_metadata(32, seed=1)
        args = Args(
            synthetic_data=False, stage=1, seed=0, batch_size=4,
            data_path="/nonexistent/", train_num_samples=10, workers=1,
        )
        data = get_data(args, train_metadata=meta, staging_size=8)
        assert len(data["train"].loader.dataset) == 10
