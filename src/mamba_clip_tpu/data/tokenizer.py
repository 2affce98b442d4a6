"""Text tokenization for the contrastive pipeline.

The reference uses open_clip's ``get_tokenizer("hf-hub:...")`` — the
PubMedBERT WordPiece tokenizer fetched from the HF hub (reference:
src/mamba_clip/model.py:1279, data.py tokenizes reports to a 256-token
context). This framework must work without network access, so it ships:

- :class:`HashTokenizer` — a deterministic, vocabulary-free word tokenizer:
  lowercased word/number/punct pieces are mapped to stable ids by FNV-1a
  hashing into the BERT-sized id space. CLS/SEP/PAD conventions match BERT
  (CLS first, SEP last, PAD=0) so the text tower's pad-masking works
  unchanged. For training-from-scratch (the only option without pretrained
  weights) this is equivalent to a fixed random vocabulary assignment —
  collisions are rare at 30k ids for a ~2k-word clinical vocabulary.
- :class:`HFTokenizerAdapter` — wraps a local
  ``transformers.PreTrainedTokenizerFast`` when a vocab file/dir is
  available (for weight-converted parity runs). Selected automatically by
  :func:`get_tokenizer` when the name is an existing path.

Both return fixed-shape int32 arrays (batch, context_length) — static
shapes are a jit requirement.
"""

from __future__ import annotations

import os
import re
from typing import List, Sequence, Union

import numpy as np

_WORD_RE = re.compile(r"[a-z0-9]+|[^\sa-z0-9]")


def _fnv1a(s: str) -> int:
    h = 0xCBF29CE484222325
    for ch in s.encode("utf-8"):
        h ^= ch
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


class HashTokenizer:
    PAD = 0
    UNK = 1
    CLS = 2
    SEP = 3
    N_SPECIAL = 4

    N_SPECIAL_PER_SEQ = 2  # CLS + SEP

    def __init__(self, context_length: int = 256, vocab_size: int = 30522):
        self.context_length = context_length
        self.vocab_size = vocab_size
        # "truncate" (reference semantics: silently clip to the context,
        # data.py tokenizes to 256 and open_clip truncates) or "error"
        # (set by --text-context trimming: a report longer than the
        # measured bucket means the bucket is stale — fail loudly rather
        # than silently drop clinical sentences).
        self.on_overflow = "truncate"
        # word -> id memo: report text is templated, so the live vocabulary
        # is small; hashing each word in Python (~3 us) dominated the host
        # item cost before this (measured in the loader-bound e2e run)
        self._memo: dict = {}

    @property
    def pad_id(self) -> int:
        return self.PAD

    def _encode_one(self, text: str) -> List[int]:
        space = self.vocab_size - self.N_SPECIAL
        memo = self._memo
        out = []
        for t in _WORD_RE.findall(text.lower()):
            tid = memo.get(t)
            if tid is None:
                tid = self.N_SPECIAL + (_fnv1a(t) % space)
                # bounded memo (ADVICE r2): reports render continuous
                # measurements as text, so distinct numeric strings would
                # otherwise accumulate for the life of the process; hashing
                # uncached words is still correct, the cap is free
                if len(memo) < 1_000_000:
                    memo[t] = tid
            out.append(tid)
        return out

    def count_tokens(self, text: str) -> int:
        """Token count WITHOUT special tokens (for context measurement)."""
        return len(_WORD_RE.findall(text.lower()))

    def __call__(self, texts: Union[str, Sequence[str]]) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        cap = self.context_length - 2
        out = np.zeros((len(texts), self.context_length), dtype=np.int32)
        for i, t in enumerate(texts):
            body = self._encode_one(t)
            if len(body) > cap and self.on_overflow == "error":
                raise ValueError(
                    f"text of {len(body)} tokens overflows the trimmed "
                    f"context {self.context_length} (--text-context); pass "
                    "a larger bucket or leave --text-context unset for the "
                    "reference's 256-with-truncation"
                )
            ids = [self.CLS] + body[:cap] + [self.SEP]
            out[i, : len(ids)] = ids
        return out


class HFTokenizerAdapter:
    """Local HuggingFace tokenizer (no network), BERT-style output."""

    N_SPECIAL_PER_SEQ = 2  # [CLS] + [SEP]

    def __init__(self, path: str, context_length: int = 256):
        from transformers import AutoTokenizer

        self.tok = AutoTokenizer.from_pretrained(path, local_files_only=True)
        self.context_length = context_length
        self.vocab_size = self.tok.vocab_size
        self.pad_id = self.tok.pad_token_id or 0
        self.on_overflow = "truncate"  # see HashTokenizer.on_overflow

    def count_tokens(self, text: str) -> int:
        """Subword count WITHOUT special tokens (for context measurement —
        WordPiece counts differ from the hash tokenizer's word counts, so
        --text-context auto must measure with the live tokenizer)."""
        return len(self.tok(text, add_special_tokens=False)["input_ids"])

    def __call__(self, texts: Union[str, Sequence[str]]) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        texts = list(texts)
        if self.on_overflow == "error":
            cap = self.context_length - self.N_SPECIAL_PER_SEQ
            for t in texts:
                n = self.count_tokens(t)
                if n > cap:
                    raise ValueError(
                        f"text of {n} subwords overflows the trimmed "
                        f"context {self.context_length} (--text-context); "
                        "pass a larger bucket or leave --text-context "
                        "unset for the reference's 256-with-truncation"
                    )
        enc = self.tok(
            texts,
            padding="max_length",
            truncation=True,
            max_length=self.context_length,
            return_tensors="np",
        )
        return enc["input_ids"].astype(np.int32)


def get_tokenizer(name_or_path: str, context_length: int = 256,
                  require_real: bool = False):
    """Tokenizer factory (reference: open_clip get_tokenizer at
    model.py:1279). Local paths → HF WordPiece tokenizer; anything else →
    the deterministic hash tokenizer, LOUDLY (hub names can't be fetched in
    a zero-egress environment).

    ``require_real`` (set for --pretrained runs) turns the fallback into a
    hard error: hash-tokenized input through a pretrained text tower would
    quietly destroy it. Pass ``--tokenizer hash`` to opt out explicitly.
    """
    from ..utils.logging import get_logger

    logger = get_logger(__name__)
    if name_or_path and os.path.exists(str(name_or_path)):
        try:
            return HFTokenizerAdapter(name_or_path, context_length)
        except Exception as e:
            if require_real:
                raise RuntimeError(
                    f"--tokenizer {name_or_path}: loading the HF tokenizer "
                    f"failed ({e}); pretrained weights require the real "
                    "WordPiece vocabulary"
                ) from e
            logger.warning(
                f"tokenizer path {name_or_path!r} failed to load ({e}); "
                "falling back to the hash tokenizer"
            )
            return HashTokenizer(context_length=context_length)
    if str(name_or_path).lower() in ("hash", "none", ""):
        return HashTokenizer(context_length=context_length)
    if require_real:
        raise RuntimeError(
            f"tokenizer {name_or_path!r} is not a local path. Pretrained "
            "(converted) weights need the matching WordPiece tokenizer — "
            "pass --tokenizer <dir with vocab.txt/tokenizer.json>, or "
            "--tokenizer hash to explicitly accept the stand-in."
        )
    logger.warning(
        f"tokenizer {name_or_path!r} is not a local path (no network "
        "access): using the deterministic HASH tokenizer stand-in. Fine for "
        "training from scratch; NOT compatible with converted pretrained "
        "text towers."
    )
    return HashTokenizer(context_length=context_length)


def measure_required_context(tokenizer, splits, sample_cap: int = 8192) -> int:
    """Exact max token length (incl. CLS/SEP) any report draw can reach.

    ``splits``: iterable of (metadata DataFrame, include_target bool), one
    per dataset split, mirroring how the datasets call generate_report.
    Uses report_gen.report_token_upper_bound — an exact per-row maximum
    over every template/shuffle/dropout draw — so a context sized to this
    value can NEVER overflow at runtime for the measured rows. Rows beyond
    ``sample_cap`` per split are subsampled evenly; numeric renderings are
    rounded to <=2 decimals so between-row token-count variation is tiny,
    and any unmeasured longer row still fails loudly (on_overflow="error").
    """
    import numpy as np

    from .report_gen import report_token_upper_bound

    count = tokenizer.count_tokens
    n_special = getattr(tokenizer, "N_SPECIAL_PER_SEQ", 2)
    need = 0
    for meta, include_target in splits:
        if meta is None or len(meta) == 0:
            continue
        n = len(meta)
        idx = (
            np.unique(np.linspace(0, n - 1, sample_cap).astype(int))
            if n > sample_cap
            else np.arange(n)
        )
        cols = list(meta.columns)
        arrays = {c: meta[c].to_numpy() for c in cols}
        for i in idx:
            row = {c: arrays[c][i] for c in cols}
            b = report_token_upper_bound(row, count, include_target)
            if b > need:
                need = b
    return need + n_special


def resolve_text_context(
    spec,
    tokenizer,
    splits=None,
    model_context: int = 256,
    multiple: int = 16,
    floor: int = 32,
    logger=None,
) -> int:
    """Resolve ``--text-context`` and configure ``tokenizer`` in place.

    The reference pads every report to the model's full 256-token context
    (reference: model.py:1007; data.py tokenizes with the open_clip
    tokenizer's fixed context) and computes the text tower over the
    padding — measured ISIC reports are p99 200 / max 205 tokens
    (perf/report_tokens_r5.json), so ~25% of the text-tower compute is
    pure padding. A TPU-first build sizes the static shape to the data:

    - ``spec`` int or numeric str: trim to exactly that bucket; overflow
      becomes a hard error (the user chose the bucket).
    - ``spec == "auto"``: measure the dataset's exact maximum report
      length with the LIVE tokenizer (WordPiece subword counts differ
      from hash-word counts), round up to ``multiple`` (sublane-friendly),
      clamp to [floor, model_context]. Overflow is a hard error — by
      construction it cannot fire for measured rows.
    - ``spec`` None/"": keep the tokenizer as built (reference parity).

    Returns the resolved context length. The model needs no change: the
    text tower slices its position table to the input length
    (models/text_bert.py pos[:, :L]) and pad columns are attention-masked,
    so trimmed and 256-padded batches produce identical embeddings
    (tests/test_text_context.py identity test).
    """
    if spec in (None, "", "none"):
        return tokenizer.context_length
    spec = str(spec)
    if spec != "auto":
        ctx = int(spec)
        if ctx < 8:
            raise ValueError(f"--text-context {ctx}: too small to hold any report")
        if ctx > model_context:
            raise ValueError(
                f"--text-context {ctx} exceeds the text tower's position "
                f"table ({model_context})"
            )
        tokenizer.context_length = ctx
        tokenizer.on_overflow = "error" if ctx < model_context else "truncate"
        if logger:
            logger.info(f"text context: {ctx} (explicit; overflow is an error)")
        return ctx
    if not splits:
        if logger:
            logger.warning(
                "--text-context auto: no metadata to measure; keeping "
                f"{tokenizer.context_length}"
            )
        return tokenizer.context_length
    need = measure_required_context(tokenizer, splits)
    ctx = max(floor, -(-need // multiple) * multiple)
    if ctx >= model_context:
        if logger:
            logger.warning(
                f"text context: auto measured {need} needed — no headroom "
                f"under the model's {model_context}; keeping reference "
                "padding semantics"
            )
        tokenizer.context_length = model_context
        tokenizer.on_overflow = "truncate"
        return model_context
    tokenizer.context_length = ctx
    tokenizer.on_overflow = "error"
    if logger:
        logger.info(
            f"text context: auto → {ctx} (exact max needed {need}, "
            f"reference pads to {model_context})"
        )
    return ctx
