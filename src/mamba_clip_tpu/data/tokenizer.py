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

    def __init__(self, context_length: int = 256, vocab_size: int = 30522):
        self.context_length = context_length
        self.vocab_size = vocab_size
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

    def __call__(self, texts: Union[str, Sequence[str]]) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), self.context_length), dtype=np.int32)
        for i, t in enumerate(texts):
            ids = [self.CLS] + self._encode_one(t)[: self.context_length - 2] + [self.SEP]
            out[i, : len(ids)] = ids
        return out


class HFTokenizerAdapter:
    """Local HuggingFace tokenizer (no network), BERT-style output."""

    def __init__(self, path: str, context_length: int = 256):
        from transformers import AutoTokenizer

        self.tok = AutoTokenizer.from_pretrained(path, local_files_only=True)
        self.context_length = context_length
        self.vocab_size = self.tok.vocab_size
        self.pad_id = self.tok.pad_token_id or 0

    def __call__(self, texts: Union[str, Sequence[str]]) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        enc = self.tok(
            list(texts),
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
