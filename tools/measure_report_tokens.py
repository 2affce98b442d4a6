#!/usr/bin/env python
"""Measure the report token-length distribution vs the 256-token context.

Reproducible artifact behind the --text-context lever (ADVICE r4: the
round-4 judge measurement — mean 173 / p99 200 / max 205 on fully
populated synthetic rows — had no committed script). This regenerates it:

- rows: ISIC-shaped synthetic metadata with EVERY field populated (all 15
  measurement columns + patient triplet + symmetry pair + iddx_1), the
  worst case for report length;
- draws: train-mode randomization (template choice + shuffle ON,
  sentence dropout 0.1 as the dataset applies, data/dataset.py) plus the
  deterministic eval draw, tokenized with the hash tokenizer (CLS/SEP
  included, no padding);
- also records the EXACT per-row upper bound over all draws
  (report_gen.report_token_upper_bound) that --text-context auto uses.

Writes perf/report_tokens_r5.json and prints it.

Usage: python tools/measure_report_tokens.py [--rows 2000] [--draws 3]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

from mamba_clip_tpu.data.dataset import synthetic_metadata  # noqa: E402
from mamba_clip_tpu.data.report_gen import (  # noqa: E402
    generate_report,
    report_token_upper_bound,
)
from mamba_clip_tpu.data.tokenizer import HashTokenizer  # noqa: E402


def fully_populated(n: int, seed: int) -> "np.ndarray":
    """Synthetic metadata with no missing fields (worst-case lengths)."""
    df = synthetic_metadata(n, seed)
    rng = np.random.default_rng(seed + 1)
    df["age_approx"] = rng.choice([25, 40, 55, 70], n)
    df["sex"] = rng.choice(["male", "female"], n)
    df["anatom_site_general"] = rng.choice(
        ["head/neck", "upper extremity", "lower extremity", "torso"], n
    )
    return df


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2000)
    ap.add_argument("--draws", type=int, default=3,
                    help="train-mode draws per row (plus one eval draw)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "perf",
        "report_tokens_r5.json"))
    args = ap.parse_args()

    tok = HashTokenizer(context_length=4096)  # no truncation while measuring
    df = fully_populated(args.rows, args.seed)
    cols = list(df.columns)
    arrays = {c: df[c].to_numpy() for c in cols}

    lengths, bounds = [], []
    for i in range(len(df)):
        row = {c: arrays[c][i] for c in cols}
        # stage-1 train/val reports carry the diagnosis sentence
        bounds.append(2 + report_token_upper_bound(
            row, tok.count_tokens, include_target=True))
        rng = np.random.default_rng((args.seed, 0, i))
        texts = [generate_report(row, is_eval=True, include_target=True)]
        for _ in range(args.draws):
            texts.append(generate_report(
                row, is_eval=False, shuffle=True, dropout=0.1,
                include_target=True, rng=rng))
        for t in texts:
            lengths.append(2 + tok.count_tokens(t))  # + CLS/SEP

    L = np.asarray(lengths)
    B = np.asarray(bounds)
    assert int(B.max()) >= int(L.max()), "upper bound violated"
    out = {
        "rows": args.rows,
        "draws_per_row": args.draws + 1,
        "seed": args.seed,
        "population": "all 15 measurement fields + patient triplet + "
                      "symmetry + iddx_1 (fully populated, worst case)",
        "tokenizer": "hash (word-level; CLS/SEP counted)",
        "reference_context": 256,
        "observed": {
            "mean": round(float(L.mean()), 1),
            "p50": int(np.percentile(L, 50)),
            "p99": int(np.percentile(L, 99)),
            "max": int(L.max()),
        },
        "exact_upper_bound": {
            "mean": round(float(B.mean()), 1),
            "p99": int(np.percentile(B, 99)),
            "max": int(B.max()),
        },
        "auto_bucket_multiple16": int(-(-int(B.max()) // 16) * 16),
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
