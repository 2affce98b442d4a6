#!/usr/bin/env python
"""Dataset bootstrap: download + unzip the ISIC-2024 Kaggle challenge data.

Mirrors the reference's repo-root script (reference:
/root/reference/download_dataset.py:1-21): requires the ``kaggle`` package
and credentials; writes to data/isic-2024-challenge.
"""

import argparse
import os
import zipfile


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--competition", default="isic-2024-challenge")
    p.add_argument("--out", default="data")
    args = p.parse_args()

    try:
        import kaggle
    except ImportError:
        raise SystemExit(
            "the `kaggle` package is required (pip install kaggle) and "
            "~/.kaggle/kaggle.json must hold your API credentials"
        )

    dest = os.path.join(args.out, args.competition)
    os.makedirs(dest, exist_ok=True)
    kaggle.api.competition_download_files(args.competition, path=args.out)
    zpath = os.path.join(args.out, f"{args.competition}.zip")
    with zipfile.ZipFile(zpath) as z:
        z.extractall(dest)
    os.remove(zpath)
    print(f"extracted to {dest}")


if __name__ == "__main__":
    main()
