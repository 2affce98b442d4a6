#!/usr/bin/env python
"""Measure the PyTorch reference's host input-path cost, honestly.

The reference recipe (reference: README.md:63) trains with a torch
DataLoader (``--workers`` default 4, reference cli/main.py:185), loading
JPEG bytes from HDF5 and running PIL decode + timm ``create_transform``
(RandomResizedCrop-bicubic-224 → hflip → ToTensor → normalize → random
erasing; reference data.py:37-108, 242-386) on host CPU EVERY epoch. Its
end-to-end throughput is min(GPU step rate, worker decode rate).

This tool measures the per-image host cost of that pipeline (PIL decode +
PIL bicubic RRC to 224 + ToTensor + normalize — the same operations, PIL/
torch only since timm/torchvision aren't installed here) at several source
resolutions, because ISIC-2024 SLICE-3D crops vary (~128px lesion crops up
to ~1024px; the exact distribution needs the 25GB dataset, absent in this
zero-egress environment).

Output: JSON lines per size + a derived reference end-to-end estimate:
  data_bound(img/s) = workers(4) / t_per_image
  e2e_estimate      = min(A100_COMPUTE_EST, data_bound)

A100_COMPUTE_EST = 350 img/s: open_clip's published training throughput
ballpark for ViT-B/16-class two-tower contrastive models with AMP on
A100-80GB (the reference model adds BERT-base@256 text, further reducing
it). See BASELINE.md for the full derivation and sensitivity table.
"""

import io
import json
import time

import numpy as np
import torch
from PIL import Image

A100_COMPUTE_EST = 350.0
WORKERS = 4  # reference default, cli/main.py:185; README recipe doesn't override
MEAN = (0.48145466, 0.4578275, 0.40821073)
STD = (0.26862954, 0.26130258, 0.27577711)


def make_jpeg(size: int, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    # skin-like low-frequency content so JPEG size is realistic, not
    # noise-inflated
    base = rng.normal(180, 30, (size // 8, size // 8, 3))
    img = np.clip(
        np.kron(base, np.ones((8, 8, 1))) + rng.normal(0, 8, (size, size, 3)),
        0, 255,
    ).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=90)
    return buf.getvalue()


def reference_item(jpeg_bytes: bytes, rng: np.random.Generator):
    """One DataLoader item: decode + train transform (PIL bicubic RRC-224 +
    hflip + ToTensor + normalize), as the reference's timm transform does."""
    img = Image.open(io.BytesIO(jpeg_bytes)).convert("RGB")
    w, h = img.size
    # RandomResizedCrop(scale=(0.08,1.0), ratio=(3/4,4/3))
    area = w * h * rng.uniform(0.08, 1.0)
    ratio = np.exp(rng.uniform(np.log(3 / 4), np.log(4 / 3)))
    cw = int(round(np.sqrt(area * ratio)))
    ch = int(round(np.sqrt(area / ratio)))
    cw, ch = min(cw, w), min(ch, h)
    x0 = rng.integers(0, w - cw + 1)
    y0 = rng.integers(0, h - ch + 1)
    img = img.resize((224, 224), Image.BICUBIC,
                     box=(x0, y0, x0 + cw, y0 + ch))
    if rng.random() < 0.5:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    t = torch.from_numpy(
        np.asarray(img, np.uint8).copy()
    ).permute(2, 0, 1).float().div_(255)
    t.sub_(torch.tensor(MEAN).view(3, 1, 1)).div_(torch.tensor(STD).view(3, 1, 1))
    return t


def main():
    results = []
    for size in (128, 256, 512, 1024):
        blob = make_jpeg(size)
        rng = np.random.default_rng(0)
        n = max(8, int(2e7 // (size * size)))
        # warmup
        for _ in range(3):
            reference_item(blob, rng)
        t0 = time.perf_counter()
        for _ in range(n):
            reference_item(blob, rng)
        dt = (time.perf_counter() - t0) / n
        data_bound = WORKERS / dt
        row = {
            "src_px": size,
            "jpeg_kb": round(len(blob) / 1024, 1),
            "ms_per_image_per_worker": round(dt * 1e3, 2),
            "data_bound_img_s_4workers": round(data_bound, 1),
            "reference_e2e_estimate_img_s": round(
                min(A100_COMPUTE_EST, data_bound), 1
            ),
        }
        results.append(row)
        print(json.dumps(row))
    return results


if __name__ == "__main__":
    main()
