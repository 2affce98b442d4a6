"""ISIC-2024 dataset readers (host side) + synthetic stand-in.

Re-design of the reference's ``IsicChallengeDataset``
(reference: src/mamba_clip/data.py:242-386): images come from an HDF5 file
of JPEG byte blobs keyed by ``isic_id`` (opened SWMR for multi-worker
safety, data.py:287) or from a directory of ``<isic_id>.jpg`` files;
text is a clinical report synthesized per access from the metadata row
(train: shuffle=True, dropout=0.1; eval: deterministic — data.py:345-360),
then tokenized to a fixed 256-token context.

Differences by design:
- the host stage only decodes + keep-ratio-resizes + center-crops to a
  square ``staging_size`` uint8 array; all augmentation runs on-device
  (ops/preprocess.py);
- randomness is an explicit per-(seed, epoch, index) Generator so any
  worker/thread produces identical streams;
- ``small_test`` actually subsamples (the reference plumbs the flag but
  never reads it — SURVEY §2.12 intent fix).
"""

from __future__ import annotations

import io
import os
import threading
from typing import Optional

import numpy as np
import pandas as pd

from .report_gen import generate_report


def _content_key(data_path, ids) -> str:
    """Hash identifying exactly which rows a cache holds.

    Keyed on the image source AND the full id sequence: two datasets of
    equal length but different id sets (e.g. two --undersample draws with
    different seeds, or same-size val/test splits) must never share a
    memmap — the done-bitmap would say "present" for rows that belong to
    the other id set and images would silently cross over.
    """
    import hashlib

    h = hashlib.sha1()
    h.update(str(data_path).encode())
    for i in ids:
        h.update(b"\0")
        h.update(str(i).encode())
    return h.hexdigest()[:16]


class StagingCache:
    """Disk memmap of decoded uint8 staging squares.

    The reference re-decodes every JPEG every epoch (torchvision transform
    pipeline, reference: data.py:297-314). On a TPU VM the host CPU is the
    bottleneck, so after the first epoch the decoded staging array is
    served from a numpy memmap (~196KB/image at 256px). Thread-safe for
    the loader's pool: items are written at disjoint indices and the
    done-bitmap is flipped only after the row is written.
    """

    def __init__(self, cache_dir: str, name: str, n: int, staging: int):
        os.makedirs(cache_dir, exist_ok=True)
        data_path = os.path.join(cache_dir, f"{name}_{staging}.npy")
        done_path = os.path.join(cache_dir, f"{name}_{staging}_done.npy")
        shape = (n, staging, staging, 3)
        if os.path.exists(data_path) and os.path.exists(done_path):
            self.data = np.lib.format.open_memmap(data_path, mode="r+")
            self.done = np.lib.format.open_memmap(done_path, mode="r+")
            if self.data.shape != shape or self.done.shape != (n,):
                self.data = np.lib.format.open_memmap(
                    data_path, mode="w+", dtype=np.uint8, shape=shape
                )
                self.done = np.lib.format.open_memmap(
                    done_path, mode="w+", dtype=np.uint8, shape=(n,)
                )
        else:
            self.data = np.lib.format.open_memmap(
                data_path, mode="w+", dtype=np.uint8, shape=shape
            )
            self.done = np.lib.format.open_memmap(
                done_path, mode="w+", dtype=np.uint8, shape=(n,)
            )

    def get(self, idx: int):
        if self.done[idx]:
            return np.asarray(self.data[idx])
        return None

    def put(self, idx: int, arr: np.ndarray) -> None:
        self.data[idx] = arr
        self.done[idx] = 1


def _decode_to_square(img, staging: int) -> np.ndarray:
    """PIL image → RGB uint8 (staging, staging, 3): keep-ratio resize of the
    shorter side then center crop."""
    from PIL import Image

    img = img.convert("RGB")
    w, h = img.size
    scale = staging / min(w, h)
    nw, nh = max(int(round(w * scale)), staging), max(int(round(h * scale)), staging)
    img = img.resize((nw, nh), Image.BILINEAR)
    left = (nw - staging) // 2
    top = (nh - staging) // 2
    img = img.crop((left, top, left + staging, top + staging))
    return np.asarray(img, dtype=np.uint8)


class IsicChallengeDataset:
    """Map-style dataset yielding dict(image=uint8 HWC, tokens=int32, target=int32)."""

    def __init__(
        self,
        data_path: str,
        metadata_or_path,
        tokenizer=None,
        staging_size: int = 256,
        is_train: bool = False,
        include_target: bool = False,
        small_test: bool = False,
        seed: int = 0,
        cache_dir: Optional[str] = None,
    ):
        self.data_path = data_path
        self.is_hdf5 = str(data_path).endswith((".h5", ".hdf5"))
        if isinstance(metadata_or_path, str):
            meta = pd.read_csv(metadata_or_path)
        else:
            meta = metadata_or_path.copy()
        if "isic_id" not in meta.columns:
            meta["isic_id"] = meta.index
        self.meta = meta.set_index("isic_id")
        if small_test:
            self.meta = self.meta.iloc[: min(len(self.meta), 512)]
        self.ids = list(self.meta.index)
        # fast row access: pandas .loc row materialization costs ~0.5 ms per
        # item, which at 64-item batches starves the TPU (measured; the hot
        # loop is GIL-bound Python, see data/loader.py). Column arrays +
        # an on-demand dict keep the O(1)-ish access without duplicating
        # the whole frame as row dicts (to_dict('records') on the real
        # ~400k x ~55 ISIC metadata is a GB-class allocation).
        self._col_arrays = {
            c: self.meta[c].to_numpy() for c in self.meta.columns
        }
        self.targets = (
            self.meta["target"].to_numpy(np.int32)
            if "target" in self.meta.columns
            else None
        )
        self.tokenizer = tokenizer
        self.staging_size = staging_size
        self.is_train = is_train
        self.include_target = include_target
        self.seed = seed
        self.epoch = 0
        # per-thread h5py handles: SWMR protects cross-PROCESS readers, but
        # concurrent reads on one handle from the loader's ThreadPoolExecutor
        # are unsafe unless libhdf5 was built threadsafe (the reference
        # sidesteps this with DataLoader worker processes, data.py:287).
        self._h5_local = threading.local()
        self._h5_all: list = []
        self._h5_all_lock = threading.Lock()
        self._token_memo = {} if not is_train else None  # eval text is deterministic
        # cache name carries a content hash of (data_path, ids): equal-length
        # datasets with different id sets get distinct memmaps.
        self.cache = (
            StagingCache(
                cache_dir,
                f"{'train' if is_train else 'eval'}"
                f"_{len(self.ids)}_{_content_key(data_path, self.ids)}",
                len(self.ids),
                staging_size,
            )
            if cache_dir
            else None
        )

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        return len(self.ids)

    def _h5_file(self):
        f = getattr(self._h5_local, "file", None)
        if f is None:
            import h5py

            f = h5py.File(self.data_path, "r", libver="latest", swmr=True)
            self._h5_local.file = f
            with self._h5_all_lock:
                self._h5_all.append(f)
        return f

    def _load_image(self, isic_id: str, idx: Optional[int] = None) -> np.ndarray:
        if self.cache is not None and idx is not None:
            hit = self.cache.get(idx)
            if hit is not None:
                return hit
        if self.is_hdf5:
            blob = bytes(self._h5_file()[isic_id][()])
        else:
            with open(os.path.join(self.data_path, f"{isic_id}.jpg"), "rb") as f:
                blob = f.read()
        # native fast path: libjpeg DCT-scaled decode + fused staging resize
        from . import fastimage

        out = fastimage.decode_resize(blob, self.staging_size)
        if out is None:
            from PIL import Image

            out = _decode_to_square(Image.open(io.BytesIO(blob)), self.staging_size)
        if self.cache is not None and idx is not None:
            self.cache.put(idx, out)
        return out

    def __getitem__(self, idx: int) -> dict:
        isic_id = self.ids[idx]
        row = {c: a[idx] for c, a in self._col_arrays.items()}
        rng = np.random.default_rng((self.seed, self.epoch, idx))
        image = self._load_image(isic_id, idx)
        out = {"image": image}
        if self.tokenizer is not None:
            if self._token_memo is not None and idx in self._token_memo:
                out["tokens"] = self._token_memo[idx]
            else:
                text = generate_report(
                    row,
                    is_eval=not self.is_train,
                    shuffle=self.is_train,
                    dropout=0.1 if self.is_train else 0.0,
                    include_target=self.include_target,
                    rng=rng,
                )
                out["tokens"] = self.tokenizer(text)[0]
                if self._token_memo is not None:
                    self._token_memo[idx] = out["tokens"]
        if self.targets is not None:
            out["target"] = np.int32(self.targets[idx])
        return out

    def close(self):
        with self._h5_all_lock:
            files, self._h5_all = self._h5_all, []
        for f in files:
            try:
                f.close()
            except Exception:
                pass
        self._h5_local = threading.local()


def synthetic_metadata(n: int, seed: int = 0) -> pd.DataFrame:
    """ISIC-shaped synthetic metadata (for tests/bench; the real columns the
    report generator consumes)."""
    rng = np.random.default_rng(seed)
    sites = ["head/neck", "upper extremity", "lower extremity", "torso"]
    sexes = ["male", "female"]
    n_pos = max(int(n * 0.02), 1)
    target = np.zeros(n, np.int64)
    target[rng.choice(n, n_pos, replace=False)] = 1
    df = pd.DataFrame(
        {
            "isic_id": [f"ISIC_{i:07d}" for i in range(n)],
            "target": target,
            "age_approx": rng.choice([25, 40, 55, 70, np.nan], n),
            "sex": rng.choice(sexes + [np.nan], n),
            "anatom_site_general": rng.choice(sites + [np.nan], n),
            "clin_size_long_diam_mm": rng.uniform(1, 20, n),
            "tbp_lv_H": rng.uniform(0, 60, n),
            "tbp_lv_areaMM2": rng.uniform(1, 80, n),
            "tbp_lv_area_perim_ratio": rng.uniform(10, 40, n),
            "tbp_lv_color_std_mean": rng.uniform(0, 2, n),
            "tbp_lv_deltaLBnorm": rng.uniform(0, 15, n),
            "tbp_lv_eccentricity": rng.uniform(0, 1, n),
            "tbp_lv_location_simple": rng.choice(sites, n),
            "tbp_lv_minorAxisMM": rng.uniform(1, 15, n),
            "tbp_lv_nevi_confidence": rng.uniform(0, 100, n),
            "tbp_lv_norm_border": rng.uniform(0, 10, n),
            "tbp_lv_norm_color": rng.uniform(0, 10, n),
            "tbp_lv_perimeterMM": rng.uniform(5, 60, n),
            "tbp_lv_radial_color_std_max": rng.uniform(0, 3, n),
            "tbp_lv_symm_2axis": rng.uniform(0, 1, n),
            "tbp_lv_symm_2axis_angle": rng.integers(0, 180, n).astype(np.float64),
            "iddx_1": rng.choice(["Benign", "Malignant"], n),
        }
    )
    return df


class SyntheticIsicDataset:
    """Random images + ISIC-shaped metadata; same item contract as
    IsicChallengeDataset. Images are deterministic per index."""

    def __init__(
        self,
        n: int = 1024,
        tokenizer=None,
        staging_size: int = 256,
        is_train: bool = False,
        include_target: bool = False,
        seed: int = 0,
    ):
        self.meta = synthetic_metadata(n, seed).set_index("isic_id")
        self.targets = self.meta["target"].to_numpy(np.int32)
        self.tokenizer = tokenizer
        self.staging_size = staging_size
        self.is_train = is_train
        self.include_target = include_target
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        return len(self.meta)

    def __getitem__(self, idx: int) -> dict:
        rng = np.random.default_rng((self.seed, self.epoch, idx))
        img_rng = np.random.default_rng((self.seed, idx))
        s = self.staging_size
        image = img_rng.integers(0, 256, (s, s, 3), dtype=np.uint8)
        out = {"image": image, "target": np.int32(self.targets[idx])}
        if self.tokenizer is not None:
            row = self.meta.iloc[idx]
            text = generate_report(
                row,
                is_eval=not self.is_train,
                shuffle=self.is_train,
                dropout=0.1 if self.is_train else 0.0,
                include_target=self.include_target,
                rng=rng,
            )
            out["tokens"] = self.tokenizer(text)[0]
        return out
