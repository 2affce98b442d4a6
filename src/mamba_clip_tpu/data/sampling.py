"""Index-space sampling: imbalance correction + balanced-mixup pairing.

TPU-native redesign of the reference's sampler stack. The reference
rebuilds torch DataLoaders with WeightedRandomSampler /
DistributedWeightedRandomSampler per epoch (reference:
src/mamba_clip/data.py:111-239, src/mamba_clip/sampler.py:13-89). Under
jit, loaders and batch shapes must be static, so sampling is pure **index
generation**: each epoch produces an int array of dataset indices
(optionally a second, class-balanced stream for balanced-mixup), and the
loader materializes fixed-shape batches from them.

- :func:`sampling_probabilities` — modes instance/class/sqrt/cbrt/prog with
  the reference's exponents (q = 0, 1, 0.5, 0.125; prog interpolates
  between instance and class over epochs) (data.py:111-143).
- :func:`weighted_epoch_indices` — with-replacement weighted draw ≡
  WeightedRandomSampler(num_samples=len(dataset)).
- Per-host sharding: every host draws the same global sample (same seed)
  and keeps its contiguous slice — the DistributedWeightedRandomSampler
  equivalent (sampler.py:13-89) without any collective.
- :func:`combo_epoch_indices` — (imbalanced, balanced) index pairs, the
  ComboLoader for balanced-mixup (data.py:170-239).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def sampling_probabilities(
    class_count: np.ndarray,
    mode: str = "instance",
    ep: Optional[int] = None,
    n_eps: Optional[int] = None,
) -> np.ndarray:
    """Per-class inverse-frequency^q weights (reference: data.py:111-143)."""
    class_count = np.asarray(class_count, np.float64)
    if mode == "prog":
        if ep is None or n_eps is None:
            raise ValueError("progressive sampling requires ep and n_eps")
        imbal = (class_count**0 / (class_count**0).sum()) ** -1
        bal = (class_count**1 / (class_count**1).sum()) ** -1
        frac = ep / max(n_eps - 1, 1)
        return (1 - frac) * imbal + frac * bal
    q = {"instance": 0.0, "class": 1.0, "sqrt": 0.5, "cbrt": 0.125}.get(mode)
    if q is None:
        raise ValueError(f"not a valid sampling mode: {mode}")
    rel = class_count**q / (class_count**q).sum()
    return rel**-1


def sample_weights(
    targets: np.ndarray,
    mode: str = "instance",
    ep: Optional[int] = None,
    n_eps: Optional[int] = None,
) -> np.ndarray:
    targets = np.asarray(targets)
    counts = np.unique(targets, return_counts=True)[1]
    probs = sampling_probabilities(counts, mode, ep, n_eps)
    return probs[targets]


def weighted_epoch_indices(
    weights: np.ndarray,
    num_samples: int,
    seed: int,
    epoch: int,
    rank: int = 0,
    world_size: int = 1,
) -> np.ndarray:
    """Weighted with-replacement draw; each host keeps its contiguous shard
    (the DistributedWeightedRandomSampler contract, reference:
    sampler.py:13-89: same seed everywhere, per-rank slice)."""
    rng = np.random.default_rng((seed, epoch))
    p = np.asarray(weights, np.float64)
    p = p / p.sum()
    idx = rng.choice(len(p), size=num_samples, replace=True, p=p)
    per = num_samples // world_size
    return idx[rank * per: (rank + 1) * per]


def shuffled_epoch_indices(
    n: int, seed: int, epoch: int, rank: int = 0, world_size: int = 1
) -> np.ndarray:
    """Plain shuffled epoch ≡ DistributedSampler (reference: data.py:575-577)."""
    rng = np.random.default_rng((seed, epoch))
    idx = rng.permutation(n)
    per = n // world_size
    return idx[rank * per: (rank + 1) * per]


def epoch_indices(
    targets: np.ndarray,
    sampling: Optional[str],
    seed: int,
    epoch: int,
    n_eps: Optional[int] = None,
    rank: int = 0,
    world_size: int = 1,
) -> np.ndarray:
    """Dispatch: None → shuffle; else weighted by mode (the per-epoch
    modify_loader rebuild, reference: data.py:146-167, pipeline.py:430-449)."""
    n = len(targets)
    if sampling is None or sampling == "instance":
        if sampling == "instance":
            w = sample_weights(targets, "instance")
            return weighted_epoch_indices(w, n, seed, epoch, rank, world_size)
        return shuffled_epoch_indices(n, seed, epoch, rank, world_size)
    w = sample_weights(targets, sampling, ep=epoch, n_eps=n_eps)
    return weighted_epoch_indices(w, n, seed, epoch, rank, world_size)


def combo_epoch_indices(
    targets: np.ndarray,
    seed: int,
    epoch: int,
    base_sampling: str = "instance",
    n_eps: Optional[int] = None,
    rank: int = 0,
    world_size: int = 1,
) -> Tuple[np.ndarray, np.ndarray]:
    """(imbalanced, class-balanced) index streams for balanced-mixup
    (reference: get_combo_loader, data.py:170-196)."""
    n = len(targets)
    if base_sampling == "instance":
        imbal = shuffled_epoch_indices(n, seed, epoch, rank, world_size)
    else:
        w = sample_weights(targets, base_sampling, ep=epoch, n_eps=n_eps)
        imbal = weighted_epoch_indices(w, n, seed, epoch, rank, world_size)
    wbal = sample_weights(targets, "class")
    bal = weighted_epoch_indices(wbal, n, seed * 2 + 1, epoch, rank, world_size)
    return imbal, bal
