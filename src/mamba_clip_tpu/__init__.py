"""mamba-clip-tpu: TPU-native two-stage CLIP + Mamba-vision framework.

A from-scratch JAX/XLA/Pallas re-design of psmyth94/mamba-clip's
capabilities: stage-1 CLIP-style contrastive fine-tuning (ViT-B/16 +
PubMedBERT-shaped towers, or a VSSM/MedMamba vision tower backed by a
Pallas selective-scan kernel) on ISIC-2024 (image, clinical report) pairs,
and stage-2 malignancy classification over frozen CLIP features, with the
ISIC pAUC-above-80%-TPR metric, Orbax checkpointing, device-mesh data
parallelism, and fused on-device preprocessing.
"""

__version__ = "0.1.0"

from .config import Args, RunState, arg_parser, parse_args

__all__ = [
    "Args", "RunState", "arg_parser", "parse_args", "__version__",
    # lazily re-exported (see __getattr__): pipeline, models, losses, ...
]

_LAZY = {
    "pipeline": ".pipeline",
    "losses": ".losses",
    "schedules": ".schedules",
    "optim": ".optim",
    "checkpoint": ".checkpoint",
    "models": ".models",
    "ops": ".ops",
    "data": ".data",
    "parallel": ".parallel",
    "train": ".train",
    "eval": ".eval",
}


def __getattr__(name):
    """Lazy submodule access (keeps `import mamba_clip_tpu` light — no jax
    import until a compute module is touched)."""
    if name in _LAZY:
        import importlib

        return importlib.import_module(_LAZY[name], __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
