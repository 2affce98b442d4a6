"""wandb sink, gated on availability.

The reference logs to wandb when ``--report-to wandb``
(reference: src/mamba_clip/pipeline.py:46-65 init_wandb,
train.py:377-380, eval.py:166-176). wandb is optional here: when the
package is missing every call is a no-op and a one-time warning is
emitted, so runs never fail on a missing logging backend.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

from .logging import get_logger, warning_once

logger = get_logger(__name__)

_wandb = None
_checked = False


def _get():
    global _wandb, _checked
    if not _checked:
        _checked = True
        try:
            import wandb as w

            _wandb = w
        except ImportError:
            _wandb = None
    return _wandb


def available() -> bool:
    return _get() is not None


def init_wandb(args, run_state, params: Optional[Dict[str, Any]] = None):
    """reference: pipeline.py:46-65."""
    w = _get()
    if w is None:
        warning_once(logger, "wandb requested via --report-to but not installed")
        return None
    return w.init(
        project=args.wandb_project_name,
        name=run_state.name,
        notes=args.wandb_notes,
        config=args.to_dict(),
        resume="auto" if args.resume else None,
    )


def log(data: Dict[str, Any], step: Optional[int] = None) -> None:
    w = _get()
    if w is not None and w.run is not None:
        w.log(data, step=step)


def finish() -> None:
    w = _get()
    if w is not None and w.run is not None:
        w.finish()
