"""CLI entry point.

Mirrors the reference CLI (reference: src/mamba_clip/cli/main.py:501-513):
parse flags → run pipeline, or dispatch to an HPO driver when
--hyperparameter-tuning is set (optuna/ray, reference:
cli/main.py:504-511). Flag names and semantics match one-for-one; the
parser is generated from the typed Args dataclass (config.py).
"""

from __future__ import annotations

import sys
from typing import List, Optional

from ..config import Args, arg_parser as _arg_parser, parse_args
from ..utils.logging import get_logger

logger = get_logger(__name__)

arg_parser = _arg_parser


def main(argv: Optional[List[str]] = None):
    args = parse_args(argv)
    if args.hyperparameter_tuning:
        if args.hyperparameter_strategy == "optuna":
            from ..integrations.optuna import optuna_pipeline

            return optuna_pipeline(args)
        elif args.hyperparameter_strategy == "ray":
            from ..integrations.ray import ray_tune_pipeline

            return ray_tune_pipeline(args)
        elif args.hyperparameter_strategy == "asha":
            # ray-free native ASHA over the same Trainable lifecycle
            from ..integrations.ray import native_asha_pipeline

            return native_asha_pipeline(args)
        raise ValueError(
            f"unknown hyperparameter strategy: {args.hyperparameter_strategy}"
        )
    from ..pipeline import pipeline

    return pipeline(args)


if __name__ == "__main__":
    main(sys.argv[1:])
