#!/usr/bin/env python
"""Export a trained model as batch-polymorphic StableHLO serving artifacts.

Production entry for mamba_clip_tpu/serving.py: load params from an
orbax checkpoint dir (as written by the training pipeline), export the
serving entry points (CLIP towers or classifier) + params + manifest.

Usage:
    python tools/export_serving.py --out /tmp/serving \
        [--model biomedclip|medmamba|mambavision] \
        [--checkpoint <orbax dir, e.g. .../stage_1_epoch_latest>] \
        [--quant int8_serve] [--num-classes 2] [--image-size 224] \
        [--platforms tpu cpu]

Without --checkpoint it exports fresh-init params (smoke/testing).
Round-trip check: ``load_serving(out)`` then call each entry point.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--model", default="biomedclip")
    p.add_argument("--checkpoint", default=None,
                   help="orbax checkpoint dir to load params from")
    p.add_argument("--quant", default=None,
                   help="int8_serve recommended for serving (ops/qdot.py)")
    p.add_argument("--num-classes", type=int, default=2)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--context-length", type=int, default=256)
    p.add_argument("--precision", default="amp")
    p.add_argument("--platforms", nargs="*", default=None,
                   help="lowering targets (default: current backend)")
    p.add_argument("--data-shards", type=int, default=1,
                   help="export data-parallel over an N-device mesh "
                        "(batch dim becomes N*b)")
    p.add_argument("--tokenizer", default=None,
                   help="local tokenizer dir/vocab.txt to ship with the "
                        "artifact (text serving needs it host-side)")
    p.add_argument("--compress-weights", action="store_true",
                   help="store large Dense kernels per-column int8 in "
                        "params.msgpack (~4x smaller; exact under "
                        "int8_serve, see serving.py compression notes)")
    p.add_argument("--scan-impl", default=None,
                   help="selective-scan impl for VSSM exports: default "
                        "(per-backend), or 'xla' for a portable artifact "
                        "(Pallas/Mosaic lowering needs a TPU host)")
    p.add_argument("--clip", action="store_true",
                   help="export CLIP tower entry points (image_embed/"
                        "text_embed) for mamba-family names, which "
                        "otherwise resolve to the classifier zoo — use "
                        "for a stage-1 '--model medmamba' run's "
                        "VSSM-towered CLIP checkpoint")
    a = p.parse_args()

    from mamba_clip_tpu.serving import export_serving, make_serving_fns

    kw = dict(quant=a.quant, num_classes=a.num_classes,
              image_size=a.image_size, context_length=a.context_length,
              precision=a.precision, scan_impl=a.scan_impl, is_clip=a.clip)

    variables = None
    if a.checkpoint:
        from mamba_clip_tpu.checkpoint import load_params_only

        _, init_vars, _, _ = make_serving_fns(a.model, **kw)
        params, batch_stats = load_params_only(
            os.path.abspath(a.checkpoint), init_vars["params"])
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats

    manifest = export_serving(
        a.out, a.model, variables=variables, data_shards=a.data_shards,
        tokenizer=a.tokenizer, compress_weights=a.compress_weights,
        platforms=tuple(a.platforms) if a.platforms else None, **kw)
    total = sum(os.path.getsize(os.path.join(a.out, f))
                for f in os.listdir(a.out))
    print(f"exported {sorted(manifest['entry_points'])} for "
          f"{manifest['platforms']} to {a.out} ({total / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
