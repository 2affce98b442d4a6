"""Serving export: batch-polymorphic StableHLO artifacts via ``jax.export``.

The reference's deployment story is "re-run eval's forward under
``torch.no_grad()``" inside the training codebase (reference:
src/mamba_clip/eval.py:104-150) — there is no exportable artifact. The
XLA-native equivalent is ``jax.export``: serialize the jitted forward
(with the fused on-device eval preprocess, ops/preprocess.py) as
versioned, batch-polymorphic StableHLO that any JAX process — or a
PjRT-embedding C++ server — can reload and run without this package's
model code on the import path.

Artifacts written by :func:`export_serving` into ``out_dir``:

- ``<fn>.stablehlo``    — serialized ``jax.export.Exported`` per entry
  point (``image_embed`` / ``text_embed`` for CLIP, ``classify`` for the
  classifier zoo), each taking ``(params, input)`` with a symbolic batch
  dimension.
- ``params.msgpack``    — the parameter pytree (flax serialization).
- ``manifest.json``     — model name, entry points, input specs, quant
  mode, and preprocessing config, so a server can validate its feed.

Quantized serving composes: pass ``quant="int8_serve"`` (per-channel
weight scales, ops/qdot.py) and the exported graph carries the int8
MXU dots.

Round-trip loader: :func:`load_serving` — used by the tests and usable
as a minimal in-process server.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

_MANIFEST = "manifest.json"
_PARAMS = "params.msgpack"

# ---------------------------------------------------------------------------
# int8 weight compression for the params artifact (--compress-weights)
# ---------------------------------------------------------------------------
#
# Dense kernels dominate the parameter bytes; storing them as per-output-
# channel int8 + one fp32 scale per column shrinks params.msgpack ~4x.
# Compression is a STORAGE format only: the exported StableHLO keeps its
# float parameter signature and load_serving dequantizes on load, so any
# exported module works unchanged.
#
# Numerics: for kernels consumed by the injected ``--quant int8_serve``
# dots the round trip is EXACT — absmax requantization of q*s recovers the
# same int8 values (the per-column max quantizes to ±127 by construction,
# so the recomputed scale equals s) — i.e. a compressed int8_serve
# artifact serves bit-identical results. Kernels outside the injection
# (the fp32 projection heads) carry one per-column int8 rounding
# (~0.4% relative), bounded by the model-level closeness test.

_COMPRESS_KEY = "__int8_cols__"
_COMPRESS_MIN_ELEMS = 1 << 16


def _compress_2d(w, axis):
    """Symmetric int8 with one scale per slice along ``axis``'s complement
    (axis=0: per-column scales for [K, N] kernels; axis=1: per-row scales
    for [V, D] embedding tables)."""
    import numpy as np

    w = np.asarray(jax.device_get(w))
    amax = np.max(np.abs(w.astype(np.float32)), axis=axis, keepdims=True)
    scale = (np.maximum(amax, 1e-6) / 127.0).astype(np.float32)
    q = np.clip(np.round(w.astype(np.float32) / scale), -127, 127)
    return {
        _COMPRESS_KEY: q.astype(np.int8),
        "scale": scale,
        "proto": np.zeros((0,), w.dtype),  # carries the original dtype
    }


def _decompress_kernel(d):
    import numpy as np

    q = np.asarray(d[_COMPRESS_KEY], np.float32)
    return (q * np.asarray(d["scale"], np.float32)).astype(d["proto"].dtype)


def compress_params(variables, min_elems: int = _COMPRESS_MIN_ELEMS):
    """Replace large 2-D Dense kernels (per-column scales) and embedding
    tables (per-row scales — each token row keeps its own dynamic range)
    with int8 + scales."""

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if (k in ("kernel", "embedding") and hasattr(v, "ndim")
                        and v.ndim == 2
                        and jnp.issubdtype(v.dtype, jnp.floating)
                        and v.size >= min_elems):
                    out[k] = _compress_2d(v, axis=0 if k == "kernel" else 1)
                else:
                    out[k] = walk(v)
            return out
        return node

    return walk(variables)


def decompress_params(variables):
    """Inverse of :func:`compress_params` (idempotent on raw trees)."""

    def walk(node):
        if isinstance(node, dict):
            if _COMPRESS_KEY in node:
                return _decompress_kernel(node)
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(variables)


def _eval_prep(tcfg, compute_dtype):
    from .ops.preprocess import eval_preprocess

    def prep(image_u8):
        return eval_preprocess(
            image_u8, out_size=tcfg.image_size, mean=tcfg.mean,
            std=tcfg.std, out_dtype=compute_dtype,
            interpolation=tcfg.interpolation or "bilinear",
        )

    return prep


def make_serving_fns(
    model_name: str = "biomedclip",
    *,
    is_clip: bool = False,
    num_classes: int = 2,
    quant: Optional[str] = None,
    scan_impl: Optional[str] = None,
    precision: str = "amp",
    image_size: int = 224,
    staging_size: Optional[int] = None,
    context_length: int = 256,
    vocab_size: int = 30522,
    rng: Optional[jax.Array] = None,
):
    """Build (model, init params, {entry_point: fn(params, x)}) for serving.

    Entry points take raw ``uint8 [B, staging, staging, 3]`` images (the
    host JPEG-decode wire format) or ``int32 [B, context]`` tokens, run
    the fused eval preprocess + forward, and return fp32 outputs:
    L2-normalized embeddings for the CLIP towers, class probabilities for
    the classifier zoo (reference: src/mamba_clip/eval.py:104-150).
    """
    from .data.preprocess_cfg import get_transform_config
    from .models import build_classifier, build_clip
    from .utils.precision import get_policy

    if quant in ("int8_delayed", "int8_delayed_attn"):
        raise ValueError(
            f"--quant {quant} is a TRAINING mode (its scales live in "
            "mutable model state); export serving artifacts with "
            "--quant int8_serve (per-channel weight scales) instead — "
            "checkpoints trained under int8_delayed load fine either way"
        )
    policy = get_policy(precision)
    tcfg = get_transform_config(None, image_size, is_train=False)
    prep = _eval_prep(tcfg, policy.compute_dtype)
    rng = jax.random.PRNGKey(0) if rng is None else rng

    def _init_on_host(init_fn, *a, **k):
        """Run model.init with the host CPU as default device.

        Export only LOWERS the entry points (nothing executes on an
        accelerator), but serializing params that model.init placed on
        the device costs a full device→host transfer — ~780 MB for the
        flagship CLIP, minutes over a tunneled TPU. Keep fresh-init
        params host-side; checkpoint-loaded variables come in via the
        ``variables`` argument and never hit this path.

        Falls back to the default device when the CPU attempt fails —
        e.g. a VSSM whose Pallas scan (chosen per the DEFAULT backend)
        cannot lower for the CPU platform. init is pure, so the retry
        is safe."""
        try:
            cpu = jax.local_devices(backend="cpu")[0]
            with jax.default_device(cpu):
                return init_fn(*a, **k)
        except Exception:
            return init_fn(*a, **k)

    # Mamba-family names default to the classifier zoo (the reference's
    # init_model("medmamba") path); is_clip=True exports the tower entry
    # points of a VSSM-towered CLIP instead (stage-1 --model medmamba
    # mirrors models.init_model(..., is_clip=True)).
    if not is_clip and (
        model_name in (None, "vssm", "medmamba") or "mamba" in str(model_name)
    ):
        model = build_classifier(
            model_name, num_classes=num_classes,
            dtype=policy.compute_dtype, quant=quant, scan_impl=scan_impl,
        )
        variables = _init_on_host(
            model.init,
            {"params": rng},
            jnp.zeros((2, image_size, image_size, 3), policy.compute_dtype),
        )

        def classify(variables, image_u8):
            logits = model.apply(variables, prep(image_u8),
                                 deterministic=True)
            return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

        fns = {"classify": classify}
    else:
        model = build_clip(
            model_name=model_name, image_size=image_size,
            context_length=context_length, vocab_size=vocab_size,
            dtype=policy.compute_dtype, quant=quant, scan_impl=scan_impl,
        )
        variables = _init_on_host(
            model.init,
            {"params": rng, "dropout": rng},
            image=jnp.zeros((2, image_size, image_size, 3),
                            policy.compute_dtype),
            text=jnp.zeros((2, context_length), jnp.int32),
        )

        def image_embed(variables, image_u8):
            feats = model.apply(
                variables, image=prep(image_u8), method=model.encode_image,
                normalize=True, deterministic=True)
            return feats.astype(jnp.float32)

        def text_embed(variables, tokens):
            feats = model.apply(
                variables, text=tokens, method=model.encode_text,
                normalize=True, deterministic=True)
            return feats.astype(jnp.float32)

        fns = {"image_embed": image_embed, "text_embed": text_embed}

    meta = {
        "model": model_name,
        "quant": quant,
        "precision": precision,
        "image_size": image_size,
        "staging_size": staging_size or tcfg.staging_size,
        "context_length": context_length,
        "vocab_size": vocab_size,
        "num_classes": num_classes,
        "mean": list(tcfg.mean),
        "std": list(tcfg.std),
    }
    return model, variables, fns, meta


def export_serving(
    out_dir: str,
    model_name: str = "biomedclip",
    *,
    variables: Optional[Any] = None,
    platforms: Optional[tuple] = None,
    data_shards: int = 1,
    tokenizer: Optional[str] = None,
    compress_weights: bool = False,
    **kw,
) -> Dict[str, Any]:
    """Export batch-polymorphic serving graphs + params to ``out_dir``.

    ``variables``: trained variables (e.g. from checkpoint.load_params_only
    wrapped as {"params": ...}); defaults to fresh init (tests, smoke).
    ``platforms``: lowering targets, e.g. ("tpu",) or ("cpu", "tpu");
    defaults to the current default backend.
    ``tokenizer``: a local vocab path ships WITH the artifact (text
    serving needs host-side tokenization; the vocab is copied into
    ``out_dir`` and recorded in the manifest). Any other value records
    the deterministic hash tokenizer.
    ``compress_weights``: store large Dense kernels per-column int8 in
    ``params.msgpack`` (~4x smaller artifact; exact under int8_serve —
    see the compression notes above). Storage-only: the StableHLO keeps
    its float signature and ``load_serving`` dequantizes on load.
    ``data_shards``: >1 exports a DATA-PARALLEL serving graph — params
    replicated, batch sharded over a ``data_shards``-device mesh (the
    batch dim becomes ``data_shards*b``, so any multiple works). The
    loading process must have at least that many devices; embedding
    serving is embarrassingly parallel so this is the whole multi-chip
    story (no cross-device collectives in the forward).
    """
    from flax import serialization
    from jax import export as jexport

    model, init_vars, fns, meta = make_serving_fns(model_name, **kw)
    variables = init_vars if variables is None else variables

    os.makedirs(out_dir, exist_ok=True)
    if data_shards > 1:
        # batch = data_shards * b: divisibility by the mesh's data axis is
        # part of the exported calling convention, not a runtime check.
        (b,) = jexport.symbolic_shape(f"{data_shards}*b")
    else:
        (b,) = jexport.symbolic_shape("b")
    var_spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), variables)
    in_specs = {
        "classify": jax.ShapeDtypeStruct(
            (b, meta["staging_size"], meta["staging_size"], 3), jnp.uint8),
        "image_embed": jax.ShapeDtypeStruct(
            (b, meta["staging_size"], meta["staging_size"], 3), jnp.uint8),
        "text_embed": jax.ShapeDtypeStruct(
            (b, meta["context_length"]), jnp.int32),
    }

    jit_kw = {}
    if data_shards > 1:
        from .parallel.mesh import (
            MeshSpec, create_mesh, data_sharding, replicated)

        mesh = create_mesh(MeshSpec(data=data_shards),
                           devices=jax.devices()[:data_shards])
        jit_kw = dict(in_shardings=(replicated(mesh), data_sharding(mesh)),
                      out_shardings=data_sharding(mesh))

    entry_points = {}
    for name, fn in fns.items():
        exp = jexport.export(
            jax.jit(fn, **jit_kw),
            platforms=list(platforms) if platforms else None,
        )(var_spec, in_specs[name])
        path = os.path.join(out_dir, f"{name}.stablehlo")
        with open(path, "wb") as f:
            f.write(exp.serialize())
        entry_points[name] = {
            "file": f"{name}.stablehlo",
            "input_shape": [str(d) for d in in_specs[name].shape],
            "input_dtype": str(in_specs[name].dtype),
        }

    stored = jax.device_get(variables)
    if compress_weights:
        stored = compress_params(stored)
    with open(os.path.join(out_dir, _PARAMS), "wb") as f:
        f.write(serialization.to_bytes(stored))

    tok_meta: Dict[str, Any] = {"type": "hash",
                                "context_length": meta["context_length"]}
    if tokenizer and os.path.exists(tokenizer):
        import shutil

        tok_dir = os.path.join(out_dir, "tokenizer")
        os.makedirs(tok_dir, exist_ok=True)
        if os.path.isdir(tokenizer):  # HF tokenizer dir: ship its files
            for fname in os.listdir(tokenizer):
                src = os.path.join(tokenizer, fname)
                if os.path.isfile(src):  # HF saves can nest dirs; skip them
                    shutil.copyfile(src, os.path.join(tok_dir, fname))
        else:  # bare vocab.txt: synthesize the minimal BERT config
            shutil.copyfile(tokenizer, os.path.join(tok_dir, "vocab.txt"))
            with open(os.path.join(tok_dir, "tokenizer_config.json"),
                      "w") as f:
                json.dump({"tokenizer_class": "BertTokenizer",
                           "do_lower_case": True}, f)
        tok_meta = {"type": "wordpiece", "dir": "tokenizer",
                    "context_length": meta["context_length"]}

    manifest = dict(meta, entry_points=entry_points,
                    data_shards=data_shards,
                    weights="int8_cols" if compress_weights else "raw",
                    tokenizer=tok_meta,
                    platforms=list(platforms) if platforms else
                    [jax.default_backend()])
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def load_serving(out_dir: str) -> Dict[str, Any]:
    """Reload an exported serving dir → {entry_point: fn(input) -> fp32}.

    The returned callables close over the restored params; inputs are the
    wire formats documented in the manifest. This is the minimal
    in-process server; a production host would hand the same artifacts to
    a PjRT runtime.
    """
    from flax import serialization
    from jax import export as jexport

    with open(os.path.join(out_dir, _MANIFEST)) as f:
        manifest = json.load(f)
    with open(os.path.join(out_dir, _PARAMS), "rb") as f:
        variables = serialization.msgpack_restore(f.read())
    if manifest.get("weights") == "int8_cols":
        variables = decompress_params(variables)

    shards = int(manifest.get("data_shards", 1))
    if shards > 1:
        # A multi-device export must be invoked from a matching sharded
        # context: rebuild the data mesh and jit the call with the
        # export-time shardings (params replicated, batch data-sharded).
        from .parallel.mesh import (
            MeshSpec, create_mesh, data_sharding, replicated)

        mesh = create_mesh(MeshSpec(data=shards),
                           devices=jax.devices()[:shards])
        variables = jax.device_put(variables, replicated(mesh))

        def wrap(e):
            return jax.jit(
                e.call,
                in_shardings=(replicated(mesh), data_sharding(mesh)),
                out_shardings=data_sharding(mesh),
            )
    else:
        # Put params on device ONCE at load. Exported.call takes them as
        # a per-call argument; host numpy params would ride the dispatch
        # path (and any transfer is catastrophic on tunneled backends —
        # the flagship tree is ~780 MB at ~45 MB/s here).
        variables = jax.device_put(variables)

        def wrap(e):
            return e.call

    fns = {}
    for name, ep in manifest["entry_points"].items():
        with open(os.path.join(out_dir, ep["file"]), "rb") as f:
            exp = jexport.deserialize(f.read())
        fns[name] = (lambda c: lambda x: c(variables, x))(wrap(exp))

    # Convenience when this package is importable: a text -> token-ids
    # callable matching the artifact's tokenizer (a package-free host
    # reads manifest["tokenizer"] and brings its own WordPiece).
    tok = manifest.get("tokenizer") or {}
    if "text_embed" in fns:
        from .data.tokenizer import get_tokenizer

        name_or_path = (os.path.join(out_dir, tok["dir"])
                        if tok.get("type") == "wordpiece" else "hash")
        fns["tokenize"] = get_tokenizer(
            name_or_path,
            context_length=int(tok.get("context_length", 256)),
            require_real=tok.get("type") == "wordpiece")
    return {"manifest": manifest, **fns}
