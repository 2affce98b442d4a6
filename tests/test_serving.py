"""Serving export (mamba_clip_tpu/serving.py): batch-polymorphic
StableHLO artifacts round-trip through jax.export.

The reference has no export story (deployment = rerun eval.py's forward
under no_grad, reference: src/mamba_clip/eval.py:104-150); these tests
pin the TPU-native one: export → serialized bytes on disk → deserialize
in a loader that has only the artifacts → same outputs as direct
model.apply, at batch sizes never seen at export time.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamba_clip_tpu.serving import export_serving, load_serving, make_serving_fns


def _tiny_clip_kw():
    return dict(image_size=32, context_length=16, precision="fp32")


def test_clip_export_roundtrip(tmp_path):
    out = str(tmp_path / "clip_serving")
    manifest = export_serving(out, "biomedclip", **_tiny_clip_kw())
    assert set(manifest["entry_points"]) == {"image_embed", "text_embed"}
    assert os.path.exists(os.path.join(out, "image_embed.stablehlo"))
    assert os.path.exists(os.path.join(out, "params.msgpack"))
    with open(os.path.join(out, "manifest.json")) as f:
        assert json.load(f)["image_size"] == 32

    served = load_serving(out)
    staging = manifest["staging_size"]
    r = np.random.default_rng(0)
    # batch sizes unseen at export: the symbolic dim must generalize
    for b in (1, 5):
        img = jnp.asarray(
            r.integers(0, 256, (b, staging, staging, 3), dtype=np.uint8))
        feats = np.asarray(served["image_embed"](img))
        assert feats.shape == (b, 512)
        np.testing.assert_allclose(
            np.linalg.norm(feats, axis=-1), 1.0, rtol=1e-3)
    tok = jnp.asarray(r.integers(4, 64, (3, 16), dtype=np.int32))
    tfeats = np.asarray(served["text_embed"](tok))
    assert tfeats.shape == (3, 512)


def test_export_matches_direct_apply(tmp_path):
    """The exported graph computes exactly what the in-process fns do,
    with the params that were serialized alongside it."""
    out = str(tmp_path / "clip_serving")
    model, variables, fns, meta = make_serving_fns(
        "biomedclip", **_tiny_clip_kw())
    export_serving(out, "biomedclip", variables=variables, **_tiny_clip_kw())
    served = load_serving(out)

    r = np.random.default_rng(1)
    img = jnp.asarray(
        r.integers(0, 256, (4, meta["staging_size"], meta["staging_size"], 3),
                   dtype=np.uint8))
    direct = np.asarray(fns["image_embed"](variables, img))
    loaded = np.asarray(served["image_embed"](img))
    # atol: the exported executable and the eager apply are different
    # fp32 programs (XLA fusion changes summation order); ~1e-5 noise on
    # unit-norm embeddings is rounding, not a parameter/graph mismatch
    # (checkpoint/serialization round-trips are verified bit-exact).
    np.testing.assert_allclose(loaded, direct, atol=5e-5)


def test_classifier_export_roundtrip(tmp_path):
    out = str(tmp_path / "cls_serving")
    manifest = export_serving(
        out, "medmamba", num_classes=3, image_size=32, precision="fp32")
    assert set(manifest["entry_points"]) == {"classify"}
    served = load_serving(out)
    r = np.random.default_rng(2)
    staging = manifest["staging_size"]
    img = jnp.asarray(
        r.integers(0, 256, (2, staging, staging, 3), dtype=np.uint8))
    probs = np.asarray(served["classify"](img))
    assert probs.shape == (2, 3)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)


def test_export_tool_loads_checkpoint_params(tmp_path, monkeypatch):
    """tools/export_serving.py --checkpoint: params restored from an orbax
    checkpoint land in the artifact (exported output matches direct apply
    with the TRAINED params, not the tool's fresh init)."""
    import types

    from mamba_clip_tpu.checkpoint import save_checkpoint, wait_for_checkpoints

    model, variables, fns, meta = make_serving_fns(
        "biomedclip", **_tiny_clip_kw())
    # perturb from init so a fresh-init export could not match
    trained = jax.tree.map(lambda x: x + 0.01, variables["params"])
    state = types.SimpleNamespace(
        params=trained, opt_state={"none": jnp.zeros(())},
        batch_stats={}, step=7)
    ckpt = save_checkpoint(str(tmp_path / "ck"), state, epoch=1, block=True)
    wait_for_checkpoints()

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "export_serving_tool",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "export_serving.py"))
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)
    out = str(tmp_path / "served")
    monkeypatch.setattr("sys.argv", [
        "export_serving.py", "--out", out, "--checkpoint", ckpt,
        "--image-size", "32", "--context-length", "16",
        "--precision", "fp32"])
    tool.main()

    served = load_serving(out)
    r = np.random.default_rng(4)
    img = jnp.asarray(
        r.integers(0, 256, (2, meta["staging_size"], meta["staging_size"], 3),
                   dtype=np.uint8))
    direct = np.asarray(fns["image_embed"]({"params": trained}, img))
    # atol: see test_export_matches_direct_apply — different fp32
    # executables, rounding-level disagreement only. A fresh-init export
    # (the bug this guards against) differs at O(1), not O(1e-5): the
    # params were perturbed by +0.01 everywhere.
    np.testing.assert_allclose(
        np.asarray(served["image_embed"](img)), direct, atol=5e-5)


def test_cross_platform_export(tmp_path):
    """platforms=("cpu","tpu") lowers one artifact for both targets from a
    CPU-only process (deploy-for-TPU without holding the chip); it still
    executes on the CPU side of the multi-platform module."""
    out = str(tmp_path / "xplat")
    manifest = export_serving(out, "biomedclip", platforms=("cpu", "tpu"),
                              **_tiny_clip_kw())
    assert manifest["platforms"] == ["cpu", "tpu"]
    served = load_serving(out)
    st = manifest["staging_size"]
    img = jnp.asarray(np.random.default_rng(6).integers(
        0, 256, (2, st, st, 3), dtype=np.uint8))
    assert np.asarray(served["image_embed"](img)).shape == (2, 512)


def test_tokenizer_ships_with_artifact(tmp_path):
    """A local vocab ships inside the artifact dir; the loader exposes a
    text->ids callable whose output feeds text_embed end-to-end. Without
    a vocab the manifest records the hash tokenizer."""
    vocab = tmp_path / "vocab.txt"
    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "the", "lesion",
             "patient", "a", "is", "mm", "##s", "of", "on", "torso", "male"]
    vocab.write_text("\n".join(words) + "\n")

    out = str(tmp_path / "with_tok")
    manifest = export_serving(out, "biomedclip", tokenizer=str(vocab),
                              image_size=32, context_length=16,
                              precision="fp32", vocab_size=len(words))
    assert manifest["tokenizer"]["type"] == "wordpiece"
    assert os.path.exists(os.path.join(out, "tokenizer", "vocab.txt"))

    served = load_serving(out)
    ids = served["tokenize"](["the lesion is on the torso", "patient"])
    assert ids.shape == (2, 16)
    assert ids.max() < len(words)
    feats = np.asarray(served["text_embed"](jnp.asarray(ids)))
    assert feats.shape == (2, 512)
    np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0,
                               rtol=1e-3)

    out2 = str(tmp_path / "no_tok")
    m2 = export_serving(out2, "biomedclip", **_tiny_clip_kw())
    assert m2["tokenizer"]["type"] == "hash"
    assert load_serving(out2)["tokenize"]("a report").shape == (1, 16)


def test_data_parallel_export(tmp_path):
    """data_shards=8: the exported graph shards the batch over an 8-device
    data mesh (params replicated) and matches the single-device export."""
    _, variables, _, meta = make_serving_fns("biomedclip", **_tiny_clip_kw())
    out1 = str(tmp_path / "dp1")
    out8 = str(tmp_path / "dp8")
    export_serving(out1, "biomedclip", variables=variables, **_tiny_clip_kw())
    manifest = export_serving(out8, "biomedclip", variables=variables,
                              data_shards=8, **_tiny_clip_kw())
    assert manifest["data_shards"] == 8
    assert manifest["entry_points"]["image_embed"]["input_shape"][0] == "8*b"

    r = np.random.default_rng(5)
    img = jnp.asarray(
        r.integers(0, 256, (16, meta["staging_size"], meta["staging_size"], 3),
                   dtype=np.uint8))
    ref = np.asarray(load_serving(out1)["image_embed"](img))
    dp = np.asarray(load_serving(out8)["image_embed"](img))
    np.testing.assert_allclose(dp, ref, atol=5e-5)

    # batch not divisible by the mesh → the exported convention rejects it
    bad = img[:10]
    with pytest.raises(Exception):
        load_serving(out8)["image_embed"](bad)


def test_quantized_export_carries_int8(tmp_path):
    """int8_serve survives export: the serialized module contains int8
    dots and the reloaded outputs differ from the unquantized export of
    the same params (quantization engaged), while staying close."""
    out_q = str(tmp_path / "q")
    out_f = str(tmp_path / "f")
    _, variables, _, meta = make_serving_fns("biomedclip", **_tiny_clip_kw())
    export_serving(out_q, "biomedclip", variables=variables,
                   quant="int8_serve", **_tiny_clip_kw())
    export_serving(out_f, "biomedclip", variables=variables,
                   **_tiny_clip_kw())

    from jax import export as jexport
    with open(os.path.join(out_q, "image_embed.stablehlo"), "rb") as f:
        exp = jexport.deserialize(f.read())
    assert "i8" in exp.mlir_module()

    r = np.random.default_rng(3)
    img = jnp.asarray(
        r.integers(0, 256, (2, meta["staging_size"], meta["staging_size"], 3),
                   dtype=np.uint8))
    q = np.asarray(load_serving(out_q)["image_embed"](img))
    f_ = np.asarray(load_serving(out_f)["image_embed"](img))
    assert not np.array_equal(q, f_)
    assert np.max(np.abs(q - f_)) < 0.2


def test_weight_compression_roundtrip_lemma():
    """Per-column int8 compression: dequantize→requantize recovers the
    IDENTICAL int8 values and scales (the per-column max quantizes to
    ±127, so the recomputed absmax scale equals the stored one). This is
    what makes a compressed int8_serve artifact serve the same dots."""
    from mamba_clip_tpu.serving import (
        _COMPRESS_KEY, compress_params, decompress_params)

    r = np.random.default_rng(0)
    w = (r.normal(size=(256, 96)).astype(np.float32)
         * r.uniform(0.01, 3.0, size=(96,)).astype(np.float32))
    tree = {"layer": {"kernel": w, "bias": np.zeros(96, np.float32)}}
    comp = compress_params(tree, min_elems=0)
    d = comp["layer"]["kernel"]
    assert d[_COMPRESS_KEY].dtype == np.int8
    assert np.array_equal(comp["layer"]["bias"], tree["layer"]["bias"])

    deq = decompress_params(comp)["layer"]["kernel"]
    assert deq.dtype == w.dtype
    # quantization error bounded by half a step per element
    assert np.max(np.abs(deq - w) / d["scale"][None, :]) <= 0.5 + 1e-3

    recomp = compress_params(
        {"layer": {"kernel": deq}}, min_elems=0)["layer"]["kernel"]
    np.testing.assert_array_equal(recomp[_COMPRESS_KEY], d[_COMPRESS_KEY])
    np.testing.assert_allclose(recomp["scale"], d["scale"], rtol=1e-6)

    # embedding tables compress with PER-ROW scales (each token row keeps
    # its own dynamic range)
    emb = (r.normal(size=(64, 32)).astype(np.float32)
           * r.uniform(0.01, 3.0, size=(64, 1)).astype(np.float32))
    cemb = compress_params({"tok": {"embedding": emb}},
                           min_elems=0)["tok"]["embedding"]
    assert cemb["scale"].shape == (64, 1)
    demb = decompress_params({"tok": {"embedding": cemb}})["tok"]["embedding"]
    assert np.max(np.abs(demb - emb) / cemb["scale"]) <= 0.5 + 1e-3

    # below the size threshold nothing is touched (default threshold)
    comp_default = compress_params(tree)
    assert isinstance(comp_default["layer"]["kernel"], np.ndarray)


def test_compressed_export_smaller_and_close(tmp_path):
    """--compress-weights: params.msgpack shrinks >2x and the reloaded
    int8_serve artifact serves near-identical embeddings (exact through
    every injected int8 dot; one extra int8 rounding on the fp32
    projection heads)."""
    out_raw = str(tmp_path / "raw")
    out_c = str(tmp_path / "comp")
    kw = dict(_tiny_clip_kw(), quant="int8_serve")
    _, variables, _, meta = make_serving_fns("biomedclip", **kw)
    export_serving(out_raw, "biomedclip", variables=variables, **kw)
    manifest = export_serving(out_c, "biomedclip", variables=variables,
                              compress_weights=True, **kw)
    assert manifest["weights"] == "int8_cols"

    size_raw = os.path.getsize(os.path.join(out_raw, "params.msgpack"))
    size_c = os.path.getsize(os.path.join(out_c, "params.msgpack"))
    assert size_c < 0.35 * size_raw, (size_raw, size_c)

    s_raw = load_serving(out_raw)
    s_c = load_serving(out_c)
    r = np.random.default_rng(7)
    img = jnp.asarray(
        r.integers(0, 256, (3, meta["staging_size"], meta["staging_size"], 3),
                   dtype=np.uint8))
    tok = jnp.asarray(r.integers(4, 64, (3, 16), dtype=np.int32))
    for name, x in (("image_embed", img), ("text_embed", tok)):
        a = np.asarray(s_raw[name](x))
        b = np.asarray(s_c[name](x))
        cos = np.sum(a * b, axis=-1)  # embeddings are L2-normalized
        assert np.all(cos > 0.999), (name, cos)


def test_bench_infer_artifact_mode(tmp_path, monkeypatch, capsys):
    """tools/bench_infer.py --artifact: benchmarks every entry point of an
    exported dir through serving.load_serving — the closed loop
    export → reload → measure."""
    import importlib.util

    out = str(tmp_path / "art")
    export_serving(out, "biomedclip", compress_weights=True,
                   **_tiny_clip_kw())

    monkeypatch.setenv("BENCH_INFER_BATCH", "2")
    monkeypatch.setenv("BENCH_INFER_STEPS", "2")
    monkeypatch.setenv("BENCH_INFER_WARMUP", "1")
    spec = importlib.util.spec_from_file_location(
        "bench_infer_tool",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "bench_infer.py"))
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)
    monkeypatch.setattr("sys.argv", ["bench_infer.py", "--artifact", out])
    tool.main()

    lines = [json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines()]
    metrics = {ln["metric"] for ln in lines}
    assert metrics == {"infer_artifact_image_embed_images_per_sec_per_chip",
                       "infer_artifact_text_embed_images_per_sec_per_chip"}
    assert all(ln["value"] > 0 for ln in lines)


def test_http_serving_host(tmp_path):
    """tools/serve_http.py: JPEG bytes over HTTP → embedding from the
    exported artifact, via the same native-decode staging path as
    training; /embed_text goes through the artifact's tokenizer."""
    import importlib.util
    import threading
    import urllib.request

    from PIL import Image

    out = str(tmp_path / "art")
    # quantized + compressed: the full production-artifact composition
    export_serving(out, "biomedclip", quant="int8_serve",
                   compress_weights=True, **_tiny_clip_kw())

    spec = importlib.util.spec_from_file_location(
        "serve_http_tool",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "serve_http.py"))
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)

    srv = tool.make_server(out, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        with urllib.request.urlopen(f"{base}/healthz") as r:
            health = json.loads(r.read())
        assert health["status"] == "ok"
        assert "image_embed" in health["manifest"]["entry_points"]

        rimg = np.random.default_rng(0).integers(
            0, 256, (40, 56, 3), dtype=np.uint8)
        buf = __import__("io").BytesIO()
        Image.fromarray(rimg).save(buf, format="JPEG")
        req = urllib.request.Request(
            f"{base}/embed_image", data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req) as r:
            emb = np.asarray(json.loads(r.read())["embedding"])
        assert emb.shape == (512,)
        np.testing.assert_allclose(np.linalg.norm(emb), 1.0, rtol=1e-3)

        req = urllib.request.Request(
            f"{base}/embed_text",
            data=json.dumps({"texts": ["a lesion", "torso"]}).encode(),
            method="POST")
        with urllib.request.urlopen(req) as r:
            embs = np.asarray(json.loads(r.read())["embeddings"])
        assert embs.shape == (2, 512)

        # unknown route → structured 404
        req = urllib.request.Request(
            f"{base}/classify", data=buf.getvalue(), method="POST")
        try:
            urllib.request.urlopen(req)
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
            assert "entry points" in json.loads(e.read())["error"]
    finally:
        srv.shutdown()


def test_medmamba_clip_tower_export():
    """is_clip=True routes a mamba-family name to the CLIP tower entry
    points (a stage-1 '--model medmamba' run trains a VSSM-towered CLIP;
    without the flag the name resolves to the classifier zoo)."""
    _, _, fns_cls, _ = make_serving_fns(
        "medmamba", image_size=32, precision="fp32")
    assert set(fns_cls) == {"classify"}

    model, variables, fns, meta = make_serving_fns(
        "medmamba", is_clip=True, image_size=32, context_length=16,
        vocab_size=64, precision="fp32")
    assert set(fns) == {"image_embed", "text_embed"}
    s = meta["staging_size"]
    img = np.random.default_rng(0).integers(
        0, 255, (2, s, s, 3), dtype=np.uint8)
    emb = np.asarray(fns["image_embed"](variables, jnp.asarray(img)))
    np.testing.assert_allclose(
        np.linalg.norm(emb, axis=-1), 1.0, atol=1e-5)


def test_http_host_microbatching(tmp_path):
    """Concurrent requests coalesce into shared device calls (the
    MicroBatcher): all clients get their own correct embedding, and the
    /healthz batching counters show fewer batches than requests."""
    import importlib.util
    import threading
    import urllib.request

    from PIL import Image

    out = str(tmp_path / "art")
    export_serving(out, "biomedclip", **_tiny_clip_kw())

    spec = importlib.util.spec_from_file_location(
        "serve_http_tool2",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "serve_http.py"))
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)

    # generous delay so concurrent clients land in one batch
    srv = tool.make_server(out, port=0, max_batch=16, max_delay_ms=300.0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        rng = np.random.default_rng(0)
        blobs = []
        for i in range(6):
            buf = __import__("io").BytesIO()
            Image.fromarray(rng.integers(0, 256, (40, 56, 3),
                                         dtype=np.uint8)).save(
                buf, format="JPEG")
            blobs.append(buf.getvalue())

        results = [None] * len(blobs)

        def post(i):
            req = urllib.request.Request(
                f"{base}/embed_image", data=blobs[i], method="POST")
            with urllib.request.urlopen(req, timeout=120) as r:
                results[i] = np.asarray(json.loads(r.read())["embedding"])

        threads = [threading.Thread(target=post, args=(i,))
                   for i in range(len(blobs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        # every client got a distinct, correct, normalized embedding —
        # reference through the SAME decode path the host uses (native
        # libjpeg with PIL fallback; the two decoders differ per-pixel)
        import io as _io

        from mamba_clip_tpu.data import fastimage
        from mamba_clip_tpu.data.dataset import _decode_to_square

        loaded = load_serving(out)
        staging = int(loaded["manifest"]["staging_size"])
        for i, blob in enumerate(blobs):
            img = fastimage.decode_resize(blob, staging)
            if img is None:
                img = _decode_to_square(Image.open(_io.BytesIO(blob)),
                                        staging)
            direct = np.asarray(loaded["image_embed"](img[None]))[0]
            np.testing.assert_allclose(results[i], direct, atol=2e-3,
                                       err_msg=f"request {i}")

        with urllib.request.urlopen(f"{base}/healthz") as r:
            stats = json.loads(r.read())["batching"]["image_embed"]
        assert stats["requests"] == len(blobs)
        assert stats["batches"] < stats["requests"], stats
    finally:
        srv.shutdown()


def test_serving_rejects_training_only_quant():
    """int8_delayed / int8_delayed_attn scales live in mutable model
    state — serving export must reject them with a pointer to
    int8_serve."""
    import pytest

    from mamba_clip_tpu.serving import make_serving_fns

    for quant in ("int8_delayed", "int8_delayed_attn"):
        with pytest.raises(ValueError, match="int8_serve"):
            make_serving_fns("biomedclip", quant=quant)


def _load_serve_tool(name):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        name,
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "serve_http.py"))
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)
    return tool


def test_bucket_padding():
    """_bucket: next pow2, rounded up to the shard multiple — the
    bounded compile-shape set the MicroBatcher dispatches."""
    tool = _load_serve_tool("serve_http_bucket")
    assert [tool._bucket(n) for n in (1, 2, 3, 5, 8, 9)] == [1, 2, 4, 8,
                                                             8, 16]
    # shard-divisible: every dispatch of a data_shards=8 artifact
    assert [tool._bucket(n, 8) for n in (1, 3, 8, 9, 17)] == [8, 8, 8,
                                                              16, 32]
    # non-pow2 multiple still bounded and divisible
    assert [tool._bucket(n, 6) for n in (1, 5, 7)] == [6, 12, 12]


def test_http_host_sharded_artifact(tmp_path, monkeypatch):
    """A data_shards=8 artifact served over HTTP on the 8-device mesh:
    single requests are padded up to a shard-divisible batch, results
    match the unsharded export, and a host with too few devices gets
    the clear error instead of an obscure mesh failure.

    (This is the DP serving path under real load; the same artifact +
    command run verbatim on an 8-chip TPU host.)"""
    import threading
    import urllib.request

    from PIL import Image

    _, variables, _, meta = make_serving_fns("biomedclip", **_tiny_clip_kw())
    out1 = str(tmp_path / "dp1")
    out8 = str(tmp_path / "dp8")
    export_serving(out1, "biomedclip", variables=variables, **_tiny_clip_kw())
    export_serving(out8, "biomedclip", variables=variables, data_shards=8,
                   **_tiny_clip_kw())

    tool = _load_serve_tool("serve_http_sharded")

    # insufficient-device host → clear error naming the shard count
    monkeypatch.setattr(jax, "local_device_count", lambda *a, **k: 4)
    with pytest.raises(ValueError, match="data_shards=8"):
        tool.make_server(out8, port=0)
    monkeypatch.undo()

    srv = tool.make_server(out8, port=0, max_batch=16, max_delay_ms=1.0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        # every dispatched bucket is shard-divisible
        assert srv.batchers["image_embed"].pad_multiple == 8
        n = tool.warm_buckets(
            srv, "image_embed",
            _jpeg_bytes(), 16)
        assert n == 2  # {8, 16}: buckets 1/2/4/8 all pad to 8

        blob = _jpeg_bytes()
        req = urllib.request.Request(
            f"{base}/embed_image", data=blob, method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            emb = np.asarray(json.loads(r.read())["embedding"])
        assert emb.shape == (512,)

        # matches the single-shard artifact through the same decode
        from mamba_clip_tpu.data import fastimage
        from mamba_clip_tpu.data.dataset import _decode_to_square

        loaded = load_serving(out1)
        staging = int(loaded["manifest"]["staging_size"])
        img = fastimage.decode_resize(blob, staging)
        if img is None:
            import io as _io

            img = _decode_to_square(Image.open(_io.BytesIO(blob)), staging)
        ref = np.asarray(loaded["image_embed"](img[None]))[0]
        np.testing.assert_allclose(emb, ref, atol=2e-3)
    finally:
        srv.shutdown()


def _jpeg_bytes(seed: int = 0) -> bytes:
    import io as _io

    from PIL import Image

    rimg = np.random.default_rng(seed).integers(
        0, 256, (40, 56, 3), dtype=np.uint8)
    buf = _io.BytesIO()
    Image.fromarray(rimg).save(buf, format="JPEG")
    return buf.getvalue()
