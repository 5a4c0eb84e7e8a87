"""Serving export: jax.export AOT roundtrip of the per-task inference
steps (rscotr_tpu/export.py) — the TPU-native analog of the reference's
ONNX deploy surface (detr_head.py:706-843).

Checks: artifact directory structure, loading WITHOUT model code, exact
output parity with the live jitted steps, and the flat-params calling
convention surviving npz round-trip."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rscotr_tpu.export import (export_inference, load_artifact,
                               save_artifact, task_input_specs)
from rscotr_tpu.engine import make_infer_steps
from rscotr_tpu.models import build_model

from test_train_smoke import TINY_MODEL_CFG

SHAPES = {"cls": dict(bs=2, size=32),
          "det": dict(bs=1, size=64),
          "seg": dict(bs=2, size=64)}


@pytest.fixture(scope="module")
def exported_dir(tmp_path_factory):
    model = build_model(TINY_MODEL_CFG)
    params = model.init(jax.random.key(0),
                        cls_img=jnp.zeros((1, 32, 32, 3)),
                        det_img=jnp.zeros((1, 64, 64, 3)),
                        det_img_hw=jnp.array([[64, 64]], jnp.int32),
                        seg_img=jnp.zeros((1, 64, 64, 3)))
    exported = export_inference(model, params, SHAPES, max_per_img=10)
    out = str(tmp_path_factory.mktemp("serving"))
    save_artifact(out, exported, params, SHAPES,
                  classes={"resisc": ["a", "b"]})
    return model, params, out


def _inputs(task, rng):
    bs, size = SHAPES[task]["bs"], SHAPES[task]["size"]
    img = jnp.asarray(rng.normal(size=(bs, size, size, 3)).astype(
        np.float32))
    if task == "det":
        return (img, jnp.full((bs, 2), size, jnp.int32),
                jnp.ones((bs, 4), jnp.float32))
    return (img,)


def test_artifact_layout(exported_dir):
    _, _, out = exported_dir
    files = set(os.listdir(out))
    assert {"meta.json", "params.npz", "cls.stablehlo", "det.stablehlo",
            "seg.stablehlo"} <= files
    meta = json.load(open(os.path.join(out, "meta.json")))
    assert meta["classes"] == {"resisc": ["a", "b"]}
    assert meta["tasks"]["det"]["input_names"] == [
        "img", "img_hw", "scale_factor"]
    # input specs describe only the task inputs, not the param leaves
    assert meta["tasks"]["cls"]["input_specs"] == [[[2, 32, 32, 3],
                                                    "float32"]]


@pytest.mark.parametrize("task", ["cls", "det", "seg"])
def test_roundtrip_matches_live_model(exported_dir, task):
    model, params, out = exported_dir
    fns, _ = load_artifact(out, tasks=[task])
    infer = make_infer_steps(model, max_per_img=10)
    rng = np.random.default_rng(3)
    inputs = _inputs(task, rng)
    got = jax.tree.leaves(fns[task](*inputs))
    want = jax.tree.leaves(infer[task](params, *inputs))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=1e-6, rtol=1e-6)


def test_output_contracts(exported_dir):
    _, _, out = exported_dir
    fns, _ = load_artifact(out)
    rng = np.random.default_rng(5)
    probs = np.asarray(fns["cls"](*_inputs("cls", rng)))
    assert probs.shape == (2, 7)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
    det, labels = fns["det"](*_inputs("det", rng))
    assert np.asarray(det).shape == (1, 10, 5)
    assert np.asarray(labels).shape == (1, 10)
    seg = np.asarray(fns["seg"](*_inputs("seg", rng)))
    assert seg.shape == (2, 64, 64) and seg.dtype == np.int32


def test_uint8_raw_input_export():
    """uint8 export bakes device-side normalization into the program:
    feeding raw bytes must match the live step on the same raw bytes."""
    model = build_model(TINY_MODEL_CFG)
    params = model.init(jax.random.key(0),
                        cls_img=jnp.zeros((1, 32, 32, 3)))
    norm = ((10.0, 20.0, 30.0), (5.0, 5.0, 5.0))
    exported = export_inference(model, params, SHAPES, tasks=["cls"],
                                img_norm=norm, img_dtype=jnp.uint8)
    infer = make_infer_steps(model, img_norm=norm)
    raw = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, size=(2, 32, 32, 3)).astype(np.uint8))
    leaves = jax.tree_util.tree_leaves(params)
    got = exported["cls"].call(leaves, raw)
    want = infer["cls"](params, raw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6)
    assert str(exported["cls"].in_avals[len(leaves)].dtype) == "uint8"


def test_serve_cli_from_artifact(exported_dir, tmp_path):
    """tools/serve.py runs images through the artifact with NO model
    code: results.json for cls/det + seg label PNG at input resolution."""
    import importlib.util
    from PIL import Image

    _, _, artifact = exported_dir
    rng = np.random.default_rng(7)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(3):  # 3 images -> exercises partial final batch (bs=2)
        Image.fromarray(rng.integers(0, 255, size=(40, 50, 3)
                                     ).astype(np.uint8)).save(
            img_dir / f"im{i}.png")
    out_dir = tmp_path / "out"

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "serve", os.path.join(root, "tools", "serve.py"))
    serve = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serve)
    serve.main([artifact, str(img_dir), "--out-dir", str(out_dir),
                "--score-thr", "0.0"])

    res = json.load(open(out_dir / "results.json"))
    assert set(res) == {"im0.png", "im1.png", "im2.png"}
    for name, r in res.items():
        assert {"cls", "det", "seg"} <= set(r)
        assert 0 <= r["cls"]["top1"] < 7
        assert r["det"]["boxes_xyxy_score"]
        seg = np.asarray(Image.open(r["seg"]["png"]))
        assert seg.shape == (40, 50)


def test_spec_helper():
    specs = task_input_specs("det", 2, 128)
    assert [tuple(s.shape) for s in specs] == [(2, 128, 128, 3), (2, 2),
                                               (2, 4)]
    assert [s.dtype for s in specs] == [jnp.float32, jnp.int32,
                                        jnp.float32]
