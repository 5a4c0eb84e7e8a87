"""PARITY.md runbook rehearsal (VERDICT r3 #5).

Drives the real-weight parity command sequence end-to-end at tiny scale,
with a reverse-converted mm-format ``.pth`` of our own model standing in
for the published HF checkpoint (no network egress here):

    tools/convert_checkpoint.py --to-torch  (make the stand-in .pth)
    tools/convert_checkpoint.py             (step 1: torch -> JAX)
    tools/parity_check.py dump x2 + compare (step 2: forward parity)
    tools/parity_check.py metrics           (step 3: metric-vs-published)

The converted checkpoint must reproduce the original's forward outputs
BIT-exactly (the .pth came from the same weights), which proves every
link of the chain the real weights will travel.
"""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CFG = os.path.join(ROOT, "configs/multi/MTL_tiny_synthetic.py")


def _load(relpath, name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(ROOT, relpath))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


convert_checkpoint = None
parity_check = None


def setup_module(_m):
    global convert_checkpoint, parity_check
    convert_checkpoint = _load("tools/convert_checkpoint.py",
                               "convert_checkpoint_rb")
    parity_check = _load("tools/parity_check.py", "parity_check_rb")


@pytest.fixture(scope="module")
def native_ckpt(tmp_path_factory):
    """A native orbax checkpoint of the tiny-config model."""
    from rscotr_tpu.apis import init_model_params
    from rscotr_tpu.config import Config
    from rscotr_tpu.data import load_data_cfg
    from rscotr_tpu.engine import save_checkpoint
    from rscotr_tpu.models import build_model

    wd = tmp_path_factory.mktemp("parity_native")
    cfg = Config.fromfile(CFG)
    cfg = load_data_cfg(cfg, config_root=ROOT)
    model = build_model(cfg.model)
    params = init_model_params(model, cfg, seed=3)
    path = save_checkpoint(str(wd), step=0, params=params, name="native")
    return path


def test_runbook_end_to_end(native_ckpt, tmp_path):
    # stand-in for the published HF .pth: reverse-convert our checkpoint
    pth = str(tmp_path / "standin.pth")
    convert_checkpoint.main([CFG, native_ckpt, pth, "--to-torch",
                             "--depths", "1", "1", "2", "1"])
    raw = torch.load(pth, map_location="cpu", weights_only=False)
    assert "state_dict" in raw and any(
        k.startswith("backbone.") for k in raw["state_dict"])

    # step 1: forward conversion
    out_dir = str(tmp_path / "converted")
    convert_checkpoint.main([CFG, pth, out_dir,
                             "--depths", "1", "1", "2", "1"])
    conv_ckpt = os.path.join(out_dir, "converted")
    assert os.path.isdir(conv_ckpt)

    # step 2: forward dumps + compare (same weights -> bit-identical)
    a = str(tmp_path / "fwd_native.npz")
    b = str(tmp_path / "fwd_converted.npz")
    assert parity_check.main(["dump", CFG, native_ckpt,
                              "--out", a, "--seed", "0"]) == 0
    assert parity_check.main(["dump", CFG, conv_ckpt,
                              "--out", b, "--seed", "0"]) == 0
    da, db = np.load(a), np.load(b)
    assert set(da.files) == {"cls", "det_boxes", "det_labels", "seg"}
    assert parity_check.main(["compare", a, b, "--tol", "0"]) == 0

    # a perturbed dump must FAIL the comparison (the check has teeth)
    bad = str(tmp_path / "fwd_bad.npz")
    pert = {k: np.asarray(db[k]) for k in db.files}
    pert["cls"] = pert["cls"] + 0.1
    np.savez(bad, **pert)
    assert parity_check.main(["compare", a, bad, "--tol", "1e-3"]) == 1

    # step 3, end-to-end (VERDICT r4 #9): run the REAL eval CLI on the
    # converted checkpoint, then compare its metrics file against a
    # synthetic published-numbers table exactly as PARITY.md step 5
    # will with the paper's numbers.
    test_cli = _load("tools/test.py", "test_cli_rb")
    mfile = str(tmp_path / "metrics.json")
    test_cli.main([CFG, conv_ckpt, "--eval-out", mfile,
                   "--work-dir", str(tmp_path / "eval_wd"),
                   "--max-batches", "2"])
    got = json.load(open(mfile))
    assert got, "eval produced no metrics"
    # {dataset}.{metric} keys covering all three task datasets
    dsets = {k.split(".")[0] for k in got}
    assert {"resisc", "dior", "potsdam"} <= dsets, got.keys()
    # a published table quoting a subset of those metrics within tol
    # passes; shifting one number beyond tol fails
    pub_keys = sorted(got)[:3]
    pub = {k: float(got[k]) + 0.05 for k in pub_keys}
    p = str(tmp_path / "published.json")
    json.dump(pub, open(p, "w"))
    assert parity_check.main(["metrics", mfile, "--published", p,
                              "--tol", "0.3"]) == 0
    pub[pub_keys[0]] = float(got[pub_keys[0]]) + 5.0
    json.dump(pub, open(p, "w"))
    assert parity_check.main(["metrics", mfile, "--published", p,
                              "--tol", "0.3"]) == 1


def test_metrics_compare(tmp_path):
    got = {"resisc.accuracy_top-1": 94.45, "dior.bbox_mAP_50": 0.901,
           "potsdam.mFscore": 92.1}
    pub = {"resisc.accuracy_top-1": 94.50, "dior.bbox_mAP_50": 0.902}
    g, p = str(tmp_path / "m.json"), str(tmp_path / "pub.json")
    json.dump(got, open(g, "w"))
    json.dump(pub, open(p, "w"))
    assert parity_check.main(["metrics", g, "--published", p,
                              "--tol", "0.3"]) == 0
    # out-of-tolerance and missing keys must fail
    pub["resisc.accuracy_top-1"] = 96.0
    json.dump(pub, open(p, "w"))
    assert parity_check.main(["metrics", g, "--published", p,
                              "--tol", "0.3"]) == 1
    pub = {"nonexistent.metric": 1.0}
    json.dump(pub, open(p, "w"))
    assert parity_check.main(["metrics", g, "--published", p,
                              "--tol", "0.3"]) == 1
