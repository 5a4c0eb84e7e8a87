#!/usr/bin/env python
"""Convert checkpoints between mm/torch format and this framework.

Forward (torch -> JAX, the default):

    python tools/convert_checkpoint.py CONFIG TORCH_CKPT OUT_DIR
        [--depths 2 2 6 2]

Loads the torch state dict (handles ``state_dict``/``model`` wrappers and
``module.`` DDP prefixes), converts every recognized component with
``rscotr_tpu.utils.torch_convert`` (Swin/ResNet backbone, ChannelMapper,
shared deformable encoder, cls/det/seg heads — reference key layout per
/root/reference/models/multi/multitask_learner.py:308-353), merges
non-strictly into the config-built model's init params, and writes an
orbax checkpoint dir loadable by tools/train.py ``--load-from`` /
tools/test.py. This is the entry point of the BASELINE.md parity protocol
(published HF weights -> TPU eval).

Reverse (JAX -> torch, ``--to-torch``):

    python tools/convert_checkpoint.py CONFIG OUR_CKPT_DIR OUT.pth
        --to-torch [--depths 2 2 6 2]

Emits an mm-format ``.pth`` (``{'state_dict': ...}``) from one of our
orbax checkpoints so the reference stack can consume TPU-trained weights
(round-trip bit-equality tested in tests/test_reverse_convert.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from rscotr_tpu.utils import (honor_jax_platforms_env,  # noqa: E402
                              setup_compile_cache)

honor_jax_platforms_env()
setup_compile_cache()


def load_torch_state(path):
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model", "params"):
        if isinstance(raw, dict) and key in raw and \
                isinstance(raw[key], dict):
            raw = raw[key]
            break
    state = {}
    for k, v in raw.items():
        k = k.removeprefix("module.")
        try:
            state[k] = v.detach().cpu().numpy()
        except AttributeError:
            continue  # non-tensor entries (meta, version tags)
    return state


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("config")
    ap.add_argument("torch_ckpt")
    ap.add_argument("out_dir")
    ap.add_argument("--depths", type=int, nargs="+", default=[2, 2, 6, 2],
                    help="Swin stage depths (for relative-bias reshapes)")
    ap.add_argument("--to-torch", action="store_true",
                    help="reverse direction: our orbax checkpoint dir -> "
                         "mm-format .pth consumable by the reference")
    args = ap.parse_args(argv)

    if args.to_torch:
        return _to_torch(args)

    import numpy as np

    from rscotr_tpu.apis import init_model_params
    from rscotr_tpu.config import Config
    from rscotr_tpu.data import load_data_cfg
    from rscotr_tpu.engine.checkpoint import save_checkpoint
    from rscotr_tpu.models import build_model
    from rscotr_tpu.utils import get_root_logger, torch_convert as tc

    logger = get_root_logger()
    cfg = Config.fromfile(args.config)
    cfg = load_data_cfg(cfg)
    model = build_model(cfg.model)
    params = init_model_params(model, cfg)

    state = load_torch_state(args.torch_ckpt)
    logger.info("loaded %d torch tensors from %s", len(state),
                args.torch_ckpt)

    # standalone backbone checkpoints (cls pretrain) carry no prefix
    if not any("." in k and k.split(".", 1)[0] in
               ("backbone", "neck", "shared_encoder", "encoder",
                "cls_head", "bbox_head", "seg_head", "decode_head")
               for k in state):
        state = {f"backbone.{k}": v for k, v in state.items()}

    # the standalone models name their encoder 'encoder' (dino.py:24),
    # the MTL names it 'shared_encoder'
    model_type = cfg.model.get("type", "MTL")
    if model_type in ("DINO", "RSCoTrSeg"):
        state = {k.replace("encoder.", "shared_encoder.", 1)
                 if k.startswith("encoder.") else k: v
                 for k, v in state.items()}

    batch_stats = None
    if "backbone.layer1.0.conv1.weight" in state:        # ResNet
        bb_params, bb_stats = tc.convert_resnet(state)
        converted = {"backbone": bb_params}
        batch_stats = {"backbone": bb_stats}
        rest = tc.convert_mtl_checkpoint(
            {k: v for k, v in state.items()
             if not k.startswith("backbone.")}, depths=tuple(args.depths))
        converted.update(rest)
    else:
        converted = tc.convert_mtl_checkpoint(state,
                                              depths=tuple(args.depths))

    # standalone models use 'encoder' in OUR tree too — map back
    if model_type in ("DINO", "RSCoTrSeg") and \
            "shared_encoder" in converted and \
            "encoder" in params["params"]:
        converted["encoder"] = converted.pop("shared_encoder")

    n_merged = 0
    for top, sub in converted.items():
        if top not in params["params"]:
            logger.warning("skipping %s: not in the model's param tree", top)
            continue
        params = tc.merge_into_params(params, sub, top)
        n_merged += len(jax_leaves(sub))
    if batch_stats is not None and "batch_stats" in params:
        for top, sub in batch_stats.items():
            bs = dict(params["batch_stats"])
            bs[top] = _merge_trees(dict(bs.get(top, {})), sub)
            params["batch_stats"] = bs

    path = save_checkpoint(args.out_dir, step=0, params=params,
                           meta={"source": os.path.abspath(args.torch_ckpt),
                                 "converter": "tools/convert_checkpoint.py"},
                           name="converted")
    logger.info("merged %d tensors -> %s", n_merged, path)
    print(path)


def _to_torch(args):
    import numpy as np
    import torch

    from rscotr_tpu.engine.checkpoint import load_checkpoint
    from rscotr_tpu.config import Config
    from rscotr_tpu.utils import get_root_logger, torch_convert as tc

    logger = get_root_logger()
    cfg = Config.fromfile(args.config)
    ck = load_checkpoint(args.torch_ckpt)   # positional: our ckpt dir
    tree = ck["params"]["params"] if "params" in ck["params"] else \
        ck["params"]
    if isinstance(tree, dict) and "params" in tree:
        tree = tree["params"]
    # standalone models name the shared encoder 'encoder'
    if "encoder" in tree and "shared_encoder" not in tree:
        tree = dict(tree)
        tree["shared_encoder"] = tree.pop("encoder")
    state = {}
    if "backbone" in tree and "conv1" in tree["backbone"]:   # ResNet
        bs = (ck["params"].get("batch_stats") or {}).get("backbone", {})
        state.update(tc.reverse_resnet(tree["backbone"], bs))
        rest = {k: v for k, v in tree.items() if k != "backbone"}
        state.update(tc.reverse_mtl_checkpoint(
            rest, depths=tuple(args.depths)))
    else:
        state.update(tc.reverse_mtl_checkpoint(
            tree, depths=tuple(args.depths)))
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in state.items()}
    meta = dict(ck.get("meta") or {})
    torch.save({"state_dict": sd, "meta": meta}, args.out_dir)
    logger.info("wrote %d tensors -> %s (mm format, config %s)",
                len(sd), args.out_dir, cfg.filename)
    print(args.out_dir)


def jax_leaves(tree):
    import jax

    return jax.tree.leaves(tree)


def _merge_trees(dst, src):
    for k, v in src.items():
        if isinstance(v, dict):
            dst[k] = _merge_trees(dict(dst.get(k, {})), v)
        else:
            dst[k] = v
    return dst


if __name__ == "__main__":
    main()
