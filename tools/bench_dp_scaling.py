#!/usr/bin/env python
"""DP scaling measurement on a virtual CPU mesh (VERDICT round-1 item #5).

Measures steps/s (and derived img/s) at 1/2/4/8 data-parallel devices with
the REAL input pipeline feeding: MultiDataLoader -> TaskDataLoader threads
-> LoadImageFromFile (C++ libjpeg decode from disk) -> collate ->
PrefetchIterator async device_put -> jitted train step on a
``jax.sharding`` mesh. Also measures the loader ALONE at each global batch
size to locate the input-pipeline saturation point.

CPU-mesh numbers measure SCALING BEHAVIOR (collective overhead, input
pipeline headroom), not TPU step time — the per-device model flops here
run on one physical core, so ideal scaling shows up as FLAT steps/s with
n (same total work), and input-pipeline saturation shows up as loader
rate < step demand. Results land in a JSON file; PERF.md summarizes.

Usage:
  python tools/bench_dp_scaling.py --out /tmp/dp_scaling.json \
      --iters 30 --warmup 5
"""

import argparse
import json
import os
import sys
import time

# must precede any jax import: 8 virtual CPU devices
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
for k in list(os.environ):
    if k.startswith(("PALLAS_AXON", "AXON_")):
        del os.environ[k]

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from rscotr_tpu.utils import get_root_logger, setup_compile_cache  # noqa: E402

setup_compile_cache()


def make_disk_datasets(root: str, logger):
    """Materialize small on-disk datasets (JPEG cls, COCO det, PNG seg) so
    the bench exercises the C++ decode path end-to-end. Guarded by a DONE
    sentinel: a partially-written tree (crashed run) is wiped and
    regenerated."""
    import shutil

    import numpy as np
    from PIL import Image

    sentinel = os.path.join(root, "DONE")
    if os.path.isdir(root) and not os.path.isfile(sentinel):
        shutil.rmtree(root)

    rng = np.random.default_rng(0)
    cls_dir = os.path.join(root, "cls")
    if not os.path.isdir(cls_dir):
        for ci in range(4):
            d = os.path.join(cls_dir, f"class_{ci}")
            os.makedirs(d, exist_ok=True)
            for i in range(16):
                Image.fromarray(rng.integers(
                    0, 255, (128, 128, 3)).astype("uint8")).save(
                    os.path.join(d, f"{i}.jpg"))

    det_dir = os.path.join(root, "det")
    ann_path = os.path.join(det_dir, "ann.json")
    if not os.path.isfile(ann_path):
        os.makedirs(os.path.join(det_dir, "imgs"), exist_ok=True)
        images, annotations = [], []
        aid = 0
        for i in range(64):
            Image.fromarray(rng.integers(
                0, 255, (256, 256, 3)).astype("uint8")).save(
                os.path.join(det_dir, "imgs", f"im{i}.jpg"))
            images.append({"id": i, "file_name": f"im{i}.jpg",
                           "width": 256, "height": 256})
            for _ in range(int(rng.integers(1, 5))):
                x, y = rng.integers(0, 200, 2)
                w, h = rng.integers(20, 56, 2)
                annotations.append({
                    "id": aid, "image_id": i,
                    "category_id": int(rng.integers(1, 5)),
                    "bbox": [int(x), int(y), int(w), int(h)],
                    "iscrowd": 0, "area": int(w * h)})
                aid += 1
        with open(ann_path, "w") as f:
            json.dump({"images": images, "annotations": annotations,
                       "categories": [{"id": c, "name": f"c{c}"}
                                      for c in range(1, 5)]}, f)

    seg_img = os.path.join(root, "seg", "img_dir")
    seg_ann = os.path.join(root, "seg", "ann_dir")
    if not os.path.isdir(seg_img):
        os.makedirs(seg_img, exist_ok=True)
        os.makedirs(seg_ann, exist_ok=True)
        for i in range(64):
            Image.fromarray(rng.integers(
                0, 255, (128, 128, 3)).astype("uint8")).save(
                os.path.join(seg_img, f"t{i}.png"))
            blocks = rng.integers(1, 6, (8, 8))
            lab = np.kron(blocks, np.ones((16, 16), np.uint8)
                          ).astype(np.uint8)
            Image.fromarray(lab).save(os.path.join(seg_ann, f"t{i}.png"))
    with open(sentinel, "w") as f:
        f.write("ok\n")
    logger.info("disk datasets ready under %s", root)
    return cls_dir, det_dir, (seg_img, seg_ann)


def build_cfg(root):
    from rscotr_tpu.config import Config
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = Config.fromfile(os.path.join(
        repo, "configs/multi/MTL_tiny_synthetic.py"))
    pipe_cls = [dict(type="LoadImageFromFile"),
                dict(type="Resize", size=(128, 128), keep_ratio=False)]
    pipe_det = [dict(type="LoadImageFromFile"),
                dict(type="Resize", img_scale=(256, 256), keep_ratio=True)]
    pipe_seg = [dict(type="LoadImageFromFile")]
    cfg.merge_from_dict({
        "data.resisc.data.train": dict(
            type="CustomDataset", data_prefix=os.path.join(root, "cls"),
            pipeline=pipe_cls),
        "data.dior.data.train": dict(
            type="CocoDataset",
            ann_file=os.path.join(root, "det", "ann.json"),
            img_prefix=os.path.join(root, "det", "imgs"),
            classes=[f"c{c}" for c in range(1, 5)],
            pipeline=pipe_det),
        "data.potsdam.data.train": dict(
            type="PotsdamDataset",
            img_dir=os.path.join(root, "seg", "img_dir"),
            ann_dir=os.path.join(root, "seg", "ann_dir"),
            pipeline=pipe_seg),
    })
    cfg.merge_from_dict({"model.cls_head.num_classes": 4,
                         "model.bbox_head.num_classes": 4})
    return cfg


def bench_loader_only(cfg, datasets, world_size, draws, logger):
    from rscotr_tpu.data import build_multidataloader
    ml = build_multidataloader(cfg, datasets, seed=0,
                               world_size=world_size)
    it = iter(ml)
    next(it)                       # warm thread pools / file cache
    t0 = time.perf_counter()
    imgs = 0
    for _ in range(draws):
        try:
            b = next(it)
        except StopIteration:
            it = iter(ml)
            b = next(it)
        imgs += len(b["img"])
    dt = time.perf_counter() - t0
    return draws / dt, imgs / dt


def bench_train(cfg, n_devices, iters, warmup, logger, fsdp=False,
                tp=False):
    import numpy as np
    import jax

    from rscotr_tpu.apis import init_model_params, make_step_config
    from rscotr_tpu.data import build_datasets, build_multidataloader
    from rscotr_tpu.engine import (build_optimizer, make_train_step,
                                   task_param_masks)
    from rscotr_tpu.models import build_model
    from rscotr_tpu.parallel import make_mesh, replicate_global

    model = build_model(cfg.model)
    params = init_model_params(model, cfg, 0)
    optimizer = build_optimizer(cfg.optimizer, params["params"],
                                lr_config=dict(policy="fixed"))
    opt_state = optimizer.init(params["params"])
    masks = task_param_masks(params["params"], cls_uses_encoder=False)
    step_cfg = make_step_config(cfg)
    steps = {t: make_train_step(model, optimizer, t, step_cfg,
                                masks.get(t))
             for t in ("cls", "det", "seg")}

    mesh = None
    sharding = None
    if tp:
        # (data x model) 2-D mesh: dp = n/2, tp = 2 (VERDICT r4 #5 —
        # the dp*tp step-time vs pure-dp row that retires TP at this
        # model scale). The data axis carries n/2 of the global batch;
        # world_size for the loader stays n/2 so per-step batch work
        # matches the dp=n/2 column, and the comparison row is dp=n.
        assert n_devices % 2 == 0 and n_devices >= 4
        from jax.sharding import NamedSharding, PartitionSpec as P
        from rscotr_tpu.parallel import (make_mesh_2d, shard_opt_state_tp,
                                         shard_params_tp, tp_param_specs)
        mesh = make_mesh_2d(n_devices // 2, 2)
        params = shard_params_tp(params, mesh)
        opt_state = shard_opt_state_tp(
            opt_state, tp_param_specs(params["params"], mesh), mesh)
        sharding = NamedSharding(mesh, P("data"))
    elif n_devices > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P
        mesh = make_mesh(n_devices)
        if fsdp:
            from rscotr_tpu.parallel import (fsdp_param_specs,
                                             shard_opt_state_fsdp,
                                             shard_params_fsdp)
            specs = fsdp_param_specs(params["params"], mesh)
            params = shard_params_fsdp(params, mesh)
            opt_state = shard_opt_state_fsdp(opt_state, specs, mesh)
        else:
            params = replicate_global(params, mesh)
            opt_state = replicate_global(opt_state, mesh)
        sharding = NamedSharding(mesh, P("data"))

    datasets = build_datasets(cfg.data, split="train")
    ml = build_multidataloader(cfg, datasets, seed=0,
                               world_size=n_devices // 2 if tp
                               else n_devices)
    it = iter(ml)

    def place(b):
        return {k: (jax.device_put(v, sharding)
                    if sharding is not None else v)
                for k, v in b.items()}

    per_task = {}
    imgs = 0
    t0 = None
    rng = jax.random.key(0)
    for i in range(warmup + iters):
        try:
            b = next(it)
        except StopIteration:
            it = iter(ml)
            b = next(it)
        task = b.pop("task")
        b.pop("dataset_name")
        nb = len(b["img"])
        t_start = time.perf_counter()
        b = place(b)
        params, opt_state, lv = steps[task](params, opt_state, b,
                                            jax.random.fold_in(rng, i))
        loss = float(lv["loss"])        # sync
        dt = time.perf_counter() - t_start
        if i == warmup - 1 or (warmup == 0 and i == 0):
            t0 = time.perf_counter()
        if i >= warmup:
            per_task.setdefault(task, []).append(dt)
            imgs += nb
    total = time.perf_counter() - t0
    return {
        "steps_per_s": iters / total,
        "img_per_s": imgs / total,
        "per_task_ms": {t: float(np.median(v) * 1000)
                        for t, v in per_task.items()},
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/dp_bench_data")
    ap.add_argument("--out", default="/tmp/dp_scaling.json")
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--warmup", type=int, default=6)
    ap.add_argument("--devices", type=int, nargs="+",
                    default=[1, 2, 4, 8])
    ap.add_argument("--loader-draws", type=int, default=30)
    ap.add_argument("--fsdp", action="store_true",
                    help="also measure with params + Adam moments sharded "
                         "over the data axis (parallel/fsdp.py)")
    ap.add_argument("--tp", action="store_true",
                    help="also measure a (data x model) n/2 x 2 mesh with "
                         "Megatron-style tensor-parallel param sharding "
                         "(parallel/tp.py) — the dp*tp vs pure-dp row")
    args = ap.parse_args(argv)

    logger = get_root_logger()
    import jax
    jax.config.update("jax_platforms", "cpu")
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) >= max(args.devices)

    make_disk_datasets(args.root, logger)
    cfg = build_cfg(args.root)
    from rscotr_tpu.data import build_datasets, load_data_cfg
    cfg = load_data_cfg(cfg, config_root=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    datasets = build_datasets(cfg.data, split="train")
    for name, ds in datasets.items():
        assert len(ds) >= 8 * max(args.devices), \
            f"dataset {name} too small ({len(ds)}) for the largest batch"

    results = {"loader_only": {}, "train": {}}
    for n in args.devices:
        sps, ips = bench_loader_only(cfg, datasets, n, args.loader_draws,
                                     logger)
        results["loader_only"][str(n)] = {
            "draws_per_s": round(sps, 3), "img_per_s": round(ips, 2)}
        logger.info("loader-only world=%d: %.2f draws/s, %.1f img/s",
                    n, sps, ips)
    for n in args.devices:
        r = bench_train(cfg, n, args.iters, args.warmup, logger)
        results["train"][str(n)] = {k: (round(v, 3) if isinstance(v, float)
                                        else v) for k, v in r.items()}
        logger.info("train n=%d: %.3f steps/s, %.1f img/s, %s",
                    n, r["steps_per_s"], r["img_per_s"], r["per_task_ms"])
    if args.fsdp:
        results["train_fsdp"] = {}
        for n in [d for d in args.devices if d > 1]:
            r = bench_train(cfg, n, args.iters, args.warmup, logger,
                            fsdp=True)
            results["train_fsdp"][str(n)] = {
                k: (round(v, 3) if isinstance(v, float) else v)
                for k, v in r.items()}
            logger.info("train fsdp n=%d: %.3f steps/s, %.1f img/s, %s",
                        n, r["steps_per_s"], r["img_per_s"],
                        r["per_task_ms"])
    if args.tp:
        results["train_tp"] = {}
        for n in [d for d in args.devices if d % 2 == 0 and d >= 4]:
            r = bench_train(cfg, n, args.iters, args.warmup, logger,
                            tp=True)
            results["train_tp"][f"{n // 2}x2"] = {
                k: (round(v, 3) if isinstance(v, float) else v)
                for k, v in r.items()}
            logger.info("train dp*tp %dx2: %.3f steps/s, %.1f img/s, %s",
                        n // 2, r["steps_per_s"], r["img_per_s"],
                        r["per_task_ms"])

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))
    os._exit(0)


if __name__ == "__main__":
    main()
