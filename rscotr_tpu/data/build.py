"""Data builders: two-level config composition -> datasets -> loaders.

Capability-equivalent of /root/reference/mtl/data/build.py:
* ``load_data_cfg``: each ``cfg.data.<name>`` entry carries ``task`` and
  ``config: <path>``; the referenced per-dataset config file is loaded and
  inlined, with sibling ``data`` overrides deep-merged (build.py:31-40).
* ``build_datasets(split)`` tags each dataset with ``.task`` (43-50).
* ``build_dataloaders`` applies per-task loader args; TPU-first additions:
  a static detection bucket (``det_bucket_hw``, default (800, 800) for
  DIOR's square images) and ``max_gt`` GT padding.
* ``build_iteration_strategy`` (default round_robin) prints a 300-draw
  histogram sanity check like the reference (build.py:79-87).
* ``build_multidataloader`` assembles the MultiDataLoader.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from rscotr_tpu.config import Config, ConfigDict, DATASETS, deep_merge
from rscotr_tpu.data.iteration_strategies import strategies_map
from rscotr_tpu.data.loader import (MultiDataLoader, TaskDataLoader,
                                    collate_cls, collate_det, collate_seg)
from rscotr_tpu.data.pipelines import build_pipeline, split_normalize_cfg
from rscotr_tpu.utils import get_root_logger


def load_data_cfg(cfg, config_root: Optional[str] = None):
    """Inline each dataset's config file under cfg.data.<name>."""
    root = config_root or os.getcwd()
    for name in list(cfg.data.keys()):
        entry = cfg.data[name]
        if "config" not in entry:
            continue
        path = entry["config"]
        if not os.path.isabs(path):
            cands = [os.path.join(root, path), path]
            if cfg.filename:
                cands.insert(0, os.path.join(
                    os.path.dirname(cfg.filename), "..", "..", path))
            for cand in cands:
                if os.path.isfile(cand):
                    path = cand
                    break
        sub = Config.fromfile(path)
        merged = deep_merge({"data": sub.get("data", {})},
                            {"data": dict(entry.get("data", {}))})
        entry["data"] = merged["data"]
        for k in ("evaluation",):
            if k in sub and k not in entry:
                entry[k] = sub.get(k)
    return cfg


def build_dataset(ds_cfg: dict):
    ds_cfg = dict(ds_cfg)
    pipeline_cfg = ds_cfg.pop("pipeline", None)
    ds = DATASETS.build(ds_cfg)
    ds.pipeline_cfg = pipeline_cfg
    return ds


def build_datasets(data_cfg, split: str = "train") -> Dict[str, object]:
    """data_cfg: cfg.data (dict of name -> {task, data: {train/val/test}})."""
    out = {}
    for name, entry in data_cfg.items():
        dcfg = entry["data"].get(split)
        if dcfg is None:
            continue
        ds = build_dataset(dcfg)
        ds.task = entry["task"]
        ds.dataset_name = name
        out[name] = ds
    return out


_COLLATES = {
    "cls": lambda opts: collate_cls,
    "det": lambda opts: (lambda samples: collate_det(
        samples, bucket_hw=opts.get("det_bucket_hw", (800, 800)),
        max_gt=opts.get("max_gt", 100),
        dn_ladder=opts.get("_dn_ladder"))),
    "seg": lambda opts: (lambda samples: collate_seg(
        samples, size=opts.get("seg_size", 512),
        seg_pad_val=opts.get("seg_pad_val", 255))),
}


def build_dataloaders(datasets: Dict[str, object], data_cfg,
                      train: bool = True, seed: int = 0,
                      num_threads: int = 4,
                      world_size: int = 1,
                      num_replicas: Optional[int] = None,
                      rank: Optional[int] = None,
                      det_dn_ladder=None
                      ) -> Dict[str, TaskDataLoader]:
    """``world_size > 1`` multiplies the per-device batch into a global
    batch (DDP semantics: reference ``samples_per_gpu`` is per device;
    the jitted step shards the global batch over the data mesh).

    Multi-host: ``num_replicas``/``rank`` default to
    ``jax.process_count()``/``jax.process_index()``. Each host's loader
    yields its 1/num_replicas share of the global batch from a rank-strided
    index partition (DistributedSampler semantics — reference
    prepare_loader_args.py:77-93); the runner assembles the host-local
    shares into one global array per step."""
    if num_replicas is None or rank is None:
        import jax
        num_replicas = jax.process_count() if num_replicas is None \
            else num_replicas
        rank = jax.process_index() if rank is None else rank
    loaders = {}
    for name, ds in datasets.items():
        entry = data_cfg[name]
        opts = dict(entry.get("loader", {}))
        if train and ds.task == "det" and det_dn_ladder:
            opts["_dn_ladder"] = tuple(det_dn_ladder)
        bs = entry["data"].get("samples_per_gpu", 1) if train else \
            entry["data"].get("test_samples_per_gpu", 1)
        if train:
            bs_global = bs * max(1, world_size)
            assert bs_global % num_replicas == 0, (
                f"global batch {bs_global} not divisible by "
                f"{num_replicas} processes ({name})")
            bs = bs_global // num_replicas
        pcfg = list(ds.pipeline_cfg or [])
        collate = _COLLATES[ds.task](opts)
        img_norm = None
        if train and ds.task == "cls" and \
                opts.get("cls_device_augment", False):
            # RRC/flip/RandAugment/erase pixel work moves into the jitted
            # cls step; the host draws only the per-sample parameters
            # (pipelines.DeviceAugmentPlanner). Normalize moves to the
            # device too (augments need raw 0..255 input).
            from rscotr_tpu.data.loader import collate_cls_aug
            from rscotr_tpu.data.pipelines import split_device_augment_cfg
            pcfg, img_norm, _ = split_device_augment_cfg(
                pcfg, src_size=opts.get("cls_src_size", 256))
            collate = collate_cls_aug
        elif train and ds.task == "det" and \
                opts.get("det_device_augment", False):
            # resize/crop/flip pixel work moves into the jitted det
            # step; the host draws parameters and does the box math
            from rscotr_tpu.data.loader import collate_det_aug
            from rscotr_tpu.data.pipelines import \
                split_det_device_augment_cfg
            src_hw = opts.get("det_src_hw")
            if src_hw is None:
                bh = opts.get("det_bucket_hw", (800, 800))
                src_hw = max(bh, key=lambda b: b[0] * b[1]) if \
                    isinstance(bh[0], (tuple, list)) else bh
            pcfg, img_norm, _ = split_det_device_augment_cfg(
                pcfg, src_hw=tuple(src_hw))
            collate = (lambda samples, _o=opts: collate_det_aug(
                samples, bucket_hw=_o.get("det_bucket_hw", (800, 800)),
                max_gt=_o.get("max_gt", 100),
                dn_ladder=_o.get("_dn_ladder")))
        elif train and ds.task == "seg" and \
                opts.get("seg_device_augment", False):
            # ratio-resize/crop/flip/photometric pixel work moves into
            # the jitted seg step; the host draws parameters and
            # processes the (cheap, index-work) label only
            from rscotr_tpu.data.loader import collate_seg_aug
            from rscotr_tpu.data.pipelines import \
                split_seg_device_augment_cfg
            pcfg, img_norm, _ = split_seg_device_augment_cfg(
                pcfg, src_size=opts.get("seg_src_size",
                                        opts.get("seg_size", 512)))
            collate = collate_seg_aug
        elif opts.get("device_preprocess", False):
            # strip Normalize from the host pipeline; ship uint8, the
            # jitted step normalizes (+ re-zeros padding) on device
            pcfg, img_norm = split_normalize_cfg(pcfg)
            collate = _uint8_collate(collate)
        pipeline = build_pipeline(pcfg)
        loaders[name] = TaskDataLoader(
            ds, batch_size=bs, pipeline=pipeline,
            collate_fn=collate,
            shuffle=train, seed=seed, drop_last=train,
            num_threads=num_threads,
            num_replicas=(num_replicas if train else 1),
            rank=(rank if train else 0))
        loaders[name].img_norm = img_norm
    return loaders


def _uint8_collate(fn):
    def wrapped(samples):
        batch = fn(samples)
        batch["img"] = np.clip(np.round(batch["img"]), 0,
                               255).astype(np.uint8)
        return batch
    return wrapped


def build_iteration_strategy(cfg, loaders, seed: int = 0):
    icfg = dict(cfg.get("iteration_strategy",
                        {"type": "round_robin"}) or
                {"type": "round_robin"})
    t = icfg.pop("type", "round_robin")
    strategy = strategies_map[t](loaders, seed=seed, **icfg)
    # reference sanity check: empirical 300-draw histogram (build.py:79-87)
    probe = strategies_map[t](loaders, seed=seed, **icfg)
    draws = [probe() for _ in range(300)]
    hist = np.bincount(draws, minlength=len(loaders))
    get_root_logger().info(
        "iteration strategy '%s' empirical ratios over 300 draws: %s",
        t, dict(zip(loaders.keys(), (hist / 300).round(3).tolist())))
    return strategy


def derive_dn_ladder(cfg):
    """DN group-width ladder for the det collate — mirrors
    apis.make_step_config's CdnConfig derivation (keep the two in sync).

    The reference sizes DN groups from the runtime batch max GT count n:
    ``single_pad = n``, ``num_groups = num_dn // n``
    (query_denoising.py:97,121-123).  Collates quantize n UP to this
    static ladder so crowded images keep full DN coverage at a bounded
    compiled-graph count.  Beyond the {dn_max_gt, max_gt} endpoints the
    ladder carries one rung ``num_dn // g`` for EVERY group count g the
    reference can produce for n in (dn_max_gt, max_gt]; by the floor-
    division identity ``N // (N // (N // n)) == N // n`` the quantized
    width then reproduces the reference's ``num_groups`` exactly for
    every GT count — a 30-GT DIOR image gets the reference's 3 groups
    (90 DN positives), not 1 (flagship N=100 ladder:
    {20, 25, 33, 50, 100}).  Width still pads UP (rung >= n), so padded
    DN slots beyond n are masked, never-truncated — coverage-conservative
    exactly as before."""
    bh = (cfg.get("model", {}) or {}).get("bbox_head") or {}
    if not bh or not bh.get("dn_cfg"):
        return None
    gc = (bh.get("dn_cfg", {}) or {}).get("group_cfg", {}) or {}
    max_gt = 100
    for entry in cfg.data.values():
        if entry["task"] == "det":
            opts = dict(entry.get("loader", {}))
            max_gt = opts.get("max_gt", 100)
            if not opts.get("dn_widen", True):
                # loader.dn_widen=False: legacy single-width layout
                # (crowded images truncated to dn_max_gt). Mixing ladder
                # widths fragments K-scan dispatch groups and doubles
                # the per-(task, n) compiled-graph set, so workloads
                # where >dn_max_gt-GT images are common may prefer this.
                return None
    dn_max_gt = min(gc.get("dn_max_gt", 20), max_gt)
    num_dn = gc.get("num_dn_queries", 100) or 100
    rungs = {dn_max_gt, max_gt}
    if dn_max_gt < max_gt:
        # one rung per achievable reference group count in (dn_max_gt,
        # max_gt]: g ranges from 1 up to the count at n = dn_max_gt + 1
        g_top = max(num_dn // (dn_max_gt + 1), 1)
        for g in range(1, g_top + 1):
            r = num_dn // g
            if dn_max_gt < r <= max_gt:
                rungs.add(r)
    return tuple(sorted(rungs))


def build_multidataloader(cfg, datasets: Dict[str, object],
                          seed: int = 0,
                          world_size: int = 1) -> MultiDataLoader:
    loaders = build_dataloaders(datasets, cfg.data, train=True, seed=seed,
                                world_size=world_size,
                                det_dn_ladder=derive_dn_ladder(cfg))
    strategy = build_iteration_strategy(cfg, loaders, seed=seed)
    return MultiDataLoader(loaders, strategy)
