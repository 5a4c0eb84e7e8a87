"""Multi-dataset evaluation engine.

Capability-equivalent of /root/reference/mtl/engine/test.py: loop over a
dict of per-dataset loaders, dispatch per task, collect raw results in the
reference's output formats (cls: softmax vectors; det: per-class (n,5)
arrays; seg: HxW label maps / pre_eval tuples).

TPU notes: inference steps are jitted with static batch shapes; eval batches
are padded up to the batch size and the padding results dropped host-side.
Passing a ``mesh`` shards each eval batch over the mesh's data axis
(data-parallel inference; the reference's multi-GPU eval exists in
mtl/engine/test.py:41-53 but its training-time variant raises
NotImplementedError — mtl/apis/train.py:100-101). Seg eval follows the
reference exactly (multitask_learner.py:171-195,217-227): f32 logits come
back from the device at the padded input resolution, are cropped to the
un-padded ``img_shape`` and bilinearly resized (half-pixel centers, the
``align_corners=False`` convention of the reference configs) to
``ori_shape`` BEFORE the argmax — class boundaries land where the
reference puts them.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional

import numpy as np

import jax

from rscotr_tpu.utils import get_root_logger


def _pad_batch(batch: Dict[str, np.ndarray], bs: int):
    n = len(next(iter(batch.values())))
    if n == bs:
        return batch, n
    out = {}
    for k, v in batch.items():
        pad = [(0, bs - n)] + [(0, 0)] * (v.ndim - 1)
        out[k] = np.pad(v, pad)
    return out, n


def _resize_labels_nearest(p: np.ndarray, hw) -> np.ndarray:
    """Nearest-neighbor resize of an (H, W) integer label map (fallback
    path for cached label-map outputs only — live eval resizes logits)."""
    H, W = p.shape
    h, w = int(hw[0]), int(hw[1])
    if (h, w) == (H, W):
        return p
    ys = np.clip((np.arange(h) + 0.5) * H / h - 0.5, 0, H - 1)
    xs = np.clip((np.arange(w) + 0.5) * W / w - 0.5, 0, W - 1)
    return p[np.round(ys).astype(int)[:, None],
             np.round(xs).astype(int)[None, :]]


def _resize_bilinear_np(x: np.ndarray, hw) -> np.ndarray:
    """Bilinear resize of (H, W, C) float logits with half-pixel centers
    and edge clamping — the exact sampling grid of
    ``F.interpolate(..., mode='bilinear', align_corners=False)`` that the
    reference's mmcv ``resize`` uses (multitask_learner.py:175-194,
    configs set align_corners=False)."""
    H, W, _ = x.shape
    h, w = int(hw[0]), int(hw[1])
    if (h, w) == (H, W):
        return x
    ys = np.clip((np.arange(h) + 0.5) * H / h - 0.5, 0, H - 1)
    xs = np.clip((np.arange(w) + 0.5) * W / w - 0.5, 0, W - 1)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, H - 1)
    x1 = np.minimum(x0 + 1, W - 1)
    wy = (ys - y0).astype(x.dtype)[:, None, None]
    wx = (xs - x0).astype(x.dtype)[None, :, None]
    top = x[y0][:, x0] * (1 - wx) + x[y0][:, x1] * wx
    bot = x[y1][:, x0] * (1 - wx) + x[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


def single_device_test(infer_steps: Dict[str, Callable], params,
                       loaders: Dict[str, Any],
                       max_batches: int = 0,
                       mesh=None) -> Dict[str, List]:
    """Returns dict dataset_name -> list of per-image results."""
    indexed = _strided_test(infer_steps, params, loaders,
                            max_batches=max_batches, mesh=mesh,
                            stride=1, offset=0)
    return {name: [r for _, r in items] for name, items in indexed.items()}


def multi_process_test(infer_steps: Dict[str, Callable], params,
                       loaders: Dict[str, Any],
                       max_batches: int = 0,
                       mesh=None) -> Dict[str, List]:
    """Multi-host eval: each process evaluates a strided subset of batches,
    then ragged results are exchanged via ``process_allgather`` (the
    TPU-native replacement for the reference's tmpdir/CPU-tensor
    ``collect_results`` path behind mtl/engine/test.py:41-53). Every
    process returns the full, index-ordered result dict."""
    import jax as _jax

    from rscotr_tpu.parallel.multihost import (all_gather_pyobjects,
                                               merge_strided_results)

    pc = _jax.process_count()
    if pc == 1:
        return single_device_test(infer_steps, params, loaders,
                                  max_batches=max_batches, mesh=mesh)
    local = _strided_test(infer_steps, params, loaders,
                          max_batches=max_batches, mesh=mesh,
                          stride=pc, offset=_jax.process_index())
    return merge_strided_results(all_gather_pyobjects(local))


def adaptive_process_test(infer_steps: Dict[str, Callable], params,
                          loaders: Dict[str, Any], max_batches: int = 0,
                          mesh=None) -> Dict[str, List]:
    """Train-time eval entry point that works on every topology the runner
    supports. Single process: ``single_device_test`` (optionally sharding
    batches over ``mesh`` — FSDP/TP-sharded global params are consumed by
    the jitted infer steps as-is). Multi process: ``params`` may be
    FSDP/TP-sharded global arrays whose shards are NOT all addressable
    from this process, so gather them to host once (collective — every
    process must call this together, same contract as ``save_checkpoint``)
    and run the strided ``multi_process_test`` on local devices.

    The reference stubs distributed train-time eval
    (/root/reference/mtl/apis/train.py:100-101); this exceeds it."""
    if jax.process_count() > 1:
        from rscotr_tpu.engine.checkpoint import gather_to_host

        host_params = gather_to_host(params)
        return multi_process_test(infer_steps, host_params, loaders,
                                  max_batches=max_batches)
    return single_device_test(infer_steps, params, loaders,
                              max_batches=max_batches, mesh=mesh)


def _strided_test(infer_steps: Dict[str, Callable], params,
                  loaders: Dict[str, Any], max_batches: int = 0,
                  mesh=None, stride: int = 1, offset: int = 0
                  ) -> Dict[str, List]:
    """Evaluate batches with ``batch_idx % stride == offset``; returns
    dict dataset_name -> [(global_sample_idx, result), ...]."""
    logger = get_root_logger()
    place = _batch_placer(mesh)
    results: Dict[str, List] = {}
    for name, loader in loaders.items():
        task = loader.dataset.task
        step = infer_steps[task]
        bs = loader.batch_size
        out: List = []
        for bi, batch in enumerate(iter(loader)):
            if max_batches and bi >= max_batches:
                break
            if bi % stride != offset:
                continue
            batch, valid = _pad_batch(batch, bs)
            batch = place(batch)
            base = bi * bs
            if task == "cls":
                probs = np.asarray(step(params, batch["img"]))
                out.extend((base + i, probs[i]) for i in range(valid))
            elif task == "det":
                det, labels = step(params, batch["img"], batch["img_hw"],
                                   batch["scale_factor"])
                det = np.asarray(det)
                labels = np.asarray(labels)
                K = len(loader.dataset.CLASSES)
                for i in range(valid):
                    per_class = [det[i][labels[i] == c].astype(np.float32)
                                 for c in range(K)]
                    out.append((base + i, per_class))
            elif task == "seg":
                # reference order (multitask_learner.py:171-195): logits ->
                # crop padding -> bilinear resize to ori_shape -> argmax
                logits_step = infer_steps.get("seg_logits")
                hw = batch.get("img_hw")
                ori = batch.get("ori_hw")
                H, W = batch["img"].shape[1:3]
                # fast path: nothing to crop or resize (img_hw == padded
                # == ori_shape — true for Potsdam's uniform 512 tiles) ->
                # argmax ON DEVICE, ship (H, W) int32 instead of the full
                # logits volume. Bit-identical result; measured on the
                # axon tunnel the scheme-2 head's (512, 512, Q=100) f32
                # logits cost 4-5 s/image in D2H alone (PERF.md round-4
                # eval-loop section) vs 54 ms for the label map.
                hw_np = np.asarray(hw)[:valid] if hw is not None else None
                ori_np = np.asarray(ori)[:valid] if ori is not None \
                    else None
                no_reshape = (
                    hw_np is not None and ori_np is not None and
                    bool(np.all(hw_np == np.asarray((H, W)))) and
                    bool(np.all(ori_np == hw_np)))
                if no_reshape and "seg" in infer_steps:
                    preds = np.asarray(step(params, batch["img"]))
                    out.extend((base + i, preds[i].astype(np.int32))
                               for i in range(valid))
                elif logits_step is not None:
                    logits = np.asarray(logits_step(params, batch["img"]))
                    for i in range(valid):
                        lg = logits[i]
                        if hw is not None:
                            lg = lg[:hw[i, 0], :hw[i, 1]]
                        if ori is not None:
                            lg = _resize_bilinear_np(lg, np.asarray(ori[i]))
                        out.append((base + i,
                                    lg.argmax(-1).astype(np.int32)))
                else:   # label-map-only step (legacy/exported artifacts)
                    preds = np.asarray(step(params, batch["img"]))
                    for i in range(valid):
                        p = preds[i]
                        if hw is not None:
                            p = p[:hw[i, 0], :hw[i, 1]]
                        if ori is not None:
                            p = _resize_labels_nearest(p, np.asarray(ori[i]))
                        out.append((base + i, p.astype(np.int32)))
        results[name] = out
        logger.info("evaluated %s: %d samples%s", name, len(out),
                    f" (process {offset}/{stride})" if stride > 1 else "")
    return results


def _batch_placer(mesh):
    """Shard eval batches over the mesh's data axis when the batch size
    divides the device count; otherwise leave placement to jit."""
    if mesh is None:
        return lambda batch: batch
    from jax.sharding import NamedSharding, PartitionSpec as P
    n = mesh.devices.size
    shard = NamedSharding(mesh, P(mesh.axis_names[0]))

    def place(batch):
        if len(next(iter(batch.values()))) % n != 0:
            return batch
        return {k: jax.device_put(v, shard) for k, v in batch.items()}

    return place


def evaluate_results(datasets: Dict[str, Any], results: Dict[str, List],
                     eval_kwargs: Dict[str, dict],
                     allow_empty: bool = False) -> Dict[str, float]:
    """Per-dataset evaluate() with task-scoped kwargs; metric keys prefixed
    with the dataset name (reference evaluation.py:130-148).

    An empty result list for a selected dataset is an error by default —
    silently skipping it would quietly drop that dataset's metrics from
    the save-best criterion (the reference indexes
    ``results_dict[dataset_name]`` and would KeyError,
    evaluation.py:136-138). ``allow_empty=True`` downgrades to a logged
    skip for partial/cached-output workflows."""
    metrics: Dict[str, float] = {}
    for name, ds in datasets.items():
        kw = dict(eval_kwargs.get(ds.task, {}))
        res = results.get(name, [])
        if not res:
            if not allow_empty:
                raise ValueError(
                    f"no inference results for dataset {name!r} "
                    f"(have results for {sorted(results)}) — empty eval "
                    "would silently drop its metrics; pass "
                    "allow_empty=True to skip instead")
            get_root_logger().warning(
                "no results for dataset %s — skipping its evaluation",
                name)
            continue
        m = ds.evaluate(res, **kw)
        for k, v in m.items():
            if isinstance(v, (int, float, np.floating)):
                metrics[f"{name}.{k}"] = float(v)
    return metrics
