"""Checkpoint save/resume (orbax).

Capability-equivalent of mmcv CheckpointHook + runner.resume/load_checkpoint
as used by the reference (SURVEY.md §5.4): periodic checkpoints with meta
(iter, per-dataset CLASSES, versions), auto-resume via latest-checkpoint
discovery, best-checkpoint saving, and weights-only ``load_from``.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional

import jax
import numpy as np


def _ckpt_dir(work_dir: str, step: int) -> str:
    return os.path.join(os.path.abspath(work_dir), f"iter_{step}")


def gather_to_host(tree):
    """Device pytree -> full host-numpy pytree on EVERY process.

    Single-host (or plain numpy) leaves convert directly. Multi-host
    global arrays are not fully addressable: replicated leaves read the
    local replica; cross-host-sharded leaves (FSDP params / moments) are
    ``process_allgather``'d — a COLLECTIVE, so when ``process_count > 1``
    every process must call this (and therefore ``save_checkpoint``)."""
    from jax.experimental import multihost_utils

    def _one(x):
        if getattr(x, "is_fully_addressable", True):
            return np.asarray(x)
        if x.sharding.is_fully_replicated:
            return np.asarray(x.addressable_data(0))
        return multihost_utils.process_allgather(x, tiled=True)

    return jax.tree.map(_one, tree)


# single-slot async writer: at most one checkpoint write in flight; the
# next save (or wait_for_async_save) joins it and re-raises any failure
_ASYNC: Dict[str, Any] = {"thread": None, "error": None}


def wait_for_async_save() -> None:
    """Join any in-flight async checkpoint write; re-raise its failure.

    Called automatically by the next ``async_save`` (one write in flight
    at a time) and by CheckpointHook.after_run; call it manually before
    reading a checkpoint that was just saved asynchronously."""
    t = _ASYNC["thread"]
    if t is not None:
        t.join()
        _ASYNC["thread"] = None
    if _ASYNC["error"] is not None:
        err = _ASYNC["error"]
        _ASYNC["error"] = None
        raise RuntimeError("async checkpoint save failed") from err


def save_checkpoint(work_dir: str, step: int, params, opt_state=None,
                    meta: Optional[Dict[str, Any]] = None,
                    name: Optional[str] = None, async_save: bool = False,
                    post_save=None) -> str:
    """Write ``work_dir/iter_{step}`` (or ``work_dir/{name}``).

    Multi-host: EVERY process must call this (the host gather is a
    collective); only process 0 touches the filesystem. All processes
    return the checkpoint path.

    ``async_save``: return as soon as the device→host gather is done and
    write the files on a background thread, so the train loop only stalls
    for the gather instead of the full serialize+fsync (the reference's
    mmcv CheckpointHook blocks the loop for the whole torch.save). The
    gathered state is a host-side COPY, so training may donate/overwrite
    the live params immediately. One write in flight at a time; a failure
    surfaces on the next save / ``wait_for_async_save``. Multi-host runs
    fall back to synchronous writes (orbax's internal cross-process
    barriers must run on the same thread on every process).

    ``post_save``: optional callable run (on the writer thread when async)
    after the checkpoint files are fully committed — e.g. pruning."""
    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(work_dir), name) if name \
        else _ckpt_dir(work_dir, step)
    state = {"params": params}
    if opt_state is not None:
        state["opt_state"] = opt_state
    state = gather_to_host(state)
    write_meta = jax.process_index() == 0

    def _write():
        # every process calls save (orbax syncs processes internally and
        # the primary writes — gating to process 0 would deadlock its
        # barriers); plain meta/pointer files are process-0-only IO
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, state, force=True)
        if write_meta:
            m = dict(meta or {})
            m["iter"] = int(step)
            with open(os.path.join(path, "meta.json"), "w") as f:
                json.dump(m, f, default=str)
            if name is None:
                # only regular iter_N saves move the auto-resume pointer —
                # a best_checkpoint save must not hijack resume; written
                # AFTER the orbax commit so the pointer never names an
                # incomplete checkpoint
                latest = os.path.join(os.path.abspath(work_dir),
                                      "last_checkpoint")
                with open(latest, "w") as f:
                    f.write(path)
        if post_save is not None:
            post_save()

    if async_save and jax.process_count() == 1:
        import threading

        wait_for_async_save()  # ≤1 in flight; surfaces a prior failure

        def _job():
            try:
                _write()
            except BaseException as e:  # surfaced by the next wait
                _ASYNC["error"] = e

        t = threading.Thread(target=_job, name=f"ckpt-save-{step}")
        _ASYNC["thread"] = t
        t.start()
        return path

    _write()
    return path


def resolve_checkpoint(path: str) -> str:
    """Resolve mm-style checkpoint aliases onto orbax dirs, so reference
    command lines work verbatim (the reference README's test command
    passes ``work_dir/latest.pth`` — /root/reference/README.md:99):

    - an orbax checkpoint dir (``iter_N``/``best_checkpoint``): as-is
    - a work_dir containing ``iter_*``/``last_checkpoint``: its latest
    - ``…/latest[.pth]``: latest checkpoint in the parent dir
    - ``…/best[…][.pth]``: ``best_checkpoint`` in the parent dir
    - ``…/name.pth`` where ``…/name`` is a checkpoint dir: that dir
    """
    p = os.path.abspath(path)
    if os.path.isdir(p):
        entries = os.listdir(p)
        if "last_checkpoint" in entries or any(
                re.fullmatch(r"iter_\d+", d) for d in entries):
            latest = find_latest_checkpoint(p)
            if latest is None:
                raise FileNotFoundError(
                    f"no iter_* checkpoint inside work_dir {path}")
            return latest
        return p
    base = os.path.basename(p)
    stem = base[:-4] if base.endswith(".pth") else base
    parent = os.path.dirname(p)
    if stem == "latest":
        latest = find_latest_checkpoint(parent)
        if latest is not None:
            return latest
    elif stem.startswith("best"):
        cand = os.path.join(parent, "best_checkpoint")
        if os.path.isdir(cand):
            return cand
    cand = os.path.join(parent, stem)
    if os.path.isdir(cand):
        return cand
    if os.path.isfile(p):
        raise FileNotFoundError(
            f"{path!r} is a file, not an orbax checkpoint dir — torch "
            f".pth checkpoints must be converted first: "
            f"python tools/convert_checkpoint.py {path} <out_dir>")
    raise FileNotFoundError(
        f"checkpoint {path!r} not found (tried orbax dir, work_dir "
        f"latest, and .pth alias resolution)")


def load_checkpoint(path: str, target=None) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    wait_for_async_save()  # never read a checkpoint mid-async-write
    path = resolve_checkpoint(path)
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), item=target)
    meta = {}
    meta_path = os.path.join(path, "meta.json")
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    restored["meta"] = meta
    return restored


def find_latest_checkpoint(work_dir: str) -> Optional[str]:
    """mmcv find_latest_checkpoint semantics (auto-resume)."""
    if not os.path.isdir(work_dir):
        return None
    latest = os.path.join(work_dir, "last_checkpoint")
    if os.path.isfile(latest):
        with open(latest) as f:
            p = f.read().strip()
        if os.path.isdir(p):
            return p
    best, best_iter = None, -1
    for d in os.listdir(work_dir):
        m = re.fullmatch(r"iter_(\d+)", d)
        if m and int(m.group(1)) > best_iter:
            best, best_iter = os.path.join(work_dir, d), int(m.group(1))
    return best
