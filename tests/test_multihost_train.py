"""Multi-host training data path (VERDICT round-1 item #2).

Unit level: rank-strided loader partition math (the DistributedSampler
equivalent — reference /root/reference/mtl/data/prepare_loader_args.py:
77-93) and the global-batch division in build_dataloaders.

Integration level (slow): a REAL 2-process ``jax.distributed`` run over
2x4 virtual CPU devices (gloo collectives) whose loss trajectory and
final params match the 1-process 8-device run on the same global batch
stream — each process loads only its half of every global batch and the
runner assembles them with ``make_array_from_process_local_data``.
"""

import os
import pickle
import subprocess
import sys
import time

import numpy as np
import pytest

from rscotr_tpu.data.loader import TaskDataLoader

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HELPER = os.path.join(ROOT, "tests", "helpers", "dist_trajectory.py")


class _Ds:
    task = "cls"
    CLASSES = ("a",)

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        return {"x": np.float32(idx)}


def _collate(samples):
    return {"x": np.asarray([s["x"] for s in samples], np.float32)}


class TestStridedSharding:
    def test_ranks_partition_the_epoch(self):
        """Union of both ranks' index orders == full dataset, disjoint."""
        orders = []
        for rank in (0, 1):
            dl = TaskDataLoader(_Ds(16), 2, collate_fn=_collate,
                                shuffle=True, seed=3, num_threads=1,
                                num_replicas=2, rank=rank)
            orders.append(dl._index_order())
        assert len(orders[0]) == len(orders[1]) == 8
        union = set(orders[0]) | set(orders[1])
        assert union == set(range(16))
        assert not (set(orders[0]) & set(orders[1]))

    def test_global_batch_union_matches_single_process(self):
        """Per-step global batch (rank shards side by side) holds exactly
        the samples the 1-process loader would draw that step."""
        single = TaskDataLoader(_Ds(16), 4, collate_fn=_collate,
                                shuffle=True, seed=3, num_threads=1)
        sharded = [TaskDataLoader(_Ds(16), 2, collate_fn=_collate,
                                  shuffle=True, seed=3, num_threads=1,
                                  num_replicas=2, rank=r) for r in (0, 1)]
        its = [iter(dl) for dl in sharded]
        for b in iter(single):
            got = np.concatenate([next(it)["x"] for it in its])
            assert set(got.tolist()) == set(b["x"].tolist())

    def test_wraparound_padding(self):
        """N=5, R=2 -> rank size 3; one sample repeats (DistributedSampler
        wrap-around)."""
        dls = [TaskDataLoader(_Ds(5), 1, collate_fn=_collate, shuffle=False,
                              num_threads=1, num_replicas=2, rank=r)
               for r in (0, 1)]
        o0, o1 = dls[0]._index_order(), dls[1]._index_order()
        assert len(o0) == len(o1) == 3
        assert sorted(np.concatenate([o0, o1]).tolist()) == \
            [0, 0, 1, 2, 3, 4]
        assert len(dls[0]) == len(dls[1]) == 3

    def test_epoch_reshuffle_consistent_across_ranks(self):
        dls = [TaskDataLoader(_Ds(16), 2, collate_fn=_collate, shuffle=True,
                              seed=3, num_threads=1, num_replicas=2, rank=r)
               for r in (0, 1)]
        for dl in dls:
            dl.set_epoch(5)
        union = set(dls[0]._index_order()) | set(dls[1]._index_order())
        assert union == set(range(16))


class TestGlobalBatchDivision:
    def test_build_dataloaders_divides_global_batch(self):
        from rscotr_tpu.data import build_dataloaders
        ds = _Ds(16)
        ds.pipeline_cfg = None
        ds.task = "cls"
        data_cfg = {"d": {"task": "cls",
                          "data": {"samples_per_gpu": 2},
                          "loader": {}}}
        dl = build_dataloaders({"d": ds}, data_cfg, train=True,
                               world_size=8, num_replicas=2, rank=1)["d"]
        assert dl.batch_size == 8          # 2 * 8 devices / 2 hosts
        assert dl.num_replicas == 2 and dl.rank == 1

    def test_indivisible_raises(self):
        from rscotr_tpu.data import build_dataloaders
        ds = _Ds(16)
        ds.pipeline_cfg = None
        data_cfg = {"d": {"task": "cls",
                          "data": {"samples_per_gpu": 1},
                          "loader": {}}}
        with pytest.raises(AssertionError):
            build_dataloaders({"d": ds}, data_cfg, train=True,
                              world_size=3, num_replicas=2, rank=0)


@pytest.mark.slow
class TestTwoProcessTrajectory:
    def _run_single(self, tmp_path):
        out = str(tmp_path / "single.pkl")
        env = {k: v for k, v in os.environ.items()
               if not k.startswith(("XLA_FLAGS", "JAX_PLATFORMS"))}
        subprocess.run(
            [sys.executable, HELPER, "--num-processes", "1",
             "--local-devices", "8", "--out", out],
            check=True, timeout=600, env=env)
        with open(out, "rb") as f:
            return pickle.load(f)

    def _run_double(self, tmp_path, port, tag="p", extra=()):
        outs = [str(tmp_path / f"{tag}{r}.pkl") for r in (0, 1)]
        env = {k: v for k, v in os.environ.items()
               if not k.startswith(("XLA_FLAGS", "JAX_PLATFORMS"))}
        procs = [subprocess.Popen(
            [sys.executable, HELPER, "--num-processes", "2",
             "--process-id", str(r), "--local-devices", "4",
             "--coordinator", f"localhost:{port}", "--out", outs[r],
             *extra],
            env=env) for r in (0, 1)]
        deadline = time.time() + 900
        for p in procs:
            p.wait(timeout=max(deadline - time.time(), 1))
            assert p.returncode == 0
        with open(outs[0], "rb") as f:
            return pickle.load(f)

    @staticmethod
    def _assert_params_match(single, run):
        for mod in ("proj", "head"):
            s_leaves = sorted(single["params"]["params"][mod].items())
            d_leaves = sorted(run["params"]["params"][mod].items())
            for (k1, a), (k2, b) in zip(s_leaves, d_leaves):
                assert k1 == k2
                np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)

    @staticmethod
    def _assert_eval_cycle_matches(single, run):
        """Train-time eval + save-best ran (interval=2 over 4 steps -> 2
        evals), produced identical metrics to the 1-process run on every
        topology, and wrote the best checkpoint (VERDICT r2 #2)."""
        assert len(run["eval_metrics"]) == len(single["eval_metrics"]) == 2
        for ms, mr in zip(single["eval_metrics"], run["eval_metrics"]):
            assert ms.keys() == mr.keys()
            for k in ms:
                np.testing.assert_allclose(ms[k], mr[k], rtol=1e-6)
        assert run["best_ckpt"] is not None

    def test_two_process_matches_single(self, tmp_path):
        single = self._run_single(tmp_path)
        double = self._run_double(tmp_path, port=19731)
        np.testing.assert_allclose(single["losses"], double["losses"],
                                   rtol=1e-4, atol=1e-6)
        self._assert_params_match(single, double)
        self._assert_eval_cycle_matches(single, double)

        # FSDP variant: params + Adam moments sharded over 'data' across
        # BOTH processes — trajectory must be identical, the eval hook must
        # host-gather the non-addressable shards, and the 2-process
        # checkpoint save (collective host gather, proc-0 write) must
        # round-trip the same params
        fsdp = self._run_double(tmp_path, port=19733, tag="f",
                                extra=("--fsdp",))
        np.testing.assert_allclose(single["losses"], fsdp["losses"],
                                   rtol=1e-4, atol=1e-6)
        self._assert_params_match(single, fsdp)
        self._assert_eval_cycle_matches(single, fsdp)
        from rscotr_tpu.engine.checkpoint import load_checkpoint
        ck = load_checkpoint(fsdp["ckpt"])
        self._assert_params_match(single, ck)
        assert ck["meta"]["iter"] == 4
        best = load_checkpoint(fsdp["best_ckpt"])
        assert "best_score" in best["meta"]
