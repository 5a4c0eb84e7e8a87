"""Standalone multi-process DP training trajectory (test helper).

Launched by tests/test_multihost_train.py as 1 or 2 OS processes over a
virtual CPU mesh (gloo collectives): each process runs the REAL stack —
rank-strided TaskDataLoader, IterBasedRunner with a global mesh,
make_train_step — for a few steps and dumps the loss trajectory + final
params. The 2-process run must match the 1-process run on the same
global batch stream (VERDICT round-1 item #2 'done' criterion).

Must be runnable with a bare interpreter: env is configured BEFORE jax
imports, and the axon TPU plugin env is stripped (CLAUDE.md gotcha).
"""

import argparse
import os
import pickle
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--coordinator", default="localhost:9911")
    ap.add_argument("--local-devices", type=int, default=8)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--global-batch", type=int, default=8)
    ap.add_argument("--out", required=True)
    ap.add_argument("--fsdp", action="store_true",
                    help="shard params + moments over 'data' "
                         "(parallel/fsdp.py) instead of replicating")
    args = ap.parse_args()

    for k in list(os.environ):
        if k.startswith(("PALLAS_AXON", "AXON_")):
            del os.environ[k]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") +
        f" --xla_force_host_platform_device_count={args.local_devices}"
    ).strip()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    if args.num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id)

    import numpy as np
    import jax.numpy as jnp
    import flax.linen as nn

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    from rscotr_tpu.data import MultiDataLoader, TaskDataLoader, \
        strategies_map
    from rscotr_tpu.engine import (IterBasedRunner, TrainStepConfig,
                                   build_optimizer, make_train_step)
    from rscotr_tpu.parallel import make_mesh, replicate_global

    class MiniCls(nn.Module):
        # hidden width divisible by the device count so the FSDP variant
        # actually shards both kernels (3x64 on dim 1, 64x7 on dim 0)
        num_classes: int = 7
        hidden: int = 64

        def setup(self):
            self.proj = nn.Dense(self.hidden)
            self.head = nn.Dense(self.num_classes)

        def __call__(self, img, deterministic=True):
            return self.forward_cls(img, deterministic)

        def forward_cls(self, img, deterministic=True):
            h = nn.relu(self.proj(img.mean(axis=(1, 2))))
            return self.head(h)

    class Ds:
        task = "cls"
        CLASSES = tuple(f"c{i}" for i in range(7))

        def __len__(self):
            return 32

        def __getitem__(self, idx):
            rng = np.random.Generator(np.random.PCG64(idx))
            return {"img": rng.uniform(0, 1, (8, 8, 3)).astype(np.float32),
                    "gt_label": np.int32(idx % 7)}

    def collate(samples):
        return {"img": np.stack([s["img"] for s in samples]),
                "gt_label": np.asarray(
                    [s["gt_label"] for s in samples], np.int32)}

    pc = jax.process_count()
    assert pc == args.num_processes, (pc, args.num_processes)
    assert len(jax.devices()) == args.local_devices * args.num_processes

    bs_host = args.global_batch // pc
    dl = TaskDataLoader(Ds(), bs_host, collate_fn=collate, num_threads=1,
                        shuffle=True, seed=7,
                        num_replicas=pc, rank=jax.process_index())
    loaders = {"resisc": dl}
    ml = MultiDataLoader(loaders, strategies_map["round_robin"](loaders))

    model = MiniCls()
    params = model.init(jax.random.key(0),
                        jnp.zeros((args.global_batch, 8, 8, 3)))
    cfg = TrainStepConfig(task_weight={"cls": 1.0}, cls_num_classes=7,
                          cls_use_augments=False)
    opt = build_optimizer(dict(type="AdamW", lr=1e-2, weight_decay=1e-4),
                          params["params"],
                          lr_config=dict(policy="fixed"))
    opt_state = opt.init(params["params"])

    mesh = make_mesh()
    if args.fsdp:
        from rscotr_tpu.parallel import (fsdp_param_specs,
                                         shard_opt_state_fsdp,
                                         shard_params_fsdp)
        specs = fsdp_param_specs(params["params"], mesh, min_leaf_size=1)
        params = shard_params_fsdp(params, mesh, min_leaf_size=1)
        opt_state = shard_opt_state_fsdp(opt_state, specs, mesh)
    else:
        params = replicate_global(params, mesh)
        opt_state = replicate_global(opt_state, mesh)

    steps = {"cls": make_train_step(model, opt, "cls", cfg, donate=False)}
    losses = []

    from rscotr_tpu.engine.hooks import Hook, MultiDatasetsEvalHook
    from rscotr_tpu.engine.test import (adaptive_process_test,
                                        evaluate_results)

    class LossTap(Hook):
        def after_train_iter(self, runner):
            losses.append(float(np.asarray(
                runner.log_vars["cls.resisc.loss"].addressable_data(0)
                if hasattr(runner.log_vars["cls.resisc.loss"],
                           "addressable_data")
                else runner.log_vars["cls.resisc.loss"])))

        def after_run(self, runner):
            pass

    # train-time eval + save-best over the SAME topology (VERDICT r2 #2):
    # every process enters eval_fn together; adaptive_process_test strides
    # the batches across processes (and host-gathers FSDP-sharded params),
    # so the metrics — and hence the save-best decision — are identical on
    # every process and to the 1-process run.
    class ValDs:
        task = "cls"
        CLASSES = Ds.CLASSES

        def __len__(self):
            return 16

        def evaluate(self, results, **kw):
            labels = np.asarray([i % 7 for i in range(len(results))])
            pred = np.asarray([np.argmax(r) for r in results])
            return {"accuracy": float((pred == labels).mean() * 100.0)}

    def val_collate(idxs):
        ds = Ds()
        return collate([ds[i] for i in idxs])

    class ValLoader:
        """Deterministic sequential loader (each process sees ALL batches;
        striding happens inside adaptive_process_test)."""
        batch_size = 4
        dataset = ValDs()

        def __iter__(self):
            for s in range(0, 16, 4):
                yield val_collate(range(s, s + 4))

    import jax.numpy as _jnp

    @jax.jit
    def cls_infer(p, img):
        return jax.nn.softmax(
            model.apply(p, img, deterministic=True,
                        method=model.forward_cls), -1)

    val_loaders = {"resisc_val": ValLoader()}
    eval_metrics = []

    def eval_fn(runner):
        results = adaptive_process_test({"cls": cls_infer}, runner.params,
                                        val_loaders)
        m = evaluate_results({"resisc_val": ValDs()}, results,
                             {"cls": {}, "det": {}, "seg": {}})
        eval_metrics.append(m)
        return m

    with mesh:
        runner = IterBasedRunner(steps, params, opt_state, args.steps,
                                 mesh=mesh, prefetch=0)
        runner.register_hook(LossTap())
        runner.register_hook(MultiDatasetsEvalHook(
            eval_fn, interval=2,
            save_best={"resisc_val.accuracy": 1.0},
            work_dir=os.path.abspath(args.out) + "_wd"))
        runner.run(ml)

    # full host values on every process (collective for FSDP shards)
    from rscotr_tpu.engine.checkpoint import gather_to_host, save_checkpoint
    final = gather_to_host(runner.params)
    # exercise the multi-host checkpoint path: every process calls (the
    # gather inside is a collective), process 0 writes
    ckpt = save_checkpoint(os.path.abspath(args.out) + "_wd",
                           runner.step, runner.params, runner.opt_state)
    best = os.path.join(os.path.abspath(args.out) + "_wd",
                        "best_checkpoint")
    if jax.process_index() == 0:
        with open(args.out, "wb") as f:
            pickle.dump({"losses": losses, "params": final,
                         "ckpt": ckpt, "eval_metrics": eval_metrics,
                         "best_ckpt": best if os.path.isdir(best)
                         else None}, f)
    # multi-process teardown can hang on this host; results are on disk
    if args.num_processes > 1:
        try:
            jax.distributed.shutdown()
        except Exception:
            pass
    os._exit(0)


if __name__ == "__main__":
    main()
