# Per-task runtime defaults for standalone classification runs (reference:
# configs/_base_/cls/default_runtime.py). Distributed init is
# jax.distributed + mesh sharding — no NCCL dist_params needed.
checkpoint_config = dict(interval=1)
log_config = dict(interval=100)
workflow = [("train", 1)]
log_level = "INFO"
load_from = None
resume_from = None
