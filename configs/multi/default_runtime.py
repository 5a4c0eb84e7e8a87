# Runtime defaults (capability-equivalent of the reference's
# configs/multi/default_runtime.py: logging/checkpoint cadence, workflow).
# Distributed init is jax.distributed — no NCCL dist_params needed.
checkpoint_config = dict(interval=5000)
log_config = dict(interval=50)
workflow = [("train", 1)]
log_level = "INFO"
load_from = None
resume_from = None
