# Per-task runtime defaults for standalone detection runs (reference:
# configs/_base_/det/default_runtime.py — opencv threading /
# mp_start_method are torch-DataLoader concerns with no JAX equivalent;
# auto_scale_lr carries the reference's base batch).
checkpoint_config = dict(interval=5)
log_config = dict(interval=50)
custom_hooks = [dict(type="NumClassCheckHook")]
workflow = [("train", 1)]
log_level = "INFO"
load_from = None
resume_from = None
auto_scale_lr = dict(enable=False, base_batch_size=16)
