# Per-task runtime defaults for standalone segmentation runs (reference:
# configs/_base_/seg/default_runtime.py; cudnn_benchmark is a torch knob
# with no JAX equivalent — XLA autotunes convolutions per shape).
checkpoint_config = dict(interval=8000)
log_config = dict(interval=50)
workflow = [("train", 1)]
log_level = "INFO"
load_from = None
resume_from = None
