# Det-only slice of the flagship synthetic config: the real flagship model
# driven by ONLY the DIOR-shaped synthetic stream. Used to measure the
# K-step scanned dispatch (runner.steps_per_dispatch) against the det
# device-step time without the cls/seg input-pipeline cost of this 1-core
# host contaminating the wall clock (PERF.md "scanned dispatch" section).
_base_ = "MTL_synthetic_flagship.py"

data = dict(
    _delete_=True,
    dior=dict(
        task="det",
        data=dict(samples_per_gpu=1,
                  train=dict(type="SyntheticDetDataset", length=64,
                             img_size=800, num_classes=20, max_boxes=50),
                  val=dict(type="SyntheticDetDataset", length=8,
                           img_size=800, num_classes=20, max_boxes=50,
                           seed=1)),
        loader=dict(det_bucket_hw=(800, 800), max_gt=100)),
)

runner = dict(type="IterBasedRunner", max_iters=64)
checkpoint_config = dict(interval=10 ** 9)
log_config = dict(interval=8)
evaluation = dict(interval=10 ** 9)
