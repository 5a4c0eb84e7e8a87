# Flagship-shaped synthetic config: the REAL flagship model (Swin-T, 6-layer
# shared encoder, 600-query DINO, Mask2Former) at the real co-training
# shapes (16x224 cls / 1x800 det / 2x512 seg), with synthetic datasets so
# the full tools/train.py loop — MultiDataLoader, prefetch, jitted steps,
# hooks, checkpointing — can be driven end-to-end on real hardware with
# zero downloads. Used for measuring wall-clock training throughput
# including the host input pipeline (PERF.md).
_base_ = "MTL_slvlcls_swin-t-p4-w7_1x1_resisc_dior_potsdam.py"

data = dict(
    _delete_=True,
    resisc=dict(
        task="cls",
        data=dict(samples_per_gpu=16, test_samples_per_gpu=8,
                  train=dict(type="SyntheticClsDataset", length=256,
                             img_size=224, num_classes=45),
                  val=dict(type="SyntheticClsDataset", length=32,
                           img_size=224, num_classes=45, seed=1)),
        loader=dict(cls_size=224)),
    dior=dict(
        task="det",
        data=dict(samples_per_gpu=1, test_samples_per_gpu=4,
                  # max_boxes 18: DIOR-like per-image GT counts (typical
                  # ceiling ~20). The uniform(1, 50) draw used before
                  # made 60% of batches cross the CDN width ladder's
                  # dn_max_gt=20 boundary, fragmenting K-scan groups and
                  # doubling the compiled-graph set in a way real DIOR
                  # does not (crowded images there are rare).
                  train=dict(type="SyntheticDetDataset", length=64,
                             img_size=800, num_classes=20, max_boxes=18),
                  val=dict(type="SyntheticDetDataset", length=8,
                           img_size=800, num_classes=20, max_boxes=18,
                           seed=1)),
        loader=dict(det_bucket_hw=(800, 800), max_gt=100)),
    potsdam=dict(
        task="seg",
        data=dict(samples_per_gpu=2, test_samples_per_gpu=4,
                  train=dict(type="SyntheticSegDataset", length=64,
                             img_size=512, num_classes=5),
                  val=dict(type="SyntheticSegDataset", length=8,
                           img_size=512, num_classes=5, seed=1)),
        loader=dict(seg_size=512, seg_pad_val=5)),
)

runner = dict(type="IterBasedRunner", max_iters=60)
checkpoint_config = dict(interval=60)
log_config = dict(interval=5)
evaluation = dict(interval=10**9)
