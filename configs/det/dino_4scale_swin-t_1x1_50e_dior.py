# Single-task DIOR detection: DINO-4scale with Swin-T (capability-equivalent
# of the reference configs/det/dino_4scale_swin-t...py). Expressed as an MTL
# model with only the bbox head, so the encoder is exclusively the det
# path's — functionally the reference's standalone DINO whose own encoder
# becomes the MTL task-pretrain source (rule 'dino_mmdet').
_base_ = "../multi/MTL_slvlcls_swin-t-p4-w7_1x1_resisc_dior_potsdam.py"

model = dict(
    cls_head=None,
    seg_head=None,
    task_weight=dict(_delete_=True, det=1),
    train_cfg=dict(_delete_=True, det=dict(assigner=dict(
        type="HungarianAssigner",
        cls_cost=dict(type="FocalLossCost", weight=2.0),
        reg_cost=dict(type="BBoxL1Cost", weight=5.0, box_format="xywh"),
        iou_cost=dict(type="IoUCost", iou_mode="giou", weight=2.0)))),
    test_cfg=dict(det=dict(max_per_img=300)),
)

data = dict(
    _delete_=True,
    dior=dict(task="det",
              config="configs/_base_/det/dior.py",
              data=dict(samples_per_gpu=1),
              loader=dict(det_bucket_hw=(800, 800), max_gt=100,
                          device_preprocess=True,
                          det_device_augment=True)),
)

optimizer = dict(type="AdamW", lr=1e-4, weight_decay=0.0001,
                 paramwise_cfg=dict(custom_keys={
                     "backbone": dict(lr_mult=0.1)}))
# reference schedule verbatim (dino_4scale_r50_1x1_50e_dior.py:191-192 +
# _base_/det/dior.py:57-62, _base_/det/default_runtime.py:1): epoch-based;
# apis.resolve_schedule converts epochs -> iters from the loader length
lr_config = dict(policy="step", step=[45])
runner = dict(type="EpochBasedRunner", max_epochs=50)
checkpoint_config = dict(interval=5)
evaluation = dict(interval=1,
                  save_best={"dior.bbox_mAP_50": 1},
                  det=dict(metric="bbox", iou_thrs=[0.5], classwise=True))
