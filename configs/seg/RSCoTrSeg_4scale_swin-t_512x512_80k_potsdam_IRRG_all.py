# Single-task Potsdam segmentation (capability-equivalent of the reference
# configs/seg/RSCoTrSeg_3scale_swin...py). Expressed as an MTL model with
# only the seg head; the shared encoder is then exclusively the seg path's
# pixel-decoder encoder (the reference's standalone RSCoTrSegPixelDecoder
# owns a 3-level encoder; the MTL-form here runs the 4-level neck variant).
_base_ = "../multi/MTL_slvlcls_swin-t-p4-w7_1x1_resisc_dior_potsdam.py"

model = dict(
    cls_head=None,
    bbox_head=None,
    task_weight=dict(_delete_=True, seg=1),
    train_cfg=dict(_delete_=True, seg=dict()),
    test_cfg=dict(seg=dict(mode="whole")),
)

data = dict(
    _delete_=True,
    potsdam=dict(task="seg",
                 config="configs/_base_/seg/potsdam_IRRG_all.py",
                 data=dict(samples_per_gpu=2),
                 loader=dict(seg_size=512, seg_pad_val=5)),
)

optimizer = dict(type="AdamW", lr=1e-4, weight_decay=0.0001,
                 paramwise_cfg=dict(custom_keys={
                     "backbone": dict(lr_mult=0.1),
                     "query_embed": dict(decay_mult=0.0),
                     "query_feat": dict(decay_mult=0.0),
                     "level_embed": dict(decay_mult=0.0)}))
lr_config = dict(policy="poly", power=0.9, min_lr=0.0, max_iters=80000)
runner = dict(type="IterBasedRunner", max_iters=80000)
evaluation = dict(interval=8000,
                  save_best={"potsdam.mFscore": 1},
                  seg=dict(metric=["mFscore", "mIoU"], classwise=True))
