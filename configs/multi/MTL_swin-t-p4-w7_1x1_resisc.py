# Single-dataset MTL ablation (mlvl cls head variant): cls only (RESISC45).
# Mirrors /root/reference/configs/multi/MTL_swin-t-p4-w7_1x1_resisc.py
_base_ = "MTL_swin-t-p4-w7_1x1_resisc_dior_potsdam.py"
model = dict(task_weight=dict(cls=1))
data = dict(
    _delete_=True,
    resisc=dict(
        task="cls",
        config="configs/_base_/cls/resisc_swin_224.py",
        data=dict(samples_per_gpu=16),
        loader=dict(cls_size=224, device_preprocess=True,
                    cls_device_augment=True, cls_src_size=256)))

iteration_strategy = dict(_delete_=True, type="round_robin")

optimizer = dict(
    _delete_=True,
    type="AdamW",
    lr=5e-5,
    weight_decay=0.0001,
    paramwise_cfg=dict(
        custom_keys={
            "query_embed": dict(decay_mult=0.0),
            "query_feat": dict(decay_mult=0.0),
            "level_embed": dict(decay_mult=0.0)}))

lr_config = dict(policy="step", step=[60000])
runner = dict(type="IterBasedRunner", max_iters=80000)
checkpoint_config = dict(interval=100000)
log_config = dict(interval=100)

evaluation = dict(
    _delete_=True,
    interval=400,
    save_best={"resisc.accuracy_top-1": 1},
    cls=dict(metric="accuracy"))
