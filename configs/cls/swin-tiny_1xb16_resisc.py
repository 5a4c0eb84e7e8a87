# Single-task RESISC45 classification with Swin-T (capability-equivalent of
# the reference configs/cls/swin-tiny_1xb16_resisc.py). Uses the MTL model
# with only the cls head configured, so the same runtime drives it.
_base_ = "../multi/default_runtime.py"

model = dict(
    type="MTL",
    backbone=dict(
        type="SwinTransformer", embed_dims=96, depths=[2, 2, 6, 2],
        num_heads=[3, 6, 12, 24], window_size=7, drop_path_rate=0.2,
        patch_norm=True, out_indices=(0, 1, 2, 3)),
    neck=None,
    shared_encoder=dict(
        type="DetrTransformerEncoder", num_layers=1,
        transformerlayers=dict(
            attn_cfgs=dict(type="MultiScaleDeformableAttention",
                           embed_dims=256, num_levels=4),
            ffn_cfgs=dict(feedforward_channels=1024))),
    cls_head=dict(
        type="SlvlClsHead", num_classes=45, in_channels=768,
        loss=dict(type="LabelSmoothLoss", label_smooth_val=0.1,
                  mode="original")),
    task_weight=dict(cls=1),
    train_cfg=dict(cls=dict(augments=[
        dict(type="BatchMixup", alpha=0.8, num_classes=45, prob=0.5),
        dict(type="BatchCutMix", alpha=1.0, num_classes=45, prob=0.5)])),
    test_cfg=dict(cls=dict()),
)

data = dict(
    resisc=dict(task="cls",
                config="configs/_base_/cls/resisc_swin_224.py",
                data=dict(samples_per_gpu=16),
                loader=dict(cls_size=224)),
)

optimizer = dict(type="AdamW", lr=1e-4, weight_decay=0.05,
                 paramwise_cfg=dict(custom_keys={
                     "backbone": dict(lr_mult=1.0)}))
optimizer_config = dict(grad_clip=dict(max_norm=5.0))
lr_config = dict(policy="step", step=[60000, 80000])
runner = dict(type="IterBasedRunner", max_iters=90000)
evaluation = dict(interval=5000,
                  save_best={"resisc.accuracy_top-1": 1},
                  cls=dict(metric="accuracy"))
