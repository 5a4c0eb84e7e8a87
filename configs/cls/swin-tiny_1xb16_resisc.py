# Single-task RESISC45 classification with Swin-T (reference:
# configs/cls/swin-tiny_1xb16_resisc.py, same _base_ composition). Uses
# the MTL model with only the cls head configured, so the same runtime
# drives it. Epoch-based schedule kept verbatim from the reference;
# apis.resolve_schedule converts epochs -> iters from the loader length.
_base_ = [
    "../_base_/cls/swin-tiny.py",
    "../_base_/cls/resisc_adamw_swin.py",
    "../_base_/cls/default_runtime.py",
]

model = dict(
    cls_head=dict(num_classes=45),
    train_cfg=dict(cls=dict(augments=[
        dict(type="BatchMixup", alpha=0.8, num_classes=45, prob=0.5),
        dict(type="BatchCutMix", alpha=1.0, num_classes=45, prob=0.5)])),
)

data = dict(
    resisc=dict(task="cls",
                config="configs/_base_/cls/resisc_swin_224.py",
                data=dict(samples_per_gpu=16),
                loader=dict(cls_size=224, device_preprocess=True,
                            cls_device_augment=True,
                            cls_src_size=256)),
)

checkpoint_config = dict(interval=50)
optimizer = dict(_delete_=True, type="AdamW", lr=1e-4, weight_decay=0.05,
                 paramwise_cfg=dict(custom_keys={
                     "backbone": dict(lr_mult=1.0)}))
optimizer_config = dict(grad_clip=dict(max_norm=5.0))
# reference swin-tiny_1xb16_resisc.py:19-22 verbatim (epochs)
lr_config = dict(_delete_=True, policy="step", step=[150])
runner = dict(type="EpochBasedRunner", max_epochs=200)
evaluation = dict(interval=1,
                  save_best={"resisc.accuracy_top-1": 1},
                  cls=dict(metric="accuracy"))
