# Tiny synthetic config with the cls augment tail on DEVICE
# (loader.cls_device_augment): CI smoke for the full wiring —
# DeviceAugmentPlanner -> collate_cls_aug -> jitted cls step running
# ops/device_augment. See MTL_synthetic_flagship_devaug.py for the
# flagship-scale A/B twin.
_base_ = "MTL_tiny_synthetic.py"

cls_train_pipeline = [
    dict(type="RandomResizedCrop", size=128, interpolation="bicubic"),
    dict(type="RandomFlip", flip_prob=0.5, direction="horizontal"),
    dict(type="RandAugment", num_policies=2, total_level=10,
         magnitude_level=9, magnitude_std=0.5),
    dict(type="RandomErasing", erase_prob=0.25, mode="rand",
         fill_color=[104, 116, 124], fill_std=[0, 0, 0]),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53],
         std=[58.395, 57.12, 57.375]),
]

data = dict(
    resisc=dict(
        data=dict(train=dict(img_size=160, pipeline=cls_train_pipeline)),
        loader=dict(cls_size=128, cls_device_augment=True,
                    cls_src_size=160))
)
