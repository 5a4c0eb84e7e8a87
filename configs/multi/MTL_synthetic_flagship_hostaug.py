# Flagship-shaped synthetic workload WITH the real RESISC cls train
# pipeline running on the host (256px synthetic images -> RandomResizedCrop
# 224 / RandomFlip / RandAugment / RandomErasing / Normalize). This is the
# configuration PERF.md's "cls host prep ~25 ms/img" bottleneck was
# measured on; pair with MTL_synthetic_flagship_devaug.py for the
# host-vs-device augmentation A/B.
_base_ = ["MTL_synthetic_flagship.py", "../_base_/cls/rand_aug.py"]

img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375])

cls_train_pipeline = [
    dict(type="RandomResizedCrop", size=224, interpolation="bicubic"),
    dict(type="RandomFlip", flip_prob=0.5, direction="horizontal"),
    dict(type="RandAugment", policies={{_base_.rand_increasing_policies}},
         num_policies=2, total_level=10,
         magnitude_level=9, magnitude_std=0.5),
    dict(type="RandomErasing", erase_prob=0.25, mode="rand",
         min_area_ratio=0.02, max_area_ratio=1 / 3,
         fill_color=[104, 116, 124], fill_std=[0, 0, 0]),
    dict(type="Normalize", **img_norm_cfg),
]

det_train_pipeline = [
    dict(type="Resize", img_scale=(1333, 800), keep_ratio=True),
    dict(type="RandomFlip", flip_ratio=0.5),
    dict(type="Normalize", **img_norm_cfg),
]

seg_train_pipeline = [
    dict(type="Resize", img_scale=(512, 512), ratio_range=(0.5, 2.0)),
    dict(type="RandomCrop", crop_size=(512, 512), cat_max_ratio=0.75,
         ignore_index=255),
    dict(type="RandomFlip", prob=0.5),
    dict(type="PhotoMetricDistortion"),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size=(512, 512), pad_val=0, seg_pad_val=5),
]

data = dict(
    resisc=dict(
        data=dict(train=dict(img_size=256, pipeline=cls_train_pipeline))),
    dior=dict(
        data=dict(train=dict(pipeline=det_train_pipeline))),
    potsdam=dict(
        data=dict(train=dict(pipeline=seg_train_pipeline))),
)
