# RESISC45 classification: folder dataset, 224x224, RandAugment recipe.
# Capability-equivalent of the reference configs/_base_/cls/resisc_swin_224.py.
_base_ = ["./rand_aug.py"]

dataset_type = "CustomDataset"
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)

train_pipeline = [
    dict(type="LoadImageFromFile"),
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

test_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="Resize", size=(224, 224), keep_ratio=False,
         interpolation="bicubic"),
    dict(type="Normalize", **img_norm_cfg),
]

data = dict(
    samples_per_gpu=16,
    workers_per_gpu=8,
    train=dict(type=dataset_type, data_prefix="data/NWPU-RESISC45/train",
               pipeline=train_pipeline),
    val=dict(type=dataset_type, data_prefix="data/NWPU-RESISC45/val",
             pipeline=test_pipeline),
    test=dict(type=dataset_type, data_prefix="data/NWPU-RESISC45/test",
              pipeline=test_pipeline),
)

evaluation = dict(interval=10, metric="accuracy")
