# Potsdam IRRG segmentation: 512x512 crops, ratio-range resize,
# PhotoMetricDistortion; seg padding value 5 = clutter = eval ignore_index.
# Capability-equivalent of the reference configs/_base_/seg/potsdam_IRRG_all.py.
dataset_type = "PotsdamDataset"
data_root = "data/potsdam"
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
crop_size = (512, 512)

train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="Resize", img_scale=(512, 512), ratio_range=(0.5, 2.0)),
    dict(type="RandomCrop", crop_size=crop_size, cat_max_ratio=0.75,
         ignore_index=255),
    dict(type="RandomFlip", prob=0.5),
    dict(type="PhotoMetricDistortion"),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size=crop_size, pad_val=0, seg_pad_val=5),
]
test_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="Resize", img_scale=(512, 512), keep_ratio=True),
    dict(type="Normalize", **img_norm_cfg),
]

data = dict(
    samples_per_gpu=8,
    workers_per_gpu=8,
    train=dict(type=dataset_type, data_root=data_root,
               img_dir="img_IRRG/train", ann_dir="ann_all/train",
               ignore_index=5, pipeline=train_pipeline),
    val=dict(type=dataset_type, data_root=data_root,
             img_dir="img_IRRG/val", ann_dir="ann_all/val",
             ignore_index=5, pipeline=test_pipeline),
    test=dict(type=dataset_type, data_root=data_root,
              img_dir="img_IRRG/val", ann_dir="ann_all/val",
              ignore_index=5, pipeline=test_pipeline),
)
