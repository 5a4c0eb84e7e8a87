# Tiny synthetic config with ALL THREE train augment tails on DEVICE
# ({cls,det,seg}_device_augment): CI smoke for the full wiring —
# {Device,Det,Seg}DeviceAugmentPlanner -> collate_{cls,det,seg}_aug ->
# jitted steps running ops/device_augment. See
# MTL_synthetic_flagship_devaug.py for the flagship-scale A/B twin.
_base_ = "MTL_tiny_synthetic.py"

img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375])

cls_train_pipeline = [
    dict(type="RandomResizedCrop", size=128, interpolation="bicubic"),
    dict(type="RandomFlip", flip_prob=0.5, direction="horizontal"),
    dict(type="RandAugment", num_policies=2, total_level=10,
         magnitude_level=9, magnitude_std=0.5),
    dict(type="RandomErasing", erase_prob=0.25, mode="rand",
         fill_color=[104, 116, 124], fill_std=[0, 0, 0]),
    dict(type="Normalize", **img_norm_cfg),
]

# the reference MTL det tail (Resize keep_ratio + flip) at tiny scale
det_train_pipeline = [
    dict(type="Resize", img_scale=(426, 256), keep_ratio=True),
    dict(type="RandomFlip", flip_ratio=0.5),
    dict(type="Normalize", **img_norm_cfg),
]

# the reference seg tail (ratio resize / crop / flip / photometric)
seg_train_pipeline = [
    dict(type="Resize", img_scale=(128, 128), ratio_range=(0.5, 2.0)),
    dict(type="RandomCrop", crop_size=(128, 128), cat_max_ratio=0.75,
         ignore_index=255),
    dict(type="RandomFlip", prob=0.5),
    dict(type="PhotoMetricDistortion"),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size=(128, 128), pad_val=0, seg_pad_val=5),
]

data = dict(
    resisc=dict(
        data=dict(train=dict(img_size=160, pipeline=cls_train_pipeline)),
        loader=dict(cls_size=128, cls_device_augment=True,
                    cls_src_size=160)),
    dior=dict(
        data=dict(train=dict(pipeline=det_train_pipeline)),
        loader=dict(det_bucket_hw=(256, 256), max_gt=20,
                    det_device_augment=True)),
    potsdam=dict(
        data=dict(train=dict(pipeline=seg_train_pipeline)),
        loader=dict(seg_size=128, seg_pad_val=5,
                    seg_device_augment=True)),
)
