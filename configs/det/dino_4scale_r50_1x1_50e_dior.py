# Single-task DIOR detection: DINO-4scale with ResNet-50 (capability-
# equivalent of the reference configs/det/dino_4scale_r50_1x1_50e_dior.py,
# incl. the AutoAugment multi-scale resize / resize-crop-resize train
# pipeline, ibid:110-155). Expressed as an MTL model with only the bbox
# head so the same runtime drives it.
_base_ = "dino_4scale_swin-t_1x1_50e_dior.py"

model = dict(
    backbone=dict(
        _delete_=True,
        type="ResNet",
        depth=50,
        num_stages=4,
        out_indices=(1, 2, 3),
        frozen_stages=1,
        norm_eval=True,
        init_cfg=dict(type="Pretrained",
                      checkpoint="torchvision://resnet50")),
    neck=dict(in_channels=[512, 1024, 2048]),
)

img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="RandomFlip", flip_ratio=0.5),
    dict(
        type="AutoAugment",
        policies=[
            [
                dict(type="Resize",
                     img_scale=[(480, 1333), (512, 1333), (544, 1333),
                                (576, 1333), (608, 1333), (640, 1333),
                                (672, 1333), (704, 1333), (736, 1333),
                                (768, 1333), (800, 1333)],
                     multiscale_mode="value",
                     keep_ratio=True),
            ],
            [
                dict(type="Resize",
                     img_scale=[(400, 4200), (500, 4200), (600, 4200)],
                     multiscale_mode="value",
                     keep_ratio=True),
                dict(type="RandomCrop",
                     crop_type="absolute_range",
                     crop_size=(384, 600),
                     allow_negative_crop=True),
                dict(type="Resize",
                     img_scale=[(480, 1333), (512, 1333), (544, 1333),
                                (576, 1333), (608, 1333), (640, 1333),
                                (672, 1333), (704, 1333), (736, 1333),
                                (768, 1333), (800, 1333)],
                     multiscale_mode="value",
                     override=True,
                     keep_ratio=True),
            ],
        ]),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=1),
]

data = dict(
    dior=dict(data=dict(train=dict(pipeline=train_pipeline)),
              # largest train shape after AutoAugment is 800x1333 keep-ratio
              loader=dict(det_bucket_hw=(800, 1344), max_gt=100,
                          det_src_hw=(800, 800))),
)

optimizer = dict(lr=5e-5)
