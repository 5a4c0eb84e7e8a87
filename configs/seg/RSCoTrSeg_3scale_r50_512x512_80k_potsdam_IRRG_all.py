# Single-task Potsdam segmentation: RSCoTrSeg with ResNet-50 and a 3-level
# deformable pixel-decoder encoder (capability-equivalent of the reference
# configs/seg/RSCoTrSeg_3scale_r50_512x512_80k_potsdam_IRRG_all.py).
# Standalone model type: the head's pixel decoder OWNS its encoder and
# projects raw backbone levels with input convs (reference
# models/seg/rscotr_seg_pixel_decoder.py:49-68).
_base_ = ["../_base_/seg/schedule_80k.py",
          "../_base_/seg/default_runtime.py"]

num_classes = 5
model = dict(
    type="RSCoTrSeg",
    backbone=dict(
        type="ResNet",
        depth=50,
        num_stages=4,
        out_indices=(0, 1, 2, 3),
        frozen_stages=-1,
        norm_eval=True,
        init_cfg=dict(type="Pretrained",
                      checkpoint="torchvision://resnet50")),
    encoder=dict(
        type="DetrTransformerEncoder", num_layers=6,
        transformerlayers=dict(
            attn_cfgs=dict(type="MultiScaleDeformableAttention",
                           embed_dims=256, num_levels=3, dropout=0.0),
            ffn_cfgs=dict(feedforward_channels=1024, ffn_drop=0.0))),
    decode_head=dict(
        type="Mask2FormerHead",
        in_channels=[256, 512, 1024, 2048],
        feat_channels=256,
        out_channels=256,
        num_classes=num_classes,
        num_queries=100,
        num_transformer_feat_level=3,
        scheme=2,
        transformer_decoder=dict(
            num_layers=9,
            transformerlayers=dict(
                attn_cfgs=dict(num_heads=8),
                ffn_cfgs=dict(feedforward_channels=2048))),
        positional_encoding=dict(temperature=10000)),
    test_cfg=dict(seg=dict(mode="whole")),
)

data = dict(
    potsdam=dict(task="seg",
                 config="configs/_base_/seg/potsdam_IRRG_all.py",
                 data=dict(samples_per_gpu=2),
                 loader=dict(seg_size=512, seg_pad_val=5,
                             device_preprocess=True,
                             seg_device_augment=True)),
)

optimizer = dict(_delete_=True, type="AdamW", lr=1e-4, weight_decay=0.0001,
                 paramwise_cfg=dict(custom_keys={
                     "backbone": dict(lr_mult=0.1),
                     "query_embed": dict(decay_mult=0.0),
                     "query_feat": dict(decay_mult=0.0),
                     "level_embed": dict(decay_mult=0.0)}))
optimizer_config = dict(grad_clip=dict(max_norm=0.01, norm_type=2))
lr_config = dict(_delete_=True, policy="poly", power=0.9, min_lr=0.0, max_iters=80000)
runner = dict(type="IterBasedRunner", max_iters=80000)
checkpoint_config = dict(interval=8000)
evaluation = dict(interval=8000,
                  save_best={"potsdam.mFscore": 1},
                  seg=dict(metric=["mFscore", "mIoU"], pre_eval=True,
                           classwise=True))
