# Tiny synthetic-data MTL config: CI smoke runs and the bench harness.
# Full flagship architecture topology at reduced width/depth, synthetic
# datasets for all three tasks — runs anywhere with zero data downloads.
_base_ = "default_runtime.py"

model = dict(
    type="MTL",
    backbone=dict(type="SwinTransformer", embed_dims=32,
                  depths=[1, 1, 2, 1], num_heads=[1, 2, 4, 4],
                  window_size=7, drop_path_rate=0.0),
    neck=dict(type="ChannelMapper", in_channels=[64, 128, 256],
              kernel_size=1, out_channels=64,
              norm_cfg=dict(type="GN", num_groups=8), num_outs=4),
    shared_encoder=dict(
        type="DetrTransformerEncoder", num_layers=2,
        transformerlayers=dict(
            attn_cfgs=dict(type="MultiScaleDeformableAttention",
                           embed_dims=64, num_levels=4, num_heads=4,
                           dropout=0.0),
            ffn_cfgs=dict(feedforward_channels=128, ffn_drop=0.0))),
    cls_head=dict(type="SlvlClsHead", num_classes=45, in_channels=256,
                  loss=dict(type="LabelSmoothLoss", label_smooth_val=0.1)),
    bbox_head=dict(
        type="DINOHead", num_query=60, num_classes=20,
        num_feature_levels=4, sync_cls_avg_factor=True,
        dn_cfg=dict(noise_scale=dict(label=0.5, box=1.0),
                    group_cfg=dict(dynamic=True, num_dn_queries=20)),
        transformer=dict(decoder=dict(
            num_layers=2,
            transformerlayers=dict(
                attn_cfgs=[dict(embed_dims=64, num_heads=4),
                           dict(embed_dims=64, num_heads=4)],
                ffn_cfgs=dict(feedforward_channels=128)))),
        positional_encoding=dict(temperature=20),
        loss_cls=dict(alpha=0.25, gamma=2.0, loss_weight=1.0),
        loss_bbox=dict(loss_weight=5.0),
        loss_iou=dict(loss_weight=2.0)),
    seg_head=dict(
        type="Mask2FormerHead", in_channels=[32, 64, 128, 256],
        scheme=2, feat_channels=64, out_channels=64, num_classes=5,
        num_queries=16, num_transformer_feat_level=4,
        transformer_decoder=dict(
            num_layers=3,
            transformerlayers=dict(attn_cfgs=dict(num_heads=4),
                                   ffn_cfgs=dict(
                                       feedforward_channels=128))),
        positional_encoding=dict(temperature=10000)),
    task_weight=dict(cls=1, det=1, seg=0.1),
    train_cfg=dict(
        cls=dict(augments=[dict(type="BatchMixup", alpha=0.8,
                                num_classes=45, prob=0.5)]),
        det=dict(assigner=dict(
            cls_cost=dict(weight=2.0), reg_cost=dict(weight=5.0),
            iou_cost=dict(weight=2.0)))),
    test_cfg=dict(det=dict(max_per_img=50), seg=dict(mode="whole")),
)

data = dict(
    resisc=dict(
        task="cls",
        data=dict(samples_per_gpu=4,
                  train=dict(type="SyntheticClsDataset", length=32,
                             img_size=128, num_classes=45),
                  val=dict(type="SyntheticClsDataset", length=16,
                           img_size=128, num_classes=45, seed=1)),
        loader=dict(cls_size=128)),
    dior=dict(
        task="det",
        data=dict(samples_per_gpu=1,
                  train=dict(type="SyntheticDetDataset", length=16,
                             img_size=256, num_classes=20, max_boxes=8),
                  val=dict(type="SyntheticDetDataset", length=8,
                           img_size=256, num_classes=20, max_boxes=8,
                           seed=1)),
        loader=dict(det_bucket_hw=(256, 256), max_gt=20)),
    potsdam=dict(
        task="seg",
        data=dict(samples_per_gpu=2,
                  train=dict(type="SyntheticSegDataset", length=16,
                             img_size=128, num_classes=5),
                  val=dict(type="SyntheticSegDataset", length=8,
                           img_size=128, num_classes=5, seed=1)),
        loader=dict(seg_size=128, seg_pad_val=5)),
)

optimizer = dict(
    type="AdamW", lr=1e-4, weight_decay=0.0001,
    paramwise_cfg=dict(custom_keys={
        "backbone": dict(lr_mult=0.1),
        "query_embed": dict(decay_mult=0.0),
        "query_feat": dict(decay_mult=0.0),
        "level_embed": dict(decay_mult=0.0)}))
optimizer_config = dict(grad_clip=dict(max_norm=0.1, norm_type=2))

lr_config = dict(policy="step", step=[80, 90])
runner = dict(type="IterBasedRunner", max_iters=100)
checkpoint_config = dict(interval=100)
log_config = dict(interval=10)

evaluation = dict(
    interval=100,
    save_best={"resisc.accuracy_top-1": 1, "dior.bbox_mAP": 100,
               "potsdam.mFscore": 100},
    cls=dict(topk=(1,)),
    det=dict(metric="bbox", iou_thrs=[0.5]),
    seg=dict(metric=["mFscore", "mIoU"]),
)
