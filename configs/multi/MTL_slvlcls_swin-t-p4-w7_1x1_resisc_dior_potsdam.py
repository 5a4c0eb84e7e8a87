# Flagship MTL co-training config: Swin-T + ChannelMapper + shared 6-layer
# deformable encoder + {SlvlClsHead(45), DINOHead(600q, 20cls, CDN),
# Mask2FormerHead(scheme 2, 100q, 5cls)} on RESISC45 + DIOR + Potsdam.
# Capability-equivalent of the reference's
# configs/multi/MTL_slvlcls_swin-t-p4-w7_1x1_resisc&dior&potsdam.py
# ('&' replaced by '_' in the filename for shell friendliness; an alias file
# with the original name also exists).
_base_ = "default_runtime.py"

backbone_pretrained = None  # set to a converted Swin-T checkpoint path
det_pretrained = None       # set to a converted single-task DINO checkpoint

model = dict(
    type="MTL",
    # TPU-natural AMP: bf16 activations/matmuls, f32 params & logits
    # (measured v5e: +20% MTL inference throughput over f32, 2026-08)
    compute_dtype="bfloat16",
    backbone=dict(
        type="SwinTransformer",
        embed_dims=96, depths=[2, 2, 6, 2], num_heads=[3, 6, 12, 24],
        window_size=7, mlp_ratio=4, qkv_bias=True, qk_scale=None,
        drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.2,
        patch_norm=True, out_indices=(0, 1, 2, 3), with_cp=False,
        convert_weights=True,
        init_cfg=dict(type="Pretrained", checkpoint=backbone_pretrained)),
    neck=dict(
        type="ChannelMapper", in_channels=[192, 384, 768], kernel_size=1,
        out_channels=256, act_cfg=None,
        norm_cfg=dict(type="GN", num_groups=32), num_outs=4),
    shared_encoder=dict(
        type="DetrTransformerEncoder", num_layers=6,
        transformerlayers=dict(
            type="BaseTransformerLayer",
            attn_cfgs=dict(type="MultiScaleDeformableAttention",
                           embed_dims=256, num_levels=4, dropout=0.0),
            ffn_cfgs=dict(type="FFN", feedforward_channels=2048,
                          num_fcs=2, ffn_drop=0.0,
                          act_cfg=dict(type="ReLU", inplace=True)),
            operation_order=("self_attn", "norm", "ffn", "norm"))),
    cls_head=dict(
        type="SlvlClsHead", num_classes=45, in_channels=768,
        loss=dict(type="LabelSmoothLoss", label_smooth_val=0.1,
                  mode="original"),
        cal_acc=False),
    bbox_head=dict(
        type="DINOHead", num_query=600, num_classes=20,
        num_feature_levels=4, in_channels=2048, sync_cls_avg_factor=True,
        as_two_stage=True, with_box_refine=True,
        dn_cfg=dict(
            type="CdnQueryGenerator",
            noise_scale=dict(label=0.5, box=1.0),
            group_cfg=dict(dynamic=True, num_groups=None,
                           num_dn_queries=100)),
        transformer=dict(
            type="DinoTransformer",
            decoder=dict(
                type="DinoTransformerDecoder", num_layers=6,
                return_intermediate=True,
                transformerlayers=dict(
                    type="BaseTransformerLayer",
                    attn_cfgs=[
                        dict(type="MultiheadAttention", embed_dims=256,
                             num_heads=8, dropout=0.0),
                        dict(type="MultiScaleDeformableAttention",
                             embed_dims=256, num_levels=4, dropout=0.0),
                    ],
                    ffn_cfgs=dict(type="FFN", feedforward_channels=2048,
                                  num_fcs=2, ffn_drop=0.0,
                                  act_cfg=dict(type="ReLU", inplace=True)),
                    operation_order=("self_attn", "norm", "cross_attn",
                                     "norm", "ffn", "norm")))),
        positional_encoding=dict(type="SinePositionalEncoding",
                                 num_feats=128, temperature=20,
                                 normalize=True),
        loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(type="L1Loss", loss_weight=5.0),
        loss_iou=dict(type="GIoULoss", loss_weight=2.0)),
    seg_head=dict(
        type="Mask2FormerHead", in_channels=[96, 192, 384, 768],
        scheme=2, feat_channels=256, out_channels=256, num_classes=5,
        num_queries=100, num_transformer_feat_level=4, align_corners=False,
        pixel_decoder=dict(
            type="MlvlSegPixelDecoder", num_outs=4,
            norm_cfg=dict(type="GN", num_groups=32),
            act_cfg=dict(type="ReLU"),
            positional_encoding=dict(type="SinePositionalEncoding",
                                     num_feats=128, temperature=10000,
                                     normalize=True)),
        positional_encoding=dict(type="SinePositionalEncoding",
                                 num_feats=128, temperature=10000,
                                 normalize=True),
        transformer_decoder=dict(
            type="DetrTransformerDecoder", num_layers=9,
            return_intermediate=True,
            transformerlayers=dict(
                type="BaseTransformerLayer",
                attn_cfgs=dict(type="MultiheadAttention", embed_dims=256,
                               num_heads=8, attn_drop=0.0, proj_drop=0.0,
                               dropout_layer=None, batch_first=False),
                ffn_cfgs=dict(type="FFN", feedforward_channels=2048,
                              num_fcs=2, ffn_drop=0.0,
                              act_cfg=dict(type="ReLU", inplace=True)),
                operation_order=("cross_attn", "norm", "self_attn", "norm",
                                 "ffn", "norm"))),
        loss_decode=dict(type="CrossEntropyLoss", use_sigmoid=False,
                         loss_weight=1.0)),
    task_weight=dict(cls=1, det=1, seg=0.1),
    train_cfg=dict(
        cls=dict(augments=[
            dict(type="BatchMixup", alpha=0.8, num_classes=45, prob=0.5),
            dict(type="BatchCutMix", alpha=1.0, num_classes=45, prob=0.5)]),
        det=dict(assigner=dict(
            type="HungarianAssigner",
            cls_cost=dict(type="FocalLossCost", weight=2.0),
            reg_cost=dict(type="BBoxL1Cost", weight=5.0,
                          box_format="xywh"),
            iou_cost=dict(type="IoUCost", iou_mode="giou", weight=2.0))),
        seg=dict(),
        task_pretrain=dict(rule="dino_mmdet", pretrained=det_pretrained)),
    test_cfg=dict(cls=dict(), det=dict(max_per_img=300),
                  seg=dict(mode="whole")),
)

# data: two-level composition — per-dataset config files inlined by
# load_data_cfg; loader: TPU static-shape options (det bucket / max_gt).
# All three train augment tails run ON DEVICE by default
# ({cls,det,seg}_device_augment — the host only draws parameters and
# handles labels/boxes; measured 1.71x MTL throughput for the cls tail
# alone, PERF.md). Opt back into host pixel augmentation with e.g.
# --cfg-options data.resisc.loader.cls_device_augment=False.
# device_preprocess stays on for the host-pixel and eval paths (uint8
# H2D + on-device Normalize).
data = dict(
    resisc=dict(
        task="cls",
        config="configs/_base_/cls/resisc_swin_224.py",
        # test_samples_per_gpu: eval batches amortize the per-dispatch
        # tunnel/host overhead that dominates bs=1 eval (PERF.md round-4
        # eval-loop section)
        data=dict(samples_per_gpu=16, test_samples_per_gpu=8),
        loader=dict(cls_size=224, device_preprocess=True,
                    cls_device_augment=True, cls_src_size=256)),
    dior=dict(
        task="det",
        config="configs/_base_/det/dior.py",
        data=dict(samples_per_gpu=1, test_samples_per_gpu=4),
        loader=dict(det_bucket_hw=(800, 800), max_gt=100,
                    device_preprocess=True, det_device_augment=True)),
    potsdam=dict(
        task="seg",
        config="configs/_base_/seg/potsdam_IRRG_all.py",
        data=dict(samples_per_gpu=2, test_samples_per_gpu=4),
        loader=dict(seg_size=512, seg_pad_val=5,
                    device_preprocess=True, seg_device_augment=True)),
)

optimizer = dict(
    type="AdamW", lr=5e-5, weight_decay=0.0001,
    paramwise_cfg=dict(custom_keys={
        "backbone": dict(lr_mult=0.1),
        "query_embed": dict(decay_mult=0.0),
        "query_feat": dict(decay_mult=0.0),
        "level_embed": dict(decay_mult=0.0)}))
optimizer_config = dict(grad_clip=dict(max_norm=0.1, norm_type=2))

lr_config = dict(policy="step", step=[240000, 285000])
# steps_per_dispatch: K same-task steps per jitted lax.scan dispatch —
# amortizes the per-iteration host dispatch (pytree marshalling) that
# dominates on slow hosts (K=1 restores exact per-iter mode). K=16
# measured 1.15x faster than K=8 at soak length (2000 iters, ~1950
# clean iters each — PERF.md round-5 K table).
runner = dict(type="IterBasedRunner", max_iters=300000,
              steps_per_dispatch=16)
checkpoint_config = dict(interval=100000)
log_config = dict(interval=300)

evaluation = dict(
    interval=15000,
    save_best={"resisc.accuracy_top-1": 1, "dior.bbox_mAP": 100,
               "potsdam.mFscore": 100},
    cls=dict(metric="accuracy"),
    det=dict(metric="bbox", iou_thrs=[0.5], classwise=True),
    seg=dict(metric=["mFscore", "mIoU"], pre_eval=True, classwise=True),
)
