# Swin-T classification model fragment (reference:
# configs/_base_/cls/swin-tiny.py). Ours wraps the single-task classifier
# in the MTL model with only the cls head configured, so the same runtime
# drives standalone and co-trained runs; the ImageNet `pretrained` URL is
# replaced by the offline torch->jax converter
# (tools/convert_checkpoint.py + utils/torch_convert.py).
model = dict(
    type="MTL",
    backbone=dict(
        type="SwinTransformer", embed_dims=96, depths=[2, 2, 6, 2],
        num_heads=[3, 6, 12, 24], window_size=7, drop_path_rate=0.2,
        patch_norm=True, out_indices=(0, 1, 2, 3)),
    neck=None,
    shared_encoder=dict(
        type="DetrTransformerEncoder", num_layers=1,
        transformerlayers=dict(
            attn_cfgs=dict(type="MultiScaleDeformableAttention",
                           embed_dims=256, num_levels=4),
            ffn_cfgs=dict(feedforward_channels=1024))),
    cls_head=dict(
        type="SlvlClsHead", num_classes=1000, in_channels=768,
        loss=dict(type="LabelSmoothLoss", label_smooth_val=0.1,
                  mode="original")),
    task_weight=dict(cls=1),
    train_cfg=dict(cls=dict(augments=[
        dict(type="BatchMixup", alpha=0.8, num_classes=1000, prob=0.5),
        dict(type="BatchCutMix", alpha=1.0, num_classes=1000, prob=0.5)])),
    test_cfg=dict(cls=dict()),
)
