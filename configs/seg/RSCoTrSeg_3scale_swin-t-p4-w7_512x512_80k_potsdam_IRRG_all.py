# Single-task Potsdam segmentation: RSCoTrSeg with Swin-T and the 3-level
# deformable pixel-decoder encoder. Mirrors the reference
# configs/seg/RSCoTrSeg_3scale_swin-t-p4-w7_512x512_80k_potsdam_IRRG_all.py
# (which bases the r50 file and swaps in the Swin-T backbone; its bs=1
# note is the "on V100 16G" memory-envelope hint, ibid:31).
_base_ = "RSCoTrSeg_3scale_r50_512x512_80k_potsdam_IRRG_all.py"

model = dict(
    backbone=dict(
        _delete_=True,
        type="SwinTransformer",
        embed_dims=96,
        depths=[2, 2, 6, 2],
        num_heads=[3, 6, 12, 24],
        window_size=7,
        drop_path_rate=0.2,
        patch_norm=True,
        out_indices=(0, 1, 2, 3)),
    decode_head=dict(
        in_channels=[96, 192, 384, 768],
        num_queries=100),
)

data = dict(potsdam=dict(data=dict(samples_per_gpu=1)))

optimizer = dict(
    _delete_=True,
    type="AdamW",
    lr=1e-5,
    weight_decay=0.05,
    eps=1e-8,
    betas=(0.9, 0.999),
    paramwise_cfg=dict(
        custom_keys={
            "backbone": dict(lr_mult=0.1),
            "query_embed": dict(decay_mult=0.0),
            "query_feat": dict(decay_mult=0.0),
            "level_embed": dict(decay_mult=0.0),
        },
        norm_decay_mult=0.0))
lr_config = dict(_delete_=True, policy="step", step=[60000])
checkpoint_config = dict(interval=20000)
evaluation = dict(save_best={"potsdam.mIoU": 1})
