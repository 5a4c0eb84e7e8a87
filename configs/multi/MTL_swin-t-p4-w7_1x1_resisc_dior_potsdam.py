# Mlvl-cls MTL variant: MlvlClsHead routes neck features through the shared
# encoder (MlvlClsPixelDecoder); seg uses num_queries=5 (= classes) and
# task_weight seg=1; explicit round_robin strategy; save-best 2/100/300.
# Capability-equivalent of the reference's
# configs/multi/MTL_swin-t-p4-w7_1x1_resisc&dior&potsdam.py.
_base_ = "./MTL_slvlcls_swin-t-p4-w7_1x1_resisc_dior_potsdam.py"

model = dict(
    cls_head=dict(
        _delete_=True,
        type="MlvlClsHead",
        num_classes=45,
        in_channels=256,
        scheme=5,
        pixel_decoder=dict(
            type="MlvlClsPixelDecoder", num_encoder_levels=4,
            strides=[8, 16, 32, 64], feat_channels=256, num_outs=4,
            positional_encoding=dict(type="SinePositionalEncoding",
                                     num_feats=128, normalize=True)),
        loss=dict(type="LabelSmoothLoss", label_smooth_val=0.1,
                  mode="original")),
    seg_head=dict(num_queries=5),
    task_weight=dict(cls=1, det=1, seg=1),
)

iteration_strategy = dict(type="round_robin")

evaluation = dict(save_best={"resisc.accuracy_top-1": 2,
                             "dior.bbox_mAP": 100,
                             "potsdam.mFscore": 300})
