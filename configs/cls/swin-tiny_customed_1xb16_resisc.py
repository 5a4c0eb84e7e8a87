# Single-task RESISC45 classification, 'customed' variant: explicitly the
# SlvlClsHead with LabelSmoothLoss and no neck (capability-equivalent of
# the reference configs/cls/swin-tiny_customed_1xb16_resisc.py — there the
# plain variant uses mmcls LinearClsHead and this one SlvlClsHead; both
# reduce to GAP->Linear, the customed one routes through models.multi).
_base_ = "swin-tiny_1xb16_resisc.py"

model = dict(
    neck=None,
    cls_head=dict(
        type="SlvlClsHead",
        num_classes=45,
        in_channels=768,
        loss=dict(type="LabelSmoothLoss", label_smooth_val=0.1,
                  mode="original")),
)

evaluation = dict(interval=5000, cls=dict(metric="accuracy"))
