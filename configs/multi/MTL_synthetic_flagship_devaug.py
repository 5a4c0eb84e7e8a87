# Same flagship-shaped synthetic workload as
# MTL_synthetic_flagship_hostaug.py, but the cls augment tail (RRC /
# flip / RandAugment / RandomErasing / Normalize) runs ON DEVICE inside
# the jitted cls step (ops/device_augment.py): the host only draws the
# per-sample parameters. A/B these two configs for the host-input
# bottleneck measurement (PERF.md).
_base_ = "MTL_synthetic_flagship_hostaug.py"

data = dict(
    resisc=dict(
        loader=dict(cls_size=224, cls_device_augment=True,
                    cls_src_size=256))
)
