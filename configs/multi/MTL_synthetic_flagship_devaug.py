# Same flagship-shaped synthetic workload as
# MTL_synthetic_flagship_hostaug.py, but ALL THREE train augment tails
# (cls RRC/flip/RandAugment/erase; det resize/flip; seg ratio-resize/
# crop/flip/photometric) run ON DEVICE inside the jitted steps
# (ops/device_augment.py): the host only draws parameters and handles
# labels/boxes. A/B these two configs for the host-input bottleneck
# measurement (PERF.md).
_base_ = "MTL_synthetic_flagship_hostaug.py"

data = dict(
    resisc=dict(
        loader=dict(cls_size=224, cls_device_augment=True,
                    cls_src_size=256)),
    dior=dict(
        loader=dict(det_bucket_hw=(800, 800), max_gt=100,
                    det_device_augment=True)),
    potsdam=dict(
        loader=dict(seg_size=512, seg_pad_val=5,
                    seg_device_augment=True)),
)
