# RandAugment policy list for the RESISC45 cls pipeline — mirrors the
# reference's configs/_base_/cls/rand_aug.py (mmcls
# `_RAND_INCREASING_TRANSFORMS`). Our pipeline ops encode the same
# increasing-magnitude ranges internally (rscotr_tpu/data/pipelines.py
# RAND_AUG_OPS), so the magnitude_key/magnitude_range fields here are
# carried for config compatibility and the `type`+`direction` fields
# select/order the op pool.
rand_increasing_policies = [
    dict(type="AutoContrast"),
    dict(type="Equalize"),
    dict(type="Invert"),
    dict(type="Rotate", magnitude_key="angle", magnitude_range=(0, 30)),
    dict(type="Posterize", magnitude_key="bits", magnitude_range=(4, 0)),
    dict(type="Solarize", magnitude_key="thr", magnitude_range=(256, 0)),
    dict(type="SolarizeAdd", magnitude_key="magnitude",
         magnitude_range=(0, 110)),
    dict(type="ColorTransform", magnitude_key="magnitude",
         magnitude_range=(0, 0.9)),
    dict(type="Contrast", magnitude_key="magnitude",
         magnitude_range=(0, 0.9)),
    dict(type="Brightness", magnitude_key="magnitude",
         magnitude_range=(0, 0.9)),
    dict(type="Sharpness", magnitude_key="magnitude",
         magnitude_range=(0, 0.9)),
    dict(type="Shear", magnitude_key="magnitude",
         magnitude_range=(0, 0.3), direction="horizontal"),
    dict(type="Shear", magnitude_key="magnitude",
         magnitude_range=(0, 0.3), direction="vertical"),
    dict(type="Translate", magnitude_key="magnitude",
         magnitude_range=(0, 0.45), direction="horizontal"),
    dict(type="Translate", magnitude_key="magnitude",
         magnitude_range=(0, 0.45), direction="vertical"),
]
