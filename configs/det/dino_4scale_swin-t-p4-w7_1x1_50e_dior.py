# Alias matching the reference's exact filename
# (configs/det/dino_4scale_swin-t-p4-w7_1x1_50e_dior.py); the model lives
# in the shorter-named file.
_base_ = "dino_4scale_swin-t_1x1_50e_dior.py"
