# Alias with the reference's original filename (shell-unfriendly '&').
_base_ = "./MTL_swin-t-p4-w7_1x1_resisc_dior_potsdam.py"
