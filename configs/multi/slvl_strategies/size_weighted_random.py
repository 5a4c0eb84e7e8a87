# Iteration-strategy ablation: size_weighted_random
# (capability-equivalent of the reference's configs/multi/slvl_strategies/).
_base_ = "../MTL_slvlcls_swin-t-p4-w7_1x1_resisc_dior_potsdam.py"
iteration_strategy = dict(type="size_weighted_random")
