# Iteration-strategy ablation: weighted random with p = iters-per-epoch
# [394, 5862, 1728] (reference slvl_strategies/batch-weighted_random).
_base_ = "../MTL_slvlcls_swin-t-p4-w7_1x1_resisc_dior_potsdam.py"
iteration_strategy = dict(type="weighted_random", p=[394, 5862, 1728])
