# Iteration-strategy ablation: repeated sequence [1, 2, 2, 0, 0, 0]
# (reference slvl_strategies/repeated_sequence).
_base_ = "../MTL_slvlcls_swin-t-p4-w7_1x1_resisc_dior_potsdam.py"
iteration_strategy = dict(type="repeated_sequence", sequence=[1, 2, 2, 0, 0, 0])
