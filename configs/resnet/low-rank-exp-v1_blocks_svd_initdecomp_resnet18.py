_base_ = ["./low-rank-exp-v1_blocks_svd_resnet18.py"]

# deploy-time twin of the solve config: the saved checkpoint already holds
# the spatially-decomposed (v_conv/h_conv) weights, so initialize straight
# into the decomposed structure and skip the solve.
app = dict(
    init_decomp=True,
)
