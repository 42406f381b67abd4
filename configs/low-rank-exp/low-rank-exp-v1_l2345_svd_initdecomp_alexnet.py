_base_ = ["./low-rank-exp-v1_l2345_svd_alexnet.py"]

# build the separable target directly and load pre-optimized weights after
# initialize, skipping the solve (reference initdecomp flow: CkptHook loads an
# optimized checkpoint at after_initialize)
app = dict(
    type="LowRankExpV1",
    max_iter=0, min_lmda=0, max_lmda=0,
    init_method="svd", lmda_length=1,
    num_bases=(8, 8, 6, 4),
    init_decomp=True,
)

hooks = [
    dict(type="CkptHook", priority=10, ckpt_cfg=dict(
        after_initialize=dict(action="load", path="work_dirs/optimized.ckpt.npz"))),
    dict(type="ModelAnalysis", priority=40, input_shape=(224, 224, 3), batch_size=64),
]
