# Mirror of the reference's configs/low-rank-exp/low-rank-exp-v1_l2_svd_alexnet.py:
# direct SVD solve (max_iter=0) on conv2 only.
_base_ = ["./low-rank-exp-v1_l2_alexnet.py"]

app = dict(
    _cover_=True,
    type="LowRankExpV1",
    max_iter=0,
    min_lmda=0,
    max_lmda=0,
    init_method="svd",
    lmda_length=1,
    num_bases=(8,),
    do_decomp=False,
    init_decomp=False,
)
