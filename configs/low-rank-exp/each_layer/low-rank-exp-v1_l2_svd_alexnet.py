_base_ = ["../low-rank-exp-v1_l2345_svd_alexnet.py"]

app = dict(
    _cover_=True,
    type="LowRankExpV1",
    max_iter=0, min_lmda=0, max_lmda=0,
    init_method="svd", lmda_length=1,
    num_bases=(8,),
)
filters = [dict(type="SimpleConvFilter"), dict(type="IndicesFilter", indices=(2,))]
