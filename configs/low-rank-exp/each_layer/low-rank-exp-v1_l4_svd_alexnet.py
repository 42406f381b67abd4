_base_ = ["./low-rank-exp-v1_l2_svd_alexnet.py"]

app = dict(num_bases=(6,))
filters = [dict(type="SimpleConvFilter"), dict(type="IndicesFilter", indices=(4,))]
