_base_ = ["../_base_/models/alexnet/alexnet.py"]

app = dict(
    type="LowRankExpV1",
    max_iter=0,
    min_lmda=0,
    max_lmda=0,
    init_method="svd",
    lmda_length=1,
    num_bases=(8, 8, 6, 4),
)

filters = [
    dict(type="SimpleConvFilter"),
    dict(type="IndicesFilter", indices=(2, 3, 4, 5)),
]

hooks = [
    dict(type="ModelAnalysis", priority=40, input_shape=(224, 224, 3), batch_size=64),
    dict(type="InferenceTimeHook", priority=50, infer_cfg=dict(input_size=(64, 224, 224, 3))),
]
