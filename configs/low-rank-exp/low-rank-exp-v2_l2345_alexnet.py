_base_ = ["../_base_/models/alexnet/alexnet.py"]

app = dict(
    type="LowRankExpV2",
    num_bases=(16, 16, 12, 8),
)

filters = [
    dict(type="SimpleConvFilter"),
    dict(type="IndicesFilter", indices=(2, 3, 4, 5)),
]

hooks = [
    dict(type="ModelAnalysis", priority=40, input_shape=(224, 224, 3), batch_size=64),
]
