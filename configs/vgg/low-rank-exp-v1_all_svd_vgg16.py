_base_ = ["../_base_/models/vgg/vgg16.py"]

app = dict(
    type="LowRankExpV1",
    max_iter=0, min_lmda=0, max_lmda=0,
    init_method="svd", lmda_length=1,
    num_bases=(16,) * 12,
    do_decomp=True,
)

# substitute every conv except the first (keep the stem dense)
filters = [
    dict(type="SimpleConvFilter"),
    dict(type="IndicesFilter", indices=tuple(range(2, 14))),
]

hooks = [
    dict(type="ModelAnalysis", priority=40, input_shape=(224, 224, 3), batch_size=64),
    dict(type="InferenceTimeHook", priority=50, infer_cfg=dict(input_size=(64, 224, 224, 3))),
]
