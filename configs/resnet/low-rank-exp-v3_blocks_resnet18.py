_base_ = ["../_base_/models/resnet/resnet18.py"]

# V3 channel-rank factorization on the 16 block 3x3s at r = N/2
app = dict(
    type="LowRankExpV3",
    num_bases=(32, 32, 32, 32, 64, 64, 64, 64,
               128, 128, 128, 128, 256, 256, 256, 256),
)

filters = [
    dict(type="KernelSizeFilter", min_kernel=2),
    dict(type="IndicesFilter", indices=tuple(range(2, 18))),
]

hooks = [
    dict(type="ModelAnalysis", priority=40, input_shape=(224, 224, 3), batch_size=64),
    dict(type="InferenceTimeHook", priority=50, infer_cfg=dict(input_size=(64, 224, 224, 3))),
]
