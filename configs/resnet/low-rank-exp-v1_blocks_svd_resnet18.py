_base_ = ["../_base_/models/resnet/resnet18.py"]

app = dict(
    type="LowRankExpV1",
    max_iter=0, min_lmda=0, max_lmda=0,
    init_method="svd", lmda_length=1,
    # 16 registered convs (the block 3x3s; 1x1 downsamples are filtered out
    # by KernelSizeFilter and the 7x7 stem by IndicesFilter; ResNet convs
    # are bias-less so SimpleConvFilter's bias precondition does not apply).
    # M=4 for k=3 kernels: the 1x1 mixing conv alone costs M/9 of the
    # original conv's MACs, so only M << 9 cuts compute (same math as the
    # VGG-16 config — see scripts/bench_models.py::bench_vgg16).
    num_bases=(4,) * 16,
    do_decomp=True,
)

filters = [
    dict(type="KernelSizeFilter", min_kernel=2),
    # keep the 7x7 stem dense (position 1 in the switchable stream)
    dict(type="IndicesFilter", indices=tuple(range(2, 18))),
]

hooks = [
    dict(type="ModelAnalysis", priority=40, input_shape=(224, 224, 3), batch_size=64),
    dict(type="InferenceTimeHook", priority=50, infer_cfg=dict(input_size=(64, 224, 224, 3))),
]
