_base_ = ["../_base_/models/vgg/vgg16.py"]

# Channel-rank factorization (V3: dense k x k C->r + 1x1 r->N, both MXU
# work) on convs 2-13 at r = N/2: MAC ratio ~ r/N + r/(C k^2) ~ 0.56
# (a ~1.8x cut with NO grouped convs — the TPU answer to scheme-1's wall).
app = dict(
    type="LowRankExpV3",
    num_bases=(32, 64, 64, 128, 128, 128, 256, 256, 256, 256, 256, 256),
)

filters = [
    dict(type="SimpleConvFilter"),
    dict(type="IndicesFilter", indices=tuple(range(2, 14))),
]

hooks = [
    dict(type="ModelAnalysis", priority=40, input_shape=(224, 224, 3), batch_size=64),
    dict(type="InferenceTimeHook", priority=50, infer_cfg=dict(input_size=(64, 224, 224, 3))),
]
