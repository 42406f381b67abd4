_base_ = ["../_base_/models/vgg/vgg16.py"]

# Tucker-2 factorization (V4: 1x1 C->r1 + dense k x k core r1->r2 + 1x1
# r2->N — every factor dense MXU work; the Tucker analog of the CP line,
# Lebedev 1412.6553 / Kim 1511.06530) on convs 2-13 at (r1, r2) =
# (C/2, N/2): the k^2 term shrinks from C k^2 r (V3) to r1 r2 k^2, so the
# MAC ratio drops to ~ 1/(2 k^2) + 1/4 + 1/(2 k^2) ~ 0.36 of V3-at-r=N/2.
app = dict(
    type="LowRankExpV4",
    num_bases=((32, 32), (32, 64), (64, 64), (64, 128), (128, 128),
               (128, 128), (128, 256), (256, 256), (256, 256), (256, 256),
               (256, 256), (256, 256)),
)

filters = [
    dict(type="SimpleConvFilter"),
    dict(type="IndicesFilter", indices=tuple(range(2, 14))),
]

hooks = [
    dict(type="ModelAnalysis", priority=40, input_shape=(224, 224, 3), batch_size=64),
    dict(type="InferenceTimeHook", priority=50, infer_cfg=dict(input_size=(64, 224, 224, 3))),
]
