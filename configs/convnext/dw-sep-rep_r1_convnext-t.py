_base_ = ["../_base_/models/convnext/convnext-t.py"]

# Rank-1 separable re-parameterization of every block's depthwise 7x7
# (18 dwconvs in ConvNeXt-T; the 4x4 stem and 2x2 downsample convs are
# rejected by DepthwiseConvFilter).  k^2 -> 2k taps per output element
# (3.5x MAC cut on the dwconvs); logs retained PC energy per layer.
# strip_matmul stays off: measured on v5e-1, the lax-conv cascades win at
# ConvNeXt's square-7x7 shapes (1.39x bf16) while the Toeplitz strip
# lowering loses (doc/perf-notes.md "ConvNeXt-T DwSepRep").
app = dict(
    type="DwSepRep",
    ranks=1,
    strip_matmul=False,
)

filters = [
    dict(type="DepthwiseConvFilter", min_kernel=3),
]

hooks = [
    dict(type="ModelAnalysis", priority=40, input_shape=(224, 224, 3), batch_size=64),
    dict(type="InferenceTimeHook", priority=50, infer_cfg=dict(input_size=(64, 224, 224, 3))),
]
