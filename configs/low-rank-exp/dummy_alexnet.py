_base_ = ["../_base_/models/alexnet/alexnet.py", "../_base_/apps/dummy.py"]

filters = []

hooks = [
    dict(type="ModelAnalysis", priority=40, input_shape=(224, 224, 3), batch_size=64),
    dict(type="InferenceTimeHook", priority=50, infer_cfg=dict(input_size=(64, 224, 224, 3))),
]
