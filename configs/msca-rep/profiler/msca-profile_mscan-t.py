_base_ = ["../../_base_/models/mscan/mscan-t.py"]

app = dict(type="MscaProfile")

filters = []

hooks = [
    dict(
        type="InferenceTimeHook",
        priority=50,
        infer_cfg=dict(input_size=(64, 224, 224, 3), capture_trace=True),
    ),
]
