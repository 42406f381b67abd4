_base_ = ["../_base_/models/segnext/segnext-t.py"]

app = dict(type="MscaRep", decomp=1, fix=True)

filters = []

hooks = [
    dict(type="InferenceTimeHook", priority=50, infer_cfg=dict(input_size=(16, 512, 512, 3))),
]
