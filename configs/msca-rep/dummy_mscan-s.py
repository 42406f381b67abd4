_base_ = ["../_base_/models/mscan/mscan-s.py", "../_base_/apps/dummy.py"]

filters = []

hooks = [
    dict(type="ModelAnalysis", priority=40, input_shape=(224, 224, 3), batch_size=64),
]
